from .snapshot import snapshot_sync
from .loaders import load_xml_records, load_jsonl_records

__all__ = ["snapshot_sync", "load_xml_records", "load_jsonl_records"]
