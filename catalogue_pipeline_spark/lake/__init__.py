from .table import LakeTable, Snapshot, CommitConflict

__all__ = ["LakeTable", "Snapshot", "CommitConflict"]
