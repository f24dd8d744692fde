from .merger import match_and_merge
from .matcher import create_matcher_table, update_graph, matcher_result
from .denormalize import create_docs_table, refresh_documents

__all__ = [
    "match_and_merge",
    "create_matcher_table",
    "update_graph",
    "matcher_result",
    "create_docs_table",
    "refresh_documents",
]
