from .merger import match_and_merge
from .matcher import create_matcher_table, update_graph, matcher_result

__all__ = ["match_and_merge", "create_matcher_table", "update_graph", "matcher_result"]
