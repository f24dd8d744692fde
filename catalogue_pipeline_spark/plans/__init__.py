from .merger import match_and_merge

__all__ = ["match_and_merge"]
