from .schema import (
    BINLOG_SCHEMA,
    TRANSCRIPT_SCHEMA,
    STATE_SCHEMA,
    SchemaRegistry,
)
from .resolve import resolve_lww
from .merge import merge_into_state, ApplyMetrics
from .replay import ReplayDriver, plan_ranges
from .generator import generate_binlog
from .oracle import NaiveApplier

__all__ = [
    "BINLOG_SCHEMA",
    "TRANSCRIPT_SCHEMA",
    "STATE_SCHEMA",
    "SchemaRegistry",
    "resolve_lww",
    "merge_into_state",
    "ApplyMetrics",
    "ReplayDriver",
    "plan_ranges",
    "generate_binlog",
    "NaiveApplier",
]
