from .stream_apply import start_binlog_stream, stream_apply_forever

__all__ = ["start_binlog_stream", "stream_apply_forever"]
