from .ingest_stream import start_incremental_ingest
from .stateful import running_user_totals
from .windows import sessionize, tumbling_counts

__all__ = [
    "start_incremental_ingest",
    "running_user_totals",
    "sessionize",
    "tumbling_counts",
]
