from .ingest_stream import start_incremental_ingest
from .windows import sessionize, tumbling_counts

__all__ = ["start_incremental_ingest", "sessionize", "tumbling_counts"]
