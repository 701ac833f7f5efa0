from us_dot_flights_lakehouse_spark.streaming.ingest import (  # noqa: F401
    stream_file_ingest,
)
from us_dot_flights_lakehouse_spark.streaming.events import (  # noqa: F401
    sessionize,
    windowed_event_stats,
)
