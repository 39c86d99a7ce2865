from readur_spark.streaming.ingest import (  # noqa: F401
    read_pages_stream,
    stream_extract,
)
