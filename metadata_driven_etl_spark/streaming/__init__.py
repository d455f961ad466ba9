from metadata_driven_etl_spark.streaming.windows import (  # noqa: F401
    session_window_agg,
    sliding_window_agg,
    stream_from_files,
    tumbling_window_agg,
)
