from metadata_driven_etl_spark.streaming.agg_maintenance_sink import (  # noqa: F401
    agg_maintenance_stream,
)
from metadata_driven_etl_spark.streaming.enrich import (  # noqa: F401
    dedup_within_watermark,
    stream_static_join,
    stream_stream_join,
)
from metadata_driven_etl_spark.streaming.sink import merge_stream  # noqa: F401
from metadata_driven_etl_spark.streaming.stateful import (  # noqa: F401
    sessionize_stateful,
)
from metadata_driven_etl_spark.streaming.windows import (  # noqa: F401
    session_window_agg,
    sliding_window_agg,
    stream_from_files,
    tumbling_window_agg,
)
