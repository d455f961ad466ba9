from metadata_driven_etl_spark.dq.engine import (  # noqa: F401
    DQResult,
    DQRuleMetrics,
    DataQualityEngine,
)
