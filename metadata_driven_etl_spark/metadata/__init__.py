from metadata_driven_etl_spark.metadata.audit import AuditLogger  # noqa: F401
from metadata_driven_etl_spark.metadata.control import ControlTable  # noqa: F401
from metadata_driven_etl_spark.metadata.metrics import (  # noqa: F401
    DataDictionary,
    DQMetricsStore,
)
