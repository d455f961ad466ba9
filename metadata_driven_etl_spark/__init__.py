"""metadata_driven_etl_spark — a PySpark-native, metadata-driven analytics/ETL engine.

Re-derivation (NOT a port) of the capabilities of the reference repo
minhquan6203/Metadata-Driven-ETL (see SURVEY.md): medallion-layer ETL driven
by declarative YAML config, a data-quality rule engine, a metadata plane
(control table / audit log / DQ metrics / data dictionary), plus an extended
operator surface for large-scale training-data pipelines (dedup, similarity
search, text analysis, multimodal columns, event-time windows).

Design stance (SURVEY.md §7.1):
- Pure public PySpark DataFrame/SQL API; Catalyst/Tungsten do the planning.
- No custom Catalyst rules; no RDDs in the hot path.
- Delta-optional: writes go through a ``TableFormat`` seam (parquet fallback
  so the engine runs without delta jars).
- Built for 100 TB posture: AQE on, broadcast hints for dims, partitioned
  writes, single-pass observation-based metrics (no double execution).
"""

__version__ = "0.1.0"

from metadata_driven_etl_spark.session import get_spark  # noqa: F401
from metadata_driven_etl_spark.catalog import TABLES, load_table, register_views  # noqa: F401
