from metadata_driven_etl_spark.plans.pipeline import (  # noqa: F401
    BronzeLayer,
    GoldLayer,
    PipelineContext,
    SilverLayer,
    UnitResult,
)
