from metadata_driven_etl_spark.config.model import (  # noqa: F401
    DQRuleConfig,
    GoldModel,
    LayerDefaults,
    PipelineConfig,
    SilverTransform,
    SourceConfig,
    load_config_dir,
    load_yaml_config,
)
