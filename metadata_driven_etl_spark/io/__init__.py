from metadata_driven_etl_spark.io.writer import (  # noqa: F401
    DeltaFormat,
    ParquetFormat,
    TableFormat,
    get_table_format,
)
