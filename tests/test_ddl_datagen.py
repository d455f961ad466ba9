"""DDL surface (SURVEY.md §2.10) + deterministic Spark-native data generator
(M13) + file sinks (K4)."""

from __future__ import annotations

import pytest

from metadata_driven_etl_spark import datagen
from metadata_driven_etl_spark.io import ddl


@pytest.fixture()
def db(spark):
    ddl.create_database(spark, "ddl_test")
    yield "ddl_test"
    for t in ddl.list_tables(spark, "ddl_test"):
        ddl.drop_table(spark, f"ddl_test.{t}")
    spark.sql("DROP DATABASE IF EXISTS ddl_test")


def test_create_table_from_ddl_and_describe(spark, db):
    ddl.create_table_from_ddl(
        spark, f"{db}.ctrl", "table_name string, last_run_date date, n_rows bigint"
    )
    assert ddl.table_exists(spark, f"{db}.ctrl")
    cols = {r.col_name: r.data_type for r in ddl.describe_table(spark, f"{db}.ctrl")}
    assert cols == {
        "table_name": "string",
        "last_run_date": "date",
        "n_rows": "bigint",
    }
    # non-destructive: second create with a different schema is a no-op
    ddl.create_table_from_ddl(spark, f"{db}.ctrl", "other string")
    assert "table_name" in {
        r.col_name for r in ddl.describe_table(spark, f"{db}.ctrl")
    }


def test_truncate_and_drop(spark, db):
    ddl.create_table_from_ddl(spark, f"{db}.t1", "x bigint")
    spark.range(5).withColumnRenamed("id", "x").write.mode("append").format(
        "parquet"
    ).saveAsTable(f"{db}.t1")
    assert spark.table(f"{db}.t1").count() == 5
    ddl.truncate_table(spark, f"{db}.t1")
    assert spark.table(f"{db}.t1").count() == 0
    ddl.drop_table(spark, f"{db}.t1")
    assert not ddl.table_exists(spark, f"{db}.t1")


def test_identifier_validation(spark):
    with pytest.raises(ValueError):
        ddl.drop_table(spark, "x; DROP TABLE y")
    with pytest.raises(ValueError):
        ddl.create_database(spark, "bad-name!")


def test_vacuum_gated_on_parquet(spark, db):
    ddl.create_table_from_ddl(spark, f"{db}.t2", "x bigint")
    # parquet-backed table: VACUUM is a Delta op → graceful False, no raise
    assert ddl.vacuum_table(spark, f"{db}.t2", retain_hours=168) is False


def test_analyze_table(spark, db):
    ddl.create_table_from_ddl(spark, f"{db}.t3", "x bigint")
    spark.range(10).withColumnRenamed("id", "x").write.mode("append").format(
        "parquet"
    ).saveAsTable(f"{db}.t3")
    ddl.analyze_table(spark, f"{db}.t3")
    stats = spark.sql(f"DESCRIBE TABLE EXTENDED {db}.t3").collect()
    assert any("Statistics" in r.col_name for r in stats)


def test_datagen_deterministic_and_distributed(spark):
    a = datagen.gen_transactions(spark, 1000, seed=7)
    b = datagen.gen_transactions(spark, 1000, seed=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = datagen.gen_transactions(spark, 1000, seed=8)
    assert c.exceptAll(a).count() > 0  # seed changes data
    # no Python UDFs in the plan (stays JVM-side)
    assert "Python" not in a._jdf.queryExecution().executedPlan().toString()


def test_datagen_referential_shape(spark):
    txns = datagen.gen_transactions(spark, 500, n_customers=50, n_products=20)
    custs = datagen.gen_customers(spark, 50)
    # every FK resolves (hash-mod of id space is closed over the dim range)
    dangling = txns.join(custs, "customer_id", "left_anti")
    assert dangling.count() == 0
    assert txns.filter("quantity < 1 OR quantity > 10").count() == 0
    assert txns.filter("amount <= 0").count() == 0


def test_sample_data_files(spark, tmp_path):
    out = str(tmp_path / "demo")
    counts = datagen.generate_sample_data(
        spark, out, n_customers=50, n_products=30, n_transactions=200
    )
    assert counts == {"customers": 50, "products": 30, "transactions": 200}
    assert spark.read.option("header", "true").csv(f"{out}/customers").count() == 50
    assert spark.read.json(f"{out}/products").count() == 30
    assert spark.read.parquet(f"{out}/transactions").count() == 200


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    """SCALE.md §4: two tables bucketed on the join key sort-merge-join with
    ZERO Exchange (shuffle) operators in the physical plan."""
    from pyspark.sql import functions as F

    from metadata_driven_etl_spark.catalog import load_table
    from metadata_driven_etl_spark.io.writer import ParquetFormat

    fmt = ParquetFormat()
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    fmt.overwrite_bucketed(
        orders, "bkt.orders", ["o_custkey"], 8, sort_cols=["o_custkey"]
    )
    fmt.overwrite_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "bkt.customer",
        ["o_custkey"],
        8,
        sort_cols=["o_custkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt.orders").join(spark.table("bkt.customer"), "o_custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt.orders")
        spark.sql("DROP TABLE IF EXISTS bkt.customer")
        spark.sql("DROP DATABASE IF EXISTS bkt")


def test_dynamic_partition_pruning(spark, sf_dir):
    """SCALE.md: a date-partitioned fact joined to a filtered dim gets a
    dynamicpruning partition filter — only matching partitions are read
    (the gold fact⋈dim star shape at 100 TB)."""
    from pyspark.sql import functions as F

    from metadata_driven_etl_spark.catalog import load_table

    spark.sql("CREATE DATABASE IF NOT EXISTS dpp")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    orders.write.mode("overwrite").partitionBy("order_month").saveAsTable(
        "dpp.orders_part"
    )
    months = [r.order_month for r in orders.select("order_month").distinct().collect()]
    dim = spark.createDataFrame(
        [(m, i) for i, m in enumerate(sorted(months))], "order_month string, idx int"
    )
    try:
        joined = spark.table("dpp.orders_part").join(
            dim.filter(F.col("idx") == 0), "order_month"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        # and it actually returns only the one month's rows
        want = spark.table("dpp.orders_part").filter(
            F.col("order_month") == sorted(months)[0]
        ).count()
        assert joined.count() == want > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS dpp.orders_part")
        spark.sql("DROP DATABASE IF EXISTS dpp")


def test_create_view_and_compact(spark, sf_dir):
    """create_view serves fresh results over base tables; compact_table
    rewrites a many-file table into ceil(bytes/target) files."""
    from pyspark.sql import functions as F

    from metadata_driven_etl_spark.catalog import load_table
    from metadata_driven_etl_spark.io.ddl import (
        compact_table,
        create_view,
        drop_view,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS maint")
    orders = load_table(spark, sf_dir, "orders")
    # fragment: 16 small files
    orders.repartition(16).write.mode("overwrite").saveAsTable("maint.orders_frag")
    try:
        create_view(
            spark,
            "maint.open_orders",
            "SELECT o_orderkey, o_totalprice FROM maint.orders_frag "
            "WHERE o_orderstatus = 'O'",
        )
        want = orders.filter(F.col("o_orderstatus") == "O").count()
        assert spark.table("maint.open_orders").count() == want

        n_before = (
            spark.table("maint.orders_frag")
            .select(F.input_file_name().alias("f")).distinct().count()
        )
        assert n_before == 16
        n_out = compact_table(spark, "maint.orders_frag", target_file_bytes=1 << 30)
        assert n_out == 1
        n_after = (
            spark.table("maint.orders_frag")
            .select(F.input_file_name().alias("f")).distinct().count()
        )
        assert n_after == 1
        # data intact after compaction, view still serves
        assert spark.table("maint.orders_frag").count() == orders.count()
        assert spark.table("maint.open_orders").count() == want
    finally:
        drop_view(spark, "maint.open_orders")
        spark.sql("DROP TABLE IF EXISTS maint.orders_frag")
        spark.sql("DROP DATABASE IF EXISTS maint CASCADE")
