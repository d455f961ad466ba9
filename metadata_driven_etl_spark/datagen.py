"""Synthetic star-schema data generator (reference M13: data_generator.py +
scripts/generate_sample_data.py) — Spark-native and deterministic.

The reference builds rows in driver-side Python loops with unseeded
``random`` (data_generator.py:14-308): non-reproducible and bounded by one
machine's memory. This generator derives every value from ``xxhash64`` over
``spark.range`` ids — fully distributed (generate 10^12 rows by changing one
number), reproducible (seed folded into every hash), and zero Python in the
hot path.

K4 file sinks (reference data_generator.py:276-307) are the ``write_*``
helpers: CSV (header), JSON lines, Parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STATES = ["CA", "NY", "TX", "WA", "IL", "FL", "MA", "GA", "OH", "NC"]
_SEGMENTS = ["consumer", "corporate", "home_office"]
_CATEGORIES = ["electronics", "clothing", "home", "sports", "books", "toys"]


def _pick(col, options: list[str]):
    """Deterministic choice: hash-mod index into a literal array."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(F.xxhash64(col), F.lit(len(options))) + 1).cast("int"))


def _unit(col) -> F.Column:
    """Deterministic uniform [0,1) from a hashed column."""
    return F.pmod(F.xxhash64(col), F.lit(1_000_000)) / 1_000_000.0


def gen_customers(spark: SparkSession, n: int = 500, seed: int = 42) -> DataFrame:
    base = spark.range(n).withColumn("s", F.lit(seed))
    cid = F.concat(F.lit("CUST"), F.lpad(F.col("id").cast("string"), 8, "0"))
    return base.select(
        cid.alias("customer_id"),
        F.concat(F.lit("Customer "), F.col("id").cast("string")).alias("name"),
        F.concat(
            F.lit("user"), F.col("id").cast("string"), F.lit("@example.com")
        ).alias("email"),
        _pick(F.concat(cid, F.lit("st"), F.col("s")), _STATES).alias("state"),
        _pick(F.concat(cid, F.lit("sg"), F.col("s")), _SEGMENTS).alias("segment"),
        F.date_add(
            F.lit("2020-01-01").cast("date"),
            F.pmod(F.xxhash64(F.concat(cid, F.lit("rd"), F.col("s"))), F.lit(1461)).cast("int"),
        ).alias("registration_date"),
    )


def gen_products(spark: SparkSession, n: int = 1000, seed: int = 42) -> DataFrame:
    base = spark.range(n).withColumn("s", F.lit(seed))
    pid = F.concat(F.lit("PROD"), F.lpad(F.col("id").cast("string"), 8, "0"))
    cost = F.round(5.0 + _unit(F.concat(pid, F.lit("c"), F.col("s"))) * 495.0, 2)
    return base.select(
        pid.alias("product_id"),
        F.concat(F.lit("Product "), F.col("id").cast("string")).alias("product_name"),
        _pick(F.concat(pid, F.lit("cat"), F.col("s")), _CATEGORIES).alias("category"),
        cost.alias("cost"),
        F.round(cost * (1.2 + _unit(F.concat(pid, F.lit("m"), F.col("s")))), 2).alias(
            "price"
        ),
    )


def gen_transactions(
    spark: SparkSession,
    n: int = 5000,
    n_customers: int = 500,
    n_products: int = 1000,
    days: int = 180,
    seed: int = 42,
) -> DataFrame:
    base = spark.range(n).withColumn("s", F.lit(seed))
    tid = F.concat(F.lit("TXN"), F.lpad(F.col("id").cast("string"), 10, "0"))
    qty = (F.pmod(F.xxhash64(F.concat(tid, F.lit("q"), F.col("s"))), F.lit(10)) + 1).cast(
        "int"
    )
    unit_price = F.round(
        5.0 + _unit(F.concat(tid, F.lit("p"), F.col("s"))) * 995.0, 2
    )
    return base.select(
        tid.alias("transaction_id"),
        F.concat(
            F.lit("CUST"),
            F.lpad(
                F.pmod(
                    F.xxhash64(F.concat(tid, F.lit("cu"), F.col("s"))),
                    F.lit(n_customers),
                ).cast("string"),
                8,
                "0",
            ),
        ).alias("customer_id"),
        F.concat(
            F.lit("PROD"),
            F.lpad(
                F.pmod(
                    F.xxhash64(F.concat(tid, F.lit("pr"), F.col("s"))),
                    F.lit(n_products),
                ).cast("string"),
                8,
                "0",
            ),
        ).alias("product_id"),
        qty.alias("quantity"),
        F.round(qty * unit_price, 2).alias("amount"),
        F.date_add(
            F.lit("2024-01-01").cast("date"),
            F.pmod(F.xxhash64(F.concat(tid, F.lit("d"), F.col("s"))), F.lit(days)).cast(
                "int"
            ),
        ).alias("transaction_date"),
    )


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_parquet(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def generate_sample_data(
    spark: SparkSession,
    out_dir: str,
    n_customers: int = 500,
    n_products: int = 1000,
    n_transactions: int = 5000,
    seed: int = 42,
) -> dict[str, int]:
    """Reference demo shape: customers→CSV, products→JSON, transactions→
    Parquet (data_generator.py:267-308)."""
    customers = gen_customers(spark, n_customers, seed)
    products = gen_products(spark, n_products, seed)
    txns = gen_transactions(spark, n_transactions, n_customers, n_products, seed=seed)
    write_csv(customers, f"{out_dir}/customers")
    write_json(products, f"{out_dir}/products")
    write_parquet(txns, f"{out_dir}/transactions")
    return {
        "customers": customers.count(),
        "products": products.count(),
        "transactions": txns.count(),
    }
