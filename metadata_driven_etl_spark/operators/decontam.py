"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

Not present in the reference (no text surface beyond a regex DQ rule,
src/modules/dq_engine.py:66-107); added per the north star: a training-data
pipeline must drop documents that leak evaluation content (the standard
"13-gram overlap" decontamination check from the GPT-3/PaLM data-prep
literature, parameterized n).

Scale shape: the eval set is tiny relative to the corpus (benchmarks are
thousands of docs; the corpus is 100 TB), so its distinct n-gram set is
broadcast and the check is a map-side broadcast semi-join per training
shingle — no shuffle of the corpus at all. The only wide op is the final
per-doc count aggregation, which is one shuffle on doc_id.

All JVM-side built-ins (shingle generation reuses dedup.shingles — one
regex pass per document); DuckDB twin below for the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metadata_driven_etl_spark.operators.dedup import shingles, sql_shingles


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Per training doc: how many of its distinct word n-grams appear
    anywhere in the eval set, and a contaminated flag.

    Returns one row per ``train`` row: (id_col, n_matched_grams BIGINT,
    contaminated BOOLEAN). Docs with no overlap (or fewer than n tokens)
    report 0 / false.
    """
    eval_grams = (
        eval_df.select(F.explode(shingles(text_col, n)).alias("gram"))
        .distinct()
    )
    train_grams = train.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("gram")
    )
    matched = (
        # shingles() is per-doc distinct, so count(*) counts distinct
        # matched grams per doc without a second distinct.
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched_grams"))
    )
    return (
        train.select(id_col)
        .join(matched, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_matched_grams"), F.lit(0).cast("long")).alias(
                "n_matched_grams"
            ),
            (F.coalesce(F.col("n_matched_grams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Just the ids of contaminated training docs (n_matched_grams > 0).

    The filter-pipeline form of :func:`ngram_overlap`: contamination is
    rare by construction, so the match set is small — callers anti-join
    (broadcast) against it instead of joining full per-doc counts back on
    id, which would shuffle the whole training corpus at 100 TB.
    """
    eval_grams = (
        eval_df.select(F.explode(shingles(text_col, n)).alias("gram"))
        .distinct()
    )
    return (
        train.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("gram"))
        .join(F.broadcast(eval_grams), "gram")
        .select(id_col)
        .distinct()
    )


def sql_ngram_overlap(
    table: str = "documents",
    eval_pred: str = "source = 'src0'",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> str:
    """DuckDB twin: training rows are ``NOT (eval_pred)`` rows of table."""
    sh = sql_shingles(text_col, n)
    return f"""
    WITH eval_grams AS (
        SELECT DISTINCT gram FROM (
            SELECT unnest({sh}) AS gram FROM {table} WHERE {eval_pred})
    ),
    train_grams AS (
        SELECT {id_col}, unnest({sh}) AS gram
        FROM {table} WHERE NOT ({eval_pred})
    ),
    matched AS (
        SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_matched_grams
        FROM train_grams JOIN eval_grams USING (gram)
        GROUP BY 1
    )
    SELECT t.{id_col},
           COALESCE(m.n_matched_grams, CAST(0 AS BIGINT)) AS n_matched_grams,
           COALESCE(m.n_matched_grams, 0) > 0 AS contaminated
    FROM {table} t LEFT JOIN matched m USING ({id_col})
    WHERE NOT (t.{eval_pred})
    """
