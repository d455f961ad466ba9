"""Deterministic sampling operators for corpus construction.

Not present in the reference (its pipelines move whole tables; sampling is
a training-data concern added per the north star). The common thread:
membership is a pure function of the row key — ``rand()``-based sampling
changes membership across runs, engines and partitionings, which breaks
reproducibility and any downstream join against the sample.

``hash_unit`` maps a key column to a uniform double in [0, 1) via the
first 32 bits of its md5 — identical bit-for-bit in Spark and DuckDB
(exact 32-bit-int / 2^32 division), so oracles and re-runs agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_unit(col: Column | str) -> Column:
    """Uniform [0, 1) double keyed on the column's string value."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        / F.lit(4294967296.0)
    )


def sql_hash_unit(expr: str) -> str:
    return (
        f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8))::BIGINT"
        " / 4294967296.0"
    )


def weighted_domain_sample(
    df: DataFrame,
    weights: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    frac_col: str = "frac",
) -> DataFrame:
    """Per-domain rate sampling: keep each row with probability
    ``weights[frac]`` for its domain — the corpus-mixing step of a training
    pipeline (up/down-weight sources to hit a target data mixture).

    ``weights``: (domain_col, frac_col in [0, 1]). Deterministic: a row is
    kept iff ``hash_unit(id) < frac`` — reproducible across runs and
    engines, and monotone in frac (raising a domain's weight only ever
    *adds* documents, never reshuffles the kept set — so mixture
    experiments are nested samples).

    Shape: broadcast join on the (tiny) weights table + a map-side filter;
    zero shuffles of the corpus at 100 TB.
    """
    return (
        df.join(F.broadcast(weights), domain_col)
        .filter(hash_unit(id_col) < F.col(frac_col))
        .drop(frac_col)
    )
