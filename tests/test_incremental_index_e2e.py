"""End-to-end incremental dedup against a PERSISTED bucketed band index.

SCALE.md claims the daily-batch dedup pattern never reshuffles the corpus:
the LSH band index is written ONCE (bucketed on its join key), each day's
batch is hashed and broadcast, and the index streams past it. The r2 unit
tests proved keep-first semantics on in-memory frames only; this module
drives the real lifecycle — write the index with ``overwrite_bucketed``,
read it back from disk, dedup a batch against it — and asserts both the
semantics (identical survivors vs the in-memory index) and the plan shape
(broadcast join, zero shuffle of the index side).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_driven_etl_spark.catalog import load_table
from metadata_driven_etl_spark.io.writer import ParquetFormat
from metadata_driven_etl_spark.operators import dedup

INDEX_TABLE = "lsh_idx.documents_bands"


@pytest.fixture(scope="module")
def persisted_index(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    bands = dedup.lsh_bands(corpus)
    ParquetFormat().overwrite_bucketed(
        bands, INDEX_TABLE, bucket_cols=["band", "bhash"], num_buckets=8
    )
    batch = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    return corpus, batch


def test_survivors_match_in_memory_index(spark, persisted_index):
    corpus, batch = persisted_index
    from_disk = dedup.incremental_dedup_survivors(
        batch, spark.table(INDEX_TABLE)
    )
    in_memory = dedup.incremental_dedup_survivors(
        batch, dedup.lsh_bands(corpus)
    )
    got = sorted(r.doc_id for r in from_disk.collect())
    want = sorted(r.doc_id for r in in_memory.collect())
    assert got == want and 0 < len(got) <= batch.count()


def test_index_side_never_shuffles(spark, persisted_index):
    """The corpus-index ⋈ batch-bands join must broadcast the batch and
    stream the index with no Exchange between the index scan and the
    join — the property that makes the pattern viable when the index is
    petabyte-scale. (The batch side MAY shuffle inside its broadcast
    subtree — its minhash groupBy — that side is small by construction.)"""
    _, batch = persisted_index
    index_bands = spark.table(INDEX_TABLE)
    bb = dedup.lsh_bands(batch)
    joined = index_bands.join(
        F.broadcast(bb),
        (index_bands["band"] == bb["band"])
        & (index_bands["bhash"] == bb["bhash"]),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # In toString tree art the streamed (index) subtree of the top join is
    # the ":"-prefixed branch; it must be Exchange-free scan→filter→join.
    streamed = [ln for ln in plan.splitlines() if ln.lstrip().startswith(":")]
    assert streamed and f"FileScan parquet spark_catalog.{INDEX_TABLE}" in "\n".join(
        streamed
    ), plan
    assert not any("Exchange" in ln for ln in streamed), plan


def test_bucketed_index_join_skips_shuffle_without_broadcast(
    spark, persisted_index
):
    """When the other side is too big to broadcast, the bucketed layout is
    what saves the shuffle: an equi-join on the bucket columns compiles to
    a sort-merge over the bucketed scans with ZERO Exchange."""
    ib = spark.table(INDEX_TABLE)
    other = spark.table(INDEX_TABLE).withColumnRenamed("doc_id", "o_doc_id")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = ib.join(other, on=["band", "bhash"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe
            )
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan


def test_full_operator_plan_only_shuffles_hit_ids(spark, persisted_index):
    """In the composed operator the ONLY shuffles allowed are the
    distinct() folds over already-matched batch ids (tiny by
    construction) and the batch's own band computation — never a
    hashpartitioning of the index columns."""
    _, batch = persisted_index
    out = dedup.incremental_dedup_survivors(batch, spark.table(INDEX_TABLE))
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "i_band" not in line and "i_bhash" not in line, line
