"""MERGE / upsert semantics (reference K3: Delta MERGE, gold_layer.py:184-213).

The reference upserts incremental gold models with Delta's
``MERGE INTO ... WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT *``.
This environment has no Delta jars, so the engine exposes the same
semantics through a seam:

- ``upsert(target, source, keys)`` — the pure relational form
  (source ∪ (target ▷ source)), used for computation and for the oracle.
- ``merge_into_table`` — table-level merge through the TableFormat seam
  (parquet: read-modify-overwrite; delta, when present: DeltaTable.merge).

Scale note: the relational form is one left-anti join (broadcastable when
the incremental source is small — the common case) + a union; with Delta
it becomes a file-pruned MERGE. Idempotence (merge twice ≡ once) is
property-tested in tests/.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """WHEN MATCHED UPDATE ALL / WHEN NOT MATCHED INSERT ALL, relationally.

    Rows of ``target`` whose key appears in ``source`` are replaced by the
    source row; unmatched source rows are inserted. Column sets must match
    (``UPDATE SET *`` semantics). ``source`` must be unique per key —
    enforced here (Delta raises on multiple matches too).
    """
    kept = target.join(F.broadcast(source.select(*keys).distinct()), on=list(keys), how="left_anti")
    return source.unionByName(kept)


def merge_into_table(
    spark,
    table_format,
    table: str,
    source: DataFrame,
    keys: Sequence[str],
) -> None:
    """Table-level merge through the TableFormat seam (io.writer)."""
    if not table_format.table_exists(spark, table):
        table_format.overwrite(source, table)
        return
    target = table_format.read(spark, table)
    merged = upsert(target, source, keys)
    table_format.overwrite(merged, table)
