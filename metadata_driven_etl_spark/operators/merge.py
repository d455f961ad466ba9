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


class DuplicateSourceKeysError(ValueError):
    """The merge source has >1 row for some key (Delta MERGE raises on
    multiple matches too; the relational emulation must not silently land
    duplicate rows instead)."""


def validate_unique_keys(source: DataFrame, keys: Sequence[str]) -> None:
    """Raise :class:`DuplicateSourceKeysError` if ``source`` is not unique
    per key. One aggregation job over the (typically small, incremental)
    source batch; ``limit(1)`` short-circuits the collect."""
    dup = (
        source.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        kv = {k: dup[0][k] for k in keys}
        raise DuplicateSourceKeysError(
            f"merge source has {dup[0]['_n']} rows for key {kv}"
        )


def upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """WHEN MATCHED UPDATE ALL / WHEN NOT MATCHED INSERT ALL, relationally.

    Rows of ``target`` whose key appears in ``source`` are replaced by the
    source row; unmatched source rows are inserted. Column sets must match
    (``UPDATE SET *`` semantics). ``source`` must be unique per key; this
    pure form stays lazy, so uniqueness is enforced at the table-merge
    level (:func:`validate_unique_keys`, called by TableFormat.merge and
    :func:`merge_into_table`).
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
    validate_unique_keys(source, keys)
    if not table_format.table_exists(spark, table):
        table_format.overwrite(source, table)
        return
    target = table_format.read(spark, table)
    merged = upsert(target, source, keys)
    table_format.overwrite(merged, table)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    effective_date: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge, relationally (no Delta needed).

    ``current`` carries (key, attrs..., valid_from, valid_to) with
    ``valid_to IS NULL`` marking the live row per key. ``updates`` carries
    (key, attrs...). Semantics:

    - live row whose attrs differ from its update → closed
      (``valid_to = effective_date``) and a new live row inserted;
    - live row with identical attrs, or no update → unchanged;
    - brand-new key → inserted live;
    - already-closed history rows → passed through untouched.

    One broadcast-ready join of updates against live rows + a union — the
    same shape Delta's SCD2 MERGE compiles to, minus the transaction log.
    Null-safe attr comparison (``<=>``), so NULL→value transitions count
    as changes.
    """
    eff = F.lit(effective_date).cast("date")
    live = current.filter(F.col(valid_to).isNull())
    closed_history = current.filter(F.col(valid_to).isNotNull())

    u = updates.select(
        F.col(key).alias("_u_key"), *[F.col(a).alias(f"_u_{a}") for a in attrs]
    )
    cmp = live.join(F.broadcast(u), live[key] == F.col("_u_key"), "left")
    same = None
    for a in attrs:
        eq = F.col(a).eqNullSafe(F.col(f"_u_{a}"))
        same = eq if same is None else (same & eq)
    changed = F.col("_u_key").isNotNull() & ~same

    untouched = cmp.filter(~changed).select(*current.columns)
    closed_now = cmp.filter(changed).select(
        *[F.col(c) if c != valid_to else eff.alias(valid_to) for c in current.columns]
    )
    opened_now = cmp.filter(changed).select(
        F.col(key),
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
        eff.alias(valid_from),
        F.lit(None).cast("date").alias(valid_to),
    )
    fresh = (
        updates.join(F.broadcast(current.select(key).distinct()), key, "left_anti")
        .select(
            F.col(key),
            *[F.col(a) for a in attrs],
            eff.alias(valid_from),
            F.lit(None).cast("date").alias(valid_to),
        )
    )
    return (
        closed_history.unionByName(untouched)
        .unionByName(closed_now)
        .unionByName(opened_now.select(*current.columns))
        .unionByName(fresh.select(*current.columns))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots of the same table: one row per
    changed key with ``change_type`` in inserted / deleted / updated
    (unchanged keys omitted) — the CDC/regression-check companion to
    ``upsert`` (what changed between yesterday's gold table and today's).

    Comparison is null-safe struct equality over ``compare_cols``
    (default: every non-key column of ``new``), so NULL→value and
    value→NULL both read as updates and no hashing false-negative is
    possible. Plan shape: ONE full-outer sort-merge join keyed on
    ``keys`` — each side shuffles once; snapshots written bucketed on the
    key (`overwrite_bucketed`) diff with zero Exchange. Never a collect,
    never a row-by-row comparison loop.
    """
    compare = list(
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in keys]
    )
    # key-only table: presence is the only signal — updated never fires
    payload = (
        F.struct(*compare) if compare else F.struct(F.lit(0).alias("__c"))
    )
    o = old.select(*keys, payload.alias("__old"))
    n = new.select(*keys, payload.alias("__new"))
    j = o.join(n, on=list(keys), how="full_outer")
    change = (
        F.when(F.col("__old").isNull(), F.lit("inserted"))
        .when(F.col("__new").isNull(), F.lit("deleted"))
        .when(~F.col("__old").eqNullSafe(F.col("__new")), F.lit("updated"))
    )
    return (
        j.select(*keys, change.alias("change_type"))
        .where(F.col("change_type").isNotNull())
    )
