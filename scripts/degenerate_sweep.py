#!/usr/bin/env python
"""Degenerate-input robustness sweep: every workload vs DuckDB on a
minimal pathological corpus (r12).

The fixture is the SMALLEST corpus that exercises every degenerate
denominator class at once: 1-row dimensions, single-group facts,
constant values, one user/day/label/source, identical documents and
embeddings. On it, every n·(n−1), variance, margin, rate, and fit
denominator in the registry goes to zero — which is exactly where the
two engines historically diverged (Spark-ANSI throws DIVIDE_BY_ZERO
where DuckDB emits inf/nan; DuckDB decimal literals fork from Spark
double literals; SUM-of-indicator counts go NULL where COUNT is 0).

Round-12 ran this sweep and closed every finding (30 keys guarded /
re-oracled — see the two "degenerate inputs" commits); the sweep must
stay empty. Run it whenever a wave of statistics workloads lands:

    python scripts/degenerate_sweep.py            # all keys, ~8 min
    python scripts/degenerate_sweep.py key1,key2  # subset
    python scripts/degenerate_sweep.py --empty    # all-EMPTY tables

The --empty mode sweeps the second pathological slice class: every
table present but ZERO rows (a fresh partition, a filtered-out day).
r12 ran it too and closed its 5 findings (ANSI ROLLUP/CUBE emit a
grand-total row over zero rows where Spark emits none — oracles align
via a no-op HAVING; grouped-vs-global empty aggregates; NULL orphan
sums); it must also stay empty.

Exit code 1 on any mismatch or error. The fast per-pytest pin lives in
tests/test_workload_parity.py::test_degenerate_denominator_parity
(the four-table fixture) and ::test_degenerate_sweep_subset (this
script's full fixture over a representative key set).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_empty_fixture(fx: str) -> None:
    """Write schema-only (zero-row) copies of all 10 tables."""
    import duckdb

    shutil.rmtree(fx, ignore_errors=True)
    os.makedirs(fx)
    con = duckdb.connect()
    for t in ("region", "nation", "supplier", "customer", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet' "
            f"LIMIT 0) TO '{fx}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()


def build_fixture(fx: str) -> None:
    """Write the 10-table degenerate corpus into ``fx``."""
    import duckdb

    shutil.rmtree(fx, ignore_errors=True)
    os.makedirs(fx)
    con = duckdb.connect()

    def copy(sql: str, t: str) -> None:
        con.execute(f"COPY ({sql}) TO '{fx}/{t}.parquet' (FORMAT PARQUET)")

    copy("SELECT 0::INTEGER r_regionkey, 'AMERICA' r_name", "region")
    copy(
        "SELECT 0::INTEGER n_nationkey, 'BRAZIL' n_name,"
        " 0::INTEGER n_regionkey",
        "nation",
    )
    copy(
        "SELECT 1::BIGINT s_suppkey, 'supp one' s_name,"
        " 0::INTEGER s_nationkey, 10.00::DOUBLE s_acctbal",
        "supplier",
    )
    copy(
        "SELECT 1::BIGINT c_custkey, 'cust one' c_name,"
        " 0::INTEGER c_nationkey, 55.50::DOUBLE c_acctbal,"
        " 'BUILDING' c_mktsegment",
        "customer",
    )
    copy(
        "SELECT 1::BIGINT p_partkey, 'one part' p_name,"
        " 'Brand#11' p_brand, 'TYPE A' p_type, 7::INTEGER p_size,"
        " 900.10::DOUBLE p_retailprice",
        "part",
    )
    copy(
        """SELECT 1::BIGINT o_orderkey, 1::BIGINT o_custkey,
                  'O' o_orderstatus, 100.25::DOUBLE o_totalprice,
                  TIMESTAMP '1995-01-01' o_orderdate,
                  '1-URGENT' o_orderpriority
           UNION ALL
           SELECT 3, 1, 'O', 100.25, TIMESTAMP '1995-01-02', '1-URGENT'""",
        "orders",
    )
    copy(
        """SELECT 1::BIGINT l_orderkey, 1::BIGINT l_partkey,
                  1::BIGINT l_suppkey, 1::INTEGER l_linenumber,
                  4.0::DOUBLE l_quantity, 100.25::DOUBLE l_extendedprice,
                  0.05::DOUBLE l_discount, 0.02::DOUBLE l_tax,
                  'N' l_returnflag, 'O' l_linestatus,
                  TIMESTAMP '1995-01-03' l_shipdate""",
        "lineitem",
    )
    copy(
        """SELECT 1::BIGINT event_id,
                  TIMESTAMP_NS '1995-06-01 10:00:00' ts,
                  1::BIGINT user_id, 'view' event_type,
                  1.0::DOUBLE "value", '{}' props
           UNION ALL
           SELECT 2, TIMESTAMP_NS '1995-06-01 10:05:00', 1, 'view',
                  1.0, '{}'""",
        "events",
    )
    copy(
        """SELECT 1::BIGINT doc_id, 'the cat sat on the mat' "text",
                  'en' lang, 'web' source, 22::BIGINT n_chars
           UNION ALL
           SELECT 2, 'the cat sat on the mat', 'en', 'web', 22""",
        "documents",
    )
    copy(
        """SELECT 1::BIGINT vec_id,
                  list_transform(range(64), x -> 0.1::FLOAT) embedding,
                  0::INTEGER "label"
           UNION ALL
           SELECT 2, list_transform(range(64), x -> 0.1::FLOAT), 0""",
        "embeddings",
    )
    con.close()


def main() -> int:
    from metadata_driven_etl_spark import workloads
    from metadata_driven_etl_spark.session import get_local_spark
    from tests.oracle_check import compare

    args = [a for a in sys.argv[1:] if a != "--empty"]
    empty = "--empty" in sys.argv[1:]
    wanted = set(args[0].split(",")) if args else None
    fx = os.path.join(
        tempfile.gettempdir(),
        "empty_sweep_fx" if empty else "degenerate_sweep_fx",
    )
    (build_empty_fixture if empty else build_fixture)(fx)
    spark = get_local_spark(extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("FATAL")
    mismatch, errors = [], []
    for name in workloads.QUERIES:
        if wanted is not None and name not in wanted:
            continue
        try:
            df = workloads.QUERIES[name](spark, fx)
            ok, msg = compare(df, workloads.ORACLES[name], fx, name)
            if not ok:
                mismatch.append(name)
                print(f"MISMATCH {name}: {msg[:400]}", flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            errors.append(name)
            print(f"ERROR {name}: {repr(e)[:300]}", flush=True)
    print(f"mismatches: {mismatch}")
    print(f"errors: {errors}")
    return 1 if (mismatch or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
