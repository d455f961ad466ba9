"""Plan-shape assertions for the TPC-H completion queries: the properties
that matter at 100 TB (column pruning, filter pushdown, semi/anti join
decorrelation) must survive optimizer changes. Assertions target logical
properties (join type, scanned columns), not physical strategy — AQE is
free to switch broadcast↔SMJ by size."""

from __future__ import annotations

import re

import pytest

from metadata_driven_etl_spark import workloads


def _executed(spark, sf_dir, name):
    df = workloads.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_columns(plan, table):
    """Column lists of every parquet scan of the given table."""
    cols = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\].*?" + table, plan):
        cols.append({c.split("#")[0] for c in m.group(1).split(",") if c})
    # fallback: location string appears after the column list on one line
    if not cols:
        for line in plan.splitlines():
            if "FileScan parquet" in line and table in line:
                m = re.search(r"FileScan parquet \[([^\]]*)\]", line)
                if m:
                    cols.append(
                        {c.split("#")[0] for c in m.group(1).split(",") if c}
                    )
    return cols


def test_q6_scan_is_pruned_and_pushed(spark, sf_dir):
    plan = _executed(spark, sf_dir, "tpch_q6_forecast_revenue")
    scans = _scan_columns(plan, "lineitem")
    assert scans, plan
    # only the four needed columns reach the scan
    assert scans[0] <= {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    }
    # the date/discount/quantity predicates are pushed to the data source
    assert "PushedFilters: [" in plan
    assert "l_discount" in plan.split("PushedFilters")[1][:400]


def test_q4_exists_becomes_semi_join(spark, sf_dir):
    plan = _executed(spark, sf_dir, "tpch_q4_priority_exists")
    assert "LeftSemi" in plan
    # lineitem contributes only the join key and the date condition
    scans = _scan_columns(plan, "lineitem")
    assert scans and scans[0] <= {"l_orderkey", "l_shipdate"}


def test_q21_semi_and_anti_joins(spark, sf_dir):
    plan = _executed(spark, sf_dir, "tpch_q21_waiting_supplier")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    # the anti join carries the strictly-later-shipment condition
    assert re.search(r"LeftAnti.*_sd3", plan), plan


def test_q18_having_subquery_is_semi_join(spark, sf_dir):
    plan = _executed(spark, sf_dir, "tpch_q18_large_orders")
    assert "LeftSemi" in plan


def test_q17_per_part_avg_joins_on_partkey(spark, sf_dir):
    plan = _executed(spark, sf_dir, "tpch_q17_small_qty_revenue")
    # the de-correlated per-part average aggregates on l_partkey
    assert re.search(r"HashAggregate\(keys=\[(pk|l_partkey)", plan), plan


def test_q15_max_equality_keeps_single_row(spark, sf_dir):
    df = workloads.QUERIES["tpch_q15_top_supplier"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 1
    assert len({r["total_revenue"] for r in rows}) == 1


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q19_disjunctive_revenue",
    ],
)
def test_star_queries_prune_lineitem(spark, sf_dir, name):
    plan = _executed(spark, sf_dir, name)
    scans = _scan_columns(plan, "lineitem")
    assert scans
    for cols in scans:
        assert "l_tax" not in cols and "l_returnflag" not in cols, (name, cols)
