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


def test_partsupp_derivation_is_broadcast_no_shuffle(spark, sf_dir):
    """The derived partsupp is a broadcast of one scalar over a 4x explode
    of part keys — its subtree must contain no shuffle exchange."""
    from metadata_driven_etl_spark.workloads import _derived_partsupp

    df = _derived_partsupp(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    # the only exchanges allowed: the broadcast of the 1-row count and the
    # single-partition collapse inside that scalar aggregate (1 row wide)
    data_shuffles = (
        plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("Exchange SinglePartition")
    )
    assert data_shuffles == 0, plan


def test_partsupp_pk_distinct(spark, sf_dir):
    """Four distinct suppliers per part (PK guarantee of the stride)."""
    from pyspark.sql import functions as F

    from metadata_driven_etl_spark.workloads import _derived_partsupp

    df = _derived_partsupp(spark, sf_dir)
    assert df.count() == df.select("ps_partkey", "ps_suppkey").distinct().count()
    per_part = df.groupBy("ps_partkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert per_part.filter(F.col("n") != 4).count() == 0


def test_q2_min_cost_window_single_shuffle(spark, sf_dir):
    """Q2's de-correlated min rides ONE shuffle (the window on p_partkey);
    every dimension join broadcasts."""
    plan = _executed(spark, sf_dir, "tpch_q2_min_cost_supplier")
    assert "Window" in plan
    non_broadcast = (
        plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("Exchange SinglePartition")
    )
    assert non_broadcast <= 1, plan


def test_q9_only_fact_join_shuffles(spark, sf_dir):
    """Q9: partsupp/part/supplier/nation broadcast; lineitem-orders is the
    lone shuffle join, and lineitem's scan is pruned to the needed cols."""
    plan = _executed(spark, sf_dir, "tpch_q9_product_profit")
    scans = _scan_columns(plan, "lineitem")
    assert scans and scans[0] <= {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    }, scans
    assert "BroadcastExchange" in plan


def test_q16_blocklist_is_anti_join(spark, sf_dir):
    plan = _executed(spark, sf_dir, "tpch_q16_supplier_cnt")
    assert "LeftAnti" in plan


def test_q20_in_subquery_is_semi_join(spark, sf_dir):
    plan = _executed(spark, sf_dir, "tpch_q20_promotion_suppliers")
    assert "LeftSemi" in plan
