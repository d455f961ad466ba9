"""Drop-in config compatibility: the reference's OWN YAML files must load.

SURVEY.md §7.1 commits to keeping the config language schema-compatible with
the reference (`/root/reference/src/config/*.yaml`) so a user can point this
engine at their existing configs unmodified. These tests parse the actual
reference files (read-only) through our validated config model.
"""

from __future__ import annotations

import os

import pytest

from metadata_driven_etl_spark.config.model import (
    PipelineConfig,
    load_config_dir,
)

REF_CONFIG_DIR = "/root/reference/src/config"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CONFIG_DIR), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def ref_configs() -> dict[str, PipelineConfig]:
    return load_config_dir(REF_CONFIG_DIR)


def test_all_layers_parse(ref_configs):
    assert set(ref_configs) == {"bronze", "silver", "gold"}
    for cfg in ref_configs.values():
        assert isinstance(cfg, PipelineConfig)


def test_bronze_sources(ref_configs):
    sources = ref_configs["bronze"].sources
    # reference bronze_config.yaml:4-40 declares 3 file sources
    assert len(sources) >= 3
    by_id = {s.source_id: s for s in sources}
    assert "sales_data" in by_id
    types = {s.source_type for s in sources}
    assert types <= {"file", "jdbc", "api"}


def test_silver_dq_rules(ref_configs):
    transforms = ref_configs["silver"].transformations
    assert transforms, "reference silver config has transformations"
    rule_types = {
        r.rule_type for t in transforms for r in t.data_quality
    }
    # every rule type the reference config uses is one we dispatch
    assert rule_types <= {
        "not_null",
        "regex",
        "expression",
        "referential_integrity",
        "uniqueness",
    }
    for t in transforms:
        assert t.sql_query and "SELECT" in t.sql_query.upper()


def test_gold_models(ref_configs):
    models = ref_configs["gold"].models
    assert models
    for m in models:
        assert m.refresh_type in {"full", "incremental"}
        if m.refresh_type == "incremental":
            assert m.primary_keys, "incremental model needs primary_keys"


def test_lineage_edges_from_configs():
    """M12 extension: upstream→downstream edges derived from config
    metadata (sources + FROM/JOIN clauses of config SQL)."""
    from metadata_driven_etl_spark.config.model import (
        lineage_edges,
        load_config_dir,
    )

    cfgs = load_config_dir("/root/repo/configs")
    edges = {
        (up, down)
        for cfg in cfgs.values()
        for up, down, _ in lineage_edges(cfg)
    }
    assert ("bronze.orders", "silver.orders") in edges
    assert ("silver.orders", "gold.customer_purchase_summary") in edges
    assert ("silver.customer", "gold.customer_purchase_summary") in edges
    # every bronze target has a file upstream
    assert any(up.endswith("orders.parquet") for up, down in edges if down == "bronze.orders")
