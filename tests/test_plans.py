"""Physical-plan regression guard — the `.explain` properties the 100 TB
design depends on must survive refactors (see tools/plan_audit.py for the
full audit):

  * q1: shipdate predicate reaches the parquet scan (PushedFilters) and the
    scan reads only referenced columns (no l_comment); aggregation is
    partial (map-side combine) below the exchange
  * q5: the dimension chain joins are broadcast, never cartesian
  * audited set: whole-stage codegen spans exist, no CartesianProduct
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plans(spark, name):
    import __spark_entry__ as entrymod
    from tools.plan_audit import plan_of

    df = entrymod.queries()[name](spark, SF_DIR)
    return plan_of(df)  # executed (AQE-final) tree


def test_q1_scan_pushdown_pruning_partial_agg(spark):
    plan = _plans(spark, "q1_pricing")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "l_comment" not in plan  # column pruning reached the scan
    assert "partial_sum" in plan  # map-side combine below the exchange
    assert "*(" in plan  # codegen


def test_q5_broadcasts_dimensions(spark):
    plan = _plans(spark, "q5_region_orders")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    ["cdc_lww_agg", "cdc_lww_semijoin", "cdc_final_state", "dedup_simhash", "tokens_pack"],
)
def test_audited_queries_codegen_no_cartesian(spark, name):
    plan = _plans(spark, name)
    assert "*(" in plan or "WholeStageCodegen" in plan
    assert "CartesianProduct" not in plan
