"""Plan-shape regression tests: the optimizations we rely on must stay
visible in the physical plan (pushdown, pruning, broadcast joins)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import __spark_entry__ as entry_mod


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filters_push_to_parquet_scan(spark, sf_dir):
    plan = _plan(entry_mod.q_proj_filter(spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "GreaterThan(o_totalprice,50000.0)" in plan
    # column pruning: the scan must not read unprojected columns
    assert "o_orderpriority" not in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(entry_mod.q_multiway_join(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_bbox_join_broadcasts_polygon_side(spark, sf_dir):
    plan = _plan(entry_mod.q_spatial_bbox_join(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    plan = _plan(entry_mod.q_pricing_summary(spark, sf_dir))
    # map-side partial aggregation around exactly one shuffle
    assert plan.count("HashAggregate") >= 2
    assert plan.count("+- Exchange") == 1
