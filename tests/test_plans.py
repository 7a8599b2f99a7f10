"""Plan-regression tests for the benched top-5 queries (round-5 verdict
next-round #6): a silent Catalyst regression — a BNLJ/cartesian sneaking in,
a row-at-a-time Python UDF, an extra shuffle — must fail the suite, not
show up as a bench slowdown three rounds later.

Assertions are structural negatives plus SHUFFLE UPPER BOUNDS (pinned at
the plan shapes measured in round 6, tightened in round 8): improvements
pass, regressions fail. Round 8 removed grid_stats' two sanctioned
single-row BNLJ crosses entirely (single-scan counts-table rewrite,
raster_ops.grid_stats_with_entropy), so the engine-wide BNLJ budget for
benched grid queries is now zero; token_stats keeps the one sanctioned
single-row corpus-total cross inside corpus_word_logprob."""

from __future__ import annotations

import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

# query -> (max_bnlj, max_exchanges, expectations)
# Round-8 budget notes: queries consuming docs_spans carry ONE extra
# sanctioned exchange — the deterministic keyed repartition that undoes the
# single-row-group test files' one-task scan ceiling (synth.scan_parallel);
# pip additionally gained the zonal counts-table window exchange that
# replaced percentile's unbounded per-group buffer.
_PINS = {
    "flagship": dict(bnlj=0, exchanges=6, broadcast_join=True),
    # round 8: one scan -> per-value counts -> singleton window -> final agg
    "grid_stats": dict(bnlj=0, exchanges=3, broadcast_join=False),
    "ocean_volume": dict(bnlj=0, exchanges=1, broadcast_join=False),
    "bspline": dict(bnlj=0, exchanges=6, broadcast_join=False),
    "near_dup": dict(bnlj=0, exchanges=14, broadcast_join=True),
    # round 7: the real-PNG decode chain is pure mapInPandas (its one
    # exchange is the scan_parallel repartition); token_stats keeps the
    # sanctioned single-row corpus-total cross inside corpus_word_logprob
    "media_features": dict(bnlj=0, exchanges=1, broadcast_join=False),
    "token_stats": dict(bnlj=1, exchanges=10, broadcast_join=True),
    # round 7 suite queries: histogram = hist + marching-squares contour
    # (the block-kernel groupBy is the only contour shuffle); pip =
    # per-point PIP + zonal stats (cover-cell equi-joins, never points x
    # polygons); bilinear = span sampling + the Albers regrid leg
    # (broadcast tile joins on both legs)
    "histogram": dict(bnlj=0, exchanges=3, broadcast_join=False),
    "pip": dict(bnlj=0, exchanges=8, broadcast_join=True),
    "bilinear": dict(bnlj=0, exchanges=9, broadcast_join=True),
}


@pytest.fixture(scope="module")
def plans(spark):
    qs = E.queries()
    out = {}
    for name in _PINS:
        out[name] = (
            qs[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
        )
    return out


@pytest.mark.parametrize("name", sorted(_PINS))
def test_no_cartesian_or_rowwise_python(plans, name):
    plan = plans[name]
    assert "CartesianProduct" not in plan, name
    # row-at-a-time Python UDFs are banned engine-wide; Arrow-batched
    # kernels (ArrowEvalPython / MapInPandas / MapInArrow) are the only
    # sanctioned Python boundary
    assert "BatchEvalPython" not in plan, name


@pytest.mark.parametrize("name", sorted(_PINS))
def test_bnlj_budget(plans, name):
    n = plans[name].count("BroadcastNestedLoopJoin")
    assert n <= _PINS[name]["bnlj"], (name, n)


@pytest.mark.parametrize("name", sorted(_PINS))
def test_shuffle_budget(plans, name):
    # counts ReusedExchange too, so this is a strict upper bound on
    # exchange OPERATORS; a new shuffle stage always raises it
    n = plans[name].count("Exchange")
    assert n <= _PINS[name]["exchanges"], (name, n)


@pytest.mark.parametrize("name", sorted(_PINS))
def test_expected_broadcast_joins_present(plans, name):
    if _PINS[name]["broadcast_join"]:
        assert "BroadcastHashJoin" in plans[name], name


def test_grid_stats_single_scan(spark):
    """Round 8: grid_stats computes stats + entropy from ONE pass over the
    cell generator — exactly one Range source and no joins of any kind
    (the pre-r8 shape evaluated the DEM trig three times through two
    single-row BNLJ crosses)."""
    plan = (
        E.queries()["grid_stats"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Range (") <= 1, plan
    assert "Join" not in plan, plan
    assert "Window" in plan  # the singleton total-count window
