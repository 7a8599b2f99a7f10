"""Connected-components convergence (textops.dedup_clusters).

Round-7 finding: min-label propagation + pointer doubling WITHOUT
shortcut-edge augmentation stalls on local-minimum plateaus when node ids
are randomly ordered along a long path — 27 leftover components on a
2000-node permuted path after 25 rounds, while monotone-id paths (the
only long shapes previously tested) converge trivially. These tests pin
the fixed algorithm on adversarial orderings against scalar union-find,
and pin the loud-failure contract (RuntimeError, never silent
under-merge) when rounds are insufficient.
"""

from __future__ import annotations

import random

import pytest

from gridfour_spark import textops
from gridfour_spark.textops import dedup_clusters


@pytest.fixture()
def force_distributed(monkeypatch):
    """Pin the pointer-doubling path: round 8 added a single-task
    union-find fast path below _CC_LOCAL_MAX_EDGES, which these
    adversarial-ordering tests must bypass to keep the doubling
    algorithm itself under test."""
    monkeypatch.setattr(textops, "_CC_LOCAL_MAX_EDGES", 0)


def _h(i: int) -> int:
    return (i * 2654435761 + 12345) % (2**31)


def _uf_components(edges) -> int:
    parent: dict = {}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return len({find(k) for k in parent})


@pytest.mark.parametrize("n", [500, 2000, 8000])
def test_permuted_path_converges(spark, force_distributed, n):
    edges = [(_h(i), _h(i + 1)) for i in range(n)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    k = dedup_clusters(pairs).select("cluster_id").distinct().count()
    assert k == 1


def test_permuted_cycle_converges(spark, force_distributed):
    n = 4000
    edges = [(_h(i), _h((i + 1) % n)) for i in range(n)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    k = dedup_clusters(pairs).select("cluster_id").distinct().count()
    assert k == 1


def test_random_graph_matches_union_find(spark, force_distributed):
    rng = random.Random(7)
    edges = [(rng.randrange(3000), rng.randrange(3000)) for _ in range(2500)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = dedup_clusters(pairs)
    assert out.select("cluster_id").distinct().count() == _uf_components(edges)
    # labels are component minima: every cluster_id is a member of itself
    bad = out.filter("cluster_id > doc_id").join(
        out.select("cluster_id").distinct(), "cluster_id"
    )
    assert out.filter("doc_id = cluster_id").count() == out.select(
        "cluster_id").distinct().count()
    assert bad.count() >= 0  # shape sanity


def test_insufficient_rounds_raises_not_underreports(spark, force_distributed):
    """The failure mode must be LOUD: with too few rounds the call raises
    instead of returning under-merged labels."""
    edges = [(_h(i), _h(i + 1)) for i in range(2000)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        dedup_clusters(pairs, max_iters=3)


def test_string_ids_converge(spark, force_distributed):
    """The contour wide path feeds string vertex ids through the same CC."""
    n = 1500
    edges = [(f"v{_h(i):012d}", f"v{_h(i + 1):012d}") for i in range(n)]
    pairs = spark.createDataFrame(edges, "doc_a string, doc_b string")
    k = dedup_clusters(pairs).select("cluster_id").distinct().count()
    assert k == 1


def test_local_fast_path_matches_distributed(spark, monkeypatch):
    """Round 8: below _CC_LOCAL_MAX_EDGES a single executor union-find
    task resolves the graph directly. Its (doc_id, cluster_id,
    cluster_size) rows must equal the pointer-doubling path's exactly."""
    rng = random.Random(13)
    edges = [(rng.randrange(4000), rng.randrange(4000)) for _ in range(3000)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    local = sorted(map(tuple, dedup_clusters(pairs).collect()))
    monkeypatch.setattr(textops, "_CC_LOCAL_MAX_EDGES", 0)
    dist = sorted(map(tuple, dedup_clusters(pairs).collect()))
    assert local == dist
