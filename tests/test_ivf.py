"""IVF coarse-quantizer ANN: plan shape + trained-centroid quality.

Round-2 verdict items:
  #3 ivf_assign must not shuffle the corpus (no Window over corpus-sized
     input) — asserted on the physical plan.
  #4 Lloyd-trained centroids must beat the LSH recall on a CLUSTERED
     synthetic corpus (the isotropic test embeddings can't separate
     centroid quality).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridfour_spark import similarity as S

from conftest import SF_SMOKE


def _recall(bf, approx, queries, k=5):
    hits = bf.join(approx, on=["q_id", "vec_id"]).count()
    n_q = queries.count()
    return hits / (n_q * k)


def test_ivf_assign_plan_has_no_corpus_window(spark):
    emb = S.load_embeddings(spark, SF_SMOKE)
    cent = S.ivf_centroids(emb, n_lists=16)
    assigned = S.ivf_assign(emb, cent)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Exchange" not in plan, plan  # zero shuffle: scan -> project only


def test_ivf_assign_matches_window_argmin_semantics(spark):
    """The Arrow-kernel argmax must reproduce the oracle's
    ROUND(cos,6) DESC, list_id ASC ordering exactly."""
    emb = S.load_embeddings(spark, SF_SMOKE)
    cent = S.ivf_centroids(emb, n_lists=16)
    got = {r["vec_id"]: r["list_id"] for r in S.ivf_assign(emb, cent).collect()}

    pairs = emb.select("vec_id", S._as_double("embedding").alias("v")).crossJoin(
        F.broadcast(cent)
    )
    sims = pairs.select(
        "vec_id", "list_id", F.round(S._cosine(F.col("v"), F.col("c_vec")), 6).alias("cs")
    ).collect()
    best: dict = {}
    for r in sims:
        key = (-r["cs"], r["list_id"])
        if r["vec_id"] not in best or key < best[r["vec_id"]][0]:
            best[r["vec_id"]] = (key, r["list_id"])
    expect = {k: v[1] for k, v in best.items()}
    assert got == expect


def test_trained_ivf_beats_lsh_on_clustered_corpus(spark):
    emb = S.synth_clustered_embeddings(spark, n=4000, dim=16, n_clusters=32, noise=0.5)
    emb = emb.cache()
    queries = emb.filter(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    bf = S.brute_force_topk(emb, queries, k=5).select("q_id", "vec_id")

    lsh = S.ann_topk(emb, queries, k=5, n_bits=S.ann_bits(4000)).select("q_id", "vec_id")
    cent = S.ivf_train(emb, n_lists=32, n_iters=2)
    ivf = S.ivf_topk(emb, queries, k=5, n_lists=32, nprobe=2, cent=cent).select(
        "q_id", "vec_id"
    )

    r_lsh = _recall(bf, lsh, queries)
    r_ivf = _recall(bf, ivf, queries)
    # trained IVF must beat LSH on clustered data (round-2 done criterion);
    # untrained first-n centroids measured at 0.78 here — training earns it
    r_unt = _recall(bf, S.ivf_topk(emb, queries, k=5, n_lists=32, nprobe=2).select("q_id", "vec_id"), queries)
    assert r_ivf >= r_lsh, (r_ivf, r_lsh)
    assert r_ivf >= 0.9, r_ivf
    assert r_ivf > r_unt, (r_ivf, r_unt)


def test_trained_centroids_recover_clusters(spark):
    """After 2 Lloyd iterations the assignment should align with the true
    cluster labels (clusters are well-separated at noise=0.25)."""
    emb = S.synth_clustered_embeddings(spark, n=1000, dim=16, n_clusters=4, noise=0.25).cache()
    cent = S.ivf_train(emb, n_lists=4, n_iters=2)
    assigned = S.ivf_assign(emb, cent).join(emb.select("vec_id", "label"), on="vec_id")
    # purity: each list should be dominated by one true label
    rows = (
        assigned.groupBy("list_id", "label").count().collect()
    )
    from collections import defaultdict

    per_list = defaultdict(dict)
    for r in rows:
        per_list[r["list_id"]][r["label"]] = r["count"]
    total = sum(sum(d.values()) for d in per_list.values())
    dominant = sum(max(d.values()) for d in per_list.values())
    assert dominant / total >= 0.95, per_list
