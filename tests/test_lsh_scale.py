"""Scale parameterization + hot-bucket handling for the LSH dedup family.

The 100-TB failure mode is quadratic within-bucket work: identical-text
cliques, undersized bucket keys, unsalted self-joins. These tests pin the
three fixes: lsh_params / ann_bits grow with corpus size, salting is
result-invariant, and dedup-first bounds candidates by content diversity
instead of copy counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gridfour_spark import similarity, textops


def test_lsh_params_scale_with_corpus():
    k_small, b_small = textops.lsh_params(10_000, 0.5)
    k_web, b_web = textops.lsh_params(10**12, 0.5)
    r_small, r_web = k_small // b_small, k_web // b_web
    assert r_web > r_small, "rows-per-band must grow with corpus size"
    assert r_web >= 9  # ln(1e12)/ln(20) ~ 9.2
    assert k_web <= 512  # cap respected
    # detection still configured: bands >= 2 everywhere
    assert b_small >= 2 and b_web >= 2


def test_ann_bits_scale_with_corpus():
    assert similarity.ann_bits(1_000) == 8
    assert similarity.ann_bits(50_000) == 8
    assert similarity.ann_bits(10**9) > 8
    assert similarity.ann_bits(10**12) == 24  # capped


def _skewed_corpus(spark, n_clique=300, n_unique=50):
    """One text duplicated n_clique times + n_unique distinct docs."""
    clique = spark.range(n_clique).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog again and again").alias("text"),
    )
    uniq = spark.range(n_unique).select(
        (F.col("id") + 1000).alias("doc_id"),
        # every word id-specific: distinct docs share no shingles
        F.expr(
            "array_join(transform(sequence(0, 11), j -> concat('w', id, 'x', j)), ' ')"
        ).alias("text"),
    )
    return clique.unionByName(uniq)


def test_dedup_first_bounds_clique_candidates(spark):
    docs = _skewed_corpus(spark)
    direct = textops.near_dup_candidates(docs).count()
    canonical = textops.near_dup_candidates(textops.canonical_docs(docs)).count()
    # the 300-copy clique alone is C(300,2) = 44850 candidate pairs direct;
    # after exact dedup the clique is ONE doc
    assert direct >= 44850
    assert canonical < 200


def test_salted_candidates_identical(spark):
    docs = _skewed_corpus(spark, n_clique=40, n_unique=40)
    plain = set(
        (r.doc_a, r.doc_b) for r in textops.near_dup_candidates(docs, n_salts=1).collect()
    )
    salted = set(
        (r.doc_a, r.doc_b) for r in textops.near_dup_candidates(docs, n_salts=4).collect()
    )
    assert plain == salted and len(plain) > 0


def test_salted_embedding_near_dup_identical(spark):
    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 15), j -> CAST(sin(id * 0.7 + j) AS DOUBLE))"
        ).alias("embedding"),
    )
    plain = set(
        (r.vec_a, r.vec_b)
        for r in similarity.embedding_near_dup(emb, threshold=0.5, n_salts=1).collect()
    )
    salted = set(
        (r.vec_a, r.vec_b)
        for r in similarity.embedding_near_dup(emb, threshold=0.5, n_salts=3).collect()
    )
    assert plain == salted and len(plain) > 0


def test_dedup_clusters_matches_union_find(spark):
    """Round-5 cluster collapse: distributed min-label propagation with
    pointer doubling must equal a driver union-find on the same pairs —
    including a LONG CHAIN (the pointer-doubling stressor), a clique, and
    an isolated pair."""
    from gridfour_spark import textops

    pairs = [(i, i + 1) for i in range(100, 140)]          # 41-node chain
    pairs += [(0, 1), (1, 2), (0, 2)]                       # triangle
    pairs += [(500, 900)]                                   # isolated pair
    pairs += [(7, 3), (3, 9)]                               # min id not first
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r.doc_id: (r.cluster_id, r.cluster_size)
           for r in textops.dedup_clusters(pdf).collect()}

    # union-find oracle
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in pairs:
        union(a, b)
    comps = {}
    for node in parent:
        comps.setdefault(find(node), []).append(node)
    exp = {}
    for root, members in comps.items():
        cid = min(members)
        for mm in members:
            exp[mm] = (cid, len(members))
    assert got == exp
    # chain collapsed to one cluster rooted at 100 despite depth 40
    assert got[140] == (100, 41)


def test_kmv_sketch_accuracy_and_mergeability(spark):
    """KMV distinct sketch (round 5): estimate within the theoretical
    ~1/sqrt(k-1) error on a known cardinality, exact below saturation, and
    MERGEABLE — union of two halves' kept sets re-cut to k equals the
    sketch of the union (the partial-aggregate property)."""
    from pyspark.sql.window import Window as W

    from gridfour_spark import textops

    n = 20000
    df = spark.range(n).select(
        F.lit("g").alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    out = textops.kmv_distinct(df, "grp", "val", k=64).collect()[0]
    assert out.n_kept == 64
    rel_err = abs(out.est_distinct - n) / n
    assert rel_err < 4.0 / (64 - 1) ** 0.5, (out.est_distinct, rel_err)

    # below saturation: exact
    small = spark.range(40).select(
        F.lit("s").alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    o2 = textops.kmv_distinct(small, "grp", "val", k=64).collect()[0]
    assert o2.est_distinct == 40 and o2.kth_hash is not None

    # mergeability: bottom-k of (keptA union keptB) == bottom-k of (A union B)
    a = df.filter(F.col("val").substr(2, 10).cast("long") % 2 == 0)
    b = df.filter(F.col("val").substr(2, 10).cast("long") % 2 == 1)
    h = lambda d: d.select(  # noqa: E731
        F.conv(F.substring(F.md5(F.to_binary(F.col("val"), F.lit("utf-8"))), 1, 15),
               16, 10).cast("long").alias("h")).distinct()
    kept = lambda d: {r.h for r in h(d).withColumn(  # noqa: E731
        "rn", F.row_number().over(W.orderBy("h"))).filter(F.col("rn") <= 64).collect()}
    merged = sorted(kept(a) | kept(b))[:64]
    assert set(merged) == kept(df)
