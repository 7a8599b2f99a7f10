"""Similarity search over the embeddings table + multimodal column plumbing.

- Brute-force cosine top-k: JVM-side dot products via zip_with + aggregate
  (no Python in the hot path); per-query top-k via window row_number. The
  scale path broadcast-joins the (small) query set against the (huge)
  corpus — one scan, no shuffle of the corpus.
- ANN (LSH sign buckets): bucket = sign bits of the first B components —
  a deterministic random-hyperplane LSH with axis-aligned planes. Candidates
  = same bucket; recall measured against brute force. At 10^12 vectors the
  bucket key becomes the partition key (bucketed table) so queries touch one
  partition per probe.
- Multimodal: media spans get a deterministic fake binary payload; decode /
  feature-extract runs as an Arrow-batched kernel over binary columns with a
  typed metadata struct. Real image/audio codecs aren't in this container, so
  decode_media() raises NotImplementedError for real formats and handles the
  deterministic FAKE format — the Spark-side plumbing (schema, batching,
  partitioning) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT routed through synth.scan_parallel (round-8 A/B): the ANN suite
    # re-scans this frame many times (ann_bits count, IVF training,
    # brute-force legs), and paying a repartition per scan measured 2.3x
    # slower than the single-task scans it parallelizes
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    nb = F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    return dot / F.sqrt(na * nb)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries: (q_id, q_vec). Broadcast the queries; the corpus is scanned
    once; per-query ranking is a window over (q_id) — the shuffled data is
    only |corpus| x |queries| rows of (ids, sim), never the vectors.
    """
    pairs = emb.select(
        "vec_id", _as_double("embedding").alias("v")
    ).crossJoin(F.broadcast(queries.select("q_id", F.col("q_vec").alias("q"))))
    sims = pairs.select(
        "q_id",
        "vec_id",
        F.round(_cosine(F.col("v"), F.col("q")), 6).alias("cos_sim"),
    ).where(F.col("vec_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos_sim")
    )


def brute_force_topk_sql(n_queries: int = 10, k: int = 5) -> str:
    """DuckDB twin: same dot/norm formulas via list_zip + list_transform so
    the summation shape matches, rounded to 6dp before ranking ties on
    (sim desc, vec_id)."""
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < {n_queries}
),
pairs AS (
  SELECT e.vec_id, q.q_id,
         list_sum(list_transform(list_zip(e.embedding, q.q_vec),
                                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
         list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
         list_sum(list_transform(q.q_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nb
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.q_id
),
sims AS (
  SELECT q_id, vec_id, ROUND(dot / sqrt(na * nb), 6) AS cos_sim FROM pairs
),
ranked AS (
  SELECT q_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rank
  FROM sims
)
SELECT q_id, rank, vec_id, cos_sim FROM ranked WHERE rank <= {k}
"""


def ann_bits(n_vecs: int, target_bucket: int = 256, max_bits: int = 24) -> int:
    """Bucket-key width as a function of corpus size: n_bits =
    log2(n/target_bucket) keeps expected bucket occupancy ~target_bucket, so
    the within-bucket work stays constant as the corpus grows (the fixed
    n_bits=8 default is only right up to ~16M vectors). Capped at max_bits
    — beyond that, bucket count exceeds any practical partition count and
    multi-probe recall decays; shard buckets instead."""
    import math

    if n_vecs <= target_bucket:
        return 8
    return int(min(max_bits, max(8, math.ceil(math.log2(n_vecs / target_bucket)))))


def with_sign_bucket(emb: DataFrame, n_bits: int = 8) -> DataFrame:
    """LSH bucket from sign bits of the first n_bits components."""
    b = F.lit(0)
    for j in range(n_bits):
        b = b + F.when(F.element_at("embedding", j + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return emb.withColumn("bucket", b.cast("int"))


def sign_bucket_sql(n_bits: int = 8, table: str = "embeddings") -> str:
    terms = " + ".join(
        f"CASE WHEN embedding[{j + 1}] > 0 THEN {1 << j} ELSE 0 END" for j in range(n_bits)
    )
    return f"SELECT *, CAST({terms} AS INTEGER) AS bucket FROM {table}"


def ann_topk(emb: DataFrame, queries: DataFrame, k: int = 5, n_bits: int = 8) -> DataFrame:
    """Approximate top-k: multi-probe sign-bucket LSH.

    Each query probes its own bucket plus every Hamming-1 neighbor bucket
    (n_bits+1 probes) — the standard multi-probe trick that buys recall
    without growing the index. Equi-join on bucket replaces the cross join;
    at scale the corpus is written bucketed by this key, so a query touches
    n_bits+1 partitions. Recall vs brute force: the ann_recall query."""
    e = with_sign_bucket(emb, n_bits).select("vec_id", "bucket", _as_double("embedding").alias("v"))
    masks = [0] + [1 << j for j in range(n_bits)]
    q = with_sign_bucket(queries.withColumnRenamed("q_vec", "embedding"), n_bits).select(
        F.col("q_id"), F.col("bucket").alias("_qb"), _as_double("embedding").alias("q")
    )
    q = q.withColumn("_mask", F.explode(F.array(*[F.lit(m) for m in masks])))
    q = q.withColumn("bucket", F.col("_qb").bitwiseXOR(F.col("_mask")).cast("int")).drop(
        "_qb", "_mask"
    )
    pairs = e.join(F.broadcast(q), on="bucket").where(F.col("vec_id") != F.col("q_id"))
    sims = pairs.select("q_id", "vec_id", F.round(_cosine(F.col("v"), F.col("q")), 6).alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos_sim")
    )


def ann_topk_sql(n_queries: int = 10, k: int = 5, n_bits: int = 8) -> str:
    terms_e = " + ".join(
        f"CASE WHEN e.embedding[{j + 1}] > 0 THEN {1 << j} ELSE 0 END" for j in range(n_bits)
    )
    terms_q = " + ".join(
        f"CASE WHEN q.q_vec[{j + 1}] > 0 THEN {1 << j} ELSE 0 END" for j in range(n_bits)
    )
    masks = ", ".join(str(m) for m in [0] + [1 << j for j in range(n_bits)])
    return f"""
WITH q0 AS (
  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < {n_queries}
),
q AS (
  SELECT q_id, q_vec, xor(({terms_q.replace('q.q_vec', 'q_vec')}), m) AS probe_bucket
  FROM q0 q, (SELECT unnest([{masks}]) AS m)
),
pairs AS (
  SELECT e.vec_id, q.q_id,
         list_sum(list_transform(list_zip(e.embedding, q.q_vec),
                                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
         list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
         list_sum(list_transform(q.q_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nb
  FROM embeddings e JOIN q ON ({terms_e}) = q.probe_bucket
  WHERE e.vec_id != q.q_id
),
sims AS (SELECT q_id, vec_id, ROUND(dot / sqrt(na * nb), 6) AS cos_sim FROM pairs),
ranked AS (
  SELECT q_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rank
  FROM sims
)
SELECT q_id, rank, vec_id, cos_sim FROM ranked WHERE rank <= {k}
"""


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path complementary to
# sign-bucket LSH: corpus vectors are assigned to their nearest centroid
# (one scan, broadcast centroids); queries probe the nprobe nearest lists.
# At 10^12 vectors the corpus is written bucketed by list_id, so a query
# touches nprobe partitions. Centroids here are DETERMINISTIC (the first
# n_lists corpus vectors) so the DuckDB oracle can replicate assignment
# exactly; production would k-means them — the plan shape is identical.
# --------------------------------------------------------------------------

def ivf_centroids(emb: DataFrame, n_lists: int = 16) -> DataFrame:
    return emb.filter(F.col("vec_id") < n_lists).select(
        F.col("vec_id").alias("list_id"), _as_double("embedding").alias("c_vec")
    )


def _round_half_up(x: np.ndarray, decimals: int = 6) -> np.ndarray:
    """Spark F.round / DuckDB ROUND semantics (HALF_UP away from zero) —
    np.round is half-even, which would disagree on exact .5 boundaries."""
    s = np.sign(x)
    return s * np.floor(np.abs(x) * 10.0**decimals + 0.5) / 10.0**decimals


def ivf_assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine, ties broken on
    the LOWEST list_id (same semantics as the DuckDB oracle's
    ROW_NUMBER ... ORDER BY ROUND(cos,6) DESC, list_id).

    ZERO shuffle: the centroid matrix is broadcast to executors and the
    argmax runs IN-ROW as one Arrow-batched matmul (V_norm @ C_norm.T) —
    the corpus is scanned once and keeps its partitioning; no Window, no
    groupBy, and the vector column never moves. (Round-2 finding: the old
    window-argmin shuffled corpus x n_lists rows including the vectors.)
    """
    spark = emb.sparkSession
    rows = sorted(cent.collect(), key=lambda r: r["list_id"])
    ids = np.array([r["list_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["c_vec"] for r in rows], dtype=np.float64)
    c_norm2 = (mat * mat).sum(axis=1)
    b = spark.sparkContext.broadcast((ids, mat, c_norm2))

    @F.pandas_udf("long")
    def _nearest(vs: pd.Series) -> pd.Series:
        c_ids, c_mat, c_n2 = b.value
        v = np.stack(vs.to_numpy()).astype(np.float64)
        # same formula shape as _cosine: dot / sqrt(|v|^2 * |c|^2)
        sims = (v @ c_mat.T) / np.sqrt((v * v).sum(axis=1)[:, None] * c_n2[None, :])
        sims = _round_half_up(sims, 6)
        # argmax returns the FIRST max -> lowest list_id on ties (rows sorted)
        return pd.Series(c_ids[np.argmax(sims, axis=1)])

    return emb.select(
        "vec_id",
        _as_double("embedding").alias("v"),
        _nearest(_as_double("embedding")).alias("list_id"),
    )


def ivf_train(emb: DataFrame, n_lists: int = 16, n_iters: int = 2) -> DataFrame:
    """Lloyd iterations for the IVF coarse quantizer: assign (zero-shuffle
    broadcast kernel) -> per-list mean. The mean is computed JVM-side via
    posexplode + partial-aggregated groupBy(list_id, pos): the shuffle is
    n_lists x dim partial sums per partition, never the vectors.

    Training is floating-point-order dependent (parallel averaging), so
    trained-IVF quality is verified by the RECALL METRIC on a clustered
    corpus (tests/test_similarity_plans.py, bench.py), not by value hash —
    the hash-checked oracle path keeps the deterministic first-n centroids
    (ivf_centroids)."""
    cent = ivf_centroids(emb, n_lists)
    for _ in range(n_iters):
        assigned = ivf_assign(emb, cent)
        dims = assigned.select("list_id", F.posexplode("v").alias("pos", "x"))
        means = dims.groupBy("list_id", "pos").agg(F.avg("x").alias("m"))
        cent = means.groupBy("list_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("c_vec")
        )
    return cent


def synth_clustered_embeddings(
    spark: SparkSession, n: int = 2000, dim: int = 16, n_clusters: int = 8, noise: float = 0.25
) -> DataFrame:
    """Deterministic CLUSTERED synthetic corpus for honest ANN recall
    measurement (the isotropic test embeddings can't separate centroid
    quality — round-2 verdict). Labels are BLOCKY (cluster = i*k div n), so
    the deterministic first-n centroid seeds all land in cluster 0 and
    untrained IVF starts from a genuinely bad quantizer — Lloyd iterations
    have to earn the recall. All closed-form, generated via spark.range."""
    lbl = f"CAST(vec_id * {n_clusters} / {n} AS INT)"
    sc = f"sin(CAST({lbl} AS DOUBLE) * 12.9898 + CAST(j AS DOUBLE) * 78.233) * 43758.5453"
    nz = f"sin(CAST(vec_id AS DOUBLE) * 93.9898 + CAST(j AS DOUBLE) * 47.233) * 28001.337"
    frac = lambda e: f"(({e}) - floor({e}))"  # noqa: E731
    comp = f"({frac(sc)} * 2.0 - 1.0) + {noise!r} * ({frac(nz)} * 2.0 - 1.0)"
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), j -> CAST({comp} AS DOUBLE))"
        ).alias("embedding"),
        F.expr(f"CAST(id * {n_clusters} / {n} AS INT)").alias("label"),
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    cent: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: queries probe their nprobe nearest lists; the
    candidate set is the union of those inverted lists (equi-join on
    list_id), ranked by exact cosine. Pass cent=ivf_train(...) for Lloyd-
    trained lists; the default deterministic first-n centroids keep the
    DuckDB oracle replicable."""
    if cent is None:
        cent = ivf_centroids(emb, n_lists)
    assigned = ivf_assign(emb, cent)
    qp = queries.select("q_id", _as_double("q_vec").alias("q")).crossJoin(F.broadcast(cent))
    qs = qp.select("q_id", "q", "list_id", F.round(_cosine(F.col("q"), F.col("c_vec")), 6).alias("_cs"))
    wq = Window.partitionBy("q_id").orderBy(F.col("_cs").desc(), F.col("list_id"))
    probes = (
        qs.withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= nprobe)
        .select("q_id", "q", "list_id")
    )
    cand = assigned.join(F.broadcast(probes), on="list_id").where(
        F.col("vec_id") != F.col("q_id")
    )
    sims = cand.select("q_id", "vec_id", F.round(_cosine(F.col("v"), F.col("q")), 6).alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos_sim")
    )


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
        f" / sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        f" * list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )


def ivf_topk_sql(n_queries: int = 10, k: int = 5, n_lists: int = 16, nprobe: int = 4) -> str:
    cos_ec = _cosine_sql("e.embedding", "c.c_vec")
    cos_qc = _cosine_sql("q.q_vec", "c.c_vec")
    cos_eq = _cosine_sql("e.embedding", "q.q_vec")
    return f"""
WITH cent AS (
  SELECT vec_id AS list_id, embedding AS c_vec FROM embeddings WHERE vec_id < {n_lists}
),
assigned AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY ROUND({cos_ec}, 6) DESC, c.list_id) AS rk
    FROM embeddings e CROSS JOIN cent c
  ) WHERE rk = 1
),
q0 AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < {n_queries}),
probes AS (
  SELECT q_id, list_id FROM (
    SELECT q.q_id, c.list_id,
           ROW_NUMBER() OVER (PARTITION BY q.q_id
                              ORDER BY ROUND({cos_qc}, 6) DESC, c.list_id) AS rk
    FROM q0 q CROSS JOIN cent c
  ) WHERE rk <= {nprobe}
),
cand AS (
  SELECT p.q_id, a.vec_id, ROUND({cos_eq}, 6) AS cos_sim
  FROM probes p
  JOIN assigned a ON a.list_id = p.list_id
  JOIN embeddings e ON e.vec_id = a.vec_id
  JOIN q0 q ON q.q_id = p.q_id
  WHERE a.vec_id != p.q_id
),
ranked AS (
  SELECT q_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rank
  FROM cand
)
SELECT q_id, rank, vec_id, cos_sim FROM ranked WHERE rank <= {k}
"""


# --- IVF-PQ: product-quantized ANN (the memory-bounded 100-TB path) ---------
#
# At 10^12 documents the float32 vectors themselves dominate storage
# (16 dims x 4 B = 64 B/vec); product quantization stores m sub-vector
# code indexes instead (m bytes at n_codes <= 256) — a 16x smaller
# candidate index that fits executor memory, with asymmetric-distance
# scoring against reconstructed codewords and an exact re-rank of the
# short list. Same deterministic-first-n / Lloyd-trained split as IVF:
# pq_codebook is DuckDB-replicable, pq_train is recall-verified.


def pq_codebook(df: DataFrame, m: int = 4, n_codes: int = 8, dim: int | None = None,
                vec_col: str = "embedding") -> DataFrame:
    """Deterministic PQ codebook: subspace s's codewords are the s-th
    sub-vectors of the first ``n_codes`` rows (by vec_id) — the exact
    analogue of ivf_centroids' first-n rule, so the DuckDB oracle can
    rebuild it with list_slice. ``vec_col`` lets the caller train over
    RESIDUALS (v - coarse centroid) for the IVFADC form.
    Returns (subspace, code, c_vec)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    dsub = dim // m
    assert dsub * m == dim, (dim, m)
    base = df.filter(F.col("vec_id") < n_codes).select(
        F.col("vec_id").alias("code"), _as_double(vec_col).alias("v")
    )
    parts = [
        base.select(
            F.lit(s).alias("subspace"), "code",
            F.slice("v", s * dsub + 1, dsub).alias("c_vec"),
        )
        for s in range(m)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pq_train(df: DataFrame, m: int = 4, n_codes: int = 8, n_iters: int = 2,
             dim: int | None = None, vec_col: str = "embedding") -> DataFrame:
    """Lloyd-refined PQ codebook, one distributed iteration shape per pass:
    encode (broadcast argmin kernel) -> per-(subspace, code) mean via
    posexplode + partial-aggregated groupBy — the sub-vectors never
    shuffle. Quality is verified by the recall metric (like ivf_train);
    the hash-checked oracle keeps the deterministic pq_codebook."""
    cb = pq_codebook(df, m, n_codes, dim, vec_col)
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    dsub = dim // m
    for _ in range(n_iters):
        enc = pq_encode(df, cb, m, vec_col=vec_col)
        sub = df.join(enc, "vec_id").select(
            "vec_id", _as_double(vec_col).alias("v"), "codes"
        )
        pieces = [
            sub.select(
                F.lit(s).alias("subspace"),
                F.element_at("codes", s + 1).alias("code"),
                F.posexplode(F.slice("v", s * dsub + 1, dsub)).alias("pos", "x"),
            )
            for s in range(m)
        ]
        allp = pieces[0]
        for p in pieces[1:]:
            allp = allp.unionByName(p)
        means = allp.groupBy("subspace", "code", "pos").agg(F.avg("x").alias("mu"))
        cb = means.groupBy("subspace", "code").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mu"))), lambda t: t["mu"]
            ).alias("c_vec")
        )
    return cb


def _codebook_np(codebook: DataFrame) -> np.ndarray:
    """(m, n_codes, dsub) float64 — the broadcastable form."""
    rows = codebook.collect()
    m = max(r["subspace"] for r in rows) + 1
    n_codes = max(r["code"] for r in rows) + 1
    dsub = len(rows[0]["c_vec"])
    cb = np.zeros((m, n_codes, dsub))
    for r in rows:
        cb[r["subspace"], r["code"]] = r["c_vec"]
    return cb


def pq_encode(df: DataFrame, codebook: DataFrame, m: int = 4,
              vec_col: str = "embedding") -> DataFrame:
    """Vector -> m code indexes: per subspace the argmin of ROUND(L2^2, 6)
    over the codewords, ties to the LOWEST code (the DuckDB oracle's
    ROW_NUMBER ... ORDER BY ROUND(d,6), code). One Arrow-batched kernel,
    zero shuffle — the corpus scans once, in place."""
    spark = df.sparkSession
    cb = _codebook_np(codebook)
    b = spark.sparkContext.broadcast(cb)

    @F.pandas_udf("array<int>")
    def _codes(vs: pd.Series) -> pd.Series:
        C = b.value  # (m, n_codes, dsub)
        mm, _nc, dsub = C.shape
        v = np.stack(vs.to_numpy()).astype(np.float64)
        out = np.empty((v.shape[0], mm), dtype=np.int32)
        for s in range(mm):
            sub = v[:, s * dsub:(s + 1) * dsub]
            d = ((sub[:, None, :] - C[s][None, :, :]) ** 2).sum(axis=2)
            out[:, s] = np.argmin(_round_half_up(d, 6), axis=1)  # first min = lowest code
        return pd.Series(list(out))

    return df.select(
        "vec_id", _codes(_as_double(vec_col)).alias("codes")
    )


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    m: int = 4,
    n_codes: int = 8,
    rerank: int = 4,
    residual: bool = True,
    cent: DataFrame | None = None,
    codebook: DataFrame | None = None,
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k: coarse probe like ivf_topk, but candidates
    are scored ASYMMETRICALLY against their reconstructed codewords
    (query stays exact, corpus side is m code bytes) and only the top
    ``rerank * k`` short list re-ranks with exact cosine. The inverted
    index carries (list_id, vec_id, codes) — no float vectors — which is
    what makes the candidate side executor-resident at 100-TB scale.

    residual=True is the IVFADC form: codes quantize v - centroid[list]
    and reconstruction adds the centroid back. Quantizing the residual
    preserves WITHIN-list ordering — raw-vector PQ collapses it (measured
    on the clustered bench corpus: recall@5 0.38 raw vs ~0.9 residual at
    the same m/n_codes/rerank). A codebook passed in must be trained on
    the matching quantity (see pq_train vec_col).

    In production the (list_id, vec_id, codes) inverted index is a STORED
    artifact, not rebuilt per query — build it once with ivfpq_index
    (persist it or write it bucketed by list_id) and pass ``index=``;
    the ad-hoc build here re-derives the assignment/encode kernels."""
    if cent is None:
        cent = ivf_centroids(emb, n_lists)
    spark = emb.sparkSession
    if codebook is None or index is None:
        assigned = ivf_assign(emb, cent)  # (vec_id, v, list_id)
        if residual:
            pv = assigned.join(F.broadcast(cent), "list_id").select(
                "vec_id", "list_id",
                F.zip_with("v", "c_vec", lambda x, c: x - c).alias("pv"),
            )
        else:
            pv = assigned.select("vec_id", "list_id", F.col("v").alias("pv"))
    if codebook is None:
        codebook = pq_codebook(pv, m, n_codes, vec_col="pv")
    cbn = _codebook_np(codebook)
    bcb = spark.sparkContext.broadcast(cbn)

    if index is None:
        enc = pq_encode(pv, codebook, m, vec_col="pv")
        inv = pv.select("vec_id", "list_id").join(enc, "vec_id")
    else:
        inv = index

    qp = queries.select("q_id", _as_double("q_vec").alias("q")).crossJoin(F.broadcast(cent))
    qs = qp.select(
        "q_id", "q", "list_id",
        F.round(_cosine(F.col("q"), F.col("c_vec")), 6).alias("_cs"),
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("_cs").desc(), F.col("list_id"))
    probes = (
        qs.withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= nprobe)
        .select("q_id", "q", "list_id")
    )
    cand = inv.join(F.broadcast(probes), on="list_id").where(
        F.col("vec_id") != F.col("q_id")
    )
    if residual:
        cand = cand.join(F.broadcast(cent), "list_id")
    else:
        cand = cand.withColumn("c_vec", F.lit(None).cast("array<double>"))

    @F.pandas_udf("double")
    def _adc(qv: pd.Series, codes: pd.Series, cvs: pd.Series) -> pd.Series:
        C = bcb.value
        mm, _nc, dsub = C.shape
        q = np.stack(qv.to_numpy()).astype(np.float64)
        cd = np.stack(codes.to_numpy()).astype(np.int64)
        # reconstruct the corpus side from its codewords (one gather),
        # adding the coarse centroid back in the residual form
        recon = np.concatenate([C[s][cd[:, s]] for s in range(mm)], axis=1)
        if cvs.iloc[0] is not None:
            recon = recon + np.stack(cvs.to_numpy()).astype(np.float64)
        num = (q * recon).sum(axis=1)
        den = np.sqrt((q * q).sum(axis=1) * (recon * recon).sum(axis=1))
        return pd.Series(_round_half_up(num / den, 6))

    scored = cand.select(
        "q_id", "vec_id", "q",
        _adc(F.col("q"), F.col("codes"), F.col("c_vec")).alias("approx"),
    )
    wa = Window.partitionBy("q_id").orderBy(F.col("approx").desc(), F.col("vec_id"))
    short = (
        scored.withColumn("_ra", F.row_number().over(wa))
        .filter(F.col("_ra") <= rerank * k)
        .select("q_id", "vec_id", "q")
    )
    # exact re-rank of the short list only (the expensive join touches
    # rerank*k rows per query, not the candidate set)
    exact = short.join(
        emb.select("vec_id", _as_double("embedding").alias("v")), on="vec_id"
    ).select(
        "q_id", "vec_id", F.round(_cosine(F.col("v"), F.col("q")), 6).alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos_sim")
    )


def ivfpq_index(
    emb: DataFrame, cent: DataFrame, codebook: DataFrame, m: int = 4,
    residual: bool = True,
) -> DataFrame:
    """Build the (list_id, vec_id, codes) inverted index once — the stored
    artifact a production deployment persists (write bucketed by list_id
    so a probe reads one bucket). Pass the result to
    ivfpq_topk(index=...) to skip the per-query rebuild."""
    assigned = ivf_assign(emb, cent)
    if residual:
        pv = assigned.join(F.broadcast(cent), "list_id").select(
            "vec_id", "list_id",
            F.zip_with("v", "c_vec", lambda x, c: x - c).alias("pv"),
        )
    else:
        pv = assigned.select("vec_id", "list_id", F.col("v").alias("pv"))
    enc = pq_encode(pv, codebook, m, vec_col="pv")
    return pv.select("vec_id", "list_id").join(enc, "vec_id")


def ivfpq_codebook_trained(
    emb: DataFrame, cent: DataFrame, m: int = 4, n_codes: int = 8, n_iters: int = 2
) -> DataFrame:
    """Lloyd-trained RESIDUAL codebook matching ivfpq_topk(residual=True):
    quantizes v - centroid[list] — training on raw vectors and encoding
    residuals would mismatch silently (the codebook must be built on the
    same quantity the encoder sees)."""
    assigned = ivf_assign(emb, cent)
    pv = assigned.join(F.broadcast(cent), "list_id").select(
        "vec_id", "list_id",
        F.zip_with("v", "c_vec", lambda x, c: x - c).alias("pv"),
    )
    return pq_train(pv, m=m, n_codes=n_codes, n_iters=n_iters, vec_col="pv")


def ivfpq_topk_sql(
    n_queries: int = 10, k: int = 5, n_lists: int = 16, nprobe: int = 4,
    m: int = 4, n_codes: int = 8, dim: int = 16, rerank: int = 4,
    residual: bool = True,
) -> str:
    """DuckDB twin of ivfpq_topk with the deterministic codebook — the
    whole IVF-PQ plan (first-n codebook over residuals, ROUND(d,6) argmin
    encode, centroid + codeword reconstruction, asymmetric cosine, top-R
    cut, exact re-rank) replayed relationally."""
    dsub = dim // m
    cos_ec = _cosine_sql("e.embedding", "c.c_vec")
    cos_qc = _cosine_sql("q.q_vec", "c.c_vec")
    l2 = ("list_sum(list_transform(list_zip(s.sub, cb.c_vec), "
          "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
          "* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))")
    cos_qr = _cosine_sql("q.q_vec", "r.recon")
    cos_eq = _cosine_sql("e.embedding", "q.q_vec")
    subspaces = ", ".join(str(s) for s in range(m))
    if residual:
        pv_expr = ("list_transform(list_zip(e.embedding, ct.c_vec), "
                   "p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))")
        pv_src = f"""pv AS (
  SELECT e.vec_id, a.list_id, {pv_expr} AS pv
  FROM embeddings e
  JOIN assigned a ON a.vec_id = e.vec_id
  JOIN cent ct ON ct.list_id = a.list_id
)"""
        recon_final = ("list_transform(list_zip(ct.c_vec, rr.recon_res), "
                       "p -> CAST(p[1] AS DOUBLE) + CAST(p[2] AS DOUBLE))")
        recon_cte = f"""recon AS (
  SELECT rr.vec_id, rr.list_id, {recon_final} AS recon
  FROM (
    SELECT c.vec_id, ANY_VALUE(p.list_id) AS list_id,
           flatten(list(cb.c_vec ORDER BY c.subspace)) AS recon_res
    FROM codes c
    JOIN cb ON cb.subspace = c.subspace AND cb.code = c.code
    JOIN pv p ON p.vec_id = c.vec_id
    GROUP BY c.vec_id
  ) rr JOIN cent ct ON ct.list_id = rr.list_id
)"""
    else:
        pv_src = """pv AS (
  SELECT e.vec_id, a.list_id,
         list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS pv
  FROM embeddings e JOIN assigned a ON a.vec_id = e.vec_id
)"""
        recon_cte = """recon AS (
  SELECT c.vec_id, ANY_VALUE(cx.list_id) AS list_id,
         flatten(list(cb.c_vec ORDER BY c.subspace)) AS recon
  FROM codes c
  JOIN cb ON cb.subspace = c.subspace AND cb.code = c.code
  JOIN pv cx ON cx.vec_id = c.vec_id
  GROUP BY c.vec_id
)"""
    return f"""
WITH cent AS (
  SELECT vec_id AS list_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c_vec
  FROM embeddings WHERE vec_id < {n_lists}
),
assigned AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY ROUND({cos_ec}, 6) DESC, c.list_id) AS rk
    FROM embeddings e CROSS JOIN cent c
  ) WHERE rk = 1
),
{pv_src},
cb AS (
  SELECT s.s AS subspace, b.vec_id AS code,
         list_slice(b.pv, s.s * {dsub} + 1, (s.s + 1) * {dsub}) AS c_vec
  FROM (SELECT UNNEST([{subspaces}]) AS s) s
  CROSS JOIN (SELECT vec_id, pv FROM pv WHERE vec_id < {n_codes}) b
),
subv AS (
  SELECT p.vec_id, s.s AS subspace,
         list_slice(p.pv, s.s * {dsub} + 1, (s.s + 1) * {dsub}) AS sub
  FROM pv p CROSS JOIN (SELECT UNNEST([{subspaces}]) AS s) s
),
codes AS (
  SELECT vec_id, subspace, code FROM (
    SELECT s.vec_id, s.subspace, cb.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.subspace
                              ORDER BY ROUND({l2}, 6), cb.code) AS rk
    FROM subv s JOIN cb ON cb.subspace = s.subspace
  ) WHERE rk = 1
),
{recon_cte},
q0 AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < {n_queries}),
probes AS (
  SELECT q_id, list_id FROM (
    SELECT q.q_id, c.list_id,
           ROW_NUMBER() OVER (PARTITION BY q.q_id
                              ORDER BY ROUND({cos_qc}, 6) DESC, c.list_id) AS rk
    FROM q0 q CROSS JOIN cent c
  ) WHERE rk <= {nprobe}
),
scored AS (
  SELECT p.q_id, r.vec_id, ROUND({cos_qr}, 6) AS approx
  FROM probes p
  JOIN recon r ON r.list_id = p.list_id
  JOIN q0 q ON q.q_id = p.q_id
  WHERE r.vec_id != p.q_id
),
short AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY approx DESC, vec_id) AS ra
    FROM scored
  ) WHERE ra <= {rerank * k}
),
exact AS (
  SELECT s.q_id, s.vec_id, ROUND({cos_eq}, 6) AS cos_sim
  FROM short s
  JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN q0 q ON q.q_id = s.q_id
)
SELECT q_id, rank, vec_id, cos_sim FROM (
  SELECT q_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rank
  FROM exact
) WHERE rank <= {k}
"""


def embedding_near_dup(
    emb: DataFrame, threshold: float = 0.95, n_bits: int = 8, n_salts: int = 1
) -> DataFrame:
    """Embedding-cosine near-dup pairs via sign-bucket candidate join.

    Scale knobs: n_bits from ann_bits(n_vecs) keeps bucket occupancy flat as
    the corpus grows; n_salts > 1 salts the self-join (left side content-
    salted, right side replicated — result-identical, bounded task sizes)
    for residual hot buckets (e.g. near-zero vectors piling into one sign
    pattern)."""
    e = with_sign_bucket(emb, n_bits).select("vec_id", "bucket", _as_double("embedding").alias("v"))
    if n_salts <= 1:
        joined = e.alias("l").join(e.alias("r"), on="bucket")
    else:
        l = e.withColumn(
            "salt", F.pmod(F.xxhash64(F.col("vec_id").cast("string")), F.lit(n_salts)).cast("int")
        )
        r = e.withColumn("salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)])))
        joined = l.alias("l").join(r.alias("r"), on=["bucket", "salt"])
    pairs = (
        joined.where(F.col("l.vec_id") < F.col("r.vec_id"))
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.round(_cosine(F.col("l.v"), F.col("r.v")), 6).alias("cos_sim"),
        )
    )
    return pairs.filter(F.col("cos_sim") >= threshold)


# --------------------------------------------------------------------------
# multimodal plumbing
# --------------------------------------------------------------------------

MEDIA_SCHEMA = "doc_id bigint, span_offset int, media_ref string, payload binary, media_meta struct<kind:string, width:int, height:int, n_bytes:int>"


def synth_media(spans: DataFrame) -> DataFrame:
    """Deterministic REAL-PNG payloads for media spans (round 7).

    Each media_ref's md5 seeds a gradient image
    ``pixel(y, x, c) = (seed + 31*y + 7*x + 97*c) mod 256`` with dims
    ``(seed_b % 24 + 8) x (seed_c % 24 + 8)``, encoded as an actual PNG
    (gridfour_spark.pngcodec: zlib deflate + rotating scanline filters, so
    every filter type 0..4 appears in the corpus).  Images whose seed is
    divisible by 4 are RGB (3 channels), the rest greyscale — so the
    corpus exercises BOTH color types through the real decoder.  The pixel
    rule is closed-form on md5 hex, which is what lets the DuckDB oracle
    verify features DECODED from the bytes without being able to read PNG
    itself.  Executors encode their own partitions' images inside Arrow
    batches — no driver funnel, no per-row Python outside the codec
    kernel."""
    m = spans.filter(F.col("kind") == "media").select("doc_id", "span_offset", "media_ref")

    out_schema = (
        "doc_id bigint, span_offset int, media_ref string, payload binary, "
        "media_meta struct<kind:string, width:int, height:int, n_bytes:int>"
    )

    def kernel(batches):
        import hashlib

        from gridfour_spark import pngcodec

        for pdf in batches:
            payloads, metas = [], []
            for ref in pdf["media_ref"]:
                hx = hashlib.md5(ref.encode("utf-8")).hexdigest()
                seed = int(hx[0:2], 16)
                w = int(hx[2:4], 16) % 24 + 8
                h = int(hx[4:6], 16) % 24 + 8
                yy, xx = np.indices((h, w))
                base = seed + 31 * yy + 7 * xx
                if seed % 4 == 0:  # RGB: channel offset 97c
                    img = (
                        (base[:, :, None] + 97 * np.arange(3)) % 256
                    ).astype(np.uint8)
                else:
                    img = (base % 256).astype(np.uint8)
                png = pngcodec.encode_png(img, filters=(np.arange(h) + seed) % 5)
                payloads.append(png)
                metas.append(
                    {"kind": "image/png", "width": w, "height": h, "n_bytes": len(png)}
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_offset": pdf["span_offset"],
                    "media_ref": pdf["media_ref"],
                    "payload": payloads,
                    "media_meta": metas,
                }
            )

    return m.mapInPandas(kernel, out_schema)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode / feature-extract over binary media columns via mapInPandas.

    Round 7: image/png payloads go through a REAL decode
    (gridfour_spark.pngcodec — chunk walk + CRC-32 + zlib inflate +
    scanline unfiltering) and the features (width/height from the decoded
    IHDR, mean/max over decoded pixels) come from the bytes, not the
    metadata.  A width/height disagreement between decoded IHDR and the
    typed media_meta fails loudly.  Non-image kinds (audio/video) still
    raise NotImplementedError — those codecs are genuinely not in this
    container.  Batch shape, schema, and partitioning are the production
    plumbing: executors decode their own partitions inside Arrow batches.
    """
    out_schema = (
        "doc_id bigint, span_offset int, media_ref string, kind string, "
        "width int, height int, mean_byte double, max_byte int"
    )

    def kernel(batches):
        from gridfour_spark import pngcodec

        for pdf in batches:
            # one unpack of the meta structs (no per-field .map lambdas)
            meta = pd.DataFrame(pdf["media_meta"].tolist())
            bad = meta["kind"][meta["kind"] != "image/png"]
            if len(bad):
                raise NotImplementedError(
                    f"media decode for {bad.iloc[0]!r} requires codec libs not present in this container"
                )
            widths, heights, means, maxs = [], [], [], []
            for payload, mw, mh in zip(pdf["payload"], meta["width"], meta["height"]):
                img = pngcodec.decode_png(bytes(payload))
                h, w = img.shape[:2]
                if (w, h) != (int(mw), int(mh)):
                    raise ValueError(
                        f"decoded dims {(w, h)} disagree with media_meta {(int(mw), int(mh))}"
                    )
                widths.append(w)
                heights.append(h)
                means.append(float(img.sum(dtype=np.int64)) / img.size)
                maxs.append(int(img.max()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_offset": pdf["span_offset"],
                    "media_ref": pdf["media_ref"],
                    "kind": meta["kind"],
                    "width": np.asarray(widths, dtype=np.int32),
                    "height": np.asarray(heights, dtype=np.int32),
                    "mean_byte": np.asarray(means, dtype=np.float64),
                    "max_byte": np.asarray(maxs, dtype=np.int32),
                }
            )

    return media.mapInPandas(kernel, out_schema)
