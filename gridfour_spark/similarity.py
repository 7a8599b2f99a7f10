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


def ivf_assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (ties broken on
    list_id): broadcast-join the tiny centroid set, window argmin. ONE corpus
    scan; the shuffled rows are (vec_id, list_id, sim) ids only."""
    pairs = emb.select("vec_id", _as_double("embedding").alias("v")).crossJoin(
        F.broadcast(cent)
    )
    sims = pairs.select(
        "vec_id", "v", "list_id", F.round(_cosine(F.col("v"), F.col("c_vec")), 6).alias("_cs")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_cs").desc(), F.col("list_id"))
    return (
        sims.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("vec_id", "list_id", "v")
    )


def ivf_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5, n_lists: int = 16, nprobe: int = 4
) -> DataFrame:
    """IVF approximate top-k: queries probe their nprobe nearest lists; the
    candidate set is the union of those inverted lists (equi-join on
    list_id), ranked by exact cosine."""
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
    """Deterministic fake binary payloads for media spans: payload =
    unhex(md5(ref) repeated), metadata derived from the ref hash. Stands in
    for opaque image/audio bytes with typed metadata."""
    m = spans.filter(F.col("kind") == "media").select("doc_id", "span_offset", "media_ref")
    h = F.md5(F.to_binary("media_ref", F.lit("utf-8")))
    m = m.withColumn("payload", F.to_binary(F.concat(h, h, h, h), F.lit("hex")))
    width = (F.ascii(F.substring(h, 1, 1)) % 64 + 8).cast("int")
    height = (F.ascii(F.substring(h, 2, 1)) % 64 + 8).cast("int")
    meta = F.struct(
        F.lit("image/fake").alias("kind"),
        width.alias("width"),
        height.alias("height"),
        F.length("payload").cast("int").alias("n_bytes"),
    )
    return m.withColumn("media_meta", meta)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode / feature-extract over binary media columns via mapInPandas.

    Real codecs (PIL/ffmpeg) are NOT in this container: any non-fake kind
    raises NotImplementedError (clearly-marked stub). The fake format decodes
    deterministically to (mean_byte, max_byte) 'features'. Batch shape,
    schema, and partitioning are the real production plumbing.
    """
    out_schema = (
        "doc_id bigint, span_offset int, media_ref string, kind string, "
        "width int, height int, mean_byte double, max_byte int"
    )

    def kernel(batches):
        for pdf in batches:
            feats_mean, feats_max = [], []
            for kind, payload in zip(pdf["media_meta"].map(lambda m: m["kind"]), pdf["payload"]):
                if kind != "image/fake":
                    raise NotImplementedError(
                        f"real media decode ({kind}) requires codec libs not present in this container"
                    )
                arr = np.frombuffer(payload, dtype=np.uint8)
                feats_mean.append(float(arr.mean()))
                feats_max.append(int(arr.max()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_offset": pdf["span_offset"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["media_meta"].map(lambda m: m["kind"]),
                    "width": pdf["media_meta"].map(lambda m: m["width"]),
                    "height": pdf["media_meta"].map(lambda m: m["height"]),
                    "mean_byte": feats_mean,
                    "max_byte": feats_max,
                }
            )

    return media.mapInPandas(kernel, out_schema)
