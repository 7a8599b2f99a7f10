"""Checkpointed tile-store sink with per-partition lineage (north_rule resumability).

The reference's flush/close protocol writes dirty tiles then the directories
then the header (GvrsFile.flush:537-542, close:553-633) — crash mid-write and
the file is invalid. The Spark engine replaces this with an idempotent,
resumable sink:

- the tile store is written as parquet partitioned by tile_bucket
  (pmod(tile_index, n_buckets)) — the production target is an Iceberg table
  with bucket(tile_index) partitioning; parquet directories stand in here
  (no Iceberg runtime jars in this sandbox) with the same layout semantics.
- every completed bucket commits a row to a LINEAGE table:
  (job_id, stage, bucket, n_tiles, n_rows, input_fingerprint, wall_ts)
- resume: a killed job re-lists the lineage, ANTI-JOINS completed buckets,
  and computes only the remainder. Because every derivation is a pure
  function of content keys (doc_id, span_offset, row, col — never partition
  ids), recomputation is deterministic and the union of old + new buckets is
  exactly the full result (SURVEY §4 item 4).

Buckets (not raw tile_index) keep the commit granularity bounded: 10^12 docs
-> hundreds of buckets, one atomic rename each.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = "job_id string, stage string, bucket int, n_tiles long, n_rows long, fingerprint string, ts double"


def lineage_path(base: str) -> str:
    return os.path.join(base, "_lineage")


def completed_buckets(spark: SparkSession, base: str, job_id: str, stage: str) -> set[int]:
    p = lineage_path(base)
    if not os.path.exists(p):
        return set()
    rows = (
        spark.read.schema(LINEAGE_SCHEMA)
        .json(p)
        .filter((F.col("job_id") == job_id) & (F.col("stage") == stage))
        .select("bucket")
        .collect()
    )
    return {r.bucket for r in rows}


def _commit_lineage(base: str, record: dict) -> None:
    """One JSON line per completed bucket, atomic rename (the parquet data
    for the bucket is already fully written when this commits)."""
    p = lineage_path(base)
    os.makedirs(p, exist_ok=True)
    fname = f"{record['job_id']}_{record['stage']}_{record['bucket']}.json"
    tmp = os.path.join(p, "." + fname + ".tmp")
    dst = os.path.join(p, fname)
    with open(tmp, "w") as f:
        f.write(json.dumps(record) + "\n")
    os.replace(tmp, dst)


def write_tiles_resumable(
    tiles: DataFrame,
    base: str,
    job_id: str,
    stage: str = "tiles",
    n_buckets: int = 16,
    fingerprint: str = "",
) -> dict:
    """Write the tile store bucket-by-bucket with lineage commits.

    Already-committed buckets are skipped (resume path). Returns counters.
    Per-bucket writes are small enough to be atomic-by-rename; at production
    scale each bucket is one Iceberg append commit instead.
    """
    spark = tiles.sparkSession
    done = completed_buckets(spark, base, job_id, stage)
    tiles = tiles.withColumn("tile_bucket", F.pmod(F.col("tile_index"), F.lit(n_buckets)).cast("int"))
    todo = [b for b in range(n_buckets) if b not in done]
    if todo:
        # ONE write job for every outstanding bucket (partitionBy replaces
        # the former 2-jobs-per-bucket loop — at hundreds of buckets that
        # loop was the driver bottleneck), staged then published by atomic
        # per-bucket rename; a crash mid-stage leaves lineage uncommitted so
        # resume recomputes exactly the unpublished buckets.
        import shutil

        staging = os.path.join(base, f"_staging_{job_id}_{stage}")
        shutil.rmtree(staging, ignore_errors=True)  # leftovers from a crash
        remaining = tiles.filter(F.col("tile_bucket").isin(todo))
        remaining.write.mode("overwrite").partitionBy("tile_bucket").parquet(staging)
        # per-bucket counters in one small job over the staged files. The
        # empty case (all todo buckets empty -> no partition dirs staged) is
        # detected EXPLICITLY; a genuine read failure propagates instead of
        # silently committing n_tiles=0 lineage rows (ADVICE round 2).
        import glob as _glob

        if _glob.glob(os.path.join(staging, "tile_bucket=*")):
            staged = spark.read.option("basePath", staging).parquet(staging)
            stats = {
                r.tile_bucket: (r.n_tiles, int(r.n_rows or 0))
                for r in staged.groupBy("tile_bucket")
                .agg(F.count("*").alias("n_tiles"), F.sum("n_cells").alias("n_rows"))
                .collect()
            }
        else:
            stats = {}
        for b in todo:
            src = os.path.join(staging, f"tile_bucket={b}")
            dst = os.path.join(base, f"bucket={b}")
            if os.path.exists(src):
                shutil.rmtree(dst, ignore_errors=True)  # partial pre-crash data
                os.replace(src, dst)
            n_tiles, n_rows = stats.get(b, (0, 0))
            _commit_lineage(
                base,
                {
                    "job_id": job_id,
                    "stage": stage,
                    "bucket": b,
                    "n_tiles": n_tiles,
                    "n_rows": n_rows,
                    "fingerprint": fingerprint,
                    "ts": time.time(),
                },
            )
        shutil.rmtree(staging, ignore_errors=True)
    return {
        "skipped_buckets": sorted(done),
        "written_buckets": todo,
        "n_buckets": n_buckets,
    }


def read_tiles(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.option("basePath", base).parquet(os.path.join(base, "bucket=*"))


def lineage_report(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.schema(LINEAGE_SCHEMA).json(lineage_path(base))
