"""Structured Streaming ingestion (SURVEY §2.5 streaming row).

The reference is a batch library; its ingestion loop (PackageData row-slab
writes) maps to a Structured Streaming job here: a file source feeds
micro-batches of events/documents, each batch runs the SAME tile-assignment
columns as the batch engine, with:

- watermarked event-time tumbling windows for late data
  (windowed_event_counts),
- watermark-scoped streaming dedup (dropDuplicates on id within the
  watermark) for at-least-once sources,
- idempotent sinks via foreachBatch writing through the lineage-committed
  store (lineage.write_tiles_resumable keyed by batch id), which is how the
  engine achieves effective exactly-once at 10^12-doc scale.

Tests drive a real file-source stream (tests/test_streaming.py); the driver
contract exposes the equivalent batch computation for the oracle, since the
driver's harness is batch-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gridfour_spark import synth
from gridfour_spark.spec import GLOBAL_GRID, GridSpec
from gridfour_spark.tiling import with_geo_to_grid, with_tile_assignment

EVENT_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"


def read_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type; late rows beyond
    the watermark are dropped by the engine's state store."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def event_points(events: DataFrame, spec: GridSpec = GLOBAL_GRID) -> DataFrame:
    """Give each event a deterministic geometry (content-keyed, like spans)
    and a tile assignment — the streaming half of the flagship pipeline."""
    e = events.withColumn("doc_id", F.col("event_id")).withColumn(
        "span_offset", (F.col("user_id") % 64).cast("int")
    )
    e = synth.with_span_geometry(e)
    e = with_geo_to_grid(e, spec)
    return with_tile_assignment(e, spec, mark_invalid=True)


def streaming_tile_counts(events: DataFrame, spec: GridSpec = GLOBAL_GRID) -> DataFrame:
    """Per-tile event counts over the stream (update mode aggregation)."""
    pts = event_points(events, spec)
    return (
        pts.groupBy("tile_index")
        .agg(F.count("*").alias("n_events"), F.min("tile_index").alias("_ti"))
        .filter(F.col("_ti") >= 0)
        .drop("_ti")
    )


def stateful_tile_stats(events: DataFrame, spec: GridSpec = GLOBAL_GRID) -> DataFrame:
    """CUSTOM stateful operator via applyInPandasWithState: per-tile running
    (count, sum, max) maintained in the state store across micro-batches —
    the arbitrary-state shape (e.g. online sketches, session models) that
    windowed aggregation can't express. Emits the refreshed state row for
    every tile touched by each batch (update semantics); the newest row per
    tile is the current state."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    pts = event_points(events, spec).filter(F.col("tile_index") >= 0).select(
        "tile_index", "value"
    )

    def update(key, pdfs, state):
        n, s, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            if len(pdf):
                n += len(pdf)
                s += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, s, mx))
        yield pd.DataFrame(
            {"tile_index": [key[0]], "n_events": [n], "sum_value": [s], "max_value": [mx]}
        )

    return pts.groupBy("tile_index").applyInPandasWithState(
        update,
        outputStructType="tile_index long, n_events long, sum_value double, max_value double",
        stateStructType="n long, s double, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_to_store(
    events: DataFrame,
    base: str,
    job_id: str,
    spec: GridSpec = GLOBAL_GRID,
    n_buckets: int = 8,
):
    """Idempotent streaming sink: foreachBatch -> tile build -> the
    lineage-committed resumable store. Each micro-batch lands as its own
    DELTA partition (base/stage=batch_N/bucket=b) with batch-keyed lineage,
    so a replayed micro-batch skips every bucket it already committed —
    effective exactly-once on an at-least-once source. Readers union the
    deltas and merge per tile (store.write_points semantics); production
    compaction folds deltas into the base store (Iceberg MERGE INTO).
    Returns the StreamingQuery."""
    import os

    from gridfour_spark import lineage, store

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        pts = event_points(batch_df, spec).filter(F.col("tile_index") >= 0)
        cells = pts.select("row", "col", F.col("value").alias("z"))
        tiles = store.build_tiles(cells, spec, fill=float("nan"))
        lineage.write_tiles_resumable(
            tiles,
            os.path.join(base, f"stage=batch_{batch_id}"),
            job_id,
            stage=f"batch_{batch_id}",
            n_buckets=n_buckets,
        )

    return (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", f"{base}/_checkpoint_{job_id}")
        .start()
    )


def compact_stream_deltas(
    spark: SparkSession,
    base: str,
    src_gvrs: str,
    dst_gvrs: str,
    spec: GridSpec = GLOBAL_GRID,
) -> dict:
    """Fold every staged streaming delta into the binary store — the
    production compaction stream_to_store's docstring promises, realized
    through gvrsfile.update_gvrs (round 4): untouched tiles copy
    payload-verbatim, touched tiles decode + overlay + re-race.

    Conflict rule across batches: the NEWEST batch wins per cell
    (window by descending batch index), matching replay semantics — a
    cell rewritten in batch 7 must not be resurrected by batch 3's value.
    Delta padding (NaN fill inside staged tile arrays) never erases base
    cells; only written values travel."""
    from gridfour_spark import gvrsfile as G

    delta = _staged_delta(spark, base, spec)
    return G.update_gvrs(spark, src_gvrs, dst_gvrs, delta)


def _staged_delta(spark: SparkSession, base: str, spec: GridSpec):
    """Staged micro-batch partitions -> one (row, col, z) delta frame with
    newest-batch-wins conflict resolution (shared by the single-file and
    sharded compactors)."""
    import glob
    import os

    from pyspark.sql.window import Window

    if not glob.glob(os.path.join(base, "stage=batch_*")):
        raise FileNotFoundError(f"no staged deltas under {base}")
    # ONE scan over every staged partition (review: a per-stage unionByName
    # loop makes the analyzer cost grow with the number of micro-batches);
    # `stage` arrives as a partition column, the batch rank parses from it
    tiles = spark.read.option("basePath", base).parquet(
        os.path.join(base, "stage=*", "bucket=*")
    )
    tiles = tiles.withColumn(
        "_batch", F.regexp_extract(F.col("stage"), r"batch_(\d+)", 1).cast("long")
    ).drop("stage", "bucket")
    # inline tiles_to_cells keeping the batch column through the explode
    rt, ct = spec.n_rows_in_tile, spec.n_cols_in_tile
    ex = tiles.select(
        "_batch", "tile_row", "tile_col", F.posexplode("cells").alias("_iit", "z")
    )
    cells = ex.select(
        "_batch",
        (F.col("tile_row") * rt + F.expr(f"_iit div {ct}")).alias("row"),
        (F.col("tile_col") * ct + F.col("_iit") % ct).alias("col"),
        "z",
    ).filter(
        (F.col("row") < spec.n_rows) & (F.col("col") < spec.n_cols)
        & F.col("z").isNotNull() & ~F.isnan("z")
    )
    w = Window.partitionBy("row", "col").orderBy(F.desc("_batch"))
    return (
        cells.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("row", "col", "z")
    )


def compact_stream_deltas_zarr(
    spark: SparkSession,
    base: str,
    zarr_path: str,
    spec: GridSpec = GLOBAL_GRID,
) -> dict:
    """compact_stream_deltas for a Zarr v2 object store — the cloud-native
    third compaction target. The staged-delta scan and newest-batch-wins
    resolution are shared (_staged_delta); the merge runs through
    zarrv2.update_zarr: each touched chunk object is read-modify-written by
    the executor task that owns it, untouched chunks are never opened, and
    the driver holds only the .zarray JSON. In-place is the native mode —
    one object per chunk makes the per-chunk atomic replace the unit of
    commit, so there is no single-file assembly step at all (contrast the
    GVRS compactors above, whose record-manager merge mirrors
    core/src/main/java/org/gridfour/gvrs/RecordManager.java)."""
    from gridfour_spark import zarrv2 as Z

    delta = _staged_delta(spark, base, spec)
    return Z.update_zarr(delta, zarr_path)


def compact_stream_deltas_sharded(
    spark: SparkSession,
    base: str,
    src_dir: str,
    dst_dir: str,
    spec: GridSpec = GLOBAL_GRID,
    n_shards: int = 16,
) -> dict:
    """compact_stream_deltas for a SHARDED binary store — the 100-TB
    shape: the staged-delta scan and newest-batch-wins resolution are
    identical, then the merge runs through gvrsfile.update_gvrs_shards
    (one shuffle keyed by shard, per-shard compaction in executors,
    O(shards) driver state). In-place (dst_dir == src_dir) is safe via
    the per-shard atomic replace."""
    from gridfour_spark import gvrsfile as G

    delta = _staged_delta(spark, base, spec)
    return G.update_gvrs_shards(spark, src_dir, dst_dir, delta, n_shards=n_shards)
