"""Structured Streaming: file-source micro-batches through the tile pipeline.

Drives a REAL stream (file source, memory sink): events parquet split into
chunks lands in a watched dir; results must equal the batch computation over
the union of chunks (stream/batch parity — the property Structured Streaming
guarantees and the engine relies on for incremental ingestion)."""

from __future__ import annotations

import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from gridfour_spark import streaming


@pytest.fixture()
def event_chunks(spark):
    src = "/root/testdata/sf0.001/events.parquet"
    d = tempfile.mkdtemp(prefix="stream_in_")
    ev = spark.read.parquet(src)
    # 4 chunks by TIME quartiles (in-order arrival, like a real ingestion
    # feed): watermark semantics DROP rows later than the horizon, so an
    # out-of-order split would legitimately diverge from batch results
    from pyspark.sql.window import Window

    ev = ev.withColumn(
        "_rk", F.row_number().over(Window.orderBy("ts", "event_id"))
    ).withColumn("_chunk", ((F.col("_rk") - 1) * 4 / 1000).cast("int")).drop("_rk")
    for i in range(4):
        ev.filter(F.col("_chunk") == i).drop("_chunk").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/chunk={i}")
    # flatten: move part files into the watched dir root
    import glob
    import os

    for i, f in enumerate(sorted(glob.glob(f"{d}/chunk=*/part-*.parquet"))):
        os.rename(f, f"{d}/file_{i}.parquet")
    for i in range(4):
        shutil.rmtree(f"{d}/chunk={i}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream_to_memory(df, name: str, mode: str):
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    # let all 4 micro-batches drain
    deadline = time.time() + 120
    while time.time() < deadline:
        time.sleep(1.0)
        if not q.status["isDataAvailable"] and not q.status["isTriggerActive"]:
            break
    q.processAllAvailable()
    q.stop()


def test_windowed_counts_stream_equals_batch(spark, event_chunks):
    ev = streaming.read_event_stream(spark, event_chunks)
    out = streaming.windowed_event_counts(ev)
    _run_stream_to_memory(out, "win_counts", "append")
    # append mode only emits windows the watermark has closed; compare those
    got = {
        (r.win_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("select * from win_counts").collect()
    }
    batch = streaming.windowed_event_counts(spark.read.parquet(event_chunks))
    expect = {
        (r.win_start, r.event_type): (r.n_events, r.sum_value) for r in batch.collect()
    }
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert expect[k] == v, k
    # every emitted window is final (watermark-closed) and matches batch
    closed = set(got)
    assert closed.issubset(set(expect))


def test_streaming_tile_counts_equal_batch(spark, event_chunks):
    ev = streaming.read_event_stream(spark, event_chunks)
    out = streaming.streaming_tile_counts(ev)
    _run_stream_to_memory(out, "tile_counts", "complete")
    got = {r.tile_index: r.n_events for r in spark.sql("select * from tile_counts").collect()}
    batch = streaming.streaming_tile_counts(spark.read.parquet(event_chunks))
    expect = {r.tile_index: r.n_events for r in batch.collect()}
    assert got == expect and len(got) > 10


def test_stream_dedup(spark, event_chunks):
    # duplicate every event by unioning the stream dir with itself: simplest
    # is replaying the same files into a second dir entry
    import glob
    import shutil as sh

    for f in glob.glob(f"{event_chunks}/file_*.parquet"):
        sh.copy(f, f.replace("file_", "dup_"))
    ev = streaming.read_event_stream(spark, event_chunks)
    out = streaming.dedup_stream(ev).select("event_id")
    _run_stream_to_memory(out, "dedup_out", "append")
    rows = spark.sql("select event_id from dedup_out").collect()
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids)) == 1000


def test_stateful_tile_stats_stream_equals_batch(spark, event_chunks):
    """applyInPandasWithState custom state: the newest emitted row per tile
    (monotone n_events) must equal the batch aggregate over all chunks."""
    ev = streaming.read_event_stream(spark, event_chunks)
    out = streaming.stateful_tile_stats(ev)
    _run_stream_to_memory(out, "stateful_tiles", "update")
    rows = spark.sql("select * from stateful_tiles").collect()
    assert rows, "stream emitted nothing"
    final = {}
    for r in rows:  # newest state per tile = row with the largest n_events
        cur = final.get(r.tile_index)
        if cur is None or r.n_events > cur.n_events:
            final[r.tile_index] = r
    pts = streaming.event_points(spark.read.parquet(event_chunks)).filter(
        F.col("tile_index") >= 0
    )
    batch = {
        r.tile_index: r
        for r in pts.groupBy("tile_index")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert set(final) == set(batch) and len(final) > 10
    for t, r in final.items():
        b = batch[t]
        assert r.n_events == b.n_events, t
        assert abs(r.sum_value - b.sum_value) < 1e-6 * max(1.0, abs(b.sum_value)), t
        assert r.max_value == b.max_value, t
