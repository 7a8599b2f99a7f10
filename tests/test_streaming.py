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


def test_stream_to_store_idempotent_sink(spark, event_chunks):
    """foreachBatch -> lineage-committed store: every micro-batch lands as
    its own lineage stage; REPLAYING a batch is a no-op (all buckets
    skipped) — the effective-exactly-once property the engine claims."""
    import glob
    import shutil
    import tempfile

    from gridfour_spark import lineage, store, streaming as S
    from gridfour_spark.spec import GLOBAL_GRID

    base = tempfile.mkdtemp(prefix="stream_store_")
    try:
        ev = S.read_event_stream(spark, event_chunks)
        q = S.stream_to_store(ev, base, "sjob", n_buckets=4)
        deadline = time.time() + 120
        while time.time() < deadline:
            time.sleep(1.0)
            if not q.status["isDataAvailable"] and not q.status["isTriggerActive"]:
                break
        q.processAllAvailable()
        q.stop()

        import os

        stage_dirs = sorted(glob.glob(f"{base}/stage=batch_*"))
        assert len(stage_dirs) >= 2, stage_dirs  # one delta partition per batch
        total_tiles = 0
        for sd in stage_dirs:
            rep = lineage.lineage_report(spark, sd)
            assert rep.count() == 4  # every bucket committed
            total_tiles += rep.agg(F.sum("n_tiles")).collect()[0][0]
        assert total_tiles > 0

        # replay batch 0's content through the same stage id: all buckets skip
        batch0 = spark.read.parquet(sorted(glob.glob(f"{event_chunks}/file_*.parquet"))[0])
        pts = S.event_points(batch0, GLOBAL_GRID).filter(F.col("tile_index") >= 0)
        tiles = store.build_tiles(
            pts.select("row", "col", F.col("value").alias("z")), GLOBAL_GRID, fill=float("nan")
        )
        r = lineage.write_tiles_resumable(
            tiles, os.path.join(base, "stage=batch_0"), "sjob", stage="batch_0", n_buckets=4
        )
        assert r["written_buckets"] == [] and len(r["skipped_buckets"]) == 4

        # the union of delta partitions carries every ingested event's cell
        got = spark.read.option("basePath", base).parquet(f"{base}/stage=*/bucket=*")
        n_cells_stored = got.agg(
            F.sum(F.expr("size(filter(cells, c -> NOT isnan(c)))"))
        ).collect()[0][0]
        ev_all = spark.read.parquet(event_chunks)
        n_distinct_cells = (
            S.event_points(ev_all, GLOBAL_GRID)
            .filter(F.col("tile_index") >= 0)
            .select("row", "col").distinct().count()
        )
        assert n_cells_stored >= n_distinct_cells
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_deltas_compact_into_binary_store(spark, event_chunks):
    """The full ingestion lifecycle: stream -> per-batch staged deltas ->
    compact_stream_deltas folds them into a .gvrs store via update_gvrs.
    Final store = base grid overlaid with the newest streamed value per
    cell; tiles no delta touched are byte-identical to the base store."""
    import glob
    import os
    import struct

    import numpy as np

    from gridfour_spark import gvrsfile as G
    from gridfour_spark import store, synth
    from gridfour_spark import streaming as S
    from gridfour_spark.spec import GLOBAL_GRID

    base = tempfile.mkdtemp(prefix="stream_compact_")
    try:
        # base store: the global DEM
        tiles = store.build_tiles(
            synth.grid_df(spark, GLOBAL_GRID, value="dem"), GLOBAL_GRID
        )
        e = G.default_element("z", "int")
        src = os.path.join(base, "base.gvrs")
        G.write_gvrs(src, GLOBAL_GRID, e,
                     G.gvrs_export_blocks(tiles, GLOBAL_GRID, e, compress=False),
                     compressed=False)

        ev = S.read_event_stream(spark, event_chunks)
        q = S.stream_to_store(ev, base, "cjob", n_buckets=4)
        deadline = time.time() + 120
        while time.time() < deadline:
            time.sleep(1.0)
            if not q.status["isDataAvailable"] and not q.status["isTriggerActive"]:
                break
        q.processAllAvailable()
        q.stop()

        dst = os.path.join(base, "compacted.gvrs")
        stats = S.compact_stream_deltas(spark, base, src, dst)
        assert stats["changed"]

        # expected: newest batch wins per cell. Batches are derived from
        # the CHUNK FILES the stream actually consumed (file_i -> batch i,
        # the file-source trigger order) — no re-derivation of the
        # fixture's split rule, so the oracle tracks it by construction
        from pyspark.sql.window import Window as W

        chunk_files = sorted(glob.glob(os.path.join(event_chunks, "file_*.parquet")))
        assert chunk_files
        ranked = None
        for i, cf in enumerate(chunk_files):
            part = spark.read.parquet(cf).withColumn("_batch", F.lit(i))
            ranked = part if ranked is None else ranked.unionByName(part)
        pts = S.event_points(ranked, GLOBAL_GRID).filter(F.col("tile_index") >= 0)
        latest = (
            pts.withColumn(
                "_rn",
                F.row_number().over(
                    W.partitionBy("row", "col").orderBy(F.desc("_batch"))
                ),
            )
            # ties WITHIN a batch resolve like build_tiles' scatter; pick
            # cells with a unique latest writer to keep the oracle exact
            .withColumn("_n_last", F.count("*").over(
                W.partitionBy("row", "col", "_batch")))
        )
        uniq = latest.filter((F.col("_rn") == 1) & (F.col("_n_last") == 1)).select(
            "row", "col", F.col("value").alias("z")
        ).collect()

        info = G.parse_gvrs_header(dst)
        grid = np.full((info.n_rows, info.n_cols), np.nan)
        tr, tc = info.tile_rows, info.tile_cols
        for ti, arrays in G.read_tile_arrays(dst, info, sorted(info.tile_positions)):
            trow, tcol = divmod(ti, info.n_cols_of_tiles)
            grid[trow * tr:(trow + 1) * tr, tcol * tc:(tcol + 1) * tc] = (
                arrays[0].reshape(tr, tc)[:min(tr, info.n_rows - trow * tr),
                                          :min(tc, info.n_cols - tcol * tc)]
            )
        checked = 0
        for r in uniq:
            got = grid[int(r.row), int(r.col)]
            # int store truncates toward zero like the export kernel
            assert int(got) == int(r.z), (r.row, r.col, got, r.z)
            checked += 1
        assert checked > 50

        # untouched tiles byte-identical between base and compacted store
        def _sizes(p):
            info2 = G.parse_gvrs_header(p)
            out = {}
            with open(p, "rb") as f:
                for ti, pos in info2.tile_positions.items():
                    f.seek(pos); f.read(4)
                    n = struct.unpack("<i", f.read(4))[0]
                    out[ti] = (n, f.read(n))
            return out
        b4, af = _sizes(src), _sizes(dst)
        changed = set(stats["changed"])
        same = [t for t in b4 if t not in changed]
        assert same, "expected some untouched tiles"
        for t in same:
            assert af[t] == b4[t]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_deltas_compact_into_sharded_store(spark):
    """Round-5: the staged-delta compactor also targets SHARDED stores
    (compact_stream_deltas_sharded -> update_gvrs_shards). Oracle: the
    single-file compactor over the same staged deltas — both stores must
    hold identical grids, and newest-batch-wins must hold across stages."""
    import glob
    import os

    import numpy as np

    from gridfour_spark import gvrsfile as G
    from gridfour_spark import store, synth
    from gridfour_spark import streaming as S
    from gridfour_spark.spec import GridSpec

    spec = GridSpec(n_rows=60, n_cols=80, n_rows_in_tile=25, n_cols_in_tile=30,
                    x0=0.5, y0=0.5, cell_size_x=1.0, cell_size_y=1.0)
    base = tempfile.mkdtemp(prefix="stream_shcompact_")
    try:
        grid = np.floor(100 * np.add.outer(np.arange(60) * 0.1, np.arange(80) * 0.2))
        cells = spark.createDataFrame(
            [(int(r), int(c), float(grid[r, c])) for r in range(60) for c in range(80)],
            "row int, col int, z double",
        )
        tiles = store.build_tiles(cells, spec)
        e = G.default_element("z", "int")
        blocks = G.gvrs_export_blocks(tiles, spec, e, compress=False)
        # single-file base + sharded base from the SAME blocks
        src1 = os.path.join(base, "base.gvrs")
        G.write_gvrs(src1, spec, e, blocks, compressed=False)
        shdir = os.path.join(base, "shards")
        G.write_gvrs_shards(
            G.gvrs_export_blocks(tiles, spec, e, compress=False), spec, e,
            shdir, n_shards=3, compressed=False,
        ).collect()

        # staged deltas: batch_0 writes (5,5)=111, batch_2 overwrites it
        # and touches a second tile — layout identical to stream_to_store
        for bi, rows in [(0, [(0, 0, 5, 5, 111.0)]),
                         (2, [(0, 0, 5, 5, 222.0), (1, 1, 30, 40, -7.0)])]:
            pdf = []
            for trow, tcol, r, c, z in rows:
                arr = [None] * (25 * 30)
                arr[(r - trow * 25) * 30 + (c - tcol * 30)] = z
                pdf.append((trow * 3 + tcol, trow, tcol, arr))
            df = spark.createDataFrame(
                pdf, "tile_index long, tile_row int, tile_col int, cells array<double>"
            )
            out = os.path.join(base, f"stage=batch_{bi}", "bucket=0")
            df.write.mode("overwrite").parquet(out)

        stats1 = S.compact_stream_deltas(spark, base, src1, src1, spec=spec)
        stats2 = S.compact_stream_deltas_sharded(
            spark, base, shdir, shdir, spec=spec, n_shards=3)
        assert stats1["changed"] and stats2["tiles_changed"] == 2

        def _grid_single(p):
            info = G.parse_gvrs_header(p)
            g = np.full((60, 80), np.nan)
            for ti, arrays in G.read_tile_arrays(p, info, sorted(info.tile_positions)):
                tr, tc = divmod(ti, info.n_cols_of_tiles)
                r1, c1 = min((tr + 1) * 25, 60), min((tc + 1) * 30, 80)
                g[tr*25:r1, tc*30:c1] = arrays[0].reshape(25, 30)[:r1-tr*25, :c1-tc*30]
            return g

        g1 = _grid_single(src1)
        g2 = np.full((60, 80), np.nan)
        for p in sorted(glob.glob(os.path.join(shdir, "part-*.gvrs"))):
            pi = G.parse_gvrs_header(p)
            for ti, arrays in G.read_tile_arrays(p, pi, sorted(pi.tile_positions)):
                tr, tc = divmod(ti, pi.n_cols_of_tiles)
                r1, c1 = min((tr + 1) * 25, 60), min((tc + 1) * 30, 80)
                g2[tr*25:r1, tc*30:c1] = arrays[0].reshape(25, 30)[:r1-tr*25, :c1-tc*30]
        np.testing.assert_array_equal(g1, g2)
        assert g1[5, 5] == 222.0   # newest batch wins
        assert g1[30, 40] == -7.0
        exp = grid.copy(); exp[5, 5] = 222.0; exp[30, 40] = -7.0
        np.testing.assert_array_equal(g1, exp)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_deltas_compact_into_zarr_store(spark):
    """Round-6: the staged-delta compactor's third target is a Zarr v2
    object store (compact_stream_deltas_zarr -> update_zarr, in-place).
    Oracle: the final array must equal base grid + newest-batch-wins
    overlay, and chunk objects no delta touched must be byte-identical
    to the originally written objects (never opened, never rewritten)."""
    import glob
    import os

    import numpy as np

    from gridfour_spark import streaming as S
    from gridfour_spark import zarrv2 as Z
    from gridfour_spark.spec import GridSpec

    spec = GridSpec(n_rows=60, n_cols=80, n_rows_in_tile=25, n_cols_in_tile=30,
                    x0=0.5, y0=0.5, cell_size_x=1.0, cell_size_y=1.0)
    base = tempfile.mkdtemp(prefix="stream_zcompact_")
    try:
        grid = np.floor(100 * np.add.outer(np.arange(60) * 0.1, np.arange(80) * 0.2))
        cells = spark.createDataFrame(
            [(int(r), int(c), float(grid[r, c])) for r in range(60) for c in range(80)],
            "row int, col int, z double",
        )
        zp = os.path.join(base, "store.zarr")
        Z.write_zarr(cells, zp, shape=(60, 80), chunks=(25, 30), dtype="<f8",
                     compressor={"id": "zlib", "level": 6}, fill_value="NaN")

        # staged deltas, layout identical to stream_to_store: batch_0
        # writes (5,5)=111, batch_2 overwrites it and touches chunk (1,1)
        for bi, rows in [(0, [(0, 0, 5, 5, 111.0)]),
                         (2, [(0, 0, 5, 5, 222.0), (1, 1, 30, 40, -7.0)])]:
            pdf = []
            for trow, tcol, r, c, z in rows:
                arr = [None] * (25 * 30)
                arr[(r - trow * 25) * 30 + (c - tcol * 30)] = z
                pdf.append((trow * 3 + tcol, trow, tcol, arr))
            df = spark.createDataFrame(
                pdf, "tile_index long, tile_row int, tile_col int, cells array<double>"
            )
            df.write.mode("overwrite").parquet(
                os.path.join(base, f"stage=batch_{bi}", "bucket=0"))

        before = {
            p: open(p, "rb").read()
            for p in glob.glob(os.path.join(zp, "[0-9]*.[0-9]*"))
        }
        assert len(before) == 9   # 3x3 chunk grid, fully occupied

        stats = S.compact_stream_deltas_zarr(spark, base, zp, spec=spec)
        assert stats["n_chunks"] == 2 and stats["n_cells"] == 2

        exp = grid.copy(); exp[5, 5] = 222.0; exp[30, 40] = -7.0
        np.testing.assert_array_equal(Z.read_zarr_array(zp), exp)

        # untouched chunk objects byte-identical (O(touched) update cost)
        touched = {os.path.join(zp, "0.0"), os.path.join(zp, "1.1")}
        for p, buf in before.items():
            if p not in touched:
                assert open(p, "rb").read() == buf, p
            else:
                assert open(p, "rb").read() != buf, p
    finally:
        shutil.rmtree(base, ignore_errors=True)
