"""Zarr v2 source/sink (round 6): pure-numpy implementation of the public
Zarr v2 spec — byte-level golden layout checks (no zarr lib in the
container, so the spec text is the interop authority), distributed
chunk-read with window pushdown, a fully distributed chunk sink, and the
cross-format transcode matrix (Zarr <-> GVRS tiles <-> NetCDF)."""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridfour_spark import zarrv2 as Z


def _demo_grid(nrows=130, ncols=170):
    i, j = np.indices((nrows, ncols))
    return np.round(800.0 * np.sin(i * 0.07) * np.cos(j * 0.03)).astype(np.int32)


# ---------------------------------------------------------------------------
# golden byte-level spec conformance (driver-side codec)
# ---------------------------------------------------------------------------


def test_chunk_bytes_match_spec_zlib(tmp_path):
    """A chunk object must be exactly zlib(C-order raw bytes of the FULL
    chunk shape, edge chunks padded with fill) and the .zarray JSON must
    carry the v2 fields — asserted byte-for-byte from the spec, not via a
    library."""
    p = str(tmp_path / "a.zarr")
    arr = np.arange(12, dtype="<i4").reshape(3, 4)
    Z.write_zarr_array(p, arr, chunks=(2, 3), compressor={"id": "zlib", "level": 6},
                       fill_value=-1)
    meta = json.load(open(os.path.join(p, ".zarray")))
    assert meta["zarr_format"] == 2
    assert meta["shape"] == [3, 4] and meta["chunks"] == [2, 3]
    assert meta["dtype"] == "<i4" and meta["order"] == "C"
    assert meta["compressor"] == {"id": "zlib", "level": 6}
    assert meta["fill_value"] == -1 and meta["filters"] is None
    # chunk (0,0) covers rows 0..1, cols 0..2 fully
    want00 = np.array([[0, 1, 2], [4, 5, 6]], dtype="<i4")
    got = np.frombuffer(
        zlib.decompress(open(os.path.join(p, "0.0"), "rb").read()), dtype="<i4"
    ).reshape(2, 3)
    assert np.array_equal(got, want00)
    # edge chunk (1,1): row 2 only, col 3 only -> padded with fill=-1
    got = np.frombuffer(
        zlib.decompress(open(os.path.join(p, "1.1"), "rb").read()), dtype="<i4"
    ).reshape(2, 3)
    want11 = np.full((2, 3), -1, dtype="<i4")
    want11[0, 0] = 11
    assert np.array_equal(got, want11)


def test_handwritten_store_reads_back(tmp_path):
    """Interop direction 2: a store assembled BY HAND from the spec text
    (raw JSON + zlib'd buffers, no engine writer involved) decodes through
    the engine reader."""
    p = tmp_path / "h.zarr"
    p.mkdir()
    (p / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [4, 4], "chunks": [4, 2],
        "dtype": "<f8", "order": "F",
        "compressor": {"id": "zlib", "level": 1},
        "fill_value": "NaN", "filters": None,
    }))
    left = np.arange(8, dtype="<f8").reshape(4, 2)
    (p / "0.0").write_bytes(zlib.compress(left.ravel(order="F").tobytes()))
    # chunk 0.1 deliberately absent -> fill (NaN)
    info = Z.parse_zarr_array(str(p))
    assert info.order == "F" and np.isnan(info.fill_value)
    out = Z.read_zarr_array(str(p))
    assert np.array_equal(out[:, :2], left)
    assert np.all(np.isnan(out[:, 2:]))


@pytest.mark.parametrize("compressor", [
    {"id": "null"}, {"id": "zlib", "level": 4}, {"id": "gzip", "level": 5},
    {"id": "bz2", "level": 1}, {"id": "lzma"},
])
def test_roundtrip_all_stdlib_codecs(tmp_path, compressor):
    p = str(tmp_path / "c.zarr")
    g = _demo_grid()
    Z.write_zarr_array(p, g, chunks=(64, 64), compressor=compressor)
    assert np.array_equal(Z.read_zarr_array(p), g)


def test_roundtrip_f_order_separator_delta_filter(tmp_path):
    p = str(tmp_path / "f.zarr")
    g = _demo_grid(90, 75)
    Z.write_zarr_array(
        p, g, chunks=(32, 32), order="F", separator="/",
        filters=[{"id": "delta", "dtype": "<i4"}],
        compressor={"id": "zlib", "level": 6},
    )
    # separator "/" nests chunk objects in per-row directories
    assert os.path.exists(os.path.join(p, "0", "1"))
    meta = json.load(open(os.path.join(p, ".zarray")))
    assert meta["dimension_separator"] == "/" and meta["order"] == "F"
    assert np.array_equal(Z.read_zarr_array(p), g)


def test_unsupported_codec_is_honest(tmp_path):
    p = tmp_path / "b.zarr"
    p.mkdir()
    (p / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [2, 2], "chunks": [2, 2], "dtype": "<i4",
        "order": "C", "fill_value": 0, "filters": None,
        "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
    }))
    (p / "0.0").write_bytes(b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="blosc"):
        Z.read_zarr_array(str(p))


# ---------------------------------------------------------------------------
# distributed source
# ---------------------------------------------------------------------------


def test_distributed_cells_match_grid(spark, tmp_path):
    p = str(tmp_path / "d.zarr")
    g = _demo_grid()
    Z.write_zarr_array(p, g, chunks=(48, 48))
    cells = Z.zarr_cells(spark, p).toPandas().sort_values(["row", "col"])
    assert len(cells) == g.size
    got = cells["z"].to_numpy().reshape(g.shape)
    assert np.array_equal(got, g.astype(np.float64))


def test_window_pushdown_opens_only_covering_chunks(spark, tmp_path):
    """Proof of pushdown: delete every chunk OUTSIDE the window after
    writing; the windowed read must still succeed with exact values (it
    never opens them) while those chunks now read back as fill."""
    p = str(tmp_path / "w.zarr")
    g = _demo_grid()
    Z.write_zarr_array(p, g, chunks=(48, 48), fill_value=0)
    # window rows 50..95, cols 60..140 -> chunk rows 1..1, chunk cols 1..2
    keep = {(1, 1), (1, 2)}
    removed = 0
    for f in os.listdir(p):
        if f.startswith("."):
            continue
        ci, cj = map(int, f.split("."))
        if (ci, cj) not in keep:
            os.remove(os.path.join(p, f))
            removed += 1
    assert removed > 0
    w = Z.zarr_cells(spark, p, row_range=(50, 96), col_range=(60, 141))
    pdf = w.toPandas().sort_values(["row", "col"])
    assert len(pdf) == 46 * 81
    want = g[50:96, 60:141].astype(float).ravel()
    assert np.array_equal(pdf["z"].to_numpy(), want)


def test_fill_value_semantics(spark, tmp_path):
    """Default: fill_value is 'value of unwritten cells' (spec), so
    equal-to-fill data passes through as values. fill_as_null=True opts in
    to sentinel semantics; float NaN is always NULL."""
    p = str(tmp_path / "n.zarr")
    g = _demo_grid(40, 40).astype(np.float32)
    g[3, 5] = -9999.0
    Z.write_zarr_array(p, g, chunks=(32, 32), fill_value=-9999.0)
    plain = Z.zarr_cells(spark, p)
    assert plain.filter(F.col("z").isNull()).count() == 0
    assert plain.filter((F.col("row") == 3) & (F.col("col") == 5)
                        ).collect()[0]["z"] == -9999.0
    sent = Z.zarr_cells(spark, p, fill_as_null=True)
    nulls = sent.filter(F.col("z").isNull()).select("row", "col").collect()
    assert {(r["row"], r["col"]) for r in nulls} == {(3, 5)}


# ---------------------------------------------------------------------------
# distributed sink
# ---------------------------------------------------------------------------


def test_distributed_sink_bytes_identical_to_local_writer(spark, tmp_path):
    """write_zarr (executors write chunk objects) and write_zarr_array
    (driver) share encode_chunk — the stores must be byte-identical, chunk
    object by chunk object, and .zarray by .zarray."""
    g = _demo_grid()
    pd_cells = [(int(r), int(c), float(g[r, c]))
                for r in range(g.shape[0]) for c in range(g.shape[1])]
    cells = spark.createDataFrame(pd_cells, "row long, col long, z double")
    p1 = str(tmp_path / "dist.zarr")
    p2 = str(tmp_path / "locl.zarr")
    stats = Z.write_zarr(cells, p1, shape=g.shape, chunks=(48, 48),
                         dtype="<i4", compressor={"id": "zlib", "level": 6})
    Z.write_zarr_array(p2, g, chunks=(48, 48),
                       compressor={"id": "zlib", "level": 6})
    assert stats["n_chunks"] == 12 and stats["n_cells"] == g.size
    assert json.load(open(os.path.join(p1, ".zarray"))) == \
           json.load(open(os.path.join(p2, ".zarray")))
    for f in sorted(os.listdir(p2)):
        if f.startswith("."):
            continue
        b1 = open(os.path.join(p1, f), "rb").read()
        b2 = open(os.path.join(p2, f), "rb").read()
        assert b1 == b2, f
    assert np.array_equal(Z.read_zarr_array(p1), g)


def test_sparse_sink_writes_only_occupied_chunks(spark, tmp_path):
    p = str(tmp_path / "s.zarr")
    cells = spark.createDataFrame(
        [(0, 0, 7.0), (1, 2, 8.0), (200, 300, 9.0)], "row long, col long, z double"
    )
    stats = Z.write_zarr(cells, p, shape=(256, 384), chunks=(64, 64),
                         fill_value=-1)
    assert stats["n_chunks"] == 2  # (0,0) holds two cells; (3,4) one
    out = Z.read_zarr_array(p)
    assert out[0, 0] == 7 and out[1, 2] == 8 and out[200, 300] == 9
    assert out[5, 5] == -1 and out[100, 100] == -1  # absent chunk -> fill


def test_distributed_update_touches_only_delta_chunks(spark, tmp_path):
    """update_zarr read-modify-writes ONLY the chunks holding deltas:
    untouched chunk objects must be byte-identical afterwards (they are
    never opened, let alone rewritten), and the updated store must equal
    the numpy-updated array exactly."""
    p = str(tmp_path / "u.zarr")
    g = _demo_grid()  # 130 x 170, chunks (48,48) -> 3 x 4 grid
    Z.write_zarr_array(p, g, chunks=(48, 48))
    before = {
        f: open(os.path.join(p, f), "rb").read()
        for f in os.listdir(p) if not f.startswith(".")
    }
    deltas = [(0, 0, 111.0), (1, 1, 222.0), (100, 160, 333.0)]
    stats = Z.update_zarr(
        spark.createDataFrame(deltas, "row long, col long, z double"), p
    )
    # (0,0) holds two deltas; (2,3) one -> exactly 2 chunks rewritten
    assert stats["n_chunks"] == 2 and stats["n_cells"] == 3
    want = g.copy()
    for r, c, z in deltas:
        want[r, c] = int(z)
    assert np.array_equal(Z.read_zarr_array(p), want)
    after = {
        f: open(os.path.join(p, f), "rb").read()
        for f in os.listdir(p) if not f.startswith(".")
    }
    changed = {f for f in before if before[f] != after[f]}
    assert changed == {"0.0", "2.3"}


def test_update_into_absent_chunk_starts_from_fill(spark, tmp_path):
    p = str(tmp_path / "ua.zarr")
    cells = spark.createDataFrame([(0, 0, 1.0)], "row long, col long, z double")
    Z.write_zarr(cells, p, shape=(128, 128), chunks=(64, 64), fill_value=-7)
    # chunk (1,1) was never written; an upsert there must seed it with fill
    Z.update_zarr(
        spark.createDataFrame([(100, 100, 5.0)], "row long, col long, z double"), p
    )
    out = Z.read_zarr_array(p)
    assert out[0, 0] == 1 and out[100, 100] == 5
    assert out[100, 101] == -7 and out[64, 64] == -7


def _mean_pool(a: np.ndarray) -> np.ndarray:
    """Factor-2 mean over REAL cells only (edge blocks average what exists),
    the raster_ops.downsample / ExampleDownsample.java:164-205 semantics."""
    nr, nc = -(-a.shape[0] // 2), -(-a.shape[1] // 2)
    out = np.empty((nr, nc), dtype=np.float64)
    for i in range(nr):
        for j in range(nc):
            out[i, j] = a[2 * i : 2 * i + 2, 2 * j : 2 * j + 2].mean()
    return out


def test_pyramid_levels_match_numpy_mean_pool(spark, tmp_path):
    p = str(tmp_path / "pyr.zarr")
    g = _demo_grid(130, 170).astype(np.float64)
    pd_cells = [(int(r), int(c), float(g[r, c]))
                for r in range(g.shape[0]) for c in range(g.shape[1])]
    cells = spark.createDataFrame(pd_cells, "row long, col long, z double")
    stats = Z.write_zarr_pyramid(cells, p, shape=g.shape, n_levels=3,
                                 chunks=(64, 64))
    assert len(stats) == 3
    meta = json.load(open(os.path.join(p, ".zattrs")))
    ds = meta["multiscales"][0]["datasets"]
    assert [d["path"] for d in ds] == ["0", "1", "2"]
    assert ds[2]["coordinateTransformations"][0]["scale"] == [4.0, 4.0]
    assert json.load(open(os.path.join(p, ".zgroup"))) == {"zarr_format": 2}
    want = g
    for lvl in range(3):
        got = Z.read_zarr_array(os.path.join(p, str(lvl)))
        assert got.shape == want.shape, lvl
        assert np.allclose(got, want, rtol=0, atol=1e-9), lvl
        want = _mean_pool(want)


def test_incremental_pyramid_refresh_equals_full_rebuild(spark, tmp_path):
    """update_zarr_pyramid == full rebuild at EVERY level after a point
    update (integer-valued data, so the mean sums are exact and equality is
    exact), and chunks no delta footprint touches are byte-identical at
    every level — the O(touched) property, 4x shrinking per level."""
    import glob

    p = str(tmp_path / "pyr.zarr")
    g = _demo_grid(130, 170).astype(np.float64)
    cells = spark.createDataFrame(
        [(int(r), int(c), float(g[r, c]))
         for r in range(g.shape[0]) for c in range(g.shape[1])],
        "row long, col long, z double",
    )
    Z.write_zarr_pyramid(cells, p, shape=g.shape, n_levels=3, chunks=(64, 64))

    before = {
        q: open(q, "rb").read()
        for lvl in range(3)
        for q in glob.glob(os.path.join(p, str(lvl), "[0-9]*.[0-9]*"))
    }

    # two deltas in level-0 chunk (0,0) and one in (1,2): footprints at
    # level 1 -> chunks (0,0),(0,1); at level 2 -> chunk (0,0)
    edits = [(3, 5, 4000.0), (10, 11, -2500.0), (100, 160, 777.0)]
    deltas = spark.createDataFrame(edits, "row long, col long, z double")
    stats = Z.update_zarr_pyramid(deltas, p)
    assert [s["n_chunks"] for s in stats] == [2, 2, 1]

    g2 = g.copy()
    for r, c, z in edits:
        g2[r, c] = z
    want = g2
    for lvl in range(3):
        got = Z.read_zarr_array(os.path.join(p, str(lvl)))
        np.testing.assert_array_equal(got, want), lvl
        want = _mean_pool(want)

    touched = {os.path.join(p, "0", "0.0"), os.path.join(p, "0", "1.2"),
               os.path.join(p, "1", "0.0"), os.path.join(p, "1", "0.1"),
               os.path.join(p, "2", "0.0")}
    for q, buf in before.items():
        now = open(q, "rb").read()
        if q in touched:
            assert now != buf, q
        else:
            assert now == buf, q

    # level-selected cell view (the read_geotiff_cells(level=) twin),
    # window in LEVEL coordinates
    lv1 = Z.pyramid_cells(spark, p, level=1, row_range=(0, 2), col_range=(0, 2))
    got = {(r.row, r.col): r.z for r in lv1.collect()}
    want1 = _mean_pool(g2)
    assert len(got) == 4
    for (r, c), z in got.items():
        assert z == want1[r, c], (r, c)
    with pytest.raises(ValueError):
        Z.pyramid_cells(spark, p, level=3)


# ---------------------------------------------------------------------------
# cross-format transcode (the PackageData pipeline, Zarr edition)
# ---------------------------------------------------------------------------


def test_transcode_zarr_to_gvrs_tiles_and_netcdf(spark, tmp_path):
    """Zarr -> distributed cells -> GVRS tile store (codec race) -> cells,
    and Zarr -> NetCDF classic — values identical end-to-end. This is the
    reference's PackageData flagship shape (demo/.../PackageData.java)
    with a cloud-native source."""
    from gridfour_spark import netcdf as NC
    from gridfour_spark import store as gstore
    from gridfour_spark import tilecodec
    from gridfour_spark.spec import GridSpec

    g = _demo_grid(96, 128)
    zp = str(tmp_path / "t.zarr")
    Z.write_zarr_array(zp, g, chunks=(48, 48))
    cells = Z.zarr_cells(spark, zp)

    spec = GridSpec(n_rows=96, n_cols=128, n_rows_in_tile=32, n_cols_in_tile=32)
    tiles = gstore.build_tiles(cells, spec)
    packed = tilecodec.compress_tiles(tiles, spec)  # the GVRS codec race
    back = gstore.tiles_to_cells(tilecodec.decompress_tiles(packed, spec), spec)
    a, b = cells.alias("a"), back.alias("b")
    diff = (
        a.join(b, ["row", "col"], "full")
        .filter(~F.col("a.z").eqNullSafe(F.col("b.z")))
        .count()
    )
    assert diff == 0

    ncp = str(tmp_path / "t.nc")
    NC.write_netcdf(ncp, g.astype(np.float64), var="z")
    nc_cells = NC.netcdf_cells(spark, ncp)
    agg = lambda df: df.agg(F.count("*"), F.sum("z"), F.min("z"), F.max("z")).collect()[0]
    assert list(agg(cells)) == list(agg(nc_cells))


# ---------------------------------------------------------------------------
# Zarr v3 (zarr.json metadata, c/-keyed chunks, codec chains)
# ---------------------------------------------------------------------------


def test_v3_golden_layout_and_chunk_bytes(tmp_path):
    """v3 writer output asserted field-by-field against the v3 core spec:
    zarr.json metadata document, 'c/'-prefixed nested chunk keys, and the
    chunk object being exactly gzip(C-order raw bytes, padded)."""
    import gzip as _gz

    p = str(tmp_path / "a3.zarr")
    arr = np.arange(12, dtype="<i4").reshape(3, 4)
    Z.write_zarr_array(p, arr, chunks=(2, 3), zarr_format=3, fill_value=-1)

    meta = json.load(open(os.path.join(p, "zarr.json")))
    assert meta["zarr_format"] == 3
    assert meta["node_type"] == "array"
    assert meta["shape"] == [3, 4]
    assert meta["data_type"] == "int32"
    assert meta["chunk_grid"] == {"name": "regular",
                                  "configuration": {"chunk_shape": [2, 3]}}
    assert meta["chunk_key_encoding"] == {"name": "default",
                                          "configuration": {"separator": "/"}}
    assert meta["fill_value"] == -1
    assert meta["codecs"] == [
        {"name": "bytes", "configuration": {"endian": "little"}},
        {"name": "gzip", "configuration": {"level": 6}},
    ]
    assert not os.path.exists(os.path.join(p, ".zarray"))

    # chunk (1,1): rows 2..2, cols 3..3 -> [[11, -1, -1], [-1, -1, -1]]
    want = np.array([[11, -1, -1], [-1, -1, -1]], dtype="<i4")
    buf = open(os.path.join(p, "c", "1", "1"), "rb").read()
    assert _gz.decompress(buf) == want.tobytes()
    np.testing.assert_array_equal(Z.read_zarr_array(p), arr)


def test_v3_handwritten_store_reads_back(tmp_path):
    """Spec-as-authority direction: a v3 store written BY HAND from the
    spec text (big-endian bytes codec, 'v2' chunk_key_encoding with '.'
    separator, no compression) must read back — proving the reader follows
    the document, not our own writer."""
    p = tmp_path / "hand3.zarr"
    p.mkdir()
    (p / "zarr.json").write_text(json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [2, 5],
        "data_type": "float64",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [2, 3]}},
        "chunk_key_encoding": {"name": "v2",
                               "configuration": {"separator": "."}},
        "fill_value": "NaN",
        "codecs": [{"name": "bytes", "configuration": {"endian": "big"}}],
    }))
    c0 = np.array([[1.5, 2.5, 3.5], [4.5, 5.5, 6.5]], dtype=">f8")
    (p / "0.0").write_bytes(c0.tobytes())
    # chunk (0,1) absent -> fill (NaN)
    got = Z.read_zarr_array(str(p))
    want = np.full((2, 5), np.nan)
    want[:, :3] = c0
    np.testing.assert_array_equal(got, want)
    info = Z.parse_zarr_array(str(p))
    assert info.zarr_format == 3 and info.key_prefix == ""
    assert info.dtype == np.dtype(">f8")


def test_v3_crc32c_codec_roundtrip_and_corruption(tmp_path):
    """The v3 crc32c bytes->bytes codec: appended little-endian Castagnoli
    CRC verifies on decode; a flipped payload byte must raise, not decode
    silently."""
    p = str(tmp_path / "crc3.zarr")
    arr = np.arange(40, dtype="<i4").reshape(5, 8)
    Z.write_zarr_array(
        p, arr, chunks=(5, 8), zarr_format=3, fill_value=0,
        compressor=[{"id": "gzip", "level": 6}, {"id": "crc32c"}])
    meta = json.load(open(os.path.join(p, "zarr.json")))
    assert meta["codecs"][-1] == {"name": "crc32c"}
    np.testing.assert_array_equal(Z.read_zarr_array(p), arr)

    cp = os.path.join(p, "c", "0", "0")
    buf = bytearray(open(cp, "rb").read())
    buf[2] ^= 0xFF
    open(cp, "wb").write(bytes(buf))
    with pytest.raises(ValueError, match="crc32c"):
        Z.read_zarr_array(p)


def test_v3_distributed_sink_cells_update_parity(spark, tmp_path):
    """The distributed kernels serve v3 through the same ZarrInfo: the v3
    sink's cells read back equal to a v2 store of the same grid, and
    update_zarr touches only the delta's 'c/'-keyed object."""
    g = _demo_grid(70, 90)
    cells = spark.createDataFrame(
        [(int(r), int(c), float(g[r, c]))
         for r in range(70) for c in range(90)],
        "row long, col long, z double",
    )
    p2 = str(tmp_path / "v2.zarr")
    p3 = str(tmp_path / "v3.zarr")
    Z.write_zarr(cells, p2, shape=(70, 90), chunks=(32, 32), dtype="<i4")
    st = Z.write_zarr(cells, p3, shape=(70, 90), chunks=(32, 32), dtype="<i4",
                      zarr_format=3)
    assert st["n_chunks"] == 9
    a2 = {(r.row, r.col): r.z for r in Z.zarr_cells(spark, p2).collect()}
    a3 = {(r.row, r.col): r.z for r in Z.zarr_cells(spark, p3).collect()}
    assert a2 == a3 and len(a3) == 70 * 90

    before = open(os.path.join(p3, "c", "0", "0"), "rb").read()
    other = open(os.path.join(p3, "c", "2", "1"), "rb").read()
    deltas = spark.createDataFrame([(3, 4, 999.0)], "row long, col long, z double")
    stats = Z.update_zarr(deltas, p3)
    assert stats["n_chunks"] == 1
    assert open(os.path.join(p3, "c", "0", "0"), "rb").read() != before
    assert open(os.path.join(p3, "c", "2", "1"), "rb").read() == other
    got = Z.zarr_cells(spark, p3, row_range=(3, 4), col_range=(4, 5)).collect()
    assert got[0].z == 999.0


def test_v3_writer_guards(tmp_path):
    with pytest.raises(ValueError, match="fill_value"):
        Z.write_zarr_array(str(tmp_path / "g.zarr"),
                           np.zeros((2, 2), dtype="<i4"),
                           chunks=(2, 2), zarr_format=3, fill_value=None)
    with pytest.raises(NotImplementedError):
        Z.write_zarr_array(str(tmp_path / "g2.zarr"),
                           np.zeros((2, 2), dtype="<i4"),
                           chunks=(2, 2), zarr_format=3, fill_value=0,
                           compressor=[{"id": "zstd"}])


def test_v3_pyramid_group_and_incremental_refresh(spark, tmp_path):
    """zarr_format=3 pyramid: group-node zarr.json carries the multiscale
    attrs, every level is a v3 array, values match the numpy pool, and the
    incremental refresh runs format-agnostically on it."""
    p = str(tmp_path / "pyr3.zarr")
    g = _demo_grid(70, 90).astype(np.float64)
    cells = spark.createDataFrame(
        [(int(r), int(c), float(g[r, c]))
         for r in range(70) for c in range(90)],
        "row long, col long, z double",
    )
    Z.write_zarr_pyramid(cells, p, shape=g.shape, n_levels=2, chunks=(64, 64),
                         zarr_format=3)
    gmeta = json.load(open(os.path.join(p, "zarr.json")))
    assert gmeta["zarr_format"] == 3 and gmeta["node_type"] == "group"
    assert [d["path"] for d in
            gmeta["attributes"]["multiscales"][0]["datasets"]] == ["0", "1"]
    assert not os.path.exists(os.path.join(p, ".zgroup"))
    for lvl in ("0", "1"):
        assert json.load(open(os.path.join(p, lvl, "zarr.json")))["node_type"] == "array"
    np.testing.assert_array_equal(Z.read_zarr_array(os.path.join(p, "0")), g)
    np.testing.assert_array_equal(Z.read_zarr_array(os.path.join(p, "1")),
                                  _mean_pool(g))

    deltas = spark.createDataFrame([(2, 3, 5000.0)], "row long, col long, z double")
    stats = Z.update_zarr_pyramid(deltas, p)
    assert [s["n_chunks"] for s in stats] == [1, 1]
    g2 = g.copy(); g2[2, 3] = 5000.0
    np.testing.assert_array_equal(Z.read_zarr_array(os.path.join(p, "0")), g2)
    np.testing.assert_array_equal(Z.read_zarr_array(os.path.join(p, "1")),
                                  _mean_pool(g2))
    # level-selected view resolves through the v3 group metadata
    got = Z.pyramid_cells(spark, p, level=1, row_range=(1, 2),
                          col_range=(1, 2)).collect()
    assert got[0].z == _mean_pool(g2)[1, 1]


def test_v3_sharding_golden_layout(tmp_path):
    """sharding_indexed golden check: the shard object is inner-chunk
    payloads (C-order inner grid) + a uint64-LE (offset,nbytes) index
    (+ crc32c) at the end; all-fill inner chunks are omitted with the
    2^64-1 sentinel — the GVRS skip-all-fill tile rule (T7), v3 edition."""
    import gzip as _gz
    import struct as _st

    from gridfour_spark.floatcodec import crc32c

    p = str(tmp_path / "sh.zarr")
    arr = np.full((4, 4), 7, dtype="<i4")
    arr[0, 0] = 1
    arr[2, 3] = 9   # inner grid 2x2 of 2x2 blocks; block (1,0) stays fill=7
    arr[2, 0] = 7
    arr[3, :2] = 7
    Z.write_zarr_array(
        p, arr, chunks=(4, 4), zarr_format=3, fill_value=7,
        compressor={"id": "shard", "inner_chunks": (2, 2),
                    "codecs": [{"id": "gzip", "level": 6}]})

    meta = json.load(open(os.path.join(p, "zarr.json")))
    [codec] = meta["codecs"]
    assert codec["name"] == "sharding_indexed"
    cfg = codec["configuration"]
    assert cfg["chunk_shape"] == [2, 2]
    assert cfg["codecs"][0]["name"] == "bytes"
    assert cfg["codecs"][1]["name"] == "gzip"
    assert cfg["index_codecs"] == [
        {"name": "bytes", "configuration": {"endian": "little"}},
        {"name": "crc32c"}]
    assert cfg["index_location"] == "end"

    buf = open(os.path.join(p, "c", "0", "0"), "rb").read()
    idx_raw = buf[-(16 * 4 + 4):]
    assert _st.unpack("<I", idx_raw[-4:])[0] == crc32c(idx_raw[:-4])
    pairs = np.frombuffer(idx_raw[:-4], dtype="<u8").reshape(4, 2)
    # inner block (1,0) (flat index 2) is all-fill -> sentinel
    assert pairs[2, 0] == 0xFFFFFFFFFFFFFFFF
    # decode inner block (0,0) by hand
    off, nb = int(pairs[0, 0]), int(pairs[0, 1])
    got = np.frombuffer(_gz.decompress(buf[off:off + nb]),
                        dtype="<i4").reshape(2, 2)
    np.testing.assert_array_equal(got, arr[:2, :2])
    np.testing.assert_array_equal(Z.read_zarr_array(p), arr)


def test_v3_sharding_distributed_roundtrip_and_update(spark, tmp_path):
    """The distributed kernels treat a shard as their chunk unit: sink,
    pushdown read, and per-shard upsert all work unchanged, and the store
    holds one object per 64x64 shard (16 inner 16x16 chunks inside)."""
    g = _demo_grid(100, 130)
    cells = spark.createDataFrame(
        [(int(r), int(c), float(g[r, c]))
         for r in range(100) for c in range(130)],
        "row long, col long, z double",
    )
    p = str(tmp_path / "shd.zarr")
    st = Z.write_zarr(cells, p, shape=(100, 130), chunks=(64, 64),
                      dtype="<i4", zarr_format=3,
                      compressor={"id": "shard", "inner_chunks": (16, 16)})
    assert st["n_chunks"] == 6   # 2x3 shard grid
    a = {(r.row, r.col): r.z for r in Z.zarr_cells(spark, p).collect()}
    assert len(a) == 100 * 130
    assert all(a[(r, c)] == float(g[r, c])
               for r in range(0, 100, 7) for c in range(0, 130, 11))

    before = open(os.path.join(p, "c", "0", "0"), "rb").read()
    other = open(os.path.join(p, "c", "1", "1"), "rb").read()
    deltas = spark.createDataFrame([(5, 6, -1234.0)],
                                   "row long, col long, z double")
    assert Z.update_zarr(deltas, p)["n_chunks"] == 1
    assert open(os.path.join(p, "c", "0", "0"), "rb").read() != before
    assert open(os.path.join(p, "c", "1", "1"), "rb").read() == other
    got = Z.zarr_cells(spark, p, row_range=(5, 6), col_range=(6, 7)).collect()
    assert got[0].z == -1234.0


def test_v3_sharding_handwritten_and_index_corruption(tmp_path):
    """Spec-as-authority: a shard assembled by hand (raw inner chunks, no
    compression, crc32c'd end index) decodes; corrupting the index raises."""
    import struct as _st

    from gridfour_spark.floatcodec import crc32c

    p = tmp_path / "hsh.zarr"
    p.mkdir()
    (p / "zarr.json").write_text(json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [2, 4],
        "data_type": "int32",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [2, 4]}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": "/"}},
        "fill_value": -1,
        "codecs": [{"name": "sharding_indexed", "configuration": {
            "chunk_shape": [2, 2],
            "codecs": [{"name": "bytes",
                        "configuration": {"endian": "little"}}],
            "index_codecs": [
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "crc32c"}],
            "index_location": "end"}}],
    }))
    left = np.array([[1, 2], [3, 4]], dtype="<i4")
    payload = left.tobytes()
    idx = _st.pack("<QQ", 0, len(payload)) + _st.pack(
        "<QQ", 0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFF)
    idx += _st.pack("<I", crc32c(idx))
    shard_path = p / "c" / "0" / "0"
    shard_path.parent.mkdir(parents=True)
    shard_path.write_bytes(payload + idx)

    got = Z.read_zarr_array(str(p))
    want = np.full((2, 4), -1, dtype="<i4")
    want[:, :2] = left
    np.testing.assert_array_equal(got, want)

    buf = bytearray(shard_path.read_bytes())
    buf[-6] ^= 0xFF   # flip a byte inside the index
    shard_path.write_bytes(bytes(buf))
    with pytest.raises(ValueError, match="crc32c"):
        Z.read_zarr_array(str(p))


def test_v3_shard_partial_read_bounded_bytes(spark, tmp_path):
    """Partial-shard reads (round 7): a window read probes the crc32c'd
    index and range-reads ONLY the touched inner chunks — bytes_read is
    bounded by index + touched-chunk bytes (mirroring the paged GVRS
    directory proof), values identical to the whole-shard decode."""
    g = _demo_grid(128, 128)
    cells = spark.createDataFrame(
        [(int(r), int(c), float(g[r, c]))
         for r in range(128) for c in range(128)],
        "row long, col long, z double",
    )
    p = str(tmp_path / "pshd.zarr")
    Z.write_zarr(cells, p, shape=(128, 128), chunks=(128, 128),
                 dtype="<i4", zarr_format=3,
                 compressor={"id": "shard", "inner_chunks": (16, 16),
                             "codecs": [{"id": "gzip", "level": 6}]})
    info = Z.parse_zarr_array(p)
    shard_file = os.path.join(p, "c", "0", "0")
    shard_bytes = os.path.getsize(shard_file)
    idx_len = 16 * 64 + 4  # 8x8 inner grid, crc32c'd

    # one inner chunk's window: index + exactly 1 inner chunk
    win, nread = Z.read_shard_window(shard_file, info, 20, 28, 36, 44)
    np.testing.assert_array_equal(win, g[20:28, 36:44])
    # the whole shard is 64 compressed inner chunks; reading 1 must cost
    # about 1/64 of the payload + the index
    payload = shard_bytes - idx_len
    assert nread <= idx_len + payload // 32, (nread, shard_bytes)

    # 2x2 inner chunks straddling boundaries
    win, nread = Z.read_shard_window(shard_file, info, 10, 30, 10, 30)
    np.testing.assert_array_equal(win, g[10:30, 10:30])
    assert nread <= idx_len + payload // 8

    # the distributed window read goes through the same partial path and
    # matches the full-scan values
    got = {(r.row, r.col): r.z
           for r in Z.zarr_cells(spark, p, row_range=(20, 28),
                                 col_range=(36, 44)).collect()}
    assert got == {(r, c): float(g[r, c])
                   for r in range(20, 28) for c in range(36, 44)}

    # index CRC tamper is caught by the PARTIAL path too
    buf = bytearray(open(shard_file, "rb").read())
    buf[-6] ^= 0xFF  # inside the index body
    open(shard_file, "wb").write(bytes(buf))
    with pytest.raises(ValueError, match="crc32c"):
        Z.read_shard_window(shard_file, info, 0, 8, 0, 8)


def test_v3_shard_partial_read_sparse_inner_chunks(spark, tmp_path):
    """Absent inner chunks (sentinel 2^64-1) inside the window surface as
    fill without any extra bytes read beyond the index."""
    cells = spark.createDataFrame(
        [(0, 0, 7.0), (100, 100, 9.0)], "row long, col long, z double")
    p = str(tmp_path / "sparse.zarr")
    Z.write_zarr(cells, p, shape=(128, 128), chunks=(128, 128),
                 dtype="<i4", fill_value=-5, zarr_format=3,
                 compressor={"id": "shard", "inner_chunks": (16, 16)})
    info = Z.parse_zarr_array(p)
    shard_file = os.path.join(p, "c", "0", "0")
    idx_len = 16 * 64 + 4
    # window over an entirely-absent inner chunk: index bytes only
    win, nread = Z.read_shard_window(shard_file, info, 32, 48, 32, 48)
    assert nread == idx_len
    assert (win == -5).all()
    # window over the occupied corner
    win, nread = Z.read_shard_window(shard_file, info, 0, 4, 0, 4)
    assert win[0, 0] == 7 and (win.ravel()[1:] == -5).all()


def test_v3_transpose_handwritten_store(spark, tmp_path):
    """Golden transpose-codec read (round 7, r6 stretch #9): a v3 store
    assembled BY HAND with codecs [transpose(order=[1,0]), bytes, gzip] —
    chunk payloads are the transposed array serialized C-order — must
    decode to the original orientation, through both the local helper and
    the distributed cell view."""
    import gzip as _gz

    p = tmp_path / "tr.zarr"
    p.mkdir()
    (p / "zarr.json").write_text(json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [4, 6],
        "data_type": "int32",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [4, 6]}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": "/"}},
        "fill_value": 0,
        "codecs": [
            {"name": "transpose", "configuration": {"order": [1, 0]}},
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "gzip", "configuration": {"level": 6}},
        ],
    }))
    g = np.arange(24, dtype="<i4").reshape(4, 6)
    (p / "c").mkdir(); (p / "c" / "0").mkdir()
    # hand-serialize: transpose to (6, 4), C-order bytes, gzip
    (p / "c" / "0" / "0").write_bytes(
        _gz.compress(np.ascontiguousarray(g.T).tobytes(), 6))
    info = Z.parse_zarr_array(str(p))
    assert info.transpose == (1, 0)
    np.testing.assert_array_equal(Z.read_zarr_array(str(p)), g)
    got = {(r.row, r.col): r.z for r in Z.zarr_cells(spark, str(p)).collect()}
    assert got[(2, 5)] == float(g[2, 5]) and len(got) == 24

    # encode side: decode_chunk(encode_chunk(x)) is identity AND the
    # encoded bytes equal the hand-written golden object
    enc = Z.encode_chunk(g, info)
    np.testing.assert_array_equal(Z.decode_chunk(enc, info), g)
    assert _gz.decompress(enc) == _gz.decompress((p / "c" / "0" / "0").read_bytes())


def test_v3_transpose_inside_shard(tmp_path):
    """transpose as the shard's INNER codec chain round-trips through the
    sharding_indexed encode/decode (writer emits it, parser recovers it)."""
    from gridfour_spark.zarrv2 import ZarrInfo, _write_meta_v3

    p = tmp_path / "trs.zarr"
    p.mkdir()
    info = ZarrInfo(
        path=str(p), shape=(8, 8), chunks=(8, 8), dtype=np.dtype("<i4"),
        order="C", fill_value=0,
        compressor={"id": "shard", "inner_chunks": (4, 4),
                    "codecs": [{"id": "gzip", "level": 6}],
                    "transpose": (1, 0)},
        filters=None, separator="/", zarr_format=3, key_prefix="c",
    )
    _write_meta_v3(str(p), info)
    back = Z.parse_zarr_array(str(p))
    assert back.compressor["transpose"] == (1, 0)
    g = (np.arange(64, dtype="<i4") * 3 % 17).reshape(8, 8)
    enc = Z.encode_chunk(g, back)
    np.testing.assert_array_equal(Z.decode_chunk(enc, back), g)


def test_v3_transpose_rejected_after_bytes(tmp_path):
    p = tmp_path / "bad.zarr"
    p.mkdir()
    (p / "zarr.json").write_text(json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [2, 2],
        "data_type": "int32",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [2, 2]}},
        "fill_value": 0,
        "codecs": [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "transpose", "configuration": {"order": [1, 0]}},
        ],
    }))
    with pytest.raises(ValueError, match="precede"):
        Z.parse_zarr_array(str(p))


def test_v3_shard_partial_update_splice(tmp_path):
    """Partial-shard UPDATE: splice_shard_update decodes only the touched
    inner chunks (decoded_bytes bounded by index + touched bytes), copies
    untouched inner-chunk bytes verbatim, and its output is BIT-IDENTICAL
    to a full decode + re-encode of the updated array."""
    import struct as _st

    g = _demo_grid(128, 128)
    for loc in ("end", "start"):
        info = Z.ZarrInfo(
            path="", shape=(128, 128), chunks=(128, 128),
            dtype=np.dtype("<i4"), order="C", fill_value=0,
            compressor={"id": "shard", "inner_chunks": (32, 32),
                        "codecs": [{"id": "gzip", "level": 6}],
                        "index_location": loc},
            filters=None, separator="/", zarr_format=3,
        )
        buf = Z._encode_shard(g.copy(), info)
        idx_len = 16 * 16 + 4

        # update 3 cells inside ONE inner chunk (chunk (1,1))
        lr = np.array([33, 40, 63]); lc = np.array([34, 50, 63])
        z = np.array([-7, -8, -9], dtype="<i4")
        new, tel = Z.splice_shard_update(buf, lr, lc, z, info)
        assert tel["n_touched"] == 1 and tel["n_spliced"] == 15
        # bound: index + the one touched chunk's stored bytes
        raw = buf[-idx_len:-4] if loc == "end" else buf[:idx_len - 4]
        pairs = np.frombuffer(raw, dtype="<u8").reshape(16, 2)
        assert tel["decoded_bytes"] <= idx_len + int(pairs[5, 1])

        want = g.copy()
        want[lr, lc] = z
        # bit-identical to the full re-encode
        assert new == Z._encode_shard(want, info)
        np.testing.assert_array_equal(Z._decode_shard(new, info), want)


def test_v3_shard_partial_update_absent_and_allfill(tmp_path):
    """Splice handles the two index-sentinel transitions: writing into an
    absent inner chunk materializes it, and zeroing a chunk back to
    all-fill OMITS it again (same rule as the writer), in both cases
    matching the full re-encode byte-for-byte."""
    info = Z.ZarrInfo(
        path="", shape=(64, 64), chunks=(64, 64),
        dtype=np.dtype("<i4"), order="C", fill_value=0,
        compressor={"id": "shard", "inner_chunks": (32, 32),
                    "codecs": [{"id": "gzip", "level": 6}]},
        filters=None, separator="/", zarr_format=3,
    )
    g = np.zeros((64, 64), dtype="<i4")
    g[2, 3] = 5  # only inner chunk (0,0) occupied
    buf = Z._encode_shard(g.copy(), info)

    # write into the absent chunk (1,1)
    new, tel = Z.splice_shard_update(
        buf, np.array([40]), np.array([40]), np.array([9], dtype="<i4"), info)
    want = g.copy(); want[40, 40] = 9
    assert new == Z._encode_shard(want, info)
    assert tel["decoded_bytes"] == 16 * 4 + 4  # index only (absent chunk)

    # zero the occupied chunk back to all-fill -> omitted again
    new2, tel2 = Z.splice_shard_update(
        new, np.array([2]), np.array([3]), np.array([0], dtype="<i4"), info)
    want2 = want.copy(); want2[2, 3] = 0
    assert new2 == Z._encode_shard(want2, info)

    # update starting from no shard at all (buf=None)
    new3, tel3 = Z.splice_shard_update(
        None, np.array([40]), np.array([40]), np.array([9], dtype="<i4"), info)
    only = np.zeros((64, 64), dtype="<i4"); only[40, 40] = 9
    assert new3 == Z._encode_shard(only, info)
    assert tel3["decoded_bytes"] == 0
