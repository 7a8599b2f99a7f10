"""NetCDF-3 classic source/sink (SURVEY §2 S9, round 6): pure-numpy format
implementation, distributed row-slab read, and the reference's flagship
PackageData pipeline shape (NetCDF -> tiles -> codec race -> GVRS) run
hermetically on files this engine writes itself."""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import functions as F

from gridfour_spark import netcdf as NC


def _demo_grid(nrows=120, ncols=150):
    i, j = np.indices((nrows, ncols))
    return np.round(500.0 * np.sin(i * 0.05) * np.cos(j * 0.04)).astype(np.int32)


def test_header_bytes_match_classic_spec(tmp_path):
    """Byte-level golden: magic, numrecs, dim list, var entry, and begin
    offset laid out exactly as the NetCDF classic format specifies."""
    p = str(tmp_path / "t.nc")
    g = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.int32)
    NC.write_netcdf(p, g, var="z", dim_names=("y", "x"))
    b = open(p, "rb").read()
    assert b[:4] == b"CDF\x01"
    assert struct.unpack(">I", b[4:8])[0] == 0  # numrecs
    assert struct.unpack(">II", b[8:16]) == (0x0A, 2)  # NC_DIMENSION, ndims=2
    # dim 0: name "y" (len 1, padded to 4), length 2
    assert struct.unpack(">I", b[16:20])[0] == 1 and b[20:21] == b"y"
    assert struct.unpack(">I", b[24:28])[0] == 2
    info = NC.parse_netcdf_header(p)
    v = info.variables["z"]
    assert v.shape == (2, 3) and v.nc_type == 4
    # data at begin, big-endian int32, row-major
    got = np.frombuffer(b[v.begin : v.begin + 24], dtype=">i4").reshape(2, 3)
    assert np.array_equal(got, g)


def test_roundtrip_and_fill_values(tmp_path):
    p = str(tmp_path / "t.nc")
    g = _demo_grid().astype(np.float64)
    g[5, 7] = np.nan
    g[100, 3] = np.nan
    NC.write_netcdf(p, g, var="elevation", attrs={"title": "synthetic DEM"},
                    nc_type=6)
    info = NC.parse_netcdf_header(p)
    assert info.attrs["title"] == "synthetic DEM"
    v = info.variables["elevation"]
    assert v.attrs["_FillValue"] == -9.999e33
    a = NC.read_slab(p, v, 0, 120)
    assert a.shape == (120, 150)
    assert a[5, 7] == -9.999e33  # raw slab carries the declared fill
    mask = a != -9.999e33
    assert np.array_equal(a[mask], np.nan_to_num(g, nan=-9.999e33)[mask])


def test_distributed_cells_and_window_pushdown(spark, tmp_path):
    p = str(tmp_path / "t.nc")
    g = _demo_grid()
    gg = g.astype(np.float64)
    gg[11, 13] = np.nan
    NC.write_netcdf(p, gg, var="z", nc_type=3, fill_value=-32768)

    cells = NC.netcdf_cells(spark, p)
    assert cells.count() == 120 * 150
    s = cells.agg(F.sum("z"), F.count("z")).collect()[0]
    # NULL cell excluded from count(z); sum matches the non-null grid sum
    assert s[1] == 120 * 150 - 1
    assert s[0] == float(np.nansum(gg))

    win = NC.netcdf_cells(spark, p, row_range=(10, 14), col_range=(12, 15))
    rows = {(r["row"], r["col"]): r["z"] for r in win.collect()}
    assert len(rows) == 4 * 3
    assert rows[(11, 13)] is None
    assert rows[(10, 12)] == float(g[10, 12])


def test_dataframe_sink_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.nc")
    df = spark.createDataFrame(
        [(r, c, float(r * 10 + c)) for r in range(6) for c in range(4)],
        "row long, col long, z double",
    )
    NC.write_netcdf(p, df, var="z", nc_type=4)
    back = NC.netcdf_cells(spark, p)
    got = {(r["row"], r["col"]): r["z"] for r in back.collect()}
    assert got[(5, 3)] == 53.0 and len(got) == 24


def test_dataframe_sink_no_per_cell_rows(spark, tmp_path, monkeypatch):
    """The DataFrame sink must assemble the grid via one Arrow toPandas +
    vectorized scatter (r6 verdict #1: the old path streamed per-cell Rows
    through toLocalIterator and ran two full scans for the dims).
    toLocalIterator is poisoned to prove the Row path is gone, and the
    dims agg is counted to prove it is one scan, not two."""
    g = np.arange(60, dtype=np.float64).reshape(6, 10)
    cells = [
        (r, c, None if (r, c) == (2, 3) else float(g[r, c]))
        for r in range(6)
        for c in range(10)
    ]
    df = spark.createDataFrame(cells, "row long, col long, z double")
    cls = type(df)  # the CONCRETE DataFrame class (pyspark 4 splits classic/base)

    def _no_rows(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("write_netcdf must not stream per-cell Rows")

    monkeypatch.setattr(cls, "toLocalIterator", _no_rows)
    n_collects = {"n": 0}
    orig_collect = cls.collect

    def _counted(self):
        n_collects["n"] += 1
        return orig_collect(self)

    monkeypatch.setattr(cls, "collect", _counted)
    p = str(tmp_path / "arrow.nc")
    NC.write_netcdf(p, df, var="z", nc_type=6, fill_value=-9999.0)
    assert n_collects["n"] == 1  # single two-column dims agg

    monkeypatch.undo()
    back = NC.netcdf_cells(spark, p)
    got = {(r["row"], r["col"]): r["z"] for r in back.collect()}
    assert got[(2, 3)] is None  # NULL cell -> _FillValue -> NULL on read
    assert got[(5, 9)] == 59.0 and len(got) == 60


def test_packagedata_pipeline_netcdf_to_gvrs(spark, tmp_path):
    """The reference's flagship job end-to-end (PackageData.java:196-260,
    468-539): NetCDF elevation grid -> tile build -> codec race -> GVRS
    store readable by the engine's binary reader, cells identical."""
    from gridfour_spark import gvrsfile as G
    from gridfour_spark import store as S
    from gridfour_spark.spec import GridSpec

    nc_path = str(tmp_path / "dem.nc")
    g = _demo_grid()
    NC.write_netcdf(nc_path, g.astype(np.float64), var="elevation", nc_type=4)

    spec = GridSpec(n_rows=120, n_cols=150, n_rows_in_tile=40, n_cols_in_tile=50)
    cells = NC.netcdf_cells(spark, nc_path)
    tiles = S.build_tiles(cells, spec, value_col="z")
    e = G.default_element("z", "int")
    gvrs_path = str(tmp_path / "dem.gvrs")
    G.write_gvrs(gvrs_path, spec, e,
                 G.gvrs_export_blocks(tiles, spec, e, compress=True),
                 compressed=True)

    back = G.gvrs_cells(spark, gvrs_path)
    j = cells.withColumnRenamed("z", "a").join(
        back.withColumnRenamed("z", "b"), on=["row", "col"], how="full"
    )
    bad = j.filter(
        (F.col("a").isNull() != F.col("b").isNull())
        | (F.col("a").cast("long") != F.col("b").cast("long"))
    ).count()
    assert bad == 0
    assert j.count() == 120 * 150


def test_cdf2_sink_roundtrip(spark, tmp_path):
    """CDF-2 (64-bit offset) sink: magic byte 2, u64 begin field, values
    identical through the distributed reader (which already handled CDF-2
    on the read side)."""
    g = _demo_grid(40, 30)
    p = str(tmp_path / "v2.nc")
    NC.write_netcdf(p, g, var="z", version=2)
    raw = open(p, "rb").read(4)
    assert raw == b"CDF\x02"
    info = NC.parse_netcdf_header(p)
    assert info.version == 2
    win = NC.netcdf_cells(spark, p, row_range=(10, 12)).collect()
    got = {(r["row"], r["col"]): r["z"] for r in win}
    assert got[(10, 5)] == float(g[10, 5]) and len(got) == 2 * 30
    # byte-identity of everything but the version byte and begin width:
    # the same grid written CDF-1 must carry an identical data area
    p1 = str(tmp_path / "v1.nc")
    NC.write_netcdf(p1, g, var="z", version=1)
    i1 = NC.parse_netcdf_header(p1)
    d2 = open(p, "rb").read()[info.variables["z"].begin:]
    d1 = open(p1, "rb").read()[i1.variables["z"].begin:]
    assert d1 == d2
