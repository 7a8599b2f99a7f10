"""B-spline interpolation tests.

Mirrors the reference suite: analytic-cubic oracle with the reference's own
tolerances (InterpolationBSplineTest.java:115-150) and the date-line seam
invariant (GvrsInterpolationTest.java:39-87)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gridfour_spark import bspline, store
from gridfour_spark.spec import GridSpec
from gridfour_spark.tiling import with_geo_to_grid


def _cubic_grid():
    # f = x^3 + x^2*y + x*y^2 + y^3 sampled on an 11x11 grid, x=j/10, y=i/10,
    # stored as float32 like the reference test (float z[] = new float[121])
    i, j = np.meshgrid(np.arange(11), np.arange(11), indexing="ij")
    x = j / 10.0
    y = i / 10.0
    f = x**3 + x**2 * y + x * y**2 + y**3
    return f.astype(np.float32).astype(np.float64)


def test_numpy_kernel_matches_analytic_cubic():
    z = _cubic_grid()
    rows, cols = np.meshgrid(np.arange(0, 10.01, 0.25), np.arange(0, 10.01, 0.25), indexing="ij")
    rows, cols = rows.ravel(), cols.ravel()
    got = bspline.interpolate_grid(z, rows, cols, 0.1, 0.1, derivatives=True)
    x = cols / 10.0
    y = rows / 10.0
    np.testing.assert_allclose(got["z"], x**3 + x**2 * y + x * y**2 + y**3, atol=3.0e-2)
    np.testing.assert_allclose(got["zx"], 3 * x**2 + 2 * x * y + y**2, atol=2.0e-2)
    np.testing.assert_allclose(got["zy"], x**2 + 2 * x * y + 3 * y**2, atol=2.0e-2)
    np.testing.assert_allclose(got["zxx"], 6 * x + 2 * y, atol=1.0e-4)
    np.testing.assert_allclose(got["zyy"], 2 * x + 6 * y, atol=1.0e-4)
    np.testing.assert_allclose(got["zxy"], 2 * x + 2 * y, atol=1.0e-4)


def test_spark_operator_matches_numpy_kernel(spark):
    """interpolate_points (tile join + weighted-sum agg) vs the in-memory
    kernel on interior (standard-handling) points."""
    spec = GridSpec(
        n_rows=30, n_cols=40, n_rows_in_tile=9, n_cols_in_tile=11,
        x0=0.0, y0=0.0, cell_size_x=1.0, cell_size_y=1.0, geographic=True,
    )
    r, c = np.meshgrid(np.arange(30), np.arange(40), indexing="ij")
    z = np.floor(100 * np.sin(r * 0.3) * np.cos(c * 0.2)).astype(np.float64)

    cells = spark.createDataFrame(
        [(int(rr), int(cc), float(z[rr, cc])) for rr in range(30) for cc in range(40)],
        "row int, col int, z double",
    )
    tiles = store.build_tiles(cells, spec)

    pts = [(i, 2.0 + i * 0.37, 3.0 + (i * 0.61) % 33) for i in range(60)]
    pdf = spark.createDataFrame(pts, "pt_id int, grid_row_f double, grid_col_f double")
    got = {
        r.pt_id: (r.z, r.zx, r.zy)
        for r in bspline.interpolate_points(
            pdf, tiles, spec, derivatives=True, col_spacing=1.0, row_spacing=1.0
        ).collect()
    }
    rows = np.array([p[1] for p in pts])
    cols = np.array([p[2] for p in pts])
    ref = bspline.interpolate_grid(z, rows, cols, 1.0, 1.0, derivatives=True)
    for i, p in enumerate(pts):
        assert abs(got[p[0]][0] - ref["z"][i]) < 1e-5, p
        assert abs(got[p[0]][1] - ref["zx"][i]) < 1e-6, p
        assert abs(got[p[0]][2] - ref["zy"][i]) < 1e-6, p


def test_dateline_seam(spark):
    """GvrsInterpolationTest.java:34-87: 6x12 geographic grid, 30-degree
    cells, column pattern [0,1,2,2,1,0]*2; interpolated z at lon +/- 360 off
    any longitude must match within 1e-9, including across the date line."""
    spec = GridSpec(
        n_rows=6, n_cols=12, n_rows_in_tile=6, n_cols_in_tile=12,
        x0=-165.0, y0=-75.0, cell_size_x=30.0, cell_size_y=30.0, geographic=True,
    )
    assert spec.wraps_longitude
    pat = [0, 1, 2, 2, 1, 0, 0, 1, 2, 2, 1, 0]
    cells = spark.createDataFrame(
        [(r, c, float(pat[c])) for r in range(6) for c in range(12)],
        "row int, col int, z double",
    )
    tiles = store.build_tiles(cells, spec)

    lats = [-40.0, -10.0, 20.0]
    lons = [-179.5, -165.0, 0.0, 100.0, 179.5, 175.0]
    pts = []
    pid = 0
    for la in lats:
        for lo in lons:
            for k in (-1, 0, 1):
                pts.append((pid, la, lo + k * 360.0, lo))
                pid += 1
    pdf = spark.createDataFrame(pts, "pt_id int, lat double, lon double, lon_base double")
    pdf = with_geo_to_grid(pdf, spec)
    got = bspline.interpolate_points(pdf, tiles, spec).collect()
    by_id = {r.pt_id: r.z for r in got}
    assert len(by_id) == len(pts)
    base: dict[tuple, float] = {}
    for pid_, la, lo, lb in pts:
        base.setdefault((la, lb), by_id[pid_])
        assert abs(by_id[pid_] - base[(la, lb)]) <= 1e-9, (la, lo, lb)


def test_bilinear_sparse_store_drops_missing_stencil(spark):
    """A4 on a SPARSE tile store: points whose 2x2 stencil touches a missing
    tile are DROPPED (readValue throws; matches the oracle's inner joins —
    ADVICE round 2), never emitted with NULL z."""
    spec = GridSpec(
        n_rows=20, n_cols=20, n_rows_in_tile=10, n_cols_in_tile=10,
        x0=0.0, y0=0.0, cell_size_x=1.0, cell_size_y=1.0,
    )
    r, c = np.meshgrid(np.arange(20), np.arange(20), indexing="ij")
    z = (r * 20 + c).astype(np.float64)
    cells = spark.createDataFrame(
        [(int(rr), int(cc), float(z[rr, cc])) for rr in range(20) for cc in range(20)],
        "row int, col int, z double",
    )
    # drop tile (0,0): rows 0-9 x cols 0-9 missing
    tiles = store.build_tiles(cells, spec).filter(F.col("tile_index") != 0)

    pts = [
        (0, 4.5, 4.5),    # fully inside the missing tile -> dropped
        (1, 4.5, 14.5),   # inside tile (0,1) -> kept
        (2, 9.5, 4.5),    # straddles missing tile rows 9/10 -> dropped
        (3, 14.5, 14.5),  # tile (1,1) -> kept
    ]
    pdf = spark.createDataFrame(pts, "pt_id int, grid_row_f double, grid_col_f double")
    got = {r.pt_id: r.z_q for r in bspline.bilinear_points(pdf, tiles, spec).collect()}
    assert set(got) == {1, 3}
    assert got[1] == int(np.floor((4.5 * 20 + 14.5) * 1e6))
    assert got[3] == int(np.floor((14.5 * 20 + 14.5) * 1e6))


def test_interpolate_sparse_store_drops_missing_stencil(spark):
    """interpolate_points on a SPARSE tile store: a point whose 4x4 stencil
    touches a dropped tile is DROPPED, not returned as a biased sum of the
    surviving terms (code-review round 3 regression; matches
    bilinear_points' sparse semantics)."""
    spec = GridSpec(
        n_rows=20, n_cols=20, n_rows_in_tile=10, n_cols_in_tile=10,
        x0=0.0, y0=0.0, cell_size_x=1.0, cell_size_y=1.0,
    )
    cells = spark.createDataFrame(
        [(r, c, float(r * 20 + c)) for r in range(20) for c in range(20)],
        "row int, col int, z double",
    )
    tiles = store.build_tiles(cells, spec).filter(F.col("tile_index") != 0)
    pts = [
        (0, 4.5, 4.5),    # stencil fully in the missing tile -> dropped
        (1, 14.5, 14.5),  # interior of tile (1,1) -> kept
        (2, 9.0, 4.5),    # stencil rows 7-10 straddle the missing tile -> dropped
    ]
    pdf = spark.createDataFrame(pts, "pt_id int, grid_row_f double, grid_col_f double")
    got = {r.pt_id for r in bspline.interpolate_points(pdf, tiles, spec).collect()}
    assert got == {1}
