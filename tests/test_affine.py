"""Rotated/skewed affine model<->raster transforms.

Port of GvrsFileSpecificationCoordinateTest.transformWithRotation (:62-90):
an 11x11 grid with rasterToModel = rotate(pi/4) o translate(-5, -5); the four
corners land on the domain extremes and every mapping is bijective to 1e-9.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gridfour_spark.spec import GridSpec
from gridfour_spark.tiling import with_grid_to_model, with_model_to_grid


def _rotated_spec() -> GridSpec:
    # AffineTransform.getRotateInstance(pi/4) concatenated with
    # getTranslateInstance(-5, -5): rotate applied AFTER translate
    c, s = math.cos(math.pi / 4), math.sin(math.pi / 4)
    r2m = (c, -s, -5 * c + 5 * s, s, c, -5 * s - 5 * c)
    return GridSpec(n_rows=11, n_cols=11, r2m=r2m)


def test_transform_with_rotation_corners():
    spec = _rotated_spec()
    mx0, my0, mx1, my1 = spec.model_domain
    #     3 ---- 2
    #     |      |
    #     0 ---- 1     (grid coords are (row, column))
    cases = [
        ((0, 0), (0.0, my0)),
        ((0, 10), (mx1, 0.0)),
        ((10, 10), (0.0, my1)),
        ((10, 0), (mx0, 0.0)),
    ]
    for (row, col), (ex, ey) in cases:
        x, y = spec.grid_to_model(row, col)
        assert abs(x - ex) < 1e-9, (row, col, "x")
        assert abs(y - ey) < 1e-9, (row, col, "y")
        rrow, rcol = spec.model_to_grid_fractional(x, y)
        assert abs(rrow - row) < 1e-9, (row, col, "row")
        assert abs(rcol - col) < 1e-9, (row, col, "col")


def test_affine_inverse_is_exact_identity():
    """m2r is the analytic inverse (createInverse semantics :2335-2363):
    the composed transform is the identity to ulp level everywhere."""
    spec = GridSpec(
        n_rows=40, n_cols=50,
        r2m=(1.25, -0.375, 100.0, 0.5, 2.0, -40.0),  # rotation + skew + scale
    )
    for row in range(0, 40, 7):
        for col in range(0, 50, 11):
            x, y = spec.grid_to_model(row, col)
            rrow, rcol = spec.model_to_grid_fractional(x, y)
            assert abs(rrow - row) < 1e-9 and abs(rcol - col) < 1e-9
    # integral mapping with fringe rounding recovers the cell
    ir, ic = spec.model_to_grid(*spec.grid_to_model(13, 27))
    assert (ir, ic) == (13, 27)


def test_affine_requires_invertible():
    with pytest.raises(ValueError, match="not invertible"):
        GridSpec(n_rows=4, n_cols=4, r2m=(1.0, 2.0, 0.0, 2.0, 4.0, 0.0))


def test_axis_aligned_m2r_matches_reference_form():
    """Without r2m, m2r follows computeAndStoreInternalTransforms
    (:2335-2347): m2r00 = 1/cellSizeX, m2r02 = -x0*m2r00."""
    spec = GridSpec(n_rows=10, n_cols=10, x0=3.5, y0=-2.0, cell_size_x=0.25, cell_size_y=0.5)
    m00, m01, m02, m10, m11, m12 = spec.m2r
    assert m00 == 1 / 0.25 and m01 == 0.0 and m02 == -3.5 * (1 / 0.25)
    assert m10 == 0.0 and m11 == 1 / 0.5 and m12 == -(-2.0) * (1 / 0.5)


def test_columnar_affine_matches_scalar(spark):
    """The Spark column transforms must agree with the scalar spec methods
    cell-for-cell (same double arithmetic, same fringe rounding)."""
    spec = _rotated_spec()
    pts = spark.range(121).select(
        F.col("id").alias("pt_id"),
        (F.col("id") / 11).cast("long").alias("row0"),
        (F.col("id") % 11).alias("col0"),
    )
    g2m = with_grid_to_model(pts, spec, row_col="row0", col_col="col0")
    back = with_model_to_grid(g2m, spec)
    rows = back.select("pt_id", "row0", "col0", "x", "y", "row", "col").collect()
    assert len(rows) == 121
    for r in rows:
        ex, ey = spec.grid_to_model(r.row0, r.col0)
        assert abs(r.x - ex) < 1e-12 and abs(r.y - ey) < 1e-12
        assert (r.row, r.col) == (r.row0, r.col0)


def test_rotated_spec_through_tile_store(spark):
    """Integration: model-space points on a rotated grid -> affine
    model->grid -> tile assignment -> point_read returns the right cells."""
    from gridfour_spark import store, synth

    spec = GridSpec(
        n_rows=60, n_cols=80, n_rows_in_tile=16, n_cols_in_tile=16,
        r2m=(1.25 * math.cos(0.4), -1.25 * math.sin(0.4), 40.0,
             0.5 * math.sin(0.4), 0.5 * math.cos(0.4), -10.0),
    )
    tiles = store.build_tiles(synth.grid_df(spark, spec, value="dem"), spec)
    # probe model coordinates OF known cells
    probe_cells = [(r, c) for r in range(0, 60, 13) for c in range(0, 80, 17)]
    rows = [(i, *spec.grid_to_model(r, c), r, c) for i, (r, c) in enumerate(probe_cells)]
    pts = spark.createDataFrame(rows, "pt_id int, x double, y double, erow long, ecol long")
    g = with_model_to_grid(pts, spec)
    got = store.point_read(g.select("pt_id", "erow", "ecol", "row", "col"), tiles, spec)
    expect = {(r.row, r.col): r.z for r in synth.grid_df(spark, spec, value="dem").collect()}
    out = got.collect()
    assert len(out) == len(probe_cells)
    for r in out:
        assert (r.row, r.col) == (r.erow, r.ecol)
        assert r.z == expect[(r.row, r.col)]
