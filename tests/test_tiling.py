"""Tile assignment + coordinate transforms vs the pure-Python scalar oracle.

Mirrors the reference's GvrsFileSpecificationCoordinateTest (corner/center
round trips) and the SampleFiles deterministic grids (5x5 dividing and 6x6
non-dividing tiles on a 10x10 grid)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gridfour_spark.spec import GLOBAL_GRID, GridSpec
from gridfour_spark.synth import grid_df
from gridfour_spark.tiling import (
    in_grid,
    with_geo_to_grid,
    with_grid_to_model,
    with_tile_assignment,
)


@pytest.mark.parametrize(
    "spec",
    [
        GridSpec(n_rows=10, n_cols=10, n_rows_in_tile=5, n_cols_in_tile=5),
        GridSpec(n_rows=10, n_cols=10, n_rows_in_tile=6, n_cols_in_tile=6),  # partial tiles
        GridSpec(n_rows=101, n_cols=103, n_rows_in_tile=17, n_cols_in_tile=29),
    ],
)
def test_tile_assignment_matches_scalar_oracle(spark, spec):
    df = with_tile_assignment(grid_df(spark, spec, value=None), spec)
    rows = df.collect()
    assert len(rows) == spec.n_rows * spec.n_cols
    for r in rows:
        ti, iit = spec.tile_assign(r.row, r.col)
        assert (r.tile_index, r.index_in_tile) == (ti, iit), (r.row, r.col)
        assert spec.tile_row_col(r.tile_index) == (r.tile_row, r.tile_col)


def test_tile_grid_dims():
    # ceil division (GvrsFileSpecification.java:423-424)
    s = GridSpec(n_rows=10, n_cols=10, n_rows_in_tile=6, n_cols_in_tile=6)
    assert (s.n_rows_of_tiles, s.n_cols_of_tiles, s.n_tiles) == (2, 2, 4)
    s2 = GridSpec(n_rows=120, n_cols=180, n_rows_in_tile=120, n_cols_in_tile=180)
    assert s2.n_tiles == 1


def test_geo_to_grid_matches_scalar_oracle_dense_lon_sweep(spark):
    """Column closed-form wrap vs the reference's 3-try scalar logic, across
    the date line and beyond (lon in [-540, 540))."""
    spec = GLOBAL_GRID
    pts = spark.range(4000).select(
        (F.col("id") * 0.27 - 540.0).alias("lon"),
        ((F.col("id") % 1800) * 0.1 - 89.96).alias("lat"),
    )
    got = with_geo_to_grid(pts, spec).select("lat", "lon", "row", "col").collect()
    for r in got:
        orow, ocol = spec.geo_to_grid(r.lat, r.lon)
        in_oracle = 0 <= orow < spec.n_rows and 0 <= ocol < spec.n_cols
        in_engine = 0 <= r.row < spec.n_rows and 0 <= r.col < spec.n_cols
        assert in_oracle == in_engine, (r.lat, r.lon, (orow, ocol), (r.row, r.col))
        if in_oracle:
            assert (r.row, r.col) == (orow, ocol), (r.lat, r.lon)


def test_fringe_boundaries(spark):
    """Cells exactly on the half-cell fringe clamp in; beyond it fall out
    (GvrsFileSpecification.java:2198-2212)."""
    spec = GridSpec(
        n_rows=100, n_cols=200, x0=0.0, y0=-49.5, cell_size_x=1.0, cell_size_y=1.0,
        geographic=True,
    )
    y0 = spec.y0
    cases = [
        (y0 - 0.5, 0),          # exactly on fringe -> clamps to 0
        (y0 - 0.500001, None),  # beyond fringe -> out
        (y0 + 99.5, 99),        # upper fringe -> clamps to n-1
        (y0 + 99.500001, None),
        (y0 + 42.49, 42),
        (y0 + 42.51, 43),
    ]
    pts = spark.createDataFrame([(lat, 10.0) for lat, _ in cases], "lat double, lon double")
    rows = with_geo_to_grid(pts, spec).orderBy("lat").collect()
    ordered = sorted(cases)
    for r, (lat, expect) in zip(rows, ordered):
        orow, _ = spec.geo_to_grid(lat, 10.0)
        if expect is None:
            assert not (0 <= r.row < spec.n_rows), (lat, r.row)
            assert not (0 <= orow < spec.n_rows)
        else:
            assert r.row == expect == orow, (lat, r.row, orow)


def test_grid_to_model_round_trip(spark):
    """mapGridToModelPoint <-> mapModelToGridPoint corner/center round trips
    (GvrsFileSpecificationCoordinateTest.java:61-165)."""
    spec = GridSpec(n_rows=50, n_cols=60, x0=-3.5, y0=7.25, cell_size_x=0.25, cell_size_y=0.5)
    df = grid_df(spark, spec, value=None)
    m = with_grid_to_model(df, spec)
    back = m.collect()
    for r in back:
        x, y = spec.grid_to_model(r.row, r.col)
        assert math.isclose(x, r.x, rel_tol=0, abs_tol=1e-12)
        assert math.isclose(y, r.y, rel_tol=0, abs_tol=1e-12)
        irow, icol = spec.model_to_grid(x, y)
        assert (irow, icol) == (r.row, r.col)


def test_dateline_wrap_equivalence(spark):
    """Points at lon and lon+360 / lon-720 assign to the same cell on a
    wrapping global grid (GvrsInterpolationTest date-line seam invariant)."""
    spec = GLOBAL_GRID
    base = [(-179.95 + i * 17.3) % 360 - 180 for i in range(40)]
    pts = [(12.34, lon + k * 360.0) for lon in base for k in (-2, -1, 0, 1, 2)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = with_geo_to_grid(df, spec).filter(in_grid(spec)).collect()
    assert len(got) == len(pts)
    by_base: dict[float, set[tuple[int, int]]] = {}
    for r in got:
        key = round((r.lon + 540.0) % 360.0, 6)
        by_base.setdefault(key, set()).add((r.row, r.col))
    for key, cells in by_base.items():
        assert len(cells) == 1, (key, cells)
