"""interpolate_points_arrow (in-memory fast path) must agree cell-for-cell
with the join-path interpolate_points — same localization, same basis math,
only the execution strategy differs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridfour_spark import bspline, store, synth
from gridfour_spark.spec import GLOBAL_GRID


@pytest.mark.parametrize("derivatives", [False, True])
def test_arrow_path_matches_join_path(spark, derivatives):
    spec = GLOBAL_GRID
    tiles = store.build_tiles(synth.grid_df(spark, spec, value="dem"), spec).persist()
    grid = store.tiles_to_grid(tiles, spec)
    assert grid.shape == (spec.n_rows, spec.n_cols)
    assert not np.isnan(grid).any()

    # points across the standard interior, the date-line wrap band, and the
    # row fringes
    pts = spark.range(4000).select(
        F.col("id").alias("pt_id"),
        ((F.col("id") * 7919) % 17930000 / 10000.0 + 2.0).alias("grid_row_f"),
        ((F.col("id") * 104729) % 35900000 / 10000.0 + 2.0).alias("grid_col_f"),
    )
    edge = spark.createDataFrame(
        [(100001, 5.5, 0.25), (100002, 5.5, 3599.75), (100003, 0.2, 1800.0),
         (100004, 1799.49, 42.0), (100005, 3.0, 0.0)],
        "pt_id long, grid_row_f double, grid_col_f double",
    )
    pts = pts.unionByName(edge)

    a = bspline.interpolate_points_arrow(pts, grid, spec, derivatives=derivatives)
    j = bspline.interpolate_points(pts, tiles, spec, derivatives=derivatives,
                                   broadcast_tiles=True)
    cols = [c for c in a.columns if c != "pt_id"]
    ja = {r.pt_id: r for r in a.collect()}
    jj = {r.pt_id: r for r in j.collect()}
    assert set(ja) == set(jj)
    for pid in ja:
        for c in cols:
            av, jv = ja[pid][c], jj[pid][c]
            assert av == pytest.approx(jv, abs=2e-6), (pid, c)
    tiles.unpersist()


def test_arrow_path_sparse_store_and_null_coords_parity(spark):
    """Review criteria: (a) a missing (all-fill) tile drops affected points
    from BOTH paths identically; (b) NULL/NaN coordinates never produce
    output rows on the wrapping spec."""
    spec = GLOBAL_GRID
    full = store.build_tiles(synth.grid_df(spark, spec, value="dem"), spec)
    # drop one interior tile (tile_row 5, tile_col 7) to make the store sparse
    tiles = full.filter(~((F.col("tile_row") == 5) & (F.col("tile_col") == 7))).persist()
    grid = store.tiles_to_grid(tiles, spec)
    assert np.isnan(grid[5 * 120 + 1, 7 * 180 + 1])

    pts = spark.range(3000).select(
        F.col("id").alias("pt_id"),
        ((F.col("id") * 6151) % 17930000 / 10000.0 + 2.0).alias("grid_row_f"),
        ((F.col("id") * 104729) % 35900000 / 10000.0 + 2.0).alias("grid_col_f"),
    )
    # points straddling the missing tile + NULL/NaN coordinate rows
    extra = spark.createDataFrame(
        [(90001, 5.0 * 120 + 10.0, 7.0 * 180 + 20.0),
         (90002, 5.0 * 120 - 0.5, 7.0 * 180 - 0.5),
         (90003, None, 45.0), (90004, 33.0, None),
         (90005, float("nan"), 45.0), (90006, 33.0, float("nan"))],
        "pt_id long, grid_row_f double, grid_col_f double",
    )
    pts = pts.unionByName(extra)

    a = bspline.interpolate_points_arrow(pts, grid, spec)
    j = bspline.interpolate_points(pts, tiles, spec, broadcast_tiles=True)
    ja = {r.pt_id: r.z for r in a.collect()}
    jj = {r.pt_id: r.z for r in j.collect()}
    assert set(ja) == set(jj)          # identical DROP set (sparse + null)
    assert 90001 not in ja             # inside the missing tile: dropped
    for pid in (90003, 90004, 90005, 90006):
        assert pid not in ja           # null/NaN coords: dropped, not NaN rows
    for pid, z in ja.items():
        assert z == pytest.approx(jj[pid], abs=2e-6)
    tiles.unpersist()
