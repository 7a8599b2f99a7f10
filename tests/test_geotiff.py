"""S10: COG-style tiled GeoTIFF source round trips (pure-binary parser —
no GDAL in this container; the format subset is the cloud-optimized
elevation shape: tiled, int32, deflate or raw)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridfour_spark import geotiff, store, synth
from gridfour_spark.spec import GridSpec

SPEC = GridSpec(
    n_rows=300, n_cols=500, n_rows_in_tile=64, n_cols_in_tile=64,
    x0=-20.0 + 0.05, y0=10.0 + 0.05, cell_size_x=0.1, cell_size_y=0.1,
)


def _dem(nr, nc):
    r, c = np.meshgrid(np.arange(nr), np.arange(nc), indexing="ij")
    return np.floor(4000 * np.sin(r * 0.021) * np.cos(c * 0.017)).astype(np.int32)


@pytest.mark.parametrize("compress", [True, False])
def test_geotiff_round_trip(spark, compress):
    v = _dem(SPEC.n_rows, SPEC.n_cols)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "dem.tif")
        geotiff.write_geotiff(path, v, SPEC, tile_w=128, tile_h=96, compress=compress)
        # spec extraction: cell-center origin reconstructed from edge tiepoint
        spec2 = geotiff.spec_from_geotiff(path)
        assert (spec2.n_rows, spec2.n_cols) == (300, 500)
        assert abs(spec2.x0 - SPEC.x0) < 1e-12 and abs(spec2.y0 - SPEC.y0) < 1e-12
        assert spec2.cell_size_x == SPEC.cell_size_x

        cells = geotiff.read_geotiff_cells(spark, path)
        got = cells.orderBy("row", "col").collect()
        assert len(got) == 300 * 500
        arr = np.array([r.z for r in got], dtype=np.int64).reshape(300, 500)
        np.testing.assert_array_equal(arr, v)


def test_geotiff_feeds_tile_store(spark):
    """The scan output drops straight into build_tiles: re-tile a GeoTIFF
    into a GVRS spec and point-read it."""
    v = _dem(SPEC.n_rows, SPEC.n_cols)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "dem.tif")
        geotiff.write_geotiff(path, v, SPEC, tile_w=256, tile_h=256)
        cells = geotiff.read_geotiff_cells(spark, path)
        tiles = store.build_tiles(cells, SPEC)
        pts = spark.range(500).select(
            F.col("id").alias("pt_id"),
            ((F.col("id") * 37) % SPEC.n_rows).alias("row"),
            ((F.col("id") * 61) % SPEC.n_cols).alias("col"),
        )
        got = store.point_read(pts, tiles, SPEC)
        for r in got.collect():
            assert int(r.z) == int(v[r.row, r.col]), (r.row, r.col)
