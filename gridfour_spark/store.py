"""Tile store: build / read tiled rasters as DataFrames of Arrow-backed cell arrays.

The Spark re-expression of the GVRS file layer (SURVEY §1.5):

  cells (row, col, z)
    -> tile assignment (tiling.py, exact TileAccessIndices semantics)
    -> ONE shuffle: repartition/groupBy tile_index
    -> applyInPandas scatter kernel building each tile's row-major cell array
       (columnar-within-tile layout, gvrs/TileElement.java:53-89)
    -> all-fill tiles dropped (RecordManager.writeTile:413-419 — fill-only
       tiles occupy zero bytes; test GvrsElementWriteAndReadMultiTileTest.java:102-116)

Reads go the other way: query points join tiles on tile_index (the shuffle IS
the reference's LRU tile cache, RasterTileCache.java:113-179 — co-location
replaces caching), then an Arrow gather kernel picks index_in_tile.

At 100 TB scale the tiles table is written bucketed by tile_index so repeated
point-read jobs join without a shuffle; locally we persist() instead.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from gridfour_spark.spec import GridSpec
from gridfour_spark.tiling import in_grid, with_tile_assignment

TILE_SCHEMA = StructType(
    [
        StructField("tile_index", LongType()),
        StructField("tile_row", LongType()),
        StructField("tile_col", LongType()),
        StructField("n_cells", IntegerType()),
        StructField("n_filled", IntegerType()),
        StructField("cells", ArrayType(DoubleType())),
    ]
)


def build_tiles(
    cells: DataFrame,
    spec: GridSpec,
    value_col: str = "z",
    fill: float | None = None,
    element_col: str | None = None,
) -> DataFrame:
    """cells(row, col, value[, element]) -> tiles(tile_index, ..., cells[row-major]).

    One shuffle on the tile key; the scatter kernel is numpy (Arrow batches
    in, Arrow batches out). All-fill tiles are dropped, matching
    RecordManager.writeTile:413-419.

    element_col: multi-band stores (one GvrsElement per band,
    gvrs/GvrsElement.java:55 / RasterTile.java:47-109 — columnar-within-tile
    means each (element, tile) pair is its own cell array; the tile key
    becomes (element, tile_index)).
    """
    fill_v = float(spec.fill_int if fill is None else fill)
    cells_per_tile = spec.cells_per_tile
    n_cols_of_tiles = spec.n_cols_of_tiles

    sel = [
        "tile_index",
        "index_in_tile",
        F.col(value_col).cast("double").alias("_v"),
    ]
    if element_col:
        sel.insert(0, F.col(element_col).alias("element"))
    assigned = with_tile_assignment(cells.filter(in_grid(spec)), spec).select(*sel)

    schema = TILE_SCHEMA
    if element_col:
        from pyspark.sql.types import StringType

        schema = StructType([StructField("element", StringType())] + list(TILE_SCHEMA.fields))

    def scatter(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        tile_index = int(key[-1])
        arr = np.full(cells_per_tile, fill_v, dtype=np.float64)
        idx = pdf["index_in_tile"].to_numpy(dtype=np.int64)
        arr[idx] = pdf["_v"].to_numpy(dtype=np.float64)
        n_filled = int(len(np.unique(idx)))
        out = {
            "tile_index": [tile_index],
            "tile_row": [tile_index // n_cols_of_tiles],
            "tile_col": [tile_index % n_cols_of_tiles],
            "n_cells": [cells_per_tile],
            "n_filled": [n_filled],
            "cells": [arr],
        }
        if len(key) == 2:
            out = {"element": [key[0]], **out}
        return pd.DataFrame(out)

    keys = (["element"] if element_col else []) + ["tile_index"]
    tiles = assigned.groupBy(*keys).applyInPandas(scatter, schema)
    # all-fill tiles never materialize (fill writes are not stores)
    if np.isnan(fill_v):
        not_all_fill = F.exists(F.col("cells"), lambda c: ~F.isnan(c))
    else:
        not_all_fill = F.exists(F.col("cells"), lambda c: c != F.lit(fill_v))
    return tiles.filter(not_all_fill)


def point_read(
    points: DataFrame,
    tiles: DataFrame,
    spec: GridSpec,
    fill: float | None = None,
    value_name: str = "z",
    element: str | None = None,
) -> DataFrame:
    """Batch random-access read (GvrsElement.readValue, GvrsElementInt.java:85-95).

    points(row, col, ...) -> + value column; absent tile or unset cell -> fill.
    Pure built-ins: tile-key derivation, left join, element_at. The left join
    preserves the reference's 'missing tile reads as fill' semantics
    (GvrsElementInt.java:90).
    """
    fill_v = float(spec.fill_int if fill is None else fill)
    pts = with_tile_assignment(points.filter(in_grid(spec)), spec)
    tside = tiles
    if element is not None:
        tside = tside.filter(F.col("element") == element)
    joined = pts.join(
        tside.select("tile_index", "cells"), on="tile_index", how="left"
    )
    val = F.element_at(F.col("cells"), (F.col("index_in_tile") + 1).cast("int"))
    return joined.withColumn(
        value_name, F.coalesce(val, F.lit(fill_v))
    ).drop("cells")


def write_points(
    points: DataFrame,
    tiles: DataFrame,
    spec: GridSpec,
    value_col: str = "z",
    fill: float | None = None,
) -> DataFrame:
    """Batch point WRITE (S4, GvrsElement.writeValue:199-274 + tile-cache
    write-back): scatter new cell values into the tile store.

    cogroup(tiles, writes) by tile_index -> one Arrow merge kernel per tile:
    existing tiles get cells updated in place; previously-absent tiles
    materialize fill-initialized first (RasterTileCache.allocateNewTile:223-243);
    tiles that would contain only fill never materialize
    (RecordManager.writeTile:413-419). The Iceberg production form is
    MERGE INTO tiles USING updates ON tile_index.
    """
    fill_v = float(spec.fill_int if fill is None else fill)
    cells_per_tile = spec.cells_per_tile
    n_cols_of_tiles = spec.n_cols_of_tiles

    writes = with_tile_assignment(points.filter(in_grid(spec)), spec).select(
        "tile_index", "index_in_tile", F.col(value_col).cast("double").alias("_v")
    )

    def merge(key: tuple, tiles_pdf: pd.DataFrame, writes_pdf: pd.DataFrame) -> pd.DataFrame:
        tile_index = int(key[0])
        if len(tiles_pdf) > 0:
            arr = np.asarray(tiles_pdf.iloc[0]["cells"], dtype=np.float64).copy()
        else:
            arr = np.full(cells_per_tile, fill_v, dtype=np.float64)
        if len(writes_pdf) > 0:
            idx = writes_pdf["index_in_tile"].to_numpy(dtype=np.int64)
            arr[idx] = writes_pdf["_v"].to_numpy(dtype=np.float64)
        if np.isnan(fill_v):
            all_fill = bool(np.isnan(arr).all())
            n_filled = int((~np.isnan(arr)).sum())
        else:
            all_fill = bool((arr == fill_v).all())
            n_filled = int((arr != fill_v).sum())
        if all_fill:
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in zip(
                    ["tile_index", "tile_row", "tile_col", "n_cells", "n_filled", "cells"],
                    ["int64", "int64", "int64", "int32", "int32", "object"],
                )}
            )
        return pd.DataFrame(
            {
                "tile_index": [tile_index],
                "tile_row": [tile_index // n_cols_of_tiles],
                "tile_col": [tile_index % n_cols_of_tiles],
                "n_cells": [cells_per_tile],
                "n_filled": [n_filled],
                "cells": [arr],
            }
        )

    t = tiles.select("tile_index", "cells").groupBy("tile_index")
    w = writes.groupBy("tile_index")
    return t.cogroup(w).applyInPandas(merge, TILE_SCHEMA)


def tiles_to_grid(tiles: DataFrame, spec: GridSpec) -> "np.ndarray":
    """Materialize a tile store as one driver-side numpy raster (fill=NaN).

    For the in-memory interpolation fast path (bspline.interpolate_points_arrow)
    and test oracles — whole TILE ARRAYS cross the driver boundary (one slice
    assignment each), never per-cell rows. Only call when n_rows*n_cols*8B
    fits in driver memory (GLOBAL_GRID = 52 MB)."""
    import numpy as np

    rt, ct = spec.n_rows_in_tile, spec.n_cols_in_tile
    g = np.full((spec.n_rows_of_tiles * rt, spec.n_cols_of_tiles * ct), np.nan)
    # toPandas (Arrow) keeps each tile one contiguous array; .collect()
    # would box every cell as a Python float first (review)
    pdf = tiles.select("tile_row", "tile_col", "cells").toPandas()
    for trow, tcol, cells in zip(pdf["tile_row"], pdf["tile_col"], pdf["cells"]):
        arr = np.asarray(cells, dtype=np.float64).reshape(rt, ct)
        g[trow * rt : (trow + 1) * rt, tcol * ct : (tcol + 1) * ct] = arr
    return g[: spec.n_rows, : spec.n_cols]


def tiles_to_cells(tiles: DataFrame, spec: GridSpec, value_name: str = "z") -> DataFrame:
    """Inverse of build_tiles: explode tiles back to (row, col, value).

    posexplode gives index_in_tile; row/col recovered with the exact inverse
    arithmetic of TileAccessIndices.java:78-92."""
    rt, ct = spec.n_rows_in_tile, spec.n_cols_in_tile
    df = tiles.select(
        "tile_row", "tile_col", F.posexplode("cells").alias("index_in_tile", value_name)
    )
    return df.select(
        (F.col("tile_row") * rt + F.expr(f"index_in_tile div {ct}")).alias("row"),
        (F.col("tile_col") * ct + F.col("index_in_tile") % ct).alias("col"),
        value_name,
    ).filter(in_grid(spec))


def block_read(
    windows: DataFrame,
    tiles: DataFrame,
    spec: GridSpec,
    fill: float | None = None,
) -> DataFrame:
    """Sub-grid window reads (GvrsElement.readBlock, GvrsElement.java:298-404).

    windows(win_id, row0, col0, n_rows, n_cols) -> (win_id, row, col, z).
    The range-join is turned into an equi-join: each window expands to its
    covered tile_index list via sequence()+explode (the standard skew-safe
    trick, SURVEY §2.5), then cells are gathered tile-locally and trimmed to
    the window. Missing tiles/cells read as fill.
    """
    fill_v = float(spec.fill_int if fill is None else fill)
    rt, ct, nct = spec.n_rows_in_tile, spec.n_cols_in_tile, spec.n_cols_of_tiles

    w = (
        windows.withColumn("row1", F.col("row0") + F.col("n_rows") - 1)
        .withColumn("col1", F.col("col0") + F.col("n_cols") - 1)
        .withColumn("trow", F.explode(F.expr(f"sequence(row0 div {rt}, row1 div {rt})")))
        .withColumn("tcol", F.explode(F.expr(f"sequence(col0 div {ct}, col1 div {ct})")))
        .withColumn("tile_index", (F.col("trow") * nct + F.col("tcol")).cast("long"))
    )
    joined = w.join(tiles.select("tile_index", "cells"), on="tile_index", how="left")
    # enumerate the window's cells that fall inside this tile
    joined = (
        joined.withColumn(
            "row", F.explode(F.expr(f"sequence(greatest(row0, trow*{rt}), least(row1, trow*{rt}+{rt-1}))"))
        )
        .withColumn(
            "col", F.explode(F.expr(f"sequence(greatest(col0, tcol*{ct}), least(col1, tcol*{ct}+{ct-1}))"))
        )
        .withColumn("index_in_tile", ((F.col("row") % rt) * ct + F.col("col") % ct).cast("int"))
    )
    val = F.element_at(F.col("cells"), F.col("index_in_tile") + 1)
    out = joined.withColumn("z", F.coalesce(val, F.lit(fill_v)))
    return out.select("win_id", "row", "col", "z").filter(in_grid(spec))
