"""Flagship pipeline: interleaved docs -> span geometry -> tile-assign -> spatial join.

This is the driver-mandated headline job (BASELINE.json metric): every span of
every document gets a deterministic point geometry, is assigned to a GVRS tile
with the reference's exact integer semantics, and is joined against the
synthetic-DEM tile-statistics table; output is one row per materialized tile.

Plan shape (and why it scales to 10^12 docs):
  parquet scan -> narrow span explode (no shuffle)
  -> geometry + tile key derivation (pure column arithmetic, codegen'd)
  -> ONE shuffle: partial+final aggregation on tile_index (map-side combine
     absorbs the hot-city skew: the 4 hot tiles reduce to 4 rows per map task
     before the shuffle; AQE skew-join handles any residual imbalance)
  -> broadcast join with the per-tile DEM stats (n_tiles = 450 at the global
     0.1-degree spec -> always broadcastable; at a 1-arc-sec globe's 233M
     tiles we'd bucket both sides by tile_index instead)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gridfour_spark import synth
from gridfour_spark.raster_ops import cell_area_km2
from gridfour_spark.spec import GLOBAL_GRID, GridSpec
from gridfour_spark.synth import dem_sql
from gridfour_spark.tiling import arrow_barrier, in_grid, with_geo_to_grid, with_tile_assignment


def dem_tile_stats(spark: SparkSession, spec: GridSpec = GLOBAL_GRID) -> DataFrame:
    """Per-tile DEM statistics from the synthetic analytic surface."""
    g = synth.grid_df(spark, spec, value="dem")
    g = with_tile_assignment(g, spec)
    return g.groupBy("tile_index").agg(
        F.round(F.avg("z"), 6).alias("tile_mean_z"),
        F.min("z").alias("tile_min_z"),
        F.max("z").alias("tile_max_z"),
    )


def spans_with_tiles(
    spark: SparkSession, sf_dir: str, spec: GridSpec = GLOBAL_GRID,
    keep: list[str] | None = None,
) -> DataFrame:
    """Spans with geometry, grid coords, tile assignment and point elevation.

    NOTE: out-of-grid spans are kept with tile_index = -1 (and junk z /
    index_in_tile); consumers must drop the -1 group AFTER their tile
    aggregation. Filtering here would re-trigger the longitude-wrap Python
    UDF inside the Filter (see with_tile_assignment docstring).

    keep: optional span-column projection (round 8, guide §2.3/§4.1 —
    project before the opaque mapInArrow barrier: Spark cannot see which
    columns the identity kernel needs, so without an explicit select every
    span column, including the heavyweight `text`, crosses the Python
    boundary twice and lands in the persisted cache). When set, only
    keep + (lat, lon) cross the barrier and the result carries
    keep + (tile_index, index_in_tile, z) — the union every cache consumer
    (flagship / docs_tile_assign / salted_join) actually reads.
    """
    spans = synth.with_span_geometry(synth.docs_spans(spark, sf_dir))
    if keep is not None:
        spans = spans.select(*keep, "lat", "lon")
    else:
        # barrier: geometry becomes leaf data so the wrap/fringe/tile/z
        # chain stays within codegen method limits (see tiling.arrow_barrier).
        # The narrow (keep=...) path SKIPS it: consumers aggregate from the
        # persisted cache, so no downstream Filter ever references the
        # derived columns pre-shuffle, and the straight-line chain codegens
        # clean (verified: 0 CodeGenerator errors, and bench.py's scale
        # probe has always run this exact chain barrier-free) — measured
        # 1.56 s -> 0.98 s on the sf1.0 cache build without the Arrow
        # round trip (round 8).
        spans = arrow_barrier(spans)
    pts = with_geo_to_grid(spans, spec)
    pts = with_tile_assignment(pts, spec, mark_invalid=True)
    pts = pts.withColumn("z", F.expr(dem_sql()).cast("double"))
    if keep is not None:
        pts = pts.select(*keep, "tile_index", "index_in_tile", "z")
    return pts


def flagship(
    spark: SparkSession, sf_dir: str, spec: GridSpec = GLOBAL_GRID,
    pts: DataFrame | None = None, stats: DataFrame | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Per-tile doc/span counts + sampled elevation, joined to DEM tile stats.

    pts/stats: pre-materialized spans_with_tiles / dem_tile_stats inputs
    (session caches) — the geometry derivation and the dimension build are
    shared by several queries, so callers may amortize them; the plan from
    the cached RDD onward is identical.

    approx_distinct: the PRODUCTION variant of the doc count. The exact
    countDistinct expands every row per aggregate (the one scale flag in
    this plan, PLANS.md); approx_count_distinct (HLL++ at rsd=0.016,
    passed explicitly — the default is 0.05) keeps the aggregation
    strictly map-side-combinable at 10^12 docs."""
    if pts is None:
        pts = spans_with_tiles(spark, sf_dir, spec)
    # The out-of-grid (-1) group is dropped via an AGGREGATE OUTPUT
    # (min(tile_index) == tile_index within a group), NOT a key filter:
    # Catalyst pushes group-key predicates below the aggregation, which
    # re-substitutes the whole geometry expression tree + the wrap UDF into a
    # pre-shuffle Filter (second ArrowEvalPython, measured 2.5s -> 48s on
    # 30M spans). Filtering an agg output cannot be pushed down.
    n_docs = (
        F.approx_count_distinct("doc_id", rsd=0.016) if approx_distinct
        else F.countDistinct("doc_id")
    ).alias("n_docs")
    per_tile = (
        pts.groupBy("tile_index")
        .agg(
            F.count("*").alias("n_spans"),
            n_docs,
            F.sum(F.when(F.col("kind") == "media", 1).otherwise(0)).alias("n_media"),
            F.round(F.avg("z"), 6).alias("mean_point_z"),
            F.min("tile_index").alias("_ti"),
        )
        .filter(F.col("_ti") >= 0)
        .drop("_ti")
    )
    if stats is None:
        stats = dem_tile_stats(spark, spec)
    return per_tile.join(F.broadcast(stats), on="tile_index", how="inner")


# ---------------------------------------------------------------------------
# portable SQL twin (DuckDB oracle) — layered subqueries, both dialects
# ---------------------------------------------------------------------------

def _fringe_sql(v: str, n: int, f0: float, f1: float) -> str:
    """Fringe rounding + out-of-grid -> -1, matching tiling's geo kernel
    (makeGridPointUsingFringe, GvrsFileSpecification.java:2198-2212)."""
    fl = f"CAST(floor(({v}) + 0.5) AS BIGINT)"
    clamped = (
        f"CASE WHEN {fl} = -1 AND ({v}) >= {f0!r} THEN 0 "
        f"WHEN {fl} >= {n} AND ({v}) <= {f1!r} THEN {n - 1} ELSE {fl} END"
    )
    return f"(CASE WHEN ({clamped}) BETWEEN 0 AND {n - 1} THEN ({clamped}) ELSE -1 END)"


def geo_to_grid_sql(spec: GridSpec, lat: str = "lat", lon: str = "lon") -> dict[str, str]:
    """Portable SQL twin of tiling.with_geo_to_grid — same 3-try wrap
    (raw delta, then Angle.to180, then Angle.to360) and fringe clamps,
    op-for-op so doubles match the numpy kernel bitwise."""
    cx, cy = spec.cell_size_x, spec.cell_size_y
    row_f = f"((({lat}) - {spec.y0!r}) / {cy!r})"
    delta = f"(({lon}) - {spec.x0!r})"
    a = f"({delta} % 360.0)"
    t180 = (
        f"(CASE WHEN {a} = 0 THEN 0.0 WHEN {a} < -180.0 THEN 360.0 + {a} "
        f"WHEN {a} >= 180.0 THEN {a} - 360.0 ELSE {a} END)"
    )
    t360 = f"(CASE WHEN {a} = 0 THEN 0.0 WHEN {a} < 0 THEN {a} + 360.0 ELSE {a} END)"
    c_raw = f"({delta} / {cx!r})"
    c_180 = f"({t180} / {cx!r})"
    c_360 = f"({t360} / {cx!r})"
    f0, f1 = spec.col_fringe_0, spec.col_fringe_1
    infr = lambda c: f"({c} >= {f0!r} AND {c} <= {f1!r})"  # noqa: E731
    col_f = (
        f"(CASE WHEN {infr(c_raw)} THEN {c_raw} "
        f"WHEN {infr(c_180)} THEN {c_180} ELSE {c_360} END)"
    )
    return {
        "row_f": row_f,
        "col_f": col_f,
        "row": _fringe_sql(row_f, spec.n_rows, spec.row_fringe_0, spec.row_fringe_1),
        "col": _fringe_sql(col_f, spec.n_cols, spec.col_fringe_0, spec.col_fringe_1),
    }


def spans_with_tiles_sql(spec: GridSpec = GLOBAL_GRID) -> str:
    """DuckDB SQL producing exactly spans_with_tiles() (minus fractional cols)."""
    g = geo_to_grid_sql(spec)
    from gridfour_spark.tiling import tile_assignment_sql

    t = tile_assignment_sql(spec)
    geo = synth.span_geometry_duckdb()
    return f"""
SELECT *, {t['tile_row']} AS tile_row, {t['tile_col']} AS tile_col,
       {t['tile_index']} AS tile_index, {t['index_in_tile']} AS index_in_tile,
       CAST({dem_sql()} AS DOUBLE) AS z
FROM (
  SELECT * FROM (
    SELECT *, {g['row']} AS row, {g['col']} AS col FROM ({geo})
  ) WHERE row >= 0 AND row < {spec.n_rows} AND col >= 0 AND col < {spec.n_cols}
)
"""


def flagship_sql(spec: GridSpec = GLOBAL_GRID) -> str:
    pts = spans_with_tiles_sql(spec)
    t = "tile_index"
    from gridfour_spark.tiling import tile_assignment_sql

    ta = tile_assignment_sql(spec)
    grid = synth.grid_duckdb_sql(spec, value="dem")
    return f"""
WITH pts AS ({pts}),
per_tile AS (
  SELECT {t}, COUNT(*) AS n_spans, COUNT(DISTINCT doc_id) AS n_docs,
         CAST(SUM(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT) AS n_media,
         ROUND(AVG(z), 6) AS mean_point_z
  FROM pts GROUP BY {t}
),
stats AS (
  SELECT {ta['tile_index']} AS tile_index,
         ROUND(AVG(z), 6) AS tile_mean_z, MIN(z) AS tile_min_z, MAX(z) AS tile_max_z
  FROM ({grid}) GROUP BY 1
)
SELECT per_tile.*, stats.tile_mean_z, stats.tile_min_z, stats.tile_max_z
FROM per_tile JOIN stats USING (tile_index)
"""
