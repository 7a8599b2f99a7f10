"""Spatial joins: point-in-polygon and kNN (north_rule operators).

Both are expressed with DataFrame built-ins only — no geometry library (the
container has no shapely/h3) and no per-row Python:

- PIP: ray-casting parity as relational algebra. Polygon edges explode into
  rows; a point is inside iff an ODD number of edges crosses the upward ray.
  The crossing test for one (point, edge) pair is a closed-form predicate, so
  PIP = explode + equi-join on coarse cover cells + filter + groupBy parity.
  At 10^12 points the cover-cell equi-join (skew.cell_id) prunes candidates
  exactly like an H3 polyfill join; the parity aggregation is map-side
  combined.
- kNN: small anchor set broadcast against the point cloud; haversine great-
  circle distance in column arithmetic; per-point top-k via window
  row_number with a deterministic (distance, anchor_id) tie order. The scale
  path for huge anchor sets is cell-ring candidate generation (grid_disk
  equivalent) — same shape as ann_topk's bucket join in similarity.py.

Polygon fixture: deterministic star polygons derived from integer hashes so
the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gridfour_spark.skew import cell_id, cell_id_sql

N_POLY_VERTS = 8
_ANGLES = [2.0 * math.pi * i / N_POLY_VERTS for i in range(N_POLY_VERTS)]


def synth_polygons(spark: SparkSession, n: int = 24) -> DataFrame:
    """n deterministic star polygons: center c_k from integer mixing, vertex i
    at radius 3 + ((k*31 + i*17) % 7) degrees, angle 2*pi*i/8."""
    rows = []
    for k in range(n):
        h1 = (k * 2654435761 + 1013904223) % (2**32)
        h2 = (k * 1597334677 + 12345) % (2**32)
        clat = (h1 % 120000) / 1000.0 - 60.0
        clon = (h2 % 340000) / 1000.0 - 170.0
        verts = []
        for i, ang in enumerate(_ANGLES):
            r = 3.0 + ((k * 31 + i * 17) % 7)
            verts.append((clon + r * math.cos(ang), clat + r * math.sin(ang)))
        rows.append((k, [v[0] for v in verts], [v[1] for v in verts]))
    return spark.createDataFrame(rows, "poly_id int, xs array<double>, ys array<double>")


def polygon_edges(polys: DataFrame) -> DataFrame:
    """(poly_id, x1, y1, x2, y2) one row per edge, closing edge included."""
    n = N_POLY_VERTS
    e = polys.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
    nxt = (F.col("i") + 1) % n
    return e.select(
        "poly_id",
        F.element_at("xs", F.col("i") + 1).alias("x1"),
        F.element_at("ys", F.col("i") + 1).alias("y1"),
        F.element_at("xs", nxt + 1).alias("x2"),
        F.element_at("ys", nxt + 1).alias("y2"),
    )


def pip_join(
    points: DataFrame,
    polys: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cover_res: int = 3,
) -> DataFrame:
    """points (pt fields + lat/lon) x polygons -> (point, poly_id) inside pairs.

    Plan: polygon bbox -> cover cells (sequence+explode, the polyfill trick
    that turns the spatial join into an equi-join) ; points -> their cell ;
    equi-join ; ray-cast parity per (point, polygon).
    """
    n_rows = 1 << cover_res
    n_cols = 1 << (cover_res + 1)
    lat_step = 180.0 / n_rows
    lon_step = 360.0 / n_cols

    b = polys.select(
        "poly_id", "xs", "ys",
        F.array_min("xs").alias("xmin"), F.array_max("xs").alias("xmax"),
        F.array_min("ys").alias("ymin"), F.array_max("ys").alias("ymax"),
    )
    b = (
        b.withColumn(
            "crow",
            F.explode(
                F.sequence(
                    F.floor((F.col("ymin") + 90.0) / lat_step),
                    F.least(F.floor((F.col("ymax") + 90.0) / lat_step), F.lit(n_rows - 1)),
                )
            ),
        )
        .withColumn(
            "ccol",
            F.explode(
                F.sequence(
                    F.floor((F.col("xmin") + 180.0) / lon_step),
                    F.least(F.floor((F.col("xmax") + 180.0) / lon_step), F.lit(n_cols - 1)),
                )
            ),
        )
        .withColumn("cell", (F.col("crow") * n_cols + F.col("ccol")).cast("long"))
        .select("poly_id", "cell", "xs", "ys")
    )
    pts = points.withColumn("cell", cell_id(F.col(lat_col), F.col(lon_col), cover_res))
    cand = pts.join(b, on="cell").drop("cell")

    edges = cand.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(N_POLY_VERTS - 1))))
    x1 = F.element_at("xs", F.col("i") + 1)
    y1 = F.element_at("ys", F.col("i") + 1)
    x2 = F.element_at("xs", (F.col("i") + 1) % N_POLY_VERTS + 1)
    y2 = F.element_at("ys", (F.col("i") + 1) % N_POLY_VERTS + 1)
    px, py = F.col(lon_col), F.col(lat_col)
    crosses = ((y1 > py) != (y2 > py)) & (
        px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
    )
    group_cols = [c for c in cand.columns if c not in ("xs", "ys")]
    par = (
        edges.withColumn("_c", F.when(crosses, 1).otherwise(0))
        .groupBy(*group_cols)
        .agg(F.sum("_c").alias("_crossings"))
    )
    return par.filter(F.col("_crossings") % 2 == 1).drop("_crossings")


def polygons_sql(n: int = 24) -> str:
    """DuckDB CTE with the identical polygon fixture (literal vertices,
    generated by the same Python code that feeds createDataFrame)."""
    rows = []
    for k in range(n):
        h1 = (k * 2654435761 + 1013904223) % (2**32)
        h2 = (k * 1597334677 + 12345) % (2**32)
        clat = (h1 % 120000) / 1000.0 - 60.0
        clon = (h2 % 340000) / 1000.0 - 170.0
        xs, ys = [], []
        for i, ang in enumerate(_ANGLES):
            r = 3.0 + ((k * 31 + i * 17) % 7)
            xs.append(repr(clon + r * math.cos(ang)))
            ys.append(repr(clat + r * math.sin(ang)))
        rows.append(f"({k}, [{', '.join(xs)}], [{', '.join(ys)}])")
    vals = ", ".join(rows)
    return f"SELECT * FROM (VALUES {vals}) AS t(poly_id, xs, ys)"


def pip_join_sql(points_src: str, n_poly: int = 24, lat: str = "lat", lon: str = "lon") -> str:
    """DuckDB twin of pip_join (no cover-cell pruning needed at oracle scale:
    the parity test is identical, pruning only removes never-matching pairs)."""
    nv = N_POLY_VERTS
    return f"""
WITH polys AS ({polygons_sql(n_poly)}),
pts AS (SELECT * FROM ({points_src})),
edges AS (
  SELECT poly_id, i,
         xs[i + 1] AS x1, ys[i + 1] AS y1,
         xs[(i + 1) % {nv} + 1] AS x2, ys[(i + 1) % {nv} + 1] AS y2
  FROM polys, (SELECT unnest(generate_series(0, {nv - 1})) AS i)
),
par AS (
  SELECT pts.*, e.poly_id,
         SUM(CASE WHEN ((e.y1 > pts.{lat}) != (e.y2 > pts.{lat}))
                   AND pts.{lon} < (e.x2 - e.x1) * (pts.{lat} - e.y1) / (e.y2 - e.y1) + e.x1
                  THEN 1 ELSE 0 END) AS crossings
  FROM pts CROSS JOIN edges e
  GROUP BY ALL
)
SELECT * EXCLUDE (crossings) FROM par WHERE crossings % 2 = 1
"""


def knn_join(
    points: DataFrame,
    anchors: DataFrame,
    k: int = 3,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """k nearest anchors per point (haversine), broadcast + window top-k."""
    a = anchors.select(
        F.col("anchor_id"), F.col("alat").alias("_alat"), F.col("alon").alias("_alon")
    )
    j = points.crossJoin(F.broadcast(a))
    d = haversine_km(F.col(lat_col), F.col(lon_col), F.col("_alat"), F.col("_alon"))
    j = j.withColumn("dist_km", F.round(d, 6))
    pt_cols = [c for c in points.columns]
    w = Window.partitionBy(*pt_cols).orderBy(F.col("dist_km").asc(), F.col("anchor_id").asc())
    return (
        j.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(*pt_cols, "rank", "anchor_id", "dist_km")
    )


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance, 6371.0072 km radius — portable arithmetic only."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.sin(dlat / 2) ** 2 + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    return 2.0 * 6371.0072 * F.asin(F.sqrt(a))


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    dlat = f"radians(({lat2}) - ({lat1}))"
    dlon = f"radians(({lon2}) - ({lon1}))"
    a = (
        f"(sin({dlat} / 2) * sin({dlat} / 2) + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin({dlon} / 2) * sin({dlon} / 2))"
    )
    return f"(2.0 * 6371.0072 * asin(sqrt({a})))"
