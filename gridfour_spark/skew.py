"""Skew handling: salted joins and adaptive cell-resolution escalation.

north_rule mandates: "Skew from dense coastal/urban tiles is handled with
salted repartitioning and adaptive cell-resolution splitting (H3 res
escalation for hot cells)". The synthetic corpus concentrates ~30% of spans
in 4 city tiles (synth.LAT_SQL/LON_SQL), so these operators are exercised by
real hot keys.

- AGGREGATION skew is absorbed by Catalyst's partial aggregation (map-side
  combine reduces each hot tile to one row per task before the shuffle) plus
  AQE skew handling — no custom code needed (SURVEY §4).
- JOIN skew needs salting when the small side is too large to broadcast:
  salted_join() splits each hot key's rows across n_salts shuffle partitions
  and replicates the other side n_salts times. Semantics identical to the
  plain equi-join (tests assert equality).
- HOT-CELL escalation: points are indexed at a base lat/lon cell resolution
  (a stand-in for H3: quadtree-style halving cells — h3-py is not in this
  container); cells whose count exceeds a threshold are re-indexed one
  resolution finer. Deterministic two-pass plan: count -> broadcast hot set
  -> final (res, cell) key. At 10^12 docs the hot set is tiny (cities), so
  the second pass is a broadcast semi-join, not a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key salting: large side gets a deterministic salt
    from its OTHER columns' hash; small side is replicated n_salts times.
    Result rows == plain large.join(small, key, how)."""
    lcols = [c for c in large.columns if c != key]
    salt_src = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in lcols]) if lcols else F.lit("")
    l = large.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return l.join(s, on=[key, "_salt"], how=how).drop("_salt")


# --- adaptive cell resolution ------------------------------------------------

def cell_id(lat: Column, lon: Column, res: int) -> Column:
    """Quadtree-style lat/lon cell at resolution res: 2^res rows x 2^(res+1)
    cols over the globe; id = cell_row * n_cols + cell_col. Resolution r+1
    splits every cell in four (the H3-escalation stand-in)."""
    n_rows = 1 << res
    n_cols = 1 << (res + 1)
    crow = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n_rows))), F.lit(n_rows - 1)
    )
    ccol = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n_cols))), F.lit(n_cols - 1)
    )
    return (crow * n_cols + ccol).cast("long")


def cell_id_sql(lat: str, lon: str, res: int) -> str:
    n_rows = 1 << res
    n_cols = 1 << (res + 1)
    crow = f"least(CAST(floor((({lat}) + 90.0) / 180.0 * {float(n_rows)!r}) AS BIGINT), {n_rows - 1})"
    ccol = f"least(CAST(floor((({lon}) + 180.0) / 360.0 * {float(n_cols)!r}) AS BIGINT), {n_cols - 1})"
    return f"CAST({crow} * {n_cols} + {ccol} AS BIGINT)"


def adaptive_cells(
    points: DataFrame,
    base_res: int = 4,
    hot_threshold: int = 1000,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Two-pass hot-cell escalation: base-res counts -> cells over threshold
    re-indexed at base_res+1. Output adds (cell_res, cell)."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    pts = points.withColumn("_c0", cell_id(lat, lon, base_res))
    counts = pts.groupBy("_c0").agg(F.count("*").alias("_n"))
    hot = counts.filter(F.col("_n") > hot_threshold).select("_c0", F.lit(True).alias("_hot"))
    pts = pts.join(F.broadcast(hot), on="_c0", how="left")
    is_hot = F.coalesce(F.col("_hot"), F.lit(False))
    out = pts.withColumn("cell_res", F.when(is_hot, base_res + 1).otherwise(base_res))
    out = out.withColumn(
        "cell", F.when(is_hot, cell_id(lat, lon, base_res + 1)).otherwise(F.col("_c0"))
    )
    return out.drop("_c0", "_hot")


def adaptive_cells_sql(
    points_src: str,
    base_res: int = 4,
    hot_threshold: int = 1000,
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    c0 = cell_id_sql(lat, lon, base_res)
    c1 = cell_id_sql(lat, lon, base_res + 1)
    return f"""
WITH pts AS (SELECT *, {c0} AS _c0 FROM ({points_src})),
counts AS (SELECT _c0, COUNT(*) AS _n FROM pts GROUP BY 1),
hot AS (SELECT _c0 FROM counts WHERE _n > {hot_threshold})
SELECT pts.* EXCLUDE (_c0),
       CASE WHEN hot._c0 IS NOT NULL THEN {base_res + 1} ELSE {base_res} END AS cell_res,
       CASE WHEN hot._c0 IS NOT NULL THEN {c1} ELSE pts._c0 END AS cell
FROM pts LEFT JOIN hot ON pts._c0 = hot._c0
"""
