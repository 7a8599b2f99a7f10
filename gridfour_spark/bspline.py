"""Cubic B-spline raster->vector sampling, Spark-first.

Re-expresses the reference's interpolator as ONE declarative plan:

  interpolation/InterpolatorBSpline.java:192-380 — uniform cubic basis
     b0=(1-u)^3/6, b1=(3u^2(u-2)+4)/6, b2=(3u(1+u-u^2)+1)/6, b3=u^3/6,
     tensor product over a 4x4 stencil, first/second derivatives by the
     chain rule with row/column spacing.
  gvrs/GvrsInterpolatorBSpline.java:374-484 — stencil localization: row
     fringe clamp, standard fast path col0=iCol-1 for 1<=iCol<=nCols-3,
     date-line WRAP stitching via modular columns, boundary clamping with
     blockLimit, u = col - col0 - 1, v = row - row0 - 1.

Because the interpolated value and every derivative are LINEAR in the 16
stencil samples, the Spark operator needs no pivot and no Python: each query
point explodes into its 16 (stencil_row, stencil_col) cells, joins the tile
store on tile_index (the shuffle IS the reference's tile cache), and a single
groupBy(pt) aggregates SUM(weight * z) for each output — value, zx, zy, zxx,
zxy, zyy — entirely inside whole-stage codegen. At 10^12 points this is one
equi-join + one partial-aggregated shuffle.

A vectorized numpy twin (interpolate_grid) serves as the in-memory oracle for
tests, mirroring InterpolatorBSpline.interpolate exactly.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gridfour_spark.spec import GridSpec
from gridfour_spark.tiling import with_tile_assignment

R_EARTH_M = 6371007.2  # GvrsInterpolatorBSpline.java:99


# ---------------------------------------------------------------------------
# numpy kernel (test oracle; also usable inside Arrow kernels)
# ---------------------------------------------------------------------------

def _basis(u):
    um1 = 1.0 - u
    return (
        um1 * um1 * um1 / 6.0,
        (3 * u * u * (u - 2) + 4) / 6.0,
        (3 * u * (1 + u - u * u) + 1) / 6.0,
        u * u * u / 6.0,
    )


def _basis_d(u, s):
    um1 = 1.0 - u
    return (
        -um1 * um1 / 2.0 / s,
        (3.0 * u / 2.0 - 2.0) * u / s,
        (0.5 - (3.0 * u / 2.0 - 1.0) * u) / s,
        u * u / 2.0 / s,
    )


def _basis_dd(u, s):
    s2 = s * s
    return ((1 - u) / s2, (3 * u - 2) / s2, (1 - 3 * u) / s2, u / s2)


def interpolate_grid(
    z: np.ndarray,
    rows: np.ndarray,
    cols: np.ndarray,
    row_spacing: float = 1.0,
    col_spacing: float = 1.0,
    derivatives: bool = True,
) -> dict[str, np.ndarray]:
    """Vectorized port of InterpolatorBSpline.interpolate (:192-380) over an
    in-memory grid; fractional (rows, cols) arrays in grid coordinates."""
    nr, nc = z.shape
    rows = np.asarray(rows, dtype=np.float64)
    cols = np.asarray(cols, dtype=np.float64)
    i_col = np.floor(cols).astype(np.int64)
    i_row = np.floor(rows).astype(np.int64)
    u = cols - i_col
    v = rows - i_row
    col0 = i_col - 1
    row0 = i_row - 1
    # outer-band adjustments (:214-229)
    lo = col0 < 0
    u = np.where(lo, cols - 1.0, u)
    col0 = np.where(lo, 0, col0)
    hi = col0 > nc - 4
    u = np.where(hi, cols - 1.0 - (nc - 4), u)
    col0 = np.where(hi, nc - 4, col0)
    lo = row0 < 0
    v = np.where(lo, rows - 1.0, v)
    row0 = np.where(lo, 0, row0)
    hi = row0 > nr - 4
    v = np.where(hi, rows - 1.0 - (nr - 4), v)
    row0 = np.where(hi, nr - 4, row0)

    # gather the 4x4 stencils: (n, 4, 4)
    rr = row0[:, None] + np.arange(4)[None, :]
    cc = col0[:, None] + np.arange(4)[None, :]
    zs = z[rr[:, :, None], cc[:, None, :]].astype(np.float64)

    b = np.stack(_basis(u), axis=1)  # (n, 4) column-direction
    p = np.stack(_basis(v), axis=1)  # (n, 4) row-direction
    out = {"z": np.einsum("nj,njk,nk->n", p, zs, b)}
    if derivatives:
        bu = np.stack(_basis_d(u, col_spacing), axis=1)
        pv = np.stack(_basis_d(v, row_spacing), axis=1)
        buu = np.stack(_basis_dd(u, col_spacing), axis=1)
        pvv = np.stack(_basis_dd(v, row_spacing), axis=1)
        out["zx"] = np.einsum("nj,njk,nk->n", p, zs, bu)
        out["zy"] = np.einsum("nj,njk,nk->n", pv, zs, b)
        out["zxy"] = np.einsum("nj,njk,nk->n", pv, zs, bu)
        out["zxx"] = np.einsum("nj,njk,nk->n", p, zs, buu)
        out["zyy"] = np.einsum("nj,njk,nk->n", pvv, zs, b)
    return out


# ---------------------------------------------------------------------------
# shared basis SQL (valid in Spark SQL and DuckDB; idx is 0..3, u an expr)
# ---------------------------------------------------------------------------

def basis_sql(idx: str, u: str) -> str:
    return (
        f"(CASE ({idx}) "
        f"WHEN 0 THEN (1.0-({u}))*(1.0-({u}))*(1.0-({u}))/6.0 "
        f"WHEN 1 THEN (3.0*({u})*({u})*(({u})-2.0)+4.0)/6.0 "
        f"WHEN 2 THEN (3.0*({u})*(1.0+({u})-({u})*({u}))+1.0)/6.0 "
        f"ELSE ({u})*({u})*({u})/6.0 END)"
    )


def basis_d_sql(idx: str, u: str, s: float) -> str:
    return (
        f"(CASE ({idx}) "
        f"WHEN 0 THEN -(1.0-({u}))*(1.0-({u}))/2.0/{s!r} "
        f"WHEN 1 THEN (3.0*({u})/2.0-2.0)*({u})/{s!r} "
        f"WHEN 2 THEN (0.5-(3.0*({u})/2.0-1.0)*({u}))/{s!r} "
        f"ELSE ({u})*({u})/2.0/{s!r} END)"
    )


def basis_dd_sql(idx: str, u: str, s: float) -> str:
    s2 = s * s
    return (
        f"(CASE ({idx}) "
        f"WHEN 0 THEN (1.0-({u}))/{s2!r} "
        f"WHEN 1 THEN (3.0*({u})-2.0)/{s2!r} "
        f"WHEN 2 THEN (1.0-3.0*({u}))/{s2!r} "
        f"ELSE ({u})/{s2!r} END)"
    )


# ---------------------------------------------------------------------------
# Spark operator: points + tile store -> interpolated values/derivatives
# ---------------------------------------------------------------------------

def _block_limit(i: Column, n: int) -> Column:
    """blockLimit (GvrsInterpolatorBSpline.java:306-314)."""
    return F.least(F.greatest(i, F.lit(0)), F.lit(n - 4))


def with_stencil_params(pts: DataFrame, spec: GridSpec) -> DataFrame:
    """loadSamples localization (GvrsInterpolatorBSpline.java:374-445):
    expects fractional grid coords grid_row_f / grid_col_f; appends
    row0, u, v, wrap flag, col0; drops points outside the fringes."""
    nr, nc = spec.n_rows, spec.n_cols
    row_f = F.col("grid_row_f")
    col_f = F.col("grid_col_f")

    # non-finite coordinates are DROPPED up front (round-4 review): Spark,
    # like Java, casts NaN to 0 in the column math, which would silently
    # sample tile 0 with NaN weights instead of failing or skipping
    finite = (
        row_f.isNotNull() & ~F.isnan(row_f) & (F.abs(row_f) != float("inf"))
        & col_f.isNotNull() & ~F.isnan(col_f) & (F.abs(col_f) != float("inf"))
    )
    pts = pts.filter(finite)

    row_ok = (row_f >= F.lit(spec.row_fringe_0)) & (row_f <= F.lit(spec.row_fringe_1))
    rowc = F.least(F.greatest(row_f, F.lit(0.0)), F.lit(float(nr - 1)))
    pts = pts.filter(row_ok).withColumn("_rowc", rowc)
    pts = pts.withColumn("_irow", F.floor("_rowc"))
    pts = pts.withColumn("row0", _block_limit(F.col("_irow") - 1, nr))
    pts = pts.withColumn("v", F.col("_rowc") - F.col("row0") - 1)

    i_col = F.floor(col_f)
    pts = pts.withColumn("_icol", i_col)
    standard = (F.col("_icol") >= 1) & (F.col("_icol") <= nc - 3)
    if spec.wraps_longitude:
        n_cols_for_wrap = nc  # geoBracketsLongitude -> nc-1 (not used by our specs)
        pts = pts.withColumn("_wrap", ~standard)
        pts = pts.withColumn(
            "col0",
            F.when(standard, F.col("_icol") - 1).otherwise(
                F.pmod(F.col("_icol") - 1, F.lit(n_cols_for_wrap))
            ),
        )
        pts = pts.withColumn("u", col_f - F.col("_icol"))
        pts = pts.withColumn("_ncw", F.lit(n_cols_for_wrap))
    else:
        col_ok = (col_f >= F.lit(spec.col_fringe_0)) & (col_f <= F.lit(spec.col_fringe_1))
        pts = pts.filter(col_ok)
        colc = F.least(F.greatest(col_f, F.lit(0.0)), F.lit(float(nc - 1)))
        icolc = F.least(F.greatest(F.col("_icol"), F.lit(0)), F.lit(nc - 1))
        pts = pts.withColumn("_wrap", F.lit(False))
        pts = pts.withColumn(
            "col0", F.when(standard, F.col("_icol") - 1).otherwise(_block_limit(icolc - 1, nc))
        )
        pts = pts.withColumn(
            "u", F.when(standard, col_f - F.col("_icol")).otherwise(colc - F.col("col0") - 1)
        )
        pts = pts.withColumn("_ncw", F.lit(nc))
    return pts.drop("_rowc", "_irow")


def interpolate_points(
    pts: DataFrame,
    tiles: DataFrame,
    spec: GridSpec,
    pt_id: str = "pt_id",
    derivatives: bool = False,
    col_spacing: float | None = None,
    row_spacing: float | None = None,
    quantize: bool = False,
    broadcast_tiles: bool = False,
) -> DataFrame:
    """B-spline sample the tile store at query points.

    pts must carry pt_id + grid_row_f/grid_col_f (e.g. from with_geo_to_grid).
    Default spacings follow the reference's geographic constructor:
    du = rEarth * toRadians(cellSize) (GvrsInterpolatorBSpline.java:118-126).
    """
    if col_spacing is None:
        col_spacing = (
            R_EARTH_M * math.radians(spec.cell_size_x) if spec.geographic else spec.cell_size_x
        )
    if row_spacing is None:
        row_spacing = (
            R_EARTH_M * math.radians(spec.cell_size_y) if spec.geographic else spec.cell_size_y
        )

    loc = with_stencil_params(pts, spec)
    # 16 stencil cells per point; wrap path takes columns modulo the grid
    ex = loc.withColumn("sid", F.explode(F.sequence(F.lit(0), F.lit(15))))
    ex = ex.withColumn("_j", F.expr("sid div 4")).withColumn("_k", F.col("sid") % 4)
    ex = ex.withColumn("row", F.col("row0") + F.col("_j"))
    ex = ex.withColumn(
        "col",
        F.when(F.col("_wrap"), F.pmod(F.col("col0") + F.col("_k"), F.col("_ncw"))).otherwise(
            F.col("col0") + F.col("_k")
        ),
    )
    ex = with_tile_assignment(ex, spec)
    # broadcast_tiles: a few hundred tiles (tens of MB) joined against
    # billions of stencil rows — broadcasting avoids shuffling the point side;
    # leave False when the tile store itself is large (bucketed join instead)
    tside = tiles.select("tile_index", "cells")
    if broadcast_tiles:
        tside = F.broadcast(tside)
    joined = ex.join(tside, on="tile_index", how="left")
    z = F.element_at(F.col("cells"), (F.col("index_in_tile") + 1).cast("int"))
    joined = joined.withColumn("_z", z)

    b = F.expr(basis_sql("_k", "u"))
    p = F.expr(basis_sql("_j", "v"))

    def term(w, name, scale):
        # quantize: floor each per-row product to an integer BEFORE summing,
        # so the aggregate is an exact integer sum — immune to cross-engine
        # float-summation order (the per-row product is one deterministic
        # double expression in both engines)
        if quantize:
            return F.sum(F.floor(w * F.col("_z") * F.lit(scale)).cast("long")).alias(name)
        return F.round(F.sum(w * F.col("_z")), 6).alias(name)

    # a stencil cell in a missing/sparse tile leaves _z NULL; F.sum would
    # silently skip it and return a biased finite value — count the hits
    # and DROP points with an incomplete stencil (readValue throws there;
    # same sparse-store semantics as bilinear_points)
    aggs = [F.count(F.col("_z")).alias("_n_hit")]
    aggs += [term(b * p, "z_q" if quantize else "z", 1e6)]
    if derivatives:
        bu = F.expr(basis_d_sql("_k", "u", col_spacing))
        pv = F.expr(basis_d_sql("_j", "v", row_spacing))
        buu = F.expr(basis_dd_sql("_k", "u", col_spacing))
        pvv = F.expr(basis_dd_sql("_j", "v", row_spacing))
        sfx = "_q" if quantize else ""
        aggs += [
            term(bu * p, "zx" + sfx, 1e9),
            term(b * pv, "zy" + sfx, 1e9),
            term(bu * pv, "zxy" + sfx, 1e12),
            term(buu * p, "zxx" + sfx, 1e12),
            term(b * pvv, "zyy" + sfx, 1e12),
        ]
    out = joined.groupBy(pt_id).agg(*aggs)
    return out.filter(F.col("_n_hit") == 16).drop("_n_hit")


def interpolate_points_arrow(
    pts: DataFrame,
    grid: np.ndarray,
    spec: GridSpec,
    pt_id: str = "pt_id",
    derivatives: bool = False,
    col_spacing: float | None = None,
    row_spacing: float | None = None,
) -> DataFrame:
    """In-memory FAST PATH: the full raster broadcast to every executor,
    the 4x4 stencil gathered in one vectorized numpy pass per Arrow batch
    (mapInPandas) — zero joins, zero shuffles, the exact regime of the
    reference's InterpolatorBSpline benchmark (in-memory array, :65-68).

    Use when the raster fits in executor memory (GLOBAL_GRID = 52 MB);
    interpolate_points (stencil-explode + tile join) remains the scale
    path for rasters that don't. Localization mirrors with_stencil_params
    exactly (fringe clamp, date-line wrap, block limits), so both paths
    agree cell-for-cell (tests/test_bspline_arrow.py).

    Measured trade-off (10M points, local[32]; bench.py reports BOTH paths
    as bspline_join_derivs_sec / bspline_arrow_derivs_sec so the claim is
    pinned by the committed artifact, round-5 advice): the Python/Arrow
    boundary floors at ~4.3M rows/s round-trip on this box regardless of
    kernel work (an identity mapInPandas costs 2.3 s), so for the
    VALUE-ONLY query the all-JVM join path roughly ties it. With all six
    derivative surfaces the Arrow path computes every output from one
    stencil gather while the join path pays six aggregate expressions
    over the 16x-exploded rows — on this (shared, noisy) box that nets
    out to the Arrow path matching or modestly beating the join path
    (5.6 s vs 5.8 s in the round-5 probe; larger wins appear only in
    quiet windows). Its real advantage is structural: per-batch numpy
    work scales with points, not points x 16 exploded rows."""
    if col_spacing is None:
        col_spacing = (
            R_EARTH_M * math.radians(spec.cell_size_x) if spec.geographic else spec.cell_size_x
        )
    if row_spacing is None:
        row_spacing = (
            R_EARTH_M * math.radians(spec.cell_size_y) if spec.geographic else spec.cell_size_y
        )
    spark = pts.sparkSession
    bgrid = spark.sparkContext.broadcast(np.ascontiguousarray(grid, dtype=np.float64))
    nr, nc = spec.n_rows, spec.n_cols
    wraps = spec.wraps_longitude

    # ONLY the raw coordinates cross the Arrow boundary (3 columns — the
    # localization math runs in numpy inside the kernel, mirroring
    # with_stencil_params exactly). The FILTER semantics stay Spark-side so
    # dropped points match the join path: fringe windows, plus an explicit
    # finite-coordinate requirement — the join path drops NULL/NaN
    # coordinates via missed tile joins, and numpy floor(NaN)->INT64_MIN
    # would otherwise wrap to a VALID index and gather garbage (review).
    row_f, col_f = F.col("grid_row_f"), F.col("grid_col_f")
    finite = (
        row_f.isNotNull() & ~F.isnan(row_f) & (F.abs(row_f) != float("inf"))
        & col_f.isNotNull() & ~F.isnan(col_f) & (F.abs(col_f) != float("inf"))
    )
    keep = finite & (row_f >= F.lit(spec.row_fringe_0)) & (row_f <= F.lit(spec.row_fringe_1))
    if not wraps:
        keep = keep & (col_f >= F.lit(spec.col_fringe_0)) & (col_f <= F.lit(spec.col_fringe_1))
    loc = pts.filter(keep).select(pt_id, "grid_row_f", "grid_col_f")

    names = ["z"] + (["zx", "zy", "zxy", "zxx", "zyy"] if derivatives else [])
    id_type = pts.schema[pt_id].dataType.simpleString()
    schema = ", ".join([f"{pt_id} {id_type}"] + [f"{n} double" for n in names])
    cs, rs = float(col_spacing), float(row_spacing)

    def kernel(batches):
        import pandas as pd

        g = bgrid.value
        gf = g.ravel()
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            rfv = pdf["grid_row_f"].to_numpy(dtype=np.float64)
            cfv = pdf["grid_col_f"].to_numpy(dtype=np.float64)
            # row localization (block limit + fringe clamp)
            rowc = np.clip(rfv, 0.0, float(nr - 1))
            irow = np.floor(rowc).astype(np.int64)
            row0 = np.clip(irow - 1, 0, nr - 4)
            v = rowc - row0 - 1.0
            # column localization
            icol = np.floor(cfv).astype(np.int64)
            standard = (icol >= 1) & (icol <= nc - 3)
            if wraps:
                col0 = np.where(standard, icol - 1, (icol - 1) % nc)
                u = cfv - icol
                cc = col0[:, None] + np.arange(4)[None, :]
                np.mod(cc, nc, out=cc, where=~standard[:, None])
            else:
                colc = np.clip(cfv, 0.0, float(nc - 1))
                icolc = np.clip(icol, 0, nc - 1)
                col0 = np.where(standard, icol - 1, np.clip(icolc - 1, 0, nc - 4))
                u = np.where(standard, cfv - icol, colc - col0 - 1.0)
                cc = col0[:, None] + np.arange(4)[None, :]
            base = row0 * nc
            b = _basis(u)
            p = _basis(v)
            weights = [(b, p, "z")]
            if derivatives:
                bu, pv = _basis_d(u, cs), _basis_d(v, rs)
                buu, pvv = _basis_dd(u, cs), _basis_dd(v, rs)
                weights += [(bu, p, "zx"), (b, pv, "zy"), (bu, pv, "zxy"),
                            (buu, p, "zxx"), (b, pvv, "zyy")]
            # gather the 16 stencil columns ONCE, unrolled flat take
            zcols = [
                [gf[base + j * nc + cc[:, k]] for k in range(4)] for j in range(4)
            ]
            # sparse-store parity (review): the join path DROPS a point
            # whose stencil touches a missing (all-fill) tile (_n_hit==16
            # rule); NaN cells in the materialized grid are those tiles —
            # drop the same points here instead of emitting NaN rows
            ok = np.ones(n, dtype=bool)
            for j in range(4):
                for k in range(4):
                    ok &= ~np.isnan(zcols[j][k])
            out = {pt_id: pdf[pt_id].to_numpy()[ok]}
            for wb, wp, name in weights:
                acc = np.zeros(n)
                for j in range(4):
                    rowacc = wb[0] * zcols[j][0]
                    for k in range(1, 4):
                        rowacc += wb[k] * zcols[j][k]
                    acc += wp[j] * rowacc
                out[name] = np.round(acc, 6)[ok]
            yield pd.DataFrame(out)

    return loc.mapInPandas(kernel, schema)


def interpolate_points_sql(
    spec: GridSpec,
    points_cte: str,
    grid_cte: str,
    derivatives: bool = False,
    col_spacing: float | None = None,
    row_spacing: float | None = None,
    pt_id: str = "pt_id",
    quantize: bool = False,
) -> str:
    """DuckDB twin of interpolate_points: same localization, same weighted
    sums, joined against a dense (row, col, z) grid CTE instead of tiles."""
    nr, nc = spec.n_rows, spec.n_cols
    if col_spacing is None:
        col_spacing = (
            R_EARTH_M * math.radians(spec.cell_size_x) if spec.geographic else spec.cell_size_x
        )
    if row_spacing is None:
        row_spacing = (
            R_EARTH_M * math.radians(spec.cell_size_y) if spec.geographic else spec.cell_size_y
        )
    wrap = spec.wraps_longitude
    rowc = f"least(greatest(grid_row_f, 0.0), {float(nr - 1)!r})"
    row0 = f"least(greatest(CAST(floor({rowc}) AS BIGINT) - 1, 0), {nr - 4})"
    icol = "CAST(floor(grid_col_f) AS BIGINT)"
    std = f"({icol} >= 1 AND {icol} <= {nc - 3})"
    if wrap:
        col0 = f"(CASE WHEN {std} THEN {icol} - 1 ELSE ((({icol} - 1) % {nc}) + {nc}) % {nc} END)"
        u = f"(grid_col_f - {icol})"
        colfilter = ""
        scol = f"(CASE WHEN std THEN col0 + jk.k ELSE ((col0 + jk.k) % {nc} + {nc}) % {nc} END)"
    else:
        colc = f"least(greatest(grid_col_f, 0.0), {float(nc - 1)!r})"
        icolc = f"least(greatest({icol}, 0), {nc - 1})"
        col0 = (
            f"(CASE WHEN {std} THEN {icol} - 1 "
            f"ELSE least(greatest({icolc} - 1, 0), {nc - 4}) END)"
        )
        u = f"(CASE WHEN {std} THEN grid_col_f - {icol} ELSE {colc} - {col0} - 1 END)"
        colfilter = (
            f"AND grid_col_f >= {spec.col_fringe_0!r} AND grid_col_f <= {spec.col_fringe_1!r}"
        )
        scol = "col0 + jk.k"
    b = basis_sql("k", "u")
    p = basis_sql("j", "v")

    def term(w: str, name: str, scale: float) -> str:
        if quantize:
            return f"CAST(SUM(CAST(floor({w} * z * {scale!r}) AS BIGINT)) AS BIGINT) AS {name}_q"
        return f"ROUND(SUM({w} * z), 6) AS {name}"

    aggs = [term(f"{b} * {p}", "z", 1e6)]
    if derivatives:
        bu = basis_d_sql("k", "u", col_spacing)
        pv = basis_d_sql("j", "v", row_spacing)
        buu = basis_dd_sql("k", "u", col_spacing)
        pvv = basis_dd_sql("j", "v", row_spacing)
        aggs += [
            term(f"{bu} * {p}", "zx", 1e9),
            term(f"{b} * {pv}", "zy", 1e9),
            term(f"{bu} * {pv}", "zxy", 1e12),
            term(f"{buu} * {p}", "zxx", 1e12),
            term(f"{b} * {pvv}", "zyy", 1e12),
        ]
    agg_sql = ", ".join(aggs)
    return f"""
WITH pts AS ({points_cte}),
grid AS ({grid_cte}),
loc AS (
  SELECT {pt_id}, {row0} AS row0,
         ({rowc} - {row0} - 1) AS v,
         {col0} AS col0, {u} AS u, {std} AS std
  FROM pts
  WHERE grid_row_f >= {spec.row_fringe_0!r} AND grid_row_f <= {spec.row_fringe_1!r} {colfilter}
),
ex AS (
  SELECT loc.*, jk.j, jk.k, row0 + jk.j AS srow, {scol} AS scol
  FROM loc CROSS JOIN (
    SELECT a.range AS j, b.range AS k FROM range(4) a CROSS JOIN range(4) b
  ) jk
)
SELECT {pt_id}, {agg_sql}
FROM ex JOIN grid ON grid.row = ex.srow AND grid.col = ex.scol
GROUP BY {pt_id}
"""


# ---------------------------------------------------------------------------
# A4: bilinear cross-check interpolator (GvrsInterpolatorBSpline.zTest:348-372)
# ---------------------------------------------------------------------------

def bilinear_points(
    pts: DataFrame,
    tiles: DataFrame,
    spec: GridSpec,
    pt_id: str = "pt_id",
    quantize: bool = True,
    broadcast_tiles: bool = False,
) -> DataFrame:
    """Bilinear sample the tile store — the reference's own cross-check
    interpolator (zTest): row0/col0 by int truncation, MODULAR column wrap
    (c = (col0 + nCols + k) % nCols), rows unwrapped, and the exact
    two-level lerp expression tree
        z = (1-cs)*((1-ct)*z0 + ct*z1) + cs*((1-ct)*z2 + ct*z3)
    so results are bit-stable across engines (no unordered 4-term sum).

    Plan: 4 stencil cells per point via posexplode -> ONE tile equi-join ->
    conditional aggregation pivots z0..z3 back onto the point row. Points
    with row0+1 outside the grid are dropped (readValue would throw)."""
    nc, nr = spec.n_cols, spec.n_rows
    p = pts.withColumn("_row0", F.col("grid_row_f").cast("int"))
    p = p.withColumn("_col0", F.col("grid_col_f").cast("int"))
    p = p.filter((F.col("grid_row_f") >= 0) & (F.col("_row0") + 1 <= F.lit(nr - 1)))
    p = p.withColumn("_ct", F.col("grid_col_f") - F.col("_col0"))
    p = p.withColumn("_cs", F.col("grid_row_f") - F.col("_row0"))

    ex = p.withColumn("sid", F.explode(F.sequence(F.lit(0), F.lit(3))))
    ex = ex.withColumn("row", F.col("_row0") + F.expr("sid div 2"))
    ex = ex.withColumn("col", (F.col("_col0") + F.lit(nc) + F.col("sid") % 2) % F.lit(nc))
    ex = with_tile_assignment(ex, spec)
    tside = tiles.select("tile_index", "cells")
    if broadcast_tiles:
        tside = F.broadcast(tside)
    joined = ex.join(tside, on="tile_index", how="left")
    z = F.element_at(F.col("cells"), (F.col("index_in_tile") + 1).cast("int"))
    joined = joined.withColumn("_z", z)
    g = joined.groupBy(pt_id, "_ct", "_cs").agg(
        *[F.max(F.when(F.col("sid") == s, F.col("_z"))).alias(f"z{s}") for s in range(4)]
    )
    # a stencil cell in a missing/sparse tile leaves z_i NULL: drop the point
    # (readValue throws there; also matches the oracle's four INNER joins —
    # ADVICE round 2, sparse-store parity)
    g = g.filter(
        F.col("z0").isNotNull() & F.col("z1").isNotNull()
        & F.col("z2").isNotNull() & F.col("z3").isNotNull()
    )
    ct, cs = F.col("_ct"), F.col("_cs")
    y0 = (1 - ct) * F.col("z0") + ct * F.col("z1")
    y1 = (1 - ct) * F.col("z2") + ct * F.col("z3")
    zout = (1 - cs) * y0 + cs * y1
    if quantize:
        return g.select(pt_id, F.floor(zout * 1e6).cast("long").alias("z_q"))
    return g.select(pt_id, zout.alias("z"))


def bilinear_points_sql(spec: GridSpec, pts_sql: str, grid_sql: str, quantize: bool = True) -> str:
    """DuckDB twin of bilinear_points: identical truncation, modular wrap,
    and lerp expression tree; the grid plays the tile store."""
    nc, nr = spec.n_cols, spec.n_rows
    out = (
        "CAST(floor(((1 - cs) * ((1 - ct) * z0 + ct * z1) + cs * ((1 - ct) * z2 + ct * z3)) * 1e6) AS BIGINT) AS z_q"
        if quantize
        else "(1 - cs) * ((1 - ct) * z0 + ct * z1) + cs * ((1 - ct) * z2 + ct * z3) AS z"
    )
    return f"""
WITH p0 AS (
  SELECT pt_id, grid_row_f, grid_col_f,
         CAST(trunc(grid_row_f) AS INTEGER) AS row0, CAST(trunc(grid_col_f) AS INTEGER) AS col0
  FROM ({pts_sql})
  WHERE grid_row_f >= 0 AND CAST(trunc(grid_row_f) AS INTEGER) + 1 <= {nr - 1}
),
p AS (
  SELECT pt_id, row0, col0,
         grid_col_f - col0 AS ct, grid_row_f - row0 AS cs,
         (col0 + {nc}) % {nc} AS c0, (col0 + {nc} + 1) % {nc} AS c1
  FROM p0
),
g AS (SELECT row, col, z FROM ({grid_sql}))
SELECT p.pt_id, {out}
FROM p
JOIN g g0 ON g0.row = p.row0     AND g0.col = p.c0
JOIN g g1 ON g1.row = p.row0     AND g1.col = p.c1
JOIN g g2 ON g2.row = p.row0 + 1 AND g2.col = p.c0
JOIN g g3 ON g3.row = p.row0 + 1 AND g3.col = p.c1
""".replace("z0", "g0.z").replace("z1", "g1.z").replace("z2", "g2.z").replace("z3", "g3.z")
