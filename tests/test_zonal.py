"""Zonal statistics (spatial.zonal_stats): raster cells x polygon zones.

Checks: scalar ray-cast reference equality, DuckDB twin equality, plan
shape (cover-cell equi-join, no cartesian), partitioning invariance, and
the empty-zone contract (zones with no cells inside emit no row).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gridfour_spark import spatial, synth
from gridfour_spark.spec import GridSpec

SPEC = GridSpec(
    n_rows=90, n_cols=180, n_rows_in_tile=30, n_cols_in_tile=60,
    x0=-180.0 + 1.0, y0=-90.0 + 1.0, cell_size_x=2.0, cell_size_y=2.0,
    geographic=True,
)


def _cells(spark):
    return (
        synth.grid_df(spark, SPEC, value="dem")
        .select(
            "z",
            (F.lit(SPEC.y0) + F.col("row").cast("double") * F.lit(SPEC.cell_size_y)).alias("lat"),
            (F.lit(SPEC.x0) + F.col("col").cast("double") * F.lit(SPEC.cell_size_x)).alias("lon"),
        )
    )


def _cells_sql() -> str:
    return (
        f"SELECT z, ({SPEC.y0!r} + CAST(row AS DOUBLE) * {SPEC.cell_size_y!r}) AS lat, "
        f"({SPEC.x0!r} + CAST(col AS DOUBLE) * {SPEC.cell_size_x!r}) AS lon "
        f"FROM ({synth.grid_duckdb_sql(SPEC, value='dem')})"
    )


@pytest.fixture(scope="module")
def zonal_rows(spark):
    polys = spatial.synth_polygons(spark, 24)
    df = spatial.zonal_stats(_cells(spark), polys)
    return sorted(tuple(r) for r in df.collect())


def test_matches_duckdb_twin(zonal_rows):
    orc = sorted(tuple(r) for r in duckdb.sql(spatial.zonal_stats_sql(_cells_sql(), 24)).fetchall())
    assert zonal_rows == orc


def test_matches_scalar_raycast(spark, zonal_rows):
    cells = _cells(spark).collect()
    polys = {r["poly_id"]: (r["xs"], r["ys"]) for r in spatial.synth_polygons(spark, 24).collect()}

    def inside(lat, lon, xs, ys):
        n = len(xs)
        cross = 0
        for i in range(n):
            x1, y1 = xs[i], ys[i]
            x2, y2 = xs[(i + 1) % n], ys[(i + 1) % n]
            if (y1 > lat) != (y2 > lat) and lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
                cross += 1
        return cross % 2 == 1

    agg: dict[int, list] = {}
    for r in cells:
        for pid, (xs, ys) in polys.items():
            if inside(r["lat"], r["lon"], xs, ys):
                s = agg.setdefault(pid, [])
                s.append(int(r["z"]))
    ref = []
    for pid, zs in agg.items():
        zs.sort()
        n = len(zs)
        # exact linear-interpolation percentile at p=0.5 (both engines)
        import math as _m

        pos = 0.5 * (n - 1)
        lo, d = zs[int(_m.floor(pos))], pos - _m.floor(pos)
        med = lo + d * (zs[int(_m.ceil(pos))] - lo)
        ref.append((pid, n, sum(zs), zs[0], zs[-1], _m.floor(med * 1000)))
    ref.sort()
    assert zonal_rows == ref
    assert len(ref) > 0


def test_plan_has_no_cartesian_or_python(spark):
    polys = spatial.synth_polygons(spark, 24)
    df = spatial.zonal_stats(_cells(spark), polys)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_partitioning_invariance(spark, zonal_rows):
    polys = spatial.synth_polygons(spark, 24)
    df = spatial.zonal_stats(_cells(spark).repartition(13), polys)
    assert sorted(tuple(r) for r in df.collect()) == zonal_rows


def test_empty_zone_emits_no_row(spark):
    """A polygon placed over a region with no cell centers (between the
    2-degree grid lines) must not appear in the output."""
    polys = spark.createDataFrame(
        [(99, [0.2, 0.8, 0.8, 0.2], [0.2, 0.2, 0.8, 0.8])],
        "poly_id int, xs array<double>, ys array<double>",
    )
    out = spatial.zonal_stats(_cells(spark), polys).collect()
    assert out == []


def test_weighted_sums_exact_long_arithmetic(spark):
    """With a pre-quantized area_milli column the zone row gains
    sum_area_milli / sum_za_milli — pure long sums, so the result is
    partitioning-invariant and matches a scalar recomputation exactly."""
    import math as _m

    k2 = (_m.pi / 180.0 * 6371.0072 * SPEC.cell_size_x) ** 2
    cells = _cells(spark).withColumn(
        "area_milli",
        F.floor(F.lit(k2) * F.cos(F.radians("lat")) * 1000.0).cast("long"),
    )
    polys = spatial.synth_polygons(spark, 6)
    got = {
        r["poly_id"]: (r["sum_area_milli"], r["sum_za_milli"])
        for r in spatial.zonal_stats(cells, polys).collect()
    }
    got2 = {
        r["poly_id"]: (r["sum_area_milli"], r["sum_za_milli"])
        for r in spatial.zonal_stats(cells.repartition(11), polys).collect()
    }
    assert got == got2 and got
    rows = cells.collect()
    pl = {r["poly_id"]: (r["xs"], r["ys"]) for r in polys.collect()}

    def inside(lat, lon, xs, ys):
        n = len(xs)
        cross = 0
        for i in range(n):
            x1, y1 = xs[i], ys[i]
            x2, y2 = xs[(i + 1) % n], ys[(i + 1) % n]
            if (y1 > lat) != (y2 > lat) and lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
                cross += 1
        return cross % 2 == 1

    ref: dict = {}
    for r in rows:
        for pid, (xs, ys) in pl.items():
            if inside(r["lat"], r["lon"], xs, ys):
                a, za = ref.get(pid, (0, 0))
                ref[pid] = (a + r["area_milli"], za + r["area_milli"] * int(r["z"]))
    assert got == ref


def test_median_state_is_bounded_no_percentile_buffer(spark):
    """Round 8: the exact median derives from a (poly, value)-counts table
    + cumulative window — the plan must carry no Percentile expression
    (Spark's exact percentile buffers a raw value->count map per group,
    unbounded on high-cardinality rasters) and no ObjectHashAggregate."""
    out = spatial.zonal_stats(_cells(spark), spatial.synth_polygons(spark, 8))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in plan.lower()
    assert "ObjectHashAggregate" not in plan
    assert "Window" in plan


def test_median_exact_on_high_cardinality_floats(spark):
    """Float-valued raster with every cell value distinct: the counts-table
    median must still equal Spark's exact percentile (one counts row per
    distinct value — degraded state bound, identical result)."""
    cells = _cells(spark).withColumn(
        "z", F.col("z").cast("double") + F.col("lat") * 1e-3 + F.col("lon") * 1e-6
    )
    polys = spatial.synth_polygons(spark, 8)
    got = {
        r["poly_id"]: r["med_z_milli"]
        for r in spatial.zonal_stats(cells, polys).collect()
    }
    ref = {
        r["poly_id"]: r["m"]
        for r in spatial.pip_join(cells, polys)
        .groupBy("poly_id")
        .agg(F.floor(F.expr("percentile(z, 0.5)") * 1000.0).cast("long").alias("m"))
        .collect()
    }
    assert got == ref and len(got) > 0
