"""Palette subsystem: .cpt parsing (against the reference's own resource
files, read in place) + ARGB interpolation semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gridfour_spark import raster_ops as R

OCEAN = "/root/reference/core/src/test/resources/org/gridfour/imaging/palette/OceanBasemap.cpt"
CATEG = "/root/reference/core/src/test/resources/org/gridfour/imaging/palette/CategoricalPaletteWithNames.cpt"


def _argb_at(spark, records, z):
    df = spark.range(1).select(R.argb_expr(F.lit(float(z)), records).alias("argb"))
    return df.collect()[0].argb


@pytest.mark.skipif(not os.path.exists(OCEAN), reason="reference resources absent")
def test_ocean_basemap_cpt(spark):
    """Mirrors ColorPaletteTableReaderTest.testInputStream: range
    [-11000, 8000] and argb(0) == 0xffc0c0c0."""
    cpt = R.read_cpt(open(OCEAN).read())
    assert cpt["range_min"] == -11000.0 and cpt["range_max"] == 8000.0
    assert _argb_at(spark, cpt["records"], 0) == 0xFFC0C0C0


@pytest.mark.skipif(not os.path.exists(CATEG), reason="reference resources absent")
def test_categorical_cpt_labels():
    """Mirrors testCategoricalWithNames: labels parse in record order."""
    cpt = R.read_cpt(open(CATEG).read())
    assert cpt["labels"][:3] == ["Shrubland", "Savanna", "Grassland"]
    assert cpt["background"] == (0, 0, 0)
    assert cpt["foreground"] == (255, 255, 255)
    assert cpt["null_color"] == (128, 128, 128)
    # slash-separated colors parsed: 064/000/192
    assert cpt["records"][0][2] == (64, 0, 192)


def test_cpt_interpolation_midpoint(spark):
    cpt = R.read_cpt("0 0 0 0 10 100 200 40\n")
    # t=0.5: channel = (int)(delta*t + c0 + 0.5)
    assert _argb_at(spark, cpt["records"], 5.0) == (
        0xFF000000 | (50 << 16) | (100 << 8) | 20
    )


_HSV_CPT = """# test palette
# COLOR_MODEL = HSV
0 350-0.8-0.3 10 20-1.0-0.9
10 120-0.0-0.2 20 120-0.0-0.95
20 200-0.5-0.5 30 60-0.9-0.7
"""


def _java_hsb_to_rgb(hue, s, v):
    """Scalar port of java.awt.Color.HSBtoRGB (the reference's HSV->RGB)."""
    import math

    if s == 0:
        r = g = b = int(v * 255.0 + 0.5)
    else:
        h = (hue - math.floor(hue)) * 6.0
        f = h - math.floor(h)
        p = v * (1.0 - s)
        q = v * (1.0 - s * f)
        t = v * (1.0 - s * (1.0 - f))
        r_, g_, b_ = [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)][int(h)]
        r, g, b = int(r_ * 255.0 + 0.5), int(g_ * 255.0 + 0.5), int(b_ * 255.0 + 0.5)
    return 0xFF000000 | (r << 16) | (g << 8) | b


def _ref_hsv_argb(z, z0, z1, hsv0, hsv1):
    """Scalar port of ColorPaletteRecordHSV.getArgb:146-175."""
    h0, s0, v0, d_h, d_s, d_v, wrap = R._hsv_record_params(z0, z1, hsv0, hsv1)
    t = min(max((z - z0) / (z1 - z0), 0.0), 1.0)
    a = d_h * t + h0
    if wrap:
        if a < 0:
            a += 360
        elif a > 360:
            a -= 360
    return _java_hsb_to_rgb(a / 360.0, d_s * t + s0, d_v * t + v0)


def test_hsv_cpt_parse_and_interpolation(spark):
    """HSV color model (ColorPaletteTableReader.java:282 + ColorPaletteRecordHSV):
    wrap-around hue (350->20 crosses 0), s==0 grey ramp, counterclockwise
    path — Spark expr matches the scalar Java-port oracle on a dense sweep."""
    cpt = R.read_cpt(_HSV_CPT)  # dash triples h-s-v, parseSingleHsvString form
    assert cpt["model"] == "HSV"
    recs = cpt["records"]
    assert recs[0][2] == (350.0, 0.8, 0.3) and recs[0][3] == (20.0, 1.0, 0.9)

    zs = [round(0.13 + 0.61 * i, 4) for i in range(49)]  # 0.13 .. 29.4
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    got = {r.z: r.argb for r in df.select("z", R.argb_hsv_expr(F.col("z"), recs).alias("argb")).collect()}
    for z in zs:
        rec = next(r for r in recs if r[0] <= z < r[1])
        assert got[z] == _ref_hsv_argb(z, *rec), z


def test_termination_and_categorical_coverage(spark):
    """The LAST record covers z == range1 (termination record); categorical
    single-value records (z0 == z1) match their value exactly (code-review
    round 3 regression — both previously produced NULL ARGB)."""
    recs = [(0.0, 10.0, (0, 0, 0), (100, 100, 100)), (10.0, 20.0, (10, 10, 10), (210, 210, 210))]
    assert _argb_at(spark, recs, 20.0) == (0xFF000000 | (210 << 16) | (210 << 8) | 210)
    # categorical palette from the reference's own resource file semantics
    cat = [(5.0, 5.0, (7, 8, 9), (7, 8, 9))]
    assert _argb_at(spark, cat, 5.0) == (0xFF000000 | (7 << 16) | (8 << 8) | 9)
    assert _argb_at(spark, cat, 5.5) is None


def test_srgb_linear_round_trip_and_java_constants(spark):
    """LinearRgb parity (imaging/util/LinearRgb.java): every sRGB level
    round-trips exactly through linear space, and spot values match the
    reference's power-function constants (transition 0.04045, gamma 2.4,
    offset 0.055, dark factor 12.92)."""
    import math

    from pyspark.sql import functions as F

    from gridfour_spark import raster_ops as R

    df = spark.range(256).select(F.col("id").alias("c"))
    rows = df.select(
        "c",
        R.srgb_to_linear(F.col("c")).alias("lin"),
        R.linear_to_srgb(R.srgb_to_linear(F.col("c"))).alias("back"),
    ).collect()
    for r in rows:
        assert r.back == r.c, (r.c, r.back)
        s = r.c / 255.0
        exp = s / 12.92 if s <= 0.04045 else ((s + 0.055) / 1.055) ** 2.4
        assert math.isclose(r.lin, exp, rel_tol=1e-12), r.c
    assert abs(rows[255].lin - 1.0) < 1e-12
    assert rows[0].lin == 0.0
