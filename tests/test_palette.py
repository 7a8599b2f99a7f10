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
