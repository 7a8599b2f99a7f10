"""A12 true form: YCoCg-R reversible color transform
(demo/imaging/ExperimentalImageStorage.java:225-295).

The lifted integer transform must be exactly reversible for every RGB
triple, and the engine's column math must match the Java shift semantics
(arithmetic >> = floor division) including negative Co/Cg intermediates.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gridfour_spark import raster_ops as R


def _java_forward(r, g, b):
    co = r - b
    tmp = b + (co >> 1)  # python >> on ints is arithmetic, like Java
    cg = g - tmp
    y = tmp + (cg >> 1)
    return y, co, cg


def _rgb_fixture():
    vals = [0, 1, 2, 127, 128, 254, 255]
    triples = [(r, g, b) for r in vals for g in vals for b in vals]
    s = 48271
    for _ in range(500):
        s = (s * 48271) % 2147483647
        r = s % 256
        s = (s * 48271) % 2147483647
        g = s % 256
        s = (s * 48271) % 2147483647
        triples.append((r, g, s % 256))
    return triples


def test_ycocg_forward_matches_java_semantics_and_inverts(spark):
    triples = _rgb_fixture()
    df = spark.createDataFrame(
        [(0xFF000000 | (r << 16) | (g << 8) | b, r, g, b) for r, g, b in triples],
        "argb long, r int, g int, b int",
    )
    y, co, cg = R.ycocg_from_argb(F.col("argb"))
    ir, ig, ib = R.rgb_from_ycocg(y, co, cg)
    rows = df.select(
        "r", "g", "b",
        y.alias("y"), co.alias("co"), cg.alias("cg"),
        ir.alias("ir"), ig.alias("ig"), ib.alias("ib"),
    ).collect()
    for row in rows:
        jy, jco, jcg = _java_forward(row.r, row.g, row.b)
        assert (row.y, row.co, row.cg) == (jy, jco, jcg), (row.r, row.g, row.b)
        assert (row.ir, row.ig, row.ib) == (row.r, row.g, row.b)


def test_ycocg_sql_twin_matches(spark):
    import pytest

    duckdb = pytest.importorskip("duckdb")
    triples = _rgb_fixture()[:400]
    vals = ", ".join(
        f"({0xFF000000 | (r << 16) | (g << 8) | b}, {r}, {g}, {b})"
        for r, g, b in triples
    )
    y, co, cg = R.ycocg_sql("argb")
    ir, ig, ib = R.rgb_from_ycocg_sql(y, co, cg)
    got = duckdb.sql(
        f"SELECT r, g, b, {y} AS y, {co} AS co, {cg} AS cg, "
        f"{ir} AS ir, {ig} AS ig, {ib} AS ib "
        f"FROM (VALUES {vals}) t(argb, r, g, b)"
    ).fetchall()
    for r, g, b, yv, cov, cgv, irv, igv, ibv in got:
        assert (yv, cov, cgv) == _java_forward(r, g, b)
        assert (irv, igv, ibv) == (r, g, b)


def test_ycocg_three_element_store_reference_read(spark):
    """The experiment's storage shape: Y/Co/Cg as three int GVRS elements;
    the compiled reference reads the store and the recombined RGB is exact
    (negative Co/Cg survive the codec race)."""
    import os
    import tempfile

    from gridfour_spark import gvrsfile as G
    from gridfour_spark import store
    from gridfour_spark.spec import GridSpec
    from tests.test_gvrs_writer import _java_read

    spec = GridSpec(n_rows=48, n_cols=64, n_rows_in_tile=24, n_cols_in_tile=32)
    rr, cc = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    r8 = ((rr * 5 + cc * 3) % 256).astype(np.int64)
    g8 = ((rr * 7 + cc * 11) % 256).astype(np.int64)
    b8 = ((rr * 13 + cc * 2) % 256).astype(np.int64)
    co = r8 - b8
    tmp = b8 + (co >> 1)
    cg = g8 - tmp
    y = tmp + (cg >> 1)

    rows = [
        (int(r), int(c), float(y[r, c]), float(co[r, c]), float(cg[r, c]))
        for r in range(48) for c in range(64)
    ]
    cells = spark.createDataFrame(rows, "row int, col int, Y double, Co double, Cg double")
    melted = cells.selectExpr(
        "row", "col", "stack(3, 'Y', Y, 'Co', Co, 'Cg', Cg) AS (element, z)"
    )
    tiles = store.build_tiles(melted, spec, element_col="element")
    elems = [G.default_element(n, "int") for n in ("Y", "Co", "Cg")]
    blocks = None
    for e in elems:
        t_e = tiles.filter(F.col("element") == e.name)
        b_e = G.gvrs_export_blocks(t_e, spec, e).withColumn("element", F.lit(e.name))
        blocks = b_e if blocks is None else blocks.unionByName(b_e)
    d = tempfile.mkdtemp(prefix="ycocg_")
    path = os.path.join(d, "ycocg.gvrs")
    G.write_gvrs(path, spec, elems, blocks)

    grids = _java_read(path)
    jy, jco, jcg = (grids[n].astype(np.int64) for n in ("Y", "Co", "Cg"))
    jtmp = jy - (jcg >> 1)
    jg = jcg + jtmp
    jb = jtmp - (jco >> 1)
    jr = jb + jco
    np.testing.assert_array_equal(jr, r8)
    np.testing.assert_array_equal(jg, g8)
    np.testing.assert_array_equal(jb, b8)
