"""Resumable sink: killed job resumes without recomputing completed buckets
(north_rule resumability; replaces GvrsFile flush/close crash-fragility)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from gridfour_spark import lineage, store, synth
from gridfour_spark.spec import GridSpec

SPEC = GridSpec(n_rows=120, n_cols=150, n_rows_in_tile=20, n_cols_in_tile=25)


def test_write_resume_and_equivalence(spark):
    base = tempfile.mkdtemp(prefix="tiles_")
    try:
        tiles = store.build_tiles(synth.grid_df(spark, SPEC, value="dem"), SPEC)

        # simulate a killed job: write only buckets 0..2 then "crash"
        r1 = lineage.write_tiles_resumable(
            tiles.filter(F.pmod("tile_index", F.lit(8)) < 3), base, "job1", n_buckets=8
        )
        assert set(r1["written_buckets"]) == set(range(8))  # 3 with data, 5 empty
        # wipe lineage for buckets >= 3 to model the crash mid-job
        import os

        for f in os.listdir(lineage.lineage_path(base)):
            b = int(f.split("_")[-1].split(".")[0])
            if b >= 3:
                os.remove(os.path.join(lineage.lineage_path(base), f))

        # resume with the FULL input: buckets 0-2 must be skipped
        r2 = lineage.write_tiles_resumable(tiles, base, "job1", n_buckets=8)
        assert r2["skipped_buckets"] == [0, 1, 2]
        assert r2["written_buckets"] == [3, 4, 5, 6, 7]

        # CAVEAT the simulated crash wrote buckets 0..2 from the full tile
        # set (filter was on the same key), so the union must equal a direct
        # full write
        got = lineage.read_tiles(spark, base)
        n_direct = tiles.count()
        assert got.count() == n_direct
        # cell-level equivalence through the store round trip
        back = store.tiles_to_cells(got.drop("tile_bucket"), SPEC)
        direct = store.tiles_to_cells(tiles, SPEC)
        assert back.exceptAll(direct).count() == 0
        assert direct.exceptAll(back).count() == 0

        # lineage table is queryable and complete
        rep = lineage.lineage_report(spark, base)
        assert rep.count() == 8
        assert rep.agg(F.sum("n_tiles")).collect()[0][0] == n_direct
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_rerun_is_noop(spark):
    base = tempfile.mkdtemp(prefix="tiles_")
    try:
        tiles = store.build_tiles(synth.grid_df(spark, SPEC, value="dem"), SPEC)
        lineage.write_tiles_resumable(tiles, base, "job2", n_buckets=4)
        r = lineage.write_tiles_resumable(tiles, base, "job2", n_buckets=4)
        assert r["written_buckets"] == [] and r["skipped_buckets"] == [0, 1, 2, 3]
    finally:
        shutil.rmtree(base, ignore_errors=True)
