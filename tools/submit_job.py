"""spark-submit entry point (north_rule: "runs via spark-submit --py-files").

Usage:
  cd /root/repo && zip -qr /tmp/gridfour_spark.zip gridfour_spark
  spark-submit --master local[8] --py-files /tmp/gridfour_spark.zip \
      tools/submit_job.py --sf-dir /root/testdata/sf0.001 --out /tmp/tiles_out

Runs the flagship spans->tiles->join pipeline and writes the global DEM tile
store through the resumable lineage sink; prints one JSON summary line.
On a real cluster the same invocation takes --master yarn/k8s and the sink
targets an Iceberg warehouse.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/gridfour_tiles_out")
    ap.add_argument("--job-id", default="submit_demo")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from gridfour_spark import lineage, pipeline, store, synth
    from gridfour_spark.spec import GLOBAL_GRID

    spark = SparkSession.builder.appName("gridfour_spark_submit").getOrCreate()
    t0 = time.time()

    flag = pipeline.flagship(spark, args.sf_dir)
    n_tiles_out = flag.count()

    tiles = store.build_tiles(synth.grid_df(spark, GLOBAL_GRID, value="dem"), GLOBAL_GRID)
    result = lineage.write_tiles_resumable(tiles, args.out, args.job_id, n_buckets=8)

    print(
        json.dumps(
            {
                "flagship_tiles": n_tiles_out,
                "store_written_buckets": result["written_buckets"],
                "store_skipped_buckets": result["skipped_buckets"],
                "sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
