#!/usr/bin/env python
"""spark-submit entry point: the streaming ingest pipeline.

    spark-submit [--master ...] --py-files dist/osmgraft.zip \
        jobs/run_stream.py --pages-dir <dir> --out <dir> \
        --checkpoint <dir> [--tile-res 7] [--watermark "1 hour"] \
        [--once]

Pages arrive as parquet files in --pages-dir; the job runs the streaming
half of the engine end-to-end:

  readStream → bounded-state URL dedup (dropDuplicatesWithinWatermark)
             → extraction + cell assignment (same plans as batch)
             → incremental per-cell tile rollup (foreachBatch delta
               partitions — idempotent under replay)

`--once` uses Trigger.AvailableNow (drain-and-stop: backfills, cron
runs); without it the query runs continuously. Re-running with the same
--checkpoint resumes exactly where it stopped (stateful operators
restore from the checkpoint — tested in tests/test_streaming.py).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--tile-res", type=int, default=7)
    ap.add_argument("--watermark", default="1 hour")
    ap.add_argument("--once", action="store_true",
                    help="availableNow drain-and-stop (backfill mode)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("osmgraft-stream")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from osmgraft.contract import SPEC
    from osmgraft.geo.cells import GridSpec  # noqa: F401 (zip import check)
    from osmgraft.streaming.pages_stream import (
        incremental_tile_counts,
        read_pages_stream,
        read_tile_totals,
        streaming_dedup_pages,
    )

    t0 = time.time()
    stream = read_pages_stream(spark, args.pages_dir)
    deduped = streaming_dedup_pages(stream, watermark=args.watermark)
    q = incremental_tile_counts(
        deduped,
        SPEC,
        args.tile_res,
        f"{args.out}/tiles",
        args.checkpoint,
        query_name="osmgraft-stream-tiles",
    )
    if args.once:
        q.awaitTermination()
        totals = read_tile_totals(spark, f"{args.out}/tiles")
        n_cells = totals.count()
        print(
            json.dumps(
                {
                    "job": "osmgraft-stream",
                    "tile_cells": n_cells,
                    "wall_sec": round(time.time() - t0, 3),
                }
            )
        )
        spark.stop()
    else:
        q.awaitTermination()


if __name__ == "__main__":
    main()
