#!/usr/bin/env python
"""spark-submit entry point: the web-corpus analytics report as a cluster job.

    spark-submit [--master ...] --py-files dist/osmgraft.zip \
        jobs/run_web_report.py --data <dir> --out <dir>

Runs the crawl/clickstream layer over a directory holding
``documents.parquet`` and ``events.parquet`` (the BASELINE input-table
shape at any scale) and writes:

- ``<out>/<section>/`` parquet per section: host_rollup, latest_snapshot,
  funnel, session_paths, daily_anomalies, rolling_daily_totals,
  cohort_retention
- ``<out>/web_report.json`` — headline metrics (reference S7 JSON report
  sink shape)

Imports only from the shipped zip — no repo-path assumptions beyond this
file. ``--data`` defaults to ``$SPARK_GRAFT_SF_DIR`` (driver-provided
parquet in the sandbox; a real deployment points it at the crawl
warehouse).
"""

from __future__ import annotations

import argparse
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--data",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="dir with documents.parquet + events.parquet",
    )
    ap.add_argument("--out", required=True, help="output dir")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("osmgraft-web-report")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from osmgraft import contract_web as cw
    from osmgraft.sources.export import export_json_report

    sections = {
        "host_rollup": cw.url_host_rollup,
        "latest_snapshot": cw.crawl_latest_snapshot,
        "funnel": cw.funnel_conversion,
        "session_paths": cw.session_paths,
        "daily_anomalies": cw.daily_anomalies,
        "rolling_daily_totals": cw.rolling_daily_totals,
        "cohort_retention": cw.cohort_retention,
    }
    metrics: dict = {"data": args.data, "sections": {}}
    t0 = time.time()
    for name, fn in sections.items():
        df = fn(spark, args.data)
        path = os.path.join(args.out, name)
        df.write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        metrics["sections"][name] = {"rows": int(n), "path": path}

    funnel = {
        r["stage"]: (r["users"], r["pct"])
        for r in spark.read.parquet(
            metrics["sections"]["funnel"]["path"]
        ).collect()
    }
    anomalies = metrics["sections"]["daily_anomalies"]["rows"]
    metrics["headline"] = {
        "funnel": {k: {"users": int(u), "pct": float(p)} for k, (u, p) in funnel.items()},
        "n_anomalous_days": int(anomalies),
        "wall_s": round(time.time() - t0, 2),
    }
    export_json_report(metrics, os.path.join(args.out, "web_report.json"))
    print(f"web report: {len(sections)} sections -> {args.out}")


if __name__ == "__main__":
    main()
