"""Per-stage lineage/metrics capture (north rule: "every stage writes
per-partition lineage and row-count metrics").

Collectors:
- `collect_stage_metrics`: per-partition row counts via spark_partition_id
  (one extra pass; the single lineage source — StageRunner manifests call
  it directly).
- `StageMetricsLog`: JSON-lines sink for per-stage records.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def collect_stage_metrics(df: DataFrame) -> dict:
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition"))
        .count()
        .orderBy("partition")
        .collect()
    )
    parts = [{"partition": r["partition"], "rows": r["count"]} for r in rows]
    return {
        "partitions": parts,
        "total_rows": sum(p["rows"] for p in parts),
        "n_partitions": len(parts),
        "max_partition_rows": max((p["rows"] for p in parts), default=0),
        "skew_ratio": round(
            max((p["rows"] for p in parts), default=0)
            / max(1.0, (sum(p["rows"] for p in parts) / max(1, len(parts)))),
            2,
        ),
    }


class StageMetricsLog:
    """Append-only JSONL log of stage metrics (driver-side)."""

    def __init__(self, path: str):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def record(self, stage: str, df: DataFrame, extra: dict | None = None) -> dict:
        t0 = time.time()
        m = collect_stage_metrics(df)
        m.update({"stage": stage, "collect_sec": round(time.time() - t0, 3),
                  **(extra or {})})
        with self.path.open("a") as f:
            f.write(json.dumps(m) + "\n")
        return m
