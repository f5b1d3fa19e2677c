"""Stream-stream interval joins (click→purchase attribution pairs).

Completes the §2.10 streaming surface: windows (tumbling/sliding/session)
and stateful sessionization exist in pages_stream.py / sessionize.py; this
module adds the remaining Structured Streaming capability class — the
watermarked stream-stream join. Semantics: a purchase joins every click by
the same user in the lag window ``(purchase_ts - lag, purchase_ts]``.

Scale shape: Spark keys both join-state stores by ``user_id`` (one shuffle
per side), and the event-time range predicate plus BOTH watermarks bound
the state: a click older than ``watermark + lag`` relative to the stream's
event-time frontier can never match a future purchase and is evicted. An
unwatermarked stream-stream join would retain every click forever — at
crawl-scale event volumes the watermark IS the memory bound, which is why
``interval_join_stream`` requires one instead of defaulting to "no
watermark". The batch twin runs the identical join predicate (equi on
user_id + time range — a hash join with a residual filter, never a
cartesian) so stream==batch is testable on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PAIR_COLS = ("event_id", "user_id", "click_ts", "purchase_ts")


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    return clicks, purchases


def _join_cond(lag: str):
    return (
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") > F.col("purchase_ts") - F.expr(f"INTERVAL {lag}"))
    )


def interval_join_batch(events: DataFrame, lag: str = "24 hours") -> DataFrame:
    """Batch twin: every (purchase, click) pair within the lag window."""
    clicks, purchases = _sides(events)
    return purchases.join(clicks, _join_cond(lag)).select(*_PAIR_COLS)


def interval_join_stream(
    events: DataFrame, lag: str = "24 hours", watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked stream-stream interval join (append mode).

    ``events`` must be a streaming DataFrame; both sides carry the
    watermark so the click state store evicts rows once the event-time
    frontier passes ``click_ts + watermark + lag``.
    """
    clicks, purchases = _sides(events)
    clicks = clicks.withWatermark("click_ts", watermark)
    purchases = purchases.withWatermark("purchase_ts", watermark)
    return purchases.join(clicks, _join_cond(lag)).select(*_PAIR_COLS)


# ---------------------------------------------------------------------------
# stream-static enrichment join
# ---------------------------------------------------------------------------

def enrich_with_static(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-STATIC enrichment join — the remaining join class beside the
    watermarked stream-stream interval join above: a streaming fact side
    joined to a bounded dimension (event_type → weight/category here;
    host → robots policy or source → mix weight in the crawl pipeline).

    Semantics Spark gives this for free: NO state store and NO watermark
    requirement — the static side is (re)planned per micro-batch as an
    ordinary broadcast hash join, so dimension updates between batches
    are picked up and stream state stays O(0). That property (vs the
    stream-stream join's keyed state stores) is exactly why a 10^12-page
    pipeline pushes every bounded lookup to stream-static instead of
    stream-stream. Works identically on a batch DataFrame — the
    stream==batch equivalence test runs this same function on both.
    """
    from pyspark.sql import functions as F  # local: keep module header lean

    return events.join(F.broadcast(dim), "event_type", "left").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.coalesce("type_weight", F.lit(0.0)).alias("type_weight"),
        (F.col("value") * F.coalesce("type_weight", F.lit(0.0))).alias(
            "weighted_value"
        ),
    )
