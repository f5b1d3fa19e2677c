"""Dashboard/reporting query surface over the candidates table.

Library versions of the reference's analytic SQL (power_user_queries.sql,
07_run_all_pipelines.sh summary blocks, generate_weekly_report.sh): tier
summaries, regional rollups, score histograms, keyword intelligence,
normalized text bar charts. Every function returns a lazy DataFrame; the
reference's UNION-ALL-of-single-metric dashboards collapse into single
multi-aggregate plans (one scan instead of N).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tier_summary(candidates: DataFrame) -> DataFrame:
    """Tier × count/min/max/avg (07_pipeline_point.sh:230-238)."""
    return (
        candidates.groupBy("tier_classification")
        .agg(
            F.count("*").alias("n"),
            F.min("aerospace_score").alias("min_score"),
            F.max("aerospace_score").alias("max_score"),
            F.round(F.avg("aerospace_score"), 1).alias("avg_score"),
        )
        .orderBy(F.col("min_score").desc())
    )


def regional_distribution(candidates: DataFrame, prefix_len: int = 2) -> DataFrame:
    """Postcode-area rollup with percent-of-total window
    (power_user_queries.sql:81-102,124-125)."""
    area = F.substring("postcode", 1, prefix_len).alias("region")
    counts = (
        candidates.where(F.col("postcode").isNotNull())
        .groupBy(area)
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("aerospace_score")).cast("long").alias("avg_score"),
            F.count(F.when(F.col("tier_classification") == "tier1_candidate", 1)).alias(
                "tier1"
            ),
        )
    )
    total = Window.partitionBy()
    return counts.withColumn(
        "pct_of_total", F.round(100.0 * F.col("n") / F.sum("n").over(total), 2)
    ).orderBy(F.col("n").desc(), "region")


def score_histogram(candidates: DataFrame) -> DataFrame:
    """Score-band histogram (07_run_all_pipelines.sh:442-455)."""
    band = (
        F.when(F.col("aerospace_score") >= 150, "150+")
        .when(F.col("aerospace_score") >= 100, "100-149")
        .when(F.col("aerospace_score") >= 70, "70-99")
        .when(F.col("aerospace_score") >= 40, "40-69")
        .otherwise("<40")
    )
    return (
        candidates.groupBy(band.alias("score_range"))
        .agg(F.count("*").alias("n"), F.min("aerospace_score").alias("min_score"))
        .orderBy(F.col("min_score").desc())
    )


def keyword_frequency(candidates: DataFrame) -> DataFrame:
    """UNNEST(matched_keywords) → frequency (power_user_queries.sql:139-159)."""
    return (
        candidates.select(F.explode("matched_keywords").alias("keyword"),
                          "aerospace_score")
        .groupBy("keyword")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("aerospace_score"), 1).alias("avg_score"),
        )
        .orderBy(F.col("n").desc(), "keyword")
    )


def normalized_bar_chart(df: DataFrame, key: str, value: str = "n") -> DataFrame:
    """ASCII bar chart normalized by MAX() OVER ()
    (power_user_queries.sql:125: REPEAT('█', …))."""
    mx = Window.partitionBy()
    width = F.round(40.0 * F.col(value) / F.max(value).over(mx)).cast("int")
    return df.withColumn("bar", F.repeat(F.lit("█"), width))


def completeness_profile(candidates: DataFrame) -> DataFrame:
    """One-pass field-completeness profile (power_user_queries.sql:343-371)."""
    def pct(col: str):
        return F.round(
            100.0 * F.count(F.when(F.col(col).isNotNull(), 1)) / F.count("*"), 1
        ).alias(f"pct_{col}")

    return candidates.agg(
        F.count("*").alias("n"),
        *[pct(c) for c in ["name", "operator", "postcode", "website", "phone",
                           "email", "city", "description"]],
    )


def word_mining(candidates: DataFrame, min_count: int = 3) -> DataFrame:
    """Name word-frequency mining with stopword/length filters
    (iterative_improvement.sh:60-105)."""
    stop = ["the", "and", "ltd", "limited", "of", "co"]
    return (
        candidates.select(F.explode(F.split(F.lower("name"), "\\s+")).alias("word"))
        .where((F.length("word") >= 4) & ~F.col("word").isin(stop))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), "word")
    )
