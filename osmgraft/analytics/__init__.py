from osmgraft.analytics.criteria import CriteriaQuery, build_criteria_query
from osmgraft.analytics.coverage import coverage_report, expected_vs_actual
from osmgraft.analytics.dashboards import (
    keyword_frequency,
    normalized_bar_chart,
    regional_distribution,
    score_histogram,
    tier_summary,
)

__all__ = [
    "CriteriaQuery",
    "build_criteria_query",
    "coverage_report",
    "expected_vs_actual",
    "keyword_frequency",
    "normalized_bar_chart",
    "regional_distribution",
    "score_histogram",
    "tier_summary",
]
