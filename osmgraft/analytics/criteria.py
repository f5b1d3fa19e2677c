"""CRITERIA-dict → DataFrame filter-chain builder.

Spark-first re-expression of the reference's interactive query engine
(integrated_aerospace_system.py:111-191 `build_query`): a declarative dict of
criteria compiles to a lazy DataFrame — Catalyst pushes the predicates into
the scan, so unlike the reference (which compiles to SQL text and ships the
whole result into pandas) the filters run distributed and only the final
`limit` is collected.

Supported criteria (mirroring the reference's CRITERIA keys):
    min_score / max_score          — score bounds (:127-133)
    tiers                          — tier IN-list (:135-140)
    require_fields                 — list of columns that must be non-null (:142-148)
    postcode_prefixes              — LEFT(postcode, n) inclusion (:150-158)
    exclude_postcode_prefixes      — exclusion (:160-166)
    keywords_any / keywords_none   — name/description LIKE lists (:168-180)
    source_tables                  — source IN-list (:182-186)
    limit                          — result cap (:188-189)
    order_by / descending          — sort spec
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class CriteriaQuery:
    """Compiled criteria: inspectable predicate list + terminal clauses."""

    predicates: list[Column] = field(default_factory=list)
    order_by: str | None = None
    descending: bool = True
    limit: int | None = None

    def apply(self, df: DataFrame) -> DataFrame:
        for p in self.predicates:
            df = df.where(p)
        if self.order_by:
            key = F.col(self.order_by)
            df = df.orderBy(key.desc() if self.descending else key.asc())
        if self.limit is not None:
            df = df.limit(self.limit)
        return df


def build_criteria_query(
    criteria: dict[str, Any],
    score_col: str = "aerospace_score",
    name_col: str = "name",
    desc_col: str = "description",
    postcode_col: str = "postcode",
) -> CriteriaQuery:
    preds: list[Column] = []
    if (v := criteria.get("min_score")) is not None:
        preds.append(F.col(score_col) >= v)
    if (v := criteria.get("max_score")) is not None:
        preds.append(F.col(score_col) <= v)
    if v := criteria.get("tiers"):
        preds.append(F.col("tier_classification").isin(list(v)))
    for col in criteria.get("require_fields", []):
        preds.append(F.col(col).isNotNull())
    if v := criteria.get("postcode_prefixes"):
        ors = [
            F.substring(F.col(postcode_col), 1, len(p)) == p for p in v
        ]
        pred = ors[0]
        for o in ors[1:]:
            pred = pred | o
        preds.append(F.col(postcode_col).isNotNull() & pred)
    if v := criteria.get("exclude_postcode_prefixes"):
        for p in v:
            preds.append(
                F.col(postcode_col).isNull()
                | (F.substring(F.col(postcode_col), 1, len(p)) != p)
            )
    blob = F.lower(
        F.concat_ws(" ", F.coalesce(F.col(name_col), F.lit("")),
                    F.coalesce(F.col(desc_col), F.lit("")))
    )
    if v := criteria.get("keywords_any"):
        ors = [blob.contains(k.lower()) for k in v]
        pred = ors[0]
        for o in ors[1:]:
            pred = pred | o
        preds.append(pred)
    for k in criteria.get("keywords_none", []):
        preds.append(~blob.contains(k.lower()))
    if v := criteria.get("source_tables"):
        preds.append(F.col("source_table").isin(list(v)))
    return CriteriaQuery(
        predicates=preds,
        order_by=criteria.get("order_by", score_col),
        descending=criteria.get("descending", True),
        limit=criteria.get("limit"),
    )
