"""Second backend of the rules compiler: RuleSet → ANSI SQL (DuckDB dialect).

Mirrors the reference's YAML→SQL generator entry point
(aerospace_scoring/run_aerospace_scoring.py, README.md:172-196): the same
rule data that compiles to a pyspark Column (compiler.py) also compiles to a
SQL CASE-chain. Used by the driver-contract oracles so the Spark plan and
the DuckDB oracle are generated from one source of truth — they cannot
drift apart.
"""

from __future__ import annotations

from osmgraft.rules.compiler import RuleSet, ScoreRule


def _sql_pred(rule: ScoreRule) -> str:
    if rule.kind == "regex":
        esc = rule.pattern.replace("'", "''")
        return f"regexp_matches(lower(coalesce({rule.column}, '')), '{esc}')"
    if rule.kind == "raw_regex":
        esc = rule.pattern.replace("'", "''")
        return f"regexp_matches({rule.column}, '{esc}')"
    if rule.kind == "contains":
        # lower the literal too — the blob side is lowercased, so an
        # uppercase keyword could otherwise never match (case-insensitive
        # semantics are documented in yamlspec)
        esc = rule.pattern.lower().replace("'", "''")
        return f"contains(lower(coalesce({rule.column}, '')), '{esc}')"
    if rule.kind == "in":
        vals = ", ".join(f"'{v}'" for v in rule.values)
        return f"{rule.column} IN ({vals})"
    if rule.kind == "not_null":
        return f"{rule.column} IS NOT NULL"
    if rule.kind == "gt":
        # integral thresholds as INT literals; fractional ones through
        # lit_sql (DuckDB types bare decimals as DECIMAL — 1-ulp trap —
        # and lit_sql guards reprs that already carry an exponent)
        from osmgraft.geo.hexgrid import lit_sql

        v = rule.value
        lit = str(int(v)) if float(v) == int(v) else lit_sql(float(v))
        return f"{rule.column} > {lit}"
    if rule.kind == "any_of":
        return "(" + " OR ".join(_sql_pred(c) for c in rule.children) + ")"
    if rule.kind == "all_of":
        return "(" + " AND ".join(_sql_pred(c) for c in rule.children) + ")"
    if rule.kind == "expr":
        return f"({rule.pattern})"
    raise ValueError(f"rule kind {rule.kind!r} has no SQL backend")


def score_sql(ruleset: RuleSet) -> str:
    """Σ CASE WHEN … THEN w ELSE 0 END as one SQL expression. Rules with
    override_if emit the override test as the FIRST branch (→ 0), mirroring
    compiler.compile_score exactly."""
    parts = []
    for r in ruleset.rules:
        if r.override_if:
            ov = "(" + " OR ".join(_sql_pred(c) for c in r.override_if) + ")"
            parts.append(
                f"CASE WHEN {ov} THEN 0 WHEN {_sql_pred(r)} THEN {r.weight} ELSE 0 END"
            )
        else:
            parts.append(f"CASE WHEN {_sql_pred(r)} THEN {r.weight} ELSE 0 END")
    return "(" + " + ".join(parts) + ")"


def tier_sql(
    score_expr: str = "aerospace_score",
    bands: tuple[tuple[int, str], ...] = (
        (150, "tier1_candidate"),
        (80, "tier2_candidate"),
        (40, "potential_candidate"),
    ),
    default: str = "low_probability",
) -> str:
    whens = " ".join(f"WHEN {score_expr} >= {t} THEN '{label}'" for t, label in bands)
    return f"CASE {whens} ELSE '{default}' END"


def morton_sql(ix_expr: str, iy_expr: str) -> str:
    """Morton/Z-order interleave as portable SQL bit arithmetic — the exact
    mirror of geo.cells.morton_col, so cell ids can be oracle-checked."""

    def spread(e: str) -> str:
        masks = (
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        )
        out = f"CAST({e} AS BIGINT)"
        for shift, mask in masks:
            out = f"(({out} | ({out} << {shift})) & {mask})"
        return out

    return f"({spread(ix_expr)} | ({spread(iy_expr)} << 1))"
