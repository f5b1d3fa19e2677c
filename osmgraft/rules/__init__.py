from osmgraft.rules.compiler import (
    RuleSet,
    ScoreRule,
    compile_exclusion_filter,
    compile_keyword_array,
    compile_score,
    compile_tier,
    tags_text,
)

__all__ = [
    "RuleSet",
    "ScoreRule",
    "compile_exclusion_filter",
    "compile_keyword_array",
    "compile_score",
    "compile_tier",
    "tags_text",
]
