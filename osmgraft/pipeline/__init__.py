from osmgraft.pipeline.candidates import candidate_stage, CANDIDATE_COLUMNS
from osmgraft.pipeline.union import priority_dedup_union

__all__ = ["candidate_stage", "CANDIDATE_COLUMNS", "priority_dedup_union"]
