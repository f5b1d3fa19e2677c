from osmgraft.runtime.salting import salted_aggregate, salted_join
from osmgraft.runtime.metrics import collect_stage_metrics

__all__ = ["salted_aggregate", "salted_join", "collect_stage_metrics"]
