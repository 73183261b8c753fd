from .joins import asof_join, range_join, topk_per_group

__all__ = ["asof_join", "range_join", "topk_per_group"]
