from .lookup_join import two_tier_lookup_join
from .sessionize import sessionize
from .topk import topk_per_group

__all__ = ["two_tier_lookup_join", "sessionize", "topk_per_group"]
