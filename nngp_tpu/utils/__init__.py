from nngp_tpu.utils.timing import Timer, timed
from nngp_tpu.utils.memory import memory_usage_gb

__all__ = ["Timer", "timed", "memory_usage_gb"]
