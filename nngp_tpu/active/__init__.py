from nngp_tpu.active.greedy import greedy_variance_select
from nngp_tpu.active.learner import ActiveLearner

__all__ = ["ActiveLearner", "greedy_variance_select"]
