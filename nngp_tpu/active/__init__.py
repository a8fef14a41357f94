from nngp_tpu.active.learner import ActiveLearner

__all__ = ["ActiveLearner"]
