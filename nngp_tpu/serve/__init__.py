from nngp_tpu.serve.drift import DriftMonitor, DriftReport
from nngp_tpu.serve.estimator import Estimator
from nngp_tpu.serve.feedback import merge_query_res
from nngp_tpu.serve.socket_server import EstimatorSocketServer
from nngp_tpu.serve.streaming import StreamingBatcher

__all__ = ["Estimator", "merge_query_res", "EstimatorSocketServer",
           "StreamingBatcher", "DriftMonitor", "DriftReport"]
