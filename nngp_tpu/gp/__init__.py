from nngp_tpu.gp.posterior import GPPosterior, fit_gp
from nngp_tpu.gp.nystrom import NystromPosterior, fit_nystrom

__all__ = ["GPPosterior", "fit_gp", "NystromPosterior", "fit_nystrom"]
