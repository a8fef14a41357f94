from nngp_tpu.gp.posterior import GPPosterior, fit_gp

__all__ = ["GPPosterior", "fit_gp"]
