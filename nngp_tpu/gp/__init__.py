from nngp_tpu.gp.posterior import GPPosterior, fit_gp, select_diag_reg
from nngp_tpu.gp.nystrom import NystromPosterior, fit_nystrom
from nngp_tpu.gp.hyperopt import (HyperoptResult, fit_kernel_hyperparams,
                                  select_kernel)

__all__ = ["GPPosterior", "fit_gp", "select_diag_reg",
           "NystromPosterior", "fit_nystrom",
           "HyperoptResult", "fit_kernel_hyperparams", "select_kernel"]
