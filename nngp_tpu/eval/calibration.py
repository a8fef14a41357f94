"""Uncertainty calibration: expected vs observed confidence levels.

Vectorized version of `/root/reference/util.py:296-313` — for each confidence
level p the Gaussian central interval is mean +/- z_{(1+p)/2} * std; the
observed level is the fraction of targets inside it. The reference loops
per-query calling scipy.stats.norm.interval; here it is one broadcasted
comparison (and erfinv replaces the scipy dependency).
"""

from typing import Dict

import numpy as np
from scipy import special


def calibration_table(y_true, means, stds, num_intervals: int = 10) -> Dict[float, float]:
    y = np.ravel(np.asarray(y_true, dtype=np.float64))
    mu = np.ravel(np.asarray(means, dtype=np.float64))
    sd = np.ravel(np.asarray(stds, dtype=np.float64))
    levels = np.array([i / num_intervals for i in range(num_intervals + 1)])
    # z for central coverage p: sqrt(2) * erfinv(p)
    z = np.sqrt(2.0) * special.erfinv(levels)
    with np.errstate(invalid="ignore"):
        bound = z[:, None] * sd[None, :]
    # p=1.0 gives z=inf; inf * 0 = NaN for zero-std queries, which would
    # count as OUTSIDE an infinite interval — the central interval at p=1
    # contains everything by definition
    bound[np.isinf(z), :] = np.inf
    inside = np.abs(y - mu)[None, :] <= bound
    observed = inside.mean(axis=1)
    return {float(p): float(o) for p, o in zip(levels, observed)}
