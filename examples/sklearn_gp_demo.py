"""Standalone sklearn-GP 1-D regression demo — the `draw.py` equivalent
(`/root/reference/draw.py:10-59` fits a sklearn GaussianProcessRegressor on
toy data and plots mean +/- std). Saves the figure when matplotlib is
available, otherwise prints the table.

    python examples/sklearn_gp_demo.py [out.png]
"""

import sys

import numpy as np


def main(out_path=None):
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import RBF

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, 40)).reshape(-1, 1)
    y = np.sin(x).ravel() + 0.1 * rng.standard_normal(40)
    gp = GaussianProcessRegressor(kernel=RBF(), alpha=0.01, random_state=0)
    gp.fit(x, y)
    xg = np.linspace(0, 10, 200).reshape(-1, 1)
    mean, std = gp.predict(xg, return_std=True)

    if out_path:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.figure()
            plt.plot(xg, mean, label="posterior mean")
            plt.fill_between(xg.ravel(), mean - 2 * std, mean + 2 * std,
                             alpha=0.3, label="±2 std")
            plt.scatter(x, y, s=12, c="k", label="observations")
            plt.legend()
            plt.savefig(out_path, bbox_inches="tight")
            print(f"saved {out_path}")
            return
        except ImportError:
            pass
    print(f"{'x':>6} {'mean':>8} {'std':>8}")
    for xi, m, s in list(zip(xg.ravel(), mean, std))[::20]:
        print(f"{xi:6.2f} {m:8.3f} {s:8.3f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
