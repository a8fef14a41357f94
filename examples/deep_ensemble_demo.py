"""Toy 1-D deep-ensemble uncertainty demo.

The modern equivalent of the reference's standalone TF1 demo
(`/root/reference/active/DeepEnsemble.py` — graph-mode TF1, not wired to the
query pipeline): fit a 5-member density-regressor ensemble on noisy sin data
and print per-region predictive uncertainty (should blow up outside the
training support).

    python examples/deep_ensemble_demo.py
"""

import numpy as np

import jax.numpy as jnp

from nngp_tpu.baselines.trainer import train_deep_ensemble


def main():
    rng = np.random.default_rng(0)
    x = rng.uniform(-3.0, 3.0, (512, 1)).astype(np.float32)
    y = np.sin(x) + 0.1 * rng.standard_normal((512, 1)).astype(np.float32)

    ens, params = train_deep_ensemble(x, y, num_models=5, num_hid=64,
                                      epochs=200, lr=3e-3, batch_size=128,
                                      verbose=None)
    x_grid = np.linspace(-6, 6, 13, dtype=np.float32).reshape(-1, 1)
    mean, std = ens.predict(params, jnp.asarray(x_grid))
    mean, std = np.asarray(mean), np.asarray(std)
    print(f"{'x':>6} {'true':>8} {'pred':>8} {'std':>8}  in-support")
    for xi, m, s in zip(x_grid.ravel(), mean, std):
        print(f"{xi:6.2f} {np.sin(xi):8.3f} {m:8.3f} {s:8.3f}  "
              f"{'yes' if abs(xi) <= 3 else 'NO'}")
    in_std = std[np.abs(x_grid.ravel()) <= 3].mean()
    out_std = std[np.abs(x_grid.ravel()) > 3.5].mean()
    print(f"\nmean std in-support {in_std:.3f} vs out-of-support {out_std:.3f}")
    assert out_std > in_std, "ensemble should be less certain off-support"


if __name__ == "__main__":
    main()
