"""Re-check the 10.8k fit-tier A/B (monolithic vs panel-fused) — today's
bench measured 87 ms vs round 2's 52 ms headline; is that the tier or the
chip/tunnel having a slow day? Interleaved warm trials, same process."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nngp_tpu.data.workload import load_single_table_workload
from nngp_tpu.eval.splits import train_test_val_split
from nngp_tpu.gp.posterior import _fit_impl
from nngp_tpu.models.kernel_spec import reference_kernel
from nngp_tpu.utils.timing import sync

x, y, infos, _ = load_single_table_workload(
    "workloads/forest_data", dtype=np.float32)
x_tr, y_tr, *_ = train_test_val_split(
    x, y, train_frac=0.6, test_frac=0.2, all_query_infos=infos)
spec = reference_kernel()
xd = jax.device_put(jnp.asarray(x_tr))
yd = jax.device_put(jnp.asarray(y_tr))


def run(mono_max_n):
    out = _fit_impl(xd, yd, spec, "nngp", 1e-3, False,
                    mono_max_n=mono_max_n)
    sync((out[0], out[1]))
    return out


rng = np.random.default_rng(0)
xr = jax.device_put(jnp.asarray(
    rng.uniform(0, 1000, x_tr.shape), jnp.float32))


def run_x(xd_, mono_max_n):
    out = _fit_impl(xd_, yd, spec, "nngp", 1e-3, False,
                    mono_max_n=mono_max_n)
    sync((out[0], out[1]))
    return out


cases = {"forest/mono": (xd, 16384), "forest/fused": (xd, 0),
         "rand/mono": (xr, 16384), "rand/fused": (xr, 0)}
for tag, (xd_, mono) in cases.items():
    run_x(xd_, mono)                            # compile + warm
best = {t: float("inf") for t in cases}
for trial in range(8):
    for tag, (xd_, mono) in cases.items():
        t0 = time.perf_counter()
        run_x(xd_, mono)
        dt = time.perf_counter() - t0
        best[tag] = min(best[tag], dt)
        print(f"trial {trial} {tag}: {dt*1e3:.1f} ms", flush=True)
print({k: round(v * 1e3, 1) for k, v in best.items()})
