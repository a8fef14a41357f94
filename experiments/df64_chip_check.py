"""df64 correctness on the REAL MXU: re-run the CPU suite's hard cases
(int8 dot lowering is the one platform-specific assumption).
Timing-insensitive — safe to run under host contention."""
import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.ops.df64 import (DF, df_from_f32, hp_matmul, df_cholesky,
                               df_cholesky_inverse_factor)

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(4)

# 1. hp_matmul vs fp64 oracle, wide dynamic range
a = (rng.standard_normal((192, 384)) *
     10.0 ** rng.uniform(-6, 6, (192, 1))).astype(np.float32)
b = (rng.standard_normal((384, 160)) *
     10.0 ** rng.uniform(-6, 6, (1, 160))).astype(np.float32)
want = a.astype(np.float64) @ b.astype(np.float64)
out = jax.jit(hp_matmul)(jnp.asarray(a), jnp.asarray(b))
got = np.asarray(out.hi, np.float64) + np.asarray(out.lo, np.float64)
contract = (np.abs(a).max(1, keepdims=True).astype(np.float64) @
            np.abs(b).max(0, keepdims=True).astype(np.float64))
print("hp_matmul rel err (contract):",
      float((np.abs(got - want) / contract).max()), flush=True)

# 2. hard Cholesky (kappa ~ 1e9, PD by construction, df input)
m, diag_bits = 384, 15
l32 = np.tril(rng.standard_normal((m, m)) * 0.1).astype(np.float32)
d = np.exp2(-np.linspace(0, diag_bits, m)).astype(np.float32)
for i in range(m):
    l32[i, i] = d[i]
    l32[i, :i] *= d[i]
a64 = l32.astype(np.float64) @ l32.astype(np.float64).T
hi = np.asarray(a64, np.float32)
lo = np.asarray(a64 - hi.astype(np.float64), np.float32)
arep = hi.astype(np.float64) + lo.astype(np.float64)
want_l = np.linalg.cholesky(arep)
got_df = jax.jit(df_cholesky)(DF(jnp.asarray(hi), jnp.asarray(lo)))
got_l = np.asarray(got_df.hi, np.float64) + np.asarray(got_df.lo,
                                                       np.float64)
scale = np.maximum(np.abs(want_l).max(0), np.abs(want_l).max() * 1e-16)
print("df_cholesky col-rel err:",
      float((np.abs(got_l - want_l) / scale[None, :]).max()), flush=True)

# 3. inverse factor + beta at |C|/r = 1e8
m2 = 512
psi = rng.standard_normal((4 * m2, m2))
c32 = np.asarray(psi.T @ psi, np.float32)
reg = 1e-8 * float(np.abs(np.diag(c32)).mean()) * m2
b32 = rng.standard_normal((m2, 1)).astype(np.float32)
ic, beta, ld = jax.jit(
    lambda c, bb: df_cholesky_inverse_factor(c, jnp.float32(reg), bb))(
    jnp.asarray(c32), jnp.asarray(b32))
a_ex = 0.5 * (c32.astype(np.float64) + c32.astype(np.float64).T) + \
    reg * np.eye(m2)
wi = np.linalg.inv(a_ex)
gi = np.asarray(ic, np.float64) @ np.asarray(ic, np.float64).T
print("inverse rel err:", float(np.abs(gi - wi).max() / np.abs(wi).max()),
      flush=True)
wb = np.linalg.solve(a_ex, b32.astype(np.float64))
print("beta rel err:", float(np.abs(np.asarray(beta, np.float64) - wb).max()
                             / np.abs(wb).max()), flush=True)
print("ok", flush=True)
