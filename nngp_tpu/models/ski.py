"""Structured Kernel Interpolation (SKI / KISS-GP) Deep Kernel Learning.

Structural parity with the reference's DKL covariance
(`/root/reference/dnn/layers.py:62-78`): gpytorch's
`GridInterpolationKernel(ScaleKernel(RBFKernel(ard_num_dims=2)), num_dims=2,
grid_size=100)` — the kernel is approximated as

    k(x, x') ~= w_x^T K_UU w_x'

with U a Cartesian grid over the 2-d embedding space, K_UU the RBF Gram on
the grid (a Kronecker product of per-dimension 1-d Grams), and w_x cubic
convolution interpolation weights (4 grid points per dimension). The exact
companion model lives in `models/dkl.py`; this module is the
approximation-structure variant, rebuilt TPU-native:

  - per-dimension interpolation weights are kept as DENSE (n, g) matrices —
    at g=100 that is a few MB, and every SKI product becomes a large MXU
    matmul/einsum instead of gpytorch's sparse gathers;
  - K_UU never materializes: the Kronecker factors (g, g) are applied
    dimension-by-dimension;
  - solves use matrix-free batched CG and the training loss uses
    stochastic-trace gradients + SLQ log-determinants
    (`ops/iterative.py`), i.e. the same iterative machinery gpytorch runs
    under the hood, expressed as static-shape XLA loops.

Training gradients: d(-MLL)/dtheta = -0.5 a^T dK a + 0.5 tr(K^-1 dK) with
a = K^-1 y; the trace uses Hutchinson probes z_i and solves w_i = K^-1 z_i.
Both solves run OUTSIDE the autodiff tape (CG under stop_gradient), and a
surrogate loss  -0.5 sg(a)^T K sg(a) + (0.5/m) sum_i sg(w_i)^T K z_i
reproduces exactly those gradients under autodiff — no differentiating
through CG iterations.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from nngp_tpu.models.dkl import (_embed, _rescale, _softplus,
                                 init_dkl_params)
from nngp_tpu.ops.iterative import batched_cg, slq_logdet

GRID_SIZE = 100          # reference grid_size=100
GRID_LO, GRID_HI = -1.1, 1.1   # embeddings are rescaled to [-1, 1]; the
                               # margin keeps the 4-point stencil interior


def cubic_interp_matrix(x: jax.Array, g: int = GRID_SIZE,
                        lo: float = GRID_LO, hi: float = GRID_HI):
    """Dense (n, g) cubic convolution interpolation matrix for scalar
    coordinates x onto the uniform grid linspace(lo, hi, g).

    Keys' cubic kernel (a = -1/2): reproduces polynomials up to degree 2,
    4 nonzero weights per point. Dense one-hot scatter instead of a sparse
    matrix — (n, g) stays tiny and downstream products run on the MXU."""
    h = (hi - lo) / (g - 1)
    t = (x - lo) / h
    j = jnp.clip(jnp.floor(t).astype(jnp.int32), 1, g - 3)
    u = t - j                                   # in [0, 1) for interior x
    # stencil distances: |x - grid[j-1..j+2]| / h = 1+u, u, 1-u, 2-u
    def near(s):   # 0 <= s <= 1
        return 1.5 * s ** 3 - 2.5 * s ** 2 + 1.0
    def far(s):    # 1 < s <= 2
        return -0.5 * (s ** 3 - 5.0 * s ** 2 + 8.0 * s - 4.0)
    w = jnp.stack([far(1.0 + u), near(u), near(1.0 - u), far(2.0 - u)],
                  axis=-1)                      # (n, 4)
    cols = j[:, None] + jnp.arange(-1, 3)[None, :]      # (n, 4)
    onehot = (cols[:, :, None] == jnp.arange(g)[None, None, :])
    return jnp.sum(w[:, :, None] * onehot.astype(x.dtype), axis=1)


def grid_points(g: int = GRID_SIZE, lo: float = GRID_LO,
                hi: float = GRID_HI, dtype=jnp.float32):
    return jnp.linspace(lo, hi, g, dtype=dtype)


def _kuu_1d(grid, lengthscale):
    d = (grid[:, None] - grid[None, :]) / lengthscale
    return jnp.exp(-0.5 * d * d)


def interp_weights(z: jax.Array, g: int = GRID_SIZE):
    """Per-dimension dense interpolation matrices for embeddings z (n, d)."""
    return [cubic_interp_matrix(z[:, i], g) for i in range(z.shape[1])]


def interp_t_apply(ws, v):
    """U = W^T v lifted onto the grid: (n, b) -> (g1, ..., gd, b)."""
    d = len(ws)
    if d == 1:
        return jnp.einsum("ng,nb->gb", ws[0], v)
    if d == 2:
        return jnp.einsum("ng,nh,nb->ghb", ws[0], ws[1], v,
                          optimize=True)
    if d == 3:
        return jnp.einsum("ng,nh,nk,nb->ghkb", ws[0], ws[1], ws[2], v,
                          optimize=True)
    raise NotImplementedError(f"SKI supports 1-3 dims, got {d}")


def interp_apply(ws, u):
    """y = W u read off the grid: (g1, ..., gd, b) -> (n, b)."""
    d = len(ws)
    if d == 1:
        return jnp.einsum("ng,gb->nb", ws[0], u)
    if d == 2:
        return jnp.einsum("ng,nh,ghb->nb", ws[0], ws[1], u, optimize=True)
    if d == 3:
        return jnp.einsum("ng,nh,nk,ghkb->nb", ws[0], ws[1], ws[2], u,
                          optimize=True)
    raise NotImplementedError(f"SKI supports 1-3 dims, got {d}")


def kuu_apply(kuu_1ds, u):
    """(K_1 kron ... kron K_d) u, applied factor-by-factor."""
    for i, k in enumerate(kuu_1ds):
        u = jnp.moveaxis(
            jnp.tensordot(k, u, axes=([1], [i])), 0, i)
    return u


def _hyper(params):
    ls = _softplus(params["raw_lengthscale"]) + 1e-4
    amp = _softplus(params["raw_amp"]) + 1e-4
    noise = _softplus(params["raw_noise"]) + 1e-4
    return ls, amp, noise


def _ski_parts(params, z, g):
    ls, amp, noise = _hyper(params)
    ws = interp_weights(z, g)
    grid = grid_points(g, dtype=z.dtype)
    kuu_1ds = [_kuu_1d(grid, ls[i]) for i in range(z.shape[1])]
    return ws, kuu_1ds, amp, noise


def ski_mvm(ws, kuu_1ds, amp, noise, v):
    """(W K_UU W^T * amp + noise I) v for v (n, b)."""
    return amp * interp_apply(ws, kuu_apply(kuu_1ds, interp_t_apply(ws, v))) \
        + noise * v


def ski_cross_mvm(ws_out, ws_in, kuu_1ds, amp, v):
    """amp * W_out K_UU W_in^T v — cross-covariance product (no noise)."""
    return amp * interp_apply(ws_out,
                              kuu_apply(kuu_1ds, interp_t_apply(ws_in, v)))


def ski_diag(ws, kuu_1ds, amp):
    """diag(amp * W K_UU W^T): per-row quadratic form w^T K_UU w."""
    d = len(ws)
    if d == 1:
        q = jnp.einsum("ng,gh,nh->n", ws[0], kuu_1ds[0], ws[0])
    elif d == 2:
        # w^T (K1 kron K2) w with w = w1 kron w2 row-wise:
        # = (w1^T K1 w1) * (w2^T K2 w2)
        a = jnp.einsum("gh,nh->ng", kuu_1ds[0], ws[0])
        b = jnp.einsum("gh,nh->ng", kuu_1ds[1], ws[1])
        q = (jnp.einsum("ng,ng->n", ws[0], a)
             * jnp.einsum("ng,ng->n", ws[1], b))
    else:
        q = jnp.ones(ws[0].shape[0], ws[0].dtype)
        for wi, ki in zip(ws, kuu_1ds):
            q = q * jnp.einsum("ng,gh,nh->n", wi, ki, wi)
    return amp * q


def neg_mll_ski(params, x, y, key, *, grid_size=GRID_SIZE, num_probes=8,
                cg_tol=1e-5, cg_iters=256, slq_iters=20):
    """Surrogate -MLL whose autodiff gradient equals the stochastic-trace
    KISS-GP gradient (see module docstring). The returned VALUE is the SLQ
    estimate of the true -MLL (reported for monitoring; its own gradient
    path is cut)."""
    n = x.shape[0]
    z = _rescale(_embed(params, x))
    dt = z.dtype      # the params/x promoted dtype (fp64 under x64 tests)
    ws, kuu_1ds, amp, noise = _ski_parts(params, z, grid_size)

    def mvm_nograd(v):
        sg = jax.lax.stop_gradient
        return ski_mvm([sg(w) for w in ws], [sg(k) for k in kuu_1ds],
                       sg(amp), sg(noise), v)

    yc = (y.reshape(-1, 1) - params["mean_const"]).astype(dt)
    probes = jnp.where(
        jax.random.bernoulli(key, 0.5, (n, num_probes)), 1.0, -1.0
    ).astype(dt)
    rhs = jnp.concatenate([jax.lax.stop_gradient(yc), probes], axis=1)
    sol = jax.lax.stop_gradient(
        batched_cg(mvm_nograd, rhs, tol=cg_tol, max_iters=cg_iters))
    alpha, wprobes = sol[:, :1], sol[:, 1:]

    def mvm_grad(v):
        return ski_mvm(ws, kuu_1ds, amp, noise, v)

    # gradient-carrying surrogate terms. For -MLL = 0.5 yc^T K^-1 yc
    # + 0.5 logdet K + const:
    #   d/dtheta (0.5 yc^T K^-1 yc) = -0.5 a^T (dK) a
    #       -> surrogate term  -0.5 sg(a)^T K(theta) sg(a)
    #   d/dc    (0.5 yc^T K^-1 yc) = -sum(a)   (yc = y - c)
    #       -> surrogate term  sg(a)^T yc(c)
    #   d/dtheta (0.5 logdet K)    ~= 0.5/m sum_i w_i^T (dK) z_i
    #       -> surrogate term  0.5/m sum_i sg(w_i)^T K(theta) z_i
    data_term = -0.5 * jnp.sum(alpha * mvm_grad(alpha)) \
        + jnp.sum(alpha * yc)
    trace_term = 0.5 / num_probes * jnp.sum(wprobes * mvm_grad(probes))
    surrogate = data_term + trace_term

    # monitored value: true -MLL estimate, gradient path cut
    logdet = slq_logdet(mvm_nograd, n, key, num_probes=num_probes,
                        num_iters=slq_iters, dtype=dt)
    value = jax.lax.stop_gradient(
        0.5 * jnp.sum(yc * alpha) + 0.5 * logdet
        + 0.5 * n * jnp.log(2.0 * jnp.pi))
    return surrogate - jax.lax.stop_gradient(surrogate) + value


def train_dkl_ski(x_train, y_train, hid_dim=256, epochs=40, lr=0.01,
                  seed=0, grid_size=GRID_SIZE, num_probes=8, verbose=None):
    """Joint Adam training of extractor + ARD-RBF + noise + constant mean,
    mirroring `DKL_train_and_test` (`/root/reference/dnn/train.py:348-388`)
    with the grid-interpolation covariance the reference uses."""
    x = jnp.asarray(x_train, jnp.float32)
    y = jnp.asarray(y_train, jnp.float32)
    params = init_dkl_params(jax.random.PRNGKey(seed), x.shape[1], hid_dim)
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state, x, y, key):
        # HIGHEST matmul precision: bf16-default MXU products inside the
        # CG/Lanczos iterations destroy the residual orthogonality the
        # solvers depend on at forest scale (same failure mode as the
        # exact-DKL Cholesky; see models/dkl.py and CLAUDE.md).
        with jax.default_matmul_precision("highest"):
            loss, grads = jax.value_and_grad(neg_mll_ski)(
                params, x, y, key, grid_size=grid_size,
                num_probes=num_probes)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    keys = jax.random.split(jax.random.PRNGKey(seed + 1), epochs)
    for i in range(epochs):
        params, state, loss = step(params, state, x, y, keys[i])
        if verbose:
            verbose(f"{i}-th Epochs: SKI-DKL Train Loss={float(loss):.4f}")
    return params


def predict_dkl_ski(params, x_train, y_train, x_test, *,
                    grid_size=GRID_SIZE, cg_tol=1e-5, cg_iters=256,
                    var_chunk=512) -> Tuple[jax.Array, jax.Array]:
    """Posterior mean/std at x_test under the SKI covariance.

    mean = k*^T K^-1 (y - c) + c;  var = diag(k**) - diag(k*^T K^-1 k*),
    with every k-product a SKI product and every solve a batched CG. The
    variance solves run in chunks of var_chunk test columns. Runs at
    HIGHEST matmul precision (see train step)."""
    with jax.default_matmul_precision("highest"):
        return _predict_dkl_ski_impl(
            params, x_train, y_train, x_test, grid_size=grid_size,
            cg_tol=cg_tol, cg_iters=cg_iters, var_chunk=var_chunk)


def _predict_dkl_ski_impl(params, x_train, y_train, x_test, *,
                          grid_size, cg_tol, cg_iters, var_chunk):
    x = jnp.asarray(x_train)
    xt = jnp.asarray(x_test)
    n, m = x.shape[0], xt.shape[0]
    zj = _rescale(_embed(params, jnp.concatenate([x, xt], axis=0)), None)
    z, zt = zj[:n], zj[n:]
    dt = zj.dtype
    ws, kuu_1ds, amp, noise = _ski_parts(params, z, grid_size)
    ws_t = interp_weights(zt, grid_size)

    def mvm(v):
        return ski_mvm(ws, kuu_1ds, amp, noise, v)

    yc = (jnp.asarray(y_train).reshape(-1, 1) - params["mean_const"]
          ).astype(dt)
    alpha = batched_cg(mvm, yc, tol=cg_tol, max_iters=cg_iters)
    mean = ski_cross_mvm(ws_t, ws, kuu_1ds, amp, alpha).ravel() \
        + params["mean_const"]

    # variance: chunked CG on the cross-covariance columns
    kss = ski_diag(ws_t, kuu_1ds, amp)
    var = jnp.zeros((m,), dt)
    for s in range(0, m, var_chunk):
        e = min(s + var_chunk, m)
        ws_chunk = [w[s:e] for w in ws_t]
        kstar = ski_cross_mvm(ws, ws_chunk, kuu_1ds, amp,
                              jnp.eye(e - s, dtype=dt))
        sol = batched_cg(mvm, kstar, tol=cg_tol, max_iters=cg_iters)
        var = var.at[s:e].set(kss[s:e] - jnp.sum(kstar * sol, axis=0))
    return mean, jnp.sqrt(jnp.maximum(var, 0.0))
