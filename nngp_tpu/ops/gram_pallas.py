"""Fused Pallas TPU kernel for NNGP/NTK Gram assembly.

Replaces the XLA path (`KernelSpec.kernel_fn`) for large symmetric Grams:
each grid program loads a (TM, d) x (TN, d) pair of input tiles into VMEM,
runs the input matmul on the MXU, and applies the full dual-activation
recursion elementwise before writing the finished kernel tile to HBM.

The symmetric path iterates a FLAT grid over only the nt(nt+1)/2 lower-
triangular tiles, with the (i, j) tile coordinates scalar-prefetched so the
BlockSpec index maps can route DMA per program. This halves not just the
transcendental compute but the HBM traffic itself — strictly-upper tiles are
never loaded nor written (a 2-D grid with a `pl.when` skip still pays full
input+output DMA for skipped programs). The XLA path, by contrast, writes
the full n^2 and is already at the HBM roofline at n~10k — bytes are the
only lever left.

Two symmetric output modes:
  mirror="full"   mirror the strict lower triangle into the upper (one XLA
                  post-pass) — a plain dense Gram.
  mirror="lower"  return as-is: correct lower triangle + diagonal, garbage
                  in never-written upper tiles. This feeds consumers that
                  only read the lower triangle — Cholesky / triangular
                  solves (`ops.linalg.blocked_cholesky`) — with zero
                  post-pass traffic.

Symmetric outputs get their diagonal overwritten by the exact O(n) diagonal
recursion (the in-kernel diagonal carries sqrt(eps) acos(rho=1) noise —
worst for NTK, whose dual has unbounded slope there), and `diag_add` fuses
the GP ridge into that scatter, so fit never materializes an unridged Gram.

This is the TPU-native subsumption of `nt.batch(kernel_fn, ...)`'s
host-blocked Gram in the reference (`/root/reference/train.py:166-168`).

Status (round-3 settlement, now definitive): NON-default. The FAIR
interleaved fit-path A/B (experiments/pallas_fit_ab3.log — both arms
invoke `_fit_impl` directly, alternating trial by trial) has the fused
panel fit winning at every size: 48.2 vs 55.4 ms at 10.8k, 95.1 vs 105.7
at 16.4k, 170.7 vs 195.9 at 21.6k (11-15%). Two earlier A/Bs that showed
this kernel "winning" (pallas_fit.log, pallas_fit_ab2.log) were biased:
their fused arm went through `fit_gp`, whose `_auto_input_scale` probe on
a committed device array costs a ~28 ms blocking fetch the pallas arm
never paid. The per-tile cost is the thin K=128 in-kernel matmul at
HIGHEST precision + the VPU recursion, and no tiling change closes it
(gram_tiles.log). The tier remains selectable
(`_fit_impl(..., pallas_max_n=...)`, parity-tested) and the kernel serves
lower-triangle-only consumers.

Numerical layout notes:
  - feature dim d is zero-padded to a multiple of 128 (lane width); zero
    columns do not change dot products.
  - row counts are padded to the tile size; padded diagonal entries are set
    to 1 so the recursion stays finite in dead lanes (results are sliced off).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nngp_tpu.models.kernel_spec import Dense, KernelSpec, apply_recursion
from nngp_tpu.ops.gram import input_diag


def _round_up(x, m):
    return (x + m - 1) // m * m


def _compute_tile(x1_ref, x2_ref, d1_ref, d2_ref, layers, feat_dim, duals):
    # HIGHEST: full-fp32 multi-pass on the MXU. Single-pass bf16 (the
    # default) gives ~0.3% relative error in the Gram — enough to corrupt
    # posterior variances at the diag_reg=1e-3 scale.
    k0 = jax.lax.dot_general(
        x1_ref[:], x2_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / feat_dim
    return apply_recursion(k0, jnp.zeros_like(k0), d1_ref[:], d2_ref[:],
                           layers, duals=duals)


def _sym_kernel(ti_ref, tj_ref, x1_ref, x2_ref, d1_ref, d2_ref,
                *out_refs, layers, feat_dim, want_ntk, duals):
    nngp, ntk = _compute_tile(x1_ref, x2_ref, d1_ref, d2_ref, layers,
                              feat_dim, duals)
    out_refs[0][:] = nngp
    if want_ntk:
        out_refs[1][:] = ntk


def _cross_kernel(x1_ref, x2_ref, d1_ref, d2_ref, *out_refs,
                  layers, feat_dim, want_ntk, duals):
    nngp, ntk = _compute_tile(x1_ref, x2_ref, d1_ref, d2_ref, layers,
                              feat_dim, duals)
    out_refs[0][:] = nngp
    if want_ntk:
        out_refs[1][:] = ntk


@functools.partial(
    jax.jit,
    static_argnames=("spec", "get", "tile_m", "tile_n", "symmetric",
                     "interpret", "fast_math", "mirror"),
)
def gram_pallas(spec: KernelSpec, x1, x2=None, get="nngp",
                tile_m: int = 256, tile_n: int = 256,
                symmetric: bool = None, interpret: bool = None,
                fast_math: bool = True, mirror: str = "full",
                diag_add=None):
    """Dense Gram via the fused Pallas kernel. Same contract as
    `spec.kernel_fn(x1, x2, get)`; fp32.

    mirror: 'full' | 'lower' (symmetric only — see module docstring).
    diag_add: optional scalar fused onto the solve-kernel diagonal
    (symmetric only): nngp for get='nngp', ntk for get containing 'ntk'.
    """
    if x2 is None:
        x2 = x1
        if symmetric is None:
            symmetric = True
    symmetric = bool(symmetric)
    if mirror not in ("full", "lower"):
        raise ValueError(f"mirror must be 'full' or 'lower', got {mirror!r}")
    if symmetric and tile_m != tile_n:
        # with rectangular tiles the lower-tile set straddles the diagonal
        raise ValueError("symmetric=True requires tile_m == tile_n")
    if (diag_add is not None or mirror == "lower") and not symmetric:
        raise ValueError("mirror='lower' / diag_add need symmetric=True")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    want_ntk = get == "ntk" or (isinstance(get, (tuple, list)) and "ntk" in get)

    n1, d = x1.shape
    n2 = x2.shape[0]
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)

    # Pad features to the lane width and rows to the tile size.
    dp = _round_up(d, 128)
    n1p = _round_up(n1, tile_m)
    n2p = _round_up(n2, tile_n)
    x1p = jnp.pad(x1, ((0, n1p - n1), (0, dp - d)))
    x2p = jnp.pad(x2, ((0, n2p - n2), (0, dp - d)))
    # Diags use the ORIGINAL d normalization; pad with 1s to stay finite.
    d1 = jnp.pad(input_diag(x1), (0, n1p - n1), constant_values=1.0)[:, None]
    d2 = jnp.pad(input_diag(x2), (0, n2p - n2), constant_values=1.0)[None, :]

    from nngp_tpu.ops.dual_activations import DUALS, DUALS_FAST
    duals = DUALS_FAST if fast_math else DUALS

    out_shapes = [jax.ShapeDtypeStruct((n1p, n2p), jnp.float32)]
    if want_ntk:
        out_shapes.append(jax.ShapeDtypeStruct((n1p, n2p), jnp.float32))
    n_transc = len([l for l in spec.layers if not isinstance(l, Dense)])

    if symmetric:
        nt = n1p // tile_m
        # Flat grid over lower-triangular tiles, row-major: (i, j<=i).
        ti = np.concatenate([np.full(i + 1, i, np.int32) for i in range(nt)])
        tj = np.concatenate([np.arange(i + 1, dtype=np.int32)
                             for i in range(nt)])
        n_tiles = int(ti.shape[0])

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile_m, dp), lambda t, ti, tj: (ti[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, dp), lambda t, ti, tj: (tj[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, 1), lambda t, ti, tj: (ti[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda t, ti, tj: (0, tj[t]),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_m, tile_n),
                             lambda t, ti, tj: (ti[t], tj[t]),
                             memory_space=pltpu.VMEM)
                for _ in out_shapes
            ],
        )
        kernel = functools.partial(
            _sym_kernel, layers=spec.layers, feat_dim=float(d),
            want_ntk=want_ntk, duals=duals)
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            cost_estimate=pl.CostEstimate(
                flops=int(2 * tile_m * tile_n * dp * n_tiles),
                bytes_accessed=int(
                    n_tiles * (tile_m * dp + tile_n * dp
                               + tile_m * tile_n * len(out_shapes)) * 4),
                transcendentals=int(tile_m * tile_n * n_tiles * n_transc),
            ),
            interpret=interpret,
        )(jnp.asarray(ti), jnp.asarray(tj), x1p, x2p, d1, d2)
    else:
        grid = (n1p // tile_m, n2p // tile_n)
        kernel = functools.partial(
            _cross_kernel, layers=spec.layers, feat_dim=float(d),
            want_ntk=want_ntk, duals=duals)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, dp), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, dp), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                                    memory_space=pltpu.VMEM)
                       for _ in out_shapes],
            out_shape=out_shapes,
            cost_estimate=pl.CostEstimate(
                flops=int(2 * n1p * n2p * dp),
                bytes_accessed=int((n1p * dp + n2p * dp
                                    + n1p * n2p * len(out_shapes)) * 4),
                transcendentals=int(n1p * n2p * n_transc),
            ),
            interpret=interpret,
        )(x1p, x2p, d1, d2)

    def finish(o, exact_diag):
        if symmetric and mirror == "full":
            # Upper tiles were never written: mirror the strict lower.
            o = jnp.tril(o) + jnp.tril(o, -1).T
        o = o[:n1, :n2]
        if exact_diag is not None:
            # The in-kernel diagonal carries sqrt(eps) acos(rho=1) noise
            # (worst for NTK, whose dual has unbounded slope there); the
            # O(n) diagonal recursion is exact — scatter it in, with the
            # optional fused ridge.
            idx = jnp.arange(n1)
            o = o.at[idx, idx].set(exact_diag)
        return o

    if symmetric:
        from nngp_tpu.models.kernel_spec import apply_diag_recursion
        dn, dt = apply_diag_recursion(input_diag(x1), spec.layers)
        dn = dn.astype(jnp.float32)
        dt = dt.astype(jnp.float32)
        add = jnp.float32(0.0) if diag_add is None else diag_add
        diag_nngp = dn + (add if not want_ntk else 0.0)
        diag_ntk = dt + add
    else:
        diag_nngp = diag_ntk = None

    nngp = finish(outs[0], diag_nngp)
    ntk = finish(outs[1], diag_ntk) if want_ntk else None
    return KernelSpec._select(nngp, ntk if ntk is not None else nngp, get)
