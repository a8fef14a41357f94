"""Fused Pallas TPU kernel for NNGP/NTK Gram assembly.

Replaces the XLA path (`KernelSpec.kernel_fn`) for large Grams: each grid
program loads an (TM, d) x (TN, d) pair of input tiles into VMEM, runs the
input matmul on the MXU, and applies the full dual-activation recursion
elementwise in registers/VMEM before writing the finished kernel tile to HBM.
This removes the HBM round-trip of the intermediate x1@x2.T matrix that the
unfused path pays (O(n^2) extra read+write traffic) and — for symmetric
Grams — skips the strictly-upper-triangular tiles entirely, halving the
transcendental work (arccos dominates; the matmul is negligible at d~tens).

This is the TPU-native subsumption of `nt.batch(kernel_fn, ...)`'s
host-blocked Gram in the reference (`/root/reference/train.py:166-168`).

Numerical layout notes:
  - feature dim d is zero-padded to a multiple of 128 (lane width); zero
    columns do not change dot products.
  - row counts are padded to the tile size; padded diagonal entries are set
    to 1 so the recursion stays finite in dead lanes (results are sliced off).
  - sqrt(diag) vectors are precomputed once per side — the per-element
    sqrt(k11*k22) becomes one multiply of broadcast vectors.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nngp_tpu.models.kernel_spec import Dense, KernelSpec, apply_recursion
from nngp_tpu.ops.gram import input_diag


def _round_up(x, m):
    return (x + m - 1) // m * m


def _gram_kernel(*refs, layers, feat_dim, want_ntk, symmetric, duals):
    if want_ntk:
        x1_ref, x2_ref, d1_ref, d2_ref, nngp_ref, ntk_ref = refs
    else:
        x1_ref, x2_ref, d1_ref, d2_ref, nngp_ref = refs
        ntk_ref = None

    def compute():
        # HIGHEST: full-fp32 multi-pass on the MXU. Single-pass bf16 (the
        # default) gives ~0.3% relative error in the Gram — enough to corrupt
        # posterior variances at the diag_reg=1e-3 scale.
        k0 = jax.lax.dot_general(
            x1_ref[:], x2_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) / feat_dim
        d1 = d1_ref[:]          # (TM, 1)
        d2 = d2_ref[:]          # (1, TN)
        nngp, ntk = apply_recursion(k0, jnp.zeros_like(k0), d1, d2, layers,
                                    duals=duals)
        nngp_ref[:] = nngp
        if want_ntk:
            ntk_ref[:] = ntk

    if symmetric:
        # Skip strictly-upper tiles; they are mirrored on the host side.
        @pl.when(pl.program_id(1) <= pl.program_id(0))
        def _():
            compute()
    else:
        compute()


@functools.partial(
    jax.jit,
    static_argnames=("spec", "get", "tile_m", "tile_n", "symmetric",
                     "interpret", "fast_math"),
)
def gram_pallas(spec: KernelSpec, x1, x2=None, get="nngp",
                tile_m: int = 256, tile_n: int = 256,
                symmetric: bool = None, interpret: bool = None,
                fast_math: bool = True):
    """Dense Gram via the fused Pallas kernel. Same contract as
    `spec.kernel_fn(x1, x2, get)`; fp32."""
    if x2 is None:
        x2 = x1
        if symmetric is None:
            symmetric = True
    symmetric = bool(symmetric)
    if symmetric and tile_m != tile_n:
        # with rectangular tiles the skipped upper tiles straddle the
        # diagonal and jnp.tril would keep never-written elements
        raise ValueError("symmetric=True requires tile_m == tile_n")
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

    grid = (n1p // tile_m, n2p // tile_n)
    kernel = functools.partial(
        _gram_kernel, layers=spec.layers, feat_dim=float(d),
        want_ntk=want_ntk, symmetric=symmetric,
        duals=DUALS_FAST if fast_math else DUALS,
    )
    out_shapes = [jax.ShapeDtypeStruct((n1p, n2p), jnp.float32)]
    out_specs = [pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)]
    if want_ntk:
        out_shapes.append(jax.ShapeDtypeStruct((n1p, n2p), jnp.float32))
        out_specs.append(pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                                      memory_space=pltpu.VMEM))

    flops_mult = 0.5 if symmetric else 1.0
    outs = pl.pallas_call(
        kernel,
        grid=tuple(grid),
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
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * n1p * n2p * dp * flops_mult),
            bytes_accessed=int((n1p * dp + n2p * dp + n1p * n2p) * 4),
            transcendentals=int(n1p * n2p * len(
                [l for l in spec.layers if not isinstance(l, Dense)]
            ) * flops_mult),
        ),
        interpret=interpret,
    )(x1p, x2p, d1, d2)

    def finish(o):
        if symmetric:
            # Upper tiles were skipped: mirror the strict lower triangle.
            o = jnp.tril(o) + jnp.tril(o, -1).T
        return o[:n1, :n2]

    outs = [finish(o) for o in outs]
    nngp = outs[0]
    ntk = outs[1] if want_ntk else None
    return KernelSpec._select(nngp, ntk if ntk is not None else nngp, get)
