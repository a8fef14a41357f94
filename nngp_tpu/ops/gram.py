"""Input-layer Gram assembly on the MXU.

The infinite-width kernel recursion starts from the input covariance
``K0[i, j] = <x1_i, x2_j> / d`` (the NTK-parameterization Dense layer divides
by the input width; reference semantics via neural-tangents behind
`/root/reference/train.py:161-168`). On TPU this is one large matmul — the
only O(N^2 d) FLOPs in the whole pipeline — so it is kept as a single
``dot_general`` that XLA tiles onto the 128x128 systolic array; the
elementwise dual-activation recursion fuses into its epilogue.

``precision`` matters for parity: the reference runs fp64 on CPU. On the MXU
we default to HIGHEST (fp32 accumulation via multi-pass bf16) which keeps the
Gram accurate to ~1e-7 relative — far below the diag_reg=1e-3 ridge.
"""

import jax
import jax.numpy as jnp


def input_gram(x1, x2, precision=jax.lax.Precision.HIGHEST):
    """K0 = x1 @ x2.T / d  with shape (n1, n2). d = feature dim."""
    d = x1.shape[-1]
    k = jax.lax.dot_general(
        x1,
        x2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision,
    )
    return k / d


def input_diag(x):
    """diag(x @ x.T) / d = row squared norms / d, shape (n,)."""
    d = x.shape[-1]
    return jnp.sum(x * x, axis=-1) / d


def panel_symm_matmul(spec_layers, x, w, get="nngp", block_size: int = 4096,
                      precision=None):
    """(kernel Gram of x vs x) @ w WITHOUT materializing the n x n Gram:
    panel k contributes K[:, s:e] @ w[s:e]; live temps stay (n, b) + the
    (n, m) accumulator. Same flops as the dense multiply plus one Gram
    recursion pass (O(n^2 d) MXU + O(n^2) VPU — measured <10% of fit time
    at every scale, BASELINE.md), so the Gram is cheaper to REBUILD per
    predict batch than to keep resident: this is what lifts the large-n
    NTK posterior's memory to one live n^2 buffer (the Theta factor).
    `precision=None` matches the dense `k_tt @ w` default."""
    from nngp_tpu.models.kernel_spec import apply_recursion

    n = x.shape[0]
    dvec = input_diag(x)
    out = jnp.zeros((n, w.shape[1]), w.dtype)
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        k0 = input_gram(x, x[s:e])
        nngp, ntk = apply_recursion(k0, jnp.zeros_like(k0), dvec[:, None],
                                    dvec[s:e][None, :], spec_layers)
        sel = nngp if get == "nngp" else ntk
        out = out + jax.lax.dot_general(
            sel, w[s:e], dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision)
    return out


def panel_gram(spec_layers, x, get="nngp", block_size: int = 4096):
    """Full symmetric kernel Gram built COLUMN-PANEL-WISE into one output
    buffer via a write-only dynamic_update_slice chain.

    Why not one `kernel_fn(x, x)` call: XLA materializes several n^2
    elementwise temporaries per activation layer for the monolithic
    recursion (a depth-8 kernel's 21.6k Gram wants 52 GB of HLO temps and
    refuses to compile — experiments/gram_depth.log). Panel-wise, the
    recursion temps are (n, b) and the only n^2 object is the output, so
    peak memory is ~n^2 + O(n b) at ANY depth. Same flops, same numerics.
    """
    from nngp_tpu.models.kernel_spec import apply_recursion

    n = x.shape[0]
    if n <= block_size:
        k0 = input_gram(x, x)
        d = input_diag(x)
        nngp, ntk = apply_recursion(k0, jnp.zeros_like(k0), d[:, None],
                                    d[None, :], spec_layers)
        return nngp if get == "nngp" else ntk
    dvec = input_diag(x)
    out = jnp.zeros((n, n), x.dtype)
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        k0 = input_gram(x, x[s:e])
        nngp, ntk = apply_recursion(k0, jnp.zeros_like(k0), dvec[:, None],
                                    dvec[s:e][None, :], spec_layers)
        sel = nngp if get == "nngp" else ntk
        out = jax.lax.dynamic_update_slice(out, sel, (0, s))
    return out
