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
