"""Dense linear algebra for the exact GP posterior.

The reference factorizes the train Gram once inside neural-tangents
(`/root/reference/train.py:171-172`) and its hand-rolled GP does the same
explicitly (`/root/reference/train.py:93-95`). Here the factorization runs
on-device via ``lax.linalg.cholesky`` (XLA's blocked TPU implementation), and
active learning gets an incremental block append (`cholesky_append_rows`) so
each acquisition round costs O(n^2 k) instead of the reference's full O(n^3)
refit (`/root/reference/active/ActiveLearner.py:67-77`).

`diag_reg` follows neural-tangents' *relative* semantics: the ridge added is
``diag_reg * mean(diag(K))``, not ``diag_reg`` itself.
"""

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class BlockLowerTriangular:
    """Lower-triangular factor stored as triangular COLUMN BLOCKS: block k
    is the (n - starts[k], widths[k]) array L[starts[k]:, starts[k]:starts[k+1]]
    — the dense n x n array never exists. This is the memory form that breaks
    the single-chip fit ceiling: total storage is ~n^2/2 and no op (factor,
    solve, extend) ever touches a full n x n operand, vs the ~2-3 live n^2
    buffers of the dense layouts (see `fused_panel_cholesky`).

    A pytree (blocks are leaves; starts/n are static aux data), so it drops
    into `GPPosterior.l` and flows through jit/donation/checkpointing like a
    plain array. Solves: `block_tri_solve_lower(_t)`; appending rows (active
    learning): `block_cholesky_append_rows`.
    """

    def __init__(self, blocks, starts, n):
        self.blocks = tuple(blocks)
        self.starts = tuple(int(s) for s in starts)   # len nb+1; [0, ..., n]
        self.n = int(n)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.blocks[0].dtype

    def diagonal(self):
        return jnp.concatenate(
            [jnp.diagonal(b[: b.shape[1]]) for b in self.blocks])

    def to_dense(self):
        """Assemble the full lower-triangular array (write-only
        dynamic_update_slice chain — XLA builds it in one buffer)."""
        l = jnp.zeros((self.n, self.n), self.dtype)
        for s, b in zip(self.starts, self.blocks):
            l = jax.lax.dynamic_update_slice(l, b, (s, s))
        return l

    def tree_flatten(self):
        return self.blocks, (self.starts, self.n)

    @classmethod
    def tree_unflatten(cls, aux, blocks):
        return cls(blocks, aux[0], aux[1])


def blocked_cholesky(a, block_size: int = 512,
                     precision=jax.lax.Precision.HIGHEST,
                     zero_upper: bool = True):
    """Right-looking blocked Cholesky, statically unrolled — the TPU fast
    path for the O(n^3) step behind `/root/reference/train.py:171-172`.

    Why not `lax.linalg.cholesky`: XLA expands Cholesky into a while-loop
    with dynamic slices and FULL-WIDTH masked trailing updates — about 2x
    the minimal flops and poor MXU utilization (~16 TF/s measured at
    n=10.8k fp32). This version unrolls n/block_size panels with static
    shrinking shapes, so every trailing update is a plain MXU matmul on
    exactly the blocks that need it (sum = n^3/3 flops), and all updates
    chain in-place on one n^2 buffer (XLA reuses the storage — peak live
    memory is ONE n x n array + an O(n b) panel).

    Per panel k: factor the (b, b) diagonal block (tiny — XLA's own
    cholesky), form L_kk^{-1} by a (b, b) triangular solve, produce the
    panel below as one matmul, then subtract panel outer products from the
    remaining lower-triangular block columns.

    zero_upper=False skips the final O(n^2) tril pass — valid when the
    result only feeds triangular solves (they ignore the other triangle).
    """
    n = a.shape[0]
    b = int(block_size)
    nb = -(-n // b)
    # symmetrize_input=False throughout: the algorithm only reads the lower
    # triangle, and callers legitimately pass Grams whose strictly-upper
    # tiles are garbage (gram_pallas mirror='lower'); XLA's default
    # (a+a^T)/2 symmetrization would fold that garbage into the factor.
    if nb <= 1:
        return jax.lax.linalg.cholesky(a, symmetrize_input=False)
    for k in range(nb):
        s, e = k * b, min((k + 1) * b, n)
        lkk = jax.lax.linalg.cholesky(a[s:e, s:e], symmetrize_input=False)
        a = a.at[s:e, s:e].set(lkk)
        if e == n:
            break
        linv = jax.lax.linalg.triangular_solve(
            lkk, jnp.eye(e - s, dtype=a.dtype),
            left_side=True, lower=True)
        # P = A[e:, s:e] L_kk^{-T}: one tall matmul instead of XLA's
        # serialized triangular solve.
        panel = jax.lax.dot_general(
            a[e:, s:e], linv,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision)
        a = a.at[e:, s:e].set(panel)
        # Trailing update, lower-triangular block columns only.
        for j in range(k + 1, nb):
            js, je = j * b, min((j + 1) * b, n)
            upd = jax.lax.dot_general(
                panel[js - e:, :], panel[js - e:je - e, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=precision)
            a = a.at[js:, js:je].add(-upd)
    if zero_upper:
        a = jnp.tril(a)
    return a


def fused_panel_cholesky(panel_fn, n: int, dtype, block_size: int = 512,
                         precision=jax.lax.Precision.HIGHEST,
                         layout: str = "inplace"):
    """LEFT-looking blocked Cholesky where the matrix is never materialized:
    each panel of K is produced on demand by `panel_fn(s, e) -> K[s:, s:e]`
    (ridge included), updated by the already-finished factor columns, and
    factored. For the GP fit this fuses Gram assembly INTO the
    factorization: K + r I never exists. Statically unrolled with static
    shrinking shapes; per-panel updates are plain MXU matmuls summing to
    the minimal n^3/3 flops.

    layout='inplace': one n x n buffer updated through an `.at` chain with
    the panel update as ONE tall matmul L[s:, :s] @ L[s:e, :s]^T — fastest
    (fewest HLO ops), but XLA does not reliably alias the chain, so peak
    live memory is ~2-3 n^2 (measured fine through n=21.6k on a 16 GB
    chip, OOM at 32.4k).

    layout='columns': the factor is built as TRIANGULAR COLUMN BLOCKS —
    block k a separate (n - k*b, b) array — so no op ever touches a full
    n x n operand; peak is ~n^2/2 for the blocks plus ~1.5 n^2 transiently
    in the final assembly. Use with a LARGE block_size (e.g. 2048): the
    O((n/b)^2) unrolled matmul count is what killed the remote compiler at
    n=32.4k with b=1024.

    layout='blocks': same factorization but the column blocks are returned
    AS the factor (a `BlockLowerTriangular`) — the final n x n assembly and
    its ~1.5 n^2 transient never happen, peak stays ~n^2/2. The form that
    fits n=70k on one 16 GB chip. Its trailing dots are (n-s, b) x (b, b),
    so the MXU rate is set by the PANEL width — pick it large (callers
    target ~21 panels; see gp.posterior._fused_fit_factor). Merging
    finished blocks into wider contraction operands was tried and measured
    SLOWER (concat copies + the output width still caps the rate).
    """
    b = int(block_size)
    nb = -(-n // b)

    if layout == "inplace":
        l = jnp.zeros((n, n), dtype)
        for k in range(nb):
            s, e = k * b, min((k + 1) * b, n)
            col = panel_fn(s, e)                   # (n - s, e - s)
            if s:
                col = col - jax.lax.dot_general(
                    l[s:, :s], l[s:e, :s],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=precision)
            lkk = jax.lax.linalg.cholesky(col[:e - s],
                                      symmetrize_input=False)
            l = l.at[s:e, s:e].set(lkk)
            if e < n:
                linv = jax.lax.linalg.triangular_solve(
                    lkk, jnp.eye(e - s, dtype=dtype),
                    left_side=True, lower=True)
                panel = jax.lax.dot_general(
                    col[e - s:], linv,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=precision)
                l = l.at[e:, s:e].set(panel)
        return l

    if layout not in ("columns", "blocks"):
        raise ValueError(
            f"layout must be 'inplace', 'columns' or 'blocks', got {layout!r}")
    cols = []                       # cols[j]: (n - j*b, bj) = L[j*b:, j-block]
    for k in range(nb):
        s, e = k * b, min((k + 1) * b, n)
        col = panel_fn(s, e)                       # (n - s, e - s)
        for j, cj in enumerate(cols):
            js = j * b
            col = col - jax.lax.dot_general(
                cj[s - js:], cj[s - js:e - js],
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=precision)
        lkk = jax.lax.linalg.cholesky(col[:e - s],
                                      symmetrize_input=False)
        if e < n:
            linv = jax.lax.linalg.triangular_solve(
                lkk, jnp.eye(e - s, dtype=dtype),
                left_side=True, lower=True)
            panel = jax.lax.dot_general(
                col[e - s:], linv,
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=precision)
            cols.append(jnp.concatenate([lkk, panel], axis=0))
        else:
            cols.append(lkk)
    starts = [min(k * b, n) for k in range(nb + 1)]
    bf = BlockLowerTriangular(cols, starts, n)
    if layout == "blocks":
        return bf
    # 'columns': assemble via a write-only dynamic_update_slice chain
    # (disjoint regions, no interleaved reads — XLA updates the one output
    # buffer in place; a pad+concat here transiently doubled peak memory
    # and OOMed at n=32.4k).
    return bf.to_dense()


def blocked_tri_solve_lower(l, b, block_size: int = 1024,
                            precision=jax.lax.Precision.HIGHEST):
    """Solve L x = b (L lower-triangular) as a statically-unrolled blocked
    forward substitution: per panel one small (bk, bk) triangular inverse +
    two MXU matmuls, instead of XLA's serialized expander. Same O(n^2 m)
    flops, MXU-bound instead of latency-bound — the predict-path analog of
    `blocked_cholesky`."""
    n = l.shape[0]
    bs = int(block_size)
    nb = -(-n // bs)
    if nb <= 1:
        return jax.lax.linalg.triangular_solve(
            l, b, left_side=True, lower=True)
    xs = []
    for k in range(nb):
        s, e = k * bs, min((k + 1) * bs, n)
        rhs = b[s:e]
        if s:
            x_done = jnp.concatenate(xs, axis=0)
            rhs = rhs - jax.lax.dot_general(
                l[s:e, :s], x_done,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision)
        # Invert the small diagonal block once, then one MXU matmul — the
        # wide rhs never goes through XLA's serialized solve expander.
        linv = jax.lax.linalg.triangular_solve(
            l[s:e, s:e], jnp.eye(e - s, dtype=l.dtype),
            left_side=True, lower=True)
        xs.append(jax.lax.dot_general(
            linv, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision))
    return jnp.concatenate(xs, axis=0)


def blocked_tri_solve_lower_t(l, b, block_size: int = 1024,
                              precision=jax.lax.Precision.HIGHEST):
    """Solve L^T x = b (backward substitution), blocked like
    `blocked_tri_solve_lower`."""
    n = l.shape[0]
    bs = int(block_size)
    nb = -(-n // bs)
    if nb <= 1:
        return jax.lax.linalg.triangular_solve(
            l, b, left_side=True, lower=True, transpose_a=True)
    xs = [None] * nb
    for k in reversed(range(nb)):
        s, e = k * bs, min((k + 1) * bs, n)
        rhs = b[s:e]
        if e < n:
            x_done = jnp.concatenate(xs[k + 1:], axis=0)   # rows e..n
            rhs = rhs - jax.lax.dot_general(
                l[e:, s:e], x_done,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=precision)
        linv = jax.lax.linalg.triangular_solve(
            l[s:e, s:e], jnp.eye(e - s, dtype=l.dtype),
            left_side=True, lower=True)
        xs[k] = jax.lax.dot_general(
            linv, rhs, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision)
    return jnp.concatenate(xs, axis=0)


def cholesky_with_ridge(k, diag_reg=1e-3, diag_reg_absolute_scale=False):
    """Cholesky of K + reg*I with reg = diag_reg * mean(diag K) (relative).

    Returns (L, reg) where L is lower triangular.
    """
    n = k.shape[0]
    if diag_reg_absolute_scale:
        reg = jnp.asarray(diag_reg, k.dtype)
    else:
        reg = diag_reg * jnp.mean(jnp.diagonal(k))
    k_reg = k + reg * jnp.eye(n, dtype=k.dtype)
    return jax.lax.linalg.cholesky(k_reg), reg


def tri_solve_lower(l, b):
    """Solve L x = b for lower-triangular L."""
    return jax.lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=False
    )


def tri_solve_lower_t(l, b):
    """Solve L^T x = b for lower-triangular L."""
    return jax.lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=True
    )


def cho_solve(l, b):
    """Solve (L L^T) x = b."""
    return tri_solve_lower_t(l, tri_solve_lower(l, b))


def block_tri_solve_lower(bf: BlockLowerTriangular, b,
                          precision=jax.lax.Precision.HIGHEST):
    """Solve L x = b with L stored as column blocks — right-looking forward
    substitution reading ONLY the stored blocks (no dense L anywhere). Per
    block: one small (w, w) triangular inverse + two MXU matmuls; total
    n^2 m / 2 flops like the dense version. (A left-looking variant with
    per-panel operand concats measured no faster and its big concat HLOs
    crashed the remote compiler at n=54k.)"""
    xs = []
    tail = b                                 # residual rhs rows starts[k]..n
    for k, blk in enumerate(bf.blocks):
        w = bf.starts[k + 1] - bf.starts[k]
        head, tail = tail[:w], tail[w:]
        linv = jax.lax.linalg.triangular_solve(
            blk[:w], jnp.eye(w, dtype=blk.dtype), left_side=True, lower=True)
        xk = jax.lax.dot_general(
            linv, head, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision)
        xs.append(xk)
        if bf.starts[k + 1] < bf.n:
            tail = tail - jax.lax.dot_general(
                blk[w:], xk, dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision)
    return jnp.concatenate(xs, axis=0)


def block_tri_solve_lower_t(bf: BlockLowerTriangular, b,
                            precision=jax.lax.Precision.HIGHEST):
    """Solve L^T x = b (backward substitution) on the column-block factor:
    block k's below-diagonal panel IS the L^T row chunk the update needs, so
    no transposed dense view is ever formed."""
    nb = len(bf.blocks)
    xs = [None] * nb
    x_below = None                            # rows starts[k+1]..n of x
    for k in reversed(range(nb)):
        blk = bf.blocks[k]
        s, e = bf.starts[k], bf.starts[k + 1]
        w = e - s
        rhs = b[s:e]
        if e < bf.n:
            rhs = rhs - jax.lax.dot_general(
                blk[w:], x_below, dimension_numbers=(((0,), (0,)), ((), ())),
                precision=precision)
        linv = jax.lax.linalg.triangular_solve(
            blk[:w], jnp.eye(w, dtype=blk.dtype), left_side=True, lower=True)
        # x_k = L_kk^{-T} rhs = (L_kk^{-1})^T rhs
        xk = jax.lax.dot_general(
            linv, rhs, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision)
        xs[k] = xk
        x_below = xk if x_below is None else jnp.concatenate(
            [xk, x_below], axis=0)
    return jnp.concatenate(xs, axis=0)


def block_cholesky_append_rows(bf: BlockLowerTriangular, k21, k22,
                               precision=jax.lax.Precision.HIGHEST):
    """`cholesky_append_rows` for a column-block factor: appending m rows
    extends every existing block by its m new rows (L21 columns) and adds one
    new (m, m) diagonal block — still no dense n x n. K22 must include its
    ridge. O(n^2 m) like the dense append."""
    l21t = block_tri_solve_lower(bf, k21.T, precision=precision)   # (n, m)
    l21 = l21t.T                                                   # (m, n)
    schur = k22 - jax.lax.dot_general(
        l21, l21, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision)
    l22 = jax.lax.linalg.cholesky(schur)
    new_blocks = [
        jnp.concatenate([blk, l21[:, bf.starts[k]:bf.starts[k + 1]]], axis=0)
        for k, blk in enumerate(bf.blocks)
    ]
    new_blocks.append(l22)
    m = k22.shape[0]
    return BlockLowerTriangular(
        new_blocks, bf.starts + (bf.n + m,), bf.n + m)


def cholesky_append_rows(l11, k21, k22,
                         precision=jax.lax.Precision.HIGHEST):
    """Extend a Cholesky factor when appending rows/cols to the Gram matrix.

    Given L11 = chol(K11) and the new blocks so that the extended matrix is
    [[K11, K21^T], [K21, K22]], returns the extended lower factor
    [[L11, 0], [L21, L22]] where L21 = K21 L11^{-T} and
    L22 = chol(K22 - L21 L21^T).

    K22 must already include its ridge. O(n^2 m + m^3) — the active-learning
    fast path.

    The Schur subtraction MUST run at fp32-HIGHEST: the default one-pass
    bf16 dot puts ~0.3% relative error into L21 L21^T, which exceeds the
    relative ridge (1e-3 of the mean diagonal) on ill-conditioned Grams and
    makes the Schur complement indefinite -> NaN factor (hit on the synth6
    join workload). Large bases also route the solve through the blocked
    HIGHEST-precision path rather than XLA's default-precision expander.
    """
    if l11.shape[0] >= 4096:
        l21 = blocked_tri_solve_lower(l11, k21.T, block_size=1024,
                                      precision=precision).T
    else:
        l21 = jax.lax.linalg.triangular_solve(
            l11, k21, left_side=False, lower=True, transpose_a=True
        )
    schur = k22 - jax.lax.dot_general(
        l21, l21, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision)
    l22 = jax.lax.linalg.cholesky(schur)
    n, m = l11.shape[0], k22.shape[0]
    top = jnp.concatenate([l11, jnp.zeros((n, m), l11.dtype)], axis=1)
    bot = jnp.concatenate([l21, l22], axis=1)
    return jnp.concatenate([top, bot], axis=0)
