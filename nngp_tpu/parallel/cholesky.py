"""Distributed block-cyclic Cholesky + triangular solves over a mesh.

Why: XLA's SPMD partitioner handles a sharded `cholesky` by gathering the
operand, so a replicated N x N Gram caps N at one chip's HBM (~60k fp32 rows
on a 16 GB v5e). This factorization keeps the Gram row-block sharded end to
end — the distributed-linear-algebra analog of tensor parallelism for this
workload (SURVEY.md section 2.3, TP row). It is the O(N^3) step behind
`/root/reference/train.py:171-172` when N outgrows one chip.

Layout — block-cyclic storage, decoupled from elimination order:
  The n rows are split into nb = n/b panels of width b. Panel g is OWNED by
  device g % p and stored at local slot g // p, so every device keeps
  participating until the last panel (contiguous ownership would idle device
  0 after its rows finish — the classic right-looking load-balance fix).
  A device's local shard is its nbl = nb/p panels stacked in slot order;
  globally that is the row permutation `cyclic_storage_order(n, b, p)`:
  storage row s on device d=s//(n/p), local offset r=s%(n/p), holds
  ELIMINATION row e(s) = (d + p*(r//b))*b + r%b. Columns stay in elimination
  order (full width, unsharded). With b = n/p (the default) the permutation
  is the identity and the layout degenerates to plain contiguous row blocks.

Algorithm (right-looking, one `lax.fori_loop` body per panel — compile time
is O(1) in nb, which matters behind a 30-300 s/compile TPU tunnel):
  panel kb: owner broadcasts the (b, b) diagonal block (psum); every device
  factors it redundantly (b^3/3 flops — cheaper than serializing); each
  device triangular-solves its own rows of the panel; the finished panel is
  all-gathered (reordered slot-major -> elimination-major) and each device
  applies the trailing update A -= L_panel L_panel^T to its rows as one
  full-width masked MXU matmul. Per-device comm is O(n b) per panel, O(n^2)
  total, riding ICI.

The full-width masked update does 2x the minimal trailing flops in exchange
for static shapes inside fori_loop; the panel factor/solve stages are
O(n b^2) — negligible next to the O(n^3/p) update for b << n.

Companion solves keep the factor sharded: `distributed_tri_solve_lower`
(forward) and `distributed_tri_solve_lower_t` (backward, i.e. L^T x = b),
composed by `distributed_cho_solve`. Right-hand sides are row-sharded in the
same storage layout.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

_HI = jax.lax.Precision.HIGHEST


def cyclic_storage_order(n: int, block_size: int, p: int) -> np.ndarray:
    """g2e: storage index -> elimination index, so A_storage = A[g2e, :].

    Identity when block_size == n // p (one panel per device)."""
    b = block_size
    nb = n // b
    nbl = nb // p
    blocks = np.arange(p)[:, None] + p * np.arange(nbl)[None, :]  # (p, nbl)
    g2e = (blocks[:, :, None] * b + np.arange(b)).reshape(-1)
    return g2e


def _layout(n: int, p: int, block_size):
    b = n // p if block_size is None else int(block_size)
    if n % p:
        raise ValueError(f"n={n} not divisible by mesh size {p}")
    if n % b or (n // b) % p:
        raise ValueError(
            f"block_size={b} must tile n={n} into a multiple of p={p} panels")
    return b, n // b, n // p


def _my_elim_blocks(d, m, b, p):
    """Elimination block id of each local storage row (shape (m,))."""
    return d + p * (jnp.arange(m) // b)


def _chol_local(a_loc, axis_name, p, b, nb, m):
    """Two-level right-looking schedule. Outer UNROLLED loop over GROUPS of
    p consecutive panels — within a group, panel j is owned by device j and
    every device eliminates exactly its first active row-block, so after a
    group the active trailing submatrix shrinks by b rows (locally) and
    p*b columns, as a STATIC slice. Inner `lax.fori_loop` over the p panels
    keeps compile time at O(nb/p) unrolled bodies (the one-level full-width
    version was O(1) but its masked updates burned ~3x the flops: every
    panel's update matmul spanned all m rows x n columns; here it spans
    only the active (m - g*b) x (n - g*p*b) block — per-device update flops
    2n^3/(3p), see `distributed_fit_cost`).

    Finished column strips leave the working set per group and are
    reassembled at the end by a write-only dynamic_update_slice chain.
    Memory note: during the group loop, strips + the shrinking active
    block together stay ~one (m, n) shard; the reassembly transiently
    holds ~1.5 shards (strips ~m*n/2 + the (m, n) output). The in-place
    alternatives are worse, measured: preallocating the output before the
    loop peaks at 2 shards, and a single-buffer windowed update chain with
    interleaved reads makes XLA keep ~3 buffers live (round-2 finding,
    CLAUDE.md)."""
    d = lax.axis_index(axis_name)
    n = nb * b
    ngrp = nb // p
    act = a_loc
    strips = []
    for g in range(ngrp):
        ma = m - g * b
        na = n - g * p * b
        # group-relative elimination block of each active local row: rows
        # [0, b) are block d (eliminated at panel j == d this group); all
        # later row-blocks stay active for the whole group
        blk_rel = (d + p * (jnp.arange(ma) // b))[:, None]   # (ma, 1)

        def body(j, act, ma=ma, na=na, blk_rel=blk_rel):
            a_panel = lax.dynamic_slice(act, (0, j * b), (ma, b))
            diag_cand = a_panel[:b]         # owner's diag block: act rows 0..b
            diag = lax.psum(
                jnp.where(d == j, diag_cand, jnp.zeros_like(diag_cand)),
                axis_name)
            lkk = lax.linalg.cholesky(diag)
            # My active panel rows below the diagonal: L_ik = A_ik L_kk^{-T}.
            lik = lax.linalg.triangular_solve(
                lkk, a_panel, left_side=False, lower=True, transpose_a=True)
            lkk_at_top = jnp.zeros((ma, b), act.dtype).at[:b].set(lkk)
            panel = jnp.where(blk_rel > j, lik,
                              jnp.where(blk_rel == j, lkk_at_top, a_panel))
            act = lax.dynamic_update_slice(act, panel, (0, j * b))
            # Schur update over the ACTIVE block only; rows/columns already
            # eliminated this group are masked (zero rows of `mine` zero the
            # matching panel_glob rows after the gather).
            mine = jnp.where(blk_rel > j, panel, jnp.zeros_like(panel))
            gathered = lax.all_gather(mine, axis_name)       # (p, ma, b)
            panel_glob = (gathered.reshape(p, ma // b, b, b)
                          .transpose(1, 0, 2, 3)             # slot -> elim
                          .reshape(na, b))
            upd = lax.dot_general(mine, panel_glob,
                                  dimension_numbers=(((1,), (1,)), ((), ())),
                                  precision=_HI)
            return act - upd

        act = lax.fori_loop(0, p, body, act)
        strips.append(act[:, : p * b])
        act = act[b:, p * b:]
    out = jnp.zeros((m, n), a_loc.dtype)
    for g, strip in enumerate(strips):
        out = lax.dynamic_update_slice(out, strip, (g * b, g * p * b))
    # Clean strict upper triangle (elimination coordinates).
    rows = jnp.arange(m)
    e_row = (d + p * (rows // b)) * b + rows % b
    col_ids = jnp.arange(n)[None, :]
    return jnp.where(col_ids <= e_row[:, None], out, 0.0)


def distributed_fit_cost(n: int, p: int, block_size=None, itemsize: int = 4):
    """Analytic per-device cost of `distributed_cholesky` under the
    two-level schedule (asserted in tests/test_distributed_cholesky.py).

    The trailing update at group g is p rectangular matmuls of shape
    (m - g*b, b) x (b, n - g*p*b), so per-device update flops are
      sum_g p * 2 * (m - g*b) * (n - g*p*b) * b  ->  2 n^3 / (3 p)
    as ngrp = n/(p*b) grows — 2x the symmetric-half minimum n^3/(3p)
    (rectangular matmuls compute both triangles), vs 6x for the one-level
    full-width masked schedule. Comm is the per-panel all_gather of the
    (ma, b) panel shard: Theta(n^2) bytes per device over ICI, independent
    of p. Choose block_size <= n/(4p) to sit within ~35% of the 2x bound.
    """
    b = n // p if block_size is None else int(block_size)
    nb = n // b
    ngrp = nb // p
    m = n // p
    flops_update = 0
    comm_bytes = 0
    for g in range(ngrp):
        ma = m - g * b
        na = n - g * p * b
        flops_update += p * 2 * ma * na * b            # p panels per group
        comm_bytes += p * (p - 1) * ma * b * itemsize  # all_gather receive
    # redundant diagonal factor (every device) + own row-panel solve
    flops_panel = nb * (b ** 3 // 3 + 2 * m * b * b)
    return {
        "flops_per_device": flops_update + flops_panel,
        "comm_bytes_per_device": comm_bytes,
        "flops_minimal_per_device": n ** 3 / (3 * p),
    }


def distributed_cholesky(k_mat, mesh: Mesh, axis_name: str = "data",
                         block_size=None):
    """Cholesky of a row-sharded SPD matrix; returns L with the same sharding.

    With block_size=None the rows are plain contiguous blocks (one panel per
    device). With block_size=b < n/p the input must be in block-cyclic
    storage layout (rows permuted by `cyclic_storage_order(n, b, p)`,
    columns in elimination order) and L is returned in that same layout.
    """
    n = k_mat.shape[0]
    p = mesh.devices.size
    b, nb, m = _layout(n, p, block_size)
    fn = shard_map(
        partial(_chol_local, axis_name=axis_name, p=p, b=b, nb=nb, m=m),
        mesh=mesh, in_specs=P(axis_name, None), out_specs=P(axis_name, None),
    )
    return fn(k_mat)


def _fwd_local(l_loc, b_loc, axis_name, p, b, nb, m):
    d = lax.axis_index(axis_name)
    my_blk = _my_elim_blocks(d, m, b, p)[:, None]
    r = b_loc.shape[1]

    def body(kb, carry):
        b_loc, x_loc = carry
        owner = kb % p
        slot = (kb // p) * b
        lkk_cand = lax.dynamic_slice(l_loc, (slot, kb * b), (b, b))
        yk_cand = lax.dynamic_slice(b_loc, (slot, 0), (b, r))
        lkk = lax.psum(
            jnp.where(d == owner, lkk_cand, jnp.zeros_like(lkk_cand)),
            axis_name)
        yk = lax.psum(
            jnp.where(d == owner, yk_cand, jnp.zeros_like(yk_cand)),
            axis_name)
        xk = lax.linalg.triangular_solve(lkk, yk, left_side=True, lower=True)
        xk_at_slot = lax.dynamic_update_slice(
            jnp.zeros_like(b_loc), xk, (slot, 0))
        x_loc = jnp.where(my_blk == kb, xk_at_slot, x_loc)
        # Rows below panel kb subtract L_{:,kb} x_k from their rhs.
        lk_mine = lax.dynamic_slice(l_loc, (0, kb * b), (m, b))
        upd = lax.dot_general(lk_mine, xk,
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              precision=_HI)
        b_loc = jnp.where(my_blk > kb, b_loc - upd, b_loc)
        return b_loc, x_loc

    _, x_loc = lax.fori_loop(0, nb, body, (b_loc, jnp.zeros_like(b_loc)))
    return x_loc


def _bwd_local(l_loc, b_loc, axis_name, p, b, nb, m):
    d = lax.axis_index(axis_name)
    my_blk = _my_elim_blocks(d, m, b, p)[:, None]
    nbl = m // b
    n = nb * b
    r = b_loc.shape[1]

    def body(i, carry):
        b_loc, x_loc = carry
        kb = nb - 1 - i
        owner = kb % p
        slot = (kb // p) * b
        # Owner broadcasts its full row-panel L[kb-block, :] (b, n).
        rowpan_cand = lax.dynamic_slice(l_loc, (slot, 0), (b, n))
        rowpan = lax.psum(
            jnp.where(d == owner, rowpan_cand, jnp.zeros_like(rowpan_cand)),
            axis_name)
        yk_cand = lax.dynamic_slice(b_loc, (slot, 0), (b, r))
        yk = lax.psum(
            jnp.where(d == owner, yk_cand, jnp.zeros_like(yk_cand)),
            axis_name)
        lkk = lax.dynamic_slice(rowpan, (0, kb * b), (b, b))
        xk = lax.linalg.triangular_solve(
            lkk, yk, left_side=True, lower=True, transpose_a=True)
        xk_at_slot = lax.dynamic_update_slice(
            jnp.zeros_like(b_loc), xk, (slot, 0))
        x_loc = jnp.where(my_blk == kb, xk_at_slot, x_loc)
        # Residual update for elimination rows above kb:
        # y_e -= L[kb, e]^T x_k. Select the columns of rowpan that live on
        # this device (its elimination blocks d, d+p, ...) in local order.
        sel = (rowpan.reshape(b, nbl, p, b))
        sel = lax.dynamic_index_in_dim(sel, d, axis=2, keepdims=False)
        sel = sel.reshape(b, m)                              # cols = my rows
        upd = lax.dot_general(sel, xk,
                              dimension_numbers=(((0,), (0,)), ((), ())),
                              precision=_HI)                 # (m, r)
        b_loc = jnp.where(my_blk < kb, b_loc - upd, b_loc)
        return b_loc, x_loc

    _, x_loc = lax.fori_loop(0, nb, body, (b_loc, jnp.zeros_like(b_loc)))
    return x_loc


def _solve(kernel, l_mat, rhs, mesh, axis_name, block_size):
    n = l_mat.shape[0]
    p = mesh.devices.size
    b, nb, m = _layout(n, p, block_size)
    fn = shard_map(
        partial(kernel, axis_name=axis_name, p=p, b=b, nb=nb, m=m),
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None)),
        out_specs=P(axis_name, None),
    )
    return fn(l_mat, rhs)


def distributed_tri_solve_lower(l_mat, b, mesh: Mesh, axis_name: str = "data",
                                block_size=None):
    """Solve L x = b with L and b row-sharded (same storage layout); x is
    returned row-sharded in that layout."""
    return _solve(_fwd_local, l_mat, b, mesh, axis_name, block_size)


def distributed_tri_solve_lower_t(l_mat, b, mesh: Mesh,
                                  axis_name: str = "data", block_size=None):
    """Solve L^T x = b (backward substitution) with everything row-sharded."""
    return _solve(_bwd_local, l_mat, b, mesh, axis_name, block_size)


def distributed_cho_solve(l_mat, b, mesh: Mesh, axis_name: str = "data",
                          block_size=None):
    """(L L^T)^{-1} b via forward then backward substitution, fully sharded."""
    y = distributed_tri_solve_lower(l_mat, b, mesh, axis_name, block_size)
    return distributed_tri_solve_lower_t(l_mat, y, mesh, axis_name, block_size)
