"""Feasibility probe for emulated-fp64 matmul on TPU (Ozaki bf16 slicing).

Checks, in order:
  1. 3 bf16 slices decompose an fp32 exactly (reconstruction == original).
  2. A k=256 bf16 x bf16 -> fp32 dot of 8-bit-significand values is EXACT
     (the MXU accumulates slice products without rounding).
  3. Full sliced matmul (6 slices from a double-float operand, pair cutoff,
     k-chunked at 256) reaches ~2^-45 relative accuracy vs numpy fp64.
  4. Wall-clock vs fp32 HIGHEST at (2048, 2048, 2048).

Run on CPU first (JAX_PLATFORMS=cpu), then on the chip.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def slices_from_fp32(x, num=3):
    """Exact bf16 slice decomposition of an fp32 array."""
    out = []
    r = x
    for _ in range(num):
        s = r.astype(jnp.bfloat16)
        out.append(s)
        r = r - s.astype(jnp.float32)
    return out, r


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0].platform
    print("platform:", dev)

    # --- 1. slice exactness
    x = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32))
    sl, resid = slices_from_fp32(x, 3)
    rec = sum(np.asarray(s, np.float64) for s in sl)
    err = np.abs(rec - np.asarray(x, np.float64)).max()
    print("slice3 reconstruction max abs err:", err)

    # --- 2. k=256 bf16 dot exactness
    a = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    a0 = a.astype(jnp.bfloat16)
    b0 = b.astype(jnp.bfloat16)
    got = jax.lax.dot_general(a0, b0, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    want = np.asarray(a0, np.float64) @ np.asarray(b0, np.float64)
    exact = float(np.abs(np.asarray(got, np.float64) - want).max())
    print("k=256 bf16 dot max abs err vs fp64 (0.0 = exact):", exact)

    # --- 3. sliced matmul accuracy, fp32 inputs, 3x3 slices, cutoff 4
    m = k = n = 1024
    af = rng.standard_normal((m, k)).astype(np.float32)
    bf = rng.standard_normal((k, n)).astype(np.float32)
    want64 = np.asarray(af, np.float64) @ np.asarray(bf, np.float64)

    @jax.jit
    def ozaki(a, b):
        sa, _ = slices_from_fp32(a, 3)
        sb, _ = slices_from_fp32(b, 3)
        kc = a.shape[1] // 256
        # chunked: (kc, m, 256) x (kc, 256, n) -> (kc, m, n), batch over kc
        def pair(i, j):
            aa = sa[i].reshape(m, kc, 256).transpose(1, 0, 2)
            bb = sb[j].reshape(kc, 256, n)
            p = jax.lax.dot_general(
                aa, bb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return p  # (kc, m, n) exact partials
        # accumulate smallest scale first, plain fp32 for the tail pairs,
        # two-sum cascade for the (0,*) / (*,0) big ones
        acc_hi = jnp.zeros((m, n), jnp.float32)
        acc_lo = jnp.zeros((m, n), jnp.float32)
        pairs = sorted(((i, j) for i in range(3) for j in range(3)
                        if i + j <= 4), key=lambda ij: -(ij[0] + ij[1]))
        for (i, j) in pairs:
            p = pair(i, j)
            for c in range(kc):
                # two_sum(acc_hi, p[c])
                s = acc_hi + p[c]
                bb = s - acc_hi
                e = (acc_hi - (s - bb)) + (p[c] - bb)
                acc_hi = s
                acc_lo = acc_lo + e
        # renormalize
        s = acc_hi + acc_lo
        e = acc_lo - (s - acc_hi)
        return s, e

    hi, lo = ozaki(jnp.asarray(af), jnp.asarray(bf))
    got64 = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    rel = np.abs(got64 - want64).max() / np.abs(want64).max()
    print(f"ozaki 3x3 cutoff-4 rel err vs fp64: {rel:.3e}")

    h32 = jnp.asarray(af) @ jnp.asarray(bf)
    rel32 = np.abs(np.asarray(h32, np.float64) - want64).max() / \
        np.abs(want64).max()
    with jax.default_matmul_precision("highest"):
        hH = jax.jit(lambda a, b: a @ b)(jnp.asarray(af), jnp.asarray(bf))
    relH = np.abs(np.asarray(hH, np.float64) - want64).max() / \
        np.abs(want64).max()
    print(f"fp32 default rel err: {rel32:.3e}   HIGHEST rel err: {relH:.3e}")

    # --- 4. timing at 2048^3
    m2 = 2048
    a2 = jnp.asarray(rng.standard_normal((m2, m2)).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal((m2, m2)).astype(np.float32))

    @jax.jit
    def oz2(a, b):
        sa, _ = slices_from_fp32(a, 3)
        sb, _ = slices_from_fp32(b, 3)
        kc = m2 // 256
        acc_hi = jnp.zeros((m2, m2), jnp.float32)
        acc_lo = jnp.zeros((m2, m2), jnp.float32)
        pairs = sorted(((i, j) for i in range(3) for j in range(3)
                        if i + j <= 4), key=lambda ij: -(ij[0] + ij[1]))
        for (i, j) in pairs:
            aa = sa[i].reshape(m2, kc, 256).transpose(1, 0, 2)
            bb = sb[j].reshape(kc, 256, m2)
            p = jax.lax.dot_general(
                aa, bb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            for c in range(kc):
                s = acc_hi + p[c]
                bb2 = s - acc_hi
                e = (acc_hi - (s - bb2)) + (p[c] - bb2)
                acc_hi = s
                acc_lo = acc_lo + e
        return acc_hi, acc_lo

    @jax.jit
    def mmH(a, b):
        with jax.default_matmul_precision("highest"):
            return a @ b

    from nngp_tpu.utils.timing import sync
    sync(oz2(a2, b2)[0]); sync(mmH(a2, b2))
    t0 = time.time(); sync(oz2(a2, b2)[0]); t_oz = time.time() - t0
    t0 = time.time(); sync(mmH(a2, b2)); t_hi = time.time() - t0
    print(f"2048^3: ozaki {t_oz*1e3:.1f} ms   fp32-HIGHEST {t_hi*1e3:.1f} ms")


if __name__ == "__main__":
    main()
