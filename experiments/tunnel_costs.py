"""Micro-costs of host<->device interactions through the axon tunnel:
what does a streaming batch actually pay per stage?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

def t(label, fn, reps=5):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    print(f"{label:42s} min={min(ts)*1e3:7.1f}ms med={sorted(ts)[len(ts)//2]*1e3:7.1f}ms")

rng = np.random.default_rng(0)
xb = rng.uniform(0, 1000, (4096, 20)).astype(np.float32)
xd = jnp.asarray(xb)

f = jax.jit(lambda x: (x @ x.T).sum(axis=1))
r = f(xd); _ = np.asarray(r)

t("H2D jnp.asarray 4096x20", lambda: jax.device_put(xb))
t("jit dispatch only (no fetch)", lambda: f(xd))
t("jit dispatch + fetch 4096 fp32", lambda: np.asarray(f(xd)))
big = f(xd)
t("fetch only np.asarray(4096)", lambda: np.asarray(big))
ev = jnp.ones(4096)
ev2 = ev.ravel()
t("eager ravel (warm)", lambda: ev.ravel())
t("eager slice [:1800] (warm)", lambda: ev[:1800])
t("eager ravel+slice+fetch", lambda: np.asarray(ev.ravel()[:1800]))
t("two fetches (mean+std)", lambda: (np.asarray(big), np.asarray(big)))
# dispatch-then-fetch-later (pipelining value): dispatch 2, fetch 2
def pipelined():
    a = f(xd); b = f(xd)
    np.asarray(a); np.asarray(b)
t("2x dispatch then 2x fetch", pipelined)
def serial():
    np.asarray(f(xd)); np.asarray(f(xd))
t("2x (dispatch+fetch) serial", serial)
