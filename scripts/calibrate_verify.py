"""Verify the calibrated feature-Laplacian design before locking it in.

Winning family from grid3: Euclidean column distances, k_F = topk (=3),
sigma ~ O(data scale), mix a ~ 0.25.  This script checks:
  1. adaptive sigma_F = median of kept k-NN edge distances reproduces 4/4,
  2. the viable mix-weight window around 0.25,
  3. scale equivariance (items * 100, * 0.01),
  4. README example still produces nonzero lambdas + exact tau=1.0 scores,
  5. what tau* is (to see if a natural mapping gives the mix weight).
"""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from pyarrowspace_tpu.ops.distance import unit_normalize
from pyarrowspace_tpu.ops.rayleigh import rayleigh_batch, dispersion_batch

items0 = np.array([
[0.82,0.11,0.43,0.28,0.64,0.32,0.55,0.48,0.19,0.73,0.07,0.36,0.58,0.23,0.44,0.31,0.52,0.16,0.61,0.40,0.27,0.49,0.35,0.29],
[0.79,0.12,0.45,0.29,0.61,0.33,0.54,0.47,0.21,0.70,0.08,0.37,0.56,0.22,0.46,0.30,0.51,0.18,0.60,0.39,0.26,0.48,0.36,0.30],
[0.78,0.13,0.46,0.27,0.62,0.34,0.53,0.46,0.22,0.69,0.09,0.35,0.55,0.24,0.45,0.29,0.50,0.17,0.59,0.38,0.28,0.47,0.34,0.31],
[0.81,0.10,0.44,0.26,0.63,0.31,0.56,0.45,0.20,0.71,0.06,0.34,0.57,0.25,0.47,0.33,0.53,0.15,0.62,0.41,0.25,0.50,0.37,0.27],
[0.80,0.12,0.42,0.25,0.60,0.35,0.52,0.49,0.23,0.68,0.10,0.38,0.54,0.21,0.43,0.28,0.49,0.19,0.58,0.37,0.29,0.46,0.33,0.32]],
dtype=np.float64)
expected = {1.0: [2, 1, 4], 0.9: [1, 2, 0], 0.6: [1, 3, 2], 0.55: [1, 3, 2]}


def build_feature_lap_eucl(stored, k_f, p=2.0, sigma_mult=1.0):
    cols = stored.T
    sq = (cols**2).sum(1)
    d = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2 * cols @ cols.T, 0))
    np.fill_diagonal(d, np.inf)
    F = d.shape[0]
    kk = min(k_f, F - 1)
    mask = np.zeros_like(d, dtype=bool)
    for r in range(F):
        mask[r, np.argsort(d[r])[:kk]] = True
    mask |= mask.T
    kept = d[mask]
    sigma = np.median(kept) * sigma_mult if kept.size else 1.0
    w = np.where(mask, 1.0 / (1.0 + (d / sigma) ** p), 0.0)
    np.fill_diagonal(w, 0.0)
    return w, np.diag(w.sum(1)) - w, sigma


def lambdas_for(stored, query, k_f, a, sigma_mult=1.0):
    w_f, lap_f, sigma = build_feature_lap_eucl(stored, k_f,
                                               sigma_mult=sigma_mult)
    wj, lj = jnp.asarray(w_f), jnp.asarray(lap_f)
    X, Q = jnp.asarray(stored), jnp.asarray(query).reshape(1, -1)
    e_i = np.asarray(rayleigh_batch(X, lj, normalized=False))
    e_q = np.asarray(rayleigh_batch(Q, lj, normalized=False))
    g_i = np.asarray(dispersion_batch(X, wj, jnp.asarray(e_i)))
    g_q = np.asarray(dispersion_batch(Q, wj, jnp.asarray(e_q)))
    ts = float(np.median(e_i))
    eb_i, eb_q = e_i / (e_i + ts), e_q / (e_q + ts)
    return (a * eb_i + (1 - a) * g_i, (a * eb_q + (1 - a) * g_q)[0],
            ts, sigma, e_i, g_i)


def check(items, scale, a, sigma_mult=1.0, verbose=False):
    X = items * scale
    q = X[2] * 1.05
    Xu = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = Xu @ (q / np.linalg.norm(q))
    li, lq, ts, sigma, e_i, g_i = lambdas_for(X, q, 3, a, sigma_mult)
    n_ok = 0
    for tau in expected:
        prox = 1.0 / (1.0 + np.abs(li - lq))
        sc = tau * cos + (1 - tau) * prox
        got = list(map(int, np.argsort(-sc)[:3]))
        n_ok += got == expected[tau]
    if verbose:
        print(f"  ts={ts:.4f} ts/(1+ts)={ts/(1+ts):.4f} sigma={sigma:.4f} "
              f"lam={np.round(li,5)} lam_q={lq:.5f}")
    return n_ok


print("== mix-weight window (adaptive sigma, scale 1) ==")
for a in np.linspace(0.05, 0.6, 23):
    n = check(items0, 1.0, a)
    if n >= 3:
        print(f"a={a:.3f}: {n}/4")

print("== details at a=0.25 ==")
check(items0, 1.0, 0.25, verbose=True)

print("== scale equivariance at a=0.25 ==")
for s in [0.01, 0.1, 1.0, 12.0, 100.0]:
    print(f"scale={s}: {check(items0, s, 0.25)}/4")

print("== sigma_mult sensitivity at a=0.25 ==")
for m in [0.5, 0.75, 1.0, 1.5, 2.0]:
    print(f"sigma_mult={m}: {check(items0, 1.0, 0.25, m)}/4")

print("== README example ==")
ritems = np.array([[0.1, 0.2, 0.3], [0.0, 0.5, 0.1], [0.9, 0.1, 0.0]])
rq = np.array([0.05, 0.2, 0.25])
li, lq, ts, sigma, e_i, g_i = lambdas_for(ritems, rq, 3, 0.25)
print("lambdas:", np.round(li, 6), "lam_q:", round(lq, 6), "ts:", ts)
xu = ritems / np.linalg.norm(ritems, axis=1, keepdims=True)
cos = xu @ (rq / np.linalg.norm(rq))
print("tau=1.0 scores:", np.round(np.sort(cos)[::-1], 9))
