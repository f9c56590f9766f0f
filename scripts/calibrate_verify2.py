"""Verify: unweighted Euclidean k-NN feature graph (binary adjacency)."""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
from pyarrowspace_tpu.ops.rayleigh import rayleigh_batch, dispersion_batch

items0 = np.array([
[0.82,0.11,0.43,0.28,0.64,0.32,0.55,0.48,0.19,0.73,0.07,0.36,0.58,0.23,0.44,0.31,0.52,0.16,0.61,0.40,0.27,0.49,0.35,0.29],
[0.79,0.12,0.45,0.29,0.61,0.33,0.54,0.47,0.21,0.70,0.08,0.37,0.56,0.22,0.46,0.30,0.51,0.18,0.60,0.39,0.26,0.48,0.36,0.30],
[0.78,0.13,0.46,0.27,0.62,0.34,0.53,0.46,0.22,0.69,0.09,0.35,0.55,0.24,0.45,0.29,0.50,0.17,0.59,0.38,0.28,0.47,0.34,0.31],
[0.81,0.10,0.44,0.26,0.63,0.31,0.56,0.45,0.20,0.71,0.06,0.34,0.57,0.25,0.47,0.33,0.53,0.15,0.62,0.41,0.25,0.50,0.37,0.27],
[0.80,0.12,0.42,0.25,0.60,0.35,0.52,0.49,0.23,0.68,0.10,0.38,0.54,0.21,0.43,0.28,0.49,0.19,0.58,0.37,0.29,0.46,0.33,0.32]],
dtype=np.float64)
expected = {1.0: [2, 1, 4], 0.9: [1, 2, 0], 0.6: [1, 3, 2], 0.55: [1, 3, 2]}


def binary_feature_lap(stored, k_f):
    cols = stored.T
    sq = (cols**2).sum(1)
    d = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2 * cols @ cols.T, 0))
    np.fill_diagonal(d, np.inf)
    F = d.shape[0]
    kk = max(1, min(k_f, F - 1))
    mask = np.zeros_like(d, dtype=bool)
    for r in range(F):
        mask[r, np.argsort(d[r])[:kk]] = True
    mask |= mask.T
    w = mask.astype(np.float64)
    return w, np.diag(w.sum(1)) - w


def check(items, scale, a, k_f, return_detail=False):
    X = items * scale
    q = X[2] * 1.05
    Xu = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = Xu @ (q / np.linalg.norm(q))
    w_f, lap_f = binary_feature_lap(X, k_f)
    wj, lj = jnp.asarray(w_f), jnp.asarray(lap_f)
    Xj, Qj = jnp.asarray(X), jnp.asarray(q).reshape(1, -1)
    e_i = np.asarray(rayleigh_batch(Xj, lj, normalized=False))
    e_q = np.asarray(rayleigh_batch(Qj, lj, normalized=False))
    g_i = np.asarray(dispersion_batch(Xj, wj, jnp.asarray(e_i)))
    g_q = np.asarray(dispersion_batch(Qj, wj, jnp.asarray(e_q)))
    ts = float(np.median(e_i))
    li = a * e_i / (e_i + ts) + (1 - a) * g_i
    lq = float(a * e_q / (e_q + ts) + (1 - a) * g_q)
    n_ok = 0
    for tau in expected:
        prox = 1.0 / (1.0 + np.abs(li - lq))
        sc = tau * cos + (1 - tau) * prox
        got = list(map(int, np.argsort(-sc)[:3]))
        n_ok += got == expected[tau]
    if return_detail:
        return n_ok, li, lq, ts
    return n_ok


print("== a window, k_f=3, binary, scale 1 ==")
window = [a for a in np.round(np.linspace(0.02, 0.9, 89), 3)
          if check(items0, 1.0, a, 3) == 4]
print("4/4 window:", window[:3], "...", window[-3:] if window else None,
      f"({len(window)} points)")

if window:
    a_mid = window[len(window) // 2]
    print(f"== scale equivariance at a={a_mid} ==")
    for s in [0.01, 0.1, 1.0, 12.0, 100.0]:
        print(f"scale={s}: {check(items0, s, a_mid, 3)}/4")
    n, li, lq, ts = check(items0, 1.0, a_mid, 3, True)
    print(f"detail: lam={np.round(li,5)} lam_q={lq:.5f} ts={ts:.4f} "
          f"ts/(1+ts)={ts/(1+ts):.4f}")

print("== k_f sensitivity at best a ==")
for kf in [2, 3, 4, 5, 6]:
    ws = [a for a in np.round(np.linspace(0.02, 0.9, 89), 3)
          if check(items0, 1.0, a, kf) == 4]
    print(f"k_f={kf}: 4/4 a-window size {len(ws)}"
          + (f" [{ws[0]}..{ws[-1]}]" if ws else ""))
