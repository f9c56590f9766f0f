"""Round-3 calibration: continuous mix-weight scan per graph variant."""
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

items = np.array([
[0.82,0.11,0.43,0.28,0.64,0.32,0.55,0.48,0.19,0.73,0.07,0.36,0.58,0.23,0.44,0.31,0.52,0.16,0.61,0.40,0.27,0.49,0.35,0.29],
[0.79,0.12,0.45,0.29,0.61,0.33,0.54,0.47,0.21,0.70,0.08,0.37,0.56,0.22,0.46,0.30,0.51,0.18,0.60,0.39,0.26,0.48,0.36,0.30],
[0.78,0.13,0.46,0.27,0.62,0.34,0.53,0.46,0.22,0.69,0.09,0.35,0.55,0.24,0.45,0.29,0.50,0.17,0.59,0.38,0.28,0.47,0.34,0.31],
[0.81,0.10,0.44,0.26,0.63,0.31,0.56,0.45,0.20,0.71,0.06,0.34,0.57,0.25,0.47,0.33,0.53,0.15,0.62,0.41,0.25,0.50,0.37,0.27],
[0.80,0.12,0.42,0.25,0.60,0.35,0.52,0.49,0.23,0.68,0.10,0.38,0.54,0.21,0.43,0.28,0.49,0.19,0.58,0.37,0.29,0.46,0.33,0.32]],
dtype=np.float64)
q = items[2] * 1.05
X = jnp.asarray(items)
Q = jnp.asarray(q).reshape(1, -1)
Xu = unit_normalize(X)
cos = np.asarray(Xu @ unit_normalize(Q[0]))
expected = {1.0: [2, 1, 4], 0.9: [1, 2, 0], 0.6: [1, 3, 2], 0.55: [1, 3, 2]}
p_exp = 2.0


def knn_mask(d, k):
    dd = np.array(d, copy=True)
    np.fill_diagonal(dd, np.inf)
    mask = np.zeros_like(dd, dtype=bool)
    for r in range(dd.shape[0]):
        mask[r, np.argsort(dd[r])[:k]] = True
    return mask


def lap_from_d(d, k, sig, pp=2.0):
    mask = knn_mask(d, k)
    mask |= mask.T
    np.fill_diagonal(mask, False)
    w = np.where(mask, 1.0 / (1.0 + (np.maximum(d, 0) / sig) ** pp), 0.0)
    return w, np.diag(w.sum(1)) - w


def check_full(li, lq):
    n_ok, got = 0, {}
    for tau in expected:
        prox = 1.0 / (1.0 + np.abs(li - lq))
        sc = tau * cos + (1 - tau) * prox
        got[tau] = list(map(int, np.argsort(-sc)[:3]))
        n_ok += got[tau] == expected[tau]
    return n_ok, got


cols_raw = np.asarray(X).T
cols_unit = cols_raw / np.linalg.norm(cols_raw, axis=1, keepdims=True)
d_cos = 1.0 - np.maximum(cols_unit @ cols_unit.T, 0)
d_eur = np.sqrt(np.maximum((cols_raw**2).sum(1)[:, None]
                + (cols_raw**2).sum(1)[None, :] - 2 * cols_raw @ cols_raw.T, 0))

results = []
for dname, d in [("cos", d_cos), ("eucl", d_eur)]:
    for k in range(2, 16):
        for sig in [0.01, 0.025, 0.05, 0.1, 0.2, 0.5, 1.0, 2.0]:
            for pp in [1.0, 2.0, 3.0]:
                w_f, lap_f = lap_from_d(d, k, sig, pp)
                if w_f.sum() == 0:
                    continue
                wj, lj = jnp.asarray(w_f), jnp.asarray(lap_f)
                e_i = np.asarray(rayleigh_batch(X, lj, normalized=False))
                e_q = np.asarray(rayleigh_batch(Q, lj, normalized=False))
                g_i = np.asarray(dispersion_batch(X, wj, jnp.asarray(e_i)))
                g_q = np.asarray(dispersion_batch(Q, wj, jnp.asarray(e_q)))
                ts = float(np.median(e_i))
                if ts <= 0:
                    continue
                eb_i, eb_q = e_i / (e_i + ts), e_q / (e_q + ts)
                for a in np.linspace(0.0, 1.0, 41):
                    li = a * eb_i + (1 - a) * g_i
                    lq = a * eb_q + (1 - a) * g_q
                    n_ok, got = check_full(li, lq[0])
                    if n_ok >= 3:
                        results.append((n_ok, dname, k, sig, pp, round(a, 3),
                                        got, np.round(li, 5),
                                        round(float(lq[0]), 5), round(ts, 4)))

results.sort(key=lambda r: -r[0])
seen = set()
for r in results[:30]:
    key = (r[0], r[1], r[2], r[3], r[4])
    print(r[:7])
print("total hits>=3:", len(results),
      "; 4/4:", sum(1 for r in results if r[0] == 4))
