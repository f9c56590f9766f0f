"""Search the taumode design space for test_0 ordering parity.

Enumerates structural variants of the lambda pipeline (feature-graph policy,
Rayleigh normalization, tau mixing) and reports which reproduce the
reference's four pinned orderings.
"""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import itertools
import numpy as np
import jax.numpy as jnp

from pyarrowspace_tpu.graph.feature import build_feature_laplacian
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
norms = np.linalg.norm(items, axis=1)
print("norms:", np.array2string(norms, precision=6))
print("norms^2 ratio to item2:",
      np.array2string(norms**2 / norms[2]**2, precision=5))

cos = np.asarray(Xu @ unit_normalize(Q[0]))
expected = {1.0: [2, 1, 4], 0.9: [1, 2, 0], 0.6: [1, 3, 2], 0.55: [1, 3, 2]}

eps, k, p, sigma = 0.05, 5, 2.0, 0.05

def orderings(lams, lam_q):
    out = {}
    for tau in expected:
        prox = 1.0 / (1.0 + np.abs(lams - lam_q))
        s = tau * cos + (1 - tau) * prox
        out[tau] = list(np.argsort(-s)[:3])
    return out

results = []
for (feat_eps, feat_src, e_norm, mix) in itertools.product(
        [eps, 2.0],                 # feature graph: eps-filtered vs k-only
        ["unit", "raw"],            # signals: unit rows vs raw rows
        [False, True],              # Rayleigh normalized
        ["taumap", "half", "pure_e", "pure_eraw", "g_only"]):
    signals = Xu if feat_src == "unit" else X
    w_f, lap_f, _ = build_feature_laplacian(
        signals, eps=feat_eps, k=k, p=p, sigma=sigma)
    if float(jnp.sum(w_f)) == 0.0:
        continue
    e_un_i = rayleigh_batch(X, lap_f, normalized=False)
    e_un_q = rayleigh_batch(Q, lap_f, normalized=False)
    e_i = rayleigh_batch(X, lap_f, normalized=True) if e_norm else e_un_i
    e_q = rayleigh_batch(Q, lap_f, normalized=True) if e_norm else e_un_q
    g_i = dispersion_batch(X, w_f, e_un_i)
    g_q = dispersion_batch(Q, w_f, e_un_q)
    tau_star = float(jnp.median(e_i))
    if tau_star <= 0:
        continue
    eb_i = np.asarray(e_i / (e_i + tau_star))
    eb_q = np.asarray(e_q / (e_q + tau_star))
    g_i_n, g_q_n = np.asarray(g_i), np.asarray(g_q)
    if mix == "taumap":
        tm = tau_star / (1 + tau_star)
        lam, lam_q = tm * eb_i + (1 - tm) * g_i_n, tm * eb_q + (1 - tm) * g_q_n
    elif mix == "half":
        lam, lam_q = 0.5 * (eb_i + g_i_n), 0.5 * (eb_q + g_q_n)
    elif mix == "pure_e":
        lam, lam_q = eb_i, eb_q
    elif mix == "pure_eraw":
        lam, lam_q = np.asarray(e_i), np.asarray(e_q)
    else:
        lam, lam_q = g_i_n, g_q_n
    got = orderings(lam, lam_q[0])
    n_ok = sum(got[t] == expected[t] for t in expected)
    results.append((n_ok, feat_eps, feat_src, e_norm, mix, got,
                    np.round(lam, 5), round(float(lam_q[0]), 5)))

results.sort(key=lambda r: -r[0])
for r in results[:12]:
    n_ok, feps, fsrc, enorm, mix, got, lam, lam_q = r
    print(f"ok={n_ok}/4 feat_eps={feps} src={fsrc} e_norm={enorm} "
          f"mix={mix} got={ {t: got[t] for t in got} } lam={lam} lam_q={lam_q}")
