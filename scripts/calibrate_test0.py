"""Calibration harness for test_0 ordering parity.

Reference tests/test_0.py pins exact result orderings for tau in
{1.0, 0.9, 0.6, 0.55} on a 5x24 matrix with query = items[2] * 1.05:
  tau=1.00 -> [2, 1, 4]
  tau=0.90 -> [1, 2, 0]
  tau=0.60 -> [1, 3, 2]
  tau=0.55 -> [1, 3, 2]
This script reports our orderings (and diagnostics) under the current
pipeline so design knobs can be tuned.
"""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
from pyarrowspace_tpu import ArrowSpaceBuilder

items = np.array([
[0.82,0.11,0.43,0.28,0.64,0.32,0.55,0.48,0.19,0.73,0.07,0.36,0.58,0.23,0.44,0.31,0.52,0.16,0.61,0.40,0.27,0.49,0.35,0.29],
[0.79,0.12,0.45,0.29,0.61,0.33,0.54,0.47,0.21,0.70,0.08,0.37,0.56,0.22,0.46,0.30,0.51,0.18,0.60,0.39,0.26,0.48,0.36,0.30],
[0.78,0.13,0.46,0.27,0.62,0.34,0.53,0.46,0.22,0.69,0.09,0.35,0.55,0.24,0.45,0.29,0.50,0.17,0.59,0.38,0.28,0.47,0.34,0.31],
[0.81,0.10,0.44,0.26,0.63,0.31,0.56,0.45,0.20,0.71,0.06,0.34,0.57,0.25,0.47,0.33,0.53,0.15,0.62,0.41,0.25,0.50,0.37,0.27],
[0.80,0.12,0.42,0.25,0.60,0.35,0.52,0.49,0.23,0.68,0.10,0.38,0.54,0.21,0.43,0.28,0.49,0.19,0.58,0.37,0.29,0.46,0.33,0.32]],
dtype=np.float64)

graph_params = {"eps": 0.05, "k": len(items), "topk": 3, "p": 2.0,
                "sigma": 0.05}
expected = {1.0: [2, 1, 4], 0.9: [1, 2, 0], 0.6: [1, 3, 2], 0.55: [1, 3, 2]}

aspace, gl = ArrowSpaceBuilder.build(graph_params, items)
lams = aspace.lambdas()
print("lambdas:", np.array2string(lams, precision=6))
print("tau_star:", aspace.tau_star)

q = np.array(items[2] * 1.05, dtype=np.float64)
lam_q = aspace.prepare_query_item(q, gl)
print("lambda_q:", lam_q)

xu = items / np.linalg.norm(items, axis=1, keepdims=True)
qu = q / np.linalg.norm(q)
cos = xu @ qu
print("cos:", np.array2string(cos, precision=8))
prox = 1.0 / (1.0 + np.abs(lams - lam_q))
print("prox:", np.array2string(prox, precision=6))

ok_all = True
for tau, exp in expected.items():
    hits = aspace.search(q, gl, tau)
    got = [h[0] for h in hits]
    ok = got == exp
    ok_all &= ok
    print(f"tau={tau}: got={got} expected={exp} {'OK' if ok else 'MISMATCH'}"
          f"  scores={[round(h[1], 6) for h in hits]}")
print("ALL OK" if ok_all else "NEEDS CALIBRATION")
