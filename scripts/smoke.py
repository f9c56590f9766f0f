"""Dev smoke: README example + test_0 matrix through the full pipeline."""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
from pyarrowspace_tpu import ArrowSpaceBuilder, set_debug

set_debug(True)
items = np.array([[0.1, 0.2, 0.3], [0.0, 0.5, 0.1], [0.9, 0.1, 0.0]],
                 dtype=np.float64)
gp = {"eps": 1.0, "k": 6, "topk": 3, "p": 2.0, "sigma": 1.0}
aspace, gl = ArrowSpaceBuilder.build(gp, items)
print("nnodes", gl.nnodes, "shape", gl.shape(), "params", gl.graph_params)
print("lambdas", aspace.lambdas())
print("tau_star", aspace.tau_star)
q = np.array([0.05, 0.2, 0.25], dtype=np.float64)
print("hits tau=1.0:", aspace.search(q, gl, 1.0))
print("L dense:\n", gl.to_dense())
print("row sums:", gl.to_dense().sum(axis=1))
