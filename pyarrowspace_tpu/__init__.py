"""arrowspace-tpu: TPU-native spectral similarity-search framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
tuned-org-uk/pyarrowspace (Python bindings over the closed-source Rust
`arrowspace` 0.18 engine).  Public API parity with the reference's
`arrowspace` Python module (reference src/lib.rs:379-386):

    ArrowSpaceBuilder.build / build_energy
    ArrowSpace.{nitems, nfeatures, get_item, lambdas, search,
                search_hybrid, search_energy}
    GraphLaplacian.{nnodes, shape, graph_params}
    set_debug

plus TPU-native extras: batched search, sharded multi-chip build/search,
index persistence, and explicit engine knobs (TauMode, BuildConfig).
"""

from .builder import ArrowSpaceBuilder
from .core.laplacian import GraphLaplacian
from .core.params import (EnergyParams, GraphParams, TauMode,
                          parse_energy_params, parse_graph_params)
from .core.space import ArrowItem, ArrowSpace
from .graph.build import BuildConfig
from .utils.debug import get_phase_timings, set_debug

__version__ = "0.1.0"

__all__ = [
    "ArrowSpaceBuilder",
    "ArrowSpace",
    "ArrowItem",
    "GraphLaplacian",
    "GraphParams",
    "EnergyParams",
    "TauMode",
    "BuildConfig",
    "set_debug",
    "get_phase_timings",
    "parse_graph_params",
    "parse_energy_params",
    "__version__",
]
