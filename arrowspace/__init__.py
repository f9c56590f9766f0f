"""Drop-in alias for the reference's `arrowspace` Python package.

The reference is imported as `from arrowspace import ArrowSpaceBuilder`
(reference README.md:33-40); this alias lets existing user code switch to
the TPU-native engine without edits.  Everything re-exports from
`pyarrowspace_tpu`.
"""

from pyarrowspace_tpu import (ArrowItem, ArrowSpace, ArrowSpaceBuilder,
                              BuildConfig, EnergyParams, GraphLaplacian,
                              GraphParams, TauMode, get_phase_timings,
                              parse_energy_params, parse_graph_params,
                              set_debug, __version__)

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
