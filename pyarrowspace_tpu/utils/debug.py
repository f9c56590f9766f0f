"""Process-global debug tracing.

TPU-native equivalent of the reference binding's debug facility
(reference: src/helpers.rs:8-21 — `set_debug` flips a process-global
AtomicBool and `dbg_println` gates `[pyarrowspace] ...` stderr lines).

We keep the exact user-facing contract — ``set_debug(bool)`` toggles
``[pyarrowspace] ...`` lines on stderr — and add a structured phase timer
used by the build/search pipelines (the reference keeps wall-clock timing
in its test harness; here it is a first-class subsystem).
"""

from __future__ import annotations

import contextlib
import sys
import time
import threading

_DEBUG = threading.Event()

# Most recent phase timings, keyed by phase name (seconds).  Readable via
# `get_phase_timings()`; reset per top-level build call.
_PHASE_TIMINGS: dict[str, float] = {}


def set_debug(enabled: bool) -> None:
    """Enable/disable `[pyarrowspace] ...` debug lines on stderr.

    Parity with reference src/helpers.rs:12-15 (`set_debug` pyfunction).
    """
    if enabled:
        _DEBUG.set()
    else:
        _DEBUG.clear()


def debug_enabled() -> bool:
    return _DEBUG.is_set()


def dbg_println(msg: str) -> None:
    """Print a debug line when debug is enabled.

    Parity with reference src/helpers.rs:17-21 (`dbg_println`).
    """
    if _DEBUG.is_set():
        print(f"[pyarrowspace] {msg}", file=sys.stderr, flush=True)


@contextlib.contextmanager
def phase(name: str):
    """Time a named pipeline phase; records into the phase-timing table,
    emits a debug line, and annotates the XLA profiler trace (two-level
    tracing design per SURVEY.md §5 + jax.profiler hooks)."""
    t0 = time.perf_counter()
    dbg_println(f"phase:{name} start")
    try:
        import jax
        ctx = jax.profiler.TraceAnnotation(f"arrowspace:{name}")
    except Exception:  # pragma: no cover - profiler unavailable
        ctx = contextlib.nullcontext()
    try:
        with ctx:
            yield
    finally:
        dt = time.perf_counter() - t0
        _PHASE_TIMINGS[name] = dt
        dbg_println(f"phase:{name} done in {dt:.3f}s")


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a full XLA profiler trace around a build/search region
    (viewable in TensorBoard/XProf).  Also reachable via the env var
    ARROWSPACE_PROFILE=<dir> on ArrowSpaceBuilder.build."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def reset_phase_timings() -> None:
    _PHASE_TIMINGS.clear()


def get_phase_timings() -> dict[str, float]:
    """Most recent per-phase wall-clock timings (seconds)."""
    return dict(_PHASE_TIMINGS)
