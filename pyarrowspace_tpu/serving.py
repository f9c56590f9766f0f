"""Pipelined certified serving for batch streams.

`search_batch(mode="certified")` is synchronous per call: it dispatches
the certified scan, PULLS the per-query certificate flags to the host
(the only way to decide widening/escalation), and only then can the
caller submit the next batch.  On a tunneled runtime that serializes a
~100 ms dispatch round trip into every batch — the measured gap between
ivf_block's pipelined 265k QPS and certified's 70k QPS at 1M x 768 is
mostly that serialization, not certificate compute.

`CertifiedStream` overlaps the certificate sync with device work: it
keeps up to `depth` certify dispatches in flight, so while batch i's
certificate flags cross the tunnel, batches i+1..i+depth-1 are already
executing.  Widening and exact escalation (rare at healthy cert rates)
are the only work left on the critical path.

It also carries the production guardrail for certificate collapse: the
certification rate is data/seed dependent (a bad clustering or an
out-of-distribution query mix can refuse every batch), and paying
bound-ordered widening on every batch collapses throughput ~15x worse
than just serving the exact scan.  The stream tracks a rolling base
certification rate and, when it stays under `cert_floor` for
`floor_patience` consecutive batches, PERMANENTLY reroutes later
batches to the exact fallback path (`fallback` dispatch, e.g. the
subtile scan) — results stay exact (certified serving's contract is
f32-exact everywhere), worst case degrades to the exact scan's
throughput instead of the widening cliff.

No counterpart exists in the reference (its serving loop is a
synchronous Rust call per query batch, reference src/lib.rs:281-323);
this is TPU-native plumbing for the tunneled/async dispatch model.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Optional

import numpy as np

from .utils.logging import get_logger

_log = get_logger("serving")


class CertifiedStream:
    """Bounded-depth software pipeline over certified search dispatches.

    Parameters
    ----------
    dispatch : (queries) -> out
        Asynchronously dispatch the certified search for one batch and
        return the (device-resident) outputs; must NOT block on results.
    finalize : (queries, out) -> (idx, vals, base_cert_rate)
        Pull the certificate, widen/escalate refusals, and return final
        exact results plus the BASE certification rate (before widening)
        used by the guardrail.
    fallback : (queries) -> fut, finalize_fallback : (queries, fut) -> (idx, vals)
        Exact serving path used after certificate collapse; `fallback`
        dispatches asynchronously, `finalize_fallback` blocks.  When not
        given, the stream keeps certifying (no degradation).
    depth : int
        Max batches in flight (pipeline depth).  depth=1 reproduces the
        synchronous per-batch behavior.
    cert_floor / floor_patience
        Degrade to the fallback path once the base certification rate
        sits below `cert_floor` for `floor_patience` consecutive batches.
    on_collapse : () -> bool, optional
        Escalation rung tried BEFORE degrading: called when the floor
        patience runs out; returning True means the caller changed the
        certified dispatch (e.g. doubled n_probe) — the streak resets
        and the stream keeps certifying.  Returning False falls through
        to the fallback degradation.  Batch indices where an escalation
        fired are recorded in `escalated_at`.
    """

    def __init__(self, dispatch: Callable, finalize: Callable,
                 fallback: Optional[Callable] = None,
                 finalize_fallback: Optional[Callable] = None,
                 depth: int = 4, cert_floor: float = 0.35,
                 floor_patience: int = 2,
                 on_collapse: Optional[Callable] = None):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        if (fallback is None) != (finalize_fallback is None):
            raise ValueError("fallback and finalize_fallback must be "
                             "given together")
        self._dispatch = dispatch
        self._finalize = finalize
        self._fallback = fallback
        self._finalize_fallback = finalize_fallback
        self._depth = int(depth)
        self._cert_floor = float(cert_floor)
        self._floor_patience = int(floor_patience)
        self._on_collapse = on_collapse
        self._inflight: deque = deque()
        self._results: list = []
        self._low_streak = 0
        self.degraded_at: Optional[int] = None   # batch index, or None
        self.escalated_at: list = []             # batch indices
        self.base_cert_rates: list = []
        self._submitted = 0

    @property
    def degraded(self) -> bool:
        return self.degraded_at is not None

    def submit(self, queries) -> None:
        """Dispatch one batch; blocks only when the pipeline is full (then
        it finalizes the oldest in-flight batch)."""
        if self.degraded and self._fallback is not None:
            entry = ("fallback", queries, self._fallback(queries))
        else:
            entry = ("certified", queries, self._dispatch(queries))
        self._inflight.append(entry)
        self._submitted += 1
        while len(self._inflight) >= self._depth:
            self._drain_one()

    def _drain_one(self) -> None:
        kind, queries, out = self._inflight.popleft()
        if kind == "fallback":
            idx, vals = self._finalize_fallback(queries, out)
            # The fallback path is the exact scan: its results satisfy
            # certified serving's contract by construction.
            self._results.append((idx, vals, 1.0))
            return
        idx, vals, rate = self._finalize(queries, out)
        self.base_cert_rates.append(float(rate))
        self._results.append((idx, vals, float(rate)))
        if (self._fallback is None and self._on_collapse is None) \
                or self.degraded:
            return
        self._low_streak = (self._low_streak + 1
                            if rate < self._cert_floor else 0)
        if self._low_streak >= self._floor_patience:
            if self._on_collapse is not None and self._on_collapse():
                # Escalation rung (e.g. a deeper probe list) — keep
                # certifying; the next collapse gets the next rung.
                self.escalated_at.append(len(self._results) - 1)
                self._low_streak = 0
                return
            if self._fallback is None:
                # Nothing left to degrade to: keep certifying and stop
                # re-invoking the exhausted escalation hook.
                self._on_collapse = None
                self._low_streak = 0
                return
            self.degraded_at = len(self._results) - 1
            _log.warning(
                "certification collapsed (base rate < %.2f for %d "
                "consecutive batches, last %.3f): rerouting subsequent "
                "batches to the exact fallback path",
                self._cert_floor, self._floor_patience, rate)

    def finish(self) -> list:
        """Finalize every in-flight batch and return the accumulated
        [(idx, vals, base_cert_rate)] in submission order."""
        while self._inflight:
            self._drain_one()
        out, self._results = self._results, []
        return out
