"""Host->device corpus ingest.

On tunneled/remote TPU runtimes the host->device link is the single
largest cost of an index build (measured: a monolithic ``jnp.asarray`` of
the 313k x 384 corpus moves ~15 MB/s, while the same bytes split into
~64 MB row chunks stream at 30-40 MB/s — the monolithic path serializes
the whole buffer before the wire starts moving).  This module owns that
transfer:

* ``plain``   — single ``jnp.asarray`` (CPU / local-device default; also
  the f64 parity path).
* ``chunked`` — sequential ``device_put`` of ~64 MB row chunks, then a
  device-side concat (an HBM copy, microseconds).  Lossless; the TPU
  default.
* ``int16``   — per-row symmetric int16 quantization on the host
  (~0.5 s for 313k x 384), half the bytes on the wire, exact f32
  dequantization on device.  Max relative element error 2^-15 (~3e-5);
  opt-in via ``ARROWSPACE_INGEST=int16`` for bandwidth-starved links.

The reference engine has no analogue (its corpus is already in process
memory — rayon on CPU); this is pure TPU-runtime engineering around the
reference's build() entry (src/lib.rs:270-300).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# Target bytes per transfer chunk.  Measured sweet spot on the axon tunnel
# is ~50-80 MB: big enough to amortize per-transfer overhead, small enough
# that serialization pipelines with the wire.
_CHUNK_BYTES = 64 * 1024 * 1024


def _resolve_mode(mode: str | None) -> str:
    mode = mode or os.environ.get("ARROWSPACE_INGEST", "auto")
    if mode == "auto":
        backend = jax.default_backend()
        mode = "plain" if backend == "cpu" else "chunked"
    if mode not in ("plain", "chunked", "int16"):
        raise ValueError(f"unknown ingest mode: {mode!r}")
    return mode


def _row_chunks(n: int, f: int, itemsize: int) -> int:
    rows = max(1, _CHUNK_BYTES // max(1, f * itemsize))
    return min(n, rows)


@jax.jit
def _dequant_chunk(xq: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return xq.astype(jnp.float32) * scale


def ingest_corpus(arr: np.ndarray, dtype: np.dtype,
                  mode: str | None = None) -> jnp.ndarray:
    """Move a validated [N, F] host array onto the default device.

    Returns a device array of ``dtype``.  All modes are async-dispatched:
    the returned array's transfers/compute overlap with whatever the
    caller enqueues next.
    """
    if isinstance(arr, jax.Array):  # already on device
        return arr.astype(dtype) if arr.dtype != dtype else arr
    mode = _resolve_mode(mode)
    if mode == "int16" and np.dtype(dtype) != np.float32:
        mode = "chunked"  # int16 wire format targets the f32 fast path

    if mode == "plain":
        return jnp.asarray(arr, dtype=dtype)

    n, f = arr.shape
    if mode == "chunked":
        src = np.ascontiguousarray(arr, dtype=dtype)
        rows = _row_chunks(n, f, src.dtype.itemsize)
        parts = [jax.device_put(src[i:i + rows])
                 for i in range(0, n, rows)]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

    # int16: quantize per row on host without large temporaries.
    work = np.array(arr, dtype=np.float32, copy=True)
    absmax = np.abs(work).max(axis=1, keepdims=True)
    inv = (32767.0 / np.maximum(absmax, 1e-30)).astype(np.float32)
    np.multiply(work, inv, out=work)
    np.rint(work, out=work)
    xq = work.astype(np.int16)
    del work
    scale = (np.maximum(absmax, 1e-30) / 32767.0).astype(np.float32)
    rows = _row_chunks(n, f, 2)
    parts = []
    for i in range(0, n, rows):
        qd = jax.device_put(xq[i:i + rows])
        sd = jax.device_put(scale[i:i + rows])
        parts.append(_dequant_chunk(qd, sd))
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
    return out.astype(dtype) if out.dtype != np.dtype(dtype) else out
