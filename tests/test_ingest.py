"""Host->device corpus ingest modes (ops/ingest.py)."""

import numpy as np
import jax.numpy as jnp

from pyarrowspace_tpu.ops.ingest import ingest_corpus


def test_chunked_is_lossless():
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((1000, 64)).astype(np.float32) * 12
    plain = np.asarray(ingest_corpus(arr, np.dtype(np.float32),
                                     mode="plain"))
    chunked = np.asarray(ingest_corpus(arr, np.dtype(np.float32),
                                       mode="chunked"))
    np.testing.assert_array_equal(plain, chunked)


def test_int16_wire_error_bound():
    """Per-row symmetric int16: max element error one quant step
    (absmax/32767, i.e. 2^-15 relative to the row absmax — the f32
    rounding of x*inv can shift rint by one); zero rows exact."""
    rng = np.random.default_rng(1)
    arr = rng.standard_normal((500, 48)).astype(np.float32) * 100
    arr[7] = 0.0
    out = np.asarray(ingest_corpus(arr, np.dtype(np.float32),
                                   mode="int16"))
    absmax = np.abs(arr).max(axis=1, keepdims=True)
    err = np.abs(out - arr)
    bound = np.maximum(absmax, 1e-30) / 32767.0 * 1.0 + 1e-12
    assert np.all(err <= bound)
    np.testing.assert_array_equal(out[7], 0.0)


def test_device_array_passthrough():
    arr = jnp.ones((16, 8), jnp.float32)
    out = ingest_corpus(arr, np.dtype(np.float32))
    assert out is arr
    out64 = ingest_corpus(arr, np.dtype(np.float64))
    assert out64.dtype == jnp.float64 or out64.dtype == jnp.float32
    # (x64 disabled -> float32; enabled -> float64; either way no host copy)


def test_int16_falls_back_for_f64():
    arr = np.ones((8, 8), dtype=np.float64)
    out = ingest_corpus(arr, np.dtype(np.float64), mode="int16")
    np.testing.assert_array_equal(np.asarray(out), arr)
