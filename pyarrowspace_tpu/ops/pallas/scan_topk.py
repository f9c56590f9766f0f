"""Fused lambda-aware serving kernel — one HBM pass per query batch.

The serving step streams corpus tiles from HBM exactly once and keeps the
per-query running top-k in VMEM (SURVEY.md §7 step 4):

    MXU:  cos  = qn @ xu_tile^T                          [Qb, T]
    VPU:  prox = 1 / (1 + |lam_tile - lam_q|)
    VPU:  score = tau * cos + (1 - tau) * prox
    VPU:  exact k-extraction (max variant of ops/pallas/knn.py's trick)

Grid is (query_blocks, corpus_tiles) with the tile axis innermost — the TPU
grid is sequential, so the VMEM scratch accumulates across tiles and resets
when a new query block starts.  This replaces `lax.top_k` over [Q, N]
(a full sort of N per query) with k cheap min/max passes per tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -3.0e38
_INT_MAX = jnp.iinfo(jnp.int32).max


def _lazy_merge(score, col_ids, run_s, run_i, *, k: int):
    """Lazy exact merge: the running top-k (kept sorted descending in
    scratch) only changes when a tile entry beats a row's kth-best —
    expected O(k · ln(n_tiles)) insertions per row over the whole scan,
    versus k full extraction passes per tile.  A while_loop extracts the
    tile max and insertion-sorts it in (scatter-free: iota-mask shifts),
    masking non-improving rows out entirely (their max is already
    proven <= kth).  Worst case (every entry improves) degrades to the
    dense extraction, still exact.  Returns the merged (rs, ri)."""
    nq = score.shape[0]
    col_k = jax.lax.broadcasted_iota(jnp.int32, (nq, k), 1)

    def improving(carry):
        sc, _, _ = carry
        kth = carry[1][:, k - 1:k]
        return jnp.any(jnp.max(sc, axis=1, keepdims=True) > kth)

    def extract_insert(carry):
        sc, rs, ri = carry
        kth = rs[:, k - 1:k]
        m = jnp.max(sc, axis=1, keepdims=True)                  # [Qb, 1]
        hit = sc == m
        sel = jnp.min(jnp.where(hit, col_ids, _INT_MAX), axis=1,
                      keepdims=True)
        improves = m > kth
        pos = jnp.sum((rs > m).astype(jnp.int32), axis=1,
                      keepdims=True)                             # [Qb, 1]
        rs_shift = jnp.concatenate([rs[:, :1], rs[:, :-1]], axis=1)
        ri_shift = jnp.concatenate([ri[:, :1], ri[:, :-1]], axis=1)
        ins_s = jnp.where(col_k < pos, rs,
                          jnp.where(col_k == pos, m, rs_shift))
        ins_i = jnp.where(col_k < pos, ri,
                          jnp.where(col_k == pos, sel, ri_shift))
        rs = jnp.where(improves, ins_s, rs)
        ri = jnp.where(improves, ins_i, ri)
        sc = jnp.where(hit & (col_ids == sel), _NEG_INF, sc)
        sc = jnp.where(improves, sc, _NEG_INF)  # row done: max <= kth
        return sc, rs, ri

    _, rs, ri = jax.lax.while_loop(
        improving, extract_insert, (score, run_s, run_i))
    return rs, ri


def _scan_kernel(tau_ref, nreal_ref, qn_ref, lamq_ref, xu_ref, lam_ref,
                 out_s_ref, out_i_ref, run_s, run_i, *, k: int,
                 col_tile: int):
    qb, t = pl.program_id(0), pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        run_s[:] = jnp.full_like(run_s, _NEG_INF)
        run_i[:] = jnp.full_like(run_i, -1)

    qn = qn_ref[:]                       # [Qb, F]
    xu = xu_ref[:]                       # [T, F]
    nq = qn.shape[0]
    tau = tau_ref[0]

    cos = jax.lax.dot_general(qn, xu, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [Qb, T]
    lam_tile = lam_ref[0:1, :]                                     # [1, T]
    lam_q = lamq_ref[:, 0:1]                                       # [Qb, 1]
    prox = 1.0 / (1.0 + jnp.abs(lam_tile - lam_q))
    score = tau * cos + (1.0 - tau) * prox

    col_ids = (t * col_tile
               + jax.lax.broadcasted_iota(jnp.int32, (nq, col_tile), 1))
    score = jnp.where(col_ids >= nreal_ref[0], _NEG_INF, score).astype(
        jnp.float32)

    rs, ri = _lazy_merge(score, col_ids, run_s[:], run_i[:], k=k)
    run_s[:] = rs
    run_i[:] = ri

    @pl.when(t == n_tiles - 1)
    def _emit():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


def _scan_kernel_int8(tau_ref, nreal_ref, qq_ref, qscale_ref, lamq_ref,
                      xq_ref, srow_ref, lam_ref, out_s_ref, out_i_ref,
                      run_s, run_i, *, k: int, col_tile: int):
    """Quantized candidate scan: int8 x int8 -> int32 on the MXU, f32
    epilogue (dequant scales + lambda proximity), same lazy top-k merge."""
    qb, t = pl.program_id(0), pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        run_s[:] = jnp.full_like(run_s, _NEG_INF)
        run_i[:] = jnp.full_like(run_i, -1)

    qq = qq_ref[:]                        # [Qb, F] int8
    xq = xq_ref[:]                        # [T, F] int8
    nq = qq.shape[0]
    tau = tau_ref[0]

    acc = jax.lax.dot_general(qq, xq, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)   # [Qb, T]
    cos = (acc.astype(jnp.float32)
           * qscale_ref[:, 0:1] * srow_ref[0:1, :])
    prox = 1.0 / (1.0 + jnp.abs(lam_ref[0:1, :] - lamq_ref[:, 0:1]))
    score = tau * cos + (1.0 - tau) * prox

    col_ids = (t * col_tile
               + jax.lax.broadcasted_iota(jnp.int32, (nq, col_tile), 1))
    score = jnp.where(col_ids >= nreal_ref[0], _NEG_INF, score).astype(
        jnp.float32)

    rs, ri = _lazy_merge(score, col_ids, run_s[:], run_i[:], k=k)
    run_s[:] = rs
    run_i[:] = ri

    @pl.when(t == n_tiles - 1)
    def _emit():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


@functools.partial(jax.jit, static_argnames=("k", "q_block", "col_tile",
                                             "interpret"))
def _scan_pallas(xu_pad, lam_pad, qn_pad, lamq_pad, tau, n_real, *, k,
                 q_block, col_tile, interpret=False):
    n_pad, f = xu_pad.shape
    q_pad = qn_pad.shape[0]
    n_tiles = n_pad // col_tile
    n_qblocks = q_pad // q_block
    tau_arr = jnp.asarray([tau], dtype=jnp.float32).reshape(1)
    nreal_arr = jnp.asarray([n_real], dtype=jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # tau, n_real
        grid=(n_qblocks, n_tiles),
        in_specs=[
            pl.BlockSpec((q_block, f), lambda qb, t, *_: (qb, 0),
                         memory_space=pltpu.VMEM),     # qn block
            pl.BlockSpec((q_block, 128), lambda qb, t, *_: (qb, 0),
                         memory_space=pltpu.VMEM),     # lam_q (lane-repl.)
            pl.BlockSpec((col_tile, f), lambda qb, t, *_: (t, 0),
                         memory_space=pltpu.VMEM),     # corpus tile
            pl.BlockSpec((1, col_tile), lambda qb, t, *_: (0, t),
                         memory_space=pltpu.VMEM),     # lambdas tile
        ],
        out_specs=[
            pl.BlockSpec((q_block, k), lambda qb, t, *_: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, k), lambda qb, t, *_: (qb, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_block, k), jnp.float32),
            pltpu.VMEM((q_block, k), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_scan_kernel, k=k, col_tile=col_tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(tau_arr, nreal_arr, qn_pad, lamq_pad, xu_pad, lam_pad)
    return out


@functools.partial(jax.jit, static_argnames=("k", "q_block", "col_tile",
                                             "interpret"))
def _scan_pallas_int8(xq_pad, srow_pad, lam_pad, qq_pad, qscale_pad,
                      lamq_pad, tau, n_real, *, k, q_block, col_tile,
                      interpret=False):
    n_pad, f = xq_pad.shape
    q_pad = qq_pad.shape[0]
    n_tiles = n_pad // col_tile
    n_qblocks = q_pad // q_block
    tau_arr = jnp.asarray([tau], dtype=jnp.float32).reshape(1)
    nreal_arr = jnp.asarray([n_real], dtype=jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # tau, n_real
        grid=(n_qblocks, n_tiles),
        in_specs=[
            pl.BlockSpec((q_block, f), lambda qb, t, *_: (qb, 0),
                         memory_space=pltpu.VMEM),     # qq block (int8)
            pl.BlockSpec((q_block, 128), lambda qb, t, *_: (qb, 0),
                         memory_space=pltpu.VMEM),     # query scales
            pl.BlockSpec((q_block, 128), lambda qb, t, *_: (qb, 0),
                         memory_space=pltpu.VMEM),     # lam_q
            pl.BlockSpec((col_tile, f), lambda qb, t, *_: (t, 0),
                         memory_space=pltpu.VMEM),     # corpus tile (int8)
            pl.BlockSpec((1, col_tile), lambda qb, t, *_: (0, t),
                         memory_space=pltpu.VMEM),     # corpus row scales
            pl.BlockSpec((1, col_tile), lambda qb, t, *_: (0, t),
                         memory_space=pltpu.VMEM),     # lambdas tile
        ],
        out_specs=[
            pl.BlockSpec((q_block, k), lambda qb, t, *_: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, k), lambda qb, t, *_: (qb, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_block, k), jnp.float32),
            pltpu.VMEM((q_block, k), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_scan_kernel_int8, k=k, col_tile=col_tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(tau_arr, nreal_arr, qq_pad, qscale_pad, lamq_pad, xq_pad, srow_pad,
      lam_pad)
    return out


def lambda_search_quantized(xq: jnp.ndarray, scales: jnp.ndarray,
                            lambdas: jnp.ndarray, qn: jnp.ndarray,
                            lam_q: jnp.ndarray, tau, cand_k: int,
                            q_block: int = 512, col_tile: int = 1024,
                            interpret: bool | None = None):
    """Quantized candidate scan: int8 corpus (xq [N, F] + scales [N]),
    f32 unit queries (quantized on device), returns a per-query candidate
    pool (idx [Q, cand_k] int32, approx scores [Q, cand_k] f32) for
    ops/search.rescore_candidates.  cand_k is typically 4 * topk."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    from ..quantize import quantize_rows
    n, f = xq.shape
    q = qn.shape[0]
    tile = min(col_tile, max(128, 1 << (n - 1).bit_length()))
    n_pad = ((n + tile - 1) // tile) * tile
    qb = min(q_block, max(8, 1 << (q - 1).bit_length()))
    q_pad = ((q + qb - 1) // qb) * qb
    k = max(1, min(cand_k, n))

    qq, q_scale = quantize_rows(qn)
    xq_pad = jnp.pad(xq, ((0, n_pad - n), (0, 0)))
    srow_pad = jnp.pad(scales.astype(jnp.float32),
                       (0, n_pad - n)).reshape(1, n_pad)
    lam_pad = jnp.pad(lambdas.astype(jnp.float32),
                      (0, n_pad - n)).reshape(1, n_pad)
    qq_pad = jnp.pad(qq, ((0, q_pad - q), (0, 0)))
    qscale_pad = jnp.broadcast_to(
        jnp.pad(q_scale, (0, q_pad - q))[:, None], (q_pad, 128))
    lamq_pad = jnp.broadcast_to(
        jnp.pad(lam_q.astype(jnp.float32), (0, q_pad - q))[:, None],
        (q_pad, 128))
    s, i = _scan_pallas_int8(xq_pad, srow_pad, lam_pad, qq_pad, qscale_pad,
                             lamq_pad, jnp.asarray(tau, dtype=jnp.float32),
                             n, k=k, q_block=qb, col_tile=tile,
                             interpret=interpret)
    return i[:q], s[:q]


def lambda_search_pallas(xu: jnp.ndarray, lambdas: jnp.ndarray,
                         qn: jnp.ndarray, lam_q: jnp.ndarray, tau,
                         topk: int, q_block: int = 512,
                         col_tile: int = 1024,
                         interpret: bool | None = None):
    # q_block 512: each corpus pass serves 512 queries, halving HBM corpus
    # re-reads vs 256 (the scan is bandwidth-bound at 1M x 768).
    """Batched lambda-aware top-k via the fused Pallas scan.

    Args: xu [N, F] unit rows, lambdas [N], qn [Q, F] unit queries,
    lam_q [Q].  Returns (idx [Q, topk] int32, scores [Q, topk] f32).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n, f = xu.shape
    q = qn.shape[0]
    tile = min(col_tile, max(128, 1 << (n - 1).bit_length()))
    n_pad = ((n + tile - 1) // tile) * tile
    qb = min(q_block, max(8, 1 << (q - 1).bit_length()))
    q_pad = ((q + qb - 1) // qb) * qb
    k = max(1, min(topk, n))

    # bf16 corpora stay bf16 (2x MXU rate; the kernel accumulates f32);
    # anything else runs f32.
    scan_dtype = jnp.bfloat16 if xu.dtype == jnp.bfloat16 else jnp.float32
    xu_pad = jnp.pad(xu.astype(scan_dtype), ((0, n_pad - n), (0, 0)))
    lam_pad = jnp.pad(lambdas.astype(jnp.float32),
                      (0, n_pad - n)).reshape(1, n_pad)
    qn_pad = jnp.pad(qn.astype(scan_dtype), ((0, q_pad - q), (0, 0)))
    lamq_pad = jnp.broadcast_to(
        jnp.pad(lam_q.astype(jnp.float32), (0, q_pad - q))[:, None],
        (q_pad, 128))
    s, i = _scan_pallas(xu_pad, lam_pad, qn_pad, lamq_pad,
                        jnp.asarray(tau, dtype=jnp.float32), n,
                        k=k, q_block=qb, col_tile=tile,
                        interpret=interpret)
    return i[:q], s[:q]
