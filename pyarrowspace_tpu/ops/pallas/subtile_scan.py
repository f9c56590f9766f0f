"""Subtile-max serving scan — the matmul-bound high-QPS path.

The fused lazy-merge scan (scan_topk.py) interleaves a data-dependent
exact top-k merge with the matmul; measured on v5e the merge's VPU work
rivals the MXU work (bf16 gained only ~5% over f32), capping the exact
1M x 768 scan near ~35-50k QPS.  This kernel removes ALL per-entry VPU
work from the hot loop using the block-max bound:

    For any subtile width W, if item i is in the true top-k, then fewer
    than k subtiles have max score > s_i (each contributes a distinct
    better item), so i's subtile ranks within the top-k subtiles by max.
    Keeping the top S >= k subtiles per query GUARANTEES the true top-k
    survive.

Pipeline (phase a = this kernel, b/c = plain XLA):
  a. transposed scan: scores^T [tile, Qb] = xu_tile @ qn^T — corpus items
     land on SUBLANES, so the per-64-item subtile max is a relayout-free
     sublane-group reduction (log2(64) shifted maxes, no lane crossings,
     no data-dependent control flow).  Output: subtile-max matrix
     [n_subtiles, Q].
  b. top-S subtiles per query (lax.top_k over [Q, n_subtiles]), expand to
     S*64 candidate ids, score them against the INT8 corpus (gather +
     einsum; 1 byte/element keeps the gather bandwidth ~6x below the f32
     corpus) -> top-(4*topk) pool.
  c. exact f32 rescore of the pool (ops/search.rescore_candidates) —
     served scores are f32-exact.

The scan dtype is bf16 by default (2x MXU rate, f32 accumulation;
measured Mosaic int8 matmul on v5e is NOT faster than f32, so int8 is
used only as the phase-b wire format).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBTILE = 64          # items per subtile (block-max granularity)
_NEG_INF = -3.0e38


def _subtile_kernel(qn_ref, xu_ref, lam_ref, lamq_ref, tau_ref, sel_ref,
                    out_ref, scr, *, col_tile: int, group: int):
    """One (q_block, corpus_tile) step in the production [Qb, T]
    orientation: blended scores, windowed circular lane max (after
    log2(SUBTILE) roll+max steps, every lane at a SUBTILE-aligned group
    start holds its group's exact max), then a 0/1 selection matmul
    compacts the group-start lanes of `group` consecutive tiles into one
    128-lane output block accumulated in scratch."""
    t = pl.program_id(1)

    @pl.when(t % group == 0)
    def _init():
        scr[:] = jnp.zeros_like(scr)

    qn = qn_ref[:]                        # [Qb, F]
    xu = xu_ref[:]                        # [T, F]
    tau = tau_ref[0]
    acc = jax.lax.dot_general(qn, xu, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [Qb, T]
    lam_t = lam_ref[0:1, :]               # [1, T]
    lam_q = lamq_ref[:, 0:1]              # [Qb, 1]
    prox = 1.0 / (1.0 + jnp.abs(lam_t - lam_q))
    score = tau * acc + (1.0 - tau) * prox

    # Windowed circular max: lane j ends with max(score[j .. j+SUB-1]).
    m = score
    shift = 1
    while shift < SUBTILE:
        # left-rotate by `shift` == right-rotate by (width - shift)
        m = jnp.maximum(m, pltpu.roll(m, col_tile - shift, 1))
        shift *= 2
    # Compact group-start lanes into the scratch's 128 lanes; the 0/1
    # selection matrix for THIS tile-within-group is prefetched via the
    # sel block index map.  Non-selected lanes contribute 0 to disjoint
    # output lanes, so a plain add accumulates the group.
    contrib = jax.lax.dot_general(m, sel_ref[0],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    scr[:] = scr[:] + contrib

    @pl.when(t % group == group - 1)
    def _emit():
        out_ref[:] = scr[:]


@functools.partial(jax.jit, static_argnames=("q_block", "col_tile",
                                             "interpret"))
def _subtile_pallas(xu_pad, lam_row, qn_pad, lamq_col, tau, *, q_block,
                    col_tile, interpret=False):
    n_pad, f = xu_pad.shape
    q_pad = qn_pad.shape[0]
    n_tiles = n_pad // col_tile
    nsub = col_tile // SUBTILE
    group = max(1, 128 // nsub)           # tiles per 128-lane out block
    grid = (q_pad // q_block, n_tiles)

    # 0/1 selection matrices: tile g-within-group maps its group-start
    # lanes {0, 64, ...} onto output lanes {16g + i}.
    sel = np.zeros((group, col_tile, 128), dtype=np.float32)
    for g in range(group):
        for i in range(nsub):
            sel[g, SUBTILE * i, nsub * g + i] = 1.0
    sel = jnp.asarray(sel)

    out = pl.pallas_call(
        functools.partial(_subtile_kernel, col_tile=col_tile, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_block, f), lambda qb, t: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((col_tile, f), lambda qb, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, col_tile), lambda qb, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, 1), lambda qb, t: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, col_tile, 128),
                         lambda qb, t: (t % group, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_block, 128),
                               lambda qb, t: (qb, t // group),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, n_pad // SUBTILE),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((q_block, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(qn_pad, xu_pad, lam_row, lamq_col,
      jnp.asarray([tau], dtype=jnp.float32).reshape(1), sel)
    return out


@functools.partial(jax.jit,
                   static_argnames=("topk", "n_subtiles_keep", "pool_m",
                                    "interpret"))
def subtile_search(xu_scan: jnp.ndarray, xq: jnp.ndarray,
                   scales: jnp.ndarray, xu_f32: jnp.ndarray,
                   lambdas: jnp.ndarray, qn: jnp.ndarray,
                   lam_q: jnp.ndarray, tau, n_real: jnp.ndarray, *,
                   topk: int, n_subtiles_keep: int = 16, pool_m: int = 64,
                   interpret: bool | None = None):
    """Full subtile-routed serving step (phases a+b+c).

    Args:
      xu_scan: [N_pad, F] scan corpus (bf16 recommended), zero-padded to a
        SUBTILE-aligned length.
      xq, scales: int8 corpus + per-row scales (ops/quantize.quantize_rows)
        for the phase-b rescan, same padding.
      xu_f32: f32 corpus for the exact rescore, same padding.
      lambdas: [N_pad] f32 padded with any value (out-of-range candidates
        are masked by n_real, so the pad value can't be served).
      qn [Q, F] unit queries, lam_q [Q].
      n_real: number of real (un-padded) corpus rows; candidates >= n_real
        are masked to -inf in phases b and c.  (Lambda padding alone is NOT
        enough: a padded score (1-tau)/(1+|lam_pad-lam_q|) ~ 0.1 beats real
        blended scores whenever tau*cos goes negative for anti-aligned
        queries — ADVICE r2.)
    Returns (idx [Q, topk] int32, scores [Q, topk] f32) — f32-exact
    whenever the true top-k survives the int8 pool (monitor via bench
    overlap; the subtile selection itself is exact by the block-max
    bound when n_subtiles_keep >= topk).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n_pad, f = xu_scan.shape
    q = qn.shape[0]
    col_tile = 1024
    if n_pad % (col_tile * (128 // (col_tile // SUBTILE))) != 0:
        raise ValueError("corpus must be padded with build_subtile_state "
                         f"(N_pad={n_pad})")
    q_block = min(512, max(8, 1 << (q - 1).bit_length()))
    q_pad = ((q + q_block - 1) // q_block) * q_block

    scan_dtype = xu_scan.dtype
    qn_pad = jnp.pad(qn.astype(scan_dtype), ((0, q_pad - q), (0, 0)))
    lamq_pad = jnp.pad(lam_q.astype(jnp.float32), (0, q_pad - q))
    lam_row = lambdas.astype(jnp.float32).reshape(1, n_pad)

    sub_max = _subtile_pallas(xu_scan, lam_row, qn_pad,
                              lamq_pad.reshape(q_pad, 1),
                              jnp.asarray(tau, dtype=jnp.float32),
                              q_block=q_block, col_tile=col_tile,
                              interpret=interpret)     # [Q_pad, N_pad/64]

    # Phases b+c, chunked over queries: the int8 gather peaks at
    # [qc, S*64, F] bytes per chunk instead of the full batch (a 4096 x
    # 1024 x 768 one-shot gather OOMs a 16 GB HBM next to the corpus).
    s_keep = min(n_subtiles_keep, n_pad // SUBTILE)
    n_real = jnp.asarray(n_real, dtype=jnp.int32)
    # Fully-padded subtiles can't route; partially-padded ones are handled
    # by the per-candidate masks below.
    sub_start = jnp.arange(n_pad // SUBTILE, dtype=jnp.int32) * SUBTILE
    sub_max = jnp.where(sub_start[None, :] < n_real, sub_max[:q], _NEG_INF)
    _, sub_sel = jax.lax.top_k(sub_max, s_keep)         # [Q, S]
    qL8, q_scale = _quantize_queries(qn)
    tau32 = jnp.asarray(tau, dtype=jnp.float32)
    m_pool = min(pool_m, s_keep * SUBTILE)
    k_out = topk

    qc = min(512, q)
    q_pad2 = ((q + qc - 1) // qc) * qc
    nc = q_pad2 // qc

    def pad_q(a):
        return jnp.pad(a, ((0, q_pad2 - q),) + ((0, 0),) * (a.ndim - 1))

    def chunk_fn(args):
        sel_c, q8_c, qs_c, qn_c, lamq_c = args
        cand = (sel_c[:, :, None] * SUBTILE
                + jnp.arange(SUBTILE, dtype=jnp.int32)[None, None, :])
        cand = cand.reshape(qc, s_keep * SUBTILE)       # [qc, S*64]
        xq_c = xq[cand]                                 # [qc, M, F] int8
        acc = jnp.einsum("qf,qmf->qm", q8_c, xq_c,
                         preferred_element_type=jnp.int32)
        cos8 = (acc.astype(jnp.float32) * qs_c[:, None] * scales[cand])
        prox = 1.0 / (1.0 + jnp.abs(lambdas[cand] - lamq_c[:, None]))
        score8 = tau32 * cos8 + (1.0 - tau32) * prox
        score8 = jnp.where(cand < n_real, score8, _NEG_INF)
        _, pos = jax.lax.top_k(score8, m_pool)
        pool_idx = jnp.take_along_axis(cand, pos, axis=1)
        # Phase c: exact f32 rescore of the pool.
        xc = xu_f32[pool_idx]                           # [qc, m, F]
        cos = jnp.einsum("qmf,qf->qm", xc, qn_c,
                         preferred_element_type=jnp.float32)
        proxp = 1.0 / (1.0 + jnp.abs(lambdas[pool_idx]
                                     - lamq_c[:, None]))
        s = tau32 * cos + (1.0 - tau32) * proxp
        s = jnp.where(pool_idx < n_real, s, _NEG_INF)
        vals, posk = jax.lax.top_k(s, k_out)
        return jnp.take_along_axis(pool_idx, posk, axis=1), vals

    idxs, vals = jax.lax.map(chunk_fn, (
        pad_q(sub_sel).reshape(nc, qc, s_keep),
        pad_q(qL8).reshape(nc, qc, f),
        pad_q(q_scale).reshape(nc, qc),
        pad_q(qn.astype(jnp.float32)).reshape(nc, qc, f),
        pad_q(lam_q.astype(jnp.float32)).reshape(nc, qc)))
    return (idxs.reshape(q_pad2, k_out)[:q],
            vals.reshape(q_pad2, k_out)[:q])


@jax.jit
def _quantize_queries(qn: jnp.ndarray):
    x = qn.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    safe = jnp.where(absmax > 0, absmax, 1.0)
    scale = safe / 127.0
    q8 = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q8, scale[..., 0]


def build_subtile_state(xu: jnp.ndarray, lambdas: jnp.ndarray,
                        scan_dtype=jnp.bfloat16):
    """Pad + precompute the serving layout for subtile_search.

    Pads N to an 8192 multiple (col_tile 1024 x 8 tiles per 128-lane
    output block).  Pass n_real through to subtile_search — index-range
    masking there is what keeps padded rows out of served results (the
    lambda pad value is only a routing hint)."""
    n, f = xu.shape
    n_pad = ((n + 8191) // 8192) * 8192
    xu32 = jnp.pad(xu.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    lam = jnp.pad(lambdas.astype(jnp.float32), (0, n_pad - n),
                  constant_values=-2.0)
    from ..quantize import quantize_rows
    xq, scales = quantize_rows(xu32)
    return dict(xu_scan=xu32.astype(scan_dtype), xq=xq, scales=scales,
                xu_f32=xu32, lambdas=lam, n_real=n)
