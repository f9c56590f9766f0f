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
  b. top-S subtiles per query (lax.top_k over [Q, n_subtiles]), then
     rescan the selected subtiles as WHOLE 64-row blocks gathered from
     the same scan corpus ([N/64, 64, F] is a free reshape view, so each
     gather is one ~96 KB contiguous DMA instead of 64 row gathers) with
     the SAME dtype/accumulation as phase a -> the block-max guarantee
     holds end-to-end and phase b's top-k equals a full scan's top-k.
  c. exact f32 rescore of the top-(pool_m) pool — served scores are
     f32-exact.

The scan dtype is bf16 by default (2x MXU rate, f32 accumulation;
measured Mosaic int8 matmul on v5e is NOT faster than f32, and an int8
phase-b wire format mis-ranks the pool cut — bf16 blocks keep selection
exact for 2x the gather bytes, still contiguous-DMA cheap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBTILE = 64          # items per subtile (block-max granularity)
_NEG_INF = -3.0e38


def _subtile_kernel_t(xu_ref, qn_ref, lam_ref, lamq_ref, tau_ref, out_ref,
                      sup_ref):
    """Transposed phase-a step: corpus items on SUBLANES.

    scores^T [T, Qb] = xu_tile @ qn^T puts each 64-item subtile on 64
    consecutive sublanes, so the subtile max is a sublane-axis
    reshape+max — 8 elementwise vreg maxes + an in-vreg sublane tree —
    with no lane rotations, no selection matmul, no scratch
    accumulation, and no data-dependent control flow.  (The previous
    lane-major shell needed 6 full-width pltpu.roll+max passes plus a
    [T,128] 0/1 compaction matmul; its VPU work rivaled the dot and its
    3-D sel BlockSpec pathologically slowed Mosaic compilation.)
    Emits the per-tile subtile-max block [T/64, Qb]; the caller
    transposes the assembled [N/64, Q] matrix once (bandwidth-trivial
    next to the scan)."""
    xu_t = xu_ref[:]                      # [T, F]
    qn = qn_ref[:]                        # [Qb, F]
    tau = tau_ref[0, 0]
    acc = jax.lax.dot_general(xu_t, qn, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [T, Qb]
    prox = 1.0 / (1.0 + jnp.abs(lam_ref[:] - lamq_ref[0:1, :]))
    score = tau * acc + (1.0 - tau) * prox
    nsub = score.shape[0] // SUBTILE
    sm = jnp.max(score.reshape(nsub, SUBTILE, score.shape[1]), axis=1)
    out_ref[:] = sm
    # Tile max (the supertile level of the two-level top-S select).
    sup_ref[:] = jnp.max(sm, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("q_block", "col_tile",
                                             "interpret"))
def _subtile_pallas_t(xu_pad, lam_col, qn_pad, lamq_row, tau, *, q_block,
                      col_tile, interpret=False):
    """Transposed subtile-max scan.

    Returns (sub_max [Q_pad, N_pad/64], sup_max [Q_pad, N_pad/col_tile]):
    per-64-item subtile maxima plus per-tile (supertile) maxima for the
    two-level top-S select."""
    n_pad, f = xu_pad.shape
    q_pad = qn_pad.shape[0]
    nsub = col_tile // SUBTILE
    grid = (q_pad // q_block, n_pad // col_tile)
    out_t, sup_t = pl.pallas_call(
        _subtile_kernel_t,
        grid=grid,
        in_specs=[
            pl.BlockSpec((col_tile, f), lambda qb, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, f), lambda qb, t: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((col_tile, 1), lambda qb, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block), lambda qb, t: (0, qb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda qb, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nsub, q_block), lambda qb, t: (t, qb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block), lambda qb, t: (t, qb),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // SUBTILE, q_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // col_tile, q_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xu_pad, qn_pad, lam_col,
      lamq_row, jnp.asarray(tau, jnp.float32).reshape(1, 1))
    return out_t.T, sup_t.T


@functools.partial(jax.jit,
                   static_argnames=("topk", "n_subtiles_keep", "pool_m",
                                    "interpret"))
def subtile_search(xu_scan: jnp.ndarray, xu_f32: jnp.ndarray,
                   lambdas: jnp.ndarray, qn: jnp.ndarray,
                   lam_q: jnp.ndarray, tau, n_real: jnp.ndarray, *,
                   topk: int, n_subtiles_keep: int = 16, pool_m: int = 64,
                   interpret: bool | None = None):
    """Full subtile-routed serving step (phases a+b+c).

    Args:
      xu_scan: [N_pad, F] scan corpus (bf16 recommended), zero-padded to a
        SUBTILE-aligned length.  Phases a AND b both score against it, so
        the block-max routing bound is exact in the scan dtype.
      xu_f32: f32 corpus for the exact rescore, same padding.
      lambdas: [N_pad] f32 padded with any value (out-of-range candidates
        are masked by n_real, so the pad value can't be served).
      qn [Q, F] unit queries, lam_q [Q].
      n_real: number of real (un-padded) corpus rows; candidates >= n_real
        are masked to -inf in phases b and c.  (Lambda padding alone is NOT
        enough: a padded score (1-tau)/(1+|lam_pad-lam_q|) ~ 0.1 beats real
        blended scores whenever tau*cos goes negative for anti-aligned
        queries — ADVICE r2.)
    Returns (idx [Q, topk] int32, scores [Q, topk] f32).  Selection is
    exact in the scan dtype by the block-max bound (n_subtiles_keep >=
    topk) — the same guarantee as a full scan at that dtype; served
    scores are f32-exact over the pool_m-wide rescore pool.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n_pad, f = xu_scan.shape
    q = qn.shape[0]
    col_tile = 1024
    if n_pad % 8192 != 0:
        raise ValueError("corpus must be padded with build_subtile_state "
                         f"(N_pad={n_pad})")
    # q_block 1024 halves corpus HBM re-reads vs 512 (one pass serves
    # 1024 queries); VMEM stays small ([1024, F] bf16 query block).
    q_block = min(1024, max(8, 1 << (q - 1).bit_length()))
    q_pad = ((q + q_block - 1) // q_block) * q_block

    scan_dtype = xu_scan.dtype
    qn_scan = qn.astype(scan_dtype)
    qn_pad = jnp.pad(qn_scan, ((0, q_pad - q), (0, 0)))
    lamq_pad = jnp.pad(lam_q.astype(jnp.float32), (0, q_pad - q))

    lam_col = lambdas.astype(jnp.float32).reshape(n_pad, 1)
    sub_max, sup_max = _subtile_pallas_t(
        xu_scan, lam_col, qn_pad, lamq_pad.reshape(1, q_pad),
        jnp.asarray(tau, dtype=jnp.float32), q_block=q_block,
        col_tile=col_tile, interpret=interpret)  # [Q, N/64], [Q, N/1024]

    s_keep = min(n_subtiles_keep, n_pad // SUBTILE)
    n_real = jnp.asarray(n_real, dtype=jnp.int32)
    # Fully-padded subtiles can't route; partially-padded ones are handled
    # by the per-candidate masks below.
    sub_start = jnp.arange(n_pad // SUBTILE, dtype=jnp.int32) * SUBTILE
    sub_max = jnp.where(sub_start[None, :] < n_real, sub_max[:q], _NEG_INF)

    # Two-level top-S: if >= s_keep supertiles had max above item i's
    # score, each would contain a distinct better item — so the top-S
    # supertiles contain the top-S subtiles (same block-max argument one
    # level up).  top_k over [Q, N/1024] + a 256-wide refine is ~16x
    # cheaper than top_k over [Q, N/64].
    group = col_tile // SUBTILE
    n_tiles = n_pad // col_tile
    sup_keep = min(s_keep, n_tiles)
    if sup_keep * group >= s_keep and n_tiles > sup_keep:
        sup_start = jnp.arange(n_tiles, dtype=jnp.int32) * col_tile
        sup_max = jnp.where(sup_start[None, :] < n_real, sup_max[:q],
                            _NEG_INF)
        _, sup_sel = jax.lax.top_k(sup_max, sup_keep)   # [Q, S]
        cand_sub = (sup_sel[:, :, None] * group
                    + jnp.arange(group, dtype=jnp.int32)[None, None, :])
        cand_sub = cand_sub.reshape(q, sup_keep * group)
        sub_vals = jnp.take_along_axis(sub_max, cand_sub, axis=1)
        _, pos_s = jax.lax.top_k(sub_vals, s_keep)
        sub_sel = jnp.take_along_axis(cand_sub, pos_s, axis=1)
    else:
        _, sub_sel = jax.lax.top_k(sub_max, s_keep)     # [Q, S]

    # Phases b+c, chunked over queries: the block gather peaks at
    # [qc, S, 64, F] scan-dtype bytes per chunk instead of the full batch
    # (a 16384 x 16 x 64 x 768 one-shot bf16 gather is 25 GB).
    tau32 = jnp.asarray(tau, dtype=jnp.float32)
    m_pool = min(pool_m, s_keep * SUBTILE)
    k_out = topk

    # Subtile-blocked views — free reshapes of the resident arrays, so
    # each selected subtile is gathered as ONE contiguous (64, F) slab
    # (~96 KB in bf16 at F=768) instead of 64 scattered row gathers.
    xb = xu_scan.reshape(n_pad // SUBTILE, SUBTILE, f)
    lamb = lambdas.astype(jnp.float32).reshape(n_pad // SUBTILE, SUBTILE)

    # qc sizes the phase-b gather peak ([qc, S, 64, F] bf16 ~ 1.6 GB at
    # qc=1024/S=16/F=768).  Fewer, larger chunks matter: the lax.map
    # steps are SEQUENTIAL, and 32 small steps of gather+einsum cost
    # ~6x more wall clock than 8 large ones (measured at 1M x 768).
    qc = min(1024, q)
    q_pad2 = ((q + qc - 1) // qc) * qc
    nc = q_pad2 // qc

    def pad_q(a):
        return jnp.pad(a, ((0, q_pad2 - q),) + ((0, 0),) * (a.ndim - 1))

    def chunk_fn(args):
        sel_c, qs_c, qn_c, lamq_c = args
        # Phase b: exact rescan of the selected subtiles in the scan
        # dtype — same arithmetic as phase a, so the routing bound and
        # the pool cut are consistent.
        blocks = xb[sel_c]                          # [qc, S, 64, F]
        cos_b = jnp.einsum("qf,qsmf->qsm", qs_c, blocks,
                           preferred_element_type=jnp.float32)
        cos_b = cos_b.reshape(qc, s_keep * SUBTILE)
        lam_b = lamb[sel_c].reshape(qc, s_keep * SUBTILE)
        prox = 1.0 / (1.0 + jnp.abs(lam_b - lamq_c[:, None]))
        score_b = tau32 * cos_b + (1.0 - tau32) * prox
        cand = (sel_c[:, :, None] * SUBTILE
                + jnp.arange(SUBTILE, dtype=jnp.int32)[None, None, :])
        cand = cand.reshape(qc, s_keep * SUBTILE)   # [qc, S*64]
        score_b = jnp.where(cand < n_real, score_b, _NEG_INF)
        _, pos = jax.lax.top_k(score_b, m_pool)
        pool_idx = jnp.take_along_axis(cand, pos, axis=1)
        # Phase c: exact f32 rescore of the pool.
        xc = xu_f32[pool_idx]                       # [qc, m, F]
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
        pad_q(qn_scan).reshape(nc, qc, f),
        pad_q(qn.astype(jnp.float32)).reshape(nc, qc, f),
        pad_q(lam_q.astype(jnp.float32)).reshape(nc, qc)))
    return (idxs.reshape(q_pad2, k_out)[:q],
            vals.reshape(q_pad2, k_out)[:q])


def build_subtile_state(xu: jnp.ndarray, lambdas: jnp.ndarray,
                        scan_dtype=jnp.bfloat16):
    """Pad + precompute the serving layout for subtile_search.

    Pads N to an 8192 multiple (col_tile 1024 granularity).  Pass n_real
    through to subtile_search — index-range masking there is what keeps
    padded rows out of served results (the lambda pad value is only a
    routing hint)."""
    n, f = xu.shape
    n_pad = ((n + 8191) // 8192) * 8192
    xu32 = jnp.pad(xu.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    lam = jnp.pad(lambdas.astype(jnp.float32), (0, n_pad - n),
                  constant_values=-2.0)
    return dict(xu_scan=xu32.astype(scan_dtype), xu_f32=xu32,
                lambdas=lam, n_real=n)
