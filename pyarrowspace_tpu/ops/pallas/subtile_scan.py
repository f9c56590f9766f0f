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

Pipeline (all hot stages are Pallas kernels):
  a. transposed scan (_subtile_kernel_t): scores^T [tile, Qb] =
     xu_tile @ qn^T — corpus items land on SUBLANES, so the per-64-item
     subtile max is a relayout-free sublane-group reduction (no lane
     crossings, no data-dependent control flow).  145 TF/s measured
     (74% of v5e bf16 peak).  Output: subtile-max matrix + per-tile
     supertile maxima.
  b. two-level top-S select (_extract_kernel twice: supertiles, then a
     256-wide subtile refine — the top-S supertiles provably contain
     the top-S subtiles), then rescan the selected subtiles as WHOLE
     64-row blocks (_gather_score_kernel: scalar-prefetched ~96 KB
     contiguous DMAs, 590 GB/s measured) with the SAME dtype/
     accumulation as phase a -> the block-max guarantee holds
     end-to-end and phase b's top-k equals a full scan's top-k.
  c. pool cut (_extract_kernel) + exact f32 rescore of the top-(pool_m)
     pool — served scores are f32-exact.

1M x 768 x Q16384 on one v5e: 59.8k QPS through the fused product
pipeline vs 41k for the exact scan (scan_topk.py) same-session.  The
scan dtype is bf16 by default (2x MXU rate, f32 accumulation; measured
Mosaic int8 matmul on v5e is NOT faster than f32, and an int8 phase-b
wire format mis-ranks the pool cut — bf16 blocks keep selection exact
for 2x the gather bytes, still contiguous-DMA cheap).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Items per subtile (block-max granularity).  Smaller W halves the
# phase-b DMA bytes (S >= topk subtiles regardless of W) but doubles the
# sub_max matrix the phase-a kernel writes; 64 measured best at 1M x 768.
# Import-time env override for A/B only — not a per-call knob because the
# serving state layout depends on it.
SUBTILE = int(os.environ.get("ARROWSPACE_SUBTILE_W", "64"))
_NEG_INF = -3.0e38


def _subtile_kernel_t(xu_ref, qn_ref, lam_ref, lamq_ref, tau_ref, out_ref):
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
    out_ref[:] = jnp.max(score.reshape(nsub, SUBTILE, score.shape[1]),
                         axis=1)


@functools.partial(jax.jit, static_argnames=("q_block", "col_tile",
                                             "interpret"))
def _subtile_pallas_t(xu_pad, lam_col, qn_pad, lamq_row, tau, *, q_block,
                      col_tile, interpret=False):
    """Transposed subtile-max scan.

    Returns (sub_t [N_pad/64, Q_pad], sup_t [N_pad/col_tile, Q_pad]) in
    the kernel's native pre-transpose layout (items on the leading axis):
    per-64-item subtile maxima plus per-tile (supertile) maxima.  The
    selection stage consumes this layout directly — transposing the
    [N/64, Q] matrix (1 GB at 1M x Q16384) was measured as part of a
    66 ms selection stage that the transposed extract does in ~10 ms."""
    n_pad, f = xu_pad.shape
    q_pad = qn_pad.shape[0]
    nsub = col_tile // SUBTILE
    grid = (q_pad // q_block, n_pad // col_tile)
    out_t = pl.pallas_call(
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
        out_specs=pl.BlockSpec((nsub, q_block), lambda qb, t: (t, qb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // SUBTILE, q_pad),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xu_pad, qn_pad, lam_col,
      lamq_row, jnp.asarray(tau, jnp.float32).reshape(1, 1))
    # Supertile (per-tile) maxima for the two-level fallback select,
    # reduced in the pre-transpose layout so XLA folds it into one pass.
    sup_t = jnp.max(out_t.reshape(n_pad // col_tile, nsub, q_pad), axis=1)
    return out_t, sup_t


def _gather_score_kernel(sel_ref, qn_ref, *refs):
    """Per-query fused subtile gather + dot: refs = S aliased views of the
    subtile-blocked corpus (each step DMAs exactly this query's s-th
    selected block via the scalar-prefetched index map) + the out ref.

    The lambda-proximity blend deliberately stays OUTSIDE (an XLA gather
    over the blocked lambdas): blending in-kernel needs S extra ~256 B
    DMAs per step whose overhead cancels the saved gather (measured flat
    at 1M x 768) and inflates the Mosaic compile 6x."""
    out_ref = refs[-1]
    qn = qn_ref[0]                               # [1, F]
    for s, b in enumerate(refs[:-1]):
        acc = jax.lax.dot_general(qn, b[0], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        w = b.shape[1]
        out_ref[0, :, s * w:(s + 1) * w] = acc   # [1, W]


@functools.partial(jax.jit, static_argnames=("s_keep", "interpret"))
def _gather_score_pallas(xb3, qn3, sel, *, s_keep, interpret=False):
    """cos [Q, s_keep * W] = each query's dot against its selected
    subtile blocks, streamed by the Pallas pipeline (one ~96 KB
    contiguous DMA per block, no [Q, S, W, F] materialization).

    The selection table is a scalar-prefetch operand and lives in SMEM
    (~1 MB on v5e): it is passed FLAT (a [qc*S] row — 2-D tables get
    lane-padded 8x) and the call is chunked over queries so each chunk's
    table stays a few hundred KB."""
    n_sub, w, f = xb3.shape
    q = qn3.shape[0]
    # Keep the per-chunk flat table (qc * s_keep int32) within ~512 KB of
    # the ~1 MB SMEM budget regardless of s_keep: a fixed qc=4096 blows
    # SMEM once s_keep reaches 64 (r3 review).  qc=4096 at s_keep=30
    # (491 KB) is the measured-good serving config.
    qc = min(q, 4096, max(256, (131072 // s_keep) // 8 * 8))

    def one_chunk(qn_c, sel_c, nq):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nq,),
            in_specs=[
                pl.BlockSpec((1, 1, f), lambda i, sel: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec((1, w, f),
                             lambda i, sel, s=s: (sel[i * s_keep + s],
                                                  0, 0),
                             memory_space=pltpu.VMEM)
                for s in range(s_keep)
            ],
            out_specs=pl.BlockSpec((1, 1, s_keep * w),
                                   lambda i, sel: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            _gather_score_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nq, 1, s_keep * w),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
            if not interpret else None,
            interpret=interpret,
        )(sel_c.reshape(-1), qn_c, *([xb3] * s_keep))

    outs = []
    for s0 in range(0, q, qc):
        nq = min(qc, q - s0)
        outs.append(one_chunk(qn3[s0:s0 + nq], sel[s0:s0 + nq], nq))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out.reshape(q, s_keep * w)


_INT_MAX = jnp.iinfo(jnp.int32).max

# Sentinel for masked-out candidates fed to the extract kernel.  MUST be
# strictly above _NEG_INF (the kernel's elimination value): an entry
# initialized AT _NEG_INF re-enters the max/hit set of every post-
# exhaustion iteration and the kernel then re-selects already-extracted
# ids (duplicate served results — r3 review).  -1e6 - cand keeps masked
# entries astronomically below real blended scores (|score| <~ 2), makes
# exhaustion ordering deterministic (ascending id), and value collisions
# at huge cand are harmless (elimination is by id, tiebreak by min id).


def _mask_sentinel(ids):
    return -1.0e6 - ids.astype(jnp.float32)


def _extract_kernel(score_ref, cand_ref, out_ref, *, m_pool: int):
    """Sequential max-extraction of the pool, VMEM-resident: m_pool
    iterations of lane-max + min-id tiebreak + mask, with no HBM
    round-trips between iterations (the XLA lax.scan form pays one per
    extraction).  Inputs must not contain _NEG_INF entries (use
    _mask_sentinel) — extraction is duplicate-free iff every entry
    starts strictly above the elimination value."""
    sc = score_ref[:]                            # [B, M]
    cand = cand_ref[:]                           # [B, M]
    for j in range(m_pool):
        m = jnp.max(sc, axis=1, keepdims=True)
        hit = sc == m
        sel = jnp.min(jnp.where(hit, cand, _INT_MAX), axis=1,
                      keepdims=True)
        out_ref[:, j:j + 1] = sel
        sc = jnp.where(cand == sel, _NEG_INF, sc)


@functools.partial(jax.jit, static_argnames=("m_pool", "interpret"))
def _extract_pool_pallas(score_b, cand, *, m_pool, interpret=False):
    """pool_idx [Q, m_pool] = per-query top-m_pool candidate ids."""
    q, m = score_b.shape
    qb = min(q, 512)
    q_pad = ((q + qb - 1) // qb) * qb
    sc = jnp.pad(score_b, ((0, q_pad - q), (0, 0)),
                 constant_values=_NEG_INF)
    cd = jnp.pad(cand, ((0, q_pad - q), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_extract_kernel, m_pool=m_pool),
        grid=(q_pad // qb,),
        in_specs=[
            pl.BlockSpec((qb, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qb, m_pool), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, m_pool), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(sc, cd)
    return out[:q]


def _extract_iota_kernel_t(score_ref, out_ref, *, m_pool: int):
    """Transposed-layout max extraction: scores [M, B] with candidates on
    the leading (sublane) axis, candidate ids generated in-kernel as an
    iota — no [Q, M] transpose, no cand array read.  Same duplicate-free
    contract as _extract_kernel (inputs strictly above _NEG_INF)."""
    sc = score_ref[:]                                   # [M, B]
    ids = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 0)
    for j in range(m_pool):
        m = jnp.max(sc, axis=0, keepdims=True)
        hit = sc == m
        sel = jnp.min(jnp.where(hit, ids, _INT_MAX), axis=0, keepdims=True)
        out_ref[j:j + 1, :] = sel
        sc = jnp.where(ids == sel, _NEG_INF, sc)


# Single-level select cap: the whole [n_sub, qb] block must sit in VMEM
# (n_sub * 128 lanes * 4 B + the iota), so beyond ~32k subtiles (~2M rows
# at W=64, 16 MB/block) the two-level fallback takes over.
_SINGLE_LEVEL_MAX_NSUB = 32768


@functools.partial(jax.jit, static_argnames=("m_pool", "interpret"))
def _extract_ids_pallas_t(score_t, *, m_pool, interpret=False):
    """sel [Q, m_pool] = per-query top-m_pool candidate ids from a
    TRANSPOSED [M, Q] score matrix (phase-a's native layout).  One-level
    replacement for the sup-select + take_along_axis refine + sub-select
    chain: the XLA row-gather of the refine stage alone measured 65 ms
    at 1M x 768 x Q16384 where this kernel's full select costs ~10 ms."""
    m, qp = score_t.shape
    qb = min(128, qp)
    out = pl.pallas_call(
        functools.partial(_extract_iota_kernel_t, m_pool=m_pool),
        grid=(qp // qb,),
        in_specs=[pl.BlockSpec((m, qb), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m_pool, qb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pool, qp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if not interpret else None,
        interpret=interpret,
    )(score_t)
    return out.T


@functools.partial(jax.jit,
                   static_argnames=("topk", "n_subtiles_keep", "pool_m",
                                    "interpret"))
def subtile_search(xu_scan: jnp.ndarray, xu_f32: jnp.ndarray,
                   lambdas: jnp.ndarray, qn: jnp.ndarray,
                   lam_q: jnp.ndarray, tau, n_real: jnp.ndarray, *,
                   topk: int, n_subtiles_keep: int = 16,
                   pool_m: int | None = None,
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
      pool_m: width of the f32-rescore pool (default: topk).  Selection
        is already exact in the scan dtype by the block-max bound
        (n_subtiles_keep >= topk); a wider pool additionally lets the
        f32 rescore promote items past scan-dtype near-ties.
    Returns (idx [Q, topk] int32, scores [Q, topk] f32) — the same
    top-k guarantee as a full scan at the scan dtype, scores f32-exact.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n_pad, f = xu_scan.shape
    q = qn.shape[0]
    col_tile = 1024
    if n_pad % 8192 != 0:
        raise ValueError("corpus must be padded with build_subtile_state "
                         f"(N_pad={n_pad})")
    # Larger q_block cuts corpus HBM re-reads (one pass serves q_block
    # queries); measured phase-a at 1M x 768 x Q16384: 1024 -> 156 ms,
    # 2048 -> 152, 4096 -> 149 (same-session A/Bs).  VMEM stays small
    # ([4096, F] bf16 query block = 6 MB).
    q_block = min(4096, max(8, 1 << (q - 1).bit_length()))
    q_pad = ((q + q_block - 1) // q_block) * q_block

    scan_dtype = xu_scan.dtype
    qn_scan = qn.astype(scan_dtype)
    qn_pad = jnp.pad(qn_scan, ((0, q_pad - q), (0, 0)))
    lamq_pad = jnp.pad(lam_q.astype(jnp.float32), (0, q_pad - q))

    lam_col = lambdas.astype(jnp.float32).reshape(n_pad, 1)
    sub_t, sup_t = _subtile_pallas_t(
        xu_scan, lam_col, qn_pad, lamq_pad.reshape(1, q_pad),
        jnp.asarray(tau, dtype=jnp.float32), q_block=q_block,
        col_tile=col_tile, interpret=interpret)  # [N/64, Qp], [N/1024, Qp]

    # The block-max bound needs s_keep >= topk (each kept subtile can
    # contribute one distinct better item); keep S*W lane-aligned
    # (S a multiple of 128/W so the phase-b out block is % 128).
    align = max(1, 128 // SUBTILE)
    s_keep = max(n_subtiles_keep, topk)
    s_keep = ((s_keep + align - 1) // align) * align
    s_keep = min(s_keep, n_pad // SUBTILE)
    n_real = jnp.asarray(n_real, dtype=jnp.int32)
    n_sub = n_pad // SUBTILE
    tau32 = jnp.asarray(tau, dtype=jnp.float32)
    lam32 = lambdas.astype(jnp.float32)
    lamq32 = lam_q.astype(jnp.float32)
    # The subtile containing n_real (when n_real % SUBTILE != 0) mixes real
    # and zero-pad rows; a pad row scores (1-tau)/(1+|lam_pad-lam_q|) ~ 0.1
    # in phase a, which can inflate that subtile's routing max above real
    # subtiles' and evict one from the top-s_keep (losing true top-k items
    # when s_keep has no slack — r3 review).  Rescore its rows with the
    # same dtype/blend as phase a, masked to real rows only, and overwrite
    # its routing max (the scatter drops when n_real lands on a subtile
    # boundary past the end).  All selection-stage work stays in phase a's
    # transposed [n_sub, Q_pad] layout.
    last_sub = n_real // SUBTILE
    blk_start = last_sub * SUBTILE
    blk = jax.lax.dynamic_slice(xu_scan, (blk_start, jnp.int32(0)),
                                (SUBTILE, f))
    blk_lam = jax.lax.dynamic_slice(lam32, (blk_start,), (SUBTILE,))
    blk_rows = (jnp.minimum(blk_start, n_pad - SUBTILE)
                + jnp.arange(SUBTILE, dtype=jnp.int32))
    blk_cos = jax.lax.dot_general(
        qn_pad, blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [Q_pad, SUBTILE]
    lamq_p32 = lamq_pad
    blk_prox = 1.0 / (1.0 + jnp.abs(blk_lam[None, :] - lamq_p32[:, None]))
    blk_score = tau32 * blk_cos + (1.0 - tau32) * blk_prox
    blk_score = jnp.where(blk_rows[None, :] < n_real, blk_score, _NEG_INF)
    sub_t = sub_t.at[last_sub].set(jnp.max(blk_score, axis=1), mode="drop")
    # Fully-padded subtiles can't route; mask them with the per-id
    # sentinel (NOT _NEG_INF — see _mask_sentinel).
    sub_ids_col = jnp.arange(n_sub, dtype=jnp.int32)
    sub_t = jnp.where(sub_ids_col[:, None] * SUBTILE < n_real, sub_t,
                      _mask_sentinel(sub_ids_col)[:, None])

    if n_sub <= _SINGLE_LEVEL_MAX_NSUB:
        # One-level top-S directly on the transposed score matrix: no
        # [Q, n_sub] transpose, no cand-id array, no refine gather (the
        # previous two-level chain's take_along_axis refine alone cost
        # 65 ms at 1M x 768 x Q16384 — measured r3; this path ~10 ms).
        sub_sel = _extract_ids_pallas_t(sub_t, m_pool=s_keep,
                                        interpret=interpret)[:q]
    else:
        # Beyond ~2M rows the [n_sub, qb] block no longer fits VMEM;
        # fall back to the two-level select: the top-S supertiles
        # provably contain the top-S subtiles (block-max argument one
        # level up), so a [Q, N/1024] select + 256-wide refine is exact.
        group = col_tile // SUBTILE
        n_tiles = n_pad // col_tile
        sup_keep = min(s_keep, n_tiles)
        # The supertile containing the partial subtile inherits the same
        # pad inflation — recompute its max from the corrected sub_t.
        tile_ids_col = jnp.arange(n_tiles, dtype=jnp.int32)
        last_tile = last_sub // group
        tile_rows = jax.lax.dynamic_slice(
            sub_t, (jnp.minimum(last_tile, n_tiles - 1) * group,
                    jnp.int32(0)), (group, q_pad))
        sup_t = sup_t.at[last_tile].set(jnp.max(tile_rows, axis=0),
                                        mode="drop")
        sup_t = jnp.where(tile_ids_col[:, None] * col_tile < n_real,
                          sup_t, _mask_sentinel(tile_ids_col)[:, None])
        sub_max = sub_t.T[:q]
        if sup_keep * group >= s_keep and n_tiles > sup_keep:
            sup_max = sup_t.T[:q]
            tile_ids = jnp.broadcast_to(tile_ids_col[None, :], (q, n_tiles))
            sup_sel = _extract_pool_pallas(sup_max, tile_ids,
                                           m_pool=sup_keep,
                                           interpret=interpret)  # [Q, S]
            cand_sub = (sup_sel[:, :, None] * group
                        + jnp.arange(group,
                                     dtype=jnp.int32)[None, None, :])
            cand_sub = cand_sub.reshape(q, sup_keep * group)
            sub_vals = jnp.take_along_axis(sub_max, cand_sub, axis=1)
            sub_sel = _extract_pool_pallas(sub_vals, cand_sub,
                                           m_pool=s_keep,
                                           interpret=interpret)
        else:
            sub_ids = jnp.broadcast_to(sub_ids_col[None, :],
                                       sub_max.shape)
            sub_sel = _extract_pool_pallas(sub_max, sub_ids,
                                           m_pool=s_keep,
                                           interpret=interpret)

    m_pool = min(pool_m if pool_m is not None else topk,
                 s_keep * SUBTILE)
    m_pool = max(m_pool, min(topk, s_keep * SUBTILE))
    k_out = topk

    # Phase b: fused gather+dot Pallas kernel -- each query's selected
    # subtiles stream through VMEM as ~96 KB contiguous DMAs with the dot
    # applied in place; nothing [Q, S, W, F]-sized ever materializes.
    # (XLA formulations of this stage measured 220-400 ms at 1M x 768:
    # a batched-matvec dot relayouts the gathered blocks first, an
    # elementwise multiply+lane-reduce casts them to f32 first.)
    xb3 = xu_scan.reshape(n_pad // SUBTILE, SUBTILE, f)
    cos_b = _gather_score_pallas(xb3, qn_scan.reshape(q, 1, f),
                                 sub_sel, s_keep=s_keep,
                                 interpret=interpret)   # [Q, S*W]
    cand = (sub_sel[:, :, None] * SUBTILE
            + jnp.arange(SUBTILE, dtype=jnp.int32)[None, None, :])
    cand = cand.reshape(q, s_keep * SUBTILE)            # [Q, S*W]
    lam_b = lam32.reshape(n_pad // SUBTILE,
                          SUBTILE)[sub_sel].reshape(q, s_keep * SUBTILE)
    prox = 1.0 / (1.0 + jnp.abs(lam_b - lamq32[:, None]))
    score_b = tau32 * cos_b + (1.0 - tau32) * prox
    score_b = jnp.where(cand < n_real, score_b, _mask_sentinel(cand))

    # Pool cut: VMEM-resident sequential max-extraction (Pallas) beats a
    # sort-based top_k up to several dozen extractions — the XLA scan
    # form already measured 17 ms for 15 vs 61 ms for top_k(64) at
    # Q=16384, and the kernel removes the per-iteration HBM round-trip.
    if m_pool <= 48:
        pool_idx = _extract_pool_pallas(score_b, cand, m_pool=m_pool,
                                        interpret=interpret)
    else:
        _, pos = jax.lax.top_k(score_b, m_pool)
        pool_idx = jnp.take_along_axis(cand, pos, axis=1)

    # Phase c: exact f32 rescore of the pool (m_pool rows per query).
    qn32 = qn.astype(jnp.float32)
    xc = xu_f32[pool_idx]                               # [Q, m, F]
    cos = jnp.einsum("qmf,qf->qm", xc, qn32,
                     preferred_element_type=jnp.float32)
    proxp = 1.0 / (1.0 + jnp.abs(lam32[pool_idx] - lamq32[:, None]))
    s = tau32 * cos + (1.0 - tau32) * proxp
    s = jnp.where(pool_idx < n_real, s, _NEG_INF)
    vals, posk = jax.lax.top_k(s, k_out)
    return jnp.take_along_axis(pool_idx, posk, axis=1), vals


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
