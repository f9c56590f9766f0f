"""Shared harness utilities for the evaluation-protocol ports.

The reference's tests/ directory is an evaluation harness (SURVEY.md §2.3):
standalone scripts that load a dataset, embed it, scale the embeddings,
build the index, run searches at several tau values, and emit
JSON/CSV/metric summaries.  The scripts in this directory port each
protocol 1:1 (bench_N_* ↔ reference test_N_*).

Datasets: the reference pulls Quora/CVE/MS MARCO via HuggingFace
`datasets` + sentence-transformers.  This environment is zero-egress, so
every script falls back to a synthetic clustered corpus with planted
ground-truth (duplicate groups) of the same shape, and uses the real
dataset when it is available locally (HF_DATASETS_OFFLINE cache or
ARROWSPACE_DATA_DIR with .npy exports).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np

OUTPUT_DIR = Path(os.environ.get("ARROWSPACE_BENCH_OUT", "benchmarks/output"))


def out_dir(name: str) -> Path:
    d = OUTPUT_DIR / f"{int(time.time())}_{name}"
    d.mkdir(parents=True, exist_ok=True)
    return d


def synthetic_duplicates(n_groups: int, per_group: int, dim: int,
                         noise: float = 0.15, scaling: float = 100.0,
                         seed: int = 42):
    """Clustered corpus with planted duplicate groups.

    Returns (corpus [n_groups*per_group, dim] float64, groups: list of
    index sets).  Mirrors the duplicate-question structure of the Quora
    protocol: queries drawn from a group should retrieve that group.
    """
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_groups, dim))
    corpus = (np.repeat(base, per_group, axis=0)
              + noise * rng.normal(size=(n_groups * per_group, dim)))
    corpus *= scaling
    groups = [set(range(g * per_group, (g + 1) * per_group))
              for g in range(n_groups)]
    return corpus.astype(np.float64), groups


def heteroscedastic_clusters(n_groups: int, per_group: int, dim: int,
                             seed: int = 42,
                             scale_range: tuple = (0.6, 1.8),
                             noise_range: tuple = (0.08, 0.5),
                             scaling: float = 100.0):
    """Clustered corpus whose clusters differ in NORM and NOISE level.

    Per-cluster scale jitter is invisible to cosine (direction-preserving)
    but drives the unnormalized Dirichlet energy — and therefore lambda —
    apart across clusters, so the (1-tau) lambda-proximity term carries
    information cosine doesn't.  This reproduces the reference's recorded
    parameter response (recall@10 0.91 -> 0.89 -> 0.86 across tau
    1.0 -> 0.62 -> 0.42, tests/output/1761063804_v0_17_msmarco_tausweep),
    which a homoscedastic planted-cluster corpus cannot: equal norms and
    noise collapse every lambda to the same value and the sweep goes flat.

    Returns (corpus [n_groups*per_group, dim] f64, groups, scales, noises).
    """
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_groups, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    scales = np.exp(rng.uniform(np.log(scale_range[0]),
                                np.log(scale_range[1]), n_groups))
    noises = np.exp(rng.uniform(np.log(noise_range[0]),
                                np.log(noise_range[1]), n_groups))
    pts = (base[:, None, :]
           + (noises / np.sqrt(dim))[:, None, None]
           * rng.normal(size=(n_groups, per_group, dim)))
    corpus = (pts * scales[:, None, None]).reshape(-1, dim) * scaling
    groups = [set(range(g * per_group, (g + 1) * per_group))
              for g in range(n_groups)]
    return corpus.astype(np.float64), groups, scales, noises


def ambiguous_single_relevant_queries(corpus: np.ndarray, n_queries: int,
                                      seed: int = 3,
                                      distractor_weight: float = 0.6,
                                      jitter: float = 0.05):
    """Single-relevant-item IR protocol (the reference's qrels shape: most
    MS MARCO queries have exactly one positive passage).

    Each query mixes its source item with a random distractor item from
    another cluster: q = x_i + b*x_d + jitter*noise.  The distractor pulls
    cosine toward a wrong cluster AND shifts the query's spectral profile,
    so tau < 1 re-ranks near-margin queries.  Returns (queries [Q, F],
    relevant: list[set[int]] with one id each).
    """
    rng = np.random.default_rng(seed)
    n = corpus.shape[0]
    qidx = rng.choice(n, size=n_queries, replace=False)
    didx = rng.permutation(qidx)
    # A (lo, hi) distractor_weight draws a PER-QUERY weight: real query
    # sets have a continuous difficulty spectrum, so some queries always
    # sit at the ranking margin — a fixed weight concentrates every
    # margin at the same value (high-dim cosine concentration) and then
    # no config perturbation can flip anything.
    if isinstance(distractor_weight, (tuple, list)):
        dw = rng.uniform(distractor_weight[0], distractor_weight[1],
                         size=(n_queries, 1))
    else:
        dw = distractor_weight
    queries = (corpus[qidx] + dw * corpus[didx]
               + jitter * np.abs(corpus).mean()
               * rng.normal(size=(n_queries, corpus.shape[1])))
    relevant = [{int(qi)} for qi in qidx]
    return queries, relevant


def spectral_margin_protocol(n_groups=24, per_group=40, dim=256,
                             n_queries=60, seed=11, hn_frac=0.15,
                             cos_margin=(0.004, 0.07), jitter=0.05,
                             sib_weight=(0.35, 0.8), cross_frac=0.2,
                             cross_weight=(1.05, 1.7),
                             noise=0.15, scaling=100.0,
                             scale_range=(0.6, 1.8), min_scale_ratio=1.25):
    """The lambda-HELPS regime (reference flagship direction): a corpus
    where tau=0.62 IMPROVES MRR/nDCG over cosine with recall@10 tied —
    the reference's recorded MS MARCO result (MRR +2.37%, nDCG +1.78%,
    recall tied 0.91, tests/output/1761063134_v0_17_beir-msmarco/
    beir_evaluation_results.json).  Three planted mechanisms:

    - heteroscedastic clusters: per-cluster norms drive lambda apart
      (cosine-invisible), so lambda identifies the query's home cluster;
    - HARD NEGATIVES: for hn_frac of queries, a corpus item in a
      different-NORM cluster is replanted to beat the relevant item by a
      small cosine margin.  Cosine ranks it first; the (1-tau) lambda
      term demotes it (its norm-driven lambda is off-cluster) — MRR and
      nDCG improve while both items stay in the top-10 (recall tied);
    - sibling mixing + an irrecoverable cross-cluster fraction set the
      difficulty band (hurt cosine and lambda-aware equally).

    Queries are rescaled to their cluster's MEAN norm so lambda_q tracks
    the cluster, not the item (an exact-item norm match would leak the
    answer through the lambda channel).

    Returns (corpus f64, queries f64, relevant single-item sets,
    n_planted).
    """
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_groups, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    scales = np.exp(rng.uniform(np.log(scale_range[0]),
                                np.log(scale_range[1]), n_groups))
    pts = base[:, None, :] + (noise / np.sqrt(dim)) * rng.normal(
        size=(n_groups, per_group, dim))
    corpus = (pts * scales[:, None, None]).reshape(-1, dim) * scaling

    n = n_groups * per_group
    src = rng.choice(n, size=n_queries, replace=False)
    sib = np.array([g0 * per_group + (i - g0 * per_group
                    + rng.integers(1, per_group)) % per_group
                    for i, g0 in zip(src, src // per_group)])
    bw = rng.uniform(*sib_weight, size=(n_queries, 1))
    queries = corpus[src] + bw * corpus[sib]
    n_cross = int(round(cross_frac * n_queries))
    cross_rows = rng.permutation(n_queries)[:n_cross]
    dsrc = rng.choice(n, size=n_queries, replace=False)
    cw = rng.uniform(*cross_weight, size=(n_queries, 1))
    queries[cross_rows] += cw[cross_rows] * corpus[dsrc[cross_rows]]
    queries += (jitter * np.linalg.norm(queries, axis=1, keepdims=True)
                / np.sqrt(dim) * rng.normal(size=(n_queries, dim)))
    cl_norm = scales[src // per_group] * scaling * (1 + noise ** 2) ** 0.5
    queries *= (cl_norm[:, None]
                / np.linalg.norm(queries, axis=1, keepdims=True))
    relevant = [{int(i)} for i in src]

    n_hn = int(round(hn_frac * n_queries))
    hn_rows = [r for r in rng.permutation(n_queries)[:n_hn]
               if r not in set(cross_rows)]
    used = set(int(i) for i in src) | set(int(s) for s in sib)
    n_planted = 0
    for k in hn_rows:
        i = src[k]
        g = i // per_group
        ratios = np.maximum(scales / scales[g], scales[g] / scales)
        cands = [h for h in np.argsort(-ratios) if h != g
                 and ratios[h] >= min_scale_ratio]
        if not cands:
            continue
        h = int(cands[int(rng.integers(0, min(6, len(cands))))])
        victim = next((j for j in range(h * per_group, (h + 1) * per_group)
                       if j not in used), None)
        if victim is None:
            continue
        used.add(victim)
        q = queries[k]
        u = q / np.linalg.norm(q)
        c0 = float(corpus[i] @ u / np.linalg.norm(corpus[i]))
        c = min(c0 + rng.uniform(*cos_margin), 0.9995)
        w = rng.normal(size=dim)
        w -= (w @ u) * u
        w /= np.linalg.norm(w)
        corpus[victim] = ((c * u + np.sqrt(max(1 - c * c, 0.0)) * w)
                          * scales[h] * scaling * (1 + noise ** 2) ** 0.5)
        n_planted += 1
    return (corpus.astype(np.float64), queries.astype(np.float64),
            relevant, n_planted)


def load_beir_export(name: str = "msmarco"):
    """Load real pre-exported embeddings + qrels from ARROWSPACE_DATA_DIR.

    Expected files (exported by running the reference harness's embedding
    stage, tests/test_3_beir.py:66-82):
      {name}_corpus.npy   [N, F] float corpus embeddings
      {name}_queries.npy  [Q, F] float query embeddings
      {name}_qrels.json   {"<query_idx>": [corpus_idx, ...]}  OR
      {name}_qrels.npy    [M, 2] int (query_idx, corpus_idx) pairs
    Returns (corpus, queries, relevant: list[set[int]]) or None.
    """
    data_dir = os.environ.get("ARROWSPACE_DATA_DIR")
    if not data_dir:
        return None
    d = Path(data_dir)
    cpath, qpath = d / f"{name}_corpus.npy", d / f"{name}_queries.npy"
    if not (cpath.exists() and qpath.exists()):
        return None
    corpus, queries = np.load(cpath), np.load(qpath)
    relevant = [set() for _ in range(queries.shape[0])]
    jq, nq = d / f"{name}_qrels.json", d / f"{name}_qrels.npy"
    if jq.exists():
        for k, v in json.loads(jq.read_text()).items():
            relevant[int(k)] = set(int(c) for c in v)
    elif nq.exists():
        for q, c in np.load(nq):
            relevant[int(q)].add(int(c))
    else:
        raise FileNotFoundError(f"no {name}_qrels.json/.npy in {data_dir}")
    return corpus, queries, relevant


def corpus_stats(corpus: np.ndarray, sample: int = 4096, seed: int = 0):
    """Generator-agnostic corpus statistics that predict whether the
    lambda channel carries retrieval information (the bench_10 regime
    study maps these to measured ΔMRR vs cosine):

      norm_cv       std/mean of row L2 norms — norm heteroscedasticity,
                    the statistic the unnormalized Dirichlet energy (and
                    so lambda) keys on; cosine is blind to it.
      log_norm_std  std of log row norms (scale-mixture width, robust to
                    a heavy norm tail).
      anisotropy    top-eigenvalue fraction of the covariance spectrum
                    (1/F = isotropic; sentence embeddings are known to
                    concentrate mass in a few directions).
      intrinsic_dim TwoNN estimate (reduction/pipeline.py).

    Compute the SAME stats on a real embedding export (load_beir_export)
    to locate it on the recorded bench_10 sweep — docs/QUALITY.md
    runbook."""
    rng = np.random.default_rng(seed)
    x = np.asarray(corpus, dtype=np.float64)
    if x.shape[0] > sample:
        x = x[rng.choice(x.shape[0], size=sample, replace=False)]
    norms = np.linalg.norm(x, axis=1)
    xc = x - x.mean(axis=0, keepdims=True)
    # Top-eigenvalue fraction via the Gram spectrum (F can exceed sample).
    sv = np.linalg.svd(xc, compute_uv=False)
    ev = sv * sv
    from pyarrowspace_tpu.reduction.pipeline import twonn_intrinsic_dim
    id_dim, _ = twonn_intrinsic_dim(x.astype(np.float32))
    return {
        "norm_cv": float(norms.std() / max(norms.mean(), 1e-30)),
        "log_norm_std": float(np.log(np.maximum(norms, 1e-30)).std()),
        "anisotropy": float(ev[0] / max(ev.sum(), 1e-30)),
        "intrinsic_dim": int(id_dim),
    }


def try_load_real_embeddings(name: str):
    """Load pre-exported embeddings from ARROWSPACE_DATA_DIR/{name}.npy if
    present (the path for users who ran the reference's embedding stage)."""
    data_dir = os.environ.get("ARROWSPACE_DATA_DIR")
    if not data_dir:
        return None
    path = Path(data_dir) / f"{name}.npy"
    if path.exists():
        return np.load(path)
    return None


def timed(fn, *args, **kwargs):
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    return out, time.perf_counter() - t0


def save_json(path: Path, obj) -> None:
    path.write_text(json.dumps(obj, indent=2, default=float))
    print(f"wrote {path}")


def save_csv(path: Path, rows: list[dict]) -> None:
    if not rows:
        return
    cols = list(rows[0].keys())
    lines = [",".join(cols)]
    lines += [",".join(str(r.get(c, "")) for c in cols) for r in rows]
    path.write_text("\n".join(lines) + "\n")
    print(f"wrote {path}")


def save_parquet(path: Path, embeddings: np.ndarray,
                 ids: list | None = None) -> bool:
    """Export embeddings to parquet (the reference harness ships an
    embeddings parquet exporter, tests/test_2_CVE_db.py:130-144).
    Returns False when pandas/pyarrow are unavailable."""
    try:
        import pandas as pd
        df = pd.DataFrame({
            "id": ids if ids is not None else list(range(len(embeddings))),
            "embedding": [row.tolist() for row in np.asarray(embeddings)],
        })
        df.to_parquet(path)
        print(f"wrote {path}")
        return True
    except Exception as e:
        print(f"parquet export unavailable: {e}")
        return False


def force_cpu_if_requested() -> None:
    """Honor ARROWSPACE_CPU=1 (useful off-TPU); must run before JAX init."""
    if os.environ.get("ARROWSPACE_CPU") == "1":
        import jax
        jax.config.update("jax_platforms", "cpu")
