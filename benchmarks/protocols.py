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
