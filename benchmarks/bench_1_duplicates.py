"""Duplicate-group recall@10: cosine vs lambda-aware.

Port of the reference's Quora duplicate-questions protocol
(tests/test_1_quora_questions.py): 30k-style corpus of duplicate groups,
x100 scaling, graph {eps 0.5, k 4, topk 10, p 2, sigma 0.25}, ALPHA-blend
vs pure cosine recall@10.  Synthetic planted-duplicates fallback (zero
egress); real embeddings picked up from ARROWSPACE_DATA_DIR/quora.npy.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.protocols import (force_cpu_if_requested, out_dir, save_json,
                                  synthetic_duplicates, timed,
                                  try_load_real_embeddings)

force_cpu_if_requested()

from pyarrowspace_tpu import ArrowSpaceBuilder

TAU = 0.62          # reference ALPHA=0.62 (test_1:14)
K_EVAL = 10
GRAPH_PARAMS = {"eps": 0.5, "k": 4, "topk": K_EVAL, "p": 2.0, "sigma": 0.25}


def main():
    emb = try_load_real_embeddings("quora")
    if emb is not None:
        corpus, groups = emb, None
        print(f"using real embeddings: {corpus.shape}")
    else:
        corpus, groups = synthetic_duplicates(
            n_groups=3000, per_group=10, dim=384, scaling=100.0)
        print(f"synthetic duplicate corpus: {corpus.shape}")

    (aspace, gl), t_build = timed(ArrowSpaceBuilder.build, GRAPH_PARAMS,
                                  corpus)
    print(f"build: {t_build:.2f}s  nnodes={gl.nnodes}")

    rng = np.random.default_rng(7)
    n_queries = 100
    qidx = rng.choice(corpus.shape[0], size=n_queries, replace=False)
    queries = corpus[qidx] + 0.05 * np.abs(corpus).mean() * rng.normal(
        size=(n_queries, corpus.shape[1]))

    from pyarrowspace_tpu.eval.ir import recall_at_k

    rec_cos, rec_lam = [], []
    for qi, q in zip(qidx, queries):
        relevant = (groups[qi // 10] - {qi}) if groups else set()
        cos_hits = [i for i, _ in aspace.search(q, gl, 1.0)]
        lam_hits = [i for i, _ in aspace.search(q, gl, TAU)]
        if relevant:
            rec_cos.append(recall_at_k(cos_hits, relevant, K_EVAL))
            rec_lam.append(recall_at_k(lam_hits, relevant, K_EVAL))

    results = {
        "protocol": "duplicates_recall (test_1 port)",
        "n_items": int(corpus.shape[0]),
        "build_time_s": t_build,
        "tau": TAU,
        "recall@10_cosine": float(np.mean(rec_cos)) if rec_cos else None,
        "recall@10_lambda": float(np.mean(rec_lam)) if rec_lam else None,
        "n_queries": len(rec_cos),
    }
    print(results)
    save_json(out_dir("duplicates") / "results.json", results)


if __name__ == "__main__":
    main()
