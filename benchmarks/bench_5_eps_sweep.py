"""Eps sweep with per-config build-time and failure tracking (port of
tests/test_5_msmarco_eps_sweep.py: eps = BASE_EPS * {0.5, 1.0, 1.5}; each
config's failure is isolated and recorded as FAILED, the sweep continues)."""

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.protocols import (force_cpu_if_requested, out_dir, save_json,
                                  synthetic_duplicates, timed)

force_cpu_if_requested()

from pyarrowspace_tpu import ArrowSpaceBuilder
from pyarrowspace_tpu.eval.ir import evaluate_run

BASE_EPS = 10.0
EPS_VALUES = [BASE_EPS * m for m in (0.5, 1.0, 1.5)]   # test_5:19-23
TAU = 0.62
K_EVAL = 10


def main():
    corpus, groups = synthetic_duplicates(
        n_groups=300, per_group=50, dim=768, noise=0.3, scaling=100.0)
    rng = np.random.default_rng(5)
    qidx = rng.choice(corpus.shape[0], size=50, replace=False)
    # Ambiguous queries: each mixes in a distractor cluster's direction so
    # retrieval is genuinely hard and metrics move across configs (pure
    # in-cluster noise leaves high-dim clusters trivially separable).
    distractor = corpus[rng.permutation(qidx)]
    queries = (0.7 * corpus[qidx] + 0.68 * distractor
               + 0.1 * np.abs(corpus).mean() * rng.normal(
                   size=(50, corpus.shape[1])))
    relevant = [groups[qi // 50] - {qi} for qi in qidx]

    sweep = {}
    for eps in EPS_VALUES:
        gp = {"eps": eps, "k": 25, "topk": 15, "p": 2.0, "sigma": None}
        try:
            (aspace, gl), t_build = timed(ArrowSpaceBuilder.build, gp, corpus)
            retrieved = [[i for i, _ in aspace.search(q, gl, TAU)]
                         for q in queries]
            run = evaluate_run(retrieved, relevant, k=K_EVAL)
            sweep[str(eps)] = {
                "status": "OK", "build_time_s": t_build,
                **{k: v for k, v in run.items() if k.startswith("mean")}}
        except Exception as e:  # failure isolation (reference test_5:181-216)
            sweep[str(eps)] = {"status": "FAILED", "error": repr(e)}
            traceback.print_exc()
        print(f"eps={eps}: {sweep[str(eps)]}")

    save_json(out_dir("eps_sweep") / "beir_eps_sweep_results.json",
              {"protocol": "eps_sweep (test_5 port)", "tau": TAU,
               "sweep": sweep})


if __name__ == "__main__":
    main()
