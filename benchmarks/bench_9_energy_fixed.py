"""Pinned EnergyMaps regression config (port of
tests/test_9_CVE_db_fixed_eta.py): eta=0.05, steps=4 only."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.protocols import (force_cpu_if_requested,
                                  heteroscedastic_clusters, out_dir,
                                  save_csv, save_json)

force_cpu_if_requested()

from benchmarks.bench_8_energy_sweep import run_sweep


def main():
    import os
    # BENCH_GROUPS=1133 BENCH_PER_GROUP=277 reproduces the reference's
    # 313,841-item fixed-config anchor exactly (tests/output/
    # 1761239603_v0_18_energymaps_9_fixed: graph_nodes=120, MRR 0.6667,
    # nDCG 0.6644); the default stays CPU-tractable.
    n_groups = int(os.environ.get("BENCH_GROUPS", 80))
    per_group = int(os.environ.get("BENCH_PER_GROUP", 21))
    corpus, _, _, _ = heteroscedastic_clusters(
        n_groups=n_groups, per_group=per_group, dim=384, scaling=12.0)
    corpus = corpus.astype(np.float32) if os.environ.get(
        "BENCH_F32") == "1" else corpus
    rows, t_std = run_sweep(corpus, etas=[0.05], steps_list=[4])
    d = out_dir("energy_fixed")
    save_csv(d / "diffusion_sweep_results.csv", rows)
    save_json(d / "summary.json",
              {"protocol": "energy_fixed (test_9 port)",
               "dataset_size": int(corpus.shape[0]),
               "standard_build_s": t_std, "config": rows[0]})


if __name__ == "__main__":
    main()
