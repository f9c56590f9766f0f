"""Pinned EnergyMaps regression config (port of
tests/test_9_CVE_db_fixed_eta.py): eta=0.05, steps=4 only."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.protocols import (force_cpu_if_requested,
                                  heteroscedastic_clusters, out_dir,
                                  save_csv, save_json)

force_cpu_if_requested()

from benchmarks.bench_8_energy_sweep import run_sweep


def main():
    corpus, _, _, _ = heteroscedastic_clusters(
        n_groups=80, per_group=21, dim=384, scaling=12.0)
    rows, t_std = run_sweep(corpus, etas=[0.05], steps_list=[4])
    d = out_dir("energy_fixed")
    save_csv(d / "diffusion_sweep_results.csv", rows)
    save_json(d / "summary.json",
              {"protocol": "energy_fixed (test_9 port)",
               "standard_build_s": t_std, "config": rows[0]})


if __name__ == "__main__":
    main()
