"""Bitrot guard: every protocol port imports cleanly and exposes main()."""

import importlib.util
import pathlib

import pytest

BENCH_DIR = pathlib.Path(__file__).resolve().parent.parent / "benchmarks"
SCRIPTS = sorted(p for p in BENCH_DIR.glob("bench_*.py"))


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: p.stem)
def test_protocol_imports(path):
    spec = importlib.util.spec_from_file_location(path.stem, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert hasattr(mod, "main"), path.stem


def test_all_ten_protocols_present():
    stems = {p.stem.split("_")[1] for p in SCRIPTS}
    assert {"0", "1", "2", "3", "4", "5", "6", "7", "8", "9"} <= stems
