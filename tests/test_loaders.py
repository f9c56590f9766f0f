"""Raw-data ingestion front (pyarrowspace_tpu.data): CVE JSON iteration +
text extraction against the checked-in fixture tree, and the end-to-end
fixture -> hash_embed -> build -> search flow (the reference's
test_2_CVE_db.py:71-154 stage, VERDICT r2 item 8)."""

import json
from pathlib import Path

import numpy as np
import pytest

from pyarrowspace_tpu.data import (extract_cve_text, iter_cve_json,
                                   load_cve_corpus)

FIXTURES = Path(__file__).resolve().parent / "fixtures" / "cve"


def test_iter_cve_json_skips_malformed_and_filters_years():
    recs = dict(iter_cve_json(str(FIXTURES)))
    ids = {r.get("cveMetadata", {}).get("cveId") for r in recs.values()}
    # 6 parseable fixtures; CVE-2023-90006.json is malformed and skipped.
    assert len(recs) == 6, sorted(recs)
    assert "CVE-2021-90001" in ids and "CVE-2023-90005" in ids
    # year filter: only 2021 records when the range excludes 2023
    recs21 = dict(iter_cve_json(str(FIXTURES), start=2021, end=2021))
    assert len(recs21) == 4
    assert all("2021" in p for p in recs21)


def test_extract_cve_text_fields():
    path = FIXTURES / "2021" / "CVE-2021-90001.json"
    cid, title, text = extract_cve_text(json.loads(path.read_text()))
    assert cid == "CVE-2021-90001"
    assert title == "Heap overflow in image parser"
    # " | "-joined field order: id, title, description, CWE, CVSS, products
    parts = text.split(" | ")
    assert parts[0] == cid and parts[1] == title
    assert "heap buffer" in parts[2]
    assert parts[3] == "CWE-122"
    assert parts[4].startswith("CVSS:3.1/")
    assert parts[5] == "examplesoft imagelib"


def test_extract_cve_text_minimal_record():
    path = FIXTURES / "2021" / "CVE-2021-90007.json"
    cid, title, text = extract_cve_text(json.loads(path.read_text()))
    assert cid == "CVE-2021-90007"
    assert title == "(no title)"   # reference placeholder behavior
    assert "Minimal record description." in text


def test_cve_fixture_end_to_end_hash_embed():
    """Fixture tree -> extract -> hash_embed -> x12 scale -> build ->
    search at the protocol taus: the full raw-text path of bench_2."""
    from pyarrowspace_tpu import ArrowSpaceBuilder
    from pyarrowspace_tpu.models import hash_embed

    ids, titles, texts = load_cve_corpus(str(FIXTURES))
    assert len(ids) == 6 and all(texts)
    emb = hash_embed(texts, dim=384).astype(np.float64) * 12.0
    assert emb.shape == (6, 384)
    gp = {"eps": 1.31, "k": 4, "topk": 3, "p": 2.0, "sigma": 0.535}
    aspace, gl = ArrowSpaceBuilder.build(gp, emb)
    hits = aspace.search(emb[0] * 1.02, gl, 0.62)
    assert hits[0][0] == 0    # a near-copy query retrieves its record
    assert len(hits) == 3


@pytest.mark.slow
def test_bench2_loads_cve_dir(monkeypatch, tmp_path):
    """bench_2's input resolution honors ARROWSPACE_CVE_DIR."""
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from benchmarks.bench_2_corpus_tail import load_corpus
    monkeypatch.setenv("ARROWSPACE_CVE_DIR", str(FIXTURES))
    corpus = load_corpus()
    assert corpus.shape[0] == 6


@pytest.mark.slow
def test_hf_loaders_fail_cleanly_offline(monkeypatch):
    """The HF loaders are optional-import: in a zero-egress env they must
    raise (ImportError or a datasets offline error), not hang or return
    garbage."""
    monkeypatch.setenv("HF_DATASETS_OFFLINE", "1")
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    from pyarrowspace_tpu.data import load_beir_msmarco, load_quora_duplicates
    for fn in (lambda: load_quora_duplicates(sample=10),
               lambda: load_beir_msmarco(corpus_size=10)):
        with pytest.raises(Exception):
            fn()


def test_iter_cve_json_year_in_root_dir_does_not_defeat_filter(tmp_path):
    """r3 review regression: the year filter used to substring-match the
    WHOLE path, so a year-like token in root_dir (e.g. .../cve_2023_dump)
    satisfied any range and the [start, end] filter was a no-op."""
    import shutil
    root = tmp_path / "cve_2023_dump"
    shutil.copytree(FIXTURES, root)
    recs = dict(iter_cve_json(str(root), start=1999, end=2001))
    assert len(recs) == 0, sorted(recs)
    recs21 = dict(iter_cve_json(str(root), start=2021, end=2021))
    assert len(recs21) == 4
    # flat layout: the year comes from the CVE id in the filename
    flat = tmp_path / "flat"
    flat.mkdir()
    for p in (FIXTURES / "2021").glob("*.json"):
        shutil.copy(p, flat / p.name)
    assert len(dict(iter_cve_json(str(flat), start=2021, end=2021))) == 4
    assert len(dict(iter_cve_json(str(flat), start=2023, end=2023))) == 0
