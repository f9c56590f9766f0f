"""Export real-dataset embeddings for the protocol ports.

Runs the reference harness's embedding stage (tests/test_3_beir.py:24-82,
129-190: BeIR MS MARCO via HuggingFace datasets + sentence-transformers
mpnet-768) and writes the ARROWSPACE_DATA_DIR files the benches consume:

    msmarco_corpus.npy    [N, 768] float32 corpus embeddings (UNscaled —
                          the benches apply the reference's x100)
    msmarco_queries.npy   [Q, 768] float32 query embeddings
    msmarco_qrels.json    {"<query_idx>": [corpus_idx, ...]}

Usage (requires network + the reference harness deps:
datasets, sentence-transformers):

    python scripts/export_embeddings.py --out /data/arrowspace \
        [--corpus-size 200000] [--model sentence-transformers/all-mpnet-base-v2]

then run any IR protocol port against real data:

    ARROWSPACE_DATA_DIR=/data/arrowspace python benchmarks/bench_3_ir_eval.py
    ARROWSPACE_DATA_DIR=/data/arrowspace python benchmarks/bench_4_tau_sweep.py
    ARROWSPACE_DATA_DIR=/data/arrowspace python benchmarks/bench_5_eps_sweep.py

This environment is zero-egress (no datasets, no model weights), so the
script is the documented bridge for reproducing the reference's recorded
quality tables (BASELINE.md) on real embeddings.
"""

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--corpus-size", type=int, default=200_000,
                    help="corpus cap (reference test_3_beir.py:49-50)")
    ap.add_argument("--num-queries", type=int, default=200)
    ap.add_argument("--model",
                    default="sentence-transformers/all-mpnet-base-v2")
    ap.add_argument("--dataset", default="BeIR/msmarco")
    args = ap.parse_args()

    import numpy as np
    from datasets import load_dataset
    from sentence_transformers import SentenceTransformer

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    corpus_ds = load_dataset(args.dataset, "corpus", split="corpus")
    queries_ds = load_dataset(args.dataset, "queries", split="queries")
    qrels_ds = load_dataset(args.dataset + "-qrels", split="validation")

    # Reference qrels handling (test_3_beir.py:66-82): keep positives whose
    # passage made the corpus cap.
    corpus_texts, corpus_id_to_idx = [], {}
    for row in corpus_ds:
        if len(corpus_texts) >= args.corpus_size:
            break
        text = ((row.get("title") or "") + " " + row["text"]).strip()
        corpus_id_to_idx[row["_id"]] = len(corpus_texts)
        corpus_texts.append(text)

    wanted_q = {}
    for row in qrels_ds:
        if int(row["score"]) > 0 and row["corpus-id"] in corpus_id_to_idx:
            wanted_q.setdefault(str(row["query-id"]), []).append(
                corpus_id_to_idx[row["corpus-id"]])

    query_texts, qrels = [], {}
    for row in queries_ds:
        qid = str(row["_id"])
        if qid in wanted_q and len(query_texts) < args.num_queries:
            qrels[str(len(query_texts))] = wanted_q[qid]
            query_texts.append(row["text"])

    model = SentenceTransformer(args.model)
    emb_c = model.encode(corpus_texts, batch_size=256,
                         show_progress_bar=True,
                         convert_to_numpy=True).astype(np.float32)
    emb_q = model.encode(query_texts, batch_size=256,
                         convert_to_numpy=True).astype(np.float32)

    np.save(out / "msmarco_corpus.npy", emb_c)
    np.save(out / "msmarco_queries.npy", emb_q)
    (out / "msmarco_qrels.json").write_text(json.dumps(qrels))
    print(f"wrote {emb_c.shape} corpus, {emb_q.shape} queries, "
          f"{len(qrels)} qrels to {out}")


if __name__ == "__main__":
    main()
