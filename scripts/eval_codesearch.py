"""Code-search quality harness: NDCG@10 over (query -> relevant files).

Counterpart of the reference's Semble benchmark (README.md:147-154: colgrep
NDCG@10 0.859 over 1,251 queries x 63 repos) — the reference never ships the
bench runner, only the score, so this harness defines the runnable protocol:

  bench file: JSONL, one {"query": str, "relevant": [repo-relative paths]}
  per line; ranking granularity is the FILE (the searcher already collapses
  to one best hit per file, searcher.py — reference index/mod.rs:4270-4290).

Modes
  --smoke           generates a synthetic project (planted topic functions
                    across many files) + the deterministic hash encoder and
                    asserts NDCG@10 >= 0.9. Runs in CI with no weights.
  --project DIR --bench FILE [--model ID]   real evaluation; the moment a
                    Semble-format dump and model weights exist, this one
                    command produces the reference-comparable number.

Output: one JSON line {"ndcg@10": ..., "mrr@10": ..., "recall@10": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from typing import Dict, List

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nextplaid_tpu.eval import evaluate

METRICS = ("ndcg@10", "mrr@10", "recall@10", "map")


def load_bench(path: str) -> List[Dict]:
    rows = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    for r in rows:
        if "query" not in r or "relevant" not in r:
            raise ValueError("bench rows need 'query' and 'relevant' fields")
    return rows


def make_synthetic_project(root: str, num_topics: int = 10, filler: int = 20):
    """Plant one function per topic in its own file + filler files.

    Function names and docstrings carry the topic token, so both the
    semantic (hash-encoder) and keyword (FTS) legs can find them — the same
    planted-relevance trick as eval/beir.make_synthetic_beir.
    """
    os.makedirs(root, exist_ok=True)
    bench = []
    for t in range(num_topics):
        topic = f"quasar{t:03d}"
        fname = f"src/{topic}_service.py"
        os.makedirs(os.path.join(root, "src"), exist_ok=True)
        with open(os.path.join(root, fname), "w") as f:
            f.write(
                f'''"""Service for {topic} processing."""


def handle_{topic}_request(payload):
    """Process a {topic} request and return the {topic} response."""
    result = {{"kind": "{topic}", "payload": payload}}
    return result


def validate_{topic}(value):
    """Check that value is a well-formed {topic} record."""
    return isinstance(value, dict) and value.get("kind") == "{topic}"
'''
            )
        bench.append(
            {"query": f"how do we handle a {topic} request", "relevant": [fname]}
        )
    for i in range(filler):
        fname = f"lib/util_{i:02d}.py"
        os.makedirs(os.path.join(root, "lib"), exist_ok=True)
        with open(os.path.join(root, fname), "w") as f:
            f.write(
                f'''def helper_{i}(x):
    """Generic helper number {i} for shared plumbing."""
    return x * {i + 1}
'''
            )
    return bench


def run_eval(project: str, bench: List[Dict], encoder, top_k: int = 10):
    from nextplaid_tpu.codesearch.indexer import ProjectIndexer
    from nextplaid_tpu.codesearch.searcher import Searcher, SearchOptions

    index_dir = tempfile.mkdtemp(prefix="cseval_idx_")
    t0 = time.perf_counter()
    indexer = ProjectIndexer(project, encoder, index_dir=index_dir)
    stats = indexer.update()
    index_s = time.perf_counter() - t0

    searcher = Searcher(index_dir, encoder)
    qrels: Dict[str, Dict[str, int]] = {}
    run: Dict[str, Dict[str, float]] = {}
    t0 = time.perf_counter()
    for i, row in enumerate(bench):
        qid = f"q{i}"
        qrels[qid] = {p: 1 for p in row["relevant"]}
        hits = searcher.search(row["query"], SearchOptions(top_k=top_k))
        run[qid] = {h.file: h.score for h in hits}
    search_s = time.perf_counter() - t0

    metrics = evaluate(qrels, run, METRICS)
    return {
        "num_queries": len(bench),
        "files_indexed": stats.get("changed", 0),
        "units_indexed": stats.get("units", 0),
        "index_seconds": round(index_s, 2),
        "search_seconds": round(search_s, 2),
        "metrics": {k: round(v, 4) for k, v in metrics.items()},
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--project", help="repo to index")
    ap.add_argument("--bench", help="JSONL bench file")
    ap.add_argument("--model", help="HF id or local encoder dir")
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--out")
    args = ap.parse_args()

    if args.smoke:
        project = tempfile.mkdtemp(prefix="cseval_proj_")
        bench = make_synthetic_project(project)
        from eval_beir import HashEncoder  # sibling script

        encoder = HashEncoder()
    else:
        if not (args.project and args.bench):
            ap.error("--project and --bench required (or --smoke)")
        project = args.project
        bench = load_bench(args.bench)
        if args.model:
            from eval_beir import load_real_encoder

            encoder = load_real_encoder(args.model)
        else:
            ap.error("--model required for real evaluation")

    result = run_eval(project, bench, encoder, top_k=args.top_k)
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    if args.smoke and result["metrics"]["ndcg@10"] < 0.9:
        print(
            f"SMOKE FAILED: ndcg@10 {result['metrics']['ndcg@10']:.4f} < 0.9",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
