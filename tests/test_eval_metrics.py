"""IR metric unit tests against hand-computed values, BEIR loader
round-trips, and the end-to-end smoke eval (VERDICT round-3 missing #1).

Reference gold signal: benchmark_scifact_docker.py:251-293 (ranx metrics).
Every expected value below is computed by hand in the comments.
"""

import json
import math
import os
import subprocess
import sys

import pytest

from nextplaid_tpu.eval import (
    evaluate,
    load_beir,
    make_synthetic_beir,
)
from nextplaid_tpu.eval.metrics import (
    _ranked_ids,
    average_precision,
    mrr_at_k,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- metrics
def test_ndcg_hand_computed_binary():
    # ranked: [a(rel), b, c(rel)]; k=3
    # DCG  = 1/log2(2) + 0 + 1/log2(4) = 1 + 0.5 = 1.5
    # IDCG = 1/log2(2) + 1/log2(3)     = 1 + 0.6309297536
    rels = {"a": 1, "c": 1}
    got = ndcg_at_k(["a", "b", "c"], rels, 3)
    assert got == pytest.approx(1.5 / (1 + 1 / math.log2(3)))


def test_ndcg_graded_linear_gains():
    # Jarvelin linear gains: ranked [x(rel3), y(rel1)], k=2
    # DCG  = 3/log2(2) + 1/log2(3) = 3 + 0.63093
    # IDCG = same (already ideal order) -> 1.0
    rels = {"x": 3, "y": 1}
    assert ndcg_at_k(["x", "y"], rels, 2) == pytest.approx(1.0)
    # swap order: DCG = 1/log2(2) + 3/log2(3) = 1 + 1.89279 = 2.89279
    got = ndcg_at_k(["y", "x"], rels, 2)
    assert got == pytest.approx((1 + 3 / math.log2(3)) / (3 + 1 / math.log2(3)))


def test_ndcg_cutoff_and_missing():
    rels = {"a": 1, "z": 1}
    # only top-1 counts at k=1: ranked [b, a] -> DCG 0
    assert ndcg_at_k(["b", "a"], rels, 1) == 0.0
    # no relevant docs in qrels -> 0 by convention
    assert ndcg_at_k(["a"], {}, 10) == 0.0


def test_average_precision_hand_computed():
    # ranked [r, n, r, n, r], 3 relevant total:
    # AP = (1/1 + 2/3 + 3/5) / 3 = (1 + 0.66667 + 0.6) / 3
    rels = {"r1": 1, "r2": 1, "r3": 1}
    ranked = ["r1", "n1", "r2", "n2", "r3"]
    assert average_precision(ranked, rels) == pytest.approx(
        (1 + 2 / 3 + 3 / 5) / 3
    )
    # with cutoff k=3: hits r1, r2 -> (1 + 2/3) / min(3 rel, 3) = 0.5556
    assert average_precision(ranked, rels, k=3) == pytest.approx((1 + 2 / 3) / 3)


def test_ap_divides_by_total_relevant_not_retrieved():
    # 4 relevant in qrels, only 1 retrieved: AP = (1/1)/4
    rels = {"a": 1, "b": 1, "c": 1, "d": 1}
    assert average_precision(["a", "x"], rels) == pytest.approx(0.25)


def test_recall_precision_mrr():
    rels = {"a": 1, "b": 1, "c": 2, "x": 0}  # x has rel 0 -> not relevant
    ranked = ["z", "a", "c", "y"]
    assert recall_at_k(ranked, rels, 3) == pytest.approx(2 / 3)
    assert recall_at_k(ranked, rels, 1) == 0.0
    assert precision_at_k(ranked, rels, 4) == pytest.approx(2 / 4)
    assert mrr_at_k(ranked, rels, 10) == pytest.approx(1 / 2)
    assert mrr_at_k(["z", "y"], rels, 10) == 0.0


def test_ranking_deterministic_under_ties():
    # equal scores: doc id ascending breaks the tie
    assert _ranked_ids({"b": 1.0, "a": 1.0, "c": 2.0}) == ["c", "a", "b"]


def test_evaluate_means_over_qrels_queries():
    qrels = {"q1": {"a": 1}, "q2": {"b": 1}}
    run = {"q1": {"a": 5.0, "z": 1.0}}  # q2 missing from run -> scores 0
    out = evaluate(qrels, run, ("ndcg@10", "map", "recall@10"))
    assert out["ndcg@10"] == pytest.approx(0.5)
    assert out["map"] == pytest.approx(0.5)
    assert out["recall@10"] == pytest.approx(0.5)
    # run-only queries are ignored
    out2 = evaluate(qrels, {**run, "q9": {"a": 1.0}}, ("map",))
    assert out2["map"] == pytest.approx(0.5)


def test_evaluate_rejects_unknown_and_cutoffless():
    with pytest.raises(ValueError):
        evaluate({"q": {"a": 1}}, {}, ("bogus@10",))
    with pytest.raises(ValueError):
        evaluate({"q": {"a": 1}}, {}, ("ndcg",))


# ---------------------------------------------------------------- loader
def test_beir_loader_round_trip(tmp_path):
    d = str(tmp_path / "ds")
    make_synthetic_beir(d, num_docs=16, num_queries=3, rel_per_query=2)
    docs, queries, qrels = load_beir(d)
    assert len(docs) == 16
    assert set(queries) == {"q0", "q1", "q2"}
    assert all(len(r) == 2 for r in qrels.values())
    ids = {doc["id"] for doc in docs}
    for rels in qrels.values():
        assert set(rels) <= ids
    # queries restricted to qrels queries by default
    docs2, queries2, _ = load_beir(d, require_qrels_queries=False)
    assert queries2 == queries  # synthetic set has no extra queries


def test_beir_loader_headerless_qrels(tmp_path):
    d = str(tmp_path / "ds")
    make_synthetic_beir(d, num_docs=8, num_queries=2)
    qrels_path = os.path.join(d, "qrels", "test.tsv")
    with open(qrels_path) as f:
        lines = f.readlines()[1:]  # strip header
    with open(qrels_path, "w") as f:
        f.writelines(lines)
    _, _, qrels = load_beir(d)
    assert len(qrels) == 2


def test_beir_loader_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_beir(str(tmp_path / "nope"))


# ------------------------------------------------------------- smoke e2e
def _run_smoke(mode: str):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "scripts/eval_beir.py", "--smoke", "--mode", mode,
         "--top-k", "10"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_eval_beir_smoke_local():
    """Full loader -> hash-encode -> index -> search -> metrics path."""
    result = _run_smoke("local")
    assert result["metrics"]["ndcg@10"] >= 0.9
    assert result["metrics"]["recall@10"] >= 0.9


@pytest.mark.slow
def test_eval_beir_smoke_api():
    """Reference-shaped flow: SDK -> server -> server-side encoding."""
    result = _run_smoke("api")
    assert result["metrics"]["ndcg@10"] >= 0.9


@pytest.mark.slow
def test_eval_codesearch_smoke():
    """Code-search quality harness: planted-topic project, hybrid search."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "scripts/eval_codesearch.py", "--smoke"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["metrics"]["ndcg@10"] >= 0.9
    assert result["files_indexed"] > 0
