"""Retrieval-quality evaluation: IR metrics + BEIR-format dataset loading.

TPU-native counterpart of the reference's quality harness
(/root/reference/docs/benchmarks/benchmark_scifact_docker.py:222-293, which
delegates to the external `beir` and `ranx` packages). Those packages are
not in this image, so both the loader and the metric math are implemented
from scratch here — unit-tested against hand-computed values in
tests/test_eval_metrics.py.
"""

from .beir import load_beir, make_synthetic_beir
from .metrics import evaluate, ndcg_at_k, average_precision, recall_at_k

__all__ = [
    "load_beir",
    "make_synthetic_beir",
    "evaluate",
    "ndcg_at_k",
    "average_precision",
    "recall_at_k",
]
