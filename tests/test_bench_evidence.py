"""Benchmark evidence-chain checks (VERDICT r4 "What's weak" #1).

Round 4's end-of-round snapshot silently overwrote the device-refine
headline JSON with a host-refine re-run, so docs/BENCHMARKS.md quoted a
number HEAD's committed artifact contradicted. These tests pin every
headline number quoted in the docs tables to the committed JSON it cites,
and exercise the guarded-write helper profile scripts now use, so a config
change can never again silently flip an artifact in place.
"""

import json
import re
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
BENCH_DIR = REPO / "docs" / "benchmarks"
DOCS = (REPO / "docs" / "BENCHMARKS.md").read_text()

sys.path.insert(0, str(REPO / "scripts"))
from bench_guard import (  # noqa: E402
    BenchOverwriteRefused,
    write_benchmark_json,
)


def _load(name):
    return json.loads((BENCH_DIR / name).read_text())


# Each entry: (json file, key, format of the value as quoted in
# docs/BENCHMARKS.md). The test asserts the formatted string appears in the
# docs — so a re-measured JSON forces the doc table to be regenerated, and
# an edited doc claim must match its committed artifact.
HEADLINE_CLAIMS = [
    ("megascale_grid_only_b4.json", "batch64_qps_p50", "{:.1f}"),
    ("megascale_grid_only_b4.json", "batch1_p50_ms", "{:.0f} ms"),
    ("megascale_grid_only_b4_refine_device.json", "batch64_qps_p50", "{:.1f}"),
    ("megascale_grid_only_b4_refine_device.json", "batch1_p50_ms", "{:.0f} ms"),
    ("megascale_grid_only_b4_refine_device.json",
     "recall_at_10_vs_bf16_exhaustive", "{:.4f}"),
    ("megascale_grid_only_b4_refine_host.json", "batch64_qps_p50", "{:.1f}"),
    ("stress_acceptance.json", "cycles", "{:.0f} "),
    ("dispatch_budget.json", "kernel_ms", "{:.2f}"),
    ("dispatch_budget.json", "pipelined_pass_ms", "{:.2f}"),
    ("dispatch_budget.json", "h2d_query_ms", "{:.2f}"),
    ("e2e_composite.json", "indexing_docs_per_s", "{:.1f}"),
    ("e2e_composite.json", "search_qps", "{:.1f}"),
    ("e2e_composite.json", "api_vs_library_top10_overlap", "{:.4f}"),
    ("api_http_serving.json", "qps_p50", "{:.1f}"),
    ("api_http_serving.json", "inproc_qps_same_phase", "{:.1f}"),
    ("api_http_serving.json", "http_over_inproc_ratio", "{:.3f}"),
    ("api_http_serving_b320.json", "qps_p50", "{:.1f}"),
    ("api_http_serving_b320.json", "http_over_inproc_ratio", "{:.3f}"),
]


def test_docs_quote_window_sweep():
    sweep = _load("window_sweep.json")["windows"]
    for w in ("2", "6"):
        quoted = "{:.1f} ms".format(sweep[w]["marginal_ms_median"])
        assert quoted.split()[0] in DOCS, (
            f"window {w} marginal {quoted} not quoted in docs/BENCHMARKS.md"
        )
    q6 = "{:.1f}".format(sweep["6"]["qps_median"])
    assert q6 in DOCS


@pytest.mark.parametrize("fname,key,fmt", HEADLINE_CLAIMS)
def test_docs_quote_committed_artifact(fname, key, fmt):
    value = _load(fname)[key]
    quoted = fmt.format(value)
    assert quoted in DOCS, (
        f"docs/BENCHMARKS.md does not contain {quoted!r} "
        f"({fname}:{key}={value}) — the doc table and the committed "
        "benchmark JSON disagree; regenerate the table or restore the JSON."
    )


def test_refine_artifacts_are_side_distinct():
    """The device- and host-refine measurements live in distinct files whose
    refine_side field matches the filename (the round-4 bug had both configs
    sharing one path)."""
    dev = _load("megascale_grid_only_b4_refine_device.json")
    host = _load("megascale_grid_only_b4_refine_host.json")
    assert dev["refine_side"] == "device" and "device-refine" in dev["what"]
    assert host["refine_side"] == "host" and "host-refine" in host["what"]
    assert not (BENCH_DIR / "megascale_grid_only_b4_refine.json").exists()


def test_guard_refuses_identity_change(tmp_path):
    p = tmp_path / "bench.json"
    write_benchmark_json(p, {"what": "exp A", "refine_side": "device",
                             "qps": 100.0})
    # Metric-only change: allowed (re-measurement of the same experiment).
    write_benchmark_json(p, {"what": "exp A", "refine_side": "device",
                             "qps": 120.0})
    assert json.loads(p.read_text())["qps"] == 120.0
    # Identity change: refused.
    with pytest.raises(BenchOverwriteRefused):
        write_benchmark_json(p, {"what": "exp A", "refine_side": "host",
                                 "qps": 40.0})
    assert json.loads(p.read_text())["refine_side"] == "device"


def test_guard_force_override(tmp_path, monkeypatch):
    p = tmp_path / "bench.json"
    write_benchmark_json(p, {"what": "exp A", "qps": 1.0})
    monkeypatch.setenv("BENCH_FORCE_OVERWRITE", "1")
    write_benchmark_json(p, {"what": "exp B", "qps": 2.0})
    assert json.loads(p.read_text())["what"] == "exp B"


def test_no_unexplained_doc_artifact_references():
    """Every docs/benchmarks/*.json referenced by name in BENCHMARKS.md
    exists on disk (no dangling evidence pointers)."""
    for name in set(re.findall(r"([\w.\-]+\.json)", DOCS)):
        if name.startswith("megascale") or name in (
            "device_append.json", "stress_acceptance.json"
        ):
            assert (BENCH_DIR / name).exists(), f"{name} cited but missing"
