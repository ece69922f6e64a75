"""Recall-targeted operating-point selection (VERDICT r4 next #4).

The selector maps SearchParameters.target_recall into concrete
(approx_score, prune_keep) settings from the measured 72M frontier
(docs/benchmarks/megascale_codes_frontier.json), routing to the exhaustive
exact path when no staged point can honestly meet the target.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from nextplaid_tpu.index.config import (
    MEASURED_FRONTIER_72M,
    SearchParameters,
    resolve_target_recall,
)

REPO = Path(__file__).resolve().parent.parent


def test_frontier_constant_matches_committed_artifact():
    """The in-code table and the committed benchmark JSON are the same
    measurement — neither can drift without the other."""
    rows = json.loads(
        (REPO / "docs/benchmarks/megascale_codes_frontier.json").read_text()
    )["rows"]
    artifact = {
        (r["approx_score"], r["prune_keep"]): (
            r["qps"], r["recall_at_10_vs_bf16_oracle"]
        )
        for r in rows
    }
    table = {
        (score, keep): (qps, recall)
        for score, keep, qps, recall in MEASURED_FRONTIER_72M
    }
    assert table == artifact


@pytest.mark.parametrize(
    "target,expected_score,expected_keep",
    [
        # Highest-QPS row meeting each target, from the measured frontier.
        (0.85, "cells", 128),   # 33.9 QPS
        (0.91, "cells", 256),   # 31.8 QPS @ 0.9188
        (0.92, "cells", 512),   # latency preset: 0.9188 misses 0.92
        (0.94, "cells", 512),
        (0.97, "cells", 1024),  # balanced: cells1024 (23.4) > codes256 (22)
        (0.978, "cells", 1024),  # 0.9781 still covers
        (0.99, "codes", 512),   # quality band: reference semantics
        (0.995, "codes", 512),  # 0.9953
        (0.996, "codes", 1024),  # 0.9969
    ],
)
def test_selector_picks_highest_qps_meeting_target(
    target, expected_score, expected_keep
):
    p = resolve_target_recall(SearchParameters(target_recall=target))
    assert (p.approx_score, p.prune_keep) == (expected_score, expected_keep)
    # Selection NEVER picks a dominated row: no other row meets the target
    # with strictly higher QPS.
    chosen_qps = next(
        q for s, k, q, r in MEASURED_FRONTIER_72M
        if (s, k) == (expected_score, expected_keep)
    )
    for s, k, q, r in MEASURED_FRONTIER_72M:
        if r >= target:
            assert q <= chosen_qps


def test_target_above_staged_frontier_routes_to_exact():
    p = resolve_target_recall(SearchParameters(target_recall=0.999))
    assert p.mode == "exact"
    p = resolve_target_recall(SearchParameters(target_recall=1.0))
    assert p.mode == "exact"


def test_explicit_fields_win_over_selector():
    p = resolve_target_recall(
        SearchParameters(target_recall=0.92, approx_score="cells")
    )
    assert p.approx_score == "cells"  # caller's explicit choice respected
    assert p.prune_keep == 512  # selector still fills the free field
    p = resolve_target_recall(
        SearchParameters(target_recall=1.0, mode="staged")
    )
    assert p.mode == "staged"


def test_none_is_identity():
    p = SearchParameters()
    assert resolve_target_recall(p) is p


def test_presets():
    for name, target in SearchParameters.PRESETS.items():
        p = SearchParameters.preset(name, top_k=7)
        assert p.target_recall == target and p.top_k == 7
    with pytest.raises(ValueError, match="unknown preset"):
        SearchParameters.preset("turbo")
    # Preset -> resolved settings snapshot (the docs table contract).
    lat = resolve_target_recall(SearchParameters.preset("latency"))
    bal = resolve_target_recall(SearchParameters.preset("balanced"))
    qual = resolve_target_recall(SearchParameters.preset("quality"))
    ex = resolve_target_recall(SearchParameters.preset("exact"))
    assert (lat.approx_score, lat.prune_keep) == ("cells", 512)
    assert (bal.approx_score, bal.prune_keep) == ("cells", 1024)
    assert (qual.approx_score, qual.prune_keep) == ("codes", 512)
    assert ex.mode == "exact"


def test_target_recall_flows_through_search(tmp_path):
    """End-to-end at small scale: target_recall resolves inside
    search_batch_async and the achieved recall vs the exact oracle meets
    the target (small corpora over-deliver vs the 72M frontier)."""
    from nextplaid_tpu.index import (
        DeviceIndex,
        IndexConfig,
        create_index,
        search_batch,
    )

    rng = np.random.default_rng(3)
    topics = rng.standard_normal((32, 64)).astype(np.float32)
    topics /= np.linalg.norm(topics, axis=1, keepdims=True)
    docs = []
    for i in range(160):
        t = topics[rng.integers(0, 32, size=8)]
        v = (t + 0.08 * rng.standard_normal((8, 64))).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        docs.append(v)
    path = str(tmp_path / "idx")
    create_index(docs, path, IndexConfig(nbits=4, seed=42))
    index = DeviceIndex.load(path)

    queries = []
    for _ in range(16):
        t = topics[rng.integers(0, 32, size=6)]
        q = (t + 0.08 * rng.standard_normal((6, 64))).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        queries.append(q)

    oracle = search_batch(
        index, queries,
        SearchParameters(top_k=5, mode="exact", stage1_precision="highest"),
    )
    for preset in ("latency", "balanced", "quality"):
        params = SearchParameters.preset(
            preset, top_k=5, mode="staged", stage1_precision="highest"
        )
        res = search_batch(index, queries, params)
        recall = float(np.mean([
            len(set(r.passage_ids) & set(o.passage_ids)) / 5
            for r, o in zip(res, oracle)
        ]))
        # Within 0.005 of the target (the acceptance bound); small corpora
        # typically deliver ~1.0.
        assert recall >= SearchParameters.PRESETS[preset] - 0.005, (
            preset, recall
        )
