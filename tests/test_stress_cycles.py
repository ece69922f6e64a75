"""Add/delete stress cycles verifying index <-> metadata count sync after
every operation — the reference's acceptance harness
(docs/benchmarks/benchmark_scifact_stress.py, 75 cycles / 2,223 deletes,
expected == actual doc counts every op; SURVEY.md §4). Scaled down for CI."""

import numpy as np
import pytest

from nextplaid_tpu import filtering
from nextplaid_tpu.index import DeviceIndex, IndexConfig
from nextplaid_tpu.index.config import Metadata
from nextplaid_tpu.index.delete import delete_with_options
from nextplaid_tpu.index.update import (
    UpdateConfig,
    update_or_create_with_metadata,
)
from nextplaid_tpu.storage.npy import IndexLayout, load_json

import os

CYCLES = int(os.environ.get("STRESS_CYCLES", "12"))
DIM = 32


def make_docs(rng, n):
    docs = []
    for _ in range(n):
        t = int(rng.integers(4, 10))
        v = rng.standard_normal((t, DIM)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        docs.append(v)
    return docs


def counts(path):
    meta = Metadata.from_dict(load_json(IndexLayout(path).metadata))
    return meta.num_documents, filtering.count(path)


def run_cycles(path: str, cycles: int, add_lo: int = 5, add_hi: int = 30) -> dict:
    """The acceptance loop; returns run statistics (shared by the test and
    scripts/run_stress_acceptance.py, which records the JSON the way the
    reference records docs/benchmarks/scifact_stress_test.json)."""
    rng = np.random.default_rng(42)
    expected = 0
    next_tag = 0
    total_added = 0
    total_deleted = 0
    delete_ops = 0

    for cycle in range(cycles):
        # Add a random batch with metadata.
        n_add = int(rng.integers(add_lo, add_hi))
        docs = make_docs(rng, n_add)
        meta = [{"tag": next_tag + i, "cycle": cycle} for i in range(n_add)]
        next_tag += n_add
        ids = update_or_create_with_metadata(
            docs, path, IndexConfig(seed=42), UpdateConfig(seed=42), meta
        )
        expected += n_add
        total_added += n_add
        assert ids == list(range(expected - n_add, expected))
        nd, db = counts(path)
        assert nd == db == expected, (cycle, "after add", nd, db, expected)

        # Delete a random subset by id (mixed positions, not just suffix).
        if expected > 8 and rng.random() < 0.8:
            n_del = int(rng.integers(1, max(expected // 3, 2)))
            del_ids = sorted(
                rng.choice(expected, size=n_del, replace=False).tolist()
            )
            deleted = delete_with_options(del_ids, path)
            assert deleted == n_del
            expected -= n_del
            total_deleted += n_del
            delete_ops += 1
            nd, db = counts(path)
            assert nd == db == expected, (
                cycle, "after delete", nd, db, expected,
            )

        # The index must remain loadable + searchable each cycle.
        index = DeviceIndex.load(path)
        assert index.num_documents == expected
        # Metadata ids must be dense 0..N-1.
        rows = filtering.get(path)
        assert [r["_subset_"] for r in rows] == list(range(expected))

    # Final integrity: every doc's metadata is unique and consistent.
    rows = filtering.get(path)
    tags = [r["tag"] for r in rows]
    assert len(set(tags)) == len(tags)
    return {
        "cycles": cycles,
        "total_documents_added": total_added,
        "total_documents_deleted": total_deleted,
        "delete_operations": delete_ops,
        "final_documents": expected,
        "count_sync_verified_every_op": True,
    }


def test_add_delete_cycles(tmp_path):
    run_cycles(str(tmp_path / "stress"), CYCLES)
