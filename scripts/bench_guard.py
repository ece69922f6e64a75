"""Guarded benchmark-JSON writes.

Round 4's end-of-round snapshot silently committed a host-refine re-run over
the device-refine headline artifact (VERDICT r4, "What's weak" #1): the same
filename held two different experiment configs at different commits, and the
docs quoted the one that was no longer at HEAD. This module makes that class
of bug impossible: a profile script may only overwrite a benchmark JSON whose
identity fields ("what" plus any config keys present in both) match what it
is about to write. A config change must go to a new filename (or set
BENCH_FORCE_OVERWRITE=1 to consciously replace the experiment).
"""

import json
import os
from pathlib import Path

# Fields that define an experiment's identity. Metrics (qps, ms, recall,
# seconds) may legitimately change run-to-run; these must not.
IDENTITY_KEYS = (
    "what",
    "refine",
    "refine_side",
    "refine_depth",
    "buckets",
    "dtype",
    "nbits",
    "corpus",
    "n_docs",
    "n_emb",
    "mode",
    "serve_mode",
    "approx_score",
    "protocol",
)


class BenchOverwriteRefused(RuntimeError):
    pass


def write_benchmark_json(path, payload: dict) -> None:
    """Atomically write `payload` to `path`, refusing to overwrite an
    existing benchmark whose identity fields differ."""
    path = Path(path)
    if path.exists() and os.environ.get("BENCH_FORCE_OVERWRITE") != "1":
        try:
            old = json.loads(path.read_text())
        except Exception:
            old = None
        if isinstance(old, dict):
            diffs = []
            for k in IDENTITY_KEYS:
                if k in old and k in payload and old[k] != payload[k]:
                    diffs.append(f"{k}: {old[k]!r} -> {payload[k]!r}")
            if diffs:
                raise BenchOverwriteRefused(
                    f"refusing to overwrite {path}: experiment identity "
                    f"changed ({'; '.join(diffs)}). Write to a new filename "
                    "or set BENCH_FORCE_OVERWRITE=1."
                )
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_text(json.dumps(payload, indent=2) + "\n")
    os.replace(tmp, path)
    print(f"wrote {path}", flush=True)
