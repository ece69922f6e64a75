"""Full-scale add/delete stress acceptance run, recorded the way the
reference records docs/benchmarks/scifact_stress_test.json (75 cycles,
count sync verified after EVERY add and delete — SURVEY.md §4).

Usage: python scripts/run_stress_acceptance.py [cycles]
Writes docs/benchmarks/stress_acceptance.json.
"""

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

from tests.test_stress_cycles import run_cycles  # noqa: E402

OUT = "/root/repo/docs/benchmarks/stress_acceptance.json"


def main():
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 75
    with tempfile.TemporaryDirectory(prefix="stress_accept_") as td:
        t0 = time.time()
        # 30-120 docs/cycle: the index grows into the thousands and total
        # deletes reach the reference run's ~2.2K scale.
        stats = run_cycles(td + "/stress", cycles, add_lo=30, add_hi=120)
        stats["elapsed_seconds"] = round(time.time() - t0, 1)
    stats["benchmark"] = "add_delete_stress_acceptance"
    stats["reference_equivalent"] = (
        "docs/benchmarks/scifact_stress_test.json (75 cycles, 2223 deletes)"
    )
    stats["verified"] = (
        "index.num_documents == metadata count after every op; metadata ids "
        "dense 0..N-1 after every cycle; unique tags at the end; index "
        "loadable+searchable every cycle"
    )
    with open(OUT, "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
