"""Recall-QPS frontier sweep for the two stage-3b approximate-scoring
semantics at mega scale (72M embeddings):

  cells — sum of probed-cell maxima (this framework's default; coarser but
          gather-free)
  codes — per-candidate code scores (the reference's PLAID semantics,
          search.rs:448-457; round-4 rewrite made the candidate-token
          gather contiguous)

The megascale_tpu.json A/B samples one keep per mode; this sweeps keep in
{128, 256, 512, 1024} x both modes so the default can be chosen on the
frontier, not on a single point. Recall is against the saved bf16
exhaustive oracle (profile_grid_only.py oracle phase writes it).

Writes docs/benchmarks/megascale_codes_frontier.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np

from profile_megascale import PATH, make_queries, topic_table, timed_qps

from nextplaid_tpu.index import DeviceIndex, SearchParameters

ORACLE_PATH = "/tmp/mega_grid_only_oracle.json"
OUT = "/root/repo/docs/benchmarks/megascale_codes_frontier.json"


def main():
    index = DeviceIndex.load(PATH)
    queries = make_queries(topic_table())
    oracle = json.load(open(ORACLE_PATH))["ids"]
    rows = []
    for approx in ("cells", "codes"):
        for keep in (128, 256, 512, 1024):
            params = SearchParameters(
                top_k=10,
                mode="staged",
                n_ivf_probe=8,
                overflow_policy="prune",
                prune_keep=keep,
                approx_score=approx,
                stage1_precision="default",
            )
            qps, res = timed_qps(index, queries[:128], params)
            recall = float(
                np.mean(
                    [
                        len(set(r.passage_ids) & set(o)) / 10
                        for r, o in zip(res[:64], oracle)
                    ]
                )
            )
            print(
                f"{approx} keep={keep}: {qps:.2f} QPS recall={recall:.4f}",
                flush=True,
            )
            rows.append(
                {
                    "approx_score": approx,
                    "prune_keep": keep,
                    "qps": round(qps, 2),
                    "recall_at_10_vs_bf16_oracle": round(recall, 4),
                }
            )
    json.dump(
        {
            "what": "cells-vs-codes approximate-scoring frontier at 72M "
            "embeddings, one v5e chip, batch 64 pipelined, nprobe 8",
            "rows": rows,
        },
        open(OUT, "w"),
        indent=2,
    )
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
