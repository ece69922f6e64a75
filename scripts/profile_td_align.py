"""Probe: does the bf16 MaxSim kernel require Td % 128, or only Td % 8?

The grid block layout is [DBLK, Td, d] with d=128 on lanes and Td on
sublanes, so Mosaic's alignment rule for Td should be the sublane multiple
(8), not the lane multiple (128). If true, grid_td() can stop rounding the
token axis to 128 and the bench-shape grid shrinks 384 -> 304 tokens/doc:
a 21% cut in real kernel FLOPs (and HBM) for max_doclen=300 corpora.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

from nextplaid_tpu.ops.maxsim_kernel import maxsim_grid_scores

ND, D, Q, TQ = 5184, 128, 64, 32
rng = np.random.default_rng(0)

for td in (384, 320, 304):
    grid = jnp.asarray(
        rng.standard_normal((ND, td, D)), jnp.bfloat16
    )
    lens = jnp.asarray(
        np.clip(rng.normal(290, 40, (ND, 1)), 64, min(300, td)), jnp.int32
    )
    qf = jnp.asarray(rng.standard_normal((Q * TQ, D)), jnp.bfloat16)
    try:
        out = maxsim_grid_scores(qf, grid, lens, TQ)
        out.block_until_ready()
    except Exception as e:
        print(f"td={td}: FAILED {type(e).__name__}: {str(e)[:300]}")
        continue
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        maxsim_grid_scores(qf, grid, lens, TQ).block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    print(
        f"td={td}: p50 {times[len(times)//2]*1000:6.1f} ms  "
        f"best {times[0]*1000:6.1f} ms  out={out.shape}",
        flush=True,
    )
