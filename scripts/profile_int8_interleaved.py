"""Profile the token-interleaved int8 MaxSim kernel vs the bf16 kernel.

Layout (shipped since round 4): grid_i [NB, d, 128*Td] int8 where lane
l = t*128 + j (token-major interleave of 128-doc groups). The per-doc max
is a strided lane tree-reduce; mask+scale ride one broadcast-row fma; each
group's result lands lane-contiguous as [Qf, 128] — no one-hot
accumulator, no per-doc slices (the VPU costs that bounded the round-3
transposed-layout kernel at 15.5 ms pipelined).

Round-4 measurements at production shapes (Q=64, Tq=32, Td=384, 5632
docs), pipelined (16 dispatches in flight, one sync):

    bf16 kernel : p50 8.52 ms
    int8t (r3)  : p50 6.62 ms   (transposed layout, removed)
    int8i       : p50 5.18 ms = 219 TOPS = 55% of the v5e int8 MXU peak

Run on the real chip:  python scripts/profile_int8_interleaved.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np


def main():
    from nextplaid_tpu.ops.maxsim_kernel import (
        maxsim_grid_scores,
        maxsim_grid_scores_int8i,
    )

    Q, TQ, D, TD, ND = 64, 32, 128, 384, 5632
    QF = Q * TQ
    rng = np.random.default_rng(0)

    doclens = rng.integers(TD // 3, TD + 1, ND).astype(np.int32)
    emb = rng.standard_normal((ND, TD, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    tvalid = np.arange(TD)[None, :] < doclens[:, None]
    emb *= tvalid[:, :, None]

    maxabs = np.abs(emb).max(-1)
    scale = np.where(maxabs > 0, maxabs / 127.0, 1.0).astype(np.float32)
    qz = np.clip(np.round(emb / scale[:, :, None]), -127, 127).astype(np.int8)
    dsc = np.where(tvalid, scale, 0.0)

    # Interleaved layout: [NB, d, 128*Td], lane = t*128 + j.
    NB = ND // 128
    gi = qz.reshape(NB, 128, TD, D).transpose(0, 3, 2, 1).reshape(
        NB, D, TD * 128
    )
    grid_i = jnp.asarray(np.ascontiguousarray(gi))
    di = dsc.reshape(NB, 128, TD).transpose(0, 2, 1).reshape(NB, TD * 128)
    dsc_i = jnp.asarray(di.astype(jnp.bfloat16))
    grid_bf = jnp.asarray(emb.astype(jnp.bfloat16))
    lens = jnp.asarray(doclens.reshape(ND, 1))

    qf32 = rng.standard_normal((QF, D)).astype(np.float32)
    qf32 /= np.linalg.norm(qf32, axis=-1, keepdims=True)
    qsc = (np.abs(qf32).max(-1) / 127.0).astype(np.float32)
    qi8 = jnp.asarray(
        np.clip(np.round(qf32 / qsc[:, None]), -127, 127).astype(np.int8)
    )
    qscales = jnp.asarray(qsc)
    qbf = jnp.asarray(qf32.astype(jnp.bfloat16))

    # Cross-check vs a NumPy oracle on the dequantized values (doc subset
    # to bound host RAM; covers 2 whole interleave groups).
    nsub = 256
    deq = qz[:nsub].astype(np.float32) * dsc[:nsub, :, None]
    qdeq = np.asarray(qi8, np.float32) * qsc[:, None]
    sim = np.einsum("fd,ntd->fnt", qdeq, deq)
    sim[:, ~tvalid[:nsub]] = -np.inf
    per_tok = sim.max(-1)
    per_tok[~np.isfinite(per_tok)] = 0.0
    want = per_tok.reshape(Q, TQ, nsub).sum(1)
    got = np.asarray(maxsim_grid_scores_int8i(
        qi8, qscales, grid_i, dsc_i, tq=TQ))[:, :nsub]
    err = np.abs(want - got).max()
    print(f"max |oracle - int8i| (first {nsub} docs) = {err:.2e}", flush=True)

    def bench(fn, n=16):
        """Pipelined: n dispatches in flight, one sync (per-call sync adds
        ~25 ms of tunnel latency)."""
        fn().block_until_ready()
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(n)]
            outs[-1].block_until_ready()
            reps.append((time.perf_counter() - t0) / n)
        reps = sorted(reps)
        return reps[len(reps) // 2] * 1000, reps[0] * 1000

    p50, best = bench(lambda: maxsim_grid_scores(qbf, grid_bf, lens, tq=TQ))
    print(f"bf16 kernel : p50 {p50:7.2f} ms  best {best:7.2f} ms", flush=True)
    p50, best = bench(lambda: maxsim_grid_scores_int8i(
        qi8, qscales, grid_i, dsc_i, tq=TQ))
    flops = 2 * QF * D * ND * TD
    print(f"int8i       : p50 {p50:7.2f} ms  best {best:7.2f} ms"
          f"  ({flops / (p50 / 1e3) / 1e12:6.1f} TOPS)", flush=True)


if __name__ == "__main__":
    main()
