"""Prototype: packed-lane int8 MaxSim kernel.

Current production int8 kernel does ONE doc per int8 MXU matmul
([Qf,d]@[d,Td]) inside a 128-iteration loop — measured 15.5 ms/call
pipelined, far off the 2x int8 peak. This packs PACK consecutive docs'
token columns into one lane axis: grid_p [ND/PACK, d, PACK*Td], so each
matmul is PACK times larger and the loop PACK times shorter. Validity
masking comes from dscales==0 (invalid tokens have zero scale), so doclens
are not needed in-kernel.

MEASURED CONCLUSION (round 3, one v5e): bit-exact vs the production
kernel, 13.4 ms/call pipelined vs 15.5 — only a 14% win, because the
kernel is bound by the per-doc VPU mask/scale/max chain (f32 multiply +
where + lane max over [Qf, Td] per doc), which packing does not shrink.
NOT integrated: a 14% gain does not justify re-teaching the packed layout
to the XLA scan fallback and the device-append path. The bf16 kernel
(9-10 ms) stays the speed path; int8 remains the capacity path (half
HBM). A genuinely faster int8 kernel needs per-DOC (not per-token)
dequant scales so the max can run in the raw int32 domain — a
quantization-quality tradeoff left unexplored.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
PACK = 8


def _kernel_int8p(q_ref, grid_ref, dscale_ref, qscale_ref, out_ref,
                  *, tq: int, td: int):
    """q_ref [Qf, d] i8; grid_ref [R, d, PACK*Td] i8; dscale_ref
    [R, PACK*Td] f32; qscale_ref [Qf, 1] f32; out_ref [Q, R*PACK] f32."""
    r_n, d, ptd = grid_ref.shape
    qf = q_ref.shape[0]
    q_n = qf // tq
    q = q_ref[:]

    blk_iota = jax.lax.broadcasted_iota(jnp.int32, (1, r_n * PACK), 1)
    acc = jnp.zeros((qf, r_n * PACK), jnp.float32)
    for r in range(r_n):
        row = grid_ref[r]  # [d, PACK*Td]
        sim = jnp.dot(q, row, preferred_element_type=jnp.int32)  # [Qf, PTd]
        dsc = dscale_ref[r : r + 1]  # [1, PACK*Td]
        masked = jnp.where(
            dsc > 0, sim.astype(jnp.float32) * dsc, jnp.float32(NEG)
        )
        for j in range(PACK):
            m = jnp.max(
                masked[:, j * td : (j + 1) * td], axis=1, keepdims=True
            )
            m = jnp.where(m > NEG / 2, m, 0.0)
            acc = acc + jnp.where(blk_iota == r * PACK + j, m, 0.0)
    scores = acc * qscale_ref[:]
    g = (
        jax.lax.broadcasted_iota(jnp.int32, (q_n, qf), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (q_n, qf), 1) // tq
    ).astype(jnp.float32)
    out_ref[:] = jnp.dot(
        g, scores, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("tq", "td", "interpret"))
def maxsim_packed(queries_i8, qscales, grid_p, dscales_p, tq, td,
                  interpret=False):
    nr, d, ptd = grid_p.shape
    qf = queries_i8.shape[0]
    q_n = qf // tq
    rblk = 16  # 16 rows x PACK=8 docs = 128 doc lanes per out block
    assert nr % rblk == 0

    out = pl.pallas_call(
        functools.partial(_kernel_int8p, tq=tq, td=td),
        out_shape=jax.ShapeDtypeStruct((q_n, nr * PACK), jnp.float32),
        grid=(nr // rblk,),
        in_specs=[
            pl.BlockSpec((qf, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rblk, d, ptd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (rblk, ptd), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((qf, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (q_n, rblk * PACK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qf * d * nr * ptd,
            bytes_accessed=nr * ptd * (d + 4) + qf * d + q_n * nr * PACK * 4,
            transcendentals=0,
        ),
    )(queries_i8, grid_p, dscales_p, qscales.reshape(qf, 1))
    return out


def main():
    from nextplaid_tpu.ops.maxsim_kernel import maxsim_grid_scores_int8t

    ND, D, Q, TQ, TD = 5632, 128, 64, 32, 384
    rng = np.random.default_rng(0)
    grid = rng.integers(-127, 128, (ND, D, TD)).astype(np.int8)
    lens = np.clip(rng.normal(290, 40, ND), 64, 300).astype(np.int32)
    dsc = np.zeros((ND, TD), np.float32)
    for i in range(ND):
        dsc[i, : lens[i]] = 0.01
        grid[i, :, lens[i]:] = 0
    qi = rng.integers(-127, 128, (Q * TQ, D)).astype(np.int8)
    qs = np.full(Q * TQ, 0.01, np.float32)

    # Reference scores from the production kernel.
    ref = np.asarray(
        maxsim_grid_scores_int8t(
            jnp.asarray(qi), jnp.asarray(qs), jnp.asarray(grid),
            jnp.asarray(lens.reshape(ND, 1)), jnp.asarray(dsc), tq=TQ,
        )
    )

    # Packed layout: [ND/PACK, d, PACK*Td].
    grid_p = np.ascontiguousarray(
        grid.reshape(ND // PACK, PACK, D, TD).transpose(0, 2, 1, 3)
        .reshape(ND // PACK, D, PACK * TD)
    )
    dsc_p = dsc.reshape(ND // PACK, PACK * TD)

    gp = jnp.asarray(grid_p)
    dp = jnp.asarray(dsc_p)
    qid = jnp.asarray(qi)
    qsd = jnp.asarray(qs)
    try:
        out = np.asarray(maxsim_packed(qid, qsd, gp, dp, TQ, TD))
    except Exception as e:
        print("COMPILE FAILED:", type(e).__name__, str(e)[:400])
        return
    err = np.max(np.abs(out - ref))
    print("max abs err vs production kernel:", err)

    N = 10
    best = 1e9
    for rep in range(4):
        t0 = time.perf_counter()
        outs = [maxsim_packed(qid, qsd, gp, dp, TQ, TD) for _ in range(N)]
        np.asarray(outs[-1])
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"packed int8 pipelined best: {best*1000:6.1f} ms/call", flush=True)


if __name__ == "__main__":
    main()
