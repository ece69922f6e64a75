"""Fused MaxSim Pallas kernel over the pinned token grid.

The XLA exhaustive path materializes per-tile similarity blocks
[Q, tile, Tq, Td] in HBM (~40 GB of intermediate traffic per 32-query batch
at SciFact scale). This kernel keeps the similarity block in VMEM
(flash-attention-style): for each document block it computes

    sim_T = blockᵀ-free dot: [Dsub*Td, d] @ [d, Q*Tq]   (MXU, bf16 in, f32 acc)
    per-doc max over token ROWS (sublane groups of Td)    (VPU)
    sum over query tokens as a matmul with an iota-built
    group-indicator matrix                                 (MXU)

and writes only the [DBLK, Q] score block to HBM. HBM traffic collapses to
one read of the bf16 grid (+ tiny outputs).

Everything is 2-D with lane/sublane-aligned shapes — Mosaic rejects 3-D
reshapes like [Qf, D, Td] (relayout errors), so the doc axis lives on
sublanes and queries arrive PRE-TRANSPOSED as [d, Q*Tq].

Layout contract (matches DeviceIndex.token_grid):
  bf16 grid   [ND, Td, d], Td a multiple of 8 (Td lives on SUBLANES — d=128
              is the lane axis — so sublane alignment suffices; verified
              on-chip, scripts/profile_td_align.py), ND a multiple of 8,
              invalid token rows zeroed;
  int8 grid   token-INTERLEAVED 128-doc groups [NB, d, 128*Td] + matching
              per-token scales [NB, 128*Td] (see _kernel_int8i — the
              interleave turns the per-doc max into a strided lane
              tree-reduce and makes group results lane-contiguous);
  doclens     [ND, 1] int32 (0 for padding docs);
  queries_t   [d, Q*Tq] bf16 — padded query tokens are zero columns, so they
              contribute exactly 0 to every score.

Scores for empty/padding docs come out as 0; callers mask ids >= num_docs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # plain float: jnp constants would be captured as kernel consts
DBLK = 64  # docs per grid step (fewer steps amortize per-step overhead)
SUB = 8  # docs per in-kernel sub-step (round-3 sweep: 33.6 ms vs 34.2 at
# SUB=4 — the kernel now sits AT the 33.5 ms XLA one-big-dot floor for
# this contraction, ~17% of bf16 peak; geometry is no longer the lever)
def _kernel(qt_ref, grid_ref, lens_ref, out_ref, *, tq: int):
    """One grid step: score DBLK docs against all queries.

    qt_ref:   [d, Qf]        bf16 (Qf = Q * Tq, resident across steps)
    grid_ref: [DBLK, Td, d]  bf16
    lens_ref: [DBLK, 1]      int32
    out_ref:  [DBLK, Q]      f32
    """
    dblk, td, d = grid_ref.shape
    qf = qt_ref.shape[1]
    q_n = qf // tq
    qt = qt_ref[:]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (td, 1), 0)
    doc_rows = []
    for s in range(dblk // SUB):
        block = grid_ref[s * SUB : (s + 1) * SUB].reshape(SUB * td, d)
        # [SUB*Td, Qf] — similarity block, VMEM only.
        sim = jnp.dot(block, qt, preferred_element_type=jnp.float32)
        for k in range(SUB):
            doc_len = lens_ref[s * SUB + k, 0]
            doc_sim = sim[k * td : (k + 1) * td]  # only this doc's rows
            masked = jnp.where(row_iota < doc_len, doc_sim, jnp.float32(NEG))
            m = jnp.max(masked, axis=0, keepdims=True)  # [1, Qf]
            doc_rows.append(jnp.where(m > NEG / 2, m, 0.0))

    scores_t = jnp.concatenate(doc_rows, axis=0)  # [DBLK, Qf]
    # Sum per query (groups of tq columns) as an MXU matmul with the
    # group-indicator matrix G[f, q] = (f // tq == q).
    g = (
        jax.lax.broadcasted_iota(jnp.int32, (qf, q_n), 0) // tq
        == jax.lax.broadcasted_iota(jnp.int32, (qf, q_n), 1)
    ).astype(jnp.float32)
    # HIGHEST: DEFAULT f32 dots may run single-pass bf16 on the MXU, which
    # would truncate the per-token maxima before the final sum.
    out_ref[:] = jnp.dot(
        scores_t, g, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel_int8i(q_ref, grid_ref, dsc_ref, qs_ref, out_ref, *, tq: int,
                  w: int):
    """Token-INTERLEAVED int8 grid step: one 128-doc group per step.

    q_ref:    [Qf, d]          int8 (row-major queries)
    grid_ref: [1, d, 128*Td]   int8 — lane l = t*128 + j for doc j of the
                                group (token-major interleave)
    dsc_ref:  [1, 1, 128*Td]   bf16 per-token dequant scales, interleaved
                                like the grid; 0 marks an invalid token
    qs_ref:   [1, Qf]          f32 per-query-token scales (0 for padding)
    out_ref:  [Q, 128]         f32 — group results land lane-contiguous

    Per `w`-token chunk: ONE int8 MXU dot q @ panel[d, 128w] -> i32, then
    convert * scale + bias (bias = NEG where scale == 0, computed on the
    [1, 128w] broadcast row — amortized over Qf), then the per-doc max is
    a strided LANE TREE-REDUCE: halving the lane axis combines token t
    with t + width/128 at the same doc lane, so log2(w) maximums collapse
    [Qf, 128w] -> [Qf, 128] with doc j at lane j. No per-doc slices, no
    one-hot accumulator, no [Qf, dblk] scatter — the three VPU costs that
    bounded the previous transposed-layout kernel (round-3: 15.5 ms
    pipelined; this kernel: 5.2 ms = 219 TOPS = 55% of the int8 MXU peak
    at Q=64, Tq=32, Td=384, 5632 docs — scripts/profile_int8_interleaved).
    """
    qf, d = q_ref.shape
    td = grid_ref.shape[2] // 128
    q_n = qf // tq
    q = q_ref[:]

    m = jnp.full((qf, 128), jnp.float32(NEG))
    for c in range(td // w):
        panel = grid_ref[0, :, c * 128 * w : (c + 1) * 128 * w]
        sim = jnp.dot(q, panel, preferred_element_type=jnp.int32)
        dsc = dsc_ref[0, 0:1, c * 128 * w : (c + 1) * 128 * w].astype(
            jnp.float32
        )
        bias = jnp.where(dsc > 0, 0.0, jnp.float32(NEG))
        v = sim.astype(jnp.float32) * dsc + bias
        width = 128 * w
        while width > 128:
            width //= 2
            v = jnp.maximum(v[:, :width], v[:, width : 2 * width])
        m = jnp.maximum(m, v)
    # Empty/padding docs (every lane NEG) score 0, matching the bf16 kernel.
    m = jnp.where(m > NEG / 2, m, 0.0)
    # Sum query tokens as an MXU matmul with the group-indicator matrix,
    # with the per-query-token scale folded into the indicator.
    g = (
        jax.lax.broadcasted_iota(jnp.int32, (q_n, qf), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (q_n, qf), 1) // tq
    ).astype(jnp.float32) * qs_ref[:]
    # HIGHEST: DEFAULT f32 dots may run single-pass bf16 on the MXU, which
    # would truncate the per-token maxima before the final sum.
    out_ref[:] = jnp.dot(
        g, m, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("tq", "interpret"))
def maxsim_grid_scores_int8i(
    queries_i8: jax.Array,  # [Q*Tq, d] int8, zero rows for padded tokens
    qscales: jax.Array,  # [Q*Tq] f32 per-query-token scales (0 for padding)
    grid_i: jax.Array,  # [NB, d, 128*Td] int8 (token-interleaved groups)
    dscales_i: jax.Array,  # [NB, 128*Td] bf16 (0 for invalid tokens)
    tq: int,
    interpret: bool = False,
) -> jax.Array:
    """Exhaustive MaxSim scores [Q, NB*128] over the INTERLEAVED int8 grid.

    Grid layout contract (DeviceIndex int8 grids, container.py builders):
    docs are packed into groups of 128; group g stores doc g*128+j token t
    at grid_i[g, :, t*128 + j], with dscales_i[g, t*128 + j] its dequant
    scale (0 for invalid tokens, which also marks them for masking — no
    separate doclens input). Scores for empty/padding docs come out 0;
    callers mask ids >= num_docs. Bit-exact vs interpret mode and vs the
    round-3 transposed kernel (scripts/profile_int8_interleaved.py)."""
    nb, d, ld = grid_i.shape
    td = ld // 128
    qf = queries_i8.shape[0]
    q_n = qf // tq
    # Token-chunk width: 16 amortizes dot issue overhead best (round-4
    # sweep: w=16 5.18 ms vs w=4 5.28 ms); int8 Td is a multiple of 32
    # (container._grid_td_for mult=32), which every chunk width <= 16
    # divides. Shrink when the [Qf, 128w] i32+f32 chunk temporaries would
    # crowd the 100 MB scoped-VMEM budget.
    w = 16
    while w > 1 and qf * 128 * w * 8 > 48 * 1024 * 1024:
        w //= 2

    out = pl.pallas_call(
        functools.partial(_kernel_int8i, tq=tq, w=w),
        out_shape=jax.ShapeDtypeStruct((q_n, nb * 128), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((qf, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, d, ld), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, ld), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, qf), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (q_n, 128), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        # Double-buffered 6.3 MB grid blocks + [Qf, 128w] chunk temporaries;
        # raise Mosaic's default 16 MB scoped-vmem limit (v5e: 128 MB VMEM).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qf * d * nb * ld,
            bytes_accessed=nb * ld * (d + 2) + qf * d + q_n * nb * 128 * 4,
            transcendentals=0,
        ),
    )(
        queries_i8,
        grid_i,
        dscales_i.reshape(nb, 1, ld),
        qscales.reshape(1, qf),
    )
    return out  # [Q, NB*128]


@functools.partial(jax.jit, static_argnames=("tq", "interpret"))
def maxsim_grid_scores(
    queries_flat: jax.Array,  # [Q*Tq, d] bf16, zero-padded rows
    grid_tokens: jax.Array,  # [ND, Td, d] bf16, ND % DBLK == 0
    doclens: jax.Array,  # [ND, 1] int32
    tq: int,
    interpret: bool = False,
) -> jax.Array:
    """Exhaustive MaxSim scores [Q, ND] f32 via the fused kernel."""
    nd, td, d = grid_tokens.shape
    qf = queries_flat.shape[0]
    q_n = qf // tq
    dblk = next((d_ for d_ in (DBLK, 32, 16, 8) if nd % d_ == 0), None)
    assert dblk is not None, f"grid rows {nd} not a multiple of 8"

    queries_t = queries_flat.T  # [d, Qf] (host-side XLA transpose, once)

    grid_spec = pl.GridSpec(
        grid=(nd // dblk,),
        in_specs=[
            pl.BlockSpec((d, qf), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (dblk, td, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((dblk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (dblk, q_n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, tq=tq),
        out_shape=jax.ShapeDtypeStruct((nd, q_n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qf * d * nd * td,
            bytes_accessed=nd * td * d * 2 + qf * d * 2 + q_n * nd * 4,
            transcendentals=0,
        ),
    )(queries_t, grid_tokens, doclens)
    return out.T  # [Q, ND]
