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
  int8 grid   TRANSPOSED doc tiles [ND, d, Td] + per-token scales
              [ND, Td] (see _kernel_int8t — the transposed layout makes the
              per-row dequant scale a natural lane broadcast);
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


def _kernel_int8t(q_ref, grid_ref, lens_ref, dscale_ref, qscale_ref, out_ref,
                  *, tq: int, sub: int = 1):
    """TRANSPOSED int8 grid step: doc-major [dblk, d, Td] blocks.

    q_ref:      [Qf, d]       int8 (row-major queries — no transpose needed)
    grid_ref:   [dblk, d, Td] int8 (each doc a [d, Td] tile: d on sublanes,
                               tokens on LANES)
    lens_ref:   [dblk, 1]     int32
    dscale_ref: [dblk, Td]    f32 or bf16 (cast in-kernel) — row k
                               broadcasts over sim's LANE axis,
                               so no [N,1] lane-padded column is ever needed
                               (that layout cost ~25 MB of scoped VMEM and
                               sank the row-major int8 kernel)
    qscale_ref: [Qf, 1]       f32
    out_ref:    [Q, dblk]     f32 — the output grid writes [Q, ND] columns
                               directly; no final transpose

    Per step of `sub` docs: their [d, Td] tiles concatenate along LANES
    into one [d, sub*Td] panel, so ONE int8 MXU dot scores sub docs —
    q_i8 @ panel -> [Qf, sub*Td] i32. (With sub=1 this is the original
    one-dot-per-doc loop; wider panels amortize the dot issue overhead
    that made the per-doc loop the kernel's bound.) Scale by the
    lane-concatenated dscale rows, mask invalid token LANES via
    lane-position % Td against each doc's len, then per-doc max over its
    Td lane slice -> [Qf, 1]; ACCUMULATE each column into a single
    [Qf, dblk] buffer through a one-hot lane mask. (Collecting dblk
    separate [Qf, 1] columns and concatenating at the end padded each to
    a full 128-lane VMEM tile — the ~52 MB scoped-VMEM blowup that kept
    this kernel interpret-only in round 2. With the accumulator,
    per-iteration temporaries die every step.)
    Finally multiply by qscale and reduce query tokens with the indicator
    matmul G^T [Q, Qf].
    """
    dblk, d, td = grid_ref.shape
    qf = q_ref.shape[0]
    q_n = qf // tq
    q = q_ref[:]

    blk_iota = jax.lax.broadcasted_iota(jnp.int32, (1, dblk), 1)
    # Lane position within each doc's Td span of the widened panel.
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (1, sub * td), 1) % td
    acc = jnp.zeros((qf, dblk), jnp.float32)
    for s in range(dblk // sub):
        ks = range(s * sub, (s + 1) * sub)
        panel = (
            grid_ref[s * sub]
            if sub == 1
            else jnp.concatenate([grid_ref[k] for k in ks], axis=1)
        )  # [d, sub*Td]
        sim_i = jnp.dot(
            q, panel, preferred_element_type=jnp.int32
        )  # [Qf, sub*Td]
        dsc = jnp.concatenate(
            [dscale_ref[k : k + 1] for k in ks], axis=1
        ).astype(jnp.float32) if sub > 1 else dscale_ref[
            s : s + 1
        ].astype(jnp.float32)  # [1, sub*Td]
        len_w = jnp.concatenate(
            [
                jnp.full((1, td), lens_ref[k, 0], jnp.int32)
                for k in ks
            ],
            axis=1,
        ) if sub > 1 else jnp.full((1, td), lens_ref[s * sub, 0], jnp.int32)
        masked = jnp.where(
            pos_iota < len_w,
            sim_i.astype(jnp.float32) * dsc,
            jnp.float32(NEG),
        )
        for j, k in enumerate(ks):
            m = jnp.max(
                masked[:, j * td : (j + 1) * td], axis=1, keepdims=True
            )  # [Qf, 1]
            m = jnp.where(m > NEG / 2, m, 0.0)
            acc = acc + jnp.where(blk_iota == k, m, 0.0)  # [Qf, dblk]
    scores = acc * qscale_ref[:]
    g = (
        jax.lax.broadcasted_iota(jnp.int32, (q_n, qf), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (q_n, qf), 1) // tq
    ).astype(jnp.float32)
    out_ref[:] = jnp.dot(
        g, scores, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("tq", "interpret", "sub"))
def maxsim_grid_scores_int8t(
    queries_i8: jax.Array,  # [Q*Tq, d] int8, zero rows for padded tokens
    qscales: jax.Array,  # [Q*Tq] f32 per-query-token scales (0 for padding)
    grid_t: jax.Array,  # [ND, d, Td] int8 (TRANSPOSED doc tiles)
    doclens: jax.Array,  # [ND, 1] int32
    dscales: jax.Array,  # [ND, Td] f32/bf16 (0 for invalid tokens)
    tq: int,
    interpret: bool = False,
    sub: int = 1,
) -> jax.Array:
    """Exhaustive MaxSim scores [Q, ND] over a TRANSPOSED int8 grid.

    COMPILES AND RUNS ON-CHIP (round 3): the one-hot-lane accumulator cut
    scoped-VMEM liveness from ~52 MB to ~24 MB, under the raised 100 MB
    Mosaic limit below. Measured at production shapes (Q=64, Tq=32, Td=384,
    5632 docs): p50 31.7 ms = 35.7 TFLOPS on the int8 MXU — 2x the bf16
    kernel (61-95 ms) and faster than the 33.5 ms XLA one-big-dot floor for
    the same contraction; bit-exact vs interpret mode. `sub` > 1 scores
    that many docs per MXU dot by lane-concatenating their [d, Td] tiles
    (bit-exact vs sub=1; see _kernel_int8t)."""
    nd, d, td = grid_t.shape
    qf = queries_i8.shape[0]
    q_n = qf // tq
    # The output block's LANE axis is the doc axis, so dblk must be a
    # multiple of 128 (Pallas block-shape rule); the int8 grid builder pads
    # nd to a multiple of 128 by construction.
    dblk = 128
    assert nd % dblk == 0, f"int8 grid rows {nd} not a multiple of {dblk}"
    assert dblk % sub == 0, f"sub {sub} must divide dblk {dblk}"

    out = pl.pallas_call(
        functools.partial(_kernel_int8t, tq=tq, sub=sub),
        out_shape=jax.ShapeDtypeStruct((q_n, nd), jnp.float32),
        grid=(nd // dblk,),
        in_specs=[
            pl.BlockSpec((qf, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (dblk, d, td), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((dblk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (dblk, td), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((qf, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (q_n, dblk), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        # The accumulator formulation needs ~24 MB of scoped VMEM at
        # production shapes (double-buffered 6.3 MB int8 grid blocks + the
        # per-iteration [Qf, Td] similarity temporaries); raise Mosaic's
        # default 16 MB scoped-vmem limit — v5e has 128 MB of VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qf * d * nd * td,
            bytes_accessed=nd * td * (d + 4) + qf * d + q_n * nd * 4,
            transcendentals=0,
        ),
    )(
        queries_i8,
        grid_t,
        doclens,
        dscales,
        qscales.reshape(qf, 1),
    )
    return out  # [Q, ND]


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
