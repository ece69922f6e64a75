"""Sweep fused-MaxSim kernel variants on the real TPU.

The round-1 kernel runs ~70 ms/batch64 at bench scale while the pure-MXU
floor for the same contraction is ~5.3 ms (1.04 TFLOP @ 197 TFLOPS bf16).
This sweep isolates where the gap lives: block geometry (DBLK/SUB), the
per-element iota mask vs an additive mask column folded into the sim block,
and the python-concatenate of per-doc max rows.

Run: JAX_PLATFORMS=<tpu> python scripts/profile_kernel_variants.py
"""

import functools
import os
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

# Bench shape: 5184 docs x Td 384 x d 128, 64 queries x 32 tokens.
ND, TD, D = 5184, 384, 128
Q, TQ = int(os.environ.get("SWEEP_Q", "64")), 32
QF = Q * TQ

rng = np.random.default_rng(0)
lens_np = rng.integers(64, TD, size=ND).astype(np.int32)
for i in range(0, ND, 7):
    lens_np[i] = 0
mask_rows = np.arange(TD)[None, :] >= lens_np[:, None]

# Generate everything ON DEVICE — a 509 MB grid h2d through the tunnel can
# take many minutes; only the tiny [ND] lens vector is uploaded.
lens = jnp.asarray(lens_np[:, None])


@jax.jit
def _gen():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    g = jax.random.normal(k1, (ND, TD, D), jnp.float32)
    valid = jnp.arange(TD)[None, :] < lens  # [ND, TD]
    g = jnp.where(valid[:, :, None], g, 0.0).astype(jnp.bfloat16)
    q = jax.random.normal(k2, (QF, D), jnp.float32).astype(jnp.bfloat16)
    mc = jnp.where(valid, jnp.float32(0.0), jnp.float32(NEG))
    return g, q, mc


grid, qflat, maskcol = _gen()
# Flat [ND*TD, 1] additive-mask layout: block rows line up with the reshaped
# [dblk*td, d] sim rows, so no lane->sublane relayout inside the kernel.
maskflat = maskcol.reshape(ND * TD, 1)


@jax.jit
def oracle_device(grid, qflat, lens):
    """Masked-einsum oracle computed on device in doc tiles (bf16 inputs,
    f32 accumulation — same precision class as the kernels). All big arrays
    are ARGUMENTS — a jit-closed-over 509 MB constant gets serialized into
    the remote-compile request (HTTP 413)."""
    tile = 64
    starts = jnp.arange(ND // tile, dtype=jnp.int32) * tile

    def score_tile(_, start):
        blk = jax.lax.dynamic_slice(grid, (start, 0, 0), (tile, TD, D))
        ln = jax.lax.dynamic_slice(lens, (start, 0), (tile, 1))
        sim = jnp.einsum(
            "qd,ntd->qnt", qflat, blk, preferred_element_type=jnp.float32
        )  # [QF, tile, TD]
        valid = jnp.arange(TD)[None, :] < ln  # [tile, TD]
        sim = jnp.where(valid[None], sim, NEG)
        m = jnp.max(sim, axis=-1)  # [QF, tile]
        m = jnp.where(m > NEG / 2, m, 0.0)
        return None, jnp.sum(m.reshape(Q, TQ, tile), axis=1)  # [Q, tile]

    _, tiles = jax.lax.scan(score_tile, None, starts)  # [nt, Q, tile]
    return tiles.transpose(0, 2, 1).reshape(ND, Q)


def oracle_cpu_check(nd_check=96):
    g = np.asarray(grid[:nd_check], np.float32)  # 9 MB d2h only
    q_np = np.asarray(qflat, np.float32)
    sim = np.einsum("qd,ntd->qnt", q_np, g, optimize=True)
    sim[:, mask_rows[:nd_check]] = -np.inf
    m = sim.reshape(Q, TQ, nd_check, TD).max(-1)
    m = np.where(np.isfinite(m), m, 0.0)
    return m.sum(1).T  # [nd_check, Q]


# ---------------------------------------------------------------- variants
def kernel_iota(qt_ref, grid_ref, lens_ref, out_ref, *, tq, sub):
    dblk, td, d = grid_ref.shape
    qf = qt_ref.shape[1]
    q_n = qf // tq
    qt = qt_ref[:]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (td, 1), 0)
    doc_rows = []
    for s in range(dblk // sub):
        block = grid_ref[s * sub : (s + 1) * sub].reshape(sub * td, d)
        sim = jnp.dot(block, qt, preferred_element_type=jnp.float32)
        for k in range(sub):
            doc_len = lens_ref[s * sub + k, 0]
            doc_sim = sim[k * td : (k + 1) * td]
            masked = jnp.where(row_iota < doc_len, doc_sim, jnp.float32(NEG))
            m = jnp.max(masked, axis=0, keepdims=True)
            doc_rows.append(jnp.where(m > NEG / 2, m, 0.0))
    scores_t = jnp.concatenate(doc_rows, axis=0)
    g = (
        jax.lax.broadcasted_iota(jnp.int32, (qf, q_n), 0) // tq
        == jax.lax.broadcasted_iota(jnp.int32, (qf, q_n), 1)
    ).astype(jnp.float32)
    out_ref[:] = jnp.dot(
        scores_t, g, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def kernel_addmask(qt_ref, grid_ref, mask_ref, out_ref, *, tq, sub):
    """Mask folded in as an additive column; no iota/select per element."""
    dblk, td, d = grid_ref.shape
    qf = qt_ref.shape[1]
    q_n = qf // tq
    qt = qt_ref[:]
    doc_rows = []
    for s in range(dblk // sub):
        block = grid_ref[s * sub : (s + 1) * sub].reshape(sub * td, d)
        mcol = mask_ref[s * sub : (s + 1) * sub].reshape(sub * td, 1)
        sim = jnp.dot(block, qt, preferred_element_type=jnp.float32)
        sim = sim + mcol
        for k in range(sub):
            m = jnp.max(sim[k * td : (k + 1) * td], axis=0, keepdims=True)
            doc_rows.append(jnp.where(m > NEG / 2, m, 0.0))
    scores_t = jnp.concatenate(doc_rows, axis=0)
    g = (
        jax.lax.broadcasted_iota(jnp.int32, (qf, q_n), 0) // tq
        == jax.lax.broadcasted_iota(jnp.int32, (qf, q_n), 1)
    ).astype(jnp.float32)
    out_ref[:] = jnp.dot(
        scores_t, g, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def kernel_addflat(qt_ref, grid_ref, mask_ref, out_ref, *, tq, sub):
    """Additive mask as a flat [dblk*td, 1] column (relayout-free)."""
    dblk, td, d = grid_ref.shape
    qf = qt_ref.shape[1]
    q_n = qf // tq
    qt = qt_ref[:]
    doc_rows = []
    for s in range(dblk // sub):
        block = grid_ref[s * sub : (s + 1) * sub].reshape(sub * td, d)
        mcol = mask_ref[s * sub * td : (s + 1) * sub * td]
        sim = jnp.dot(block, qt, preferred_element_type=jnp.float32)
        sim = sim + mcol
        for k in range(sub):
            m = jnp.max(sim[k * td : (k + 1) * td], axis=0, keepdims=True)
            doc_rows.append(jnp.where(m > NEG / 2, m, 0.0))
    scores_t = jnp.concatenate(doc_rows, axis=0)
    g = (
        jax.lax.broadcasted_iota(jnp.int32, (qf, q_n), 0) // tq
        == jax.lax.broadcasted_iota(jnp.int32, (qf, q_n), 1)
    ).astype(jnp.float32)
    out_ref[:] = jnp.dot(
        scores_t, g, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def kernel_iota_scratch(qt_ref, grid_ref, lens_ref, out_ref, scratch,
                        *, tq, sub):
    """iota mask + per-doc rows stored into VMEM scratch (no concatenate)."""
    dblk, td, d = grid_ref.shape
    qf = qt_ref.shape[1]
    q_n = qf // tq
    qt = qt_ref[:]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (td, 1), 0)
    for s in range(dblk // sub):
        block = grid_ref[s * sub : (s + 1) * sub].reshape(sub * td, d)
        sim = jnp.dot(block, qt, preferred_element_type=jnp.float32)
        for k in range(sub):
            doc_len = lens_ref[s * sub + k, 0]
            doc_sim = sim[k * td : (k + 1) * td]
            masked = jnp.where(row_iota < doc_len, doc_sim, jnp.float32(NEG))
            m = jnp.max(masked, axis=0, keepdims=True)
            scratch[s * sub + k : s * sub + k + 1, :] = jnp.where(
                m > NEG / 2, m, 0.0
            )
    g = (
        jax.lax.broadcasted_iota(jnp.int32, (qf, q_n), 0) // tq
        == jax.lax.broadcasted_iota(jnp.int32, (qf, q_n), 1)
    ).astype(jnp.float32)
    out_ref[:] = jnp.dot(
        scratch[:], g, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def kernel_addflat_fold(qt_ref, grid_ref, mask_ref, out_ref, *, tq, sub):
    """Additive flat mask + log-depth pairwise-fold max across each doc's
    token rows (jnp.maximum of strided halves instead of a [td]->1 axis
    reduction per doc)."""
    dblk, td, d = grid_ref.shape
    qf = qt_ref.shape[1]
    q_n = qf // tq
    qt = qt_ref[:]
    doc_rows = []
    for s in range(dblk // sub):
        block = grid_ref[s * sub : (s + 1) * sub].reshape(sub * td, d)
        mcol = mask_ref[s * sub * td : (s + 1) * sub * td]
        sim = jnp.dot(block, qt, preferred_element_type=jnp.float32)
        sim = sim + mcol
        # Fold whole sub-block: rows are doc-major [sub*td, qf]; halving the
        # PER-DOC period keeps doc groups aligned at every step.
        rows = td
        cur = sim
        while rows > 1:
            half = rows // 2
            lo = cur.reshape(-1, qf)
            top = lo[: lo.shape[0] // 2] if sub == 1 else None
            if sub == 1:
                cur = jnp.maximum(lo[:half], lo[half : 2 * half])
                rows = half
            else:
                break
        if sub == 1:
            m = jnp.max(cur, axis=0, keepdims=True)
            doc_rows.append(jnp.where(m > NEG / 2, m, 0.0))
        else:
            for k in range(sub):
                m = jnp.max(
                    sim[k * td : (k + 1) * td], axis=0, keepdims=True
                )
                doc_rows.append(jnp.where(m > NEG / 2, m, 0.0))
    scores_t = jnp.concatenate(doc_rows, axis=0)
    g = (
        jax.lax.broadcasted_iota(jnp.int32, (qf, q_n), 0) // tq
        == jax.lax.broadcasted_iota(jnp.int32, (qf, q_n), 1)
    ).astype(jnp.float32)
    out_ref[:] = jnp.dot(
        scores_t, g, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def kernel_dotsonly(qt_ref, grid_ref, lens_ref, out_ref, *, tq, sub):
    """MXU work only: sim dots + a SUM over doc tokens via a ones-matmul in
    place of the max (wrong results by design — isolates the VPU max +
    concatenate overhead of the real kernel)."""
    dblk, td, d = grid_ref.shape
    qf = qt_ref.shape[1]
    q_n = qf // tq
    qt = qt_ref[:]
    acc = None
    for s in range(dblk // sub):
        block = grid_ref[s * sub : (s + 1) * sub].reshape(sub * td, d)
        sim = jnp.dot(block, qt, preferred_element_type=jnp.float32)
        # Sum over all rows (cheap stand-in reduction, MXU-free): one
        # max-free reduction comparable in shape to the real one.
        r = jnp.sum(sim, axis=0, keepdims=True)  # [1, qf]
        acc = r if acc is None else acc + r
    g = (
        jax.lax.broadcasted_iota(jnp.int32, (qf, q_n), 0) // tq
        == jax.lax.broadcasted_iota(jnp.int32, (qf, q_n), 1)
    ).astype(jnp.float32)
    out_ref[:] = jnp.broadcast_to(
        jnp.dot(acc, g, preferred_element_type=jnp.float32), out_ref.shape
    )


def build(kernel, dblk, sub, mask_mode, vmem_mb=None, scratch=False):
    if mask_mode == "flat":
        third_spec = pl.BlockSpec(
            (dblk * TD, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        third = maskflat
    elif mask_mode == "grid2d":
        third_spec = pl.BlockSpec(
            (dblk, TD), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        third = maskcol
    else:
        third_spec = pl.BlockSpec(
            (dblk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        third = lens
    kw = {}
    if vmem_mb:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20
        )
    if scratch:
        kw["scratch_shapes"] = [pltpu.VMEM((dblk, QF), jnp.float32)]
    fn = pl.pallas_call(
        functools.partial(kernel, tq=TQ, sub=sub),
        out_shape=jax.ShapeDtypeStruct((ND, Q), jnp.float32),
        grid=(ND // dblk,),
        in_specs=[
            pl.BlockSpec((D, QF), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (dblk, TD, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            third_spec,
        ],
        out_specs=pl.BlockSpec(
            (dblk, Q), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * QF * D * ND * TD,
            bytes_accessed=ND * TD * D * 2 + QF * D * 2 + Q * ND * 4,
            transcendentals=0,
        ),
        **kw,
    )

    @jax.jit
    def run(qf_arr, grid_arr, third_arr):
        return fn(qf_arr.T, grid_arr, third_arr)

    return lambda q: run(q, grid, third)


def timeit(fn, reps=6):
    out = np.asarray(fn(qflat))  # compile + force
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = np.asarray(fn(qflat))
        times.append(time.perf_counter() - t0)
    return out, min(times), float(np.median(times))


def main():
    t0 = time.perf_counter()
    want = np.asarray(oracle_device(grid, qflat, lens))
    t_or = time.perf_counter() - t0
    chk = oracle_cpu_check()
    rel0 = np.abs(want[:96] - chk).max() / max(np.abs(chk).max(), 1e-9)
    print(f"device oracle: {t_or:.1f}s (compile+run), cpu-check relerr={rel0:.2e}", flush=True)
    t0 = time.perf_counter()
    np.asarray(oracle_device(grid, qflat, lens))
    print(f"XLA masked-einsum scan path:    {(time.perf_counter()-t0)*1e3:7.1f} ms", flush=True)

    # Pure-MXU floor: same contraction, no masking/max, XLA einsum into a
    # per-doc SUM (a matmul-only reduction) — measures achievable dot time.
    @jax.jit
    def floor_fn(qf_arr, grid):
        g2 = grid.reshape(ND * TD, D)
        s = jnp.dot(
            g2, qf_arr.T, preferred_element_type=jnp.float32
        )  # [ND*TD, QF]
        return jnp.sum(s.reshape(ND, TD * QF), axis=1)

    _, tmin, tmed = timeit(lambda q: floor_fn(q, grid))
    print(f"XLA one-big-dot floor:           {tmin*1e3:7.1f} ms min / {tmed*1e3:7.1f} med", flush=True)

    only = os.environ.get("VARIANTS", "")
    for name, kernel, mask_mode, dblk, sub, vmem, scratch in [
        ("iota  d64 s4 (round-1 kernel)", kernel_iota, "lens", 64, 4, None, False),
        ("iota  d32 s4", kernel_iota, "lens", 32, 4, None, False),
        ("iota  d16 s2", kernel_iota, "lens", 16, 2, None, False),
        ("iota  d16 s4", kernel_iota, "lens", 16, 4, None, False),
        ("iota  d8  s2", kernel_iota, "lens", 8, 2, None, False),
        ("flat  d32 s4", kernel_addflat, "flat", 32, 4, None, False),
        ("flat  d16 s2", kernel_addflat, "flat", 16, 2, None, False),
        ("flat  d64 s16", kernel_addflat, "flat", 64, 16, 100, False),
        ("flat  d16 s1 fold", kernel_addflat_fold, "flat", 16, 1, None, False),
        ("flat  d8  s1 fold", kernel_addflat_fold, "flat", 8, 1, None, False),
        ("scr   d32 s4", kernel_iota_scratch, "lens", 32, 4, None, True),
        ("scr   d64 s16", kernel_iota_scratch, "lens", 64, 16, 100, True),
    ]:
        if only and not any(tok in name for tok in only.split(",")):
            continue
        try:
            fn = build(kernel, dblk, sub, mask_mode, vmem, scratch)
            out, tmin, tmed = timeit(fn)
            err = np.abs(out - want).max()
            rel = err / max(np.abs(want).max(), 1e-9)
            print(
                f"{name:32s} {tmin*1e3:7.1f} ms min / {tmed*1e3:7.1f} med   "
                f"maxrelerr={rel:.2e}"
            )
        except Exception as e:
            print(f"{name:32s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
