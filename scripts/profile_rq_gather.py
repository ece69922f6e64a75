"""Measure RQ pair-search building blocks on the TPU: the 2-axis element
gather (round-1 design), the full-fine-axis row gather, and a flat
chunked-argmax over K=C*F with norm bias. Decides the 72M-token build's
assignment strategy (single dispatches must stay < ~60 s on this tunnel)."""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

C, F, D = 512, 256, 128  # K = 131072 (rq_split of 2^17)
N = 1 << 20  # 1M tokens per measured dispatch

key = jax.random.PRNGKey(0)
toks = jax.random.normal(key, (N, D), jnp.float32)
toks = toks / jnp.linalg.norm(toks, axis=1, keepdims=True)
coarse = jax.random.normal(jax.random.PRNGKey(1), (C, D), jnp.float32)
coarse = coarse / jnp.linalg.norm(coarse, axis=1, keepdims=True)
fine = 0.15 * jax.random.normal(jax.random.PRNGKey(2), (F, D), jnp.float32)
sums = coarse[:, None, :] + fine[None, :, :]
norms = jnp.linalg.norm(sums, axis=2)
inv = jnp.where(norms > 1e-4, 1.0 / jnp.maximum(norms, 1e-12), 0.0)
flat = (sums / jnp.maximum(norms[..., None], 1e-12)).reshape(C * F, D)


def timeit(fn, *args, reps=3):
    out = np.asarray(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return out, best


@functools.partial(jax.jit, static_argnames=("a", "b", "chunk"))
def assign_gather2(toks, coarse, fine, inv, a, b, chunk):
    """Round-1 style: top-a x top-b margin + 2-axis element gather."""
    def one(rows):
        xc = jnp.dot(rows, coarse.T, preferred_element_type=jnp.float32)
        xf = jnp.dot(rows, fine.T, preferred_element_type=jnp.float32)
        xa, ia = jax.lax.top_k(xc, a)
        xb, ib = jax.lax.top_k(xf, b)
        pair = xa[:, :, None] + xb[:, None, :]
        iv = inv[ia[:, :, None], ib[:, None, :]]
        scored = jnp.where(iv > 0, pair * iv, -jnp.inf)
        pidx = jnp.argmax(scored.reshape(rows.shape[0], a * b), axis=-1)
        ca = jnp.take_along_axis(ia, (pidx // b)[:, None], 1)[:, 0]
        fb = jnp.take_along_axis(ib, (pidx % b)[:, None], 1)[:, 0]
        return (ca * F + fb).astype(jnp.int32)

    return jax.lax.map(one, toks.reshape(-1, chunk, D)).reshape(-1)


@functools.partial(jax.jit, static_argnames=("a", "chunk"))
def assign_rowgather(toks, coarse, fine, inv, a, chunk):
    """Top-a coarse margin x FULL fine axis + row gather of inv[ia]."""
    def one(rows):
        xc = jnp.dot(rows, coarse.T, preferred_element_type=jnp.float32)
        xf = jnp.dot(rows, fine.T, preferred_element_type=jnp.float32)
        xa, ia = jax.lax.top_k(xc, a)
        iv = inv[ia]  # [chunk, a, F] row gather
        pair = xa[:, :, None] + xf[:, None, :]
        scored = jnp.where(iv > 0, pair * iv, -jnp.inf)
        pidx = jnp.argmax(scored.reshape(rows.shape[0], a * F), axis=-1)
        ca = jnp.take_along_axis(ia, (pidx // F)[:, None], 1)[:, 0]
        return (ca * F + pidx % F).astype(jnp.int32)

    return jax.lax.map(one, toks.reshape(-1, chunk, D)).reshape(-1)


@functools.partial(jax.jit, static_argnames=("chunk", "kblk"))
def assign_flat(toks, flat, chunk, kblk):
    """Exact flat argmax over K=C*F in running-max column blocks (the
    reference's memory-bounded GEMM argmax, codec.rs:297-343, on MXU)."""
    k_total = flat.shape[0]

    def one(rows):
        def body(carry, kstart):
            best, besti = carry
            blk = jax.lax.dynamic_slice(flat, (kstart, 0), (kblk, D))
            s = jnp.dot(rows, blk.T, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1)
            im = jnp.argmax(s, axis=-1).astype(jnp.int32) + kstart
            upd = m > best
            return (jnp.where(upd, m, best), jnp.where(upd, im, besti)), None

        init = (jnp.full((rows.shape[0],), -jnp.inf), jnp.zeros((rows.shape[0],), jnp.int32))
        (best, besti), _ = jax.lax.scan(
            body, init, jnp.arange(0, k_total, kblk, dtype=jnp.int32)
        )
        return besti

    return jax.lax.map(one, toks.reshape(-1, chunk, D)).reshape(-1)


def main():
    # Ground truth on a small slice (flat is exact by construction).
    gt, t_flat_small = timeit(assign_flat, toks[: 1 << 16], flat, 1 << 14, 8192)
    print(f"flat 64K tokens: {t_flat_small*1e3:.0f} ms", flush=True)

    for name, fn, args in [
        ("gather2 a64 b64 c32K", assign_gather2, (toks, coarse, fine, inv, 64, 64, 1 << 15)),
        ("gather2 a16 b16 c32K", assign_gather2, (toks, coarse, fine, inv, 16, 16, 1 << 15)),
        ("rowgat  a16 c8K", assign_rowgather, (toks, coarse, fine, inv, 16, 1 << 13)),
        ("rowgat  a64 c4K", assign_rowgather, (toks, coarse, fine, inv, 64, 1 << 12)),
        ("flat    c16K kblk8K", assign_flat, (toks, flat, 1 << 14, 8192)),
    ]:
        try:
            out, dt = timeit(fn, *args)
            agree = float(np.mean(out[: 1 << 16] == gt))
            print(
                f"{name:24s} {dt*1e3:8.0f} ms/1M tok "
                f"({N/dt/1e6:6.1f} M tok/s)  agree_vs_flat={agree:.4f}",
                flush=True,
            )
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
