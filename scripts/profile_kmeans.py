"""Micro-profile Lloyd components: assignment matmul+argmax vs segment_sum."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

N, K, D = 1_441_792, 16384, 128  # ~bench scale, rounded
rng = np.random.default_rng(0)
data = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
cents = jnp.asarray(rng.standard_normal((K, D)).astype(np.float32))


def _force(x):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), x)


def timeit(name, fn, *args):
    out = _force(fn(*args))  # warm + force full device->host completion
    t0 = time.perf_counter()
    out = _force(fn(*args))
    print(f"{name:40s} {(time.perf_counter()-t0)*1000:9.1f} ms", flush=True)
    return jax.tree_util.tree_map(jnp.asarray, out)


CHUNK = 65536
chunks = data.reshape(-1, CHUNK, D)


@jax.jit
def assign_highest(chunks, cents):
    def f(chunk):
        s = jnp.dot(chunk, cents.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        return jnp.argmax(s, axis=-1).astype(jnp.int32)
    return jax.lax.map(f, chunks).reshape(-1)


@jax.jit
def assign_default(chunks, cents):
    def f(chunk):
        s = jnp.dot(chunk.astype(jnp.bfloat16), cents.T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return jnp.argmax(s, axis=-1).astype(jnp.int32)
    return jax.lax.map(f, chunks).reshape(-1)


codes = timeit("assign HIGHEST (map 22 chunks)", assign_highest, chunks, cents)
codes = timeit("assign bf16    (map 22 chunks)", assign_default, chunks, cents)


@jax.jit
def seg_sum(data, codes):
    sums = jax.ops.segment_sum(data, codes, num_segments=K + 1)[:K]
    counts = jax.ops.segment_sum(jnp.ones((N,), jnp.float32), codes,
                                 num_segments=K + 1)[:K]
    return sums, counts


timeit("segment_sum update", seg_sum, data, codes)


@jax.jit
def onehot_update(chunks, codes):
    codes_c = codes.reshape(-1, CHUNK)

    def f(carry, args):
        chunk, cc = args
        oh = (cc[:, None] == jnp.arange(K)[None, :]).astype(jnp.bfloat16)
        sums = jnp.dot(chunk.T.astype(jnp.bfloat16), oh,
                       preferred_element_type=jnp.float32)  # [D, K]
        counts = jnp.sum(oh, axis=0, dtype=jnp.float32)
        return (carry[0] + sums, carry[1] + counts), None

    init = (jnp.zeros((D, K), jnp.float32), jnp.zeros((K,), jnp.float32))
    (sums, counts), _ = jax.lax.scan(f, init, (chunks, codes_c))
    return sums.T, counts


timeit("one-hot matmul update", onehot_update, chunks, codes)
