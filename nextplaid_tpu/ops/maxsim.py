"""MaxSim (ColBERT late-interaction) scoring ops.

Replaces the reference's BLAS GEMM + AVX2/NEON SIMD max reduction
(`/root/reference/next-plaid/src/maxsim.rs:42-294`) with batched XLA einsums and
masked reductions — on TPU the GEMM rides the MXU and the row-max is a trivial
VPU reduction, so no hand-written SIMD is needed (SURVEY.md §2.5 P2/P3).

All entry points take explicit validity masks so fixed-shape padded batches can
be used: padded query tokens contribute 0 to the sum, padded document tokens are
excluded from the max.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# np scalar, not jnp: a module-level jnp constant initializes the XLA
# backend at import, which breaks jax.distributed.initialize (it must run
# before any backend touch). Same f32 promotion semantics.
NEG_INF = np.float32(-np.inf)


@jax.jit
def maxsim_score(query: jax.Array, doc: jax.Array) -> jax.Array:
    """Single (query, doc) MaxSim: sum_t max_j <q_t, d_j>.

    Reference `maxsim_score` (maxsim.rs:270-294). Unpadded variant.
    """
    sim = jnp.dot(
        query, doc.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.sum(jnp.max(sim, axis=-1))


@jax.jit
def maxsim_batch(
    queries: jax.Array,
    docs: jax.Array,
    query_mask: jax.Array,
    doc_mask: jax.Array,
) -> jax.Array:
    """Batched masked MaxSim.

    Args:
      queries: [Q, Tq, d].
      docs: [B, Td, d] (B may be a per-query candidate axis after vmap).
      query_mask: [Q, Tq] bool — True for real query tokens.
      doc_mask: [B, Td] bool — True for real doc tokens.

    Returns:
      [Q, B] float32 scores.
    """
    sim = jnp.einsum(
        "qtd,bjd->qbtj", queries, docs, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sim = jnp.where(doc_mask[None, :, None, :], sim, NEG_INF)
    per_token = jnp.max(sim, axis=-1)  # [Q, B, Tq]
    # A fully-masked doc yields -inf per-token maxima; zero those out like the
    # reference's `max_score > NEG_INFINITY` guard (search.rs:296-299).
    per_token = jnp.where(
        query_mask[:, None, :] & jnp.isfinite(per_token), per_token, 0.0
    )
    return jnp.sum(per_token, axis=-1)


@jax.jit
def maxsim_pairwise(
    queries: jax.Array,
    docs: jax.Array,
    query_mask: jax.Array,
    doc_mask: jax.Array,
) -> jax.Array:
    """Paired masked MaxSim: query i scored against doc slab i.

    Args:
      queries: [Q, Tq, d]; docs: [Q, R, Td, d] (per-query candidate slabs).
      query_mask: [Q, Tq]; doc_mask: [Q, R, Td].
    Returns:
      [Q, R] float32.
    """
    sim = jnp.einsum(
        "qtd,qrjd->qrtj", queries, docs, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sim = jnp.where(doc_mask[:, :, None, :], sim, NEG_INF)
    per_token = jnp.max(sim, axis=-1)  # [Q, R, Tq]
    per_token = jnp.where(
        query_mask[:, None, :] & jnp.isfinite(per_token), per_token, 0.0
    )
    return jnp.sum(per_token, axis=-1)
