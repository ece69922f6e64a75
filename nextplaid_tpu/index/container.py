"""DeviceIndex: the PLAID index as device-resident arrays.

TPU-native replacement for the reference's `MmapIndex`
(/root/reference/next-plaid/src/index.rs:995-1179): instead of memory-mapped NPY
files paged by the OS, all hot tables live in HBM as fixed-shape arrays —

  centroids      [K, d]            f32   (replicated across devices)
  codes          [Nvec_pad]        i32   (token -> centroid id)
  residuals      [Nvec_pad, pd]    u8    (packed 2/4-bit residuals)
  doc_offsets    [ndocs + 1]       i32   (CSR over the token table)
  doclens        [ndocs]           i32
  ivf_offsets    [K + 1]           i32   (CSR over posting lists)
  ivf_doc_ids    [nnz_pad]         i32

The on-disk representation stays byte-compatible with the reference's chunked
NPY + JSON directory (index.rs:373-528) so indexes are interchangeable and the
reference's eval harnesses can be reused.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nextplaid_tpu.index.config import Metadata
from nextplaid_tpu.storage.npy import IndexLayout, load_json, load_npy


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclass
class DeviceIndex:
    """PLAID index resident on device. A pytree: jittable as an argument."""

    centroids: jax.Array  # [K, d] f32
    codes: jax.Array  # [Nvec_pad] i32
    residuals: jax.Array  # [Nvec_pad, packed_dim] u8
    doc_offsets: jax.Array  # [ndocs_pad + 1] i32
    doclens: jax.Array  # [ndocs_pad] i32 (0 beyond num_documents)
    ivf_offsets: jax.Array  # [K + 1] i32
    ivf_doc_ids: jax.Array  # [nnz_pad] i32
    bucket_cutoffs: jax.Array  # [2^nbits - 1] f32
    bucket_weights: jax.Array  # [2^nbits] f32
    avg_residual: jax.Array  # [d] f32
    # Optional pinned decompressed corpus. bf16 layout: [ndocs_grid, Td, d].
    # int8 layout: TRANSPOSED doc tiles [ndocs_grid, d, Td] (tokens on
    # lanes — see ops/maxsim_kernel.py _kernel_int8t). Built at load when it
    # fits the HBM budget; lets exhaustive search skip the per-batch
    # decompress entirely (dynamic-slice + MXU einsum / fused kernel).
    token_grid: Optional[jax.Array] = None
    # Per-token dequantization scales [ndocs_grid, Td] bf16 — present
    # iff token_grid is int8 (token ~= int8_row * scale).
    token_scales: Optional[jax.Array] = None
    # Optional RQ factored centroid structure (ops/rq.py): present when the
    # index was built with centroid_structure="rq" (huge-K regime). The flat
    # `centroids` table above is always materialized — decompression and
    # format compatibility never see RQ; only stage 1-2 of staged search
    # uses the factors.
    rq_coarse: Optional[jax.Array] = None  # [C, d] f32
    rq_fine: Optional[jax.Array] = None  # [F, d] f32
    rq_inv_norms: Optional[jax.Array] = None  # [C, F] f32, 0 = degenerate
    # --- static metadata (aux fields: not traced) ---
    nbits: int = dataclasses.field(metadata=dict(static=True), default=4)
    num_documents: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_embeddings: int = dataclasses.field(metadata=dict(static=True), default=0)
    max_doclen: int = dataclasses.field(metadata=dict(static=True), default=0)
    max_posting_len: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def num_centroids(self) -> int:
        return self.centroids.shape[0]

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]

    @property
    def num_docs_padded(self) -> int:
        return self.doclens.shape[0]

    # ------------------------------------------------------------------
    # Pinned decompressed corpus
    # ------------------------------------------------------------------
    def grid_td(self) -> int:
        # Lane-aligned token axis (multiple of 128) so the fused Pallas
        # MaxSim kernel can reshape [Dblk*Td] similarity rows cleanly.
        return max(_round_up(max(self.max_doclen, 1), 128), 128)

    def grid_token_axis(self) -> int:
        """Td of the pinned grid, layout-independent (bf16 axis 1, int8
        transposed axis 2)."""
        assert self.token_grid is not None
        return (
            self.token_grid.shape[2]
            if self.token_scales is not None
            else self.token_grid.shape[1]
        )

    def grid_bytes(self, dtype: str = "bf16") -> int:
        per_tok = self.dim * 2 if dtype == "bf16" else self.dim + 2
        return self.num_docs_padded * self.grid_td() * per_tok

    def with_token_grid(
        self, budget_mb: Optional[int] = None, dtype: Optional[str] = None
    ) -> "DeviceIndex":
        """Return a copy carrying the decompressed [nd_pad, Td, d] token
        grid, or self unchanged if it exceeds the HBM budget
        (NEXT_PLAID_PIN_BUDGET_MB, default 4096).

        dtype (or NEXT_PLAID_PIN_DTYPE): "bf16", "int8", or "auto" (default)
        — auto pins bf16 when it fits and falls back to int8, which halves
        grid HBM (per-token symmetric quantization with a bf16 scale per
        token; the int8 MXU path has 2x the bf16 peak). int8 doubles the
        corpus size one chip can serve exactly."""
        if self.token_grid is not None or self.num_documents == 0:
            return self
        if budget_mb is None:
            budget_mb = int(
                os.environ.get("NEXT_PLAID_PIN_BUDGET_MB", "4096")
            )
        if dtype is None:
            dtype = os.environ.get("NEXT_PLAID_PIN_DTYPE", "auto")
        budget = budget_mb << 20
        if dtype == "auto":
            if self.grid_bytes("bf16") <= budget:
                dtype = "bf16"
            elif self.grid_bytes("int8") <= budget:
                # Loud, because this changes scoring precision for every
                # query on this index: measured recall@10 0.992 -> 0.977 at
                # 30M embeddings (docs/benchmarks/megascale_30m_int8.json).
                # Operators who want full precision should raise
                # NEXT_PLAID_PIN_BUDGET_MB (bf16 grid), accept the slower
                # unpinned scan (NEXT_PLAID_PIN_DTYPE=bf16, which skips
                # pinning when over budget), or shard across chips.
                logging.getLogger(__name__).warning(
                    "token grid auto-pinning falling back to int8: bf16 "
                    "grid needs %d MB > budget %d MB. Exact-search scores "
                    "are now int8-quantized (recall@10 delta ~-0.015 at "
                    "30M embeddings). Set NEXT_PLAID_PIN_DTYPE=bf16 to "
                    "keep full precision (unpinned if over budget), or "
                    "int8 to silence this warning.",
                    self.grid_bytes("bf16") >> 20,
                    budget_mb,
                )
                dtype = "int8"
            else:
                return self
        elif self.grid_bytes(dtype) > budget:
            return self
        if dtype == "bf16":
            grid = _build_token_grid(self, self.grid_td())
            return dataclasses.replace(self, token_grid=grid)
        grid, scales = _build_token_grid_int8(self, self.grid_td())
        return dataclasses.replace(
            self, token_grid=grid, token_scales=scales
        )

    # ------------------------------------------------------------------
    # Construction from host arrays
    # ------------------------------------------------------------------
    @classmethod
    def from_host(
        cls,
        centroids: np.ndarray,
        codes: np.ndarray,
        residuals: np.ndarray,
        doclens: np.ndarray,
        ivf_lengths: np.ndarray,
        ivf_doc_ids: np.ndarray,
        bucket_cutoffs: np.ndarray,
        bucket_weights: np.ndarray,
        avg_residual: np.ndarray,
        nbits: int,
        pad_docs: int = 8,
        pad_tokens: int = 128,
        rq_coarse: Optional[np.ndarray] = None,
        rq_fine: Optional[np.ndarray] = None,
    ) -> "DeviceIndex":
        ndocs = int(doclens.shape[0])
        nvec = int(codes.shape[0])
        k, d = centroids.shape
        packed_dim = d * nbits // 8
        assert residuals.shape == (nvec, packed_dim), (
            residuals.shape,
            (nvec, packed_dim),
        )

        # +1 so `num_documents` itself is a usable in-bounds sentinel slot
        # (doclen 0) for padded candidate buffers.
        ndocs_pad = max(_round_up(ndocs + 1, pad_docs), pad_docs)
        nvec_pad = max(_round_up(nvec, pad_tokens), pad_tokens)
        nnz = int(ivf_doc_ids.shape[0])
        nnz_pad = max(_round_up(nnz, pad_tokens), pad_tokens)

        doclens_p = np.zeros(ndocs_pad, np.int32)
        doclens_p[:ndocs] = doclens
        doc_offsets = np.zeros(ndocs_pad + 1, np.int32)
        np.cumsum(doclens_p, out=doc_offsets[1:])

        codes_p = np.zeros(nvec_pad, np.int32)
        codes_p[:nvec] = codes
        residuals_p = np.zeros((nvec_pad, packed_dim), np.uint8)
        residuals_p[:nvec] = residuals

        ivf_offsets = np.zeros(k + 1, np.int32)
        np.cumsum(np.asarray(ivf_lengths, np.int64), out=ivf_offsets[1:])
        ivf_p = np.full(nnz_pad, ndocs, np.int32)  # sentinel = ndocs (invalid doc)
        ivf_p[:nnz] = ivf_doc_ids

        max_posting = int(np.max(ivf_lengths)) if len(ivf_lengths) else 0
        max_doclen = int(np.max(doclens)) if ndocs else 0

        rq_inv = None
        if rq_coarse is not None and rq_fine is not None:
            from nextplaid_tpu.ops.rq import RQCodebook

            rq_inv = RQCodebook(
                coarse=np.asarray(rq_coarse, np.float32),
                fine=np.asarray(rq_fine, np.float32),
            ).inv_norms()

        return cls(
            centroids=jnp.asarray(centroids, jnp.float32),
            codes=jnp.asarray(codes_p),
            residuals=jnp.asarray(residuals_p),
            doc_offsets=jnp.asarray(doc_offsets),
            doclens=jnp.asarray(doclens_p),
            ivf_offsets=jnp.asarray(ivf_offsets),
            ivf_doc_ids=jnp.asarray(ivf_p),
            bucket_cutoffs=jnp.asarray(bucket_cutoffs, jnp.float32),
            bucket_weights=jnp.asarray(bucket_weights, jnp.float32),
            avg_residual=jnp.asarray(avg_residual, jnp.float32),
            rq_coarse=(
                jnp.asarray(rq_coarse, jnp.float32)
                if rq_coarse is not None
                else None
            ),
            rq_fine=(
                jnp.asarray(rq_fine, jnp.float32)
                if rq_fine is not None
                else None
            ),
            rq_inv_norms=(
                jnp.asarray(rq_inv) if rq_inv is not None else None
            ),
            nbits=nbits,
            num_documents=ndocs,
            num_embeddings=nvec,
            max_doclen=max_doclen,
            max_posting_len=max_posting,
        )

    # ------------------------------------------------------------------
    # Load from the reference-compatible on-disk format
    # ------------------------------------------------------------------
    @classmethod
    def load(cls, index_path: str) -> "DeviceIndex":
        """Load an index directory (reference `MmapIndex::load`, index.rs:1026).

        Reads chunked codes/residuals/doclens, concatenates, and stages into
        device arrays. Also accepts fast-plaid-written f16 centroids.
        """
        layout = IndexLayout(index_path)
        meta = Metadata.from_dict(load_json(layout.metadata))

        centroids = np.asarray(load_npy(layout.centroids), np.float32)
        cutoffs = np.asarray(load_npy(layout.bucket_cutoffs), np.float32)
        weights = np.asarray(load_npy(layout.bucket_weights), np.float32)
        avg_residual = np.asarray(load_npy(layout.avg_residual), np.float32)

        packed_dim = centroids.shape[1] * meta.nbits // 8
        code_paths = [str(layout.chunk_codes(i)) for i in range(meta.num_chunks)]
        res_paths = [
            str(layout.chunk_residuals(i)) for i in range(meta.num_chunks)
        ]
        doclens_list: List[np.ndarray] = [
            np.asarray(load_json(layout.chunk_doclens(i)), np.int64)
            for i in range(meta.num_chunks)
        ]
        # Chunk merge goes through the native mmap+memcpy pass when the host
        # library is built (reference merge_*_chunks, mmap.rs:1266-1704);
        # numpy concatenation otherwise.
        from nextplaid_tpu.storage import native

        codes = None
        residuals = None
        if meta.num_chunks and native.available():
            first_codes = np.asarray(load_npy(code_paths[0], mmap=True))
            codes = native.merge_chunk_payloads(
                code_paths, first_codes.dtype
            )
            residuals = native.merge_chunk_payloads(
                res_paths, np.uint8, (packed_dim,)
            )
        if codes is None:
            codes_list = [
                np.asarray(load_npy(p)) for p in code_paths
            ]
            codes = (
                np.concatenate(codes_list)
                if codes_list
                else np.zeros(0, np.int64)
            )
        if residuals is None:
            res_list = [np.asarray(load_npy(p)) for p in res_paths]
            residuals = (
                np.concatenate(res_list)
                if res_list
                else np.zeros((0, packed_dim), np.uint8)
            )
        codes = codes.astype(np.int32)
        doclens = (
            np.concatenate(doclens_list) if doclens_list else np.zeros(0, np.int64)
        ).astype(np.int32)

        ivf = np.asarray(load_npy(layout.ivf), np.int32)
        ivf_lengths = np.asarray(load_npy(layout.ivf_lengths), np.int64)

        rq_coarse = rq_fine = None
        if layout.rq_coarse.exists() and layout.rq_fine.exists():
            rq_coarse = np.asarray(load_npy(layout.rq_coarse), np.float32)
            rq_fine = np.asarray(load_npy(layout.rq_fine), np.float32)
            if rq_coarse.shape[0] * rq_fine.shape[0] != centroids.shape[0]:
                # Stale sidecars from a previous build generation; the flat
                # table is authoritative.
                rq_coarse = rq_fine = None

        return cls.from_host(
            rq_coarse=rq_coarse,
            rq_fine=rq_fine,
            centroids=centroids,
            codes=codes,
            residuals=residuals,
            doclens=doclens,
            ivf_lengths=ivf_lengths,
            ivf_doc_ids=ivf,
            bucket_cutoffs=cutoffs,
            bucket_weights=weights,
            avg_residual=avg_residual,
            nbits=meta.nbits,
        )


@functools.partial(jax.jit, static_argnames=("nbits", "td", "tile"))
def _build_token_grid_jit(
    codes, residuals, doc_offsets, doclens, centroids, bucket_weights,
    nbits, td, tile,
):
    from nextplaid_tpu.ops import codec as codec_ops

    nvec_pad = codes.shape[0]
    nd_pad = doclens.shape[0]
    # Pad rows so exact-search dynamic_slice windows (doc_tile <= 512) never
    # clamp: a clamped start would silently misalign tile <-> doc ids.
    nd_grid = ((nd_pad + 512 + tile - 1) // tile) * tile
    n_tiles = nd_grid // tile
    t_arange = jnp.arange(td, dtype=jnp.int32)

    def build_tile(_, start):
        ids = start + jnp.arange(tile, dtype=jnp.int32)
        safe = jnp.minimum(ids, nd_pad - 1)
        offs = doc_offsets[safe]
        lens = jnp.where(ids < nd_pad, doclens[safe], 0)
        tok_pos = jnp.clip(offs[:, None] + t_arange[None, :], 0, nvec_pad - 1)
        tok_valid = t_arange[None, :] < lens[:, None]
        emb = codec_ops.decompress_residuals(
            residuals[tok_pos], codes[tok_pos], centroids, bucket_weights,
            nbits, normalize=True,
        )
        emb = jnp.where(tok_valid[:, :, None], emb, 0.0)
        return None, emb.astype(jnp.bfloat16)

    starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    _, tiles = jax.lax.scan(build_tile, None, starts)
    return tiles.reshape(n_tiles * tile, td, -1)


@functools.partial(jax.jit, static_argnames=("nbits", "td", "tile"))
def _build_token_grid_int8_jit(
    codes, residuals, doc_offsets, doclens, centroids, bucket_weights,
    nbits, td, tile,
):
    from nextplaid_tpu.ops import codec as codec_ops

    nvec_pad = codes.shape[0]
    nd_pad = doclens.shape[0]
    nd_grid = ((nd_pad + 512 + tile - 1) // tile) * tile
    n_tiles = nd_grid // tile
    t_arange = jnp.arange(td, dtype=jnp.int32)

    def build_tile(_, start):
        ids = start + jnp.arange(tile, dtype=jnp.int32)
        safe = jnp.minimum(ids, nd_pad - 1)
        offs = doc_offsets[safe]
        lens = jnp.where(ids < nd_pad, doclens[safe], 0)
        tok_pos = jnp.clip(offs[:, None] + t_arange[None, :], 0, nvec_pad - 1)
        tok_valid = t_arange[None, :] < lens[:, None]
        emb = codec_ops.decompress_residuals(
            residuals[tok_pos], codes[tok_pos], centroids, bucket_weights,
            nbits, normalize=True,
        )
        emb = jnp.where(tok_valid[:, :, None], emb, 0.0)
        # Symmetric per-token quantization: q = round(x * 127 / maxabs).
        maxabs = jnp.max(jnp.abs(emb), axis=-1)  # [tile, td]
        scale = jnp.where(maxabs > 0, maxabs / 127.0, 1.0)
        q = jnp.clip(jnp.round(emb / scale[:, :, None]), -127, 127)
        # TRANSPOSED doc tiles [tile, d, Td]: the int8 kernel needs d on
        # sublanes / tokens on lanes so the per-token dequant scale is a
        # natural lane broadcast (ops/maxsim_kernel.py _kernel_int8t).
        return None, (
            q.astype(jnp.int8).transpose(0, 2, 1),
            jnp.where(tok_valid, scale, 0.0).astype(jnp.bfloat16),
        )

    starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    _, (tiles, scales) = jax.lax.scan(build_tile, None, starts)
    d = tiles.shape[-2]
    return (
        tiles.reshape(n_tiles * tile, d, td),
        scales.reshape(n_tiles * tile, td),
    )


def _build_token_grid_int8(index: "DeviceIndex", td: int):
    """TRANSPOSED int8 token grid [nd, d, Td] + per-token bf16 scales
    [nd, Td] (see with_token_grid)."""
    return _build_token_grid_int8_jit(
        index.codes,
        index.residuals,
        index.doc_offsets,
        index.doclens,
        index.centroids,
        index.bucket_weights,
        index.nbits,
        td,
        128,
    )


def _build_token_grid(index: "DeviceIndex", td: int) -> jax.Array:
    """Decompress the whole corpus once into a padded bf16 token grid.

    Zeroed padding rows contribute 0 to every dot product, so the grid path
    needs no per-token mask at query time — padded tokens can never win the
    per-query-token max against a real token unless every similarity is
    negative, which the NEG_INF masking in exact.py handles via doclens.
    """
    return _build_token_grid_jit(
        index.codes,
        index.residuals,
        index.doc_offsets,
        index.doclens,
        index.centroids,
        index.bucket_weights,
        index.nbits,
        td,
        tile=64,
    )
