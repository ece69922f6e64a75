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
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nextplaid_tpu.index.config import Metadata
from nextplaid_tpu.storage.npy import IndexLayout, load_json, load_npy


# Geometric probe counts for posting_mass_prefix (see DeviceIndex field).
_MASS_COUNTS = (64, 128, 256, 512, 1024, 2048, 4096)


def _posting_mass_prefix(ivf_lengths: np.ndarray) -> Tuple[int, ...]:
    """Sum of the top-`c` posting lengths for each c in _MASS_COUNTS."""
    if ivf_lengths is None or len(ivf_lengths) == 0:
        return ()
    desc = np.sort(np.asarray(ivf_lengths, np.int64))[::-1]
    csum = np.cumsum(desc)
    total = int(csum[-1])
    return tuple(
        int(csum[min(c, len(desc)) - 1]) if c <= len(desc) else total
        for c in _MASS_COUNTS
    )


def _grid_td_for(max_doclen: int, dtype: str) -> int:
    """Token-axis padding of the pinned grid (single source of truth —
    also used by plan_capacity_factor's what-if sizing).

    int8 mult: the interleaved kernel (_kernel_int8i) only needs Td
    divisible by its <=16-token chunk width, so 32 suffices (and is
    int8-sublane aligned). The original 128 padded the 100-220-doclen
    megascale corpus by 41% of slots (14.3 GB grid vs 11 GB at mult 32) —
    HBM that now holds the device-resident refine arrays instead."""
    mult = 32 if dtype == "int8" else 8
    return max(_round_up(max(max_doclen, 1), mult), mult)


def _grid_bytes_for(rows: int, max_doclen: int, dim: int, dtype: str) -> int:
    per_tok = dim * 2 if dtype == "bf16" else dim + 2
    return rows * _grid_td_for(max_doclen, dtype) * per_tok


def _padded_doc_rows(ndocs: int, doc_capacity: int, pad_docs: int = 8) -> int:
    """Doc rows after padding: +1 sentinel slot, doc_capacity reserves
    extra rows for in-place appends (single source of truth — from_host
    and plan_capacity_factor must agree or headroom planning mispredicts
    the pinning outcome)."""
    return max(_round_up(max(ndocs + 1, doc_capacity), pad_docs), pad_docs)


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
    # int8 layout: token-INTERLEAVED 128-doc groups [ndocs_grid/128, d,
    # 128*Td] with lane l = t*128 + j (see ops/maxsim_kernel.py
    # _kernel_int8i). Built at load when it fits the HBM budget; lets
    # exhaustive search skip the per-batch decompress entirely
    # (dynamic-slice + MXU einsum / fused kernel).
    token_grid: Optional[jax.Array] = None
    # Per-token dequantization scales, interleaved like the grid
    # [ndocs_grid/128, 128*Td] bf16 — present iff token_grid is int8
    # (token ~= int8_row * scale; 0 marks an invalid token).
    token_scales: Optional[jax.Array] = None
    # Optional RQ factored centroid structure (ops/rq.py): present when the
    # index was built with centroid_structure="rq" (huge-K regime). The flat
    # `centroids` table above is always materialized — decompression and
    # format compatibility never see RQ; only stage 1-2 of staged search
    # uses the factors.
    rq_coarse: Optional[jax.Array] = None  # [C, d] f32
    rq_fine: Optional[jax.Array] = None  # [F, d] f32
    rq_inv_norms: Optional[jax.Array] = None  # [C, F] f32, 0 = degenerate
    # Live counts as TRACED i32 scalars: document/embedding counts change
    # on every serving append, and a static count would re-key (and
    # recompile) every jitted search program per 300-doc ingest batch.
    # Array shapes are CAPACITIES (grown geometrically by append_batch), so
    # jit keys stay stable across appends within a capacity bucket.
    n_docs: jax.Array = None  # i32 scalar
    n_emb: jax.Array = None  # i32 scalar
    # --- static metadata (aux fields: not traced) ---
    nbits: int = dataclasses.field(metadata=dict(static=True), default=4)
    max_doclen: int = dataclasses.field(metadata=dict(static=True), default=0)
    max_posting_len: int = dataclasses.field(metadata=dict(static=True), default=0)
    # Prefix sums of the DESCENDING posting-length distribution at geometric
    # counts (_MASS_COUNTS): posting_mass_prefix[i] = sum of the
    # _MASS_COUNTS[i] longest posting lists. A skew-proof upper bound on the
    # posting mass any ncells-cell probe can select — lets staged search size
    # its flat stream budget to the corpus's actual skew instead of a 4x
    # average-mass guess (see PipelineShapes.derive). Empty = unknown
    # (derive falls back to the average heuristic).
    posting_mass_prefix: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True), default=()
    )
    # Grid-only serving mode (`load_grid_only`): the IVF is a 0-row
    # placeholder and only the exact pinned-grid path is valid.
    # codes/residuals are 0-row too UNLESS refine="device" kept them
    # resident as the refinement rerank's lookup tables (still immutable —
    # staged search / appends raise regardless).
    grid_only: bool = dataclasses.field(
        metadata=dict(static=True), default=False
    )
    # Bucketed-Td grids (`load_grid_only(..., buckets=)`): instead of one
    # grid padded to the GLOBAL max doclen, docs are partitioned into
    # length buckets, each with its own Td. The saving tracks doclen skew:
    # measured 1.14x fewer token slots (15.7 -> 13.9 GB int8) on the 72M
    # corpus (uniform 100-220 tokens); long-tailed real corpora (few long
    # docs forcing a large global Td) gain much more. Rows are
    # bucket-major; `grid_perm` maps concatenated grid row -> original doc
    # id (-1 for per-bucket alignment padding) and `grid_doclens` carries
    # the row-aligned lengths the kernels need. When buckets are present,
    # token_grid/token_scales are None and exact search routes through
    # `exact_search_split` (the only consumer of the bucket layout).
    grid_buckets: Tuple[jax.Array, ...] = ()
    scale_buckets: Tuple[jax.Array, ...] = ()
    grid_perm: Optional[jax.Array] = None  # [total_rows] i32
    grid_doclens: Optional[jax.Array] = None  # [total_rows, 1] i32
    # Device-resident refinement lookup table for grid-only serving
    # (`load_grid_only(refine="device")`): the corpus codes+residuals
    # packed 32 tokens per 128-lane-aligned super-row
    # ([rows, 32*(pd+4)] u8, ops/refine_gather.py). Replaces keeping
    # codes/residuals resident: the narrow-row (36 B) corpus gather those
    # feed is pathological on TPU at mega scale (>10 min compiles,
    # >1 s/batch — the round-5 250->47 QPS regression), while super-row
    # windows fetch in 0.09 ms. Same total HBM as codes+residuals.
    refine_tab: Optional[jax.Array] = None  # [rows, 32*(pd+4)] u8

    def __post_init__(self):
        if self.n_docs is None:
            object.__setattr__(self, "n_docs", jnp.zeros((), jnp.int32))
        if self.n_emb is None:
            object.__setattr__(self, "n_emb", jnp.zeros((), jnp.int32))

    @property
    def num_documents(self) -> int:
        """Host-side document count. Inside jit use `.n_docs` (traced)."""
        host = getattr(self, "_counts_host", None)
        if host is not None:
            return host[0]
        n = int(self.n_docs)
        ne = int(self.n_emb)
        object.__setattr__(self, "_counts_host", (n, ne))
        return n

    @property
    def num_embeddings(self) -> int:
        """Host-side embedding count. Inside jit use `.n_emb` (traced)."""
        host = getattr(self, "_counts_host", None)
        if host is not None:
            return host[1]
        n = int(self.n_docs)
        ne = int(self.n_emb)
        object.__setattr__(self, "_counts_host", (n, ne))
        return ne

    def _set_host_counts(self, n_docs: int, n_emb: int) -> "DeviceIndex":
        object.__setattr__(self, "_counts_host", (n_docs, n_emb))
        return self

    @property
    def num_centroids(self) -> int:
        return self.centroids.shape[0]

    def posting_mass_bound(self, ncells: int) -> Optional[int]:
        """Upper bound on the posting mass of any `ncells`-cell probe: the
        sum of the `ncells` longest posting lists (rounded up to the next
        geometric prefix count). None when the stat is absent or `ncells`
        exceeds the recorded counts."""
        if not self.posting_mass_prefix:
            return None
        for c, mass in zip(_MASS_COUNTS, self.posting_mass_prefix):
            if ncells <= c:
                return mass
        return None

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]

    @property
    def num_docs_padded(self) -> int:
        return self.doclens.shape[0]

    # ------------------------------------------------------------------
    # Pinned decompressed corpus
    # ------------------------------------------------------------------
    def grid_td(self, dtype: str = "bf16") -> int:
        # bf16 grid: Td sits on SUBLANES ([ND, Td, d] blocks, d=128 on
        # lanes), so Mosaic only needs a multiple of 8 — max_doclen=300
        # pads to 304, not 384 (21% fewer kernel FLOPs + HBM; verified
        # on-chip, scripts/profile_td_align.py). The TRANSPOSED int8 grid
        # has Td on LANES and keeps the 128 multiple.
        return _grid_td_for(self.max_doclen, dtype)

    def grid_token_axis(self) -> int:
        """Td of the pinned grid, layout-independent (bf16 axis 1; int8 is
        token-interleaved [NB, d, 128*Td], so Td = axis 2 / 128)."""
        assert self.token_grid is not None
        return (
            self.token_grid.shape[2] // 128
            if self.token_scales is not None
            else self.token_grid.shape[1]
        )

    def grid_doc_rows(self) -> int:
        """Doc rows of the pinned grid (int8 groups hold 128 docs each)."""
        assert self.token_grid is not None
        return (
            self.token_grid.shape[0] * 128
            if self.token_scales is not None
            else self.token_grid.shape[0]
        )

    @property
    def has_grid(self) -> bool:
        """True when a pinned token grid (single or bucketed) is present."""
        return self.token_grid is not None or bool(self.grid_buckets)

    @property
    def grid_is_int8(self) -> bool:
        return self.token_scales is not None or bool(self.scale_buckets)

    @property
    def refine_host(self) -> Optional["HostRefineData"]:
        """Host-resident compressed corpus for the grid-only refinement
        rerank (`load_grid_only(refine=True)`), or None. Refinement only
        pays off on int8 grids (a bf16 grid is already oracle-exact)."""
        return getattr(self, "_refine_host", None)

    @property
    def refine_side(self) -> str:
        """Resolved grid-only refinement side: 'device' (codes/residuals
        lookup tables HBM-resident, one extra dispatch per batch), 'host'
        (host-gather fallback), or 'none'. Benchmarks record this so a
        device-refine and a host-refine measurement can never be written
        to the same artifact again (round-4 evidence bug)."""
        if not self.grid_only:
            return "none"
        if self.refine_tab is not None or int(self.codes.shape[0]) > 0:
            return "device"
        if self.refine_host is not None:
            return "host"
        return "none"

    def grid_bytes(self, dtype: str = "bf16") -> int:
        return _grid_bytes_for(
            self.num_docs_padded, self.max_doclen, self.dim, dtype
        )

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
        if self.has_grid or self.num_documents == 0:
            return self
        if budget_mb is None:
            budget_mb = int(
                os.environ.get("NEXT_PLAID_PIN_BUDGET_MB", "4096")
            )
        if dtype is None:
            dtype = os.environ.get("NEXT_PLAID_PIN_DTYPE", "auto")
        if dtype not in ("bf16", "int8", "auto"):
            # A typo must not half-match (bf16 Td sizing + int8 grid build)
            # — treat it as auto and say so.
            logging.getLogger(__name__).warning(
                "NEXT_PLAID_PIN_DTYPE=%r is not one of bf16|int8|auto; "
                "treating as auto",
                dtype,
            )
            dtype = "auto"
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
            grid = _build_token_grid(self, self.grid_td("bf16"))
            return dataclasses.replace(self, token_grid=grid)
        grid, scales = _build_token_grid_int8(self, self.grid_td("int8"))
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
        doc_capacity: int = 0,
        token_capacity: int = 0,
        ivf_capacity: int = 0,
    ) -> "DeviceIndex":
        ndocs = int(doclens.shape[0])
        nvec = int(codes.shape[0])
        k, d = centroids.shape
        packed_dim = d * nbits // 8
        assert residuals.shape == (nvec, packed_dim), (
            residuals.shape,
            (nvec, packed_dim),
        )

        # +1 so the sentinel slot (doclen 0, used for padded candidate
        # buffers) is always in bounds. doc_capacity/token_capacity reserve
        # EXTRA padded rows so serving appends (append_batch) can grow the
        # corpus in place without changing array shapes — shapes are jit
        # keys, and a shape change recompiles every search program.
        ndocs_pad = _padded_doc_rows(ndocs, doc_capacity, pad_docs)
        nvec_pad = max(_round_up(max(nvec, token_capacity), pad_tokens),
                       pad_tokens)
        nnz = int(ivf_doc_ids.shape[0])
        # ivf_capacity reserves padded IVF slots so a later in-place IVF
        # refresh (sharded staged append) can hold the grown posting set
        # without a shape change.
        nnz_pad = max(
            _round_up(max(nnz, ivf_capacity), pad_tokens), pad_tokens
        )

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
        # Sentinel = last padded slot: doclen 0 there by construction, and
        # (unlike the former `ndocs` sentinel) it stays invalid after
        # device appends advance the live count.
        ivf_p = np.full(nnz_pad, ndocs_pad - 1, np.int32)
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
            n_docs=jnp.asarray(ndocs, jnp.int32),
            n_emb=jnp.asarray(nvec, jnp.int32),
            nbits=nbits,
            max_doclen=max_doclen,
            max_posting_len=max_posting,
            posting_mass_prefix=_posting_mass_prefix(ivf_lengths),
        )._set_host_counts(ndocs, nvec)

    # ------------------------------------------------------------------
    # Incremental device append (serving ingest)
    # ------------------------------------------------------------------
    def append_batch(
        self,
        codes: np.ndarray,
        residuals: np.ndarray,
        doclens: np.ndarray,
    ) -> Optional["DeviceIndex"]:
        """Append encoded documents IN PLACE on device: O(batch) host->device
        traffic instead of the O(corpus) full reload the ingest path paid
        before (reference reloads are cheap because mmap + merge manifests
        make them O(changed), mmap.rs:1081-1300; HBM-resident tensors need
        this device-side equivalent).

        `codes`/`residuals`/`doclens` are the batch encoded against the
        CURRENT centroids (index.update's encode output). Counts advance via
        the traced n_docs/n_emb scalars and batch shapes are bucketed, so
        append does not re-key jitted search programs; capacity growth
        (geometric) is the only shape-changing event.

        The device IVF is NOT updated here — the caller must mark it stale
        (`mark_ivf_stale`) and refresh before staged search. The pinned-grid
        exact path (the serving operating point) never reads the IVF.

        Returns the updated index, or None when the append cannot be done
        in place (a new document exceeds the grid's token axis) — caller
        falls back to a full reload.
        """
        if self.grid_only:
            from nextplaid_tpu.utils.errors import UpdateError

            raise UpdateError(
                "grid-only index is immutable; reload with DeviceIndex.load "
                "to append"
            )
        nd, ne = self.num_documents, self.num_embeddings
        doclens = np.asarray(doclens, np.int64)
        bdocs = int(doclens.shape[0])
        btok = int(doclens.sum())
        if bdocs == 0:
            return self
        if codes.shape[0] != btok or residuals.shape[0] != btok:
            raise ValueError(
                f"batch shapes disagree: {codes.shape[0]} codes / "
                f"{residuals.shape[0]} residuals vs doclens sum {btok}"
            )
        if (
            self.token_grid is not None
            and int(doclens.max()) > self.grid_token_axis()
        ):
            return None  # longer than the grid's token axis: rebuild
        new_max_doclen = max(self.max_doclen, int(doclens.max()))

        index = self
        # Bucket the batch shapes so repeat appends hit the jit cache;
        # geometric capacity growth keeps shape changes amortized O(1).
        bdocs_pad = _round_up(bdocs, 256)
        btok_pad = _round_up(btok, 2048)
        if (
            nd + bdocs_pad + 1 > index.num_docs_padded
            or ne + btok_pad > index.codes.shape[0]
        ):
            index = index._grow(
                doc_capacity=max(2 * index.num_docs_padded,
                                 nd + bdocs_pad + 2),
                token_capacity=max(2 * index.codes.shape[0], ne + btok_pad),
            )
        codes_p = np.zeros(btok_pad, np.int32)
        codes_p[:btok] = codes
        res_p = np.zeros((btok_pad, residuals.shape[1]), np.uint8)
        res_p[:btok] = residuals
        lens_p = np.zeros(bdocs_pad, np.int32)
        lens_p[:bdocs] = doclens

        grid_kind = (
            "int8" if index.token_scales is not None
            else ("bf16" if index.token_grid is not None else "none")
        )
        new_codes, new_res, new_doclens, new_offs, new_grid, new_scales = (
            _append_jit(
                index.codes,
                index.residuals,
                index.doclens,
                index.doc_offsets,
                index.token_grid,
                index.token_scales,
                index.centroids,
                index.bucket_weights,
                jnp.asarray(codes_p),
                jnp.asarray(res_p),
                jnp.asarray(lens_p),
                index.n_docs,
                index.n_emb,
                nbits=index.nbits,
                grid_kind=grid_kind,
                td=index.grid_token_axis()
                if index.token_grid is not None
                else 0,
            )
        )
        out = dataclasses.replace(
            index,
            codes=new_codes,
            residuals=new_res,
            doclens=new_doclens,
            doc_offsets=new_offs,
            token_grid=new_grid,
            token_scales=new_scales,
            n_docs=index.n_docs + bdocs,
            n_emb=index.n_emb + btok,
            max_doclen=new_max_doclen,
        )._set_host_counts(nd + bdocs, ne + btok)
        object.__setattr__(
            out, "_ivf_stale", True
        )
        return out

    def _grow(self, doc_capacity: int, token_capacity: int) -> "DeviceIndex":
        """Re-pad all capacity arrays (rare; shapes change -> jit re-keys)."""
        nd_pad_new = max(_round_up(doc_capacity, 8), self.num_docs_padded)
        nvec_new = max(_round_up(token_capacity, 128), self.codes.shape[0])
        grown = dataclasses.replace(
            self,
            codes=_pad_to(self.codes, nvec_new),
            residuals=_pad_to(self.residuals, nvec_new),
            doclens=_pad_to(self.doclens, nd_pad_new),
            doc_offsets=_pad_to(
                self.doc_offsets, nd_pad_new + 1, edge=True
            ),
            token_grid=None,
            token_scales=None,
        )._set_host_counts(self.num_documents, self.num_embeddings)
        if self.token_grid is not None:
            dtype = "int8" if self.token_scales is not None else "bf16"
            grown_pinned = grown.with_token_grid(dtype=dtype)
            if grown_pinned.token_grid is None and dtype == "bf16":
                # The doubled-capacity bf16 grid no longer fits the pin
                # budget: reuse the auto-path downgrade (bf16 -> int8 with
                # its loud precision warning -> unpinned) rather than
                # duplicating that policy here.
                grown_pinned = grown.with_token_grid(dtype="auto")
            grown = grown_pinned
            if grown.token_grid is None:
                budget_mb = int(
                    os.environ.get("NEXT_PLAID_PIN_BUDGET_MB", "4096")
                )
                logging.getLogger(__name__).warning(
                    "capacity growth dropped the pinned token grid: %s "
                    "grid needs %d MB > NEXT_PLAID_PIN_BUDGET_MB=%d; "
                    "serving falls back to the unpinned scan (large "
                    "latency regression). Raise the budget or shard "
                    "across chips.",
                    dtype,
                    grown.grid_bytes(dtype) >> 20,
                    budget_mb,
                )
            grown._set_host_counts(
                self.num_documents, self.num_embeddings
            )
        if getattr(self, "_ivf_stale", False):
            object.__setattr__(grown, "_ivf_stale", True)
        return grown

    def mark_ivf_stale(self) -> None:
        object.__setattr__(self, "_ivf_stale", True)

    @property
    def ivf_stale(self) -> bool:
        return bool(getattr(self, "_ivf_stale", False))

    def refresh_ivf(self, index_path: str) -> "DeviceIndex":
        """Re-stage the IVF (and posting-length static) from disk — the
        staged pipeline's lazy catch-up after device appends."""
        from nextplaid_tpu.storage.npy import IndexLayout, load_npy

        if self.grid_only:
            from nextplaid_tpu.utils.errors import UpdateError

            raise UpdateError(
                "grid-only index has no IVF; reload with DeviceIndex.load"
            )

        layout = IndexLayout(index_path)
        ivf = np.asarray(load_npy(layout.ivf), np.int32)
        ivf_lengths = np.asarray(load_npy(layout.ivf_lengths), np.int64)
        k = self.num_centroids
        ivf_offsets = np.zeros(k + 1, np.int32)
        np.cumsum(ivf_lengths[:k], out=ivf_offsets[1:])
        nnz = int(ivf.shape[0])
        nnz_pad = max(_round_up(nnz, 128), 128)
        ivf_p = np.full(nnz_pad, self.num_docs_padded - 1, np.int32)
        ivf_p[:nnz] = ivf
        out = dataclasses.replace(
            self,
            ivf_offsets=jnp.asarray(ivf_offsets),
            ivf_doc_ids=jnp.asarray(ivf_p),
            max_posting_len=int(ivf_lengths.max()) if nnz else 0,
            posting_mass_prefix=_posting_mass_prefix(ivf_lengths[:k]),
        )._set_host_counts(self.num_documents, self.num_embeddings)
        return out

    # ------------------------------------------------------------------
    # Load from the reference-compatible on-disk format
    # ------------------------------------------------------------------
    @staticmethod
    def plan_capacity_factor(
        n_docs: int,
        max_doclen: int,
        dim: int,
        requested: float,
        budget_mb: Optional[int] = None,
        dtype: Optional[str] = None,
    ) -> float:
        """Shrink append headroom when it would degrade the pinning outcome.

        The pinned token grid is CAPACITY-sized (appends write into the
        reserved rows in place), so headroom rows inflate grid_bytes and
        can flip with_token_grid's budget decision from bf16 to int8 (a
        measured recall@10 drop of ~0.015) or to unpinned — purely because
        of rows that hold no documents. Precision beats headroom: return
        `requested` only when the dtype outcome matches a headroom-free
        load; otherwise warn and return 1.0 (the first append then pays a
        one-time capacity growth instead of every query paying degraded
        scoring)."""
        if requested <= 1.0 or n_docs == 0:
            return max(requested, 1.0)
        if budget_mb is None:
            budget_mb = int(
                os.environ.get("NEXT_PLAID_PIN_BUDGET_MB", "4096")
            )
        if dtype is None:
            dtype = os.environ.get("NEXT_PLAID_PIN_DTYPE", "auto")
        if dtype not in ("bf16", "int8"):
            dtype = "auto"
        budget = budget_mb << 20

        def outcome(rows: int) -> str:
            def fits(dt: str) -> bool:
                return _grid_bytes_for(rows, max_doclen, dim, dt) <= budget
            if dtype == "auto":
                if fits("bf16"):
                    return "bf16"
                return "int8" if fits("int8") else "none"
            return dtype if fits(dtype) else "none"

        def rows(factor: float) -> int:
            cap = int(n_docs * factor) + 2 if factor > 1.0 else 0
            return _padded_doc_rows(n_docs, cap)

        plain, with_headroom = outcome(rows(1.0)), outcome(rows(requested))
        if with_headroom == plain:
            return requested
        logging.getLogger(__name__).warning(
            "append headroom (capacity_factor=%.2f) would change the "
            "token-grid pinning outcome from %s to %s; loading without "
            "headroom to preserve scoring precision (the first append "
            "will pay a one-time capacity growth instead)",
            requested,
            plain,
            with_headroom,
        )
        return 1.0

    @classmethod
    def load(
        cls,
        index_path: str,
        capacity_factor: float = 1.0,
        grid_aware_capacity: bool = False,
    ) -> "DeviceIndex":
        """Load an index directory (reference `MmapIndex::load`, index.rs:1026).

        Reads chunked codes/residuals/doclens, concatenates, and stages into
        device arrays. Also accepts fast-plaid-written f16 centroids.

        capacity_factor > 1 reserves append headroom (append_batch): a
        serving process that expects ingest should load with e.g. 1.5 so
        the first batches don't immediately trigger a capacity growth
        (growth = full re-pad + grid rebuild + search recompile).
        """
        h = load_host_arrays(index_path)
        meta = h["meta"]
        centroids = h["centroids"]
        cutoffs = h["bucket_cutoffs"]
        weights = h["bucket_weights"]
        avg_residual = h["avg_residual"]
        codes = h["codes"]
        residuals = h["residuals"]
        doclens = h["doclens"]
        ivf = h["ivf"]
        ivf_lengths = h["ivf_lengths"]
        rq_coarse = h["rq_coarse"]
        rq_fine = h["rq_fine"]

        f = max(capacity_factor, 1.0)
        if f > 1.0 and grid_aware_capacity:
            f = cls.plan_capacity_factor(
                n_docs=int(doclens.shape[0]),
                max_doclen=int(doclens.max()) if doclens.size else 0,
                dim=int(centroids.shape[1]),
                requested=f,
            )
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
            doc_capacity=int(len(doclens) * f) + 2 if f > 1.0 else 0,
            token_capacity=int(len(codes) * f) if f > 1.0 else 0,
        )


def load_host_arrays(index_path: str) -> dict:
    """Host-side portion of an index load: metadata + merged chunk arrays,
    NO device staging. Shared by `DeviceIndex.load` and the sharded
    serving path (`HostIndexData.load`), so multi-chip sharding never
    round-trips the whole corpus through a single device's HBM — the
    corpus a sharded deployment serves is exactly the one that does NOT
    fit one chip. Reference counterpart: `MmapIndex::load`
    (index.rs:1026) with the manifest fast path (mmap.rs:1081-1300)."""
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
    # Merged-chunk cache first (reference manifest fast path,
    # mmap.rs:1081-1300): when no chunk changed since the last merge,
    # load is an mmap of the merged payloads — O(changed) host work.
    from nextplaid_tpu.storage import merge_cache, native

    codes = None
    residuals = None
    chunk_bytes = sum(
        os.path.getsize(p)
        for p in code_paths + res_paths
        if os.path.exists(p)
    )
    cache_on = merge_cache.enabled(chunk_bytes, meta.num_chunks)
    cache_hit = False
    if cache_on:
        hit = merge_cache.load_merged(layout.root, code_paths, res_paths)
        if hit is not None:
            codes, residuals = hit
            cache_hit = True
    if codes is None and meta.num_chunks and native.available():
        first_codes = np.asarray(load_npy(code_paths[0], mmap=True))
        codes = native.merge_chunk_payloads(code_paths, first_codes.dtype)
        residuals = native.merge_chunk_payloads(
            res_paths, np.uint8, (packed_dim,)
        )
    if codes is None:
        codes_list = [np.asarray(load_npy(p)) for p in code_paths]
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
    if cache_on and not cache_hit:
        # Freshly merged (native or numpy): persist for the next start.
        merge_cache.store_merged(
            layout.root, codes, residuals, code_paths, res_paths
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

    return {
        "meta": meta,
        "centroids": centroids,
        "bucket_cutoffs": cutoffs,
        "bucket_weights": weights,
        "avg_residual": avg_residual,
        "codes": codes,
        "residuals": residuals,
        "doclens": doclens,
        "ivf": ivf,
        "ivf_lengths": ivf_lengths,
        "rq_coarse": rq_coarse,
        "rq_fine": rq_fine,
    }


def _pad_to(arr: jax.Array, n: int, edge: bool = False) -> jax.Array:
    """Zero- (or edge-) pad the leading axis of `arr` to length n."""
    if arr.shape[0] >= n:
        return arr
    widths = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, widths, mode="edge" if edge else "constant")


@functools.partial(
    jax.jit, static_argnames=("nbits", "grid_kind", "td")
)
def _append_jit(
    codes,
    residuals,
    doclens,
    doc_offsets,
    grid,
    scales,
    centroids,
    bucket_weights,
    new_codes,  # [btok_pad] i32, zero-padded
    new_res,  # [btok_pad, pd] u8
    new_lens,  # [bdocs_pad] i32, zero-padded
    n_docs,  # traced i32 scalar: docs used BEFORE the append
    n_emb,  # traced i32 scalar: tokens used BEFORE the append
    nbits: int,
    grid_kind: str,
    td: int,
):
    """Write one encoded batch into the capacity arrays (dynamic_update_slice
    at the traced counts) and decompress its token-grid rows in place.

    Offsets beyond the written window keep earlier totals — they are only
    ever read behind doclens masks (doclen 0 ⇒ contribution masked), and
    the next append's base offset read lands inside this append's window.
    """
    from nextplaid_tpu.ops import codec as codec_ops

    btok_pad = new_codes.shape[0]
    codes = jax.lax.dynamic_update_slice(codes, new_codes, (n_emb,))
    residuals = jax.lax.dynamic_update_slice(residuals, new_res, (n_emb, 0))
    doclens = jax.lax.dynamic_update_slice(doclens, new_lens, (n_docs,))
    base = jax.lax.dynamic_slice(doc_offsets, (n_docs,), (1,))[0]
    new_off = (base + jnp.cumsum(new_lens)).astype(doc_offsets.dtype)
    doc_offsets = jax.lax.dynamic_update_slice(
        doc_offsets, new_off, (n_docs + 1,)
    )

    if grid_kind != "none":
        offs_local = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(new_lens[:-1])]
        )
        t_ar = jnp.arange(td, dtype=jnp.int32)
        tok_pos = jnp.clip(
            offs_local[:, None] + t_ar[None, :], 0, btok_pad - 1
        )
        tok_valid = t_ar[None, :] < new_lens[:, None]
        emb = codec_ops.decompress_residuals(
            new_res[tok_pos],
            new_codes[tok_pos],
            centroids,
            bucket_weights,
            nbits,
            normalize=True,
        )
        emb = jnp.where(tok_valid[:, :, None], emb, 0.0)
        if grid_kind == "bf16":
            grid = jax.lax.dynamic_update_slice(
                grid, emb.astype(jnp.bfloat16), (n_docs, 0, 0)
            )
        else:  # int8 interleaved groups + per-token scales
            maxabs = jnp.max(jnp.abs(emb), axis=-1)
            scale = jnp.where(maxabs > 0, maxabs / 127.0, 1.0)
            q = jnp.clip(jnp.round(emb / scale[:, :, None]), -127, 127)
            grid, scales = _write_int8_groups(
                grid,
                scales,
                q.astype(jnp.int8),
                jnp.where(tok_valid, scale, 0.0).astype(jnp.bfloat16),
                n_docs,
                td,
            )
    return codes, residuals, doclens, doc_offsets, grid, scales


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
        # Token-INTERLEAVED 128-doc group: [128, td, d] -> [d, 128*td] with
        # lane l = t*128 + j (ops/maxsim_kernel.py _kernel_int8i — the
        # interleave turns the kernel's per-doc max into a strided lane
        # tree-reduce). tile == 128 by contract here.
        return None, (
            q.astype(jnp.int8).transpose(2, 1, 0).reshape(emb.shape[-1], -1),
            jnp.where(tok_valid, scale, 0.0)
            .astype(jnp.bfloat16)
            .transpose(1, 0)
            .reshape(-1),
        )

    starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    _, (tiles, scales) = jax.lax.scan(build_tile, None, starts)
    return tiles, scales  # [NB, d, 128*td], [NB, 128*td]


def _build_token_grid_int8(index: "DeviceIndex", td: int):
    """Token-interleaved int8 grid [NB, d, 128*Td] + per-token bf16 scales
    [NB, 128*Td] (see with_token_grid and _kernel_int8i)."""
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


# ----------------------------------------------------------------------
# Grid-only loading: serve huge corpora exactly from the pinned grid with
# codes/residuals never resident in HBM.
# ----------------------------------------------------------------------
@functools.partial(
    jax.jit,
    static_argnames=("nbits", "td", "tile", "kind"),
    donate_argnames=("grid", "scales"),
)
def _grid_only_chunk_jit(
    grid, scales, codes_c, res_c, doclens_c, tok_offs_c, centroids,
    bucket_weights, row_offset, nbits, td, tile, kind,
):
    """Decompress chunk docs into grid rows [row_offset, ...).

    grid (and scales for int8) are DONATED: at mega-scale the grid is most
    of HBM, and a functional update would need 2x. doclens_c/tok_offs_c are
    padded to a fixed per-chunk doc count and res/codes to a fixed token
    count so every chunk dispatch hits the same compiled program; padding
    docs have len 0 and land as zero rows past the live range (the grid is
    preallocated zeroed, and row_offset advances by the REAL doc count).
    tok_offs_c gives each doc's first-token position in the chunk token
    arrays explicitly, so callers can select a SUBSET of a chunk's docs
    (bucketed grids) — the gather handles non-contiguity for free.

    The int8 grid is token-INTERLEAVED 128-doc groups [NB, d, 128*Td]
    (ops/maxsim_kernel.py _kernel_int8i). row_offset is NOT group-aligned
    in general, so the int8 branch is SELF-CARRYING: it reads the partial
    group at row_offset//128 back out of the grid (un-interleave), packs
    the chunk's quantized rows behind the carried rows, and rewrites whole
    interleaved groups — bit-exact, since carried rows are the already-
    quantized int8 values. Callers therefore need (cdoc_pad + 128) rows of
    tail slack so the group writes never clamp.
    """
    from nextplaid_tpu.ops import codec as codec_ops

    cdoc = doclens_c.shape[0]
    ctok = codes_c.shape[0]
    t_arange = jnp.arange(td, dtype=jnp.int32)
    n_tiles = -(-cdoc // tile)

    def build_tile(_, start):
        ids = start + jnp.arange(tile, dtype=jnp.int32)
        safe = jnp.minimum(ids, cdoc - 1)
        offs = tok_offs_c[safe]
        lens = jnp.where(ids < cdoc, doclens_c[safe], 0)
        tok_pos = jnp.clip(offs[:, None] + t_arange[None, :], 0, ctok - 1)
        tok_valid = t_arange[None, :] < lens[:, None]
        emb = codec_ops.decompress_residuals(
            res_c[tok_pos], codes_c[tok_pos], centroids, bucket_weights,
            nbits, normalize=True,
        )
        emb = jnp.where(tok_valid[:, :, None], emb, 0.0)
        if kind == "bf16":
            return None, (emb.astype(jnp.bfloat16), emb[..., :0])
        maxabs = jnp.max(jnp.abs(emb), axis=-1)
        scale = jnp.where(maxabs > 0, maxabs / 127.0, 1.0)
        q = jnp.clip(jnp.round(emb / scale[:, :, None]), -127, 127)
        return None, (
            q.astype(jnp.int8),
            jnp.where(tok_valid, scale, 0.0).astype(jnp.bfloat16),
        )

    starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    _, (tiles, sc) = jax.lax.scan(build_tile, None, starts)
    if kind == "bf16":
        rows = tiles.reshape(n_tiles * tile, td, -1)
        grid = jax.lax.dynamic_update_slice(grid, rows, (row_offset, 0, 0))
        return grid, scales

    dim = grid.shape[1]
    q_all = tiles.reshape(n_tiles * tile, td, dim)  # [cdoc_pad, td, d] int8
    sc_all = sc.reshape(n_tiles * tile, td)
    return _write_int8_groups(grid, scales, q_all, sc_all, row_offset, td)


def _write_int8_groups(grid, scales, q_all, sc_all, row_offset, td: int):
    """Write quantized doc rows into the token-interleaved int8 grid.

    grid [NB, d, 128*Td] / scales [NB, 128*Td]; q_all [n, Td, d] int8 /
    sc_all [n, Td] bf16 are standard per-doc rows destined for doc rows
    [row_offset, row_offset + n). row_offset is arbitrary (traced): the
    partial group at row_offset//128 is read back from the grid
    (un-interleaved — bit-exact, the carried values are already int8),
    the new rows are packed behind the carried ones, and whole interleaved
    groups are rewritten. Writes n//128 + 1 groups from row_offset//128;
    callers must leave that much group slack so the update never clamps.
    """
    dim = grid.shape[1]
    n = q_all.shape[0]
    g0 = row_offset // 128
    c = row_offset % 128
    prev_q = (
        jax.lax.dynamic_slice(grid, (g0, 0, 0), (1, dim, 128 * td))[0]
        .reshape(dim, td, 128)
        .transpose(2, 1, 0)
    )  # [128, td, d]
    prev_sc = (
        jax.lax.dynamic_slice(scales, (g0, 0), (1, 128 * td))[0]
        .reshape(td, 128)
        .transpose(1, 0)
    )  # [128, td]
    n_full = _round_up(n, 128) + 128
    full_q = jnp.zeros((n_full, td, dim), jnp.int8)
    full_q = jax.lax.dynamic_update_slice(full_q, prev_q, (0, 0, 0))
    full_q = jax.lax.dynamic_update_slice(full_q, q_all, (c, 0, 0))
    full_sc = jnp.zeros((n_full, td), jnp.bfloat16)
    full_sc = jax.lax.dynamic_update_slice(full_sc, prev_sc, (0, 0))
    full_sc = jax.lax.dynamic_update_slice(full_sc, sc_all, (c, 0))
    ng = n_full // 128
    blocks = (
        full_q.reshape(ng, 128, td, dim)
        .transpose(0, 3, 2, 1)
        .reshape(ng, dim, td * 128)
    )
    sc_blocks = (
        full_sc.reshape(ng, 128, td).transpose(0, 2, 1).reshape(ng, td * 128)
    )
    grid = jax.lax.dynamic_update_slice(grid, blocks, (g0, 0, 0))
    scales = jax.lax.dynamic_update_slice(scales, sc_blocks, (g0, 0))
    return grid, scales


def choose_bucket_tds(
    doclens: np.ndarray,
    mult: int,
    max_buckets: int = 4,
    min_gain: float = 0.08,
    row_pad: int = 128,
) -> List[int]:
    """Pick ascending Td boundaries minimizing total grid token slots.

    Candidates are the distinct per-doc round_up(len, mult) values
    (subsampled to <=24 plus the max). Exact DP over (candidate, bucket
    count); each bucket charges `row_pad` extra rows of its Td for the
    per-bucket row alignment, which prices tiny buckets out. Falls back to
    a single global Td when the best bucketing saves < min_gain of slots.
    """
    nd = int(doclens.shape[0])
    if nd == 0:
        return [mult]
    per_doc = np.maximum(
        ((np.maximum(doclens.astype(np.int64), 1) + mult - 1) // mult)
        * mult,
        mult,
    )
    cands, counts = np.unique(per_doc, return_counts=True)
    if len(cands) > 24:
        keep = np.unique(
            np.concatenate(
                [
                    cands[
                        np.searchsorted(
                            np.cumsum(counts),
                            np.linspace(0, nd - 1, 23).astype(np.int64),
                            side="right",
                        ).clip(0, len(cands) - 1)
                    ],
                    cands[-1:],
                ]
            )
        )
        # Re-bin counts onto the kept boundaries (docs go to the first
        # boundary >= their Td).
        idx = np.searchsorted(keep, cands, side="left")
        counts = np.bincount(idx, weights=counts, minlength=len(keep))
        cands = keep
    single_cost = nd * int(cands[-1])
    n_c = len(cands)
    max_b = min(max_buckets, n_c)
    # f[b][j] = min slots covering candidate prefix 0..j with b buckets,
    # the last bucket's Td = cands[j].
    csum = np.concatenate([[0], np.cumsum(counts)])
    INF = float("inf")
    f = [[INF] * n_c for _ in range(max_b + 1)]
    parent = [[-1] * n_c for _ in range(max_b + 1)]
    for j in range(n_c):
        f[1][j] = csum[j + 1] * int(cands[j]) + row_pad * int(cands[j])
    for b in range(2, max_b + 1):
        for j in range(b - 1, n_c):
            for i in range(b - 2, j):
                c = (
                    f[b - 1][i]
                    + (csum[j + 1] - csum[i + 1]) * int(cands[j])
                    + row_pad * int(cands[j])
                )
                if c < f[b][j]:
                    f[b][j] = c
                    parent[b][j] = i
    best_b = min(
        range(1, max_b + 1), key=lambda b: f[b][n_c - 1]
    )
    if f[best_b][n_c - 1] >= single_cost * (1.0 - min_gain):
        return [int(cands[-1])]
    tds = []
    b, j = best_b, n_c - 1
    while j >= 0 and b >= 1:
        tds.append(int(cands[j]))
        j = parent[b][j]
        b -= 1
    return sorted(tds)


def _device_hbm_bytes() -> Optional[int]:
    """Best-effort HBM capacity of the default device.

    Returns None when the backend doesn't report one (CPU test meshes) —
    the pre-flight fit check is then skipped and allocation failures
    surface from the allocator as usual."""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return None


def _require_grid_fits(grid_bytes: int, staging_bytes: int) -> None:
    """Raise StorageError before allocating a grid that cannot fit HBM.

    Without this, an over-budget load_grid_only dies minutes into the
    chunk-streamed build with a raw XLA RESOURCE_EXHAUSTED dump (observed:
    the 72M-embedding single-Td int8 grid at 15.7 GB + chunk staging vs a
    16 GB v5e). The projected footprint is grid(s) + the peak transient
    staging of one padded chunk; anything else the build holds is small."""
    limit = _device_hbm_bytes()
    if limit is None:
        return
    need = grid_bytes + staging_bytes
    if need > limit:
        from nextplaid_tpu.utils.errors import StorageError

        raise StorageError(
            f"grid-only load needs ~{need >> 20} MB "
            f"(grid {grid_bytes >> 20} MB + chunk staging "
            f"{staging_bytes >> 20} MB) but the device reports "
            f"{limit >> 20} MB HBM. Options: dtype='int8' (half the bf16 "
            "grid), buckets>1 (cuts Td padding), shard across chips "
            "(parallel.ShardedGridIndex / shard_grid_only), or serve "
            "unpinned via DeviceIndex.load (staged/exhaustive modes)."
        )


class HostRefineData:
    """Host-resident compressed corpus for the grid-only refinement rerank.

    At grid-only scale the codes/residuals cannot share HBM with the grid,
    but they fit host RAM trivially (and are kept as np mmaps of the chunk
    files, so untouched pages never materialize). `gather` pulls the token
    rows of a candidate set so the refine jit can decompress and re-score
    them EXACTLY — lifting int8-grid recall back to the bf16-oracle level
    (reference exact-rerank semantics: search.rs:460-493).
    """

    def __init__(self, chunk_codes, chunk_residuals, chunk_doc_starts,
                 chunk_tok_starts, doc_offsets, doclens):
        self.chunk_codes = chunk_codes  # list of [ctok_i] mmaps
        self.chunk_residuals = chunk_residuals  # list of [ctok_i, pd] mmaps
        self.chunk_doc_starts = chunk_doc_starts  # [nchunks+1] i64
        self.chunk_tok_starts = chunk_tok_starts  # [nchunks+1] i64
        self.doc_offsets = doc_offsets  # [nd(+pad)] i64, global token offs
        self.doclens = doclens  # [nd] i32

    def gather(self, doc_ids: np.ndarray):
        """Token rows for `doc_ids` (valid, any order) concatenated in the
        given doc order. Returns (codes [T] i32, residuals [T, pd] u8,
        lens [n] i32)."""
        ids = np.asarray(doc_ids, np.int64)
        lens = self.doclens[ids].astype(np.int64)
        total = int(lens.sum())
        pd = self.chunk_residuals[0].shape[1] if self.chunk_residuals else 0
        codes = np.empty(total, np.int32)
        res = np.empty((total, pd), np.uint8)
        chunk_of = (
            np.searchsorted(self.chunk_doc_starts, ids, side="right") - 1
        )
        out_offs = np.zeros(len(ids) + 1, np.int64)
        np.cumsum(lens, out=out_offs[1:])
        for c in np.unique(chunk_of):
            sel = np.nonzero(chunk_of == c)[0]
            local_start = (
                self.doc_offsets[ids[sel]] - self.chunk_tok_starts[c]
            )
            lsel = lens[sel]
            # Flat token index into chunk c for every selected doc's tokens.
            n_tok = int(lsel.sum())
            base = np.repeat(local_start, lsel)
            within = np.arange(n_tok, dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(lsel[:-1])]), lsel
            )
            tok_idx = base + within
            dst = np.repeat(out_offs[sel], lsel) + within
            codes[dst] = np.asarray(self.chunk_codes[c])[tok_idx]
            res[dst] = np.asarray(self.chunk_residuals[c])[tok_idx]
        return codes, res, lens.astype(np.int32)


def load_grid_only(
    index_path: str,
    dtype: str = "int8",
    chunk_token_bucket: int = 1 << 18,
    buckets: int = 4,
    bucket_min_gain: float = 0.08,
    bucket_row_pad: int = 128,
    refine=True,
) -> "DeviceIndex":
    """Load an index for EXACT-ONLY serving: stream the on-disk chunks
    through the decompress+quantize pipeline into a pinned token grid, with
    codes/residuals/IVF never resident in HBM.

    Rationale: the pinned grid is all the exact kernel path needs, and at
    mega scale the compressed arrays are GBs of dead weight next to it —
    dropping them raises the one-chip exact-serving ceiling to wherever the
    grid alone fits (72M embeddings: 13 GB int8 grid vs 16 GB HBM, where
    the full DeviceIndex + grid could never coexist). The reference has no
    analogue (its corpus lives in host mmaps; HBM residency is the
    TPU-design constraint being optimized here).

    `buckets` > 1 additionally partitions docs into up to that many doclen
    buckets, each with its own Td (`choose_bucket_tds`), cutting the
    padding FLOPs/HBM a single global Td pays on skewed doclen
    distributions (72M corpus, uniform 100-220 tokens: 1.14x fewer slots;
    long-tailed corpora gain more). Bucketing is applied only when it
    saves >=8% of token slots; `buckets=1` forces the single-grid layout.

    `refine` configures the int8 grid's exact-rerank stage (reference
    rerank semantics: search.rs:460-493). True = auto: DEVICE-resident
    codes/residuals lookup tables when they fit HBM next to the grid
    (refine then costs one extra device dispatch per batch — no host
    round-trip), else the host-gather fallback. "device"/"host" force a
    side; False disables refinement.

    The returned index serves `search_batch`/`search_batch_async` in exact
    mode only; staged search, appends, and IVF refresh raise UpdateError /
    SearchError (reload with `DeviceIndex.load` for mutation). Peak HBM
    during the build is grid(s) + one padded chunk + one decompress tile
    (+ the refine tables when device-resident).
    """
    from nextplaid_tpu.utils.errors import StorageError

    layout = IndexLayout(index_path)
    meta = Metadata.from_dict(load_json(layout.metadata))
    if dtype not in ("bf16", "int8"):
        raise StorageError(f"grid-only dtype must be bf16|int8: {dtype}")

    centroids = jnp.asarray(
        np.asarray(load_npy(layout.centroids), np.float32)
    )
    cutoffs = jnp.asarray(
        np.asarray(load_npy(layout.bucket_cutoffs), np.float32)
    )
    weights = jnp.asarray(
        np.asarray(load_npy(layout.bucket_weights), np.float32)
    )
    avg_residual = jnp.asarray(
        np.asarray(load_npy(layout.avg_residual), np.float32)
    )
    dim = centroids.shape[1]
    packed_dim = dim * meta.nbits // 8

    doclens_list = [
        np.asarray(load_json(layout.chunk_doclens(i)), np.int64)
        for i in range(meta.num_chunks)
    ]
    doclens_all = (
        np.concatenate(doclens_list)
        if doclens_list
        else np.zeros(0, np.int64)
    ).astype(np.int32)
    nd = int(doclens_all.shape[0])
    n_emb = int(doclens_all.sum())
    max_doclen = int(doclens_all.max()) if nd else 0
    mult = 32 if dtype == "int8" else 8  # see _grid_td_for
    tile = 128

    tds = (
        choose_bucket_tds(
            doclens_all,
            mult,
            max_buckets=buckets,
            min_gain=bucket_min_gain,
            row_pad=bucket_row_pad,
        )
        if buckets > 1 and nd > 0
        else [max(_round_up(max(max_doclen, 1), mult), mult)]
    )

    nd_pad = max(_round_up(nd + 1, 8), 8)
    doclens_p = np.zeros(nd_pad, np.int32)
    doclens_p[:nd] = doclens_all
    doc_offsets = np.zeros(nd_pad + 1, np.int64)
    np.cumsum(doclens_p, out=doc_offsets[1:])

    # Refine-mode resolution. True = auto: DEVICE-resident refine tables
    # when they fit HBM next to the grid (refine then costs one extra
    # device dispatch — no per-batch host gather / candidate h2d, which
    # measured ~0.5 s/batch through this environment's tunnel, 93% of the
    # host path's refine cost at 72M), else the host-gather fallback.
    if refine is True:
        refine_mode = "auto"
    elif refine in (False, None):
        refine_mode = "none"
    elif refine in ("auto", "host", "device"):
        refine_mode = refine
    else:
        raise StorageError(
            f"refine must be True/False/'auto'/'host'/'device': {refine!r}"
        )
    if nd == 0:
        refine_mode = "none"
    # bf16 grids are already oracle-exact (refine_host docstring /
    # search.py's grid_is_int8 gate): refinement only ever runs for int8
    # grids, so shipping n_emb*(4+packed_dim) bytes of lookup tables
    # (~2.6 GB at 72M, nbits=2) next to a bf16 grid would be dead HBM.
    if dtype != "int8":
        refine_mode = "none"
    refine_dev_bytes = (
        n_emb * (4 + packed_dim) if refine_mode in ("auto", "device") else 0
    )

    def make_host_refine() -> HostRefineData:
        cds = np.zeros(meta.num_chunks + 1, np.int64)
        cts = np.zeros(meta.num_chunks + 1, np.int64)
        np.cumsum([len(d) for d in doclens_list], out=cds[1:])
        np.cumsum([int(d.sum()) for d in doclens_list], out=cts[1:])
        return HostRefineData(
            chunk_codes=[
                load_npy(layout.chunk_codes(i))
                for i in range(meta.num_chunks)
            ],
            chunk_residuals=[
                load_npy(layout.chunk_residuals(i))
                for i in range(meta.num_chunks)
            ],
            chunk_doc_starts=cds,
            chunk_tok_starts=cts,
            doc_offsets=doc_offsets,
            doclens=doclens_all,
        )

    def resolve_refine(grid_b: int, staging_b: int) -> str:
        """Pick the refine side once the grid footprint is known."""
        if refine_mode != "auto":
            return refine_mode
        limit = _device_hbm_bytes()
        if limit is None or grid_b + staging_b + refine_dev_bytes <= limit:
            return "device"
        return "host"

    def upload_refine_tables():
        """Pack the chunk codes/residuals into the super-row refine table
        (ops/refine_gather.py: 32 tokens per 128-lane-aligned row — the
        layout that makes per-candidate window fetches an efficient
        big-row XLA gather) and ship it to device in one load-time h2d;
        per-batch refine then never touches the host. Tail rows beyond
        the corpus cover the widest bucket's window so fetches near the
        end never clamp."""
        from nextplaid_tpu.ops.refine_gather import (
            REFINE_G,
            pack_refine_rows_into,
            refine_window_rows,
        )

        td_ref = max(
            max(tds), max(_round_up(max(max_doclen, 1), 32), 32)
        )  # widest refine window any scorer derives (exact.py td)
        n_rows = -(-n_emb // REFINE_G) + refine_window_rows(td_ref) + 1
        tab = np.zeros((n_rows, REFINE_G * (packed_dim + 4)), np.uint8)
        off = 0
        for i in range(meta.num_chunks):
            c = np.asarray(load_npy(layout.chunk_codes(i))).astype(np.int32)
            r = np.asarray(load_npy(layout.chunk_residuals(i)))
            pack_refine_rows_into(tab, c, r, off)
            off += c.shape[0]
        return jnp.asarray(tab)

    refine_data = None

    common = dict(
        centroids=centroids,
        codes=jnp.zeros((0,), jnp.int32),
        residuals=jnp.zeros((0, packed_dim), jnp.uint8),
        doc_offsets=jnp.asarray(doc_offsets.astype(np.int32)),
        doclens=jnp.asarray(doclens_p),
        ivf_offsets=jnp.zeros(centroids.shape[0] + 1, jnp.int32),
        ivf_doc_ids=jnp.zeros((0,), jnp.int32),
        bucket_cutoffs=cutoffs,
        bucket_weights=weights,
        avg_residual=avg_residual,
        n_docs=jnp.asarray(nd, jnp.int32),
        n_emb=jnp.asarray(n_emb, jnp.int32),
        nbits=meta.nbits,
        max_doclen=max_doclen,
        grid_only=True,
    )

    ctok_pad = max(
        _round_up(
            max((int(d.sum()) for d in doclens_list), default=1),
            chunk_token_bucket,
        ),
        chunk_token_bucket,
    )

    def load_chunk(i):
        codes_c = np.asarray(load_npy(layout.chunk_codes(i))).astype(
            np.int32
        )
        res_c = np.asarray(load_npy(layout.chunk_residuals(i)))
        codes_p = np.zeros(ctok_pad, np.int32)
        codes_p[: codes_c.shape[0]] = codes_c
        res_p = np.zeros((ctok_pad, packed_dim), np.uint8)
        res_p[: res_c.shape[0]] = res_c
        return jnp.asarray(codes_p), jnp.asarray(res_p)

    if len(tds) == 1:
        td = tds[0]
        cdoc_pad = max(
            _round_up(max((len(d) for d in doclens_list), default=1), tile),
            tile,
        )
        # Row geometry: capacity + 512 slack rounded to the build tile (so
        # search windows never clamp) + cdoc_pad + 128 EXTRA slack rows.
        # The extra slack is load-bearing: each chunk dispatch writes a
        # fixed cdoc_pad rows (real docs + zero padding; the int8 branch
        # additionally rewrites the carried partial group, hence +128); the
        # padding of chunk i is overwritten by chunk i+1, but the LAST
        # chunk's padding runs past the live rows, and dynamic_update_slice
        # CLAMPS an out-of-bounds write start — silently shifting the last
        # chunk's rows backward over earlier docs. With the slack no write
        # ever clamps; the slack rows stay zero and are masked by the
        # n_docs bound at search time.
        nd_grid = ((nd_pad + 512 + tile - 1) // tile) * tile + cdoc_pad + 128
        slot_bytes = dim + 2 if dtype == "int8" else dim * 2
        # Staging transients per chunk dispatch: the padded chunk arrays,
        # one decompress tile in f32 ([tile, td, dim] inside the scan),
        # and for int8 the pack+interleave copies (~3x the chunk's rows:
        # scan output, the packed full_q, the interleaved blocks).
        staging = (
            ctok_pad * (4 + packed_dim)
            + tile * td * dim * 4
            + cdoc_pad * td * slot_bytes * (3 if dtype == "int8" else 1)
            + (128 << 20)
        )
        refine_side = resolve_refine(nd_grid * td * slot_bytes, staging)
        _require_grid_fits(
            nd_grid * td * slot_bytes
            + (refine_dev_bytes if refine_side == "device" else 0),
            staging,
        )
        if dtype == "bf16":
            grid = jnp.zeros((nd_grid, td, dim), jnp.bfloat16)
            scales = jnp.zeros((0, 0), jnp.bfloat16)
        else:
            grid = jnp.zeros((nd_grid // 128, dim, 128 * td), jnp.int8)
            scales = jnp.zeros((nd_grid // 128, 128 * td), jnp.bfloat16)
        row = 0
        for i in range(meta.num_chunks):
            codes_p, res_p = load_chunk(i)
            dl = doclens_list[i]
            dl_p = np.zeros(cdoc_pad, np.int32)
            dl_p[: dl.shape[0]] = dl
            offs_p = np.zeros(cdoc_pad, np.int32)
            np.cumsum(dl[:-1], out=offs_p[1 : dl.shape[0]])
            grid, scales = _grid_only_chunk_jit(
                grid,
                scales,
                codes_p,
                res_p,
                jnp.asarray(dl_p),
                jnp.asarray(offs_p),
                centroids,
                weights,
                jnp.asarray(row, jnp.int32),
                nbits=meta.nbits,
                td=td,
                tile=tile,
                kind=dtype,
            )
            row += int(dl.shape[0])
        if refine_side == "device":
            common["refine_tab"] = upload_refine_tables()
        elif refine_side == "host":
            refine_data = make_host_refine()
        out = DeviceIndex(
            token_grid=grid,
            token_scales=scales if dtype == "int8" else None,
            **common,
        )._set_host_counts(nd, n_emb)
        object.__setattr__(out, "_refine_host", refine_data)
        return out

    # ---------------- bucketed layout ----------------
    tds_arr = np.asarray(tds, np.int64)
    # Each doc goes to the first bucket whose Td fits it.
    per_doc_td = np.maximum(
        ((np.maximum(doclens_all.astype(np.int64), 1) + mult - 1) // mult)
        * mult,
        mult,
    )
    bucket_of = np.searchsorted(tds_arr, per_doc_td, side="left")
    assert bucket_of.max(initial=0) < len(tds), (per_doc_td.max(), tds)
    chunk_starts = np.concatenate(
        [[0], np.cumsum([len(d) for d in doclens_list])]
    ).astype(np.int64)

    # Per-bucket geometry. cdoc_pad is fixed per bucket (one compiled
    # program each); rows carry + cdoc_pad slack so the last chunk's
    # padded write never clamps (see the single-grid branch note).
    n_b = len(tds)
    bucket_ids = [
        np.nonzero(bucket_of == b)[0].astype(np.int32) for b in range(n_b)
    ]
    per_chunk_counts = [
        [
            int(
                np.count_nonzero(
                    bucket_of[chunk_starts[i] : chunk_starts[i + 1]] == b
                )
            )
            for i in range(meta.num_chunks)
        ]
        for b in range(n_b)
    ]
    cdoc_pads = [
        max(_round_up(max(per_chunk_counts[b], default=1), tile), tile)
        for b in range(n_b)
    ]
    rows_b = [
        max(_round_up(max(len(bucket_ids[b]), 1), tile), tile)
        + cdoc_pads[b]
        + 128
        for b in range(n_b)
    ]
    slot_bytes = dim + 2 if dtype == "int8" else dim * 2
    bucket_grid_bytes = (
        sum(rows_b[b] * tds[b] for b in range(n_b)) * slot_bytes
    )
    bucket_staging = (
        ctok_pad * (4 + packed_dim)
        + tile * max(tds) * dim * 4
        + max(cdoc_pads[b] * tds[b] for b in range(n_b))
        * slot_bytes
        * (3 if dtype == "int8" else 1)
        + (128 << 20)
    )
    refine_side = resolve_refine(bucket_grid_bytes, bucket_staging)
    _require_grid_fits(
        bucket_grid_bytes
        + (refine_dev_bytes if refine_side == "device" else 0),
        bucket_staging,
    )
    grids = []
    scale_grids = []
    for b in range(n_b):
        if dtype == "bf16":
            grids.append(jnp.zeros((rows_b[b], tds[b], dim), jnp.bfloat16))
            scale_grids.append(jnp.zeros((0, 0), jnp.bfloat16))
        else:
            grids.append(
                jnp.zeros((rows_b[b] // 128, dim, 128 * tds[b]), jnp.int8)
            )
            scale_grids.append(
                jnp.zeros((rows_b[b] // 128, 128 * tds[b]), jnp.bfloat16)
            )

    # ONE pass over the chunks (each chunk is read from disk and staged to
    # the device once); per-bucket dispatches run from the resident copy.
    rows_written = [0] * n_b
    for i in range(meta.num_chunks):
        if all(per_chunk_counts[b][i] == 0 for b in range(n_b)):
            continue
        codes_p, res_p = load_chunk(i)
        dl = doclens_list[i]
        offs_chunk = np.zeros(len(dl), np.int64)
        np.cumsum(dl[:-1], out=offs_chunk[1:])
        in_chunk = bucket_of[chunk_starts[i] : chunk_starts[i + 1]]
        for b in range(n_b):
            if per_chunk_counts[b][i] == 0:
                continue
            local = np.nonzero(in_chunk == b)[0]
            dl_p = np.zeros(cdoc_pads[b], np.int32)
            dl_p[: len(local)] = dl[local]
            offs_p = np.zeros(cdoc_pads[b], np.int32)
            offs_p[: len(local)] = offs_chunk[local]
            grids[b], scale_grids[b] = _grid_only_chunk_jit(
                grids[b],
                scale_grids[b],
                codes_p,
                res_p,
                jnp.asarray(dl_p),
                jnp.asarray(offs_p),
                centroids,
                weights,
                jnp.asarray(rows_written[b], jnp.int32),
                nbits=meta.nbits,
                td=tds[b],
                tile=tile,
                kind=dtype,
            )
            rows_written[b] += len(local)

    perm_parts = []
    doclen_parts = []
    for b in range(n_b):
        ids = bucket_ids[b]
        perm_b = np.full(rows_b[b], -1, np.int32)
        perm_b[: len(ids)] = ids
        perm_parts.append(perm_b)
        dls_b = np.zeros(rows_b[b], np.int32)
        dls_b[: len(ids)] = doclens_all[ids]
        doclen_parts.append(dls_b)
    if dtype != "int8":
        scale_grids = []

    if refine_side == "device":
        common["refine_tab"] = upload_refine_tables()
    elif refine_side == "host":
        refine_data = make_host_refine()
    out = DeviceIndex(
        grid_buckets=tuple(grids),
        scale_buckets=tuple(scale_grids),
        grid_perm=jnp.asarray(np.concatenate(perm_parts)),
        grid_doclens=jnp.asarray(
            np.concatenate(doclen_parts).reshape(-1, 1)
        ),
        **common,
    )._set_host_counts(nd, n_emb)
    object.__setattr__(out, "_refine_host", refine_data)
    return out
