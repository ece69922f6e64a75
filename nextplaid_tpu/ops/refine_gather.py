"""Super-row packed refine table: TPU-fast candidate token-range fetch.

The grid-only refinement stage (exact.refine_own_topk_device) needs, for
each candidate document, its doclen token rows from the corpus-resident
codes [Nvec] i32 and packed residuals [Nvec, pd] u8 tables (reference
decompression inputs, codec.rs:423-470). Expressed directly as an XLA
row gather (`res[tok_pos]` with tok_pos [C, td]) this is pathological on
TPU at mega scale: rows are 32-36 BYTES wide — a fraction of one
(8, 128) lane tile — so the gather fetches ~573K tiny unaligned rows
from a 72M-row table. Measured on v5e: >10 min to compile, >1 s/batch to
run (the round-5 regression that dropped 72M refine-on serving from 250
to 47 QPS). `vmap(dynamic_slice)`, `lax.scan(dynamic_slice)` and a
hand-written Pallas DMA kernel all hit the same wall (Mosaic requires
HBM range-DMA minor dims to be multiples of 128 and dim-0 starts
provably tile-aligned).

The fix is LAYOUT, not a kernel: the corpus layout is doc-major, so a
candidate's rows are contiguous — pack G=32 consecutive tokens into one
"super-row" of G*(pd+4) bytes (codes interleaved as 4 little-endian
bytes after each token's residuals). Every super-row is then a whole
number of 128-lane tiles (pd+4 is a multiple of 4 for any dim%16==0),
and a candidate's window is S = td//G + 1 consecutive super-rows. The
fetch becomes an XLA gather of C*S BIG aligned rows from an Nvec/32-row
table — measured 0.09 ms for 23.6 MB of windows (C=2560, td=224) where
the narrow-row gather took >1300 ms: ~14,000x. The leading `off % G`
remainder rows ride along and are masked by the scorer's token-validity
mask (decompress/MaxSim already mask invalid tokens), costing ~14% extra
refine FLOPs and nothing else.

Everything here is plain XLA — it runs identically on CPU (tests) and
TPU (serving), no interpret-mode split.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# Tokens per super-row. 32 makes the packed row width G*(pd+4) a multiple
# of 128 bytes for every supported (dim, nbits): pd = dim*nbits/8 with
# dim % 16 == 0 implies pd % 4 == 0, so 32*(pd+4) % 128 == 0.
REFINE_G = 32


def refine_window_rows(td: int) -> int:
    """Super-rows per candidate window: covers rem < G plus td tokens."""
    return td // REFINE_G + 1


def pack_refine_table(codes, res, n_rows: int | None = None) -> np.ndarray:
    """[Nvec] i32 codes + [Nvec, pd] u8 residuals -> [n_rows, G*(pd+4)]
    u8 super-row table (per token: pd residual bytes then the 4 LE code
    bytes). `n_rows` > ceil(Nvec/G) adds zero-padded tail rows so window
    fetches near the corpus end never clamp."""
    codes = np.ascontiguousarray(np.asarray(codes, dtype=np.int32))
    res = np.ascontiguousarray(np.asarray(res, dtype=np.uint8))
    nvec, pd = res.shape
    b = pd + 4
    min_rows = -(-nvec // REFINE_G)
    rows = min_rows if n_rows is None else int(n_rows)
    assert rows >= min_rows, (rows, min_rows)
    flat = np.zeros((rows * REFINE_G, b), np.uint8)
    flat[:nvec, :pd] = res
    code_bytes = codes.view(np.uint8).reshape(nvec, 4)
    if not np.little_endian:  # pragma: no cover - TPU hosts are LE
        code_bytes = code_bytes[:, ::-1]
    flat[:nvec, pd:] = code_bytes
    return flat.reshape(rows, REFINE_G * b)


def pack_refine_rows_into(out: np.ndarray, codes, res, tok_start: int):
    """Write one chunk's tokens into a preallocated super-row table `out`
    ([rows, G*(pd+4)] u8) starting at corpus token offset `tok_start`
    (chunk boundaries are not super-row aligned, so this writes through a
    flat [rows*G, pd+4] view)."""
    codes = np.ascontiguousarray(np.asarray(codes, dtype=np.int32))
    res = np.ascontiguousarray(np.asarray(res, dtype=np.uint8))
    nvec, pd = res.shape
    b = pd + 4
    flat = out.reshape(-1, b)
    flat[tok_start : tok_start + nvec, :pd] = res
    code_bytes = codes.view(np.uint8).reshape(nvec, 4)
    if not np.little_endian:  # pragma: no cover
        code_bytes = code_bytes[:, ::-1]
    flat[tok_start : tok_start + nvec, pd:] = code_bytes


def fetch_refine_windows(tab, offsets, td: int):
    """Gather per-candidate token windows from the super-row table.

    tab      [rows, G*(pd+4)] u8 (pack_refine_table)
    offsets  [...] i32/i64 raw token offsets (doc_offsets[ids])
    td       static window token count (multiple of G covers max doclen)

    Returns (win [..., td_w, pd+4] u8, rem [...] i32) with
    td_w = td + G: token t of a candidate lives at window row rem + t.
    Traceable; pure XLA (big-row gather)."""
    g = REFINE_G
    s = refine_window_rows(td)
    offsets = offsets.astype(jnp.int32)
    sr = offsets // g
    rem = offsets - sr * g
    rows = sr[..., None] + jnp.arange(s, dtype=jnp.int32)
    rows = jnp.clip(rows, 0, tab.shape[0] - 1)
    win = tab[rows]  # [..., S, G*(pd+4)]
    b = tab.shape[1] // g
    win = win.reshape(win.shape[:-2] + (s * g, b))
    return win, rem


def split_refine_rows(rows, pd: int):
    """Inverse of the per-token packing on gathered rows [..., pd+4] u8:
    returns (codes [...] i32, res [..., pd] u8)."""
    res = rows[..., :pd]
    cb = rows[..., pd : pd + 4].astype(jnp.int32)
    codes = (
        cb[..., 0]
        | (cb[..., 1] << 8)
        | (cb[..., 2] << 16)
        | (cb[..., 3] << 24)
    )
    return codes, res
