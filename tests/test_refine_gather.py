"""Super-row refine table (ops/refine_gather.py): packing roundtrip and
window-fetch semantics. The scorers built on it are covered end-to-end by
tests/test_streamed_build.py (fused == union == oracle); these pin the
layout contract itself — byte placement, remainder indexing, tail
clamping — so a layout change can't silently skew every refined score."""

import numpy as np
import jax.numpy as jnp

from nextplaid_tpu.ops.refine_gather import (
    REFINE_G,
    fetch_refine_windows,
    pack_refine_rows_into,
    pack_refine_table,
    refine_window_rows,
    split_refine_rows,
)


def _rand_tables(nvec, pd, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(-(1 << 30), 1 << 30, size=nvec, dtype=np.int64)
    codes = codes.astype(np.int32)  # includes negatives: sign must survive
    res = rng.integers(0, 256, size=(nvec, pd), dtype=np.int64).astype(
        np.uint8
    )
    return codes, res


def test_pack_split_roundtrip():
    nvec, pd = 1000, 24  # dim=96 nbits=2
    codes, res = _rand_tables(nvec, pd)
    tab = pack_refine_table(codes, res)
    assert tab.shape == (-(-nvec // REFINE_G), REFINE_G * (pd + 4))
    assert tab.dtype == np.uint8
    flat = jnp.asarray(tab.reshape(-1, pd + 4)[:nvec])
    codes_rt, res_rt = split_refine_rows(flat, pd)
    np.testing.assert_array_equal(np.asarray(codes_rt), codes)
    np.testing.assert_array_equal(np.asarray(res_rt), res)


def test_pack_rows_into_chunked_equals_one_shot():
    nvec, pd = 777, 32
    codes, res = _rand_tables(nvec, pd, seed=1)
    whole = pack_refine_table(codes, res, n_rows=40)
    out = np.zeros_like(whole)
    # chunk boundaries deliberately NOT super-row aligned
    for lo, hi in ((0, 130), (130, 131), (131, 700), (700, 777)):
        pack_refine_rows_into(out, codes[lo:hi], res[lo:hi], lo)
    np.testing.assert_array_equal(out, whole)


def test_fetch_windows_remainder_indexing():
    nvec, pd, td = 2048, 24, 96
    codes, res = _rand_tables(nvec, pd, seed=2)
    n_rows = -(-nvec // REFINE_G) + refine_window_rows(td) + 1
    tab = jnp.asarray(pack_refine_table(codes, res, n_rows=n_rows))
    offs = np.asarray([0, 1, 31, 32, 33, 500, nvec - td], np.int32)
    win, rem = fetch_refine_windows(tab, jnp.asarray(offs), td)
    win_h, rem_h = np.asarray(win), np.asarray(rem)
    assert win_h.shape == (len(offs), td + REFINE_G, pd + 4)
    np.testing.assert_array_equal(rem_h, offs % REFINE_G)
    for i, off in enumerate(offs):
        got = win_h[i, rem_h[i] : rem_h[i] + td]
        codes_g, res_g = split_refine_rows(jnp.asarray(got), pd)
        np.testing.assert_array_equal(
            np.asarray(codes_g), codes[off : off + td]
        )
        np.testing.assert_array_equal(np.asarray(res_g), res[off : off + td])


def test_fetch_windows_tail_never_reads_oob():
    """Offsets at the very end of the corpus: the window row clip keeps the
    gather in bounds, and the padded tail rows are zeros."""
    nvec, pd, td = 100, 24, 96  # corpus smaller than one window
    codes, res = _rand_tables(nvec, pd, seed=3)
    n_rows = -(-nvec // REFINE_G) + refine_window_rows(td) + 1
    tab = jnp.asarray(pack_refine_table(codes, res, n_rows=n_rows))
    offs = jnp.asarray([0, 64, 96], jnp.int32)
    win, rem = fetch_refine_windows(tab, offs, td)
    win_h = np.asarray(win)
    rem_h = np.asarray(rem)
    # last doc (offset 96, len 4): its rows are exact, rest zeros
    i = 2
    got = win_h[i, rem_h[i] : rem_h[i] + 4]
    codes_g, res_g = split_refine_rows(jnp.asarray(got), pd)
    np.testing.assert_array_equal(np.asarray(codes_g), codes[96:100])
    assert not np.any(win_h[i, rem_h[i] + 4 :])  # zero-padded tail


def test_batched_fetch_shape():
    """fetch_refine_windows is rank-polymorphic: [Q, R] offsets give
    [Q, R, td_w, pd+4] windows (the fused per-query scorer's shape)."""
    nvec, pd, td = 4096, 32, 64
    codes, res = _rand_tables(nvec, pd, seed=4)
    n_rows = -(-nvec // REFINE_G) + refine_window_rows(td) + 1
    tab = jnp.asarray(pack_refine_table(codes, res, n_rows=n_rows))
    offs = jnp.asarray(
        np.random.default_rng(5).integers(0, nvec - td, size=(3, 7)),
        jnp.int32,
    )
    win, rem = fetch_refine_windows(tab, offs, td)
    assert win.shape == (3, 7, td + REFINE_G, pd + 4)
    assert rem.shape == (3, 7)
