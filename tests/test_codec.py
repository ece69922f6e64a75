"""Codec op tests — mirror the reference's codec unit tests
(/root/reference/next-plaid/src/codec.rs:615-753) plus byte-level format checks
against an independent straight-from-spec bitstream encoder."""

import numpy as np
import pytest

import jax.numpy as jnp

from nextplaid_tpu.ops import codec


def reference_pack(buckets: np.ndarray, nbits: int) -> np.ndarray:
    """Independent bitstream encoder following the reference spec
    (codec.rs:377-399): each bucket's bits written LSB-first into a global
    MSB-first bitstream."""
    n, dim = buckets.shape
    packed_dim = dim * nbits // 8
    out = np.zeros((n, packed_dim), dtype=np.uint8)
    for i in range(n):
        bit_idx = 0
        for v in buckets[i]:
            for b in range(nbits):
                bit = (int(v) >> b) & 1
                byte_idx = bit_idx // 8
                bit_pos = 7 - (bit_idx % 8)
                out[i, byte_idx] |= bit << bit_pos
                bit_idx += 1
    return out


@pytest.mark.parametrize("nbits", [2, 4])
def test_pack_matches_reference_bitstream(nbits):
    rng = np.random.default_rng(42)
    buckets = rng.integers(0, 1 << nbits, size=(7, 16), dtype=np.int32)
    expected = reference_pack(buckets, nbits)
    got = np.asarray(codec.pack_buckets(jnp.asarray(buckets), nbits))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("nbits", [2, 4])
def test_pack_unpack_roundtrip(nbits):
    rng = np.random.default_rng(0)
    buckets = rng.integers(0, 1 << nbits, size=(11, 128), dtype=np.int32)
    packed = codec.pack_buckets(jnp.asarray(buckets), nbits)
    assert packed.shape == (11, 128 * nbits // 8)
    unpacked = np.asarray(codec.unpack_buckets(packed, nbits))
    np.testing.assert_array_equal(unpacked, buckets)


def test_bucketize_is_count_of_smaller_cutoffs():
    cutoffs = jnp.asarray([-0.5, 0.0, 0.5])
    vals = jnp.asarray([[-1.0, -0.5, -0.2, 0.0, 0.2, 0.5, 1.0]])
    buckets = np.asarray(codec.bucketize(vals, cutoffs, 2))
    # bucket = #cutoffs strictly less than val (codec.rs:386): equality does not
    # advance the bucket.
    np.testing.assert_array_equal(buckets, [[0, 0, 1, 1, 2, 2, 3]])


def test_assign_codes_basic():
    # Reference test_compress_into_codes (codec.rs:637-663).
    centroids = jnp.asarray(
        [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]], dtype=jnp.float32
    )
    emb = jnp.asarray(
        [[0.9, 0.1, 0, 0], [0, 0, 0.95, 0.05]], dtype=jnp.float32
    )
    codes = np.asarray(codec.assign_codes(emb, centroids))
    np.testing.assert_array_equal(codes, [0, 2])


def test_assign_codes_ignores_nan_centroids():
    # Reference codec.rs:733-752.
    centroids = jnp.asarray(
        [[np.nan, 0.0], [1.0, 0.0], [0.0, 1.0]], dtype=jnp.float32
    )
    emb = jnp.asarray([[1.0, 0.0]], dtype=jnp.float32)
    codes = np.asarray(codec.assign_codes(emb, centroids))
    assert codes[0] == 1


def test_assign_codes_chunked_matches_unchunked():
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.standard_normal((64, 16)), dtype=jnp.float32)
    cents = jnp.asarray(rng.standard_normal((10, 16)), dtype=jnp.float32)
    full = np.asarray(codec.assign_codes(emb, cents))
    chunked = np.asarray(codec.assign_codes(emb, cents, chunk_rows=16))
    np.testing.assert_array_equal(full, chunked)


@pytest.mark.parametrize("nbits", [2, 4])
def test_quantize_decompress_roundtrip(nbits):
    """Bucket-value round trip: with centroid 0 and exact bucket-weight values,
    decompression recovers the weight of the assigned bucket (pre-normalization
    direction check, mirroring codec.rs:666-730)."""
    dim = 8
    rng = np.random.default_rng(3)
    n_buckets = 1 << nbits
    cutoffs = np.linspace(-1, 1, n_buckets + 1)[1:-1].astype(np.float32)
    weights = ((np.arange(n_buckets) + 0.5) / n_buckets * 2 - 1).astype(np.float32)
    centroids = jnp.zeros((4, dim), dtype=jnp.float32)

    residuals = rng.uniform(-1, 1, size=(5, dim)).astype(np.float32)
    packed = codec.quantize_residuals(jnp.asarray(residuals), jnp.asarray(cutoffs), nbits)
    codes = jnp.zeros((5,), dtype=jnp.int32)
    out = np.asarray(
        codec.decompress_residuals(
            packed, codes, centroids, jnp.asarray(weights), nbits, normalize=False
        )
    )
    expected_buckets = np.searchsorted(cutoffs, residuals, side="left")
    np.testing.assert_allclose(out, weights[expected_buckets], rtol=1e-6)

    # Normalized variant has unit rows.
    out_n = np.asarray(
        codec.decompress_residuals(
            packed, codes, centroids, jnp.asarray(weights), nbits, normalize=True
        )
    )
    np.testing.assert_allclose(np.linalg.norm(out_n, axis=1), 1.0, rtol=1e-5)


def test_train_codec_buckets_quantiles():
    sample = np.linspace(-1.0, 1.0, 1001, dtype=np.float32)
    cutoffs, weights = codec.train_codec_buckets(sample, 2)
    np.testing.assert_allclose(cutoffs, [-0.5, 0.0, 0.5], atol=1e-3)
    np.testing.assert_allclose(weights, [-0.75, -0.25, 0.25, 0.75], atol=1e-3)


def test_fastplaid_conversion(tmp_path):
    """f16/i64/<u1 fast-plaid files convert in place and stay loadable
    (reference mmap.rs:1757-1811)."""
    import struct

    from nextplaid_tpu.storage.convert import convert_fastplaid_to_nextplaid
    from nextplaid_tpu.storage.npy import load_npy

    rng = np.random.default_rng(0)
    cents = rng.standard_normal((16, 8)).astype(np.float16)
    np.save(tmp_path / "centroids.npy", cents)
    np.save(tmp_path / "ivf_lengths.npy", np.arange(16, dtype=np.int64))
    # Hand-write a '<u1' descriptor NPY (numpy itself writes '|u1').
    res = rng.integers(0, 255, size=(10, 4)).astype(np.uint8)
    header = "{'descr': '<u1', 'fortran_order': False, 'shape': (10, 4), }"
    header += " " * ((64 - (10 + len(header) + 1) % 64) % 64) + "\n"
    with open(tmp_path / "0.residuals.npy", "wb") as f:
        f.write(b"\x93NUMPY\x01\x00")
        f.write(struct.pack("<H", len(header)))
        f.write(header.encode())
        f.write(res.tobytes())

    assert convert_fastplaid_to_nextplaid(tmp_path) is True
    c = np.asarray(load_npy(tmp_path / "centroids.npy"))
    assert c.dtype == np.float32
    np.testing.assert_allclose(c, cents.astype(np.float32))
    iv = np.asarray(load_npy(tmp_path / "ivf_lengths.npy"))
    assert iv.dtype == np.int32
    r = np.asarray(load_npy(tmp_path / "0.residuals.npy"))
    assert r.dtype == np.uint8
    np.testing.assert_array_equal(r, res)
    # Idempotent.
    assert convert_fastplaid_to_nextplaid(tmp_path) is False


def test_native_codec_matches_device_codec():
    """C++ host pack/unpack/bucketize == the JAX device codec bit-for-bit."""
    import jax.numpy as jnp

    from nextplaid_tpu.ops import codec
    from nextplaid_tpu.storage import native

    rng = np.random.default_rng(1)
    for nbits in (2, 4):
        buckets = rng.integers(0, 1 << nbits, size=(64, 128)).astype(np.int32)
        host = native.pack_residuals(buckets, nbits)
        dev = np.asarray(codec.pack_buckets(jnp.asarray(buckets), nbits))
        np.testing.assert_array_equal(host, dev)
        np.testing.assert_array_equal(
            native.unpack_residuals(host, nbits), buckets
        )
    cut = np.sort(rng.standard_normal(15)).astype(np.float32)
    vals = rng.standard_normal(500).astype(np.float32)
    np.testing.assert_array_equal(
        native.bucketize(vals, cut),
        np.asarray(codec.bucketize(jnp.asarray(vals), jnp.asarray(cut), 4)),
    )


def test_atomic_write_failure_preserves_original(tmp_path, monkeypatch):
    """A crash mid-write must leave the previous file intact
    (reference utils.rs:320-338 atomic tmp+rename discipline)."""
    import os

    from nextplaid_tpu.storage import npy as npy_mod

    target = tmp_path / "data.npy"
    original = np.arange(10, dtype=np.float32)
    npy_mod.atomic_write_npy(target, original)

    real_replace = os.replace

    def boom(src, dst):
        raise OSError("disk full")

    monkeypatch.setattr(os, "replace", boom)
    monkeypatch.setattr(os, "rename", boom, raising=False)
    try:
        npy_mod.atomic_write_npy(target, np.zeros(5, np.float32))
    except OSError:
        pass
    monkeypatch.setattr(os, "replace", real_replace)
    back = np.asarray(npy_mod.load_npy(target, mmap=False))
    np.testing.assert_array_equal(back, original)
    # No stray tmp files leak into the directory's namespace forever.
    leftovers = [p for p in tmp_path.iterdir() if p.name != "data.npy"]
    assert all(".tmp" in p.name or p.suffix != ".npy" for p in leftovers)
