"""Golden on-disk format tests: frozen, hand-verified byte fixtures.

The fixtures under tests/golden/index_nbits{2,4}/ were generated ONCE by
tests/golden/gen_golden_index.py (pure numpy/json, zero library imports) and
committed. Every byte is hand-derivable: one-hot centroids, residuals that sit
exactly on bucket weights, and the reference bitstream layout
(reference codec.rs:154-225 packing, mmap.rs:406-750 / index.rs:373-528 files).

These tests pin the library to that frozen layout from BOTH directions:

- encode: the library's quantizer must reproduce the committed residual bytes
  and codes exactly, from the raw embeddings recorded in expected.json;
- decode: loading the committed directory must reconstruct the hand-computed
  embeddings and return the hand-computed MaxSim scores/order.

If either direction drifts — a packing change, a searchsorted side change, a
renorm change, a file-layout change — these fail, so reference on-disk
compatibility can never silently regress. Do NOT regenerate the fixtures to
make a failing test pass; that defeats their purpose.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from nextplaid_tpu.index import DeviceIndex, SearchParameters, search_batch
from nextplaid_tpu.ops import codec as codec_ops

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def fixture(nbits: int):
    root = os.path.join(GOLDEN, f"index_nbits{nbits}")
    with open(os.path.join(root, "expected.json")) as f:
        exp = json.load(f)
    return root, exp


@pytest.mark.parametrize("nbits", [2, 4])
def test_committed_bytes_are_frozen(nbits):
    """The committed residual bytes match the hand-derived hex in expected.json
    (guards against accidental fixture regeneration with changed values)."""
    root, exp = fixture(nbits)
    packed = np.load(os.path.join(root, "0.residuals.npy"))
    assert [bytes(r).hex() for r in packed] == exp["packed_hex"]
    codes = np.load(os.path.join(root, "0.codes.npy"))
    assert codes.tolist() == exp["codes"]


@pytest.mark.parametrize("nbits", [2, 4])
def test_encode_reproduces_golden_bytes(nbits):
    """assign_codes + bucketize + pack_buckets on the raw embeddings must emit
    exactly the committed bytes (reference codec.rs:154-225 semantics)."""
    root, exp = fixture(nbits)
    emb = jnp.asarray(np.asarray(exp["embeddings"], np.float32))
    centroids = jnp.asarray(np.load(os.path.join(root, "centroids.npy")))
    cutoffs = jnp.asarray(np.load(os.path.join(root, "bucket_cutoffs.npy")))

    codes = codec_ops.assign_codes(emb, centroids)
    assert np.asarray(codes).tolist() == exp["codes"]

    residuals = codec_ops.compute_residuals(emb, centroids, codes)
    buckets = codec_ops.bucketize(residuals, cutoffs, nbits)
    assert np.asarray(buckets).tolist() == exp["tok_buckets"]

    packed = np.asarray(codec_ops.pack_buckets(buckets, nbits))
    golden = np.load(os.path.join(root, "0.residuals.npy"))
    np.testing.assert_array_equal(packed, golden)
    assert [bytes(r).hex() for r in packed] == exp["packed_hex"]


@pytest.mark.parametrize("nbits", [2, 4])
def test_decode_reconstructs_hand_values(nbits):
    """Loading the committed directory and decompressing must reproduce the
    hand-computed normalize(centroid + weight) embeddings exactly (within f32)."""
    root, exp = fixture(nbits)
    index = DeviceIndex.load(root)
    assert index.nbits == nbits
    assert index.num_documents == len(exp["doclens"])

    n_tok = sum(exp["doclens"])
    recon = codec_ops.decompress_residuals(
        index.residuals[:n_tok],
        index.codes[:n_tok],
        index.centroids,
        index.bucket_weights,
        nbits,
    )
    np.testing.assert_allclose(
        np.asarray(recon),
        np.asarray(exp["reconstructed"], np.float32),
        rtol=1e-6,
        atol=1e-6,
    )


@pytest.mark.parametrize("nbits", [2, 4])
def test_search_matches_hand_scores(nbits):
    """Exhaustive staged search over the golden index returns the hand-computed
    MaxSim scores and ranking."""
    root, exp = fixture(nbits)
    index = DeviceIndex.load(root)
    query = np.asarray(exp["query"], np.float32)
    params = SearchParameters(
        n_ivf_probe=index.num_centroids,
        centroid_score_threshold=None,
        n_full_scores=4 * index.num_documents,
        top_k=3,
    )
    (res,) = search_batch(index, [query], params)
    assert res.passage_ids == exp["expected_order"]
    expected_sorted = [exp["expected_scores"][i] for i in exp["expected_order"]]
    np.testing.assert_allclose(res.scores, expected_sorted, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nbits", [2, 4])
def test_generator_is_deterministic(nbits, tmp_path):
    """Re-running the generator bit-reproduces every committed artifact, so the
    fixtures can always be audited from first principles."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_golden_index", os.path.join(GOLDEN, "gen_golden_index.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # Regenerate into a temp copy of the module rooted at tmp_path.
    mod.HERE = str(tmp_path)
    mod.build_fixture(nbits)
    fresh = tmp_path / f"index_nbits{nbits}"
    committed = os.path.join(GOLDEN, f"index_nbits{nbits}")
    for name in sorted(os.listdir(committed)):
        with open(os.path.join(committed, name), "rb") as f:
            want = f.read()
        with open(fresh / name, "rb") as f:
            got = f.read()
        assert got == want, f"{name} drifted from committed fixture"
