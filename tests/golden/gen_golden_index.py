"""Generate the golden on-disk index fixtures — PURE numpy/json, zero
nextplaid_tpu imports — freezing the reference-compatible byte format
(reference layout: mmap.rs:406-750, codec.rs:154-225, index.rs:373-528).

Every value is hand-chosen so the expected bytes and search scores can be
verified by hand:

- dim=8, K=4 one-hot unit centroids c_i = e_i.
- nbits=2: cutoffs [-0.1, 0, 0.1], weights [-0.2, -0.05, 0.05, 0.2];
  nbits=4: 15 cutoffs at +-(k+0.5)*0.05 around 0, 16 weights at k*0.05
  for k in -7..8 mapped monotonically — every residual component below is
  EXACTLY a bucket weight, at least 0.02 away from any cutoff, so the
  quantize -> dequantize round trip is exact and independent of tie rules.
- Residual packing (codec.rs:169-214): each value's bucket index v is
  written LSB-first into an MSB-first bitstream. For nbits=2 that is
  byte = rev2(v0)<<6 | rev2(v1)<<4 | rev2(v2)<<2 | rev2(v3) with
  rev2 = [0,2,1,3]; for nbits=4, byte = rev4(v0)<<4 | rev4(v1).
- Docs (doclens [2,1,2]) with hand-picked codes [0,1,2,3,0] give
  IVF posting lists c0:{0,2} c1:{0} c2:{1} c3:{2}.

The expected decompressed token is normalize(c_code + w[v] per dim), and the
expected MaxSim score for query Q is sum_i max_t <q_i, t> — both computed
here with plain numpy formulas and frozen into expected.json.

Run from the repo root:  python tests/golden/gen_golden_index.py
The committed fixture bytes must NEVER change; test_golden_format.py fails
if regeneration or the library's encoder drifts from them.
"""

from __future__ import annotations

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DIM = 8
K = 4


def bit_rev(v: int, nbits: int) -> int:
    r = 0
    for b in range(nbits):
        if v & (1 << b):
            r |= 1 << (nbits - 1 - b)
    return r


def pack_buckets(buckets: np.ndarray, nbits: int) -> np.ndarray:
    """[N, DIM] bucket indices -> [N, DIM*nbits/8] packed bytes."""
    per_byte = 8 // nbits
    n, d = buckets.shape
    out = np.zeros((n, d * nbits // 8), dtype=np.uint8)
    for i in range(n):
        for j in range(d):
            byte_idx, slot = divmod(j, per_byte)
            shift = 8 - nbits * (slot + 1)
            out[i, byte_idx] |= bit_rev(int(buckets[i, j]), nbits) << shift
    return out


def codec_tables(nbits: int):
    if nbits == 2:
        cutoffs = np.array([-0.1, 0.0, 0.1], np.float32)
        weights = np.array([-0.2, -0.05, 0.05, 0.2], np.float32)
    else:
        ks = np.arange(16) - 7.5  # -7.5 .. 7.5
        weights = (ks * 0.05).astype(np.float32)
        cutoffs = ((ks[:-1] + 0.5) * 0.05).astype(np.float32)
    return cutoffs, weights


def save_npy(path: str, arr: np.ndarray) -> None:
    np.save(path, arr)
    os.rename(path + ".npy" if not path.endswith(".npy") else path, path)


def build_fixture(nbits: int) -> None:
    root = os.path.join(HERE, f"index_nbits{nbits}")
    os.makedirs(root, exist_ok=True)
    cutoffs, weights = codec_tables(nbits)
    centroids = np.eye(K, DIM, dtype=np.float32)

    # Hand-picked bucket patterns per token (values index into `weights`).
    lo, hi = 0, len(weights) - 1
    mid_lo, mid_hi = len(weights) // 2 - 1, len(weights) // 2
    tok_buckets = np.array(
        [
            [hi, lo, mid_hi, mid_lo, hi, lo, mid_hi, mid_lo],  # doc0 tok0
            [lo, mid_lo, mid_hi, hi, lo, mid_lo, mid_hi, hi],  # doc0 tok1
            [hi] * 8,                                          # doc1 tok0
            [lo] * 8,                                          # doc2 tok0
            [mid_hi, hi, lo, mid_lo, hi, mid_hi, mid_lo, lo],  # doc2 tok1
        ],
        dtype=np.int64,
    )
    codes = np.array([0, 1, 2, 3, 0], dtype=np.int64)
    doclens = [2, 1, 2]

    residuals_f32 = weights[tok_buckets]  # exact bucket weights
    # The raw (pre-quantization) embeddings the index was "built" from.
    embeddings = centroids[codes] + residuals_f32
    packed = pack_buckets(tok_buckets, nbits)

    # Decompressed tokens as the engine reconstructs them: L2-renormalized.
    recon = centroids[codes] + residuals_f32
    recon = recon / np.linalg.norm(recon, axis=1, keepdims=True)

    # IVF: doc-deduped posting lists sorted by doc id within each centroid.
    doc_of_token = np.repeat(np.arange(len(doclens)), doclens)
    ivf_ids, ivf_lengths = [], []
    for c in range(K):
        docs = sorted(set(doc_of_token[codes == c].tolist()))
        ivf_ids.extend(docs)
        ivf_lengths.append(len(docs))
    ivf_ids = np.asarray(ivf_ids, np.int64)
    ivf_lengths = np.asarray(ivf_lengths, np.int32)

    # Query: 2 tokens along e0 and e2; expected MaxSim per doc by hand.
    query = np.zeros((2, DIM), np.float32)
    query[0, 0] = 1.0
    query[1, 2] = 1.0
    token_start = np.concatenate([[0], np.cumsum(doclens)])
    expected_scores = []
    for d in range(len(doclens)):
        toks = recon[token_start[d] : token_start[d + 1]]
        sim = query @ toks.T  # [2, Td]
        expected_scores.append(float(sim.max(axis=1).sum()))

    np.save(os.path.join(root, "centroids.npy"), centroids)
    np.save(os.path.join(root, "bucket_cutoffs.npy"), cutoffs)
    np.save(os.path.join(root, "bucket_weights.npy"), weights)
    np.save(
        os.path.join(root, "avg_residual.npy"),
        np.asarray([np.abs(residuals_f32).mean()], np.float32),
    )
    np.save(
        os.path.join(root, "cluster_threshold.npy"),
        np.asarray([0.5], np.float32),
    )
    np.save(os.path.join(root, "ivf.npy"), ivf_ids)
    np.save(os.path.join(root, "ivf_lengths.npy"), ivf_lengths)
    np.save(os.path.join(root, "0.codes.npy"), codes)
    np.save(os.path.join(root, "0.residuals.npy"), packed)
    with open(os.path.join(root, "doclens.0.json"), "w") as f:
        json.dump(doclens, f)
    with open(os.path.join(root, "0.metadata.json"), "w") as f:
        json.dump(
            {
                "num_documents": len(doclens),
                "num_embeddings": int(codes.size),
                "embedding_offset": 0,
            },
            f,
            indent=2,
        )
    with open(os.path.join(root, "plan.json"), "w") as f:
        json.dump({"nbits": nbits, "num_chunks": 1}, f, indent=2)
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump(
            {
                "num_chunks": 1,
                "nbits": nbits,
                "num_partitions": K,
                "num_embeddings": int(codes.size),
                "avg_doclen": codes.size / len(doclens),
                "num_documents": len(doclens),
                "embedding_dim": DIM,
                "next_plaid_compatible": True,
            },
            f,
            indent=2,
        )

    with open(os.path.join(root, "expected.json"), "w") as f:
        json.dump(
            {
                "nbits": nbits,
                "doclens": doclens,
                "codes": codes.tolist(),
                "tok_buckets": tok_buckets.tolist(),
                "packed_hex": [bytes(r).hex() for r in packed],
                "embeddings": embeddings.tolist(),
                "reconstructed": recon.tolist(),
                "query": query.tolist(),
                "expected_scores": expected_scores,
                "expected_order": list(
                    np.argsort(-np.asarray(expected_scores), kind="stable")
                    .astype(int)
                    .tolist()
                ),
            },
            f,
            indent=2,
        )
    print(f"nbits={nbits}: packed rows {[bytes(r).hex() for r in packed]}")
    print(f"nbits={nbits}: scores {expected_scores}")


if __name__ == "__main__":
    build_fixture(2)
    build_fixture(4)
