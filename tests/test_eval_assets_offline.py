"""CI gate for the real-data eval path (VERDICT r4 next #5): the offline
dry-run exercises every byte of the path a real SciFact + checkpoint run
would take — real-format dataset files, real-format HF checkpoint loaded
via load_params/_map_bert, tokenizer parity, eval_beir local+api — minus
only the download."""

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


@pytest.mark.slow
def test_offline_dryrun_end_to_end(tmp_path, monkeypatch):
    import fetch_eval_assets as fea

    # Regenerating the fixture must reproduce the committed bytes —
    # the dataset is deterministic, so drift means the generator changed
    # without recommitting.
    gen_dir = tmp_path / "mini_beir"
    fea.generate_fixture_dataset(gen_dir)
    for rel in ("corpus.jsonl", "queries.jsonl", "qrels/test.tsv"):
        committed = (fea.FIXTURE_DIR / rel).read_bytes()
        fresh = (gen_dir / rel).read_bytes()
        assert committed == fresh, f"fixture drift: {rel}"

    rec = fea.run_offline(None)
    for mode in ("local", "api"):
        m = rec["results"][mode]["metrics"]
        assert m["ndcg@10"] >= 0.85, (mode, m)
        assert m["recall@10"] >= 0.95, (mode, m)


def test_fixture_checkpoint_round_trips_hf_names(tmp_path):
    """The fixture checkpoint is written with torch/HF names (bert.*
    prefix, 1_Dense module) and loads through the exact real-checkpoint
    path — a name-mapping regression fails here before it can fail on a
    real download."""
    import numpy as np

    import fetch_eval_assets as fea
    from nextplaid_tpu.encoder import Colbert

    ckpt = tmp_path / "mini"
    fea.write_fixture_checkpoint(ckpt)
    from safetensors.numpy import load_file

    sd = load_file(str(ckpt / "model.safetensors"))
    assert all(k.startswith("bert.") for k in sd)  # prefix-strip exercised
    enc = Colbert(str(ckpt), batch_size=8)
    fea.tokenizer_parity_probe(enc)
    out = enc.encode_documents(["w001 w002 w003"])
    assert out[0].shape[1] == 32
    np.testing.assert_allclose(
        np.linalg.norm(out[0], axis=1), 1.0, rtol=1e-4
    )
