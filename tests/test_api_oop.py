"""Out-of-process API test tier (VERDICT r4 next #9).

The reference runs two API test tiers: in-process (integration_tests.rs)
and out-of-process — a separately launched server binary driven over real
HTTP (scripts/run-api-tests.sh -> next-plaid-api/tests/test_api.py). This
file is the second tier: it launches `next-plaid-server` (the installed
console script's module) as a SUBPROCESS and runs the SDK battery against
it, covering everything an in-process harness can mask: real process
bootstrap, argparse, port binding, signal shutdown, cross-process index
persistence.

Select with `pytest -m oop` (also runs in the default suite).
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.oop

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def oop_server(tmp_path_factory):
    index_dir = tmp_path_factory.mktemp("oop_indices")
    port = _free_port()
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "nextplaid_tpu.api.server",
            "--host", "127.0.0.1", "--port", str(port),
            "--index-dir", str(index_dir),
            "--platform", "cpu",
        ],
        env=env,
        cwd=str(REPO),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    import requests

    url = f"http://127.0.0.1:{port}"
    deadline = time.monotonic() + 60
    last = None
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode(errors="replace")
            raise RuntimeError(f"server exited rc={proc.returncode}: {out}")
        try:
            r = requests.get(url + "/health", timeout=2)
            if r.status_code == 200:
                break
        except Exception as e:
            last = e
        time.sleep(0.25)
    else:
        proc.kill()
        raise RuntimeError(f"server never became healthy: {last}")
    yield {"url": url, "proc": proc, "index_dir": index_dir}
    if proc.poll() is None:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()


def _make_docs(n, dim=48, tokens=10, seed=0):
    rng = np.random.default_rng(seed)
    docs = []
    for _ in range(n):
        v = rng.standard_normal((tokens, dim)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        docs.append(v)
    return docs


def test_oop_sdk_battery(oop_server):
    """The SDK battery over real HTTP against the subprocess server:
    lifecycle, ingest+metadata, semantic/keyword/hybrid/filtered search,
    delete-by-condition, index deletion."""
    from nextplaid_tpu.client import NextPlaidClient

    c = NextPlaidClient(oop_server["url"], timeout=120.0)
    assert c.health()["status"] in ("ok", "healthy")

    docs = _make_docs(24)
    meta = [{"title": f"doc {i}", "grp": i % 2} for i in range(24)]
    c.create_index("battery", config={"nbits": 4})
    c.add("battery", docs, metadata=meta)
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if c.get_index("battery").get("num_documents") == 24:
            break
        time.sleep(0.3)
    assert c.get_index("battery")["num_documents"] == 24

    q = docs[5][:4]
    r = c.search("battery", [q], top_k=5)
    assert r["results"][0]["document_ids"][0] == 5
    assert r["results"][0]["metadata"][0]["title"] == "doc 5"

    # Recall-targeted profile over HTTP.
    r = c.search("battery", [q], top_k=5, params={"profile": "quality"})
    assert r["results"][0]["document_ids"][0] == 5

    # Filtered search respects the subset.
    r = c.search(
        "battery", [q], top_k=5,
        filter_condition='"grp" = ?', filter_parameters=[0],
    )
    ids = r["results"][0]["document_ids"]
    assert ids and all(i % 2 == 0 for i in ids)

    # Keyword + hybrid.
    r = c.keyword_search("battery", ["doc 7"], top_k=3)
    assert 7 in r["results"][0]["document_ids"]
    r = c.search("battery", [q], top_k=5, text_query=["doc 5"],
                 fusion="rrf")
    assert r["results"][0]["document_ids"][0] == 5

    # Metadata endpoints.
    assert c.get_metadata_count("battery")["count"] == 24
    rows = c.query_metadata("battery", '"grp" = ?', [1])
    assert rows["count"] == 12
    assert all(i % 2 == 1 for i in rows["document_ids"])

    # Delete by condition (async 202 + settle).
    c.delete("battery", '"grp" = ?', [1])
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if c.get_index("battery").get("num_documents") == 12:
            break
        time.sleep(0.3)
    assert c.get_index("battery")["num_documents"] == 12

    # The index persists on disk for a future process (storage truth).
    idx_path = Path(oop_server["index_dir"]) / "battery"
    assert (idx_path / "metadata.json").exists()
    meta_json = json.loads((idx_path / "metadata.json").read_text())
    assert meta_json["num_documents"] == 12

    c.delete_index("battery")
    assert "battery" not in c.list_indices()


def test_oop_graceful_shutdown(tmp_path):
    """SIGTERM ends the subprocess cleanly (reference main.rs:262-288
    graceful shutdown)."""
    port = _free_port()
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "nextplaid_tpu.api.server",
            "--host", "127.0.0.1", "--port", str(port),
            "--index-dir", str(tmp_path),
            "--platform", "cpu",
        ],
        env=env, cwd=str(REPO),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    import requests

    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        try:
            if requests.get(
                f"http://127.0.0.1:{port}/health", timeout=2
            ).status_code == 200:
                break
        except Exception:
            time.sleep(0.25)
    proc.send_signal(signal.SIGTERM)
    assert proc.wait(timeout=20) is not None


def test_compose_files_are_valid_yaml():
    """Docker packaging syntax check (docker itself is absent from this
    image; the reference's compose files get the same class of CI check)."""
    yaml = pytest.importorskip("yaml")
    for name in ("docker-compose.yml", "docker-compose.tpu.yml"):
        doc = yaml.safe_load((REPO / name).read_text())
        assert "services" in doc
        svc = doc["services"]["nextplaid-tpu-api"]
        assert svc
    base = (REPO / "docker" / "Dockerfile").read_text()
    assert "runtime-cpu" in base and "runtime-tpu" in base
    assert "next-plaid-server" in base
