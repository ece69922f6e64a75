"""SDK + CLI tests against a live server (reference python-sdk
test_integration.py / test_cli.py shape)."""

import asyncio
import json

import numpy as np
import pytest

from nextplaid_tpu.client import (
    IndexExistsError,
    IndexNotFoundError,
    NextPlaidClient,
    ValidationError,
)
from tests.test_api import ServerThread, make_docs


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    s = ServerThread(str(tmp_path_factory.mktemp("indices")))
    yield s
    s.stop()


@pytest.fixture(scope="module")
def client(server):
    return NextPlaidClient(server.url)


def test_health_and_errors(client):
    assert client.health()["status"] == "ok"
    with pytest.raises(IndexNotFoundError):
        client.get_index("missing")


def test_sdk_full_flow(client):
    client.create_index("sdk", config={"nbits": 4})
    with pytest.raises(IndexExistsError):
        client.create_index("sdk")
    docs = make_docs(25, seed=11)
    meta = [{"title": f"t{i}", "even": i % 2 == 0} for i in range(25)]
    result = client.add("sdk", docs, meta, batch_size=10)
    assert result["documents_added"] == 25
    assert result["total_documents"] == 25
    assert client.get_index("sdk")["num_documents"] == 25
    assert "sdk" in client.list_indices()

    res = client.search("sdk", [docs[4][:4]], top_k=3)
    assert res["results"][0]["document_ids"][0] == 4
    assert res["results"][0]["metadata"][0]["title"] == "t4"

    res = client.search(
        "sdk", [docs[4][:4]], top_k=5,
        filter_condition="even = ?", filter_parameters=[1],
    )
    assert all(i % 2 == 0 for i in res["results"][0]["document_ids"])

    res = client.keyword_search("sdk", ["t4"], top_k=3)
    assert 4 in res["results"][0]["document_ids"]

    q = client.query_metadata("sdk", "even = ?", [1])
    assert q["count"] == 13
    got = client.get_metadata_by_ids("sdk", document_ids=[2, 0])
    assert [m["title"] for m in got["metadata"]] == ["t2", "t0"]
    client.update_metadata("sdk", "title = ?", {"title": "zz"}, ["t3"])
    assert client.get_metadata_by_ids("sdk", document_ids=[3])["metadata"][0][
        "title"
    ] == "zz"

    ranked = client.rerank(docs[4][:4], [docs[9], docs[4]])
    assert ranked[0]["index"] == 1

    with pytest.raises(ValidationError):
        client.query_metadata("sdk", "title = ?; DROP TABLE x", ["a"])

    deleted = client.delete("sdk", "even = ?", [1], wait=True)
    assert deleted["status"] == "queued"
    assert deleted["num_documents"] == 12
    assert client.get_index("sdk")["num_documents"] == 12
    client.delete_index("sdk")
    assert "sdk" not in client.list_indices()


def test_async_client(server):
    from nextplaid_tpu.client import AsyncNextPlaidClient

    async def flow():
        async with AsyncNextPlaidClient(server.url) as ac:
            assert (await ac.health())["status"] == "ok"
            await ac.create_index("asdk")
            docs = make_docs(8, seed=21)
            res = await ac.add("asdk", docs, [{"k": i} for i in range(8)])
            assert res["total_documents"] == 8
            out = await ac.search("asdk", [docs[2][:4]], top_k=2)
            assert out["results"][0]["document_ids"][0] == 2
            q = await ac.query_metadata("asdk", "k > ?", [5])
            assert q["count"] == 2
            await ac.delete_index("asdk")

    asyncio.run(flow())


def test_cli(server, tmp_path):
    from click.testing import CliRunner

    from nextplaid_tpu.client.cli import cli

    runner = CliRunner()

    def run(*args):
        result = runner.invoke(
            cli, ["--url", server.url, *args], obj={}, catch_exceptions=False
        )
        assert result.exit_code == 0, result.output
        return result.output

    out = run("health")
    assert json.loads(out)["status"] == "ok"
    run("indices", "create", "cliidx", "--nbits", "4")
    assert "cliidx" in json.loads(run("indices", "list"))

    # add via SDK (CLI add needs server-side encoding; no model loaded here)
    NextPlaidClient(server.url).add(
        "cliidx", make_docs(6, seed=31), [{"name": f"n{i}"} for i in range(6)]
    )
    info = json.loads(run("indices", "info", "cliidx"))
    assert info["num_documents"] == 6
    out = json.loads(run("metadata", "count", "cliidx"))
    assert out["count"] == 6
    out = json.loads(
        run("metadata", "query", "cliidx", "name = ?", "-p", "n2")
    )
    assert out["document_ids"] == [2]
    out = json.loads(run("metadata", "get", "cliidx", "--ids", "1,3"))
    assert [m["name"] for m in out["metadata"]] == ["n1", "n3"]
    out = json.loads(run("delete", "cliidx", "name = ?", "-p", "n0"))
    assert out["status"] == "queued"
    assert out["num_documents"] == 5  # --wait default polls to convergence
    run("indices", "delete", "cliidx")


def test_delete_wait_noop_returns_promptly(server):
    """delete(wait=True) with a condition matching nothing must converge on
    count stability, not poll to the timeout (review finding)."""
    import time as _time

    from nextplaid_tpu.client.client import NextPlaidClient

    client = NextPlaidClient(server.url)
    client.create_index("noopdel")
    docs = make_docs(6, seed=77)
    client.add("noopdel", docs, [{"g": i} for i in range(6)])
    deadline = _time.time() + 60
    while _time.time() < deadline:
        if client.get_index("noopdel").get("num_documents") == 6:
            break
        _time.sleep(0.25)
    t0 = _time.time()
    out = client.delete("noopdel", "g = ?", [999], wait=True, timeout=60)
    elapsed = _time.time() - t0
    assert out["num_documents"] == 6
    assert elapsed < 15, f"no-op delete took {elapsed:.1f}s"
    client.delete_index("noopdel")


def test_async_client_full_surface(server):
    """Async SDK mirrors the sync surface (metadata ops, rerank, distinct,
    keyword search, config update) — review found it missing 8 methods."""
    import asyncio

    from nextplaid_tpu.client.async_client import AsyncNextPlaidClient
    from nextplaid_tpu.client.client import NextPlaidClient

    sync = NextPlaidClient(server.url)
    sync.create_index("asurf")
    docs = make_docs(8, seed=91)
    sync.add("asurf", docs, [{"tag": f"t{i % 2}", "n": i} for i in range(8)])
    import time as _t
    deadline = _t.time() + 60
    while _t.time() < deadline:
        if sync.get_index("asurf").get("num_documents") == 8:
            break
        _t.sleep(0.25)

    async def drive():
        async with AsyncNextPlaidClient(server.url) as ac:
            counts = await ac.get_metadata_count("asurf")
            assert counts["count"] == 8
            chk = await ac.check_metadata("asurf", [0, 99])
            assert chk["existing_ids"] == [0] and chk["missing_ids"] == [99]
            got = await ac.get_metadata_by_ids("asurf", document_ids=[2, 1])
            assert [m["n"] for m in got["metadata"]] == [2, 1]
            upd = await ac.update_metadata(
                "asurf", "n = ?", {"tag": "z"}, parameters=[3]
            )
            assert upd["updated"] == 1
            vals = await ac.get_distinct_metadata("asurf", "tag")
            assert set(vals) == {"t0", "t1", "z"}
            kw = await ac.keyword_search("asurf", ["t1"], top_k=5)
            assert kw["results"]
            ranked = await ac.rerank(docs[4][:4], [docs[7], docs[4]])
            assert ranked[0]["index"] == 1
            cfg = await ac.update_index_config("asurf", max_documents=100)
            assert cfg
            meta_all = await ac.get_metadata("asurf")
            assert meta_all
        return True

    assert asyncio.run(drive())
    # Sync distinct too.
    assert set(sync.get_distinct_metadata("asurf", "tag")) == {"t0", "t1", "z"}
    sync.delete_index("asurf")
