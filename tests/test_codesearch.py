"""Code-search tests: parser layers, embed text format, ranking boosts,
and indexer+searcher E2E over a synthetic project (tiny encoder, CPU)."""

import textwrap

import numpy as np
import pytest

from nextplaid_tpu.codesearch import (
    CodeUnit,
    ProjectIndexer,
    Searcher,
    SearchOptions,
    UnitType,
    build_embedding_text,
    detect_language,
    extract_units,
    normalize_path_for_embedding,
)
from nextplaid_tpu.codesearch import ranking

PY_SRC = textwrap.dedent(
    '''
    import os
    from pathlib import Path

    MAX_RETRIES = 3

    def parse_request(data, timeout=5):
        """Parse an incoming request payload."""
        result = {}
        for key in data:
            if key.startswith("x-"):
                continue
            result[key] = normalize(data[key])
        return result

    def normalize(value):
        try:
            return value.strip().lower()
        except AttributeError:
            return value

    class HandlerStack(Exception):
        """Chain of request handlers."""

        def push(self, handler):
            self.handlers.append(handler)
            return parse_request({}, timeout=1)
    '''
)


def test_python_parser_layers(tmp_path):
    f = tmp_path / "handlers.py"
    f.write_text(PY_SRC)
    units = extract_units(f)
    by_name = {u.name: u for u in units}
    assert set(by_name) >= {"parse_request", "normalize", "HandlerStack",
                            "push", "MAX_RETRIES"}
    pr = by_name["parse_request"]
    assert pr.unit_type == UnitType.FUNCTION
    assert pr.docstring == "Parse an incoming request payload."
    assert pr.parameters == ["data", "timeout"]
    assert "normalize" in pr.calls
    assert pr.has_loops and pr.has_branches and not pr.has_error_handling
    assert pr.complexity > 1
    assert "result" in pr.variables
    assert "os" in pr.imports and "pathlib" in pr.imports
    # called_by resolution
    assert "parse_request" in by_name["normalize"].called_by
    nm = by_name["normalize"]
    assert nm.has_error_handling
    # class unit
    hs = by_name["HandlerStack"]
    assert hs.unit_type == UnitType.CLASS
    assert hs.extends == "Exception"
    # method unit
    assert by_name["push"].unit_type == UnitType.METHOD
    assert by_name["push"].parent_class == "HandlerStack"
    assert by_name["push"].qualified_name == "HandlerStack.push"
    # constant
    assert by_name["MAX_RETRIES"].unit_type == UnitType.CONSTANT


def test_generic_parsers(tmp_path):
    js = tmp_path / "api.js"
    js.write_text(
        "import axios from 'axios'\n"
        "export async function fetchUser(id) {\n"
        "  if (!id) { throw new Error('no id') }\n"
        "  const resp = await axios.get(`/u/${id}`)\n"
        "  return resp.data\n"
        "}\n"
        "export class UserStore {\n"
        "  load() { return fetchUser(1) }\n"
        "}\n"
    )
    units = extract_units(js)
    names = {u.name for u in units}
    assert "fetchUser" in names and "UserStore" in names
    fu = next(u for u in units if u.name == "fetchUser")
    assert fu.language == "javascript"
    assert fu.has_branches and fu.has_error_handling
    assert "axios" in fu.imports

    rs = tmp_path / "lib.rs"
    rs.write_text(
        "use std::collections::HashMap;\n"
        "pub struct Cache { map: HashMap<u32, String> }\n"
        "pub fn lookup(cache: &Cache, key: u32) -> Option<&String> {\n"
        "    cache.map.get(&key)\n"
        "}\n"
    )
    units = extract_units(rs)
    names = {u.name for u in units}
    assert "Cache" in names and "lookup" in names

    go = tmp_path / "main.go"
    go.write_text(
        "package main\n"
        "type Server struct { port int }\n"
        "func (s *Server) Start() error {\n"
        "    for {\n        break\n    }\n    return nil\n"
        "}\n"
        "func main() {\n}\n"
    )
    names = {u.name for u in extract_units(go)}
    assert "Server" in names and "Start" in names and "main" in names


def test_markdown_and_raw(tmp_path):
    md = tmp_path / "README.md"
    md.write_text("intro text\n\n# Install\npip install x\n\n# Usage\nrun it\n")
    units = extract_units(md)
    names = [u.name for u in units]
    assert "Install" in names and "Usage" in names
    assert units[0].unit_type in (UnitType.DOCUMENT, UnitType.SECTION)

    cfg = tmp_path / "conf.yaml"
    cfg.write_text("key: value\n" * 30)
    units = extract_units(cfg)
    assert units and units[0].unit_type == UnitType.RAW_CODE

    assert detect_language(tmp_path / "x.unknownext") is None
    assert extract_units(tmp_path / "nope.py") == []


def test_embed_text_format():
    unit = CodeUnit(
        name="parse_request",
        qualified_name="parse_request",
        file="src/http/parse_request.py",
        line=10,
        end_line=20,
        language="python",
        unit_type=UnitType.FUNCTION,
        signature="def parse_request(data, timeout=5)",
        docstring="Parse a request.",
        parameters=["data", "timeout"],
        return_type="dict",
        calls=["normalize"],
        variables=["result"],
        imports=["os"],
        code="def parse_request(...): ...",
    )
    text = build_embedding_text(unit)
    assert text.startswith("Function: parse_request\n")
    assert "Signature: def parse_request(data, timeout=5)" in text
    assert "Description: Parse a request." in text
    assert "Parameters: data, timeout" in text
    assert "Returns: dict" in text
    assert "Calls: normalize" in text
    assert "Variables: result" in text
    assert "Uses: os" in text
    assert "File: src http parse request parse_request.py" in text
    assert text.rstrip().endswith("Code:\ndef parse_request(...): ...")


def test_embed_truncation():
    unit = CodeUnit(
        name="big", qualified_name="big", file="a.py", line=1, end_line=2,
        language="python", unit_type=UnitType.RAW_CODE, code="x" * 20000,
    )
    text = build_embedding_text(unit)
    assert len(text) <= 8 * 1024
    assert text.endswith("[...truncated...]\n")


def test_normalize_path():
    assert (
        normalize_path_for_embedding("src/parser/mod.rs")
        == "src parser mod mod.rs"
    )
    assert (
        normalize_path_for_embedding("my_file_name.py")
        == "my file name my_file_name.py"
    )
    assert (
        normalize_path_for_embedding("MyClassName.java")
        == "my class name MyClassName.java"
    )


def test_ranking_penalties():
    assert ranking.file_path_penalty("src/foo.py") == 1.0
    assert ranking.file_path_penalty("tests/test_foo.py") == pytest.approx(0.3)
    assert ranking.file_path_penalty("foo_test.py") == pytest.approx(0.3)
    assert ranking.file_path_penalty("compat/foo_test.py") == pytest.approx(
        0.09
    )
    assert ranking.file_path_penalty("src/__init__.py") == pytest.approx(0.5)
    p = ranking.file_path_penalty("types/index.d.ts")
    assert 0.5 < p < 1.0
    assert ranking.should_apply_path_penalty("how auth works")
    assert not ranking.should_apply_path_penalty("unit test for foo")


def test_ranking_boosts():
    class Item:
        def __init__(self, name, file, score, unit_type="function"):
            self.name, self.file, self.score = name, file, score
            self.unit_type = unit_type

    items = [
        Item("parse_request", "src/parse_request.py", 1.0),
        Item("other", "src/other.py", 1.0),
    ]
    ranking.apply_definition_boost(
        items, "parseRequest handler",
        lambda i: i.name, lambda i: True,
        lambda i: i.score, lambda i, s: setattr(i, "score", s),
    )
    assert items[0].score > items[1].score

    items = [
        Item("a", "src/parse_request.py", 1.0),
        Item("b", "src/zzz.py", 1.0),
    ]
    ranking.apply_path_stem_boost(
        items, "parse request",
        lambda i: i.file, lambda i: i.score,
        lambda i, s: setattr(i, "score", s),
    )
    assert items[0].score > items[1].score

    items = [
        Item("a", "f1.py", 1.0),
        Item("b", "f1.py", 0.8),
        Item("c", "f2.py", 0.9),
    ]
    ranking.apply_file_coherence_boost(
        items, lambda i: i.file, lambda i: i.score,
        lambda i, s: setattr(i, "score", s),
    )
    assert items[0].score > 1.0  # f1's top unit boosted by file mass


# ---------------------------------------------------------------------------
# E2E: index a synthetic project and search it
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    root = tmp_path_factory.mktemp("proj")
    (root / "src").mkdir()
    (root / "tests").mkdir()
    (root / "src" / "auth.py").write_text(
        textwrap.dedent(
            '''
            def authenticate_user(username, password):
                """Validate a username/password pair against the database."""
                record = load_user(username)
                if record is None:
                    return False
                return check_password(record, password)

            def load_user(username):
                """Fetch one user row."""
                return {"name": username}

            def check_password(record, password):
                """Compare password hashes in constant time."""
                return len(password) > 3
            '''
        )
    )
    (root / "src" / "payments.py").write_text(
        textwrap.dedent(
            '''
            def charge_card(card_number, amount):
                """Charge a credit card via the payment gateway."""
                for attempt in range(3):
                    if gateway_call(card_number, amount):
                        return True
                return False

            def gateway_call(card, amount):
                """Low-level payment gateway RPC."""
                return amount > 0
            '''
        )
    )
    (root / "tests" / "test_auth.py").write_text(
        "def test_authenticate_user():\n    assert True\n"
    )
    return root


@pytest.fixture(scope="module")
def encoder():
    from tests.test_encoder import make_tokenizer
    from nextplaid_tpu.encoder import (
        BackboneConfig,
        Colbert,
        ColbertConfig,
        init_random_params,
    )
    from tokenizers import Tokenizer
    from tokenizers.models import WordPiece
    from tokenizers.pre_tokenizers import Whitespace

    # A character-fallback WordPiece over lowercase letters makes arbitrary
    # code tokens encodable (the WordLevel test tokenizer can't).
    vocab = {"[PAD]": 0, "[CLS]": 1, "[SEP]": 2, "[MASK]": 3, "[UNK]": 4,
             "[Q]": 5, "[D]": 6}
    for i, c in enumerate("abcdefghijklmnopqrstuvwxyz0123456789_"):
        vocab[c] = len(vocab)
        vocab[f"##{c}"] = len(vocab)
    tok = Tokenizer(WordPiece(vocab, unk_token="[UNK]", max_input_chars_per_word=200))
    tok.pre_tokenizer = Whitespace()
    from tokenizers.processors import TemplateProcessing

    tok.post_processor = TemplateProcessing(
        single="[CLS] $A [SEP]",
        special_tokens=[("[CLS]", 1), ("[SEP]", 2)],
    )
    from tokenizers.normalizers import Lowercase

    tok.normalizer = Lowercase()
    bcfg = BackboneConfig(
        model_type="bert", vocab_size=len(vocab), hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=256, projection_dim=16,
    )
    ccfg = ColbertConfig(
        query_prefix="[Q]", document_prefix="[D]", query_length=24,
        document_length=160, embedding_dim=16, mask_token_id=3,
        pad_token_id=0,
    )
    return Colbert(
        config=ccfg, backbone_config=bcfg, tokenizer=tok,
        params=init_random_params(bcfg, seed=0), batch_size=8,
    )


@pytest.fixture(scope="module")
def indexed(project, encoder, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("csidx"))
    indexer = ProjectIndexer(
        str(project), encoder, index_dir=idx_dir, batch_size=16
    )
    stats = indexer.update()
    assert stats["changed"] >= 3
    assert stats["units"] >= 6
    return indexer


def test_index_and_keyword_search(indexed, encoder):
    searcher = Searcher(str(indexed.index_dir), encoder)
    hits = searcher.search("authenticate user password", SearchOptions(top_k=3))
    assert hits
    assert hits[0].file == "src/auth.py"  # test_auth.py penalized
    assert hits[0].name in ("authenticate_user", "check_password", "load_user")


def test_search_filters(indexed, encoder):
    searcher = Searcher(str(indexed.index_dir), encoder)
    hits = searcher.search(
        "payment gateway charge",
        SearchOptions(top_k=5, include_globs=["payments.py"]),
    )
    assert hits and all(h.file.endswith("payments.py") for h in hits)
    hits = searcher.search(
        "anything", SearchOptions(top_k=5, regex=r"gateway_call\(")
    )
    assert hits and all("payments" in h.file for h in hits)
    hits = searcher.search(
        "auth", SearchOptions(top_k=5, exclude_dirs=["tests"])
    )
    assert all(not h.file.startswith("tests/") for h in hits)


def test_incremental_update(indexed, project, encoder):
    before = indexed.status()["units"]
    # Unchanged rescan: no work.
    stats = indexed.update()
    assert stats["changed"] == 0 and stats["deleted"] == 0
    # Add a file.
    (project / "src" / "notify.py").write_text(
        'def send_email(to, body):\n    """Send a notification email."""\n'
        "    return True\n"
    )
    stats = indexed.update()
    assert stats["changed"] == 1
    assert indexed.status()["units"] == before + 1
    searcher = Searcher(str(indexed.index_dir), encoder)
    hits = searcher.search("send notification email", SearchOptions(top_k=3))
    assert any(h.file == "src/notify.py" for h in hits)
    # Delete the file again.
    (project / "src" / "notify.py").unlink()
    stats = indexed.update()
    assert stats["deleted"] == 1
    assert indexed.status()["units"] == before


def test_cgrep_cli(indexed, project, monkeypatch):
    from click.testing import CliRunner

    from nextplaid_tpu.codesearch import cli as cs_cli

    # Wire the CLI to the already-built index + encoder (no model dir here).
    monkeypatch.setattr(
        cs_cli, "_load_encoder", lambda model, batch_size=16: indexed.encoder
    )
    runner = CliRunner()
    result = runner.invoke(
        cs_cli.cli,
        ["--path", str(indexed.project), "--index-dir",
         str(indexed.index_dir), "--no-update", "--json",
         "authenticate user"],
        obj={}, catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    import json

    hits = json.loads(result.output)
    assert hits and hits[0]["file"] == "src/auth.py"

    result = runner.invoke(
        cs_cli.cli,
        ["--path", str(indexed.project), "--index-dir",
         str(indexed.index_dir), "status"],
        obj={}, catch_exceptions=False,
    )
    assert result.exit_code == 0
    result = runner.invoke(
        cs_cli.cli,
        ["--path", str(indexed.project), "--index-dir",
         str(indexed.index_dir), "stats"],
        obj={}, catch_exceptions=False,
    )
    assert result.exit_code == 0
    assert "python" in result.output


def test_cgrep_cli_literal_query_escape(indexed, monkeypatch):
    """`--` forces a literal search even when options precede it
    (`cgrep --json -- update` must search, not self-update; round-3
    review)."""
    import json

    from click.testing import CliRunner

    from nextplaid_tpu.codesearch import cli as cs_cli

    monkeypatch.setattr(
        cs_cli, "_load_encoder", lambda model, batch_size=16: indexed.encoder
    )
    runner = CliRunner()
    for argv in (
        # `--` first vs after options: both must suppress the re-dispatch.
        ["--", "update"],
        ["--no-update", "--json", "--", "update"],
    ):
        result = runner.invoke(
            cs_cli.cli,
            ["--path", str(indexed.project), "--index-dir",
             str(indexed.index_dir), "--no-update", "--json", *argv],
            obj={}, catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
        # A search ran (JSON hit list), not the self-update subcommand.
        json.loads(result.output)
        assert "network" not in result.output.lower()


def test_install_agent(tmp_path):
    from nextplaid_tpu.codesearch.install import (
        hook_snippet_json,
        install_claude_code,
    )

    skill = install_claude_code(str(tmp_path))
    assert skill.exists()
    text = skill.read_text()
    assert "cgrep" in text and str(tmp_path.resolve()) in text
    import json

    snippet = json.loads(hook_snippet_json())
    assert "hooks" in snippet


def test_more_language_extraction(tmp_path):
    cases = {
        "m.rb": ("class Parser\n  def parse_line(line)\n    line.strip\n  end\nend\n",
                 {"Parser", "parse_line"}),
        "A.java": ("public class Handler {\n"
                   "  public String handleRequest(String req) {\n"
                   "    return req;\n  }\n}\n",
                   {"Handler", "handleRequest"}),
        "k.kt": ("class Store {\n}\nfun loadConfig(path: String): Config {\n"
                 "    return Config(path)\n}\n",
                 {"Store", "loadConfig"}),
        "s.swift": ("struct Point {\n}\nfunc distance(a: Point) -> Double {\n"
                    "    return 0\n}\n",
                    {"Point", "distance"}),
        "p.php": ("<?php\nclass Router {\n"
                  "  public function dispatch($req) { return $req; }\n}\n",
                  {"Router", "dispatch"}),
        "l.lua": ("function compute_sum(a, b)\n  return a + b\nend\n",
                  {"compute_sum"}),
        "sh.sh": ("deploy_app() {\n  echo hi\n}\n", {"deploy_app"}),
        "c.c": ("int add_numbers(int a, int b) {\n  return a + b;\n}\n",
                {"add_numbers"}),
        "cs.cs": ("public class Service {\n"
                  "  public int GetCount() { return 1; }\n}\n",
                  {"Service", "GetCount"}),
        "sc.scala": ("object Main {\n  def run(): Unit = {}\n}\n",
                     {"Main", "run"}),
    }
    for fname, (src, expected) in cases.items():
        f = tmp_path / fname
        f.write_text(src)
        names = {u.name for u in extract_units(f)}
        assert expected <= names, (fname, expected, names)


# ---------------------------------------------------------------------------
# E2E over a mixed-language tree (round-3 grammars: lua/julia/elixir/sql/vue)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def polyglot_project(tmp_path_factory):
    root = tmp_path_factory.mktemp("poly")
    (root / "geo.lua").write_text(
        "-- Vector length helper.\n"
        "local function vector_length(v)\n"
        "  local total = 0\n"
        "  for i = 1, #v do total = total + v[i] * v[i] end\n"
        "  return math.sqrt(total)\n"
        "end\n"
        "return vector_length\n"
    )
    (root / "stats.jl").write_text(
        "module Stats\n\n"
        "function moving_average(xs, window)\n"
        "    out = similar(xs)\n"
        "    for i in eachindex(xs)\n"
        "        lo = max(1, i - window)\n"
        "        out[i] = sum(xs[lo:i]) / (i - lo + 1)\n"
        "    end\n"
        "    return out\n"
        "end\n\n"
        "end\n"
    )
    (root / "mailer.ex").write_text(
        "defmodule Mailer do\n"
        "  def send_welcome_email(user) do\n"
        "    deliver(user.email, \"welcome\")\n"
        "  end\n\n"
        "  defp deliver(addr, subject) do\n"
        "    {:ok, addr, subject}\n"
        "  end\n"
        "end\n"
    )
    (root / "schema.sql").write_text(
        "CREATE TABLE invoices (\n"
        "    id BIGSERIAL PRIMARY KEY,\n"
        "    amount_cents BIGINT NOT NULL\n"
        ");\n\n"
        "CREATE OR REPLACE FUNCTION total_revenue()\n"
        "RETURNS BIGINT AS $$\n"
        "  SELECT sum(amount_cents) FROM invoices;\n"
        "$$ LANGUAGE sql;\n"
    )
    (root / "Counter.vue").write_text(
        "<template><button @click=\"increment\">+</button></template>\n"
        "<script>\n"
        "function increment_counter(state) {\n"
        "  state.count += 1\n"
        "}\n"
        "</script>\n"
    )
    return root


def test_mixed_language_tree_e2e(polyglot_project, encoder, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("polyidx"))
    indexer = ProjectIndexer(
        str(polyglot_project), encoder, index_dir=idx_dir, batch_size=16
    )
    stats = indexer.update()
    assert stats["changed"] == 5

    from nextplaid_tpu import filtering

    rows = filtering.get(str(indexer.index_dir))
    langs = {r.get("language") for r in rows}
    assert {"lua", "julia", "elixir", "sql"} <= langs
    by_name = {r.get("name"): r for r in rows}
    # Structural names (not regex fallbacks) for every language.
    assert by_name["vector_length"]["language"] == "lua"
    assert by_name["moving_average"]["language"] == "julia"
    assert by_name["send_welcome_email"]["unit_type"] == "method"
    assert by_name["total_revenue"]["language"] == "sql"
    assert by_name["invoices"]["unit_type"] == "class"
    # Vue script block parsed as JS with host-file line numbers.
    inc = by_name["increment_counter"]
    assert inc["language"] == "javascript"
    assert inc["line"] == 3

    searcher = Searcher(str(indexer.index_dir), encoder)
    hits = searcher.search(
        "compute vector length euclidean norm", SearchOptions(top_k=3)
    )
    assert hits
