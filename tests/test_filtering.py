"""Metadata filtering tests, modeled on the reference's colocated tests
(filtering.rs:2697-3740) and filtering_integration.rs."""

import sqlite3

import pytest

from nextplaid_tpu import filtering
from nextplaid_tpu.filtering.conditions import (
    is_valid_column_name,
    validate_condition,
)
from nextplaid_tpu.utils.errors import FilteringError

COLS = {"name", "category", "score", "age", "city", "code"}


# ---------------------------------------------------------------------------
# Condition validator
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "cond",
    [
        "name = ?",
        "score > ? AND age <= ?",
        "category = ? OR (score >= ? AND NOT city = ?)",
        "name LIKE ?",
        "code REGEXP ?",
        "score BETWEEN ? AND ?",
        "score NOT BETWEEN ? AND ?",
        "category IN (?, ?, ?)",
        "category NOT IN (?)",
        "city IS NULL",
        "city IS NOT NULL",
        '"name" = ?',
        "NAME = ?",  # case-insensitive column match
        "1=1",
        "0 = 0",
    ],
)
def test_validator_accepts(cond):
    validate_condition(cond, COLS)


@pytest.mark.parametrize(
    "cond",
    [
        "name = 'alice'",  # string literal
        "score > 5",  # numeric literal (non-idiom)
        "name = ?; DROP TABLE METADATA",  # semicolon
        "name = ? -- comment",
        "name = ? /* c */",
        "1=1 UNION SELECT * FROM sqlite_master",
        "unknown_col = ?",
        "name = (SELECT 1)",
        "lower(name) = ?",  # function call
        "name =",
        "AND name = ?",
        "name = ? OR",
        "name IN (?,)",
        "name BETWEEN ?",
    ],
)
def test_validator_rejects(cond):
    with pytest.raises(FilteringError):
        validate_condition(cond, COLS)


def test_valid_column_names():
    assert is_valid_column_name("abc")
    assert is_valid_column_name("_x1")
    assert not is_valid_column_name("1abc")
    assert not is_valid_column_name("a-b")
    assert not is_valid_column_name("a b")
    assert not is_valid_column_name("")


# ---------------------------------------------------------------------------
# Store operations
# ---------------------------------------------------------------------------


@pytest.fixture
def store(tmp_path):
    path = str(tmp_path / "idx")
    rows = [
        {"name": "Alice", "category": "A", "score": 95, "code": "fn alpha() {}"},
        {"name": "Bob", "category": "B", "score": 87, "code": "fn beta() {}"},
        {"name": "Carol", "category": "A", "score": 73, "code": "fn gamma() {}"},
        {"name": "Dave", "category": "C", "score": 60, "code": "fn delta() {}"},
    ]
    filtering.create(path, rows, list(range(len(rows))))
    return path


def test_create_and_count(store):
    assert filtering.exists(store)
    assert filtering.count(store) == 4


def test_create_uses_v2_split_layout(store):
    conn = sqlite3.connect(f"file:{store}/metadata.db?mode=ro", uri=True)
    assert conn.execute("PRAGMA user_version").fetchone()[0] == 2
    tables = {
        r[0]
        for r in conn.execute("SELECT name FROM sqlite_master WHERE type='table'")
    }
    assert "METADATA" in tables and "METADATA_CONTENT" in tables
    # `code` is a fat column, `name` thin.
    thin = [r[1] for r in conn.execute("PRAGMA table_info(METADATA)")]
    fat = [r[1] for r in conn.execute("PRAGMA table_info(METADATA_CONTENT)")]
    assert "name" in thin and "code" not in thin
    assert "code" in fat
    conn.close()


def test_where_condition(store):
    assert filtering.where_condition(store, "category = ?", ["A"]) == [0, 2]
    assert filtering.where_condition(store, "score > ?", [80]) == [0, 1]
    assert filtering.where_condition(
        store, "category = ? AND score > ?", ["A", 80]
    ) == [0]
    # Fat-column condition goes through the JOIN path.
    assert filtering.where_condition(store, "code LIKE ?", ["%beta%"]) == [1]


def test_where_condition_regexp(store):
    assert filtering.where_condition_regexp(store, "code REGEXP ?", ["a..ha"]) == [0]
    assert filtering.where_condition_regexp(
        store, "name REGEXP ?", ["^(A|B)"]
    ) == [0, 1]
    with pytest.raises(FilteringError):
        filtering.where_condition_regexp(store, "name REGEXP ?", ["("])


def test_get_all_and_by_subset(store):
    rows = filtering.get(store)
    assert len(rows) == 4
    assert rows[0]["name"] == "Alice"
    assert rows[0]["code"] == "fn alpha() {}"
    assert rows[0]["_subset_"] == 0
    # subset order is preserved
    rows = filtering.get(store, subset=[2, 0])
    assert [r["name"] for r in rows] == ["Carol", "Alice"]
    with pytest.raises(FilteringError):
        filtering.get(store, condition="name = ?", subset=[0])


def test_get_with_condition(store):
    rows = filtering.get(store, condition="score >= ?", parameters=[80])
    assert [r["name"] for r in rows] == ["Alice", "Bob"]


def test_update_adds_rows_and_columns(store):
    filtering.update(store, [{"name": "Eve", "stars": 5}], [4])
    assert filtering.count(store) == 5
    rows = filtering.get(store, subset=[4])
    assert rows[0]["name"] == "Eve"
    assert rows[0]["stars"] == 5
    # Old rows read NULL for the new column.
    assert filtering.get(store, subset=[0])[0]["stars"] is None


def test_delete_resequences_dense(store):
    deleted = filtering.delete(store, [1])
    assert deleted == 1
    assert filtering.count(store) == 3
    rows = filtering.get(store)
    assert [r["_subset_"] for r in rows] == [0, 1, 2]
    assert [r["name"] for r in rows] == ["Alice", "Carol", "Dave"]


def test_delete_multiple_and_out_of_range(store):
    deleted = filtering.delete(store, [0, 2, 99, -5])
    assert deleted == 2
    rows = filtering.get(store)
    assert [r["_subset_"] for r in rows] == [0, 1]
    assert [r["name"] for r in rows] == ["Bob", "Dave"]


def test_update_where(store):
    n = filtering.update_where(store, "category = ?", ["A"], {"score": 0})
    assert n == 2
    rows = filtering.get(store, condition="category = ?", parameters=["A"])
    assert all(r["score"] == 0 for r in rows)
    with pytest.raises(FilteringError):
        filtering.update_where(store, "category = ?", ["A"], {"_subset_": 9})
    with pytest.raises(FilteringError):
        filtering.update_where(store, "category = ?", ["A"], {"nope": 1})


def test_update_where_fat_column(store):
    n = filtering.update_where(store, "name = ?", ["Bob"], {"code": "fn b2() {}"})
    assert n == 1
    assert filtering.get(store, subset=[1])[0]["code"] == "fn b2() {}"


def test_get_distinct_strings(store):
    vals = sorted(filtering.get_distinct_strings(store, "category"))
    assert vals == ["A", "B", "C"]
    assert filtering.get_distinct_strings(store, "nonexistent") == []
    with pytest.raises(FilteringError):
        filtering.get_distinct_strings(store, "bad-name")


def test_create_replaces_existing(store):
    filtering.create(store, [{"name": "Solo"}], [0])
    assert filtering.count(store) == 1
    assert filtering.get(store)[0]["name"] == "Solo"


def test_empty_metadata_objects(tmp_path):
    path = str(tmp_path / "idx2")
    filtering.create(path, [{}, {}], [0, 1])
    assert filtering.count(path) == 2
    assert [r["_subset_"] for r in filtering.get(path)] == [0, 1]


def test_missing_db_behaviors(tmp_path):
    path = str(tmp_path / "none")
    assert not filtering.exists(path)
    assert filtering.count(path) == 0
    assert filtering.get(path) == []
    assert filtering.delete(path, [0]) == 0
    with pytest.raises(FilteringError):
        filtering.where_condition(path, "name = ?", ["x"])


def test_nested_values_stored_as_json(store):
    filtering.update(store, [{"name": "Eve", "tags": ["x", "y"]}], [4])
    row = filtering.get(store, subset=[4])[0]
    assert row["tags"] == '["x", "y"]'


def test_v0_schema_migrates_on_delete(tmp_path):
    """A legacy v0 DB (rowid-PK _subset_) migrates to v1 on first delete and
    resequences correctly (filtering.rs:792-877, 3580)."""
    path = str(tmp_path / "legacy")
    (tmp_path / "legacy").mkdir()
    db = sqlite3.connect(str(tmp_path / "legacy" / "metadata.db"))
    db.execute(
        'CREATE TABLE METADATA ("_subset_" INTEGER PRIMARY KEY, '
        '"name" TEXT, "code" TEXT)'
    )
    for i in range(6):
        db.execute(
            "INSERT INTO METADATA VALUES (?, ?, ?)",
            (i, f"n{i}", f"fn f{i}() {{}}"),
        )
    db.execute("PRAGMA user_version=0")
    db.commit()
    db.close()

    # Reads work on the legacy layout.
    assert filtering.count(path) == 6
    assert filtering.where_condition(path, "name = ?", ["n2"]) == [2]

    # Delete migrates to v1 (demoted indexed column) and resequences.
    assert filtering.delete(path, [1, 3]) == 2
    conn = sqlite3.connect(f"file:{path}/metadata.db?mode=ro", uri=True)
    assert conn.execute("PRAGMA user_version").fetchone()[0] == 1
    pk_cols = [r[1] for r in conn.execute("PRAGMA table_info(METADATA)") if r[5]]
    assert "_subset_" not in pk_cols  # demoted from rowid PK
    conn.close()
    rows = filtering.get(path)
    assert [r["_subset_"] for r in rows] == [0, 1, 2, 3]
    assert [r["name"] for r in rows] == ["n0", "n2", "n4", "n5"]


@pytest.mark.parametrize(
    "cond",
    [
        "name NOT LIKE ?",
        "code NOT REGEXP ?",
        "score NOT IN (?, ?)",
        'NOT "name" = ?',
        "(name = ?) AND (score > ? OR city IS NULL)",
    ],
)
def test_validator_accepts_not_forms(cond):
    validate_condition(cond, COLS)
