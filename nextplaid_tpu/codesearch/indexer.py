"""Incremental project indexer for code search.

Rebuild of the reference's IndexBuilder
(/root/reference/colgrep/src/index/mod.rs:1053-1755, state.rs):

  - scan the project respecting ignore rules (.gitignore-style dir skips,
    binary/size filters);
  - change detection: (mtime_ns, size) fast path, then content hash
    (state.rs:38-50 — xxh3 there, blake2b here);
  - parse changed files -> code units -> embedding texts -> encoder ->
    `update_or_create_with_metadata` (vectors + SQLite + FTS5 in one call,
    identifier-aware tokenizer);
  - per-(project, model) index directories under an XDG-style cache root
    (paths.rs), `state.json` with per-file info + dirty flag for startup
    repair; INDEX_FORMAT_VERSION discard-and-rebuild.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

from nextplaid_tpu import filtering
from nextplaid_tpu.codesearch.embed import build_embedding_text
from nextplaid_tpu.codesearch.parser import extract_units
from nextplaid_tpu.codesearch.types import CodeUnit, detect_language
from nextplaid_tpu.index.config import IndexConfig
from nextplaid_tpu.index.delete import delete_with_options
from nextplaid_tpu.index.update import (
    UpdateConfig,
    update_or_create_with_metadata,
)
from nextplaid_tpu.storage.npy import atomic_write_json, load_json

INDEX_FORMAT_VERSION = 2

SKIP_DIRS = frozenset(
    {
        ".git", ".hg", ".svn", "node_modules", "__pycache__", ".venv",
        "venv", ".tox", "target", "build", "dist", ".cache", ".idea",
        ".vscode", ".mypy_cache", ".pytest_cache", ".ruff_cache",
        "vendor", ".next", ".terraform", ".eggs",
    }
)
MAX_FILE_BYTES = 2 * 1024 * 1024


def cache_root() -> Path:
    base = os.environ.get("XDG_CACHE_HOME") or str(Path.home() / ".cache")
    return Path(base) / "nextplaid_tpu" / "codesearch"


def resolve_worktree_main(project: Path) -> Path:
    """Map a git worktree to its main working tree so all worktrees of a repo
    share one index (reference colgrep/src/index/worktree.rs)."""
    git = project / ".git"
    try:
        if git.is_file():
            # Linked worktree: .git is a file "gitdir: <main>/.git/worktrees/x"
            line = git.read_text().strip()
            if line.startswith("gitdir:"):
                gitdir = Path(line.split(":", 1)[1].strip())
                if "worktrees" in gitdir.parts:
                    i = gitdir.parts.index("worktrees")
                    common = Path(*gitdir.parts[:i])  # <main>/.git
                    return common.parent
    except OSError:
        pass
    return project


def project_index_dir(project: Path, model_id: str = "default") -> Path:
    root = resolve_worktree_main(project.resolve())
    key = hashlib.blake2b(
        f"{root}::{model_id}".encode(), digest_size=12
    ).hexdigest()
    return cache_root() / f"{root.name}-{key}"


def _hash_content(data: bytes) -> str:
    return hashlib.blake2b(data, digest_size=16).hexdigest()


class ProjectIndexer:
    """Scans a project tree and keeps its code-search index current."""

    def __init__(
        self,
        project: str,
        encoder,
        index_dir: Optional[str] = None,
        model_id: str = "default",
        batch_size: int = 32,
    ):
        self.project = Path(project).resolve()
        self.encoder = encoder
        self.index_dir = Path(
            index_dir or project_index_dir(self.project, model_id)
        )
        self.index_dir.mkdir(parents=True, exist_ok=True)
        self.batch_size = batch_size
        self.state_path = self.index_dir / "state.json"
        self.state = self._load_state()

    # -- state -----------------------------------------------------------------

    def _load_state(self) -> Dict:
        if self.state_path.exists():
            try:
                state = load_json(self.state_path)
                if state.get("format_version") == INDEX_FORMAT_VERSION:
                    return state
            except (json.JSONDecodeError, OSError):
                pass
        return {
            "format_version": INDEX_FORMAT_VERSION,
            "files": {},  # rel_path -> {mtime_ns, size, hash, doc_ids}
            "dirty": False,
        }

    def _save_state(self) -> None:
        atomic_write_json(self.state_path, self.state)

    # -- scan ------------------------------------------------------------------

    def scan_files(self) -> List[Path]:
        out: List[Path] = []
        for root, dirs, files in os.walk(self.project):
            dirs[:] = [
                d for d in dirs if d not in SKIP_DIRS and not d.startswith(".")
            ]
            for f in files:
                p = Path(root) / f
                if detect_language(p) is None:
                    continue
                try:
                    if p.stat().st_size > MAX_FILE_BYTES:
                        continue
                except OSError:
                    continue
                out.append(p)
        return sorted(out)

    def detect_changes(
        self, files: Iterable[Path]
    ) -> Tuple[List[Path], List[str]]:
        """(changed_or_new_files, deleted_rel_paths) via mtime+size fast path
        then content hash (reference state.rs:38-50)."""
        known = self.state["files"]
        seen = set()
        changed: List[Path] = []
        for p in files:
            rel = str(p.relative_to(self.project))
            seen.add(rel)
            try:
                st = p.stat()
            except OSError:
                continue
            info = known.get(rel)
            if (
                info
                and info["mtime_ns"] == st.st_mtime_ns
                and info["size"] == st.st_size
            ):
                continue
            content_hash = _hash_content(p.read_bytes())
            if info and info["hash"] == content_hash:
                info["mtime_ns"] = st.st_mtime_ns
                info["size"] = st.st_size
                continue
            changed.append(p)
        deleted = [rel for rel in known if rel not in seen]
        return changed, deleted

    # -- update ----------------------------------------------------------------

    def update(self, progress=None) -> Dict[str, int]:
        """Bring the index up to date; returns counters."""
        files = self.scan_files()
        changed, deleted = self.detect_changes(files)
        stats = {
            "scanned": len(files),
            "changed": len(changed),
            "deleted": len(deleted),
            "units": 0,
        }
        if not changed and not deleted:
            return stats

        self.state["dirty"] = True
        self._save_state()

        # Delete units of removed + changed files first (their doc ids shift
        # survivors; state doc_ids are rebuilt from metadata afterwards).
        stale_ids: List[int] = []
        for rel in deleted:
            stale_ids.extend(self.state["files"].pop(rel)["doc_ids"])
        for p in changed:
            rel = str(p.relative_to(self.project))
            if rel in self.state["files"]:
                stale_ids.extend(self.state["files"][rel]["doc_ids"])
        if stale_ids:
            delete_with_options(sorted(set(stale_ids)), str(self.index_dir))
            self._rebuild_doc_ids_from_db()

        # Parse + embed + index the changed files in batches.
        pending_units: List[CodeUnit] = []
        pending_files: List[Tuple[str, int, int]] = []  # (rel, start, n)
        for p in changed:
            rel = str(p.relative_to(self.project))
            units = extract_units(p)
            for u in units:
                u.file = rel
            pending_files.append((rel, len(pending_units), len(units)))
            pending_units.extend(units)
            stats["units"] += len(units)

        # Encode in bounded batches but ingest ONCE: per-batch ingestion
        # re-triggered the start-from-scratch rebuild for every batch on
        # small indexes (O(batches) full rebuilds).
        embeddings = []
        for start in range(0, len(pending_units), self.batch_size):
            batch = pending_units[start : start + self.batch_size]
            texts = [build_embedding_text(u) for u in batch]
            embeddings.extend(self.encoder.encode_documents(texts))
            if progress:
                progress(min(start + self.batch_size, len(pending_units)),
                         len(pending_units))
        doc_ids: List[int] = []
        if embeddings:
            doc_ids = update_or_create_with_metadata(
                embeddings,
                str(self.index_dir),
                IndexConfig(fts_tokenizer="identifier_aware"),
                UpdateConfig(),
                [u.to_metadata() for u in pending_units],
            )

        for rel, start, n in pending_files:
            p = self.project / rel
            st = p.stat()
            self.state["files"][rel] = {
                "mtime_ns": st.st_mtime_ns,
                "size": st.st_size,
                "hash": _hash_content(p.read_bytes()),
                "doc_ids": doc_ids[start : start + n],
            }

        self.state["dirty"] = False
        self.state["updated_at"] = time.time()
        self._save_state()
        return stats

    def _rebuild_doc_ids_from_db(self) -> None:
        """After deletes re-sequence ids, re-derive each file's doc ids from
        the metadata table (the authoritative file column)."""
        rows = filtering.get(str(self.index_dir))
        by_file: Dict[str, List[int]] = {}
        for row in rows:
            by_file.setdefault(row.get("file", ""), []).append(
                int(row["_subset_"])
            )
        for rel, info in self.state["files"].items():
            info["doc_ids"] = by_file.get(rel, [])

    def clear(self) -> None:
        import shutil

        shutil.rmtree(self.index_dir, ignore_errors=True)
        self.index_dir.mkdir(parents=True, exist_ok=True)
        self.state = self._load_state()

    def status(self) -> Dict:
        return {
            "project": str(self.project),
            "index_dir": str(self.index_dir),
            "files": len(self.state["files"]),
            "units": filtering.count(str(self.index_dir)),
            "dirty": self.state.get("dirty", False),
        }
