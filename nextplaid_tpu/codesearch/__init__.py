"""Semantic code search (reference: /root/reference/colgrep)."""

from nextplaid_tpu.codesearch.embed import (  # noqa: F401
    build_embedding_text,
    normalize_path_for_embedding,
    shorten_path,
)
from nextplaid_tpu.codesearch.indexer import ProjectIndexer  # noqa: F401
from nextplaid_tpu.codesearch.parser import extract_units  # noqa: F401
from nextplaid_tpu.codesearch.searcher import (  # noqa: F401
    Searcher,
    SearchHit,
    SearchOptions,
)
from nextplaid_tpu.codesearch.types import (  # noqa: F401
    CodeUnit,
    UnitType,
    detect_language,
)
