"""Code-unit extraction.

Replaces the reference's tree-sitter 5-layer parser
(/root/reference/colgrep/src/parser/) with what this environment provides:

  - Python: full 5-layer extraction via the stdlib `ast` module (signature,
    docstring, params, returns, inheritance, per-function call lists,
    control-flow complexity, assigned variables, imports);
  - JS/TS, Go, Rust, Java, C/C++, C#, Ruby: token-level structural parser
    (structparse.py) — a language-aware lexer (comments/strings as single
    tokens) + per-language definition recognizers with brace/`end`-matched
    block extents, bracket-matched parameter lists, adjacent-comment
    docstrings, and token-stream call/control-flow/variable analysis
    (layers 1-4 for real, not regex-approximated);
  - other brace/indent languages (PHP, Swift, Kotlin, Scala, Lua, shell):
    regex-anchored definitions with block-scoped source capture — layers
    1-4 approximated, layer 5 via import-line scans;
  - markdown/text: heading-delimited Section units;
  - anything else: fixed-size RawCode chunks so every file is searchable.

tree-sitter grammars are not available in this image; both layers keep the
*unit boundaries and metadata schema* identical so the index format,
ranking and display paths match the reference. Call-graph `called_by` edges
are resolved across units per file, as in parser/call_graph.rs.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path
from typing import Dict, List, Optional

from nextplaid_tpu.codesearch.types import CodeUnit, UnitType, detect_language

MAX_RAW_CHUNK_LINES = 60
MAX_FILE_BYTES = 2 * 1024 * 1024  # skip giant files, like the reference


# ---------------------------------------------------------------------------
# Python (stdlib ast — full 5 layers)
# ---------------------------------------------------------------------------


def _py_complexity(node: ast.AST) -> tuple:
    """(complexity, has_loops, has_branches, has_error_handling)."""
    complexity, loops, branches, errors = 1, False, False, False
    for n in ast.walk(node):
        if isinstance(n, (ast.If, ast.IfExp)):
            complexity += 1
            branches = True
        elif isinstance(n, (ast.For, ast.While, ast.AsyncFor)):
            complexity += 1
            loops = True
        elif isinstance(n, (ast.Try, ast.ExceptHandler, ast.Raise)):
            errors = True
            if isinstance(n, ast.ExceptHandler):
                complexity += 1
        elif isinstance(n, (ast.BoolOp, ast.Match)):
            complexity += 1
            branches = True
    return complexity, loops, branches, errors


def _py_calls(node: ast.AST) -> List[str]:
    out, seen = [], set()
    for n in ast.walk(node):
        if isinstance(n, ast.Call):
            f = n.func
            name = None
            if isinstance(f, ast.Name):
                name = f.id
            elif isinstance(f, ast.Attribute):
                name = f.attr
            if name and name not in seen:
                seen.add(name)
                out.append(name)
    return out[:30]


def _py_variables(node: ast.AST) -> List[str]:
    out, seen = [], set()
    for n in ast.walk(node):
        targets = []
        if isinstance(n, ast.Assign):
            targets = n.targets
        elif isinstance(n, (ast.AnnAssign, ast.AugAssign)):
            targets = [n.target]
        for t in targets:
            for leaf in ast.walk(t):
                if isinstance(leaf, ast.Name) and leaf.id not in seen:
                    seen.add(leaf.id)
                    out.append(leaf.id)
    return out[:30]


def _py_signature(node, source_lines: List[str]) -> str:
    line = source_lines[node.lineno - 1].strip() if source_lines else ""
    return line.rstrip(":")


def _parse_python(path: str, content: str) -> List[CodeUnit]:
    try:
        tree = ast.parse(content)
    except SyntaxError:
        return _parse_raw(path, content, "python")
    lines = content.splitlines()
    module_imports: List[str] = []
    for n in ast.walk(tree):
        if isinstance(n, ast.Import):
            module_imports.extend(a.name.split(".")[0] for a in n.names)
        elif isinstance(n, ast.ImportFrom) and n.module:
            module_imports.append(n.module.split(".")[0])
    module_imports = list(dict.fromkeys(module_imports))[:20]

    units: List[CodeUnit] = []

    def segment(node) -> str:
        return "\n".join(lines[node.lineno - 1 : node.end_lineno])

    def add_function(node, parent_class: Optional[str]) -> None:
        params = [a.arg for a in node.args.args if a.arg not in ("self", "cls")]
        ret = ast.unparse(node.returns) if node.returns else None
        comp, loops, branches, errors = _py_complexity(node)
        qualified = (
            f"{parent_class}.{node.name}" if parent_class else node.name
        )
        units.append(
            CodeUnit(
                name=node.name,
                qualified_name=qualified,
                file=path,
                line=node.lineno,
                end_line=node.end_lineno or node.lineno,
                language="python",
                unit_type=UnitType.METHOD if parent_class else UnitType.FUNCTION,
                signature=_py_signature(node, lines),
                docstring=ast.get_docstring(node),
                parameters=params,
                return_type=ret,
                parent_class=parent_class,
                calls=_py_calls(node),
                complexity=comp,
                has_loops=loops,
                has_branches=branches,
                has_error_handling=errors,
                variables=_py_variables(node),
                imports=module_imports,
                code=segment(node),
            )
        )

    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            add_function(node, None)
        elif isinstance(node, ast.ClassDef):
            bases = [ast.unparse(b) for b in node.bases]
            comp, loops, branches, errors = _py_complexity(node)
            units.append(
                CodeUnit(
                    name=node.name,
                    qualified_name=node.name,
                    file=path,
                    line=node.lineno,
                    end_line=node.end_lineno or node.lineno,
                    language="python",
                    unit_type=UnitType.CLASS,
                    signature=_py_signature(node, lines),
                    docstring=ast.get_docstring(node),
                    extends=bases[0] if bases else None,
                    calls=_py_calls(node),
                    complexity=comp,
                    has_loops=loops,
                    has_branches=branches,
                    has_error_handling=errors,
                    imports=module_imports,
                    code=segment(node),
                )
            )
            for child in node.body:
                if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    add_function(child, node.name)
        elif isinstance(node, ast.Assign) and all(
            isinstance(t, ast.Name) and t.id.isupper() for t in node.targets
        ):
            name = node.targets[0].id  # type: ignore[union-attr]
            units.append(
                CodeUnit(
                    name=name,
                    qualified_name=name,
                    file=path,
                    line=node.lineno,
                    end_line=node.end_lineno or node.lineno,
                    language="python",
                    unit_type=UnitType.CONSTANT,
                    return_type="constant",
                    code=segment(node),
                )
            )
    _resolve_called_by(units)
    return units or _parse_raw(path, content, "python")


def _resolve_called_by(units: List[CodeUnit]) -> None:
    """Intra-file called_by edges (reference parser/call_graph.rs)."""
    by_name: Dict[str, CodeUnit] = {u.name: u for u in units}
    for u in units:
        for callee in u.calls:
            target = by_name.get(callee)
            if target is not None and u.name not in target.called_by:
                target.called_by.append(u.name)


# ---------------------------------------------------------------------------
# Generic brace/indent languages (regex-anchored definitions)
# ---------------------------------------------------------------------------

# language -> list of (unit_type, compiled regex with a `name` group)
_DEF_PATTERNS: Dict[str, List] = {
    "javascript": [
        (UnitType.CLASS, r"^\s*(?:export\s+)?(?:abstract\s+)?class\s+(?P<name>\w+)"),
        (UnitType.FUNCTION, r"^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s*\*?\s*(?P<name>\w+)"),
        (UnitType.FUNCTION, r"^\s*(?:export\s+)?(?:const|let|var)\s+(?P<name>\w+)\s*=\s*(?:async\s*)?(?:\([^)]*\)|\w+)\s*=>"),
    ],
    "go": [
        (UnitType.FUNCTION, r"^func\s+(?:\([^)]*\)\s*)?(?P<name>\w+)\s*\("),
        (UnitType.CLASS, r"^type\s+(?P<name>\w+)\s+(?:struct|interface)\b"),
    ],
    "rust": [
        (UnitType.FUNCTION, r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:async\s+)?(?:unsafe\s+)?fn\s+(?P<name>\w+)"),
        (UnitType.CLASS, r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:struct|enum|trait)\s+(?P<name>\w+)"),
    ],
    "java": [
        (UnitType.CLASS, r"^\s*(?:public|private|protected)?\s*(?:static\s+)?(?:final\s+)?(?:abstract\s+)?(?:class|interface|enum|record)\s+(?P<name>\w+)"),
        (UnitType.METHOD, r"^\s*(?:public|private|protected)\s+(?:static\s+)?(?:final\s+)?[\w<>\[\],\s]+\s+(?P<name>\w+)\s*\([^;]*$"),
    ],
    "c": [
        (UnitType.FUNCTION, r"^[a-zA-Z_][\w\s\*]*?\b(?P<name>\w+)\s*\([^;]*\)\s*\{?\s*$"),
    ],
    "cpp": [
        (UnitType.CLASS, r"^\s*(?:class|struct)\s+(?P<name>\w+)"),
        (UnitType.FUNCTION, r"^[a-zA-Z_][\w\s\*:<>&]*?\b(?P<name>\w+)\s*\([^;]*\)\s*(?:const\s*)?\{?\s*$"),
    ],
    "csharp": [
        (UnitType.CLASS, r"^\s*(?:public|private|internal|protected)?\s*(?:static\s+|sealed\s+|abstract\s+|partial\s+)*(?:class|interface|struct|record|enum)\s+(?P<name>\w+)"),
        (UnitType.METHOD, r"^\s*(?:public|private|internal|protected)\s+(?:static\s+|async\s+|virtual\s+|override\s+)*[\w<>\[\],\s]+\s+(?P<name>\w+)\s*\("),
    ],
    "ruby": [
        (UnitType.CLASS, r"^\s*(?:class|module)\s+(?P<name>\w+)"),
        (UnitType.METHOD, r"^\s*def\s+(?:self\.)?(?P<name>[\w?!=\[\]]+)"),
    ],
    "php": [
        (UnitType.CLASS, r"^\s*(?:abstract\s+|final\s+)?(?:class|interface|trait)\s+(?P<name>\w+)"),
        (UnitType.FUNCTION, r"^\s*(?:public|private|protected)?\s*(?:static\s+)?function\s+(?P<name>\w+)"),
    ],
    "swift": [
        (UnitType.CLASS, r"^\s*(?:public\s+|open\s+|internal\s+|final\s+)*(?:class|struct|enum|protocol)\s+(?P<name>\w+)"),
        (UnitType.FUNCTION, r"^\s*(?:public\s+|open\s+|private\s+|static\s+)*func\s+(?P<name>\w+)"),
    ],
    "kotlin": [
        (UnitType.CLASS, r"^\s*(?:data\s+|sealed\s+|open\s+|abstract\s+)*(?:class|interface|object)\s+(?P<name>\w+)"),
        (UnitType.FUNCTION, r"^\s*(?:suspend\s+|private\s+|public\s+|internal\s+|override\s+)*fun\s+(?:<[^>]*>\s*)?(?P<name>\w+)"),
    ],
    "scala": [
        (UnitType.CLASS, r"^\s*(?:case\s+)?(?:class|object|trait)\s+(?P<name>\w+)"),
        (UnitType.FUNCTION, r"^\s*(?:private\s+|protected\s+|override\s+)*def\s+(?P<name>\w+)"),
    ],
    "lua": [
        (UnitType.FUNCTION, r"^\s*(?:local\s+)?function\s+(?P<name>[\w.:]+)"),
    ],
    "shell": [
        (UnitType.FUNCTION, r"^\s*(?:function\s+)?(?P<name>[\w-]+)\s*\(\)\s*\{"),
    ],
    "typescript": [],  # filled below from javascript + extras
}
_DEF_PATTERNS["typescript"] = _DEF_PATTERNS["javascript"] + [
    (UnitType.CLASS, r"^\s*(?:export\s+)?(?:interface|enum)\s+(?P<name>\w+)"),
    (UnitType.FUNCTION, r"^\s*(?:export\s+)?type\s+(?P<name>\w+)\s*="),
]

_IMPORT_PATTERNS = {
    "javascript": r"^\s*(?:import .*?from\s+['\"](?P<m>[^'\"]+)|const .*?=\s*require\(['\"](?P<m2>[^'\"]+))",
    "typescript": r"^\s*import .*?from\s+['\"](?P<m>[^'\"]+)",
    "go": r"^\s*(?:import\s+)?\"(?P<m>[^\"]+)\"",
    "rust": r"^\s*use\s+(?P<m>[\w:]+)",
    "java": r"^\s*import\s+(?:static\s+)?(?P<m>[\w.]+)",
    "c": r"^\s*#include\s+[<\"](?P<m>[^>\"]+)",
    "cpp": r"^\s*#include\s+[<\"](?P<m>[^>\"]+)",
    "ruby": r"^\s*require(?:_relative)?\s+['\"](?P<m>[^'\"]+)",
    "php": r"^\s*use\s+(?P<m>[\w\\]+)",
}

_CALL_RE = re.compile(r"\b([a-zA-Z_]\w*)\s*\(")
_VAR_RE = re.compile(
    r"^\s*(?:(?:const|let|var|val|local|my)\s+)?([a-zA-Z_]\w*)\s*(?::[\w<>\[\]\s]*)?=[^=]",
    re.M,
)
_KEYWORDS = frozenset(
    "if else for while switch match return new delete typeof sizeof catch "
    "throw try do break continue yield await async function fn def class "
    "struct enum impl pub use import from print println assert".split()
)


def _block_end(lines: List[str], start: int, language: str) -> int:
    """Best-effort block extent: brace matching for brace languages,
    indentation for indent languages, `end` keywords for Ruby/Lua."""
    if language in ("ruby", "lua"):
        depth = 0
        opener = re.compile(
            r"\b(?:def|class|module|function|if|for|while|do|begin)\b"
        )
        for i in range(start, len(lines)):
            stripped = lines[i].split("#")[0].split("--")[0]
            depth += len(opener.findall(stripped))
            depth -= len(re.findall(r"\bend\b", stripped))
            if depth <= 0 and i > start:
                return i
        return min(start + MAX_RAW_CHUNK_LINES, len(lines) - 1)
    depth = 0
    seen_open = False
    for i in range(start, min(start + 800, len(lines))):
        depth += lines[i].count("{") - lines[i].count("}")
        if "{" in lines[i]:
            seen_open = True
        if seen_open and depth <= 0:
            return i
        if not seen_open and i > start + 3:
            return min(start + 3, len(lines) - 1)  # prototype-ish, keep short
    return min(start + MAX_RAW_CHUNK_LINES, len(lines) - 1)


def _parse_generic(path: str, content: str, language: str) -> List[CodeUnit]:
    patterns = [
        (t, re.compile(p)) for t, p in _DEF_PATTERNS.get(language, [])
    ]
    if not patterns:
        return _parse_raw(path, content, language)
    lines = content.splitlines()
    import_re = (
        re.compile(_IMPORT_PATTERNS[language])
        if language in _IMPORT_PATTERNS
        else None
    )
    imports: List[str] = []
    if import_re is not None:
        for line in lines[:200]:
            m = import_re.match(line)
            if m:
                mod = m.groupdict().get("m") or m.groupdict().get("m2")
                if mod:
                    imports.append(mod.split("/")[0])
        imports = list(dict.fromkeys(imports))[:20]

    units: List[CodeUnit] = []
    covered = [False] * len(lines)
    i = 0
    while i < len(lines):
        matched = False
        for unit_type, rx in patterns:
            m = rx.match(lines[i])
            if not m:
                continue
            name = m.group("name")
            if not name or name in _KEYWORDS:
                continue
            end = _block_end(lines, i, language)
            code = "\n".join(lines[i : end + 1])
            body = code
            calls = []
            seen = set()
            for c in _CALL_RE.findall(body):
                if c not in _KEYWORDS and c != name and c not in seen:
                    seen.add(c)
                    calls.append(c)
            variables = [
                v
                for v in dict.fromkeys(_VAR_RE.findall(body))
                if v not in _KEYWORDS
            ][:20]
            units.append(
                CodeUnit(
                    name=name,
                    qualified_name=name,
                    file=path,
                    line=i + 1,
                    end_line=end + 1,
                    language=language,
                    unit_type=unit_type,
                    signature=lines[i].strip().rstrip("{").strip(),
                    calls=calls[:30],
                    complexity=1
                    + len(re.findall(r"\b(?:if|for|while|case|catch)\b", body)),
                    has_loops=bool(re.search(r"\b(?:for|while)\b", body)),
                    has_branches=bool(
                        re.search(r"\b(?:if|switch|match|case)\b", body)
                    ),
                    has_error_handling=bool(
                        re.search(
                            r"\b(?:try|catch|rescue|recover|except|throw|raise|panic)\b",
                            body,
                        )
                    ),
                    variables=variables,
                    imports=imports,
                    code=code,
                )
            )
            for j in range(i, end + 1):
                covered[j] = True
            matched = True
            break
        i += 1
    # Residual uncovered regions become RawCode chunks so grep-style recall
    # over the whole file is preserved.
    units.extend(_raw_chunks(path, lines, language, covered))
    _resolve_called_by(units)
    return units or _parse_raw(path, content, language)


# ---------------------------------------------------------------------------
# Markdown / text / fallback
# ---------------------------------------------------------------------------


def _parse_markdown(path: str, content: str) -> List[CodeUnit]:
    lines = content.splitlines()
    units: List[CodeUnit] = []
    section_start, section_title = 0, None
    heading = re.compile(r"^(#{1,6})\s+(.*)")

    def flush(end: int) -> None:
        nonlocal section_start, section_title
        body = "\n".join(lines[section_start:end]).strip()
        if not body:
            return
        title = section_title or Path(path).stem
        units.append(
            CodeUnit(
                name=title,
                qualified_name=title,
                file=path,
                line=section_start + 1,
                end_line=end,
                language="markdown",
                unit_type=UnitType.SECTION if section_title else UnitType.DOCUMENT,
                docstring=None,
                code=body,
            )
        )

    for i, line in enumerate(lines):
        m = heading.match(line)
        if m:
            flush(i)
            section_start, section_title = i, m.group(2).strip()
    flush(len(lines))
    return units


def _raw_chunks(
    path: str,
    lines: List[str],
    language: str,
    covered: Optional[List[bool]] = None,
) -> List[CodeUnit]:
    units: List[CodeUnit] = []
    n = len(lines)
    i = 0
    chunk_id = 0
    while i < n:
        if covered is not None and covered[i]:
            i += 1
            continue
        j = i
        while (
            j < n
            and j - i < MAX_RAW_CHUNK_LINES
            and (covered is None or not covered[j])
        ):
            j += 1
        body = "\n".join(lines[i:j]).strip()
        if body and len(body) > 40:
            chunk_id += 1
            units.append(
                CodeUnit(
                    name=f"raw_code_{i + 1}",
                    qualified_name=f"raw_code_{i + 1}",
                    file=path,
                    line=i + 1,
                    end_line=j,
                    language=language,
                    unit_type=UnitType.RAW_CODE,
                    code=body,
                )
            )
        i = j
    return units


def _parse_raw(path: str, content: str, language: str) -> List[CodeUnit]:
    return _raw_chunks(path, content.splitlines(), language)


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------


def extract_units(path, content: Optional[str] = None) -> List[CodeUnit]:
    """Parse one file into code units (reference parser/mod.rs:36-38)."""
    path = str(path)
    if content is None:
        p = Path(path)
        if not p.exists() or p.stat().st_size > MAX_FILE_BYTES:
            return []
        try:
            content = p.read_text(errors="replace")
        except OSError:
            return []
    language = detect_language(path)
    if language is None:
        return []
    if language == "python":
        return _parse_python(path, content)
    if language == "markdown":
        return _parse_markdown(path, content)
    if language in ("text", "yaml", "toml", "json", "dockerfile", "makefile",
                    "cmake", "powershell"):
        return _parse_raw(path, content, language)
    # Token-level structural parser (23 grammars: JS/TS, Go, Rust, Java,
    # C/C++, C#, Ruby, Kotlin, Swift, Scala, PHP, Lua, Julia, Elixir, R,
    # Zig, Haskell, OCaml, SQL, CSS, QML) — layers 1-4 from the token
    # stream; see structparse.py. Vue/Svelte/HTML single-file components
    # route their script/style blocks there via webformats.py.
    # Unsupported languages keep the regex layer below.
    from nextplaid_tpu.codesearch.structparse import parse_structured
    from nextplaid_tpu.codesearch.webformats import parse_web

    structured = parse_web(path, content, language)
    if structured is None:
        structured = parse_structured(path, content, language)
    if structured is not None:
        units, covered = structured
        lines = content.splitlines()
        if len(covered) < len(lines):
            covered = covered + [False] * (len(lines) - len(covered))
        units.extend(_raw_chunks(path, lines, language, covered))
        _resolve_called_by(units)
        return units or _parse_raw(path, content, language)
    return _parse_generic(path, content, language)
