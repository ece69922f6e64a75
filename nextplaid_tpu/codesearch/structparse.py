"""Token-level structural parser for the top non-Python languages.

Replaces regex line-anchoring (the round-1 stopgap) with a real two-phase
design mirroring what the reference gets from tree-sitter
(/root/reference/colgrep/src/parser/{extract.rs:1-825, analysis.rs:1-1323}),
built from scratch since tree-sitter grammars are not in this image:

  phase 1 — LEXER: language-aware tokenizer producing (kind, text, line)
    tokens with comments and strings as single tokens. This is what regex
    extraction fundamentally cannot do: braces/keywords inside strings and
    comments no longer exist, so block extents and call detection are
    reliable.
  phase 2 — RECOGNIZERS: per-language definition-head recognition over the
    token stream (functions, methods, classes/structs/traits/impls), with
    token-bracket-matched parameter lists, block extents by brace matching
    (or `end`-keyword tracking for Ruby), docstrings from adjacent comment
    runs, and layers 2-4 (calls, control flow, variables) computed from the
    unit's token slice.

Languages: javascript, typescript, go, rust, java, c, cpp, csharp, ruby,
kotlin, swift, scala, php.
Anything else falls back to the regex layer in parser.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from nextplaid_tpu.codesearch.types import CodeUnit, UnitType

# Token kinds
ID, PUNCT, STR, COMMENT, NUM = "id", "punct", "str", "comment", "num"

_ID_START = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_$"
)
_ID_CONT = _ID_START | frozenset("0123456789")
_DIGITS = frozenset("0123456789")


@dataclass
class Tok:
    kind: str
    text: str
    line: int
    col: int = 0

    def __repr__(self):  # pragma: no cover - debug aid
        return f"{self.kind}:{self.text!r}@{self.line}"


@dataclass(frozen=True)
class LexCfg:
    line_comments: Tuple[str, ...]
    block_comments: Tuple[Tuple[str, str], ...] = (("/*", "*/"),)
    nested_blocks: bool = False
    backtick_string: bool = False  # Go raw / JS template
    rust_raw: bool = False
    ruby: bool = False
    triple_quote: bool = False  # Kotlin/Swift/Scala """...""" raw strings
    heredoc: bool = False  # PHP <<<ID ... ID;


_LEX: Dict[str, LexCfg] = {
    "javascript": LexCfg(("//",), backtick_string=True),
    "typescript": LexCfg(("//",), backtick_string=True),
    "go": LexCfg(("//",), backtick_string=True),
    "rust": LexCfg(("//",), nested_blocks=True, rust_raw=True),
    "java": LexCfg(("//",)),
    "c": LexCfg(("//",)),
    "cpp": LexCfg(("//",)),
    "csharp": LexCfg(("//",)),
    "ruby": LexCfg(("#",), block_comments=(("=begin", "=end"),), ruby=True),
    "kotlin": LexCfg(("//",), nested_blocks=True, triple_quote=True),
    "swift": LexCfg(("//",), nested_blocks=True, triple_quote=True),
    "scala": LexCfg(("//",), nested_blocks=True, triple_quote=True),
    "php": LexCfg(("//", "#"), heredoc=True),
}

SUPPORTED = frozenset(_LEX)


def tokenize(content: str, language: str) -> List[Tok]:
    cfg = _LEX[language]
    toks: List[Tok] = []
    i, line, n = 0, 1, len(content)
    line_start = 0
    while i < n:
        ch = content[i]
        if ch == "\n":
            line += 1
            i += 1
            line_start = i
            continue
        if ch in " \t\r":
            i += 1
            continue
        col = i - line_start
        # Comments.
        matched = False
        for lc in cfg.line_comments:
            if content.startswith(lc, i):
                j = content.find("\n", i)
                j = n if j < 0 else j
                toks.append(Tok(COMMENT, content[i:j], line, col))
                i = j
                matched = True
                break
        if matched:
            continue
        for bo, bc in cfg.block_comments:
            if content.startswith(bo, i):
                if cfg.ruby and col != 0:
                    break  # =begin only at column 0
                depth, j = 1, i + len(bo)
                while j < n and depth:
                    if cfg.nested_blocks and content.startswith(bo, j):
                        depth += 1
                        j += len(bo)
                    elif content.startswith(bc, j):
                        depth -= 1
                        j += len(bc)
                    else:
                        j += 1
                text = content[i:j]
                toks.append(Tok(COMMENT, text, line, col))
                line += text.count("\n")
                i = j
                nl = content.rfind("\n", 0, j)
                line_start = nl + 1 if nl >= 0 else line_start
                matched = True
                break
        if matched:
            continue
        # Triple-quoted raw strings (Kotlin/Swift/Scala) — must win over
        # the single-quote branch or the first two quotes parse as an empty
        # string and the third opens an unterminated one.
        if cfg.triple_quote and content.startswith('"""', i):
            k = content.find('"""', i + 3)
            k = n if k < 0 else k + 3
            text = content[i:k]
            toks.append(Tok(STR, text, line, col))
            line += text.count("\n")
            i = k
            nl = content.rfind("\n", 0, k)
            line_start = nl + 1 if nl >= 0 else line_start
            continue
        # PHP heredoc/nowdoc: <<<ID or <<<'ID' ... ID (terminator at line
        # start); braces inside must not corrupt extents.
        if cfg.heredoc and content.startswith("<<<", i):
            j = i + 3
            while j < n and content[j] in " \t":
                j += 1
            quote = content[j] if j < n and content[j] in "'\"" else ""
            if quote:
                j += 1
            m0 = j
            while j < n and (content[j].isalnum() or content[j] == "_"):
                j += 1
            ident = content[m0:j]
            if ident:
                close = re.compile(
                    r"^[ \t]*" + re.escape(ident) + r"\b", re.M
                )
                mm = close.search(content, j)
                k = mm.end() if mm else n
                text = content[i:k]
                toks.append(Tok(STR, text, line, col))
                line += text.count("\n")
                i = k
                nl = content.rfind("\n", 0, k)
                line_start = nl + 1 if nl >= 0 else line_start
                continue
        # Rust raw strings r"..." / r#"..."#.
        if cfg.rust_raw and ch == "r" and i + 1 < n and content[i + 1] in '#"':
            j = i + 1
            hashes = 0
            while j < n and content[j] == "#":
                hashes += 1
                j += 1
            if j < n and content[j] == '"':
                close = '"' + "#" * hashes
                k = content.find(close, j + 1)
                k = n if k < 0 else k + len(close)
                text = content[i:k]
                toks.append(Tok(STR, text, line, col))
                line += text.count("\n")
                i = k
                nl = content.rfind("\n", 0, k)
                line_start = nl + 1 if nl >= 0 else line_start
                continue
        # Strings.
        if ch in "\"'" or (cfg.backtick_string and ch == "`"):
            q = ch
            j = i + 1
            while j < n:
                c = content[j]
                if c == "\\" and q != "`":
                    j += 2
                    continue
                if c == q:
                    j += 1
                    break
                if c == "\n" and q not in "`":
                    break  # unterminated on this line; bail
                j += 1
            text = content[i:j]
            toks.append(Tok(STR, text, line, col))
            line += text.count("\n")
            i = j
            nl = content.rfind("\n", 0, j)
            line_start = nl + 1 if nl >= 0 else line_start
            continue
        # Identifiers / keywords.
        if ch in _ID_START:
            j = i + 1
            while j < n and content[j] in _ID_CONT:
                j += 1
            toks.append(Tok(ID, content[i:j], line, col))
            i = j
            continue
        # Numbers.
        if ch in _DIGITS:
            j = i + 1
            while j < n and (content[j] in _ID_CONT or content[j] == "."):
                j += 1
            toks.append(Tok(NUM, content[i:j], line, col))
            i = j
            continue
        # Multi-char operators we care about.
        for op in ("=>", "->", "::", ":="):
            if content.startswith(op, i):
                toks.append(Tok(PUNCT, op, line, col))
                i += len(op)
                matched = True
                break
        if matched:
            continue
        toks.append(Tok(PUNCT, ch, line, col))
        i += 1
    return toks


# ---------------------------------------------------------------------------
# Shared analysis over a token slice (layers 2-4)
# ---------------------------------------------------------------------------

_CONTROL_KW = frozenset(
    "if else elif elsif unless switch match case when for while until loop "
    "do catch rescue except finally ensure defer select".split()
)
_LOOP_KW = frozenset("for while until loop".split())
_BRANCH_KW = frozenset("if elif elsif unless switch match case when select".split())
_ERROR_KW = frozenset(
    "try catch rescue except finally ensure throw raise panic recover "
    "unwrap expect Err defer".split()
)
_NOT_CALLS = frozenset(
    "if else for while switch match case return new delete typeof sizeof "
    "catch throw try do break continue yield await async function fn def "
    "class struct enum impl trait interface pub use import from assert "
    "loop unless until when rescue raise begin end module require public "
    "private protected static final const let var val mut ref type where "
    "select defer go chan Some None Ok Err Box super this self".split()
)
_DECL_KW = frozenset("let const var val mut".split())


def _analyze(toks: Sequence[Tok], own_name: str, language: str = ""):
    """(calls, complexity, loops, branches, errors, variables)."""
    calls: List[str] = []
    seen = set()
    variables: List[str] = []
    vseen = set()
    complexity = 1
    loops = branches = errors = False
    for k, t in enumerate(toks):
        if t.kind != ID:
            continue
        w = t.text
        if w in _CONTROL_KW:
            if w in _LOOP_KW:
                loops = True
            if w in _BRANCH_KW:
                branches = True
            if w in ("if", "elif", "elsif", "unless", "for", "while",
                     "until", "case", "when", "catch", "rescue", "except"):
                complexity += 1
        if w in _ERROR_KW:
            errors = True
        nxt = toks[k + 1] if k + 1 < len(toks) else None
        prv = toks[k - 1] if k > 0 else None
        # Layer 2: calls — IDENT '(' (incl. generic turbofish foo::<T>( via
        # the '::' skip below being unnecessary: name token is still foo).
        if (
            nxt is not None
            and nxt.kind == PUNCT
            and nxt.text == "("
            and w not in _NOT_CALLS
            and w != own_name
            and not (prv is not None and prv.kind == ID and prv.text in ("fn", "func", "def", "function"))
            and w not in seen
        ):
            seen.add(w)
            calls.append(w)
        # Ruby: paren-less calls — `obj.method` receivers/attrs, and bare
        # statements alone on their line (`validate`).
        elif (
            language == "ruby"
            and w not in _NOT_CALLS
            and w not in ("nil", "true", "false", "end", "self")
            and w != own_name
            and w not in seen
            and (
                (prv is not None and prv.kind == PUNCT and prv.text == ".")
                or (
                    (prv is None or prv.line != t.line)
                    and (nxt is None or nxt.line != t.line)
                    and not w[0].isupper()
                )
            )
        ):
            seen.add(w)
            calls.append(w)
        # Layer 4: declarations.
        if prv is not None and prv.kind == ID and prv.text in _DECL_KW:
            if w not in vseen and w not in _NOT_CALLS:
                vseen.add(w)
                variables.append(w)
        elif nxt is not None and nxt.kind == PUNCT and nxt.text == ":=":
            if w not in vseen:
                vseen.add(w)
                variables.append(w)
        elif (
            nxt is not None
            and nxt.kind == PUNCT
            and nxt.text == "="
            and prv is not None
            and (
                prv.kind != PUNCT
                or prv.text in ("}", ";", "{")
            )
            and w not in vseen
            and w not in _NOT_CALLS
            and (k + 2 >= len(toks) or toks[k + 2].text != "=")
        ):
            vseen.add(w)
            variables.append(w)
    return calls[:30], complexity, loops, branches, errors, variables[:20]


def _match_bracket(toks: Sequence[Tok], i: int, open_c: str, close_c: str) -> int:
    """Index of the matching close bracket for the open at i (or len)."""
    depth = 0
    for j in range(i, len(toks)):
        t = toks[j]
        if t.kind == PUNCT:
            if t.text == open_c:
                depth += 1
            elif t.text == close_c:
                depth -= 1
                if depth == 0:
                    return j
    return len(toks) - 1


def _docstring(toks: Sequence[Tok], def_idx: int, def_line: int) -> Optional[str]:
    """Contiguous comment run ending on the line(s) directly above the def.
    Leading modifiers on the def's own line (`pub fn`, `public class`) are
    skipped so the anchor is the first token of the definition's line."""
    j = def_idx - 1
    while j >= 0 and toks[j].kind != COMMENT and toks[j].line == def_line:
        j -= 1
    parts: List[str] = []
    expect = def_line - 1
    while j >= 0:
        t = toks[j]
        if t.kind == COMMENT:
            end_line = t.line + t.text.count("\n")
            if end_line in (expect, expect + 1):
                parts.append(_strip_comment(t.text))
                expect = t.line - 1
                j -= 1
                continue
        break
    if not parts:
        return None
    return "\n".join(reversed(parts))[:500] or None


def _strip_comment(text: str) -> str:
    text = text.strip()
    for p in ("///", "//!", "//", "#", "/**", "/*", "=begin"):
        if text.startswith(p):
            text = text[len(p):]
            break
    for s in ("*/", "=end"):
        if text.endswith(s):
            text = text[: -len(s)]
    lines = [
        re.sub(r"^\s*[*#]\s?", "", ln).rstrip() for ln in text.splitlines()
    ]
    return "\n".join(ln for ln in lines if ln).strip()


def _params_from_slice(
    ptoks: Sequence[Tok], language: str
) -> List[str]:
    """Parameter names from the tokens INSIDE a def's parens."""
    groups: List[List[Tok]] = [[]]
    depth = 0
    for t in ptoks:
        if t.kind == PUNCT and t.text in "([{<":
            depth += 1
        elif t.kind == PUNCT and t.text in ")]}>":
            depth -= 1
        if t.kind == PUNCT and t.text == "," and depth == 0:
            groups.append([])
        else:
            groups[-1].append(t)
    names: List[str] = []
    for g in groups:
        ids = [t for t in g if t.kind == ID]
        if not ids:
            continue
        if language in ("java", "c", "cpp", "csharp"):
            name = ids[-1].text  # type name, type *name, final Type name
        else:
            # go/rust/js/ts/ruby: name first (skip mut/self/this/ref).
            skip = {"mut", "self", "this", "ref", "readonly", "public",
                    "private", "protected"}
            pick = [t for t in ids if t.text not in skip]
            if not pick:
                continue
            name = pick[0].text
        if name not in ("void",):
            names.append(name)
    return names[:15]


# ---------------------------------------------------------------------------
# Definition recognizers
# ---------------------------------------------------------------------------


@dataclass
class RawDef:
    name: str
    unit_type: str
    def_idx: int  # token index of the head keyword / name anchor
    name_idx: int
    body_start: int  # token index of '{' (or first body token for ruby)
    body_end: int  # token index of matching '}' / 'end'
    parent: Optional[str] = None
    params: Optional[List[str]] = None
    return_type: Optional[str] = None
    extends: Optional[str] = None


_FN_KW = {
    "kotlin": {"fun"},
    "swift": {"func", "init"},
    "scala": {"def"},
    "php": {"function"},
}

_CLASS_KW = {
    "javascript": {"class"},
    "typescript": {"class", "interface", "enum"},
    "go": set(),  # via `type X struct`
    "rust": {"struct", "enum", "trait", "union"},
    "java": {"class", "interface", "enum", "record"},
    "csharp": {"class", "interface", "struct", "record", "enum"},
    "kotlin": {"class", "interface", "object"},
    "swift": {"class", "struct", "enum", "protocol", "extension", "actor"},
    "scala": {"class", "object", "trait"},
    "php": {"class", "interface", "trait", "enum"},
    "c": {"struct", "union"},
    "cpp": {"class", "struct"},
    "ruby": {"class", "module"},
}

_MODIFIERS = frozenset(
    "pub public private protected internal static final abstract sealed "
    "override virtual async unsafe export default const extern inline "
    "constexpr friend partial open data suspend".split()
)


def _find_defs(toks: List[Tok], language: str) -> List[RawDef]:
    if language == "ruby":
        return _find_defs_ruby(toks)
    defs: List[RawDef] = []
    class_kw = _CLASS_KW.get(language, set())
    n = len(toks)
    # (end_token_idx, class_name) stack for method parenting.
    class_stack: List[Tuple[int, str]] = []

    i = 0
    while i < n:
        t = toks[i]
        while class_stack and i > class_stack[-1][0]:
            class_stack.pop()
        parent = class_stack[-1][1] if class_stack else None
        if t.kind != ID:
            i += 1
            continue
        w = t.text

        # ---- class-like definitions -------------------------------------
        if w in class_kw and i + 1 < n and toks[i + 1].kind == ID:
            name_i = i + 1
            name = toks[name_i].text
            j = name_i + 1
            extends = None
            while j < n and not (
                toks[j].kind == PUNCT and toks[j].text in "{;("
            ):
                if toks[j].kind == ID and toks[j - 1].kind == ID and toks[
                    j - 1
                ].text in ("extends", "implements"):
                    extends = extends or toks[j].text
                if language == "rust" and toks[j].text == "where":
                    break
                j += 1
            if (
                j < n
                and toks[j].text == "("
                and language in ("kotlin", "scala")
            ):
                # Primary constructor: class Repo(val db: Db) : Base() { .
                j = _match_bracket(toks, j, "(", ")") + 1
                while j < n and not (
                    toks[j].kind == PUNCT and toks[j].text in "{;("
                ):
                    if (
                        toks[j].kind == ID
                        and toks[j - 1].kind == ID
                        and toks[j - 1].text == "extends"
                    ):
                        extends = extends or toks[j].text
                    j += 1
            if j < n and toks[j].text == "{":
                end = _match_bracket(toks, j, "{", "}")
                defs.append(
                    RawDef(name, UnitType.CLASS, i, name_i, j, end,
                           parent=parent, extends=extends)
                )
                if language in ("java", "csharp", "typescript", "javascript",
                                "cpp", "kotlin", "swift", "scala", "php"):
                    class_stack.append((end, name))
                i = j + 1
                continue
            i = j + 1
            continue

        # ---- go: func / type --------------------------------------------
        if language == "go" and w == "func":
            j = i + 1
            recv = None
            if j < n and toks[j].text == "(":
                close = _match_bracket(toks, j, "(", ")")
                ids = [t2 for t2 in toks[j:close] if t2.kind == ID]
                recv = ids[-1].text if ids else None
                j = close + 1
            if j < n and toks[j].kind == ID:
                name_i = j
                name = toks[name_i].text
                p_open = name_i + 1
                # Go 1.18 generics: func F[T any](...) — skip the type-
                # parameter bracket group before the parameter list.
                if p_open < n and toks[p_open].text == "[":
                    p_open = _match_bracket(toks, p_open, "[", "]") + 1
                if p_open < n and toks[p_open].text == "(":
                    p_close = _match_bracket(toks, p_open, "(", ")")
                    body = p_close + 1
                    while body < n and not (
                        toks[body].kind == PUNCT and toks[body].text in "{;"
                    ):
                        body += 1
                    if body < n and toks[body].text == "{":
                        end = _match_bracket(toks, body, "{", "}")
                        defs.append(
                            RawDef(
                                name,
                                UnitType.METHOD if recv else UnitType.FUNCTION,
                                i, name_i, body, end, parent=recv,
                                params=_params_from_slice(
                                    toks[p_open + 1 : p_close], language
                                ),
                            )
                        )
                        i = body + 1
                        continue
            i += 1
            continue
        if language == "go" and w == "type" and i + 2 < n:
            if toks[i + 1].kind == ID and toks[i + 2].kind == ID and toks[
                i + 2
            ].text in ("struct", "interface"):
                name_i = i + 1
                j = i + 3
                if j < n and toks[j].text == "{":
                    end = _match_bracket(toks, j, "{", "}")
                    defs.append(
                        RawDef(toks[name_i].text, UnitType.CLASS, i, name_i,
                               j, end)
                    )
                    i = end + 1
                    continue
            i += 1
            continue

        # ---- rust: fn / impl --------------------------------------------
        if language == "rust" and w == "fn" and i + 1 < n and toks[i + 1].kind == ID:
            name_i = i + 1
            name = toks[name_i].text
            j = name_i + 1
            if j < n and toks[j].text == "<":
                j = _match_bracket(toks, j, "<", ">") + 1
            if j < n and toks[j].text == "(":
                p_close = _match_bracket(toks, j, "(", ")")
                ret = None
                body = p_close + 1
                while body < n and not (
                    toks[body].kind == PUNCT and toks[body].text in "{;"
                ):
                    if toks[body].kind == PUNCT and toks[body].text == "->":
                        k2 = body + 1
                        parts = []
                        while k2 < n and not (
                            toks[k2].kind == PUNCT
                            and toks[k2].text in "{;"
                        ) and toks[k2].text != "where":
                            parts.append(toks[k2].text)
                            k2 += 1
                        ret = " ".join(parts)[:60] or None
                    body += 1
                if body < n and toks[body].text == "{":
                    end = _match_bracket(toks, body, "{", "}")
                    defs.append(
                        RawDef(
                            name,
                            UnitType.METHOD if parent else UnitType.FUNCTION,
                            i, name_i, body, end, parent=parent,
                            params=_params_from_slice(
                                toks[j + 1 : p_close], language
                            ),
                            return_type=ret,
                        )
                    )
                    i = body + 1
                    continue
            i += 1
            continue
        if language == "rust" and w == "impl":
            j = i + 1
            if j < n and toks[j].text == "<":
                j = _match_bracket(toks, j, "<", ">") + 1
            names = []
            while j < n and toks[j].text != "{" and toks[j].text != "where":
                if toks[j].kind == ID and toks[j].text != "for":
                    names.append(toks[j].text)
                j += 1
            while j < n and toks[j].text != "{":
                j += 1
            if j < n:
                end = _match_bracket(toks, j, "{", "}")
                impl_type = names[-1] if names else None
                if impl_type:
                    class_stack.append((end, impl_type))
            i = j + 1
            continue

        # ---- kotlin/swift/scala/php: keyword-led functions ---------------
        if language in _FN_KW and w in _FN_KW[language]:
            name_i = i
            if i + 1 < n and toks[i + 1].kind == ID:
                name_i = i + 1
                # Kotlin extension receivers: fun String.ext(...) — the
                # LAST dotted segment is the name.
                while (
                    name_i + 2 < n
                    and toks[name_i + 1].text == "."
                    and toks[name_i + 2].kind == ID
                ):
                    name_i += 2
                name = toks[name_i].text
                j = name_i + 1
            elif w == "init" and i + 1 < n and toks[i + 1].text == "(":
                name = "init"  # Swift initializer
                j = i + 1
            else:
                i += 1
                continue
            # Generic parameter groups before the parens.
            if j < n and toks[j].text == "<":
                j = _match_bracket(toks, j, "<", ">") + 1
            if language == "scala" and j < n and toks[j].text == "[":
                j = _match_bracket(toks, j, "[", "]") + 1
            if j < n and toks[j].text == "(":
                p_close = _match_bracket(toks, j, "(", ")")
                ret = None
                body = p_close + 1
                while body < n and not (
                    toks[body].kind == PUNCT and toks[body].text in "{;="
                ):
                    if toks[body].kind == PUNCT and toks[body].text in (
                        ":", "->",
                    ):
                        k2 = body + 1
                        parts = []
                        while k2 < n and not (
                            toks[k2].kind == PUNCT
                            and toks[k2].text in "{;="
                        ):
                            parts.append(toks[k2].text)
                            k2 += 1
                        ret = " ".join(parts)[:60] or None
                    body += 1
                # Scala/Kotlin expression bodies (`= expr`) have no brace
                # block; only brace-bodied definitions become units here
                # (expression forms fall to the RawCode layer).
                if body < n and toks[body].text == "=":
                    nxt = body + 1
                    if nxt < n and toks[nxt].text == "{":
                        body = nxt
                if body < n and toks[body].text == "{":
                    end = _match_bracket(toks, body, "{", "}")
                    defs.append(
                        RawDef(
                            name,
                            UnitType.METHOD if parent else UnitType.FUNCTION,
                            i, name_i, body, end, parent=parent,
                            params=_params_from_slice(
                                toks[j + 1 : p_close], language
                            ),
                            return_type=ret,
                        )
                    )
                    i = body + 1
                    continue
            i = name_i + 1
            continue

        # ---- js/ts: function / arrow / method ---------------------------
        if language in ("javascript", "typescript"):
            if w == "function":
                j = i + 1
                if j < n and toks[j].text == "*":
                    j += 1
                if j < n and toks[j].kind == ID:
                    name_i = j
                    p_open = j + 1
                    if p_open < n and toks[p_open].text == "<":
                        p_open = _match_bracket(toks, p_open, "<", ">") + 1
                    if p_open < n and toks[p_open].text == "(":
                        p_close = _match_bracket(toks, p_open, "(", ")")
                        body = p_close + 1
                        while body < n and not (
                            toks[body].kind == PUNCT
                            and toks[body].text in "{;"
                        ):
                            body += 1
                        if body < n and toks[body].text == "{":
                            end = _match_bracket(toks, body, "{", "}")
                            defs.append(
                                RawDef(
                                    toks[name_i].text, UnitType.FUNCTION, i,
                                    name_i, body, end,
                                    params=_params_from_slice(
                                        toks[p_open + 1 : p_close], language
                                    ),
                                )
                            )
                            i = body + 1
                            continue
                i += 1
                continue
            # const name = (...) => / = async (...) =>
            if (
                w in ("const", "let", "var")
                and i + 2 < n
                and toks[i + 1].kind == ID
                and toks[i + 2].text == "="
            ):
                j = i + 3
                while j < n and toks[j].kind == ID and toks[j].text == "async":
                    j += 1
                arrow_at = None
                if j < n and toks[j].text == "(":
                    p_close = _match_bracket(toks, j, "(", ")")
                    k2 = p_close + 1
                    # Skip a TS return-type annotation between ')' and '=>'.
                    if k2 < n and toks[k2].text == ":":
                        while k2 < n and toks[k2].text not in ("=>", ";", "=", "{"):
                            k2 += 1
                    if k2 < n and toks[k2].text == "=>":
                        arrow_at = k2
                        p_slice = toks[j + 1 : p_close]
                elif j + 1 < n and toks[j].kind == ID and toks[j + 1].text == "=>":
                    arrow_at = j + 1
                    p_slice = [toks[j]]
                if arrow_at is not None:
                    body = arrow_at + 1
                    if body < n and toks[body].text == "{":
                        end = _match_bracket(toks, body, "{", "}")
                    else:
                        end = body
                        depth = 0
                        while end < n:
                            te = toks[end]
                            if te.kind == PUNCT:
                                if te.text in "([{":
                                    depth += 1
                                elif te.text in ")]}":
                                    depth -= 1
                                    if depth < 0:
                                        break
                                elif te.text == ";" and depth == 0:
                                    break
                            end += 1
                        end = min(end, n - 1)
                    defs.append(
                        RawDef(
                            toks[i + 1].text, UnitType.FUNCTION, i, i + 1,
                            body, end,
                            params=_params_from_slice(p_slice, language),
                        )
                    )
                    i = body
                    continue
            # class-body method: IDENT [<T,...>] '(' ... ')' '{' at class
            # depth. Generic methods (m<T>(x: T)) carry an angle-bracket
            # group before the parens; match it with a bounded depth scan
            # (angles are operators, not lexer brackets — a short scan that
            # must END at "(" keeps comparison chains from matching).
            paren_i = None
            if parent is not None and i + 1 < n and toks[i + 1].text == "(":
                paren_i = i + 1
            elif (
                parent is not None
                and language == "typescript"
                and i + 1 < n
                and toks[i + 1].text == "<"
            ):
                depth, j2 = 0, i + 1
                while j2 < min(n, i + 64):
                    t2 = toks[j2].text
                    if t2 == "<":
                        depth += 1
                    elif t2 == ">":
                        depth -= 1
                        if depth == 0:
                            break
                    elif t2 in (";", "{", "}", ")"):
                        j2 = n
                        break
                    j2 += 1
                if depth == 0 and j2 + 1 < n and toks[j2 + 1].text == "(":
                    paren_i = j2 + 1
            if (
                paren_i is not None
                and w not in _NOT_CALLS
                and w not in ("constructor", "if", "for", "while", "switch",
                              "catch")
            ):
                p_close = _match_bracket(toks, paren_i, "(", ")")
                body = p_close + 1
                if body < n and toks[body].text == ":" and language == "typescript":
                    while body < n and toks[body].text != "{":
                        if toks[body].text in (";", "="):
                            body = n
                            break
                        body += 1
                if body < n and toks[body].text == "{":
                    prev = toks[i - 1] if i > 0 else None
                    if prev is None or prev.kind == COMMENT or (
                        prev.kind == PUNCT and prev.text in "{};"
                    ) or (prev.kind == ID and prev.text in _MODIFIERS | {"get", "set"}):
                        end = _match_bracket(toks, body, "{", "}")
                        defs.append(
                            RawDef(
                                w, UnitType.METHOD, i, i, body, end,
                                parent=parent,
                                params=_params_from_slice(
                                    toks[paren_i + 1 : p_close], language
                                ),
                            )
                        )
                        i = body + 1
                        continue

        # ---- java/c#: method inside class body --------------------------
        if language in ("java", "csharp") and parent is not None:
            if (
                i + 1 < n
                and toks[i + 1].text == "("
                and w not in _NOT_CALLS
                and i > 0
                and (
                    (toks[i - 1].kind == ID and toks[i - 1].text not in
                     ("new", "return", "throw"))
                    or (toks[i - 1].kind == PUNCT and toks[i - 1].text in (">", "]"))
                )
            ):
                p_close = _match_bracket(toks, i + 1, "(", ")")
                body = p_close + 1
                while body < n and toks[body].kind == ID and toks[body].text in (
                    "throws", "where"
                ):
                    body += 1
                    while body < n and not (
                        toks[body].kind == PUNCT and toks[body].text in "{;"
                    ):
                        body += 1
                if body < n and toks[body].text == "{":
                    ret_tok = toks[i - 1]
                    end = _match_bracket(toks, body, "{", "}")
                    defs.append(
                        RawDef(
                            w, UnitType.METHOD, i, i, body, end,
                            parent=parent,
                            params=_params_from_slice(
                                toks[i + 2 : p_close], language
                            ),
                            return_type=(
                                ret_tok.text
                                if ret_tok.kind == ID and ret_tok.text != parent
                                else None
                            ),
                        )
                    )
                    i = body + 1
                    continue

        # ---- c/cpp: free function definitions ---------------------------
        if language in ("c", "cpp"):
            if (
                i + 1 < n
                and toks[i + 1].text == "("
                and w not in _NOT_CALLS
                and w not in _CONTROL_KW
                and i > 0
                and (
                    (toks[i - 1].kind == ID and toks[i - 1].text not in
                     ("return", "new", "throw", "goto", "case"))
                    or (toks[i - 1].kind == PUNCT and toks[i - 1].text in
                        ("*", "&", "::", ">"))
                )
                and parent is None
            ):
                p_close = _match_bracket(toks, i + 1, "(", ")")
                body = p_close + 1
                while body < n and toks[body].kind == ID and toks[body].text in (
                    "const", "noexcept", "override", "final",
                ):
                    body += 1
                if body < n and toks[body].text == "{":
                    # qualified name Class::method
                    name = w
                    par = None
                    if i >= 2 and toks[i - 1].text == "::" and toks[i - 2].kind == ID:
                        par = toks[i - 2].text
                    end = _match_bracket(toks, body, "{", "}")
                    defs.append(
                        RawDef(
                            name,
                            UnitType.METHOD if par else UnitType.FUNCTION,
                            i, i, body, end, parent=par,
                            params=_params_from_slice(
                                toks[i + 2 : p_close], language
                            ),
                        )
                    )
                    i = body + 1
                    continue
        i += 1
    return defs


_RUBY_OPENERS = frozenset(
    "def class module if unless case while until for begin do".split()
)
_RUBY_MODIFIER_OK = frozenset("if unless while until".split())


def _find_defs_ruby(toks: List[Tok]) -> List[RawDef]:
    """Ruby: `end`-matched blocks; modifier if/unless (not at line start)
    do not open blocks; `do` after while/until/for doesn't double-open."""
    n = len(toks)
    defs: List[RawDef] = []
    # First pass: compute block pairing with a stack.
    stack: List[int] = []  # token indices of openers
    match_end: Dict[int, int] = {}
    first_on_line: Dict[int, bool] = {}
    last_line = -1
    for k, t in enumerate(toks):
        if t.kind == COMMENT:
            continue
        fol = t.line != last_line
        last_line = t.line
        first_on_line[k] = fol
        if t.kind != ID:
            continue
        w = t.text
        if w in _RUBY_OPENERS:
            if w in _RUBY_MODIFIER_OK and not fol:
                continue  # modifier form: `x = 1 if cond`
            if w == "do":
                prev = toks[k - 1] if k else None
                if prev is not None and prev.kind == ID and prev.text in (
                    "while", "until", "for"
                ):
                    continue
            if w == "def":
                # Ruby 3 endless method: `def name(args) = expr` has no
                # `end`; pushing it would desync every later pairing.
                j2 = k + 1
                if j2 < len(toks) and toks[j2].kind == ID:
                    j2 += 1
                    if j2 < len(toks) and toks[j2].text == "(":
                        depth = 0
                        while j2 < len(toks):
                            if toks[j2].text == "(":
                                depth += 1
                            elif toks[j2].text == ")":
                                depth -= 1
                                if depth == 0:
                                    j2 += 1
                                    break
                            j2 += 1
                    if (
                        j2 < len(toks)
                        and toks[j2].text == "="
                        and toks[j2].line == t.line
                    ):
                        continue
            stack.append(k)
        elif w == "end":
            if stack:
                match_end[stack.pop()] = k

    class_stack: List[Tuple[int, str]] = []
    for k, t in enumerate(toks):
        if t.kind != ID or k not in match_end:
            continue
        while class_stack and k > class_stack[-1][0]:
            class_stack.pop()
        parent = class_stack[-1][1] if class_stack else None
        end = match_end[k]
        if t.text in ("class", "module") and k + 1 < n and toks[k + 1].kind == ID:
            name = toks[k + 1].text
            extends = None
            if k + 3 < n and toks[k + 2].text == "<" and toks[k + 3].kind == ID:
                extends = toks[k + 3].text
            defs.append(
                RawDef(name, UnitType.CLASS, k, k + 1, k + 2, end,
                       parent=parent, extends=extends)
            )
            class_stack.append((end, name))
        elif t.text == "def" and k + 1 < n:
            j = k + 1
            if toks[j].kind == ID and toks[j].text == "self" and j + 2 < n and toks[j + 1].text == ".":
                j += 2
            if toks[j].kind != ID:
                continue
            name = toks[j].text
            # trailing ? or ! belongs to the method name
            if j + 1 < n and toks[j + 1].kind == PUNCT and toks[j + 1].text in "?!":
                name += toks[j + 1].text
                j += 1
            params: List[str] = []
            if j + 1 < n and toks[j + 1].text == "(":
                p_close = _match_bracket(toks, j + 1, "(", ")")
                params = _params_from_slice(toks[j + 2 : p_close], "ruby")
            defs.append(
                RawDef(name, UnitType.METHOD if parent else UnitType.FUNCTION,
                       k, j, j + 1, end, parent=parent, params=params)
            )
    return defs


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

_IMPORT_HEAD = {
    "javascript": ("import", "require"),
    "typescript": ("import", "require"),
    "go": ("import",),
    "rust": ("use",),
    "java": ("import",),
    "csharp": ("using",),
    "c": (),
    "cpp": (),
    "ruby": ("require", "require_relative"),
    "kotlin": ("import",),
    "swift": ("import",),
    "scala": ("import",),
    "php": ("use", "require", "require_once", "include"),
}


def _imports(toks: Sequence[Tok], language: str, content: str) -> List[str]:
    if language in ("c", "cpp"):
        mods = re.findall(r'^\s*#\s*include\s+[<"]([^>"]+)', content, re.M)
        return list(dict.fromkeys(m.split("/")[0].split(".")[0] for m in mods))[:20]
    heads = _IMPORT_HEAD.get(language, ())
    out: List[str] = []

    def add_str(t2):
        mod = t2.text.strip("\"'`").split("/")[0]
        if mod and mod not in out:
            out.append(mod)

    for k, t in enumerate(toks[:600]):
        if t.kind == ID and t.text in heads:
            if (
                language == "go"
                and k + 1 < len(toks)
                and toks[k + 1].text == "("
            ):
                # Grouped form: import ( "a" alias "b" ... )
                for t2 in toks[k + 2 :]:
                    if t2.kind == PUNCT and t2.text == ")":
                        break
                    if t2.kind == STR:
                        add_str(t2)
                continue
            for t2 in toks[k + 1 : k + 12]:
                if t2.kind == STR:
                    add_str(t2)
                    break
                if t2.kind == ID and language in (
                    "rust", "java", "csharp", "go", "kotlin", "swift",
                    "scala", "php",
                ):
                    if t2.text not in out and t2.text not in ("static",):
                        out.append(t2.text)
                    break
    return out[:20]


def parse_structured(
    path: str, content: str, language: str
) -> Optional[Tuple[List[CodeUnit], List[bool]]]:
    """Full structural extraction. Returns (units, covered-lines mask) — the
    caller turns uncovered regions into RawCode chunks — or None when
    `language` is unsupported (falls back to the regex layer)."""
    if language not in SUPPORTED:
        return None
    toks = tokenize(content, language)
    if not toks:
        return [], []
    defs = _find_defs(toks, language)
    lines = content.splitlines()
    imports = _imports(toks, language, content)
    units: List[CodeUnit] = []
    covered = [False] * len(lines)
    for d in defs:
        head_line = toks[d.def_idx].line
        end_line = toks[d.body_end].line + toks[d.body_end].text.count("\n")
        body_toks = [
            t
            for t in toks[d.body_start : d.body_end + 1]
            if t.kind in (ID, PUNCT)
        ]
        calls, comp, loops, branches, errors, variables = _analyze(
            body_toks, d.name, language
        )
        signature = " ".join(
            ln.strip()
            for ln in lines[head_line - 1 : min(toks[d.body_start].line, head_line + 2)]
        )
        signature = signature.split("{")[0].strip()[:200]
        qualified = f"{d.parent}.{d.name}" if d.parent else d.name
        units.append(
            CodeUnit(
                name=d.name,
                qualified_name=qualified,
                file=path,
                line=head_line,
                end_line=min(end_line, len(lines)),
                language=language,
                unit_type=d.unit_type,
                signature=signature,
                docstring=_docstring(toks, d.def_idx, head_line),
                parameters=d.params or [],
                return_type=d.return_type,
                parent_class=d.parent if d.unit_type == UnitType.METHOD else None,
                extends=d.extends,
                calls=calls,
                complexity=comp,
                has_loops=loops,
                has_branches=branches,
                has_error_handling=errors,
                variables=variables,
                imports=imports,
                code="\n".join(lines[head_line - 1 : min(end_line, len(lines))]),
            )
        )
        for ln in range(head_line - 1, min(end_line, len(lines))):
            covered[ln] = True
    return units, covered
