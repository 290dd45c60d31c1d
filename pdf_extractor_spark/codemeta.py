"""Code-element metadata: deterministic tree-sitter stand-in.

The reference batch-attaches ``metadata.code_metadata =
extract_code_metadata(content, code_type)`` to every code element
(markdown_extractor.py:627-636; per-fence call at :535), with
``code_type`` = fence info first word lowercased, else the file suffix
(:529-534). ``tree_sitter_utils`` itself is dangling in the checkout,
so the call sites plus the repo's own expected fixture
(context7/pdf_extractor/markdown_extractor.py:719 —
``{"language": "python", "length": 54, "functions": ["hello_world"]}``)
define the output contract: the language, ``length = len(code)``, and
the defined function names. We additionally carry each function's
parameter names — the metadata a tree-sitter pass yields for the
regular ``def``/``fn``/``func``/``function`` signature subset.

Engine-defined divergences (documented, docs/PARITY.md style):

* Our span input ``(kind, text, media_ref, offset)`` carries neither a
  fence info string nor a file path, so when ``info`` is not supplied
  the language comes from deterministic content heuristics (ordered
  regex rules below) instead of the reference's file-suffix fallback.
* ``functions`` entries are ``{name, params}`` structs rather than bare
  names; the name list projected out of them matches the reference
  fixture exactly.

Everything here is pure Python + stdlib ``re`` — it runs inside the
Arrow-batched extraction kernel (operators/extract.py) only on code
elements, and doubles as the unit-test oracle.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

# --- signature extractors (the "regular subset": one-line signatures,
# un-nested parens — what tree-sitter's function_definition query yields
# on straightforward code) -------------------------------------------------

_PY_DEF_RE = re.compile(r"(?m)^\s*(?:async\s+)?def\s+([A-Za-z_]\w*)\s*\(([^)]*)\)")
_RS_FN_RE = re.compile(
    r"(?m)^\s*(?:pub(?:\([^)]*\))?\s+)?(?:async\s+)?(?:unsafe\s+)?fn\s+"
    r"([A-Za-z_]\w*)(?:<[^>]*>)?\s*\(([^)]*)\)"
)
_GO_FUNC_RE = re.compile(r"(?m)^\s*func\s+(?:\([^)]*\)\s*)?([A-Za-z_]\w*)\s*\(([^)]*)\)")
_JS_FUNC_RE = re.compile(
    r"(?m)^\s*(?:export\s+)?(?:async\s+)?function\s*\*?\s+([A-Za-z_$]\w*)\s*\(([^)]*)\)"
)
_JS_ARROW_RE = re.compile(
    r"(?m)^\s*(?:export\s+)?(?:const|let|var)\s+([A-Za-z_$]\w*)\s*=\s*"
    r"(?:async\s*)?\(([^)]*)\)\s*=>"
)

# --- language classification heuristics (ordered; first hit wins) ---------

_PY_HINT_RE = re.compile(r"(?m)^\s*(?:import\s+\w|from\s+\w[\w.]*\s+import\b)")
_JAVA_HINT_RE = re.compile(
    r"(?m)^\s*(?:public|private|protected)\s+(?:static\s+|final\s+)*[\w<>\[\]]+\s+\w+"
)
_SQL_HINT_RE = re.compile(r"(?is)^\s*(select|with\s|insert\s|create\s|update\s|delete\s)")
_SH_HINT_RE = re.compile(r"(?m)^#!|^\s*(?:echo|export|cd|set\s+-)\s")
_HTML_HINT_RE = re.compile(r"^\s*<!?\w")
_JSON_HINT_RE = re.compile(r"^\s*[{\[]")


def classify_code_language(code: str, info: Optional[str] = None) -> str:
    """Fence-info-first language id; deterministic content fallback.

    ``info`` (when the source format preserves the fence info string)
    wins verbatim: first whitespace token, lowercased — exactly the
    reference's ``token.info.split()[0].lower()``
    (markdown_extractor.py:529-531). Without it, ordered content
    heuristics decide; unknown content classifies as ``"text"``.
    """
    if info and info.strip():
        return info.split()[0].lower()
    code = code or ""
    if _PY_DEF_RE.search(code) or _PY_HINT_RE.search(code):
        return "python"
    if _RS_FN_RE.search(code):
        return "rust"
    if _GO_FUNC_RE.search(code) or re.match(r"^\s*package\s+\w+\s*$", code.split("\n", 1)[0]):
        return "go"
    if _JS_FUNC_RE.search(code) or _JS_ARROW_RE.search(code):
        return "javascript"
    if _JAVA_HINT_RE.search(code):
        return "java"
    if _SQL_HINT_RE.search(code):
        return "sql"
    if _SH_HINT_RE.search(code):
        return "shell"
    if _HTML_HINT_RE.search(code):
        return "html"
    if _JSON_HINT_RE.search(code):
        return "json"
    return "text"


def _py_params(raw: str) -> List[str]:
    out = []
    for p in raw.split(","):
        p = p.strip().lstrip("*").strip()
        if not p:
            continue
        name = p.split(":", 1)[0].split("=", 1)[0].strip()
        if name:
            out.append(name)
    return out


def _rs_params(raw: str) -> List[str]:
    out = []
    for p in raw.split(","):
        p = p.strip()
        if not p or p.replace("&", "").replace("mut", "").strip() == "self":
            continue
        name = p.split(":", 1)[0].strip()
        if name.startswith("mut "):
            name = name[4:].strip()
        if name:
            out.append(name)
    return out


def _go_params(raw: str) -> List[str]:
    # "a, b int, c string" — each comma group's FIRST token is a name
    # (grouped names share the trailing type; regular subset only).
    out = []
    for p in raw.split(","):
        p = p.strip()
        if not p:
            continue
        name = p.split()[0].strip()
        if name:
            out.append(name)
    return out


def _js_params(raw: str) -> List[str]:
    out = []
    for p in raw.split(","):
        p = p.strip().lstrip(".").strip()
        if not p:
            continue
        name = p.split("=", 1)[0].split(":", 1)[0].strip()
        if name:
            out.append(name)
    return out


_EXTRACTORS = {
    "python": ((_PY_DEF_RE,), _py_params),
    "rust": ((_RS_FN_RE,), _rs_params),
    "go": ((_GO_FUNC_RE,), _go_params),
    "javascript": ((_JS_FUNC_RE, _JS_ARROW_RE), _js_params),
}
# common fence aliases → extractor key
_LANG_ALIASES = {"py": "python", "python3": "python", "rs": "rust", "golang": "go",
                 "js": "javascript", "jsx": "javascript", "ts": "javascript",
                 "typescript": "javascript"}


def extract_functions(code: str, language: str) -> List[Dict[str, Any]]:
    """Defined functions (name + parameter names) for the regular
    signature subset of python/rust/go/javascript; other languages
    yield an empty list (the reference's minimal fallback does too —
    markdown_extractor.py:75-78 returns no functions key at all,
    context7 mock :91-97 returns ``[]``)."""
    spec = _EXTRACTORS.get(_LANG_ALIASES.get(language, language))
    if spec is None:
        return []
    regexes, param_fn = spec
    out: List[Dict[str, Any]] = []
    for rx in regexes:
        for m in rx.finditer(code or ""):
            out.append({"name": m.group(1), "params": param_fn(m.group(2))})
    return out


def extract_code_metadata(
    code: str, language: Optional[str] = None, info: Optional[str] = None
) -> Dict[str, Any]:
    """The ``code_metadata`` contract: language, length, functions.

    ``length = len(code)`` and the language/functions keys mirror the
    reference's own expected fixture
    (context7/pdf_extractor/markdown_extractor.py:719).
    """
    lang = language or classify_code_language(code, info)
    return {
        "language": lang,
        "length": len(code or ""),
        "functions": extract_functions(code or "", lang),
    }
