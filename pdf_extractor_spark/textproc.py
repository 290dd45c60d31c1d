"""Pure-Python text primitives shared by the Arrow UDFs and the test oracle.

Each function re-implements (from public stdlib only) the observable
behavior of a reference routine; citations are ``path:line`` into the
reference checkout. None of these run per-row on the driver — they are
invoked inside Arrow-batched pandas UDFs on executors.
"""

from __future__ import annotations

import hashlib
import html as _html
import re
import unicodedata

# ---------------------------------------------------------------------------
# hashing  (reference: markdown_extractor.py:79-82 — md5 hexdigest of text)
# ---------------------------------------------------------------------------


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# title cleanup  (reference: markdown_extractor.py:116-140 clean_section_title)
#
# The reference uses ftfy.fix_text(normalization="NFC"); ftfy is not
# available here, and on well-formed (non-mojibake) input its effect is
# NFC normalization — which is what we apply. Category-C (control)
# character stripping and the optional NFKD→ascii fold match the
# reference exactly.
# ---------------------------------------------------------------------------


# ASCII fast path: for pure-ASCII input NFC and NFKD are identity and
# category-C characters are exactly C0 controls + DEL — a translate()
# table replaces the per-char category scan (hot path: every heading).
_ASCII_CTRL_DELETE = {c: None for c in (*range(0x20), 0x7F)}


def clean_title(title: str, to_ascii: bool = False) -> str:
    try:
        if title.isascii():
            cleaned = title.translate(_ASCII_CTRL_DELETE).strip()
            return cleaned if cleaned else "Unnamed Section"
        cleaned = unicodedata.normalize("NFC", title)
        cleaned = "".join(c for c in cleaned if unicodedata.category(c)[0] != "C")
        if to_ascii:
            cleaned = (
                unicodedata.normalize("NFKD", cleaned)
                .encode("ascii", "ignore")
                .decode("ascii")
            )
        cleaned = cleaned.strip()
        return cleaned if cleaned else "Unnamed Section"
    except Exception:
        return "Unnamed Section"


# ---------------------------------------------------------------------------
# token counting  (reference: markdown_extractor.py:237,287 — tiktoken gpt-4)
#
# tiktoken is not available in this environment; token_count is metadata
# only (excluded from the span-equality tuple per BASELINE.json), so we
# use a documented BPE-ish proxy: alphanumeric runs and individual
# punctuation marks each count as one token.
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")


def token_count(text: str) -> int:
    return len(_TOKEN_RE.findall(text))


# ---------------------------------------------------------------------------
# HTML boilerplate stripping
# (reference: llm_integration/utils/corpus_utils.py:138-147 — html2text
#  followed by bleach.clean(tags=[], strip=True), i.e. DOM → plain text
#  with boilerplate containers dropped. html2text/bleach are not
#  available; this is a deterministic regex re-implementation of the
#  same contract: boilerplate containers removed with their content,
#  block boundaries become newlines, all remaining tags stripped,
#  entities unescaped, whitespace collapsed.)
# ---------------------------------------------------------------------------

_BOILERPLATE_RE = re.compile(
    r"<(script|style|nav|header|footer|aside|noscript)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_RE = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|blockquote|pre)\b[^>]*/?>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_MULTI_NL_RE = re.compile(r"\n{2,}")
_SPACES_RE = re.compile(r"[ \t\f\v]+")


def html_to_text(html_src: str) -> str:
    text = _COMMENT_RE.sub(" ", html_src)
    text = _BOILERPLATE_RE.sub(" ", text)
    text = _BLOCK_RE.sub("\n", text)
    text = _TAG_RE.sub(" ", text)
    text = _html.unescape(text)
    lines = [_SPACES_RE.sub(" ", ln).strip() for ln in text.split("\n")]
    text = "\n".join(ln for ln in lines if ln)
    return _MULTI_NL_RE.sub("\n", text).strip()
