"""Pure-Python text primitives shared by the Arrow UDFs and the test oracle.

Each function re-implements (from public stdlib only) the observable
behavior of a reference routine; citations are ``path:line`` into the
reference checkout. None of these run per-row on the driver — they are
invoked inside Arrow-batched pandas UDFs on executors.
"""

from __future__ import annotations

import functools
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


# ---------------------------------------------------------------------------
# text_en analyzer parity  (reference: ArangoSearch views are built with
# the built-in ``text_en`` analyzer — arangodb/config.py:25-26 — i.e.
# lowercase + accent removal + English stemming, no stopword removal.
# Re-implemented from the published Porter algorithm (M.F. Porter 1980,
# "An algorithm for suffix stripping") — pure stdlib, no copied code.
# Verified against a pinned fixture of the paper's own example words
# (tests/test_text_analyzer.py).
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    ch = w[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in the [C](VC)^m[V] form of the stem."""
    m, i, n = 0, 0, len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    break
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


_WORD_RE = re.compile(r"[a-z0-9]+")


def text_en_tokens(text: str) -> list[str]:
    """The ``text_en`` analyzer: lowercase → accent strip (NFKD, drop
    combining marks) → alnum segmentation → Porter stem per token. No
    stopword removal (ArangoDB's built-in text_en ships an empty
    stopword list).

    Residual non-ascii after decomposition (ß, CJK, emoji) is left in
    place so the ``[a-z0-9]+`` segmentation treats it as a SEPARATOR —
    NOT deleted: ascii-encode-ignore would fuse "straße" into "strae"
    while the DuckDB oracle (``strip_accents(lower(text))`` + the same
    regex) yields ["stra","e"]. The two transforms are token-identical
    on every adversarial-sweep case; the one known residual gap is
    NFKD's extra compatibility decompositions (the ﬁ ligature → "fi"
    here, kept intact by strip_accents' NFD-style map) — see
    docs/PARITY.md."""
    lowered = text.lower()
    if not lowered.isascii():
        lowered = "".join(
            c
            for c in unicodedata.normalize("NFKD", lowered)
            if not unicodedata.combining(c)
        )
    return [porter_stem(t) for t in _WORD_RE.findall(lowered)]


# ---------------------------------------------------------------------------
# A7 upgrade — real BPE token counting
# (reference: markdown_extractor.py:237,287 counts tokens with
# tiktoken's GPT-4 BPE. tiktoken + its vocabulary are unavailable
# offline, so this applies the SAME algorithm — greedy lowest-rank
# byte-pair merging, exactly tiktoken's apply loop — over a vendored
# merges table trained deterministically on the test corpus
# (scripts/train_bpe.py). Vocabulary divergence vs GPT-4 is quantified
# in docs/PARITY.md item 4; the alnum-run proxy `token_count` above is
# kept for the metadata column whose fixture predates this.)
# ---------------------------------------------------------------------------

_BPE_EOW = "</w>"


def _bpe_ranks() -> dict[tuple[str, str], int]:
    from .bpe_vocab import MERGES

    return {pair: i for i, pair in enumerate(MERGES)}


_BPE_RANKS = _bpe_ranks()


def bpe_segments(word: str, ranks: dict | None = None) -> list[str]:
    """Split one word into BPE symbols: start from characters + the
    end-of-word marker, repeatedly merge the adjacent pair with the
    LOWEST rank in the merges table (the tiktoken/Sennrich apply loop)
    until no mergeable pair remains. ``ranks`` overrides the vendored
    table (unit tests drive the algorithm with hand-built tables)."""
    if ranks is None:
        ranks = _BPE_RANKS
    parts = list(word) + [_BPE_EOW]
    while len(parts) > 1:
        best_rank, best_i = None, -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pair = (parts[best_i], parts[best_i + 1])
        merged = pair[0] + pair[1]
        # merge every adjacent occurrence of this exact pair, left→right
        out, i = [], 0
        while i < len(parts):
            if i < len(parts) - 1 and (parts[i], parts[i + 1]) == pair:
                out.append(merged)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    # a bare end-of-word marker is a boundary, not a token
    return [p for p in parts if p != _BPE_EOW]


@functools.lru_cache(maxsize=65_536)
def _bpe_word_len(word: str) -> int:
    # bounded per-process cache: executor python workers are long-lived
    # and real corpora carry unbounded distinct tokens (ids, hashes) —
    # an unbounded dict would grow for the worker's whole life
    return len(bpe_segments(word))


def bpe_token_count(text: str) -> int:
    """Whitespace pre-tokenization, then BPE symbols per word."""
    return sum(_bpe_word_len(w) for w in text.split())


# ---------------------------------------------------------------------------
# S11 — OCR text normalization
# (reference scope: the OCR source path is inert in the reference
# checkout — SURVEY.md maps S11 as scoped-out — but raw OCR passthrough
# leaves line-break hyphenation and ligature artifacts in the text
# column. This is the minimal deterministic cleanup an OCR span gets
# before entering the ordinary text path: de-hyphenate words split
# across line breaks, fold the ligature/quote codepoints OCR engines
# emit, join intra-paragraph line breaks, collapse whitespace.)
# ---------------------------------------------------------------------------

_OCR_HYPHEN_RE = re.compile(r"([A-Za-z])-[ \t]*\n[ \t]*([a-z])")
_OCR_LINEBREAK_RE = re.compile(r"[ \t]*\n[ \t]*")
_OCR_SPACES_RE = re.compile(r"[ \t\f\v]+")
_OCR_CHARMAP = str.maketrans(
    {
        "ﬁ": "fi", "ﬂ": "fl", "ﬀ": "ff",
        "ﬃ": "ffi", "ﬄ": "ffl",
        "‘": "'", "’": "'",
        "“": '"', "”": '"',
        "–": "-", "—": "-",
        " ": " ",
    }
)


def ocr_normalize(text: str) -> str:
    t = text.translate(_OCR_CHARMAP)
    # "exam-\nple" → "example" (hyphen at line end + lowercase continuation)
    t = _OCR_HYPHEN_RE.sub(r"\1\2", t)
    # remaining line breaks are layout, not semantics → single space
    t = _OCR_LINEBREAK_RE.sub(" ", t)
    return _OCR_SPACES_RE.sub(" ", t).strip()
