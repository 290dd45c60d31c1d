#!/usr/bin/env python
"""Adversarial-corpus oracle sweep.

Derives a corpus from a base SF dir by appending edge-case documents
(empty / whitespace-only / NFC-vs-NFD unicode / CJK / emoji / RTL /
regex metacharacters / pipe+backslash hash-separator payloads / broken
HTML / mega-docs / NULL-lookalike strings / zero-width chars) and
edge-case embeddings (zero vector, exact duplicate, negation, axis
unit, denormal-tiny, large-magnitude, constant), then runs the exact
driver-style gate (scripts/check_oracle.py) over EVERY registry query
on the derived corpus.

The point: Spark and the DuckDB oracle must agree not just on the
well-behaved synthetic corpus but on the junk a 100 TB web crawl
actually contains. The round-3 BPE token-count bug was exactly this
class (divergence only on inputs absent from the generator's
vocabulary); this sweep hunts the rest of that class.

Deliberately OUT of scope (outside the generator's data contract,
documented rather than injected): NULL text/lang, NaN/Inf embedding
components, negative doc_ids.

Excluded queries (see EXCLUDED): a query whose DuckDB oracle is BY
DESIGN pinned to the generator vocabulary (a VALUES lookup that
verifies the tokenize→sum plumbing, not the open-vocabulary counts —
textstats._bpe_sql) cannot be graded on out-of-vocabulary input; the
kernel's behavior on adversarial strings is covered directly by unit
tests (tests/test_text_analyzer.py adversarial/perf cases) instead.

Usage:
    python scripts/adversarial_sweep.py [base_sf_dir] [--keep]
Exit code = check_oracle's exit code (0 iff every query matches).
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

from pdf_extractor_spark.analytics.base import TABLES  # noqa: E402

# doc_id/vec_id base far above both the generator's range and the
# injected-duplicate offset (base.DUP_ID_OFFSET = 1_000_000) so the
# adversarial rows never collide with in-query unions.
ADV_ID_BASE = 9_000_000

# (text, lang) pairs; source is always "adv", n_chars = len(text).
ADV_DOCS: list[tuple[str, str]] = [
    ("", "en"),                                  # empty
    ("   \t\n\r  ", "en"),                       # whitespace-only
    (" ", "en"),                                 # single space
    ("a", "en"),                                 # single char
    ("caf\u00e9 r\u00e9sum\u00e9 na\u00efve protocol", "fr"),  # NFC
    ("cafe\u0301 re\u0301sume\u0301 nai\u0308ve protocol", "fr"),  # NFD
    ("漢字テスト中文処理", "zh"),  # CJK, no spaces
    ("\U0001f680 emoji \U0001f389 test \U0001f9ea données", "fr"),
    ("שלום עולם مرحبا بالعالم", "ar"),  # RTL + unseen lang
    (".*+?[](){}|\\^$ regex |pipe|delim\\back\\slash", "en"),
    ("<div><p>unclosed <b>bold <script>alert('x')</script> &amp; &lt;tag&gt; &nbsp;&#65;", "en"),
    ("word " * 20000, "en"),                     # 100k-char repeated token
    ("x" * 50000, "en"),                         # single 50k-char token
    ("NULL", "en"),
    ("NaN None nan null True False", "en"),
    ("1234567890 42 -3.14 1e10 0x1F", "en"),
    ("!!! ??? ... ,,, ;;; ---", "en"),
    ("line1\nline2\r\nline3\ttab  double-space", "en"),
    ("word\u200bzero\u200dwidth \ufeffBOM joined", "en"),  # zero-width + BOM
    ("Ñ ñ Ü ü ß ẞ İ ı case fold", "de"),
    # exact-dup pair for the dedup family
    ("duplicate adversarial payload text for exact dedup checks", "en"),
    ("duplicate adversarial payload text for exact dedup checks", "en"),
    # near-dup pair (one token differs) for MinHash/Jaccard/SimHash
    ("naïve café protocol test sequence alpha beta gamma delta epsilon", "en"),
    ("naïve café protocol test sequence alpha beta gamma delta zeta", "en"),
]


def adv_embeddings(base_rows: list) -> list[tuple[int, list[float], int]]:
    """Edge-case vectors; ids aligned with ADV_ID_BASE."""
    dim = len(base_rows[0][1])
    v0 = [float(x) for x in base_rows[0][1]]
    return [
        (ADV_ID_BASE + 0, [0.0] * dim, 0),                      # zero vector
        (ADV_ID_BASE + 1, v0, int(base_rows[0][2])),            # exact dup of vec 0
        (ADV_ID_BASE + 2, [-x for x in v0], int(base_rows[0][2])),  # negation
        (ADV_ID_BASE + 3, [1.0] + [0.0] * (dim - 1), 1),        # axis unit
        (ADV_ID_BASE + 4, [1e-30] * dim, 2),                    # denormal-tiny
        (ADV_ID_BASE + 5, [1e18] * dim, 3),                     # large (fits f32 dot)
        (ADV_ID_BASE + 6, [0.125] * dim, 4),                    # constant
    ]


def build_corpus(base_dir: str, out_dir: str) -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        src = Path(base_dir) / f"{t}.parquet"
        if t not in ("documents", "embeddings"):
            shutil.copy(src, out / f"{t}.parquet")
            continue
        base = pq.read_table(src)
        if t == "documents":
            rows = [
                {
                    "doc_id": ADV_ID_BASE + i,
                    "text": text,
                    "lang": lang,
                    "source": "adv",
                    "n_chars": len(text),
                }
                for i, (text, lang) in enumerate(ADV_DOCS)
            ]
        else:
            first = base.slice(0, 1).to_pylist()[0]
            rows = [
                {"vec_id": vid, "embedding": vec, "label": lab}
                for vid, vec, lab in adv_embeddings(
                    [(first["vec_id"], first["embedding"], first["label"])]
                )
            ]
        extra = pa.Table.from_pylist(rows, schema=base.schema)
        pq.write_table(pa.concat_tables([base, extra]), out / f"{t}.parquet")


EXCLUDED = {
    "doc_token_count_bpe": (
        "oracle is a VALUES lookup pinned to the generator vocabulary "
        "(plumbing check by documented design); OOV counts are NULL "
        "there while the real BPE kernel counts any input — kernel "
        "adversarial behavior is unit-tested directly"
    ),
    "tokenizer_fertility": (
        "same class as doc_token_count_bpe: the per-language fertility "
        "oracle anchors BPE counts in the identical generator-pinned "
        "VALUES table, so OOV adversarial docs contribute NULL there "
        "while the real kernel counts them; the kernel's adversarial "
        "behavior is covered by tests/test_text_analyzer.py"
    ),
}


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--keep"]
    keep = "--keep" in sys.argv[1:]
    base = args[0] if args else "/root/testdata/sf0.01"
    tmp = tempfile.mkdtemp(prefix="adv_corpus_")
    build_corpus(base, tmp)
    print(f"adversarial corpus at {tmp} (base {base})")
    only = args[1:]
    if not only:
        from pdf_extractor_spark.analytics import QUERIES

        only = [n for n in QUERIES if n not in EXCLUDED]
        for n, why in EXCLUDED.items():
            print(f"excluded  {n}: {why}")
    rc = subprocess.call(
        [sys.executable, "scripts/check_oracle.py", tmp] + only
    )
    if keep:
        print(f"kept: {tmp}")
    else:
        shutil.rmtree(tmp, ignore_errors=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
