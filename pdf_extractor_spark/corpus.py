"""Deterministic synthetic interleaved-document corpus.

The north-rule input shape (BASELINE.json ``input_hint``):
    doc_id: string,
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

Span content mirrors the reference's own embedded test document
(markdown_extractor.py:696-732): headings (numbered and unnumbered), blank
-line-separated paragraphs, markdown tables — including a consecutive-page
pair with identical 5-column headers that MUST merge and a 3-column table
that must NOT (improved_table_merger.py:316-388) — page markers, images,
python code fences, and HTML spans with boilerplate
(tests/corpus/test_corpus.html shape).

Generation is a pure function of ``doc_id`` (seeded stdlib ``random``),
so the corpus can be synthesized *distributed* — ``spark.range(n)``
then a pandas UDF maps ids to span arrays; the driver never holds the
corpus. Every ``mega_every``-th doc is a "mega-doc" with ~``mega_factor``×
the median span count, to exercise the skew path (SURVEY.md §7.4 #4).
"""

from __future__ import annotations

import random
from typing import Any, Dict, List

WORDS = (
    "branch history table entry memory address virtual prediction status "
    "instruction module signal clock reset subsystem cache execute frontend "
    "logic update resolve fetch stage pipeline register vector scalar"
).split()

MERGE_HEADERS = ["Signal", "IO", "Description", "Connection", "Type"]
NOMERGE_HEADERS = ["Different", "Header", "Structure"]

HTML_TEMPLATE = (
    "<html><head><title>T{i}</title><style>p{{color:red}}</style></head>"
    "<body><nav><a href='/'>home</a></nav>"
    "<h1>Doc {i} heading</h1><p>First html paragraph {w0} &amp; {w1}.</p>"
    "<script>var x = 1;</script>"
    "<div>Second block {w2}.</div>"
    "<footer>copyright</footer></body></html>"
)


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _table_lines(headers: List[str], rows: List[List[str]]) -> List[str]:
    lines = ["| " + " | ".join(headers) + " |"]
    lines.append("|" + "|".join("---" for _ in headers) + "|")
    lines.extend("| " + " | ".join(r) + " |" for r in rows)
    return lines


def make_doc_spans(
    doc_id: int, mega_every: int = 0, mega_factor: int = 100
) -> List[Dict[str, Any]]:
    """Span list for one document; deterministic in ``doc_id``."""
    rng = random.Random(0xC0FFEE ^ (doc_id * 2654435761 % 2**32))
    spans: List[Dict[str, Any]] = []

    def add(kind: str, text: str, media_ref: str = "") -> None:
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": len(spans)}
        )

    is_mega = mega_every > 0 and doc_id % mega_every == mega_every - 1
    n_sections = (3 + doc_id % 3) * (mega_factor if is_mega else 1)

    add("heading", f"# {doc_id % 7 + 1}.{doc_id % 4 + 1}. Document {doc_id} overview")
    add("text", _sentence(rng, 12) + ".")
    add("text", _sentence(rng, 9) + ".")
    add("text", "")  # paragraph break
    add("text", _sentence(rng, 10) + ".")

    page = 1
    for s in range(n_sections):
        add("heading", f"## Section {chr(65 + s % 26)} details")
        add("text", _sentence(rng, 14) + ".")
        variant = (doc_id + s) % 5
        if variant == 0:
            # multi-page mergeable table pair: identical 5-col headers on
            # consecutive pages (golden: BHT_CV32A65X_expected.json
            # is_multi_page=true, page_range "1-2")
            rows1 = [[f"sig{s}_{r}", "in", _sentence(rng, 3), "SUBSYSTEM", "logic"] for r in range(2)]
            rows2 = [[f"sig{s}_{r+2}", "out", _sentence(rng, 3), "CACHE", "logic"] for r in range(2)]
            for ln in _table_lines(MERGE_HEADERS, rows1):
                add("table_row", ln)
            page += 1
            add("page_marker", f"<!-- page: {page} -->")
            for ln in _table_lines(MERGE_HEADERS, rows2):
                add("table_row", ln)
            add("text", _sentence(rng, 6) + ".")
        elif variant == 1:
            rows = [[f"v{r}", _sentence(rng, 2), str(r * 3)] for r in range(3)]
            for ln in _table_lines(NOMERGE_HEADERS, rows):
                add("table_row", ln)
        elif variant == 2:
            add("image", f"![figure {s}](img_{doc_id}_{s}.png)", f"s3://media/img_{doc_id}_{s}.png")
            add("text", _sentence(rng, 8) + ".")
        elif variant == 3:
            add(
                "code",
                f"def handler_{s}(x):\n    return x * {s + 1}\n",
            )
        else:
            add(
                "html",
                HTML_TEMPLATE.format(
                    i=s, w0=rng.choice(WORDS), w1=rng.choice(WORDS), w2=rng.choice(WORDS)
                ),
            )
        if s % 2 == 1:
            page += 1
            add("page_marker", f"<!-- page: {page} -->")
        add("text", "")
        add("text", _sentence(rng, 11) + ".")

    add("heading", f"### 9.9.{doc_id % 5}. Numbered closing section")
    add("text", _sentence(rng, 7) + ".")
    return spans


def corpus_rows(
    n_docs: int, mega_every: int = 0, mega_factor: int = 100
) -> List[Dict[str, Any]]:
    """Driver-side materialization (small corpora / tests only)."""
    return [
        {"doc_id": f"doc-{i:07d}", "spans": make_doc_spans(i, mega_every, mega_factor)}
        for i in range(n_docs)
    ]


def corpus_df(spark, n_docs: int, mega_every: int = 0, mega_factor: int = 100,
              partitions: int = 0):
    """Distributed corpus synthesis: spark.range → mapInPandas generator.

    The generator runs inside Arrow batches on executors; at 10^12-doc
    scale this is how the input table would be bootstrapped (in
    production the spans table is an Iceberg table — parquet stands in
    for it in this sandbox)."""
    import pandas as pd  # noqa: F401 (executor-side)

    from .schema import DOCS_SCHEMA

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield _batch_to_pdf(ids, mega_every, mega_factor)

    rng_df = spark.range(n_docs)
    if partitions:
        rng_df = rng_df.repartition(partitions)
    return rng_df.mapInPandas(gen, schema=DOCS_SCHEMA)


def _batch_to_pdf(ids, mega_every: int, mega_factor: int):
    import pandas as pd

    return pd.DataFrame(
        {
            "doc_id": [f"doc-{i:07d}" for i in ids],
            "spans": [make_doc_spans(i, mega_every, mega_factor) for i in ids],
        }
    )


def corpus_fingerprint(**params) -> str:
    """Cache key for staged bench corpora: hashes this WHOLE module's
    source plus the generation params, so editing any part of the
    generation path (make_doc_spans, corpus_rows, corpus_df, id
    mapping, partitioning) invalidates /tmp caches instead of silently
    timing a stale corpus."""
    import hashlib

    with open(__file__) as f:
        src = f.read()
    blob = src + "|" + "|".join(f"{k}={params[k]}" for k in sorted(params))
    return hashlib.md5(blob.encode()).hexdigest()[:10]
