"""Document sources and sinks (SURVEY.md §2.1).

S4  JSON source            → spark.read.json with the explicit span schema
S5  txt/md source          → binaryFile scan + utf-8→latin-1 decode fallback
S6  directory glob source  → pathGlobFilter + recursiveFileLookup options
S7  markdown line classifier → line → span-kind state machine (code fences)
S13 JSON sink              → one JSON document per line (to_json, text sink)

Everything is DataFrame-native; the only Python is the Arrow-batched
decode/classify kernel (mapInPandas), mirroring the reference's
corpus_utils loaders (corpus_utils.py:121-205) Spark-first.
"""

from __future__ import annotations

import os
import re
from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import DOCS_SCHEMA


def _doc_id_from(path: str, root: str) -> str:
    """doc_id = path relative to the input root (basename alone would
    collide for same-named files in different subdirectories, silently
    conflating documents in every doc_id-keyed operator)."""
    p = path[len("file:"):] if path.startswith("file:") else path
    root = os.path.abspath(root)
    rel = os.path.relpath(p, root)
    return rel.replace(os.sep, "/")

_PAGE_RE = re.compile(r"\s*<!--\s*page:\s*\d+\s*-->\s*$")
_TABLE_RE = re.compile(r"^\s*\|.*\|\s*$")
_IMAGE_RE = re.compile(r"^\s*!\[.*\]\(.*\)\s*$")


def lines_to_spans(text: str) -> List[dict]:
    """Markdown-ish line classifier → ordered span dicts (S7).

    Mirrors the reference's markdown tokenizer source
    (markdown_extractor.py:223-226 + the per-token walk) as a line
    state machine: headings, ``|...|`` table rows, image refs, page
    markers, fenced code blocks (fences toggle, content accumulates
    into one code span), raw html lines, everything else text.
    """
    spans: List[dict] = []
    code_buf: List[str] | None = None

    def add(kind: str, line: str, media_ref: str = "") -> None:
        spans.append(
            {"kind": kind, "text": line, "media_ref": media_ref, "offset": len(spans)}
        )

    for line in text.split("\n"):
        if code_buf is not None:
            if line.lstrip().startswith("```"):
                add("code", "\n".join(code_buf))
                code_buf = None
            else:
                code_buf.append(line)
            continue
        if line.lstrip().startswith("```"):
            code_buf = []
        elif _PAGE_RE.match(line):
            add("page_marker", line.strip())
        elif line.lstrip().startswith("#"):
            add("heading", line.strip())
        elif _TABLE_RE.match(line):
            add("table_row", line.strip())
        elif _IMAGE_RE.match(line):
            m = re.match(r"^\s*!\[.*\]\((.*)\)\s*$", line)
            add("image", line.strip(), m.group(1).strip() if m else "")
        elif line.lstrip().startswith("<") and line.rstrip().endswith(">"):
            add("html", line.strip())
        else:
            add("text", line)
    if code_buf is not None:  # unterminated fence: flush as code
        add("code", "\n".join(code_buf))
    return spans


def decode_with_fallback(payload: bytes) -> str:
    """utf-8 then latin-1, mirroring corpus_utils.py:148-165 (S5)."""
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("latin-1")


def read_text_docs(
    spark: SparkSession,
    path: str,
    glob: str = "*.md",
    recursive: bool = True,
) -> DataFrame:
    """Directory of text/markdown files → docs(doc_id, spans).

    One document per file; doc_id = file name relative-ish (base name).
    The glob/recursion ride the DataFrame reader (S6) so partition
    planning and file listing stay on the JVM; decode + classify run
    in Arrow batches (S5/S7).
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
        .select("path", "content")
    )

    root = path

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": [_doc_id_from(p, root) for p in pdf["path"]],
                    "spans": [
                        lines_to_spans(decode_with_fallback(bytes(c)))
                        for c in pdf["content"]
                    ],
                }
            )

    return files.mapInPandas(gen, schema=DOCS_SCHEMA)


def read_docs_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines of {doc_id, spans:[{kind,text,media_ref,offset}]} (S4).

    Explicit schema — never schema inference at scale."""
    return spark.read.schema(DOCS_SCHEMA).json(path)


def write_docs_json(docs: DataFrame, path: str) -> None:
    """docs/extracted → one JSON object per line (S13 sink shape:
    the reference dumps an ordered element list per document,
    api.py:564-568)."""
    docs.select(F.to_json(F.struct(*docs.columns)).alias("value")).write.mode(
        "overwrite"
    ).text(path)


# ---------------------------------------------------------------------------
# S1/S2 — PDF byte-stream source (pure-Python content-stream parser)
# ---------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_BT_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_TD_NEWLINE_RE = re.compile(rb"T\*|\bTd\b|\bTD\b")


def _pdf_unescape(raw: bytes) -> str:
    out = []
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            # octal escapes \d, \dd, \ddd (PDF 32000-1 §7.3.4.2) — the
            # standard way writers embed literal parens in strings
            if nxt in (b"0", b"1", b"2", b"3", b"4", b"5", b"6", b"7"):
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j] in b"01234567":
                    j += 1
                out.append(chr(int(raw[i + 1 : j], 8) & 0xFF))
                i = j
                continue
            out.append({b"n": "\n", b"t": "\t", b"r": "\r"}.get(nxt, nxt.decode("latin-1")))
            i += 2
        else:
            out.append(c.decode("latin-1"))
            i += 1
    return "".join(out)


def parse_pdf_bytes(data: bytes) -> List[str]:
    """Minimal uncompressed-PDF text extraction (the reference's
    per-page ``page.get_text("text")`` concatenation,
    corpus_utils.py:121-131, rebuilt from the raw byte stream — no
    PDF library in this container).

    Supported subset: uncompressed content streams, ``BT..ET`` text
    objects, ``(..) Tj`` shows, ``[..] TJ`` arrays, ``Td/TD/T*`` as
    line breaks, backslash escapes. One string per page stream, in
    object order (== page order for writers that emit pages in order).
    """
    pages: List[str] = []
    for stream in _STREAM_RE.findall(data):
        chunks: List[str] = []
        for block in _BT_RE.findall(stream):
            # text-positioning operators delimit lines
            segments = _TD_NEWLINE_RE.split(block)
            lines = []
            for seg in segments:
                strs = [_pdf_unescape(s) for s in _STR_RE.findall(seg)]
                if strs:
                    lines.append("".join(strs))
            if lines:
                chunks.append("\n".join(lines))
        if chunks:
            pages.append("\n".join(chunks))
    return pages


def pdf_to_spans(data: bytes) -> List[dict]:
    """PDF bytes → interleaved spans: page markers + classified lines."""
    spans: List[dict] = []
    for pageno, page_text in enumerate(parse_pdf_bytes(data), start=1):
        if pageno > 1:
            spans.append(
                {
                    "kind": "page_marker",
                    "text": f"<!-- page: {pageno} -->",
                    "media_ref": "",
                    "offset": len(spans),
                }
            )
        for s in lines_to_spans(page_text):
            s["offset"] = len(spans)
            spans.append(s)
    return spans


def read_pdf_docs(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """Directory of PDFs → docs(doc_id, spans); parse runs in Arrow
    batches on executors (S1: binaryFile scan → mapInPandas)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )

    root = path

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": [_doc_id_from(p, root) for p in pdf["path"]],
                    "spans": [pdf_to_spans(bytes(c)) for c in pdf["content"]],
                }
            )

    return files.mapInPandas(gen, schema=DOCS_SCHEMA)


# ---------------------------------------------------------------------------
# S17 — Label Studio task sink (reference api.py:190-249
# create_label_studio_tasks: one task per extracted table, shaped
# {"data": {pdf_id, page, pdf_page_url, table_id, source, table_data:
# {headers, rows}}, "meta": {pdf_id, table_id, page}}; batch-imported
# and mirrored to a corrections-dir JSON file). The engine emits the
# same task JSON as a JSON-lines directory — the batch-import payload —
# entirely with native struct/to_json exprs (no driver-side loop; at
# scale this is a distributed export, the HTTP POST stays out of the
# data path). The HITL return trip is operators/corrections.py (S15).
# ---------------------------------------------------------------------------


def label_studio_tasks(elements: DataFrame, source: str = "engine") -> DataFrame:
    """Flat extracted elements → one Label Studio task row per table."""
    tables = elements.filter(F.col("kind") == "table")
    # doc_id carries the source file's relative path INCLUDING its
    # extension; the reference's pdf_id is an extension-less stem used
    # everywhere (api.py:201 formats f"{pdf_id}.pdf") — strip a
    # trailing extension or ids round-trip as "manual.pdf.pdf"
    stem = F.regexp_replace(F.col("doc_id"), r"\.[A-Za-z0-9]+$", "")
    data = F.struct(
        stem.alias("pdf_id"),
        F.col("page"),
        F.concat(
            F.lit("/data/upload/uploads/"),
            stem,
            F.lit(".pdf#page="),
            F.col("page").cast("string"),
        ).alias("pdf_page_url"),
        F.col("section_id").alias("table_id"),
        F.lit(source).alias("source"),
        F.struct(
            F.col("table_headers").alias("headers"),
            F.col("table_rows").alias("rows"),
        ).alias("table_data"),
    )
    meta = F.struct(
        stem.alias("pdf_id"),
        F.col("section_id").alias("table_id"),
        F.col("page"),
    )
    return tables.select(data.alias("data"), meta.alias("meta"))


def write_label_studio_tasks(
    elements: DataFrame, path: str, source: str = "engine"
) -> None:
    """Task rows → JSON-lines directory (the batch-import payload)."""
    tasks = label_studio_tasks(elements, source=source)
    tasks.select(
        F.to_json(F.struct("data", "meta")).alias("value")
    ).write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# load_corpus_from_source dispatch
# (reference llm_integration/utils/corpus_utils.py:67-215 — per-task
#  corpus routing over string / file / directory sources with
#  validation_options; the last uncovered loader surface, SURVEY §2 /
#  VERDICT r3 missing #5. Every individual format loader it routes to
#  already exists (S3-S6): this is the dispatch contract itself.)
# ---------------------------------------------------------------------------

CORPUS_JOIN_SEP = "\n\n---\n\n"  # corpus_utils.py:214 file separator


def _load_corpus_file(path) -> Optional[str]:
    """One file → text, by suffix (corpus_utils.py:117-166):
    .pdf via the byte-stream parser (page texts joined with '\\n',
    the reference's get_text concatenation), .json re-stringified
    with indent=2, .html/.htm through the boilerplate stripper (the
    documented html2text+bleach stand-in), .txt/.md/no-suffix as
    utf-8 text, anything else utf-8-then-latin-1 (decode_with_fallback
    is exactly that ladder). Missing/unreadable → None (skip)."""
    import json as _json
    from pathlib import Path

    from .textproc import html_to_text

    p = Path(path)
    if not p.is_file():
        return None
    suffix = p.suffix.lower()
    try:
        if suffix == ".pdf":
            pages = parse_pdf_bytes(p.read_bytes())
            return "".join(t + "\n" for t in pages)
        if suffix == ".json":
            return _json.dumps(_json.loads(p.read_text("utf-8")), indent=2)
        if suffix in (".html", ".htm"):
            return html_to_text(p.read_text("utf-8"))
        if suffix in (".txt", ".md", ""):
            return p.read_text("utf-8")
        return decode_with_fallback(p.read_bytes())
    except Exception:
        return None  # corpus_utils.py:167-168: log-and-skip


def _corpus_file_list(validation_options: dict) -> Optional[list]:
    """Resolve validation_options to the ordered unit list:
    [("string", text)] or [("file", path), ...]. None → nothing."""
    from pathlib import Path

    source = validation_options.get("corpus_source")
    if not source:
        return None
    # default-type inference (corpus_utils.py:92-94): a string that is
    # not an existing path is a direct string corpus
    default_type = (
        "string"
        if isinstance(source, str)
        and not Path(source).exists()
        and not Path(source).is_dir()
        else "file"
    )
    corpus_type = validation_options.get("corpus_type", default_type)
    if corpus_type == "string":
        return [("string", source)] if isinstance(source, str) else None
    if corpus_type == "file":
        return [("file", source)] if isinstance(source, str) else None
    if corpus_type == "directory":
        if not isinstance(source, str) or not Path(source).is_dir():
            return None
        recursive = validation_options.get("recursive", False)
        patterns = validation_options.get("file_patterns", ["*"])
        if not isinstance(patterns, list):
            patterns = ["*"]
        d = Path(source)
        units = []
        for pattern in patterns:
            glob_method = d.rglob if recursive else d.glob
            for fp in sorted(glob_method(pattern)):
                if fp.is_file():
                    units.append(("file", str(fp)))
        return units
    return None  # unknown corpus_type (corpus_utils.py:209-210)


def load_corpus_from_source(
    validation_options: dict, task_id: str = ""
) -> Optional[str]:
    """The reference contract verbatim: one combined corpus string
    (units joined with ``\\n\\n---\\n\\n``), None when nothing loads.
    Driver-side by design — validation corpora are small; the
    distributed twin for real corpora is
    :func:`corpus_docs_from_source`."""
    units = _corpus_file_list(validation_options)
    if not units:
        return None
    texts = []
    for kind, val in units:
        text = val if kind == "string" else _load_corpus_file(val)
        if text:
            texts.append(text)
    return CORPUS_JOIN_SEP.join(texts) if texts else None


def corpus_docs_from_source(
    spark: SparkSession, validation_options: dict, task_id: str = ""
) -> Optional[DataFrame]:
    """Distributed twin of :func:`load_corpus_from_source`: the same
    routing, but each loaded unit becomes a (doc_id, text) row and the
    per-file decode runs on executors (mapInPandas over the file
    list), so a directory corpus scales with the cluster instead of
    the driver. doc_id is the file path ('corpus:<task_id>' for a
    direct string)."""
    import pandas as pd

    units = _corpus_file_list(validation_options)
    if not units:
        return None
    strings = [(f"corpus:{task_id}", v) for k, v in units if k == "string"]
    files = [v for k, v in units if k == "file"]
    parts = []
    if strings:
        parts.append(
            spark.createDataFrame(strings, "doc_id string, text string")
        )
    if files:
        def gen(batches):
            for pdf in batches:
                rows = [
                    (p, _load_corpus_file(p)) for p in pdf["path"].tolist()
                ]
                kept = [(p, t) for p, t in rows if t]
                yield pd.DataFrame(
                    {"doc_id": [p for p, _ in kept],
                     "text": [t for _, t in kept]}
                )

        fdf = spark.createDataFrame(
            [(f,) for f in files], "path string"
        ).repartition(min(len(files), 32))
        parts.append(
            fdf.mapInPandas(gen, schema="doc_id string, text string")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
