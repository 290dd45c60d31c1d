"""PDF byte-stream source (S1/S2) + table-region detection (S9/S10)."""

from pdf_extractor_spark.docmodel import extract_document
from pdf_extractor_spark.operators.table_detect import (
    detect_lattice_regions,
    detect_stream_regions,
    detect_table_regions,
    detect_regions_df,
)
from pdf_extractor_spark.sources import parse_pdf_bytes, pdf_to_spans, read_pdf_docs


# -- minimal uncompressed PDF writer (test fixture only) --------------------


def make_pdf(pages: list[list[str]]) -> bytes:
    """Build a tiny, valid-enough uncompressed PDF: one content stream
    per page, one Tj per line separated by Td line-advances."""
    objs: list[bytes] = []

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    kids = []
    n_fixed = 2  # catalog, pages
    for i, _ in enumerate(pages):
        kids.append(f"{n_fixed + 1 + i * 2} 0 R")
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{' '.join(kids)}] /Count {len(pages)} >>".encode()
    )
    for i, lines in enumerate(pages):
        page_obj = n_fixed + 1 + i * 2
        content_obj = page_obj + 1
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /Contents {content_obj} 0 R >>".encode()
        )
        body = "BT /F1 10 Tf 50 700 Td\n" + "\n".join(
            f"({esc(ln)}) Tj 0 -12 Td" for ln in lines
        ) + "\nET"
        stream = body.encode("latin-1")
        objs.append(
            f"<< /Length {len(stream)} >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )
    out = [b"%PDF-1.4"]
    for n, obj in enumerate(objs, start=1):
        out.append(f"{n} 0 obj\n".encode() + obj + b"\nendobj")
    out.append(b"%%EOF")
    return b"\n".join(out)


MD_PAGE1 = ["# 1. Title", "", "para line one.", "| A | B |", "|---|---|", "| 1 | 2 |"]
MD_PAGE2 = ["## Section", "closing text."]


def test_parse_pdf_bytes_pages_and_lines():
    pdf = make_pdf([MD_PAGE1, MD_PAGE2])
    pages = parse_pdf_bytes(pdf)
    assert len(pages) == 2
    assert pages[0].split("\n") == MD_PAGE1
    assert pages[1].split("\n") == MD_PAGE2


def test_pdf_escapes_roundtrip():
    pdf = make_pdf([["a (paren) and \\ backslash"]])
    assert parse_pdf_bytes(pdf)[0] == "a (paren) and \\ backslash"


def test_pdf_to_spans_feeds_pipeline():
    spans = pdf_to_spans(make_pdf([MD_PAGE1, MD_PAGE2]))
    els = extract_document(spans)
    kinds = [e["kind"] for e in els]
    assert kinds == ["heading", "text", "table", "heading", "text"]
    assert els[3]["page"] == 2  # page marker advanced the counter


def test_read_pdf_docs_spark(spark, tmp_path):
    (tmp_path / "x.pdf").write_bytes(make_pdf([MD_PAGE1]))
    (tmp_path / "y.pdf").write_bytes(make_pdf([MD_PAGE2]))
    docs = read_pdf_docs(spark, str(tmp_path))
    got = {r["doc_id"]: len(r["spans"]) for r in docs.collect()}
    assert set(got) == {"x.pdf", "y.pdf"} and all(v > 0 for v in got.values())


# -- table-region detection --------------------------------------------------

LATTICE_PAGE = "\n".join(
    [
        "Some prose before the table.",
        "| Signal | IO | Type |",
        "|--------|----|------|",
        "| clk    | in | wire |",
        "| rst    | in | wire |",
        "And prose after.",
    ]
)

STREAM_PAGE = "\n".join(
    [
        "name      qty   price",
        "bolt      12    0.30",
        "nut       40    0.10",
        "washer    7     0.05",
    ]
)

PROSE_PAGE = "\n".join(
    [
        "Just a paragraph of text that has no table at all.",
        "Another line of prose follows here.",
    ]
)


def test_lattice_detection():
    regions = detect_lattice_regions(LATTICE_PAGE.split("\n"))
    assert len(regions) == 1
    r = regions[0]
    assert (r["top_line"], r["bottom_line"]) == (1, 4)
    assert r["n_cols"] == 3
    assert r["accuracy"] == 100.0


def test_stream_detection():
    regions = detect_stream_regions(STREAM_PAGE.split("\n"))
    assert len(regions) == 1
    assert regions[0]["n_cols"] == 3
    assert regions[0]["method"] == "stream"


def test_fallback_lattice_to_stream():
    # no pipes at all → lattice finds nothing → stream path
    assert detect_table_regions(STREAM_PAGE)[0]["method"] == "stream"
    # clean lattice → lattice wins
    assert detect_table_regions(LATTICE_PAGE)[0]["method"] == "lattice"
    # prose → nothing
    assert detect_table_regions(PROSE_PAGE) == []


def test_detect_regions_df(spark):
    pages = spark.createDataFrame(
        [
            ("d1", 1, LATTICE_PAGE),
            ("d1", 2, STREAM_PAGE),
            ("d2", 1, PROSE_PAGE),
        ],
        "doc_id string, page int, page_text string",
    )
    got = detect_regions_df(pages).collect()
    methods = {(r["doc_id"], r["page"]): r["method"] for r in got}
    assert methods == {("d1", 1): "lattice", ("d1", 2): "stream"}


def test_pdf_octal_escapes_decode():
    """\\ddd octal escapes (the standard way PDF writers embed literal
    parens) decode to their characters, not digit garbage."""
    from pdf_extractor_spark.sources import _pdf_unescape

    assert _pdf_unescape(rb"hello \051world\050") == "hello )world("
    assert _pdf_unescape(rb"\101\61\8") == "A18"  # \101='A', \61='1', \8 literal
    assert _pdf_unescape(rb"tab\there") == "tab\there"
