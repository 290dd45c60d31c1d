"""End-to-end run of the REFERENCE'S OWN golden fixture.

The reference ships a real multi-page extraction golden:
``src/test_fixtures/BHT_CV32A65X_expected.md`` (source document) and
``BHT_CV32A65X_expected.json`` (12 ordered elements produced by its
marker-based PDF pipeline; see the fixture's ``"source": "marker"``).
This module feeds the markdown through ``sources.lines_to_spans`` /
``sources.read_text_docs`` → ``extract_document`` / ``extract_elements``
and asserts the ordered element sequence against the reference's JSON.

Documented comparison exclusions (docs/PARITY.md):

* ``token_count`` — tiktoken not available (textproc.py proxy);
* ``extraction_date`` / ``file_path`` — run metadata, not content;
* ``section_id`` — the golden uses sequential ids ("1".."12"); ours is
  the md5 fingerprint (markdown_extractor.py:79-82 hash_string shape);
* inline ``**bold**`` markers — the golden came from the PDF via
  marker, where bold is styling, not markup; the md companion renders
  it as ``**...**``.  The reference's own markdown path keeps raw
  inline source too (markdown_extractor.py:374 ``token.content``), so
  we normalize ``**`` away on BOTH sides rather than strip emphasis in
  the engine.

Page metadata: the raw ``.md`` has no page structure (single page), so
pages are asserted on a paged variant that inserts the
``<!-- page: 2 -->`` marker at the golden's page boundary and splits
the signal table across the break — reproducing the golden's
``is_multi_page``/``page_range: "1-2"`` via the multi-page merge pass
(improved_table_merger.py:187-254 semantics).
"""

import json
import os

import pytest

from pdf_extractor_spark.docmodel import extract_document
from pdf_extractor_spark.operators.extract import extract_elements
from pdf_extractor_spark.schema import DOCS_SCHEMA
from pdf_extractor_spark.sources import lines_to_spans

REF_DIR = "/root/reference/src/test_fixtures"
MD_PATH = os.path.join(REF_DIR, "BHT_CV32A65X_expected.md")
JSON_PATH = os.path.join(REF_DIR, "BHT_CV32A65X_expected.json")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(MD_PATH) and os.path.exists(JSON_PATH)),
    reason="reference checkout not present",
)


def _norm(text: str) -> str:
    return text.replace("**", "")


def load_golden():
    with open(JSON_PATH) as f:
        return json.load(f)


def load_md() -> str:
    with open(MD_PATH) as f:
        return f.read()


def golden_tuple(el: dict):
    """(kind, normalized text, level, section_path) for one golden row.

    Table elements carry no "text" in the golden — their content lives
    in metadata.headers/rows, compared separately.
    """
    return (
        el["type"],
        _norm(el.get("text", "")),
        el.get("level", 0),
        tuple(el["section_path"]),
    )


def actual_tuple(el: dict):
    return (
        el["kind"],
        "" if el["kind"] == "table" else _norm(el["text"]),
        el["level"],
        tuple(el["section_path"]),
    )


def paged_md() -> str:
    """The golden's page structure re-applied to the md: elements 8-12
    are on page 2 and the signal table spans 1-2, so the page break
    falls inside the table.  Split after the third data row, repeating
    the header on the continuation (what a per-page table extractor
    emits; the merge pass drops the duplicate header row)."""
    lines = load_md().split("\n")
    table_idx = [i for i, ln in enumerate(lines) if ln.startswith("|")]
    assert len(table_idx) == 7  # header + separator + 5 data rows
    split_at = table_idx[5]  # before the 4th data row
    header, sep = lines[table_idx[0]], lines[table_idx[1]]
    return "\n".join(
        lines[:split_at]
        + ["", "<!-- page: 2 -->", "", header, sep]
        + lines[split_at:]
    )


def test_golden_sequence_matches_reference_fixture():
    golden = load_golden()
    got = extract_document(lines_to_spans(load_md()))
    assert len(got) == len(golden) == 12
    for g, e in zip(got, golden):
        assert actual_tuple(g) == golden_tuple(e)
    # order is the golden's order (offset == position)
    assert [g["offset"] for g in got] == list(range(12))


def test_golden_table_content_matches():
    golden_table = [e for e in load_golden() if e["type"] == "table"][0]
    got = [e for e in extract_document(lines_to_spans(load_md()))
           if e["kind"] == "table"]
    assert len(got) == 1
    assert got[0]["table_headers"] == golden_table["metadata"]["headers"]
    assert got[0]["table_rows"] == golden_table["metadata"]["rows"]


def test_golden_heading_levels_and_sections():
    golden = load_golden()
    got = extract_document(lines_to_spans(load_md()))
    heads = [(g["level"], g["text"]) for g in got if g["kind"] == "heading"]
    assert heads == [
        (1, "4.1.5.4. BHT (Branch History Table) submodule"),
        (2, "State Diagram"),
    ]
    # every element's section_path matches the golden's exactly
    for g, e in zip(got, golden):
        assert g["section_path"] == e["section_path"]


def test_golden_paged_variant_multi_page_metadata():
    golden = load_golden()
    got = extract_document(lines_to_spans(paged_md()))
    assert len(got) == 12
    # content unchanged by paging
    for g, e in zip(got, golden):
        assert actual_tuple(g) == golden_tuple(e)
    # page metadata now matches the golden exactly
    assert [g["page"] for g in got] == [e["page"] for e in golden]
    table = [g for g in got if g["kind"] == "table"][0]
    assert table["is_multi_page"] is True
    assert table["page_range"] == "1-2"
    golden_table = [e for e in golden if e["type"] == "table"][0]
    assert table["table_rows"] == golden_table["metadata"]["rows"]


def test_golden_through_spark_pipeline(spark, tmp_path):
    """Full path: file on disk → read_text_docs → extract_elements."""
    md_dir = tmp_path / "golden"
    md_dir.mkdir()
    (md_dir / "BHT_CV32A65X.md").write_text(paged_md())
    from pdf_extractor_spark.sources import read_text_docs

    docs = read_text_docs(spark, str(md_dir))
    rows = sorted(
        extract_elements(docs).collect(), key=lambda r: r["offset"]
    )
    golden = load_golden()
    assert len(rows) == 12
    for r, e in zip(rows, golden):
        assert r["kind"] == e["type"]
        if e["type"] != "table":
            assert _norm(r["text"]) == _norm(e["text"])
        assert r["page"] == e["page"]
        assert list(r["section_path"]) == e["section_path"]
