"""load_corpus_from_source dispatch (corpus_utils.py:67-215) — the
per-task corpus routing contract: string / file / directory, suffix
dispatch, type inference, skip-on-failure, the '\\n\\n---\\n\\n' join,
and the distributed (doc_id, text) twin."""

import json

from pdf_extractor_spark.sources import (
    CORPUS_JOIN_SEP,
    corpus_docs_from_source,
    load_corpus_from_source,
)


def test_string_type_and_inference(tmp_path):
    # explicit string type
    assert load_corpus_from_source(
        {"corpus_source": "raw corpus text", "corpus_type": "string"}, "t1"
    ) == "raw corpus text"
    # inference: a non-path string defaults to 'string'
    # (corpus_utils.py:92-94)
    assert load_corpus_from_source(
        {"corpus_source": "not a path on disk"}, "t2"
    ) == "not a path on disk"
    # inference: an existing path defaults to 'file'
    f = tmp_path / "a.txt"
    f.write_text("file body")
    assert load_corpus_from_source({"corpus_source": str(f)}, "t3") == "file body"
    # no source → None
    assert load_corpus_from_source({}, "t4") is None


def test_file_suffix_dispatch(tmp_path):
    from tests.test_pdf_and_detect import make_pdf

    md = tmp_path / "doc.md"
    md.write_text("# Heading\n\nbody")
    assert load_corpus_from_source(
        {"corpus_source": str(md), "corpus_type": "file"}, "t"
    ) == "# Heading\n\nbody"

    j = tmp_path / "data.json"
    j.write_text('{"b": 2, "a": 1}')
    out = load_corpus_from_source({"corpus_source": str(j)}, "t")
    assert out == json.dumps({"b": 2, "a": 1}, indent=2)  # re-stringified

    h = tmp_path / "page.html"
    h.write_text("<nav>menu</nav><p>kept paragraph</p><script>x()</script>")
    assert load_corpus_from_source({"corpus_source": str(h)}, "t") == "kept paragraph"

    p = tmp_path / "doc.pdf"
    p.write_bytes(make_pdf([["line one", "line two"], ["page two"]]))
    out = load_corpus_from_source({"corpus_source": str(p)}, "t")
    assert out == "line one\nline two\npage two\n"

    # unknown suffix: utf-8 then latin-1 ladder (corpus_utils.py:155-162)
    u = tmp_path / "weird.bin"
    u.write_bytes("caf\xe9".encode("latin-1"))
    assert load_corpus_from_source({"corpus_source": str(u)}, "t") == "caf\xe9"

    # missing file → None
    assert load_corpus_from_source(
        {"corpus_source": str(tmp_path / "absent.txt"), "corpus_type": "file"},
        "t",
    ) is None


def test_directory_patterns_recursion_and_join(tmp_path):
    d = tmp_path / "corpus"
    (d / "sub").mkdir(parents=True)
    (d / "a.md").write_text("A")
    (d / "b.txt").write_text("B")
    (d / "skip.json").write_text("{}")
    (d / "sub" / "c.md").write_text("C")

    # non-recursive, md only
    out = load_corpus_from_source(
        {"corpus_source": str(d), "corpus_type": "directory",
         "file_patterns": ["*.md"]}, "t"
    )
    assert out == "A"
    # recursive picks up the nested md; two patterns, join separator
    out = load_corpus_from_source(
        {"corpus_source": str(d), "corpus_type": "directory",
         "recursive": True, "file_patterns": ["*.md", "*.txt"]}, "t"
    )
    assert out == CORPUS_JOIN_SEP.join(["A", "C", "B"])
    # non-list patterns fall back to ['*'] (corpus_utils.py:183-185)
    out = load_corpus_from_source(
        {"corpus_source": str(d), "corpus_type": "directory",
         "file_patterns": "*.md"}, "t"
    )
    assert "A" in out and "B" in out and "{}" in out
    # missing dir / unknown type → None
    assert load_corpus_from_source(
        {"corpus_source": str(tmp_path / "nope"), "corpus_type": "directory"},
        "t",
    ) is None
    assert load_corpus_from_source(
        {"corpus_source": "x", "corpus_type": "banana"}, "t"
    ) is None


def test_distributed_twin_matches_driver_string(spark, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.md").write_text("A doc")
    (d / "b.txt").write_text("B doc")
    opts = {"corpus_source": str(d), "corpus_type": "directory",
            "file_patterns": ["*.md", "*.txt"]}
    df = corpus_docs_from_source(spark, opts, "tk")
    rows = {r["doc_id"]: r["text"] for r in df.collect()}
    assert rows == {str(d / "a.md"): "A doc", str(d / "b.txt"): "B doc"}
    # same units, same order as the driver-contract string
    assert load_corpus_from_source(opts, "tk") == CORPUS_JOIN_SEP.join(
        ["A doc", "B doc"]
    )
    # string source becomes one corpus:<task_id> row
    sdf = corpus_docs_from_source(
        spark, {"corpus_source": "inline", "corpus_type": "string"}, "tk"
    )
    assert [tuple(r) for r in sdf.collect()] == [("corpus:tk", "inline")]
    assert corpus_docs_from_source(spark, {}, "tk") is None
