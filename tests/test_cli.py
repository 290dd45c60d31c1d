"""Driver-CLI surface (python -m pdf_extractor_spark) — the SURVEY
§3.1/§3.2 spark-submit shape of the reference's typer CLI."""

import json
import os


def test_cli_convert_md_dir(spark, tmp_path, capsys):
    from pdf_extractor_spark.__main__ import main

    src = tmp_path / "docs"
    src.mkdir()
    (src / "a.md").write_text("# Title A\n\nBody text here.\n")
    (src / "b.md").write_text("## Sub B\n\n| h1 | h2 |\n|---|---|\n| 1 | 2 |\n")
    out = str(tmp_path / "elements")
    jdir = str(tmp_path / "json")
    rc = main([
        "convert", "--input", str(src), "--output", out,
        "--json-dir", jdir, "--format", "md",
    ])
    assert rc == 0
    flat = spark.read.parquet(out)
    kinds = {r["kind"] for r in flat.select("kind").distinct().collect()}
    assert "heading" in kinds
    ids = {r["doc_id"] for r in flat.select("doc_id").distinct().collect()}
    assert ids == {"a.md", "b.md"}
    # JSON sink: one object per doc with the ordered element list
    lines = []
    for f in os.listdir(jdir):
        if f.startswith("part-"):
            with open(os.path.join(jdir, f)) as fh:
                lines += [json.loads(l) for l in fh if l.strip()]
    assert {d["doc_id"] for d in lines} == {"a.md", "b.md"}
    assert all("out_spans" in d for d in lines)


def test_cli_search_bm25(spark, capsys):
    from pdf_extractor_spark.__main__ import main

    rc = main([
        "search", "--sf-dir", "/root/testdata/sf0.001",
        "--type", "bm25", "--query", "the data", "--top-n", "5",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "search[bm25]:" in out
    assert "doc_id=" in out and "bm25=" in out


def test_cli_quality_gate(spark, tmp_path, capsys):
    """The quality-gate subcommand drains an inbox through the
    streaming gate with the bloom bitset built from --bloom-sf-dir and
    reports the routed count."""
    from pdf_extractor_spark.__main__ import main

    sf_dir = "/root/testdata/sf0.001"
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "gated")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.where("doc_id < 60").write.mode("append").parquet(inbox)
    rc = main([
        "quality-gate", "--input", inbox, "--output", out,
        "--checkpoint", ckpt, "--bloom-sf-dir", sf_dir,
    ])
    assert rc == 0
    assert "quality-gate: 60 docs routed" in capsys.readouterr().out
    got = spark.read.parquet(out)
    assert got.count() == 60
    assert "verdict" in got.columns
