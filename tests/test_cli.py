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


def test_cli_graph_add_list_delete(spark, tmp_path, capsys):
    """graph add/list/delete over a real keyed edge store — the
    reference's cli_extensions.py:30-170 verbs in spark-submit shape."""
    from pdf_extractor_spark.__main__ import main

    store = str(tmp_path / "edges")
    rationale = "these two documents cover the same subsystem in depth"
    rc = main([
        "graph", "add", "doc_a", "doc_b", "--store", store,
        "--type", "SIMILAR", "--rationale", rationale, "--confidence", "2",
    ])
    assert rc == 0
    assert "Relationship created successfully" in capsys.readouterr().out

    rc = main(["graph", "list", "doc_a", "--store", store])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Relationships for document doc_a (1 found):" in out
    assert "doc_a --[SIMILAR (2)]-> doc_b" in out
    assert "Rationale: " + rationale[:50] in out

    # json format + direction filter: INBOUND on doc_b sees the edge,
    # INBOUND on doc_a does not
    rc = main(["graph", "list", "doc_b", "--store", store,
               "--direction", "INBOUND", "--format", "json"])
    assert rc == 0
    rels = json.loads(capsys.readouterr().out)
    assert len(rels) == 1 and rels[0]["type"] == "SIMILAR"
    rc = main(["graph", "list", "doc_a", "--store", store,
               "--direction", "INBOUND"])
    assert rc == 0
    assert "(0 found)" in capsys.readouterr().out

    rc = main(["graph", "delete", "doc_a", "doc_b", "--store", store])
    assert rc == 0
    assert "deleted successfully" in capsys.readouterr().out
    rc = main(["graph", "list", "doc_a", "--store", store])
    assert rc == 0
    assert "No relationships found" in capsys.readouterr().out


def test_cli_graph_add_rejects_short_strategic_rationale(spark, tmp_path, capsys):
    from pdf_extractor_spark.__main__ import main

    rc = main([
        "graph", "add", "a", "b", "--store", str(tmp_path / "e2"),
        "--rationale", "too short", "--strategic",
    ])
    assert rc == 1
    assert "Error:" in capsys.readouterr().out


def test_cli_graph_evaluate_and_suggest(spark, capsys):
    from pdf_extractor_spark.__main__ import main

    rc = main(["graph", "evaluate-need", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Relationship need score: " in out
    assert "Search results count: " in out

    rc = main(["graph", "suggest", "--sf-dir", "/root/testdata/sf0.001",
               "--limit", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "potential relationships:" in out


def test_cli_messages_delete_conversation(spark, tmp_path, capsys):
    """delete-conversation = ONE predicate DELETE WHERE commit
    (crud.py:474-515 semantics incl. the empty-conversation no-op)."""
    from pdf_extractor_spark.__main__ import main
    from pdf_extractor_spark.lineage import init_store, read_output

    store = str(tmp_path / "messages")
    rows = spark.createDataFrame(
        [(f"m{i}", 0, "conv1" if i % 2 == 0 else "conv2", f"msg {i}")
         for i in range(6)],
        "doc_id string, offset int, conversation_id string, content string",
    )
    init_store(spark, store, rows, n_buckets=4)

    rc = main(["messages", "delete-conversation", "conv1", "--store", store])
    assert rc == 0
    assert "Conversation conv1 deleted (3 messages)" in capsys.readouterr().out
    left = read_output(spark, store).select("conversation_id").distinct().collect()
    assert {r["conversation_id"] for r in left} == {"conv2"}

    # idempotent: a missing conversation is a successful no-op
    rc = main(["messages", "delete-conversation", "conv1", "--store", store])
    assert rc == 0
    assert "(0 messages)" in capsys.readouterr().out
    assert read_output(spark, store).count() == 3
