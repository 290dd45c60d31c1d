"""template_substitute vs Python's one-pass re.sub with the reference's
replacer semantics (parser.py:50-157), plus branch-coverage assertions."""

import re


def test_template_substitute_recompute(spark):
    from pdf_extractor_spark.analytics.taskflow import (
        TPL_PAT,
        TPL_RESULTS,
        _render_result,
        template_substitute,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: r for r in template_substitute(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()

    rendered_map = {
        tid: _render_result(status, value)
        for tid, (status, value) in TPL_RESULTS.items()
    }
    pat = re.compile(r"\{\{\s*([\w-]+)\.result\s*\}\}")

    def replacer(m):
        tid = m.group(1)
        if tid not in rendered_map:
            return "[ERROR: Result not found]"
        return rendered_map[tid]

    seen = set()
    for r in docs:
        doc_id = r["doc_id"]
        tpl = (
            f"doc {doc_id}: {{{{T{doc_id % 8}.result}}}} & "
            f"{{{{ T{(doc_id + 3) % 10}.result }}}} | "
            + (r["text"][:40] if r["text"] is not None else "")
        )
        want = pat.sub(replacer, tpl)
        row = got[doc_id]
        assert row["rendered"] == want, (doc_id, row["rendered"], want)
        assert row["n_placeholders"] == len(re.findall(TPL_PAT, tpl))
        seen.add(f"T{doc_id % 8}")
        seen.add(f"T{(doc_id + 3) % 10}")

    # branch coverage: every replacer outcome occurs somewhere
    outs = " ".join(row["rendered"] for row in got.values())
    assert "alpha beta" in outs  # success
    assert "&#39;" in outs  # quote sanitization (reference quirk)
    assert "[ERROR: Empty result after sanitization]" in outs
    assert "[ERROR: Dependency failed]" in outs
    assert "[ERROR: Null result]" in outs
    assert "[ERROR: Input too long]" in outs
    assert "[ERROR: Result not found]" in outs
    assert {f"T{i}" for i in range(10)} <= seen
