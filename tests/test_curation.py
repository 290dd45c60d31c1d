

def test_truncate_by_tokens_recompute(spark):
    """Head+tail truncation matches a pure-Python recompute of the
    reference rule (spacy_utils.py:87-100 under the \\S+ proxy) on
    within-budget, over-budget, empty, and NULL docs."""
    import pyspark.sql.functions as F

    from pdf_extractor_spark.analytics.curation import (
        TRUNC_MAX_TOKENS,
        truncate_by_tokens,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = {r["doc_id"]: r for r in truncate_by_tokens(spark, sf_dir).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    half = TRUNC_MAX_TOKENS // 2
    saw_long = saw_short = False
    for doc_id, text in docs.items():
        row = out[doc_id]
        if text is None:
            assert row["n_tokens"] is None and row["truncated"] is None
            continue
        toks = text.split()
        assert row["n_tokens"] == len(toks)
        if len(toks) <= TRUNC_MAX_TOKENS:
            saw_short = True
            assert row["truncated"] == text
        else:
            saw_long = True
            want = " ".join(toks[:half]) + "... " + " ".join(toks[-half:])
            assert row["truncated"] == want
    assert saw_long and saw_short  # fixture exercises both branches
