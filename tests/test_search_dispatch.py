

def test_validate_search_params_reference_defaults():
    """search_api/utils.py:12-34 parity: empty query -> '', top_n<=0 ->
    5, initial_k<=0 -> 20, valid values pass through."""
    from pdf_extractor_spark.analytics.search_api import (
        validate_search_params,
    )

    assert validate_search_params(None, 0, -1) == ("", 5, 20)
    assert validate_search_params("", -3, 0) == ("", 5, 20)
    assert validate_search_params("q", 7, 33) == ("q", 7, 33)


def test_lessons_by_keyword_escaping_and_fields(spark):
    """query_lessons_by_keyword parity (arango_utils.py:243-302): the
    escaped '_' in 'val_e' matches NOTHING even though the unescaped
    pattern would wildcard-match 'value' in nearly every doc; 'SRC1'
    matches case-insensitively on the source field; output is the
    deterministic doc_id-ordered LIMIT."""
    import pyspark.sql.functions as F

    from pdf_extractor_spark.analytics.search_api import (
        LESSON_LIMIT,
        lessons_by_keyword,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = lessons_by_keyword(spark, sf_dir).collect()
    assert 0 < len(rows) <= LESSON_LIMIT
    assert [r["doc_id"] for r in rows] == sorted(r["doc_id"] for r in rows)
    matched = {k for r in rows for k in r["matched_kws"]}
    assert "val_e" not in matched  # escaped literal, absent from corpus
    # the unescaped pattern WOULD match: that's the surface under test
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert docs.filter(F.lower("text").like("%val_e%")).count() > 0
    for r in rows:
        if "SRC1" in r["matched_kws"]:
            assert "src1" in r["source"].lower()
