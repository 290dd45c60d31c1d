"""log_safe_preview vs a pure-Python port of the reference's
truncate_large_value (log_utils.py:8-66) run on the same synthesized
values."""

import re

BASE64_IMAGE_PATTERN = re.compile(r"^(data:image/[a-zA-Z+.-]+;base64,)")


def truncate_large_value(value, max_str_len=100, max_list_elements_shown=10):
    if isinstance(value, str):
        match = BASE64_IMAGE_PATTERN.match(value)
        if match:
            header = match.group(1)
            data = value[len(header):]
            if len(data) > max_str_len:
                half = max_str_len // 2
                return header + f"{data[:half]}...{data[-half:]}"
            return value
        if len(value) > max_str_len:
            half = max_str_len // 2
            return f"{value[:half]}...{value[-half:]}"
        return value
    if isinstance(value, list):
        if len(value) > max_list_elements_shown:
            return f"[<{len(value)} {type(value[0]).__name__} elements>]"
        return "[<0 elements>]" if not value else value
    return value


def test_log_safe_preview_recompute(spark):
    import hashlib

    from pdf_extractor_spark.analytics.validation import log_safe_preview

    sf_dir = "/root/testdata/sf0.001"
    got = {r["doc_id"]: r for r in log_safe_preview(spark, sf_dir).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    embs = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    saw_trunc = saw_short = False
    for doc_id, row in got.items():
        text = docs[doc_id]
        md5 = hashlib.md5((text or "").encode()).hexdigest()
        uri = "data:image/png;base64," + md5 * (1 + doc_id % 5)
        emb = [float(x) for x in embs[doc_id]]
        assert row["safe_text"] == truncate_large_value(text)
        assert row["safe_img"] == truncate_large_value(uri)
        assert row["safe_embedding"] == truncate_large_value(emb)
        if len(uri) - len("data:image/png;base64,") > 100:
            saw_trunc = True
        else:
            saw_short = True
    assert saw_trunc and saw_short  # both URI branches exercised
    assert got  # join produced rows
