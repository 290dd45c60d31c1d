"""json_response_validate vs the reference algorithm run in pure Python
(json_validators.py:45-76 cascade + :84-120 required fields) over the
same synthesized responses."""

import json


def _reference_cascade(content: str):
    """json_validator's parse cascade, returning the parsed object or
    None (direct → ```json block → each generic block minus its first
    line)."""
    try:
        return json.loads(content)
    except json.JSONDecodeError:
        pass
    if "```json" in content and "```" in content.split("```json", 1)[1]:
        try:
            return json.loads(
                content.split("```json", 1)[1].split("```", 1)[0].strip()
            )
        except json.JSONDecodeError:
            pass
    if "```" in content:
        blocks = content.split("```")
        for i in range(1, len(blocks), 2):
            block = blocks[i]
            if "\n" in block:
                block = "\n".join(block.split("\n")[1:])
            try:
                return json.loads(block.strip())
            except json.JSONDecodeError:
                continue
    return None


def test_json_response_validate_recompute(spark):
    from pdf_extractor_spark.analytics.validation import (
        JV_REQUIRED,
        json_response_validate,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: r
        for r in json_response_validate(spark, sf_dir).collect()
    }
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    saw = set()
    for doc_id in ids:
        mod = doc_id % 5
        if mod == 0:
            resp = f'{{"name": "d{doc_id}", "age": {doc_id}}}'
        elif mod == 1:
            resp = f'response: ```json\n{{"name": "d{doc_id}"}}\n``` ok'
        elif mod == 2:
            resp = f'noise ```\n{{"age": {doc_id}, "name": "x"}}\n``` more'
        elif mod == 3:
            resp = "not json at all"
        else:
            resp = f'{{"name": broken{doc_id}'
        obj = _reference_cascade(resp)
        row = got[doc_id]
        assert row["json_ok"] == (obj is not None), (doc_id, resp)
        if obj is None:
            assert row["missing"] is None
            assert row["fields_ok"] is False
        else:
            missing = [f for f in JV_REQUIRED if f not in obj]
            assert list(row["missing"]) == missing, (doc_id, row["missing"])
            assert row["fields_ok"] == (not missing)
        saw.add(mod)
    assert saw == {0, 1, 2, 3, 4}
