"""Units for extract_code_block / parse_json_mixed: the reference
algorithms (code_validator.py:103-141, json_utils.py:97-135) ported
verbatim in Python and compared row-for-row against the Spark plans."""

import hashlib
import json
import re

SF_DIR = "/root/testdata/sf0.001"


def _ref_extract_code(text: str) -> str:
    """Verbatim port of code_validator.extract_code_from_text."""
    code_blocks = re.findall(r"```(?:python)?\n(.*?)```", text, re.DOTALL)
    if code_blocks:
        return code_blocks[0].strip()
    lines = text.split("\n")
    code_lines = []
    in_code_block = False
    for line in lines:
        if (
            re.match(r"^\s*def\s+\w+\s*\(", line)
            or re.match(r"^\s*class\s+\w+", line)
            or re.match(r"^\s*import\s+", line)
            or re.match(r"^\s*from\s+\w+\s+import", line)
            or re.match(r"^\s*for\s+\w+\s+in\s+", line)
            or re.match(r"^\s*if\s+.*:", line)
            or re.match(r"^\s*while\s+.*:", line)
            or in_code_block
        ):
            code_lines.append(line)
            in_code_block = True
    if code_lines:
        return "\n".join(code_lines)
    return ""


def _fixture_resp_code(doc_id: int) -> str:
    m = doc_id % 4
    if m == 0:
        return (
            f"use this ```python\ndef f{doc_id}():\n    return {doc_id}\n``` done"
        )
    if m == 1:
        return f"pre ```\nimport mod{doc_id}\ny = {doc_id}\n``` post"
    if m == 2:
        return (
            f"intro words here\nfrom pkg{doc_id} import thing\n"
            "plain trailing line\nx = 1"
        )
    return f"no code at all in response {doc_id}"


def test_extract_code_block_matches_reference_port(spark):
    from pdf_extractor_spark.analytics.validation import extract_code_block

    out = {r["doc_id"]: r for r in extract_code_block(spark, SF_DIR).collect()}
    paths = set()
    for doc_id, row in out.items():
        want = _ref_extract_code(_fixture_resp_code(doc_id))
        assert row["code"] == want, (doc_id, row["code"], want)
        assert row["code_chars"] == len(want)
        paths.add(row["path"])
    assert paths == {"fenced", "latched", "none"}
    # the latch keeps NON-code lines after the first code line too
    latch_doc = next(d for d in out if d % 4 == 2)
    assert "plain trailing line" in out[latch_doc]["code"]


def _fixture_resp_json(doc_id: int) -> str:
    m = doc_id % 6
    if m == 0:
        return f'{{"k": {doc_id}, "v": "a"}}'
    if m == 1:
        return f'Sure! here: {{"k": {doc_id}, "arr": [1, 2]}} hope'
    if m == 2:
        return f"list: [1, 2, {doc_id}] end"
    if m == 3:
        return f"{{'k': {doc_id}, 'b': 'x',}}"
    if m == 4:
        return f"nothing parseable {doc_id}"
    return f"'plain quoted answer {doc_id}'"


def _ref_parse_json(content: str):
    """json_utils.parse_json with the documented repair stand-in
    (quote fold + trailing-comma strip). Returns (status, winning).
    Mirrors the reference control flow exactly: the regex only NARROWS
    content when it matches (json_utils.py:114-117); repair then runs
    on whatever content is — the full response when no bracket
    candidate exists."""
    try:
        json.loads(content)
        return "direct", content
    except json.JSONDecodeError:
        pass
    m = re.search(r"(\[.*\]|\{.*\})", content, re.DOTALL)
    cand = m.group(1) if m else content
    if m:
        try:
            json.loads(cand)
            return "extracted", cand
        except json.JSONDecodeError:
            pass
    rep = re.sub(r",\s*([}\]])", r"\1", cand.replace("'", '"'))
    try:
        json.loads(rep)
        return "repaired", rep
    except json.JSONDecodeError:
        pass
    return "original", content


def test_parse_json_mixed_matches_reference_port(spark):
    from pdf_extractor_spark.analytics.validation import parse_json_mixed

    out = {r["doc_id"]: r for r in parse_json_mixed(spark, SF_DIR).collect()}
    statuses = set()
    for doc_id, row in out.items():
        status, winning = _ref_parse_json(_fixture_resp_json(doc_id))
        assert row["status"] == status, (doc_id, row["status"], status)
        assert row["result_md5"] == hashlib.md5(winning.encode()).hexdigest()
        if status != "original" and winning.strip().startswith("{"):
            assert row["parsed_keys"] == sorted(json.loads(winning).keys())
        else:
            assert row["parsed_keys"] is None
        statuses.add((status, doc_id % 6))
    # both repair paths fire: on-extracted (form 3) and on-full-content
    # (form 5, no bracket candidate)
    assert {s for s, _ in statuses} == {
        "direct", "extracted", "repaired", "original"
    }
    assert ("repaired", 3) in statuses and ("repaired", 5) in statuses
