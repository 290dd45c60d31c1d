"""Units for multimodal_messages_format / image_compress_plan: the
reference algorithms (multimodal_utils.py:32-94, image_utils.py:83-175)
ported verbatim over the same fixtures, compared row-for-row."""

SF_DIR = "/root/testdata/sf0.001"


def _fixture_messages(doc_id: int):
    """The query's message fixture as plain dicts — the shape the
    reference functions actually consume."""
    text_item = {"type": "text", "text": f"question {doc_id}"}
    img_item = {
        "type": "image_url",
        "image_url": {"url": f"https://img/{doc_id}.jpg"},
    }
    bad_item = {"type": "image_url", "image_url": None}
    if doc_id % 5 == 4:
        items1 = [text_item]
    elif doc_id % 3 == 1:
        items1 = [text_item, img_item, bad_item]
    else:
        items1 = [text_item, img_item]
    msgs = [
        {"role": "system", "content": "sys prompt"},
        {"role": "user", "content": items1},
    ]
    if doc_id % 2 == 0:
        msgs.append({"content": [{"type": "text", "text": "follow"}]})
    return msgs


def _ref_is_multimodal(messages):
    """Verbatim port of multimodal_utils.is_multimodal."""
    for message in messages:
        content = message.get("content")
        if isinstance(content, list) and any(
            item.get("type") == "image_url" for item in content
        ):
            return True
    return False


def _ref_format(messages):
    """Port of format_multimodal_messages (the try/except KeyError/
    TypeError image-skip carried as the is-None check)."""
    processed = []
    for message in messages:
        if "content" in message and isinstance(message["content"], list):
            content = []
            for item in message["content"]:
                if item.get("type") == "text":
                    content.append({"type": "text", "text": item["text"]})
                elif item.get("type") == "image_url":
                    iu = item.get("image_url")
                    if not isinstance(iu, dict) or "url" not in iu:
                        continue  # reference logs and skips
                    content.append({"type": "image_url", "url": iu["url"]})
            processed.append(
                {"role": message.get("role", "user"), "content": content}
            )
        else:
            processed.append(message)
    return processed


def test_multimodal_messages_format_matches_reference_port(spark):
    from pdf_extractor_spark.analytics.multimodal import (
        multimodal_messages_format,
    )

    out = {
        r["doc_id"]: r
        for r in multimodal_messages_format(spark, SF_DIR).collect()
    }
    saw_mm = saw_plain = saw_dropped = False
    for doc_id, row in out.items():
        msgs = _fixture_messages(doc_id)
        formatted = _ref_format(msgs)
        assert row["is_mm"] == _ref_is_multimodal(msgs)
        assert row["n_messages"] == len(msgs)
        flat = [
            i
            for m in formatted
            if isinstance(m["content"], list)
            for i in m["content"]
        ]
        kept_urls = [i["url"] for i in flat if i["type"] == "image_url"]
        assert row["n_text_items"] == sum(1 for i in flat if i["type"] == "text")
        assert row["n_img_kept"] == len(kept_urls)
        assert row["first_url"] == (kept_urls[0] if kept_urls else None)
        assert row["roles_out"] == [m.get("role") for m in formatted]
        saw_mm |= row["is_mm"]
        saw_plain |= not row["is_mm"]
        saw_dropped |= row["n_img_dropped"] > 0
    assert saw_mm and saw_plain and saw_dropped


def _ref_compress_plan(doc_id: int):
    """The reference routing + attempt loop (process_image_input /
    compress_image) under the documented deterministic size model."""
    orig_kb = float(100 + (doc_id * 37) % 4900)
    w0 = float(640 + (doc_id % 7) * 160)
    h0 = float(480 + (doc_id % 5) * 120)
    route = ["url", "base64", "path"][doc_id % 3]
    if route == "url" or (route == "base64" and orig_kb <= 500):
        return route, True, None, orig_kb  # passthrough
    w, h, q = w0, h0, 90.0
    for k in range(5):
        kb = int(orig_kb * (q / 90.0) * (w * h) / (w0 * h0) * 10000 + 1e-6) / 10000
        if kb <= 500:
            return route, False, (k + 1, q, w, h), kb
        if k < 4:
            w, h = float(int(w * 0.9)), float(int(h * 0.9))
        q = max(10.0, q - 10.0)
    return route, False, None, orig_kb  # all attempts failed


def test_image_compress_plan_matches_reference_port(spark):
    from pdf_extractor_spark.analytics.multimodal import image_compress_plan

    out = {r["doc_id"]: r for r in image_compress_plan(spark, SF_DIR).collect()}
    branches = set()
    for doc_id, row in out.items():
        route, passthrough, win, kb = _ref_compress_plan(doc_id)
        assert row["route"] == route
        assert row["passthrough"] == passthrough
        assert row["final_kb"] == kb
        if passthrough:
            assert row["success"] is None and row["n_attempts"] is None
            branches.add(f"pass_{route}")
        elif win is None:
            assert row["success"] is False and row["final_q"] is None
            branches.add("all_fail")
        else:
            n, q, w, h = win
            assert row["success"] is True
            assert (row["n_attempts"], row["final_q"]) == (n, q)
            assert (row["final_w"], row["final_h"]) == (w, h)
            branches.add("first_try" if n == 1 else "retried")
    assert branches == {"pass_url", "pass_base64", "all_fail", "first_try", "retried"}
