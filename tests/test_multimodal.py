"""Multimodal binary-column plumbing: decode / resize / frame-sample."""

from pyspark.sql import functions as F

from pdf_extractor_spark.analytics.multimodal import (
    decode_media_batch,
    fake_decode_media,
    fake_resize,
    resize_media,
    sample_frames,
)


def _payload_df(spark):
    return spark.createDataFrame(
        [(1, b"x" * 100), (2, b"y" * 700)], "doc_id long, payload binary"
    ).repartition(2)


def test_decode_stub_deterministic():
    a, b = fake_decode_media(b"abc"), fake_decode_media(b"abc")
    assert a == b and a["n_bytes"] == 3 and a["codec"] == "fake/v1"


def test_resize_preserves_aspect(spark):
    got = {r["doc_id"]: r for r in resize_media(_payload_df(spark)).collect()}
    for did, r in got.items():
        assert r["resized_w"] <= 224 and r["resized_h"] <= 224
        # aspect ratio preserved within integer truncation
        orig = r["width"] / r["height"]
        new = r["resized_w"] / r["resized_h"]
        assert abs(orig - new) / orig < 0.05
        assert len(r["thumb"]) == 16
    assert fake_resize(b"x" * 100)["width"] == got[1]["width"]


def test_frame_sampling_stride(spark):
    rows = sample_frames(_payload_df(spark)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    n1 = fake_decode_media(b"x" * 100)["frames"]
    assert sorted(by_doc[1]) == list(range(0, n1, 10))
    assert all(r["frame_ref"].startswith("frame://") for r in rows)


def test_plumbing_is_arrow_batched(spark):
    plan = (
        resize_media(_payload_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_feature_extract_stub(spark):
    from pdf_extractor_spark.analytics.multimodal import (
        FEATURE_DIMS,
        extract_features,
        fake_extract_features,
    )

    feats = {r["doc_id"]: r["features"] for r in extract_features(_payload_df(spark)).collect()}
    assert all(len(v) == FEATURE_DIMS for v in feats.values())
    assert all(0.0 <= x < 1.0 for v in feats.values() for x in v)
    # deterministic and matches the local kernel
    import numpy as np

    local = fake_extract_features(b"x" * 100)
    assert np.allclose(feats[1], local, atol=1e-6)


def test_null_payload_rows_are_safe(spark):
    from pdf_extractor_spark.analytics.multimodal import (
        extract_features,
        resize_media,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, b"data"), (2, None)], "doc_id long, payload binary"
    )
    assert resize_media(df).count() == 2
    assert extract_features(df).count() == 2
    assert sample_frames(df).count() >= 1  # null payload → 1 frame (n=1)


def test_media_phash_neardup_recall_and_recompute(spark):
    """Every injected identical-media copy pairs with its original at
    Hamming 0 (band LSH keeps exact dups with recall 1), and every
    reported Hamming distance equals a pure-Python recompute of the
    dHash over the same sampled pixels."""
    from pdf_extractor_spark.analytics.multimodal import (
        PHASH_GRID,
        PHASH_HAM_MAX,
        PHASH_ID_OFFSET,
        PHASH_N_INJECT,
        PHASH_PAD,
        _phash_idx,
        media_phash_neardup,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = {(r["a_id"], r["b_id"]): r["hamming"]
            for r in media_phash_neardup(spark, sf_dir).collect()}
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").collect()
    }
    for i in range(PHASH_N_INJECT):
        assert rows.get((i, i + PHASH_ID_OFFSET)) == 0, i

    def bands(text):
        padded = ((text or "") + "." * PHASH_PAD)[:PHASH_PAD].ljust(
            PHASH_PAD, "."
        )
        out = []
        for k in range(4):
            val = 0
            for r in (2 * k, 2 * k + 1):
                for c in range(PHASH_GRID):
                    a = ord(padded[_phash_idx(r, c) - 1])
                    b = ord(padded[_phash_idx(r, c + 1) - 1])
                    if a > b:
                        val |= 1 << ((r % 2) * PHASH_GRID + c)
            out.append(val)
        return out

    for (a_id, b_id), h in rows.items():
        ta = texts[a_id % PHASH_ID_OFFSET if a_id >= PHASH_ID_OFFSET else a_id]
        tb = texts[b_id % PHASH_ID_OFFSET if b_id >= PHASH_ID_OFFSET else b_id]
        ba, bb = bands(ta), bands(tb)
        want = sum(bin(x ^ y).count("1") for x, y in zip(ba, bb))
        assert h == want and h <= PHASH_HAM_MAX
        assert any(x == y for x, y in zip(ba, bb))  # came via a band


def test_caption_pairs_match_python_recompute(spark):
    """R4-25: every (media, caption) pair equals a pure-Python walk of
    the same synthesized interleaved structure — media at md5-derived
    offsets pair with the greatest anchor position <= offset."""
    import hashlib
    import re

    from pdf_extractor_spark.analytics.multimodal import (
        CAPTION_BOUNDARY_MOD,
        caption_pair_mining,
    )

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    sf_dir = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    want = {}
    for doc_id, text in docs.items():
        toks = re.split(r"\s+", text or "")
        n = len(toks)
        if n < 1 or doc_id % 3 < 1:
            continue
        anchors = [
            (p, t)
            for p, t in enumerate(toks, start=1)
            if t != "" and (p == 1 or h(f"b|{doc_id}|{p}") % CAPTION_BOUNDARY_MOD == 0)
        ]
        for j in range(1, doc_id % 3 + 1):
            off = h(f"cap|{doc_id}|{j}") % n + 1
            cands = [(p, t) for p, t in anchors if p <= off]
            if cands:
                p, t = max(cands)
                want[(doc_id, f"media://{doc_id}/{j}")] = (off, p, t)
    got = {
        (r["doc_id"], r["media_ref"]): (r["media_offset"], r["cap_pos"], r["cap_tok"])
        for r in caption_pair_mining(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0
