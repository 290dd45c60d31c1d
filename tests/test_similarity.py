

def test_embedding_stats_numpy_recompute(spark):
    """embedding_stats matches numpy (np.std ddof=0, L2 norm) after the
    shared floor4 rounding; NULL/empty embeddings give all-NULL stats."""
    import math

    import numpy as np

    from pdf_extractor_spark.analytics.similarity import embedding_stats

    sf_dir = "/root/testdata/sf0.001"
    got = {r["vec_id"]: r for r in embedding_stats(spark, sf_dir).collect()}
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def fl4(x):
        return math.floor(x * 10000 + 1e-6) / 10000

    checked = 0
    for vec_id, emb in list(vecs.items())[:25]:
        row = got[vec_id]
        if emb is None or len(emb) == 0:
            assert all(
                row[c] is None
                for c in ("emb_min", "emb_max", "emb_mean", "emb_std", "emb_norm")
            )
            continue
        v = np.array(emb, dtype=np.float64)
        assert row["emb_min"] == fl4(v.min())
        assert row["emb_max"] == fl4(v.max())
        assert abs(row["emb_mean"] - fl4(v.mean())) <= 1e-4
        assert abs(row["emb_std"] - fl4(v.std())) <= 1e-4
        assert abs(row["emb_norm"] - fl4(np.linalg.norm(v))) <= 1e-4
        checked += 1
    assert checked > 0


def test_embedding_quantize_error_numpy_recompute(spark):
    """int8 quantization audit matches numpy: scale = max|x|/127,
    q = clip(floor(x/scale + 0.5)), L2 reconstruction error and
    cosine(original, dequantized) after floor4; cos_dq stays ≥ 0.99
    for real vectors (the audit's point)."""
    import math

    import numpy as np

    from pdf_extractor_spark.analytics.similarity import (
        QUANT_LEVELS,
        embedding_quantize_error,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["vec_id"]: r
        for r in embedding_quantize_error(spark, sf_dir).collect()
    }
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def fl4(x):
        return math.floor(x * 10000 + 1e-6) / 10000

    checked = 0
    for vec_id, emb in list(vecs.items())[:25]:
        row = got[vec_id]
        v = np.array(emb, dtype=np.float64)
        scale = np.abs(v).max() / QUANT_LEVELS
        if scale == 0:
            assert row["l2_err"] == 0.0 and row["cos_dq"] is None
            continue
        q = np.clip(np.floor(v / scale + 0.5), -QUANT_LEVELS, QUANT_LEVELS)
        dq = q * scale
        err = float(np.sqrt(((v - dq) ** 2).sum()))
        cos = float(
            (v @ dq) / (np.linalg.norm(v) * np.linalg.norm(dq))
        )
        assert abs(row["q_scale"] - fl4(scale)) <= 1e-4
        assert abs(row["l2_err"] - fl4(err)) <= 1e-4
        assert abs(row["cos_dq"] - fl4(cos)) <= 1e-4
        assert row["cos_dq"] >= 0.99
        checked += 1
    assert checked > 0
