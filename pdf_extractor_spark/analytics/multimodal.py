"""Multimodal column plumbing: binary media columns through mapInPandas.

The engine treats image/audio/video as opaque ``binary`` columns with
typed metadata (SURVEY.md §1.4; reference analog: the media spans whose
decode path is inert — qwen_processor.py:249-285 returns []). Real
decode libraries are absent in this container, so the *decode kernel*
is stubbed (deterministic fake, clearly marked) while everything
Spark-side — schema, Arrow batch shape, mapInPandas signature,
partition behavior — is real and tested.

The fake-decode arithmetic is pure integer math on the byte length,
which is exactly why it has a SQL oracle: the plumbing (binary column
→ Arrow batch → pandas → struct-of-metadata) is verified end-to-end
against DuckDB computing the same arithmetic on ``octet_length``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .base import load

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("frames", IntegerType()),
        StructField("codec", StringType()),
    ]
)


def fake_decode_media(payload: bytes) -> dict:
    """STUB decode kernel — deterministic fake (no image/audio libs in
    this container). A real deployment swaps this single function for
    PIL/ffmpeg etc.; the Spark plumbing around it is unchanged."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640 + 16,
        "height": (n * 7) % 480 + 16,
        "frames": n % 30 + 1,
        "codec": "fake/v1",
    }


def _as_bytes(p) -> bytes:
    """NULL-safe payload coercion: a nullable binary column may carry
    None rows (e.g. encode(NULL text)); treat them as empty media."""
    return b"" if p is None else bytes(p)


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload:binary) → media metadata.

    Vectorized per Arrow batch; zero per-row Python at the Spark level
    (the loop below is inside the batch, same as any pandas op).
    """
    for pdf in batches:
        metas = [fake_decode_media(_as_bytes(p)) for p in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def media_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded to a binary payload column, decoded back
    to typed metadata through the mapInPandas pipeline."""
    from ..session import ensure_pyfiles

    ensure_pyfiles(spark)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.mapInPandas(decode_media_batch, schema=MEDIA_META_SCHEMA)


# coalesce mirrors the Spark kernel's NULL payload → b'' coercion
# (same guard as MEDIA_FRAME_SAMPLE_SQL; an unguarded NULL text would
# emit NULL metrics here vs 0-byte metrics there and break hash parity)
MEDIA_DECODE_SQL = """
SELECT doc_id,
       CAST(coalesce(octet_length(encode(text)), 0) AS BIGINT) AS n_bytes,
       CAST(coalesce(octet_length(encode(text)), 0) % 640 + 16 AS INTEGER) AS width,
       CAST((coalesce(octet_length(encode(text)), 0) * 7) % 480 + 16 AS INTEGER) AS height,
       CAST(coalesce(octet_length(encode(text)), 0) % 30 + 1 AS INTEGER) AS frames,
       'fake/v1' AS codec
FROM documents
"""


# ---------------------------------------------------------------------------
# additional media kernels: resize + frame-sample (same stub pattern —
# deterministic fake kernel, real Spark plumbing)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_w", IntegerType()),
        StructField("resized_h", IntegerType()),
        StructField("thumb", StringType()),  # base64-ish digest stand-in
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ref", StringType()),
    ]
)

TARGET_W, TARGET_H = 224, 224
FRAME_STRIDE = 10


def fake_resize(payload: bytes) -> dict:
    """STUB resize kernel — aspect-preserving fit to 224x224, digest as
    thumbnail stand-in (PIL absent; swap this function in production)."""
    import hashlib

    meta = fake_decode_media(payload)
    w, h = meta["width"], meta["height"]
    scale = min(TARGET_W / w, TARGET_H / h)
    return {
        "width": w,
        "height": h,
        "resized_w": max(1, int(w * scale)),
        "resized_h": max(1, int(h * scale)),
        "thumb": hashlib.md5(payload).hexdigest()[:16],
    }


def resize_media(docs_with_payload: DataFrame) -> DataFrame:
    """(doc_id, payload:binary) → resize metadata via mapInPandas."""
    from ..session import ensure_pyfiles

    ensure_pyfiles(docs_with_payload.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_resize(_as_bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return docs_with_payload.mapInPandas(gen, schema=RESIZED_SCHEMA)


def sample_frames(docs_with_payload: DataFrame) -> DataFrame:
    """(doc_id, payload:binary) → one row per sampled frame (UDTF-style
    fan-out inside mapInPandas; frames = decode stub's frame count,
    sampled every FRAME_STRIDE)."""
    from ..session import ensure_pyfiles

    ensure_pyfiles(docs_with_payload.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, refs = [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                n = fake_decode_media(_as_bytes(p))["frames"]
                for k in range(0, n, FRAME_STRIDE):
                    ids.append(did)
                    idxs.append(k)
                    refs.append(f"frame://{did}/{k}")
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_ref": refs}
            )

    return docs_with_payload.mapInPandas(gen, schema=FRAMES_SCHEMA)


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import ensure_pyfiles

    ensure_pyfiles(spark)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return sample_frames(docs)


MEDIA_FRAME_SAMPLE_SQL = f"""
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       'frame://' || doc_id || '/' || frame_idx AS frame_ref
FROM (
  SELECT doc_id,
         -- COALESCE mirrors the Spark kernel, which coerces a NULL
         -- payload to b'' and still emits frame 0; without it a NULL
         -- text row would yield no series row and break hash parity
         unnest(generate_series(0, coalesce(octet_length(encode(text)), 0) % 30, {FRAME_STRIDE})) AS frame_idx
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# feature-extract stub: binary payload → fixed-width feature vector
# (deterministic md5-derived fake; a real deployment swaps the kernel
# for an image/audio encoder — the Arrow plumbing is identical)
# ---------------------------------------------------------------------------

FEATURE_DIMS = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def fake_extract_features(payload: bytes) -> list:
    """STUB feature kernel — 16 floats in [0,1) from the md5 digest."""
    import hashlib

    digest = hashlib.md5(payload).digest()
    # md5 yields 16 bytes; cycle so FEATURE_DIMS is a free parameter
    return [digest[i % len(digest)] / 256.0 for i in range(FEATURE_DIMS)]


def extract_features(docs_with_payload: DataFrame) -> DataFrame:
    """(doc_id, payload:binary) → (doc_id, features:array<float>)."""
    from ..session import ensure_pyfiles

    ensure_pyfiles(docs_with_payload.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "features": [fake_extract_features(_as_bytes(p)) for p in pdf["payload"]],
                }
            )

    return docs_with_payload.mapInPandas(gen, schema=FEATURES_SCHEMA)
