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


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload:binary) → media metadata.

    Vectorized per Arrow batch; zero per-row Python at the Spark level
    (the loop below is inside the batch, same as any pandas op).
    """
    for pdf in batches:
        metas = [fake_decode_media(p) for p in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def media_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded to a binary payload column, decoded back
    to typed metadata through the mapInPandas pipeline."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.mapInPandas(decode_media_batch, schema=MEDIA_META_SCHEMA)


MEDIA_DECODE_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS width,
       CAST((octet_length(encode(text)) * 7) % 480 + 16 AS INTEGER) AS height,
       CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS frames,
       'fake/v1' AS codec
FROM documents
"""
