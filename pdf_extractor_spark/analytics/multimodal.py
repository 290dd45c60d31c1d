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

from .base import floor_round, load

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


# ---------------------------------------------------------------------------
# Graded query: multimodal_messages_format
# (reference llm_integration/multimodal_utils.py:32-94 is_multimodal +
#  format_multimodal_messages — the message-list normalization in front
#  of every multimodal LLM call)
# ---------------------------------------------------------------------------

_ITEM_T = "struct<type:string,text:string,image_url:struct<url:string>>"
_ITEMS_T = f"array<{_ITEM_T}>"


def multimodal_messages_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """is_multimodal + format_multimodal_messages over a deterministic
    per-document messages fixture (nested array<struct> all the way
    down, as the real call sites ship it):

    * message 0: role='system', plain string content (the reference's
      non-list passthrough branch — role NOT defaulted there);
    * message 1: role='user', a text item + an image item; docs with
      doc_id%3==1 also carry a MALFORMED image item (NULL image_url —
      the reference's try/except KeyError/TypeError skip,
      multimodal_utils.py:77-87); docs with doc_id%5==4 get no image
      at all (is_multimodal=false path);
    * message 2 (even doc_id): role=NULL, one text item — the
      reference's ``message.get("role", "user")`` default.

    Engine side is pure nested-HOF Catalyst (exists/filter/transform/
    flatten) — no explode, no shuffle, no Python.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")

    def _item(typ, text, url):
        return F.struct(
            F.lit(typ).alias("type"),
            (F.lit(None).cast("string") if text is None else text).alias("text"),
            (
                F.lit(None).cast("struct<url:string>")
                if url is None
                else F.struct(url.alias("url"))
            ).alias("image_url"),
        )

    text_item = _item("text", F.concat(F.lit("question "), did), None)
    img_item = _item(
        "image_url", None, F.concat(F.lit("https://img/"), did, F.lit(".jpg"))
    )
    bad_item = _item("image_url", None, None)
    follow_item = _item("text", F.lit("follow"), None)

    items1 = (
        F.when(F.col("doc_id") % 5 == 4, F.array(text_item))
        .when(F.col("doc_id") % 3 == 1, F.array(text_item, img_item, bad_item))
        .otherwise(F.array(text_item, img_item))
    )

    def _msg(role, items):
        return F.struct(
            (F.lit(None).cast("string") if role is None else F.lit(role)).alias(
                "role"
            ),
            (F.lit(None).cast(_ITEMS_T) if items is None else items).alias(
                "items"
            ),
        )

    msgs = F.when(
        F.col("doc_id") % 2 == 0,
        F.array(
            _msg("system", None), _msg("user", items1), _msg(None, F.array(follow_item))
        ),
    ).otherwise(F.array(_msg("system", None), _msg("user", items1)))

    base = docs.select("doc_id", msgs.alias("msgs"))
    with_items = base.select(
        "doc_id",
        "msgs",
        F.flatten(
            F.transform(
                F.filter("msgs", lambda m: m["items"].isNotNull()),
                lambda m: m["items"],
            )
        ).alias("all_items"),
    )
    kept_urls = F.transform(
        F.filter(
            "all_items",
            lambda i: (i["type"] == "image_url") & i["image_url"].isNotNull(),
        ),
        lambda i: i["image_url"]["url"],
    )
    staged = with_items.select(
        "doc_id",
        F.exists(
            "all_items", lambda i: i["type"] == "image_url"
        ).alias("is_mm"),
        F.size("msgs").alias("n_messages"),
        F.size(
            F.filter("all_items", lambda i: i["type"] == "text")
        ).alias("n_text_items"),
        kept_urls.alias("kept_urls"),
        F.size(
            F.filter(
                "all_items",
                lambda i: (i["type"] == "image_url") & i["image_url"].isNull(),
            )
        ).alias("n_img_dropped"),
        # passthrough messages keep their role verbatim; multimodal
        # messages default a NULL role to 'user'
        F.transform(
            "msgs",
            lambda m: F.when(m["items"].isNull(), m["role"]).otherwise(
                F.coalesce(m["role"], F.lit("user"))
            ),
        ).alias("roles_out"),
    )
    return staged.select(
        "doc_id",
        "is_mm",
        "n_messages",
        "n_text_items",
        F.size("kept_urls").alias("n_img_kept"),
        "n_img_dropped",
        "roles_out",
        # try_: ANSI element_at throws on the empty no-image array
        F.try_element_at("kept_urls", F.lit(1)).alias("first_url"),
    ).orderBy("doc_id")


MULTIMODAL_MESSAGES_SQL = """
WITH base AS (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 4 THEN
      [struct_pack(type := 'text', text := 'question ' || doc_id,
                   image_url := NULL::STRUCT(url VARCHAR))]
    WHEN doc_id % 3 = 1 THEN
      [struct_pack(type := 'text', text := 'question ' || doc_id,
                   image_url := NULL::STRUCT(url VARCHAR)),
       struct_pack(type := 'image_url', text := NULL::VARCHAR,
                   image_url := struct_pack(url := 'https://img/' || doc_id || '.jpg')),
       struct_pack(type := 'image_url', text := NULL::VARCHAR,
                   image_url := NULL::STRUCT(url VARCHAR))]
    ELSE
      [struct_pack(type := 'text', text := 'question ' || doc_id,
                   image_url := NULL::STRUCT(url VARCHAR)),
       struct_pack(type := 'image_url', text := NULL::VARCHAR,
                   image_url := struct_pack(url := 'https://img/' || doc_id || '.jpg'))]
    END AS items1
  FROM documents
), msgs AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0 THEN
      [struct_pack(role := 'system',
                   items := NULL::STRUCT(type VARCHAR, text VARCHAR,
                                         image_url STRUCT(url VARCHAR))[]),
       struct_pack(role := 'user', items := items1),
       struct_pack(role := NULL::VARCHAR,
                   items := [struct_pack(type := 'text', text := 'follow',
                                         image_url := NULL::STRUCT(url VARCHAR))])]
    ELSE
      [struct_pack(role := 'system',
                   items := NULL::STRUCT(type VARCHAR, text VARCHAR,
                                         image_url STRUCT(url VARCHAR))[]),
       struct_pack(role := 'user', items := items1)]
    END AS msgs
  FROM base
), flat AS (
  SELECT doc_id, msgs,
    flatten(list_transform(list_filter(msgs, m -> m.items IS NOT NULL),
                           m -> m.items)) AS all_items
  FROM msgs
), staged AS (
  SELECT doc_id,
    len(list_filter(all_items, i -> i.type = 'image_url')) > 0 AS is_mm,
    len(msgs) AS n_messages,
    len(list_filter(all_items, i -> i.type = 'text')) AS n_text_items,
    list_transform(
      list_filter(all_items,
                  i -> i.type = 'image_url' AND i.image_url IS NOT NULL),
      i -> i.image_url.url) AS kept_urls,
    len(list_filter(all_items,
                    i -> i.type = 'image_url' AND i.image_url IS NULL))
      AS n_img_dropped,
    list_transform(msgs, m -> CASE WHEN m.items IS NULL THEN m.role
                                   ELSE coalesce(m.role, 'user') END)
      AS roles_out
  FROM flat
)
SELECT doc_id, is_mm, n_messages, n_text_items,
       len(kept_urls) AS n_img_kept, n_img_dropped, roles_out,
       kept_urls[1] AS first_url
FROM staged
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Graded query: image_compress_plan
# (reference llm_integration/utils/image_utils.py:83-175
#  process_image_input + compress_image — the routing decision and the
#  quality/resize attempt schedule; the actual PIL save is stubbed by
#  the disclosed deterministic size model below, same policy as the
#  fake decode kernels at the top of this module)
# ---------------------------------------------------------------------------

IMG_MAX_KB = 500       # process_image_input default
IMG_MAX_ATTEMPTS = 5   # compress_image default
IMG_RESIZE_STEP = 10   # percent per failed attempt

# STUB size model (no PIL in this container): a save at quality q and
# dimensions (w, h) is modeled as  orig_kb * (q/90) * (w*h)/(w0*h0).
# Monotone in q and area like a real JPEG encoder, exact-arithmetic
# reproducible in both engines; a real deployment swaps the model for
# the actual encoder, the schedule around it is unchanged.


def image_compress_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's image-input routing + compression schedule over
    synthesized per-document image metadata (route by doc_id%3; size/
    dims deterministic functions of doc_id).

    Faithful branches: http URLs pass through untouched
    (image_utils.py:97-98); base64 inputs skip compression when the
    decoded payload is already within bounds (:207-213); local paths
    always compress (:104-108). The attempt loop mirrors
    compress_image:148-167 — attempt k saves at quality max(10,90-10k)
    with dimensions int-truncated 10 % per PRIOR failed attempt (never
    resized after the last attempt), first attempt within max_size_kb
    wins, all-fail returns the original. Unrolled to the 5 fixed
    attempts: a map-only projection, no shuffle, no Python.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    base = docs.select(
        "doc_id",
        # up to ~5 MB so the all-attempts-fail branch (orig returned,
        # compress_image:169-172) occurs: 5000*(50/90)*0.81^4 > 500
        (100 + (d * 37) % 4900).cast("double").alias("orig_kb"),
        (640 + (d % 7) * 160).cast("double").alias("w0"),
        (480 + (d % 5) * 120).cast("double").alias("h0"),
        F.when(d % 3 == 0, F.lit("url"))
        .when(d % 3 == 1, F.lit("base64"))
        .otherwise(F.lit("path"))
        .alias("route"),
    )
    # unrolled dims after k truncating resizes (int(w*0.9) per step)
    cols = {"w_0": F.col("w0"), "h_0": F.col("h0")}
    for k in range(1, IMG_MAX_ATTEMPTS):
        cols[f"w_{k}"] = F.floor(cols[f"w_{k-1}"] * 0.9).cast("double")
        cols[f"h_{k}"] = F.floor(cols[f"h_{k-1}"] * 0.9).cast("double")
    staged = base.select(
        "doc_id", "orig_kb", "w0", "h0", "route",
        *[c.alias(n) for n, c in cols.items()],
    )
    attempts = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.lit(max(10, 90 - 10 * k)).cast("double").alias("q"),
                F.col(f"w_{k}").alias("w"),
                F.col(f"h_{k}").alias("h"),
                floor_round(
                    F.col("orig_kb")
                    * (max(10, 90 - 10 * k) / 90.0)
                    * (F.col(f"w_{k}") * F.col(f"h_{k}"))
                    / (F.col("w0") * F.col("h0")),
                    4,
                ).alias("kb"),
            )
            for k in range(IMG_MAX_ATTEMPTS)
        ]
    )
    staged = staged.select(
        "doc_id", "orig_kb", "route",
        F.filter(attempts, lambda a: a["kb"] <= IMG_MAX_KB).alias("ok_attempts"),
    )
    win = F.try_element_at("ok_attempts", F.lit(1))
    compress_needed = (F.col("route") == "path") | (
        (F.col("route") == "base64") & (F.col("orig_kb") > IMG_MAX_KB)
    )
    passthrough = ~compress_needed
    success = compress_needed & win.isNotNull()
    return staged.select(
        "doc_id",
        "route",
        "orig_kb",
        passthrough.alias("passthrough"),
        F.when(compress_needed, win.isNotNull()).alias("success"),
        F.when(success, win["k"] + 1).alias("n_attempts"),
        F.when(success, win["q"]).alias("final_q"),
        F.when(success, win["w"]).alias("final_w"),
        F.when(success, win["h"]).alias("final_h"),
        F.when(success, win["kb"]).otherwise(F.col("orig_kb")).alias("final_kb"),
    ).orderBy("doc_id")


def _img_attempts_sql() -> str:
    entries = []
    for k in range(IMG_MAX_ATTEMPTS):
        q = max(10, 90 - 10 * k)
        entries.append(
            f"struct_pack(k := {k}, q := CAST({q} AS DOUBLE), w := w_{k}, h := h_{k}, "
            f"kb := floor(orig_kb * ({q} / 90.0) * (w_{k} * h_{k}) "
            f"/ (w0 * h0) * 10000 + 1e-6) / 10000)"
        )
    return "[" + ",\n       ".join(entries) + "]"


def _img_dims_sql() -> str:
    lines = ["w0 AS w_0", "h0 AS h_0"]
    for k in range(1, IMG_MAX_ATTEMPTS):
        lines.append(f"floor(w_{k-1} * 0.9) AS w_{k}")
        lines.append(f"floor(h_{k-1} * 0.9) AS h_{k}")
    return ",\n         ".join(lines)


IMAGE_COMPRESS_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CAST(100 + (doc_id * 37) % 4900 AS DOUBLE) AS orig_kb,
         CAST(640 + (doc_id % 7) * 160 AS DOUBLE) AS w0,
         CAST(480 + (doc_id % 5) * 120 AS DOUBLE) AS h0,
         CASE WHEN doc_id % 3 = 0 THEN 'url'
              WHEN doc_id % 3 = 1 THEN 'base64'
              ELSE 'path' END AS route
  FROM documents
), dims AS (
  SELECT *, {_img_dims_sql()}
  FROM base
), tries AS (
  SELECT doc_id, orig_kb, route,
    list_filter({_img_attempts_sql()}, a -> a.kb <= {IMG_MAX_KB}) AS ok
  FROM dims
), picked AS (
  SELECT doc_id, orig_kb, route, ok[1] AS win,
    (route = 'path' OR (route = 'base64' AND orig_kb > {IMG_MAX_KB}))
      AS compress_needed
  FROM tries
)
SELECT doc_id, route, orig_kb,
  NOT compress_needed AS passthrough,
  CASE WHEN compress_needed THEN win IS NOT NULL END AS success,
  CASE WHEN compress_needed AND win IS NOT NULL THEN win.k + 1 END
    AS n_attempts,
  CASE WHEN compress_needed AND win IS NOT NULL THEN win.q END AS final_q,
  CASE WHEN compress_needed AND win IS NOT NULL THEN win.w END AS final_w,
  CASE WHEN compress_needed AND win IS NOT NULL THEN win.h END AS final_h,
  CASE WHEN compress_needed AND win IS NOT NULL THEN win.kb
       ELSE orig_kb END AS final_kb
FROM picked
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Perceptual-hash media near-dup (training:media-phash-dedup) — the
# image twin of MinHash text dedup: a dHash-style 64-bit fingerprint
# (8×8 grid of "is this pixel brighter than its right neighbour")
# bucketed into four 16-bit bands; docs sharing any band are
# candidates, exact Hamming distance (bit_count of XOR) decides. The
# decode step follows the module's stub contract: "pixels" are
# deterministic samples of the payload characters (real image decode
# is environment-gated; the hashing/banding/join plumbing is the real
# surface). Identical media ⇒ identical hash ⇒ Hamming 0 via every
# band — the injected +OFFSET copies guarantee recall-1 pairs.
#
# Everything is integer/character arithmetic (ascii/substr/xor/
# bit_count — native in both engines): zero UDFs, and the oracle
# matches exactly. Scale shape: map-only hash, explode ×4 bands,
# band equi-join (never all-pairs), distinct, exact filter.
# ---------------------------------------------------------------------------

PHASH_GRID = 8          # 8×8 comparison grid → 64 bits, 4×16-bit bands
PHASH_PAD = 80          # sample window (chars); rpad keeps short docs total
PHASH_HAM_MAX = 8
PHASH_N_INJECT = 20
PHASH_ID_OFFSET = 1_000_000


def _phash_idx(r: int, c: int) -> int:
    """1-based char index of grid cell (r, c) in the padded window."""
    return (r * (PHASH_GRID + 1) + c) * (PHASH_PAD - 1) // (
        PHASH_GRID * (PHASH_GRID + 1)
    ) + 1


def _phash_band_cols(text_col):
    """Four 16-bit band values of the dHash over ``text_col``."""
    padded = F.rpad(F.coalesce(text_col, F.lit("")), PHASH_PAD, ".")

    def px(r, c):
        return F.ascii(F.substring(padded, _phash_idx(r, c), 1))

    bands = []
    for k in range(4):
        val = F.lit(0)
        for r in (2 * k, 2 * k + 1):
            for c in range(PHASH_GRID):
                bit = (px(r, c) > px(r, c + 1)).cast("int")
                val = val + (bit * F.lit(1 << ((r % 2) * PHASH_GRID + c)))
        bands.append(val.cast("long"))
    return bands


def _phash_band_sql(text_expr: str, k: int) -> str:
    terms = []
    for r in (2 * k, 2 * k + 1):
        for c in range(PHASH_GRID):
            a = f"ascii(substr(rpad(coalesce({text_expr}, ''), {PHASH_PAD}, '.'), {_phash_idx(r, c)}, 1))"
            b = f"ascii(substr(rpad(coalesce({text_expr}, ''), {PHASH_PAD}, '.'), {_phash_idx(r, c + 1)}, 1))"
            terms.append(
                f"(CASE WHEN {a} > {b} THEN {1 << ((r % 2) * PHASH_GRID + c)} ELSE 0 END)"
            )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def media_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.where(F.col("doc_id") < PHASH_N_INJECT).select(
        (F.col("doc_id") + PHASH_ID_OFFSET).alias("doc_id"), "text"
    )
    pool = docs.unionByName(dups)
    b = _phash_band_cols(F.col("text"))
    hashed = pool.select(
        "doc_id", *[bi.alias(f"b{i}") for i, bi in enumerate(b)]
    )
    banded = hashed.select(
        "doc_id", "b0", "b1", "b2", "b3",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"), F.col(f"b{i}").alias("v"))
                for i in range(4)
            ])
        ).alias("bb"),
    ).select("doc_id", "b0", "b1", "b2", "b3",
             F.col("bb.band").alias("band"), F.col("bb.v").alias("v"))
    a, c = banded.alias("a"), banded.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.band") == F.col("c.band"))
            & (F.col("a.v") == F.col("c.v"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("c.doc_id").alias("b_id"),
            *[
                (
                    F.bit_count(
                        F.col(f"a.b{i}").bitwiseXOR(F.col(f"c.b{i}"))
                    )
                ).alias(f"h{i}")
                for i in range(4)
            ],
        )
        .distinct()
    )
    ham = sum(F.col(f"h{i}") for i in range(4))
    return (
        cand.select("a_id", "b_id", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= PHASH_HAM_MAX)
        .orderBy("a_id", "b_id")
    )


MEDIA_PHASH_SQL = f"""
WITH pool AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {PHASH_ID_OFFSET}, text FROM documents
  WHERE doc_id < {PHASH_N_INJECT}
),
hashed AS (
  SELECT doc_id,
         {_phash_band_sql('text', 0)} AS b0,
         {_phash_band_sql('text', 1)} AS b1,
         {_phash_band_sql('text', 2)} AS b2,
         {_phash_band_sql('text', 3)} AS b3
  FROM pool
),
banded AS (
  SELECT doc_id, b0, b1, b2, b3, band,
         CASE band WHEN 0 THEN b0 WHEN 1 THEN b1
                   WHEN 2 THEN b2 ELSE b3 END AS v
  FROM hashed, unnest([0, 1, 2, 3]) AS u(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, c.doc_id AS b_id,
         bit_count(xor(a.b0, c.b0)) + bit_count(xor(a.b1, c.b1))
         + bit_count(xor(a.b2, c.b2)) + bit_count(xor(a.b3, c.b3))
           AS hamming
  FROM banded a JOIN banded c
    ON a.band = c.band AND a.v = c.v AND a.doc_id < c.doc_id
)
SELECT a_id, b_id, CAST(hamming AS INT) AS hamming
FROM cand
WHERE hamming <= {PHASH_HAM_MAX}
ORDER BY a_id, b_id
"""


# ---------------------------------------------------------------------------
# Caption-pair mining over interleaved spans (training:caption-pairs,
# R4-25)
#
# The CLIP/LAION-style alignment step: an interleaved document's media
# spans pair with the nearest PRECEDING text anchor (the alt-text /
# caption heuristic). The interleaved structure is synthesized
# deterministically from documents in BOTH engines — doc_id % 3 media
# spans per doc at md5-derived token offsets, caption anchors at
# md5-derived sentence boundaries (position 1 always anchors) — so the
# pairing itself is what the oracle grades.
#
# Scale shape: the anchor side explodes once (map-only md5 per token);
# the pairing is the docs/PLANS.md §18 extremum idiom — the
# cap_pos <= media_offset inequality rides the doc_id equi-key
# (hash join, never a per-doc window or cartesian), and the
# nearest-anchor pick is max(cap_pos) — ONE map-side-combinable hash
# aggregate per (doc, media) key — with the caption token joined back
# on the (doc_id, cap_pos) equi-key.
# ---------------------------------------------------------------------------

CAPTION_BOUNDARY_MOD = 4  # ~1/4 of positions start a caption anchor


def _md5_long(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def caption_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", r"\s+").alias("toks")
    )
    toks = docs.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    anchors = toks.where(
        (F.col("tok") != "")
        & (
            (F.col("p") == 1)
            | (
                _md5_long(
                    F.concat(
                        F.lit("b|"),
                        F.col("doc_id").cast("string"),
                        F.lit("|"),
                        F.col("p").cast("string"),
                    )
                )
                % CAPTION_BOUNDARY_MOD
                == 0
            )
        )
    ).select("doc_id", F.col("p").alias("cap_pos"), F.col("tok").alias("cap_tok"))
    media = (
        # the %3==0 pre-filter is load-bearing: Spark's sequence(1, 0)
        # infers step=-1 and yields [1, 0] (not empty) — zero-media
        # docs must never reach the explode
        docs.where((F.size("toks") >= 1) & (F.col("doc_id") % 3 >= 1))
        .select(
            "doc_id",
            F.size("toks").alias("ntok"),
            F.explode(F.sequence(F.lit(1), (F.col("doc_id") % 3).cast("int"))).alias("j"),
        )
        .select(
            "doc_id",
            F.concat(
                F.lit("media://"), F.col("doc_id").cast("string"),
                F.lit("/"), F.col("j").cast("string"),
            ).alias("media_ref"),
            (
                _md5_long(
                    F.concat(
                        F.lit("cap|"),
                        F.col("doc_id").cast("string"),
                        F.lit("|"),
                        F.col("j").cast("string"),
                    )
                )
                % F.col("ntok")
                + 1
            ).alias("media_offset"),
        )
    )
    # nearest anchor = max(cap_pos) — a pure-int aggregate so the
    # aggregation stays a HashAggregate (a struct carrying the STRING
    # cap_tok would demote it to SortAggregate — docs/PLANS.md §14);
    # the token rides back on a (doc_id, cap_pos) equi-join (anchor
    # positions are unique within a doc, so the join is 1:1).
    nearest = (
        media.join(anchors, "doc_id")
        .where(F.col("cap_pos") <= F.col("media_offset"))
        .groupBy("doc_id", "media_ref", "media_offset")
        .agg(F.max("cap_pos").alias("cap_pos"))
    )
    return (
        nearest.join(anchors, ["doc_id", "cap_pos"])
        .select("doc_id", "media_ref", "media_offset", "cap_pos", "cap_tok")
        .orderBy("doc_id", "media_ref")
    )


CAPTION_PAIRS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS p,
         len(t) AS ntok
  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents)
),
anchors AS (
  SELECT doc_id, p AS cap_pos, tok AS cap_tok
  FROM toks
  WHERE tok <> '' AND (
    p = 1 OR
    CAST('0x' || substr(md5('b|' || CAST(doc_id AS VARCHAR) || '|'
                             || CAST(p AS VARCHAR)), 1, 8) AS BIGINT)
      % {CAPTION_BOUNDARY_MOD} = 0
  )
),
media AS (
  SELECT d.doc_id,
         'media://' || CAST(d.doc_id AS VARCHAR) || '/'
           || CAST(u.j AS VARCHAR) AS media_ref,
         CAST('0x' || substr(md5('cap|' || CAST(d.doc_id AS VARCHAR) || '|'
                                  || CAST(u.j AS VARCHAR)), 1, 8) AS BIGINT)
           % len(string_split_regex(d.text, '\s+')) + 1 AS media_offset
  FROM documents d,
       unnest(generate_series(1, CAST(d.doc_id % 3 AS INT))) AS u(j)
  WHERE len(string_split_regex(d.text, '\s+')) >= 1
)
SELECT doc_id, media_ref, media_offset, cap_pos, cap_tok
FROM (
  SELECT m.doc_id, m.media_ref, m.media_offset, a.cap_pos, a.cap_tok,
         row_number() OVER (
           PARTITION BY m.doc_id, m.media_ref
           ORDER BY a.cap_pos DESC
         ) AS rn
  FROM media m
  JOIN anchors a ON a.doc_id = m.doc_id AND a.cap_pos <= m.media_offset
)
WHERE rn = 1
ORDER BY doc_id, media_ref
"""
