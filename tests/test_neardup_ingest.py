"""Incremental near-dup ingest against the persistent band store.

The continuous-crawl contract: each batch is deduped against every
previously-ingested document (MinHash/LSH band collision, the same
policy as dedup_survivors), survivors' bands fold into the store, and
a replayed batch converges to the identical store state. Semantics of
the status kernel are exact-gated against DuckDB by the
``neardup_incremental_ingest`` registry entry; these tests cover the
on-disk protocol (accumulation, replay, pruning).
"""

from pyspark.sql import functions as F

from pdf_extractor_spark.analytics.dedup import (
    _store_bands,
    band_store_init,
    neardup_ingest,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _text(i: int) -> str:
    # 12 words unique to doc i: no shingle is shared across distinct
    # docs, so band collisions happen ONLY between injected copies
    return " ".join(f"t{i}x{j}" for j in range(12))


def test_ingest_lifecycle_accumulation_and_replay(spark, tmp_path):
    store = str(tmp_path / "bands")
    band_store_init(
        spark, store, _docs(spark, [(i, _text(i)) for i in range(20)])
    )
    base = 4 * 20  # LSH_BANDS rows per doc

    # batch 1: two fresh docs, a copy of corpus doc 3, two copies of
    # fresh doc 100 under larger ids
    batch1 = _docs(spark, [
        (100, _text(100)),
        (101, _text(101)),
        (9003, _text(3)),      # dup of corpus
        (9100, _text(100)),    # dup of in-batch doc 100
        (9101, _text(100)),    # second copy — also dup_in_batch
    ])
    st1 = {r["doc_id"]: r["status"]
           for r in neardup_ingest(spark, store, batch1, 1).collect()}
    assert st1 == {
        100: "kept", 101: "kept",
        9003: "dup_of_corpus",
        9100: "dup_in_batch", 9101: "dup_in_batch",
    }
    full = spark.read.parquet(store)
    assert full.count() == base + 4 * 2  # only survivors' bands added

    # batch 2: a copy of batch-1 survivor 100 now dups AGAINST THE
    # STORE (accumulation), a fresh doc is kept
    st2 = {r["doc_id"]: r["status"]
           for r in neardup_ingest(
               spark, store,
               _docs(spark, [(200, _text(200)), (9200, _text(100))]), 2,
           ).collect()}
    assert st2 == {200: "kept", 9200: "dup_of_corpus"}
    assert spark.read.parquet(store).count() == base + 4 * 3

    # replay batch 1 under the SAME batch id: identical statuses
    # (its own dir is excluded from the decision), store converges
    st1r = {r["doc_id"]: r["status"]
            for r in neardup_ingest(spark, store, batch1, 1).collect()}
    assert st1r == st1
    assert spark.read.parquet(store).count() == base + 4 * 3

    # at-least-once under a NEW batch id: the incoming ids are
    # anti-joined out of the store side, so survivors stay kept
    # (duplicate band rows, same values — collision logic unaffected)
    st1n = {r["doc_id"]: r["status"]
            for r in neardup_ingest(spark, store, batch1, 3).collect()}
    assert st1n == st1


def test_first_ingest_bootstraps_empty_store(spark, tmp_path):
    store = str(tmp_path / "bands")
    st = {r["doc_id"]: r["status"]
          for r in neardup_ingest(
              spark, store,
              _docs(spark, [(1, _text(1)), (2, _text(2)), (3, _text(1))]), 0,
          ).collect()}
    assert st == {1: "kept", 2: "kept", 3: "dup_in_batch"}
    assert spark.read.parquet(store).count() == 4 * 2


def test_ingest_store_scan_is_prefix_pruned(spark, tmp_path):
    store = str(tmp_path / "bands")
    band_store_init(
        spark, store, _docs(spark, [(i, _text(i)) for i in range(40)])
    )
    def scanned(df):
        # files the executed scan actually touches (inputFiles() lists
        # the whole relation BEFORE partition pruning)
        return {
            r["f"]
            for r in df.select(F.input_file_name().alias("f")).distinct().collect()
        }

    all_files = scanned(spark.read.parquet(store))
    # a one-doc batch touches ≤ 4 hash prefixes — the pruned store
    # frame must scan strictly fewer files than the full store
    from pdf_extractor_spark.analytics.dedup import _with_bands

    # same text as corpus doc 0 → its 4 prefixes are guaranteed present
    one = _with_bands(_docs(spark, [(999, _text(0))]))
    pfxs = [r["p"] for r in one.select(
        F.concat(F.lit("x"), F.substring("band_hash", 1, 2)).alias("p")
    ).distinct().collect()]
    pruned = scanned(_store_bands(spark, store, "b9", pfxs))
    assert pruned and pruned < all_files


def test_stream_neardup_ingest_two_waves(spark, tmp_path):
    """Streaming face: wave 2 dedupes against wave 1's survivors via
    the persistent store; a checkpointed replay reprocesses nothing."""
    from pdf_extractor_spark.streaming import stream_neardup_ingest

    inbox = str(tmp_path / "inbox")
    store = str(tmp_path / "bands")
    ckpt = str(tmp_path / "ckpt")
    audit = str(tmp_path / "statuses")

    _docs(spark, [(1, _text(1)), (2, _text(2))]).coalesce(1) \
        .write.mode("append").parquet(inbox)
    stream_neardup_ingest(spark, inbox, store, ckpt, statuses_dir=audit)
    assert spark.read.parquet(store).count() == 4 * 2

    # wave 2: a copy of wave-1 doc 1 under a new id + a fresh doc
    _docs(spark, [(3, _text(1)), (4, _text(4))]).coalesce(1) \
        .write.mode("append").parquet(inbox)
    stream_neardup_ingest(spark, inbox, store, ckpt, statuses_dir=audit)
    assert spark.read.parquet(store).count() == 4 * 3  # only doc 4 added

    st = {r["doc_id"]: r["status"]
          for r in spark.read.parquet(audit).collect()}
    assert st == {1: "kept", 2: "kept", 3: "dup_of_corpus", 4: "kept"}

    # replay with nothing new: checkpoint sees no files, state unchanged
    stream_neardup_ingest(spark, inbox, store, ckpt, statuses_dir=audit)
    assert spark.read.parquet(store).count() == 4 * 3
    assert spark.read.parquet(audit).count() == 4


def test_band_store_compact_folds_dirs_and_keeps_semantics(spark, tmp_path):
    """Compaction folds all batch dirs into one, dedupes replay-
    duplicated band rows, and the store keeps giving the same answers."""
    import os

    from pdf_extractor_spark.analytics.dedup import band_store_compact

    store = str(tmp_path / "bands")
    band_store_init(spark, store, _docs(spark, [(i, _text(i)) for i in range(5)]))
    neardup_ingest(spark, store, _docs(spark, [(10, _text(10))]), 1)
    # new-id replay leaves duplicate band rows for doc 10
    neardup_ingest(spark, store, _docs(spark, [(10, _text(10))]), 2)
    assert spark.read.parquet(store).count() == 4 * 7  # 5 + 10 twice

    def batch_dirs():
        return sorted(
            d for d in os.listdir(store) if d.startswith("batch=")
        )

    assert len(batch_dirs()) == 3
    n = band_store_compact(spark, store, 100)
    assert n == 4 * 6  # duplicates folded
    assert batch_dirs() == ["batch=bc100"]
    assert spark.read.parquet(store).count() == 4 * 6

    # semantics survive the fold: dup of an ingested doc still caught,
    # and a fresh epoch id numerically equal to the compact id is NOT
    # confused with the compact dir (bc vs b namespace)
    st = {r["doc_id"]: r["status"]
          for r in neardup_ingest(
              spark, store,
              _docs(spark, [(20, _text(10)), (21, _text(21))]), 100,
          ).collect()}
    assert st == {20: "dup_of_corpus", 21: "kept"}

    # reusing a compact id refuses
    import pytest

    with pytest.raises(FileExistsError):
        band_store_compact(spark, store, 100)


# --- embedding twin: persistent vector store -------------------------------


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _vec(i: int):
    # orthogonal one-hot vectors: cosine between distinct ids is 0,
    # so dups happen ONLY between injected copies
    v = [0.0] * 64
    v[i % 64] = 1.0
    v[(i * 7 + 13) % 64] = 0.5 if (i * 7 + 13) % 64 != i % 64 else 1.0
    return v


def test_vector_ingest_lifecycle_and_replay(spark, tmp_path):
    from pdf_extractor_spark.analytics.similarity import (
        vector_neardup_ingest,
        vector_store_init,
    )

    store = str(tmp_path / "vecs")
    vector_store_init(
        spark, store, _vecs(spark, [(i, _vec(i)) for i in range(10)])
    )
    batch1 = _vecs(spark, [
        (100, _vec(100)),
        (9003, _vec(3)),      # copy of corpus vector
        (9100, _vec(100)),    # copy of in-batch vector 100
    ])
    st1 = {r["vec_id"]: r["status"]
           for r in vector_neardup_ingest(spark, store, batch1, 1).collect()}
    assert st1 == {
        100: "kept", 9003: "dup_of_corpus", 9100: "dup_in_batch",
    }
    # accumulation: a copy of survivor 100 now dups against the store
    st2 = {r["vec_id"]: r["status"]
           for r in vector_neardup_ingest(
               spark, store, _vecs(spark, [(9200, _vec(100))]), 2,
           ).collect()}
    assert st2 == {9200: "dup_of_corpus"}
    # replay under the same batch id converges
    st1r = {r["vec_id"]: r["status"]
            for r in vector_neardup_ingest(spark, store, batch1, 1).collect()}
    assert st1r == st1
    # store rows: (10 corpus + doc 100) × HP_BANDS
    assert spark.read.parquet(store).count() == 2 * 11


def test_vector_ingest_zero_vectors_all_kept(spark, tmp_path):
    """Junk zero embeddings have NULL cosine against everything —
    including their own copies — so none of them dedupe anything
    (matches the SQL-oracle per-vector policy exactly)."""
    from pdf_extractor_spark.analytics.similarity import vector_neardup_ingest

    store = str(tmp_path / "vecs")
    z = [0.0] * 64
    st = {r["vec_id"]: r["status"]
          for r in vector_neardup_ingest(
              spark, store,
              _vecs(spark, [(1, z), (2, z), (3, _vec(3))]), 0,
          ).collect()}
    assert st == {1: "kept", 2: "kept", 3: "kept"}


def test_concurrent_ingests_serialize_on_store_lock(spark, tmp_path):
    """Two ingests racing on one store must serialize (exclusive
    flock): both commits land, no staging collision, and the second
    writer's decision sees a consistent store. Mirrors the keyed
    store's concurrency contract (lineage.py R3-3)."""
    import threading

    store = str(tmp_path / "bands")
    band_store_init(
        spark, store, _docs(spark, [(i, _text(i)) for i in range(8)])
    )
    results: dict = {}

    def run(batch_id, rows):
        results[batch_id] = {
            r["doc_id"]: r["status"]
            for r in neardup_ingest(
                spark, store, _docs(spark, rows), batch_id
            ).collect()
        }

    t1 = threading.Thread(target=run, args=(1, [(100, _text(100)), (9003, _text(3))]))
    t2 = threading.Thread(target=run, args=(2, [(200, _text(200)), (9005, _text(5))]))
    t1.start(); t2.start(); t1.join(); t2.join()

    assert results[1] == {100: "kept", 9003: "dup_of_corpus"}
    assert results[2] == {200: "kept", 9005: "dup_of_corpus"}
    # both survivors' bands committed — nothing lost to the race
    stored_ids = {
        r["doc_id"]
        for r in spark.read.parquet(store).select("doc_id").distinct().collect()
    }
    assert stored_ids == set(range(8)) | {100, 200}


def test_null_text_docs_are_kept_not_dropped(spark, tmp_path):
    """NULL-text docs must come out 'kept' (their bands are NULL —
    they collide with nothing, exactly the oracle's NULL propagation),
    and must NOT be silently dropped by the md5-fingerprint join's
    NULL keys. Two NULL docs don't dedupe each other either."""
    store = str(tmp_path / "bands")
    band_store_init(spark, store, _docs(spark, [(0, _text(0))]))
    st = {r["doc_id"]: r["status"]
          for r in neardup_ingest(
              spark, store,
              _docs(spark, [(1, None), (2, None), (3, _text(0)), (4, _text(4))]),
              1,
          ).collect()}
    assert st == {1: "kept", 2: "kept", 3: "dup_of_corpus", 4: "kept"}
    # NULL docs contribute no bands; only doc 4's fold in
    assert spark.read.parquet(store).count() == 4 * 2


def test_empty_first_batch_does_not_poison_store(spark, tmp_path):
    """A zero-row first micro-batch commits a dataless batch dir; the
    explicit-schema store scan must read it as empty instead of dying
    on schema inference, so the NEXT ingest works."""
    store = str(tmp_path / "bands")
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert neardup_ingest(spark, store, empty, 0).count() == 0
    st = {r["doc_id"]: r["status"]
          for r in neardup_ingest(
              spark, store, _docs(spark, [(1, _text(1))]), 1
          ).collect()}
    assert st == {1: "kept"}
    assert spark.read.parquet(store).count() == 4


def test_vector_ingest_null_embedding_kept(spark, tmp_path):
    """A NULL embedding lands in a real bucket (sign bits all take the
    ELSE-0 branch) but every cosine against it is NULL — it dedupes
    nothing and is kept, in both engines."""
    from pdf_extractor_spark.analytics.similarity import vector_neardup_ingest

    store = str(tmp_path / "vecs")
    st = {r["vec_id"]: r["status"]
          for r in vector_neardup_ingest(
              spark, store,
              _vecs(spark, [(1, None), (2, _vec(2)), (3, _vec(2))]), 0,
          ).collect()}
    assert st == {1: "kept", 2: "kept", 3: "dup_in_batch"}


def test_band_store_fuzz_interleaved(spark, tmp_path):
    """Composition-level invariant for the ingest store: a randomized
    interleaving of ingests (fresh/dup/NULL mixes), compactions, and
    same-id replays must match a pure-Python first-winner oracle at
    every step. Unique-word texts make LSH collision ≡ exact text
    equality (disjoint shingle sets can never share a band hash short
    of an md5 collision), so the oracle is a dict.

    Exercises the interactions the unit tests cover only pairwise:
    replay AFTER a compaction folded the original batch dir away (the
    incoming-id anti-join must keep the survivor kept), duplicate band
    rows left by replays being invisible to collision logic, and
    compact's distinct-fold restoring the exact survivor band count.
    """
    import random

    from pdf_extractor_spark.analytics.dedup import band_store_compact

    rng = random.Random(7)
    store = str(tmp_path / "bands")
    kept_texts: dict = {}      # text -> winning doc_id (store contents)
    history: dict = {}         # batch_id -> (rows, expected statuses)
    next_id = 0
    batch_id = 0

    def expect(rows, kept):
        out, seen = {}, {}
        for doc_id, t in sorted(rows):
            if t is None:
                out[doc_id] = "kept"
            elif t in kept:
                out[doc_id] = "dup_of_corpus"
            elif t in seen:
                out[doc_id] = "dup_in_batch"
            else:
                seen[t] = doc_id
                out[doc_id] = "kept"
        return out, seen

    def distinct_bands():
        return (
            spark.read.parquet(store)
            .select("doc_id", "band_id", "band_hash")
            .dropDuplicates()
            .count()
        )

    for step in range(12):
        op = rng.choice(["ingest", "ingest", "ingest", "compact", "replay"])
        if op == "ingest" or not history:
            rows = []
            for _ in range(rng.randint(1, 4)):
                r = rng.random()
                if r < 0.15:
                    t = None                      # junk NULL text
                elif r < 0.55 and kept_texts and rng.random() < 0.7:
                    t = rng.choice(list(kept_texts))   # dup of corpus
                else:
                    t = _text(rng.randint(0, 29))      # may repeat in batch
                rows.append((next_id, t))
                next_id += 1
            want, new_kept = expect(rows, kept_texts)
            got = {
                r["doc_id"]: r["status"]
                for r in neardup_ingest(
                    spark, store, _docs(spark, rows), batch_id
                ).collect()
            }
            assert got == want, (step, rows, got, want)
            kept_texts.update(new_kept)
            history[batch_id] = (rows, want)
            batch_id += 1
        elif op == "compact":
            n = band_store_compact(spark, store, step)
            assert n == 4 * len(kept_texts), (step, n, len(kept_texts))
        else:  # replay a random past batch under its original id
            bid = rng.choice(list(history))
            rows, want = history[bid]
            got = {
                r["doc_id"]: r["status"]
                for r in neardup_ingest(
                    spark, store, _docs(spark, rows), bid
                ).collect()
            }
            assert got == want, (step, bid, got, want)
        assert distinct_bands() == 4 * len(kept_texts), step

    assert len(kept_texts) > 3  # the walk actually ingested variety


def test_vector_store_compact_and_stream(spark, tmp_path):
    """Vector-store twin of the compact/stream protocol: two streamed
    waves accumulate, replay is a no-op, compaction folds the batch
    dirs without changing answers."""
    from pdf_extractor_spark.analytics.similarity import (
        vector_neardup_ingest,
        vector_store_compact,
    )
    from pdf_extractor_spark.streaming import stream_vector_ingest

    inbox = str(tmp_path / "inbox")
    store = str(tmp_path / "vecs")
    ckpt = str(tmp_path / "ckpt")
    audit = str(tmp_path / "statuses")

    _vecs(spark, [(1, _vec(1)), (2, _vec(2))]).coalesce(1) \
        .write.mode("append").parquet(inbox)
    stream_vector_ingest(spark, inbox, store, ckpt, statuses_dir=audit)
    _vecs(spark, [(3, _vec(1)), (4, _vec(4))]).coalesce(1) \
        .write.mode("append").parquet(inbox)
    stream_vector_ingest(spark, inbox, store, ckpt, statuses_dir=audit)
    st = {r["vec_id"]: r["status"] for r in spark.read.parquet(audit).collect()}
    assert st == {1: "kept", 2: "kept", 3: "dup_of_corpus", 4: "kept"}
    assert spark.read.parquet(store).count() == 2 * 3  # HP_BANDS rows each

    # replay: checkpoint sees nothing new
    stream_vector_ingest(spark, inbox, store, ckpt, statuses_dir=audit)
    assert spark.read.parquet(store).count() == 2 * 3

    import os

    assert len([d for d in os.listdir(store) if d.startswith("batch=")]) == 2
    n = vector_store_compact(spark, store, 100)
    assert n == 2 * 3
    assert [d for d in os.listdir(store) if d.startswith("batch=")] == [
        "batch=bc100"
    ]
    # answers survive the fold
    st2 = {r["vec_id"]: r["status"]
           for r in vector_neardup_ingest(
               spark, store, _vecs(spark, [(9, _vec(4)), (10, _vec(10))]), 100,
           ).collect()}
    assert st2 == {9: "dup_of_corpus", 10: "kept"}


def test_compact_on_dataless_store_is_clean_noop(spark, tmp_path):
    """A store holding only dataless batch dirs (empty micro-batch
    commits) compacts to zero without schema-inference failure; the
    husks are removed."""
    import os

    from pdf_extractor_spark.analytics.dedup import band_store_compact

    store = str(tmp_path / "bands")
    empty = spark.createDataFrame([], "doc_id long, text string")
    neardup_ingest(spark, store, empty, 0)
    assert band_store_compact(spark, store, 1) == 0
    assert [d for d in os.listdir(store) if d.startswith("batch=")] == []
    # and the store still ingests normally afterwards
    st = {r["doc_id"]: r["status"]
          for r in neardup_ingest(spark, store, _docs(spark, [(1, _text(1))]), 2).collect()}
    assert st == {1: "kept"}


def test_vector_store_fuzz_interleaved(spark, tmp_path):
    """Vector twin of the band-store fuzz: randomized interleaving of
    ingests (fresh / corpus-dup / in-batch-dup / zero / NULL
    embeddings), compactions, and same-id replays against a pure-Python
    first-winner oracle. One-hot `_vec` contents keep cross-content
    cosine <= 0.4 < NEARDUP_THRESHOLD, so dup <=> identical embedding
    and the oracle is a dict. Zero/NULL embeddings are the disclosed
    degenerate class: every copy is kept (cosine NULL fails every
    threshold), yet each batch's min-id zero/NULL rep still folds its
    band rows into the store — the invariant tracks those husks too.
    """
    import random

    from pdf_extractor_spark.analytics.similarity import (
        vector_neardup_ingest,
        vector_store_compact,
    )

    rng = random.Random(11)
    store = str(tmp_path / "vecs")
    kept: dict = {}            # content k -> winning vec_id
    folded_reps: set = set()   # every rep vec_id whose bands are in the store
    history: dict = {}         # batch_id -> (rows, expected statuses)
    next_id = 0
    batch_id = 0

    def expect_and_fold(rows):
        """Oracle statuses + the rep ids this (original) ingest folds."""
        out, seen, folds = {}, {}, set()
        junk_rep = {}  # kind ('zero'|'null') -> min vec_id
        for vec_id, kind, k in sorted(rows):
            if kind != "real":
                out[vec_id] = "kept"
                junk_rep.setdefault(kind, vec_id)
            elif k in kept:
                out[vec_id] = "dup_of_corpus"
            elif k in seen:
                out[vec_id] = "dup_in_batch"
            else:
                seen[k] = vec_id
                out[vec_id] = "kept"
                folds.add(vec_id)
        folds |= set(junk_rep.values())
        return out, seen, folds

    def payload(rows):
        return [
            (vid, None if kind == "null" else ([0.0] * 64 if kind == "zero" else _vec(k)))
            for vid, kind, k in rows
        ]

    def distinct_rows():
        return (
            spark.read.parquet(store)
            .select("vec_id", "band_id", "band_key")
            .dropDuplicates()
            .count()
        )

    for step in range(12):
        op = rng.choice(["ingest", "ingest", "ingest", "compact", "replay"])
        if op == "ingest" or not history:
            rows = []
            for _ in range(rng.randint(1, 4)):
                r = rng.random()
                if r < 0.10:
                    rows.append((next_id, "null", None))
                elif r < 0.20:
                    rows.append((next_id, "zero", None))
                elif r < 0.60 and kept and rng.random() < 0.7:
                    rows.append((next_id, "real", rng.choice(list(kept))))
                else:
                    rows.append((next_id, "real", rng.randint(0, 29)))
                next_id += 1
            want, new_kept, folds = expect_and_fold(rows)
            got = {
                r["vec_id"]: r["status"]
                for r in vector_neardup_ingest(
                    spark, store, _vecs(spark, payload(rows)), batch_id
                ).collect()
            }
            assert got == want, (step, rows, got, want)
            kept.update(new_kept)
            folded_reps |= folds
            history[batch_id] = (rows, want)
            batch_id += 1
        elif op == "compact":
            n = vector_store_compact(spark, store, step)
            assert n == 2 * len(folded_reps), (step, n, len(folded_reps))
        else:  # replay a random past batch under its original id
            bid = rng.choice(list(history))
            rows, want = history[bid]
            got = {
                r["vec_id"]: r["status"]
                for r in vector_neardup_ingest(
                    spark, store, _vecs(spark, payload(rows)), bid
                ).collect()
            }
            assert got == want, (step, bid, got, want)
        assert distinct_rows() == 2 * len(folded_reps), step

    assert len(kept) > 3  # the walk actually ingested variety
