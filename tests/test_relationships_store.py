"""Relationship edge collection lifecycle on the keyed store.

Reference flows under test: add_relationship / delete_relationship
(arangodb/relationships.py:86-205) and the strategic-creation rules
(agent_decision.py:125-168: forced validation of rationale length and
confidence range) — persisted through the repo's copy-on-write MERGE
instead of ArangoDB document CRUD.
"""

import pytest

from pdf_extractor_spark.analytics.solve import relationship_candidates
from pdf_extractor_spark.operators.relationships import (
    RATIONALE_MIN_LENGTH,
    add_relationships,
    delete_relationships,
    get_relationships,
)

SF = "/root/testdata/sf0.001"


def _edges_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "from_id string, to_id string, rel_type string, rationale string,"
        " confidence_score int",
    )


def test_edge_store_full_lifecycle(spark, tmp_path):
    store = str(tmp_path / "edges")

    # proposals from the decision layer become strategic edges
    cands = relationship_candidates(spark, SF).collect()
    assert len(cands) >= 3
    rationale = ("assessed: " + "x" * RATIONALE_MIN_LENGTH)
    edges = _edges_df(
        spark,
        [
            (str(c["from_doc_id"]), str(c["to_doc_id"]),
             c["suggested_type"], rationale + " " + c["explanation"], 2)
            for c in cands
        ],
    )
    add_relationships(spark, store, edges, strategic=True)
    got = {
        (r["from_id"], r["to_id"]): r
        for r in get_relationships(spark, store).collect()
    }
    assert len(got) == len(cands)
    for c in cands:
        r = got[(str(c["from_doc_id"]), str(c["to_doc_id"]))]
        assert r["rel_type"] == c["suggested_type"]
        assert r["confidence_score"] == 2
        f = str(c["from_doc_id"])
        assert r["doc_id"] == f"{len(f)}:{f}->{c['to_doc_id']}"

    # re-adding an existing pair REPLACES the edge (upsert-by-key)
    first = cands[0]
    pair = (str(first["from_doc_id"]), str(first["to_doc_id"]))
    add_relationships(
        spark, store,
        _edges_df(spark, [(pair[0], pair[1], "REFERENCES",
                           "r" * RATIONALE_MIN_LENGTH, 1)]),
        strategic=True,
    )
    fetched = get_relationships(spark, store, pairs=[pair]).collect()
    assert len(fetched) == 1
    assert fetched[0]["rel_type"] == "REFERENCES"
    assert fetched[0]["confidence_score"] == 1
    assert get_relationships(spark, store).count() == len(cands)

    # point fetch prunes: scan touches fewer files than the full read
    full_files = set(get_relationships(spark, store).inputFiles())
    point_files = set(
        get_relationships(spark, store, pairs=[pair]).inputFiles()
    )
    assert point_files and point_files < full_files

    # keyed delete; deleting again is an idempotent no-op
    delete_relationships(
        spark, store, _edges_df(
            spark, [(pair[0], pair[1], "x", "x", None)]
        ).select("from_id", "to_id"),
    )
    assert get_relationships(spark, store, pairs=[pair]).count() == 0
    assert get_relationships(spark, store).count() == len(cands) - 1
    delete_relationships(
        spark, store, _edges_df(
            spark, [(pair[0], pair[1], "x", "x", None)]
        ).select("from_id", "to_id"),
    )
    assert get_relationships(spark, store).count() == len(cands) - 1


def test_edge_validation_rejects_bad_batches(spark, tmp_path):
    store = str(tmp_path / "edges")
    ok = ("a", "b", "SIMILAR", "r" * RATIONALE_MIN_LENGTH, 3)

    with pytest.raises(ValueError, match="bad_rationale"):
        add_relationships(
            spark, store,
            _edges_df(spark, [ok, ("c", "d", "SIMILAR", "too short", 3)]),
            strategic=True,
        )
    with pytest.raises(ValueError, match="bad_type"):
        add_relationships(
            spark, store,
            _edges_df(spark, [("c", "d", "", "r" * RATIONALE_MIN_LENGTH, 3)]),
        )
    with pytest.raises(ValueError, match="bad_confidence"):
        add_relationships(
            spark, store,
            _edges_df(spark, [("c", "d", "SIMILAR",
                               "r" * RATIONALE_MIN_LENGTH, 9)]),
        )
    # nothing committed by the failed batches — not even the store
    from pdf_extractor_spark.lineage import read_lineage

    assert read_lineage(store) == {}

    # non-strategic path accepts any non-empty rationale
    add_relationships(spark, store, _edges_df(spark, [
        ("c", "d", "SIMILAR", "short is fine here", None)
    ]))
    row, = get_relationships(spark, store).collect()
    assert row["confidence_score"] is None
    assert row["from_id"] == "c" and row["to_id"] == "d"


def test_edge_key_injective_on_arrow_in_ids(spark, tmp_path):
    """Ids containing '->' must not collide: ('a->b','c') and
    ('a','b->c') are distinct edges (the length-prefixed key pins
    where from_id ends)."""
    store = str(tmp_path / "edges")
    r = "r" * RATIONALE_MIN_LENGTH
    add_relationships(spark, store, _edges_df(spark, [
        ("a->b", "c", "SIMILAR", r, 3),
        ("a", "b->c", "REFERENCES", r, 4),
    ]))
    rows = get_relationships(spark, store).collect()
    assert len(rows) == 2
    by_pair = {(x["from_id"], x["to_id"]): x for x in rows}
    assert by_pair[("a->b", "c")]["rel_type"] == "SIMILAR"
    assert by_pair[("a", "b->c")]["rel_type"] == "REFERENCES"
    # deleting one pair leaves the other intact
    delete_relationships(
        spark, store,
        _edges_df(spark, [("a->b", "c", "x", "x", None)])
        .select("from_id", "to_id"),
    )
    row, = get_relationships(spark, store).collect()
    assert (row["from_id"], row["to_id"]) == ("a", "b->c")


def test_strategic_edge_requires_confidence(spark, tmp_path):
    """The agent path re-prompts until a 1-5 confidence is supplied
    (agent_decision.py:154-165) — a NULL confidence on strategic=True
    must fail the batch; the casual path still accepts NULL."""
    store = str(tmp_path / "edges")
    r = "r" * RATIONALE_MIN_LENGTH
    with pytest.raises(ValueError, match="bad_confidence"):
        add_relationships(
            spark, store,
            _edges_df(spark, [("a", "b", "SIMILAR", r, None)]),
            strategic=True,
        )
    from pdf_extractor_spark.lineage import read_lineage

    assert read_lineage(store) == {}


def test_delete_documents_cascade(spark, tmp_path):
    """Vertex delete with incident-edge cleanup (lessons.py:189-226
    delete_lesson): edges touching the deleted doc vanish from BOTH
    directions, unrelated edges and docs survive, re-run is a no-op,
    and delete_edges=False leaves the edge collection untouched."""
    from pdf_extractor_spark.lineage import init_store, read_output
    from pdf_extractor_spark.operators.relationships import (
        delete_documents_cascade,
    )

    docs = str(tmp_path / "docs")
    edges = str(tmp_path / "edges")
    init_store(
        spark, docs,
        spark.createDataFrame(
            [(d, o, f"{d}-{o}") for d in ("d1", "d2", "d3") for o in (0, 1)],
            "doc_id string, offset int, text string",
        ),
        n_buckets=4,
    )
    r = "r" * RATIONALE_MIN_LENGTH
    add_relationships(spark, edges, _edges_df(spark, [
        ("d1", "d2", "SIMILAR", r, 3),      # outbound from d1
        ("d3", "d1", "REFERENCES", r, 2),   # inbound to d1
        ("d2", "d3", "SIMILAR", r, 4),      # untouched
    ]))

    out = delete_documents_cascade(spark, docs, edges, ["d1"])
    assert set(out) == {"edges", "documents"}
    assert sorted(
        r["doc_id"] for r in read_output(spark, docs).select("doc_id")
        .distinct().collect()
    ) == ["d2", "d3"]
    row, = get_relationships(spark, edges).collect()
    assert (row["from_id"], row["to_id"]) == ("d2", "d3")

    # idempotent re-run: same end state, no error
    delete_documents_cascade(spark, docs, edges, ["d1"])
    assert read_output(spark, docs).select("doc_id").distinct().count() == 2
    assert get_relationships(spark, edges).count() == 1

    # delete_edges=False = vertex-only removal (reference's flag)
    delete_documents_cascade(spark, docs, edges, ["d2"], delete_edges=False)
    assert [r["doc_id"] for r in read_output(spark, docs)
            .select("doc_id").distinct().collect()] == ["d3"]
    assert get_relationships(spark, edges).count() == 1


def test_relationships_of_directions_and_types(spark):
    """Reference relationship_api.py:75-103 parity: OUTBOUND matches
    _from, INBOUND matches _to, ANY either; `e.type IN types` filters;
    an invalid direction raises like the reference's ValueError."""
    import pytest

    from pdf_extractor_spark.operators.relationships import relationships_of

    edges = spark.createDataFrame(
        [
            ("a", "b", "cites"),
            ("b", "a", "similar"),
            ("a", "c", "similar"),
            ("c", "d", "cites"),
        ],
        "_from string, _to string, type string",
    )

    def keys(df):
        return sorted((r["_from"], r["_to"]) for r in df.collect())

    assert keys(relationships_of(edges, "a", "outbound")) == [
        ("a", "b"), ("a", "c"),
    ]
    assert keys(relationships_of(edges, "a", "inbound")) == [("b", "a")]
    assert keys(relationships_of(edges, "a", "any")) == [
        ("a", "b"), ("a", "c"), ("b", "a"),
    ]
    assert keys(relationships_of(edges, "a", "ANY", types=["cites"])) == [
        ("a", "b"),
    ]
    assert relationships_of(edges, "zz", "any").count() == 0
    with pytest.raises(ValueError, match="Invalid direction"):
        relationships_of(edges, "a", "sideways")
