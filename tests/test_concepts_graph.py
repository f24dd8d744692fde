"""Catalogue-graph slice: concept node/edge extraction + the incremental
graph remover (graph/steps/graph_remover.py semantics — snapshot diff, 5%
safety gate, add/delete logs with retention, snapshot advance)."""

import datetime as dt
import os

import pytest

from catalogue_pipeline_spark.plans.concepts import (
    create_remover_state,
    extract_concept_edges,
    extract_concept_nodes,
    run_graph_remover,
)

WORKS_SCHEMA = (
    "id string, subjects array<string>, genres array<string>, contributors array<string>"
)


def works_df(spark, rows):
    return spark.createDataFrame(rows, WORKS_SCHEMA)


def test_concept_nodes_and_edges(spark):
    rows = [
        ("w1", ["Medicine - History"], ["Periodicals"], ["Person|Smith, Jane|editor|P"]),
        ("w2", ["Medicine - History"], [], []),  # same subject → one node
        ("w3", [], [], ["Person|Smith, Jane|editor|S"]),  # same agent label
    ]
    nodes = extract_concept_nodes(works_df(spark, rows)).collect()
    by_label = {(r["type"], r["label"]): r["concept_id"] for r in nodes}
    assert set(by_label) == {
        ("Subject", "Medicine - History"),
        ("Genre", "Periodicals"),
        ("Person", "Smith, Jane"),
    }
    # deterministic label-derived ids in the canonical alphabet
    assert all(len(cid) == 8 for cid in by_label.values())

    edges = extract_concept_edges(works_df(spark, rows)).collect()
    got = {(r["work_id"], r["field"]) for r in edges}
    assert got == {
        ("w1", "subjects"), ("w1", "genres"), ("w1", "contributors"),
        ("w2", "subjects"), ("w3", "contributors"),
    }
    # the shared subject points both works at the SAME concept node
    subj_ids = {r["concept_id"] for r in edges if r["field"] == "subjects"}
    assert len(subj_ids) == 1
    assert subj_ids == {by_label[("Subject", "Medicine - History")]}


def test_graph_remover_diff_log_and_snapshot(spark, tmp_path):
    snap, log = create_remover_state(os.path.join(str(tmp_path), "state"))
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    ids1 = spark.createDataFrame([(f"c{i}",) for i in range(100)], "id string")
    rep1, deleted1 = run_graph_remover(spark, snap, log, ids1, t0)
    assert rep1.first_run and rep1.n_deleted == 0 and rep1.n_added == 100
    assert deleted1.count() == 0
    assert snap.read(spark).count() == 100

    # run 2: 3 ids drop out, 2 new appear (within the 5% gate)
    ids2 = spark.createDataFrame(
        [(f"c{i}",) for i in range(3, 100)] + [("n1",), ("n2",)], "id string"
    )
    rep2, deleted2 = run_graph_remover(spark, snap, log, ids2, t0 + dt.timedelta(days=1))
    assert (rep2.n_deleted, rep2.n_added) == (3, 2)
    assert sorted(r["id"] for r in deleted2.collect()) == ["c0", "c1", "c2"]
    assert snap.read(spark).count() == 99
    logs = log.read(spark).collect()
    assert sum(1 for r in logs if r["action"] == "deleted") == 3
    assert sum(1 for r in logs if r["action"] == "added") == 2

    # run 3: mass deletion trips the 5% gate...
    ids3 = spark.createDataFrame([(f"c{i}",) for i in range(50, 100)], "id string")
    with pytest.raises(ValueError, match="safety gate"):
        run_graph_remover(spark, snap, log, ids3, t0 + dt.timedelta(days=2))
    assert snap.read(spark).count() == 99  # snapshot NOT advanced
    # ...unless forced (the reference's force_pass escape hatch)
    rep3, _ = run_graph_remover(
        spark, snap, log, ids3, t0 + dt.timedelta(days=2), force=True
    )
    assert rep3.n_deleted == 49 and snap.read(spark).count() == 50


def test_graph_remover_log_retention(spark, tmp_path):
    snap, log = create_remover_state(os.path.join(str(tmp_path), "state"))
    t0 = dt.datetime(2024, 1, 1)
    run_graph_remover(spark, snap, log, spark.createDataFrame([("a",), ("b",)], "id string"), t0)
    # a year + later: old log rows age out during the next append
    run_graph_remover(
        spark, snap, log,
        spark.createDataFrame([("a",), ("c",)], "id string"),
        t0 + dt.timedelta(days=400), force=True,
    )
    logs = log.read(spark).collect()
    # first run logged nothing (first_run), so only run-2 rows exist and all
    # are within retention
    assert {(r["id"], r["action"]) for r in logs} == {("b", "deleted"), ("c", "added")}


# ------------------------------------------------------ related concepts

def _edges(spark, rows):
    return spark.createDataFrame(rows, "work_id string, concept_id string, field string")


def test_related_concepts_threshold_and_self_exclusion(spark):
    from catalogue_pipeline_spark.plans.concepts import related_concepts

    rows = []
    for w in range(5):
        rows += [(f"w{w}", "A", "subjects"), (f"w{w}", "B", "subjects")]
    rows += [("w0", "C", "subjects"), ("w1", "C", "subjects")]  # below threshold
    out = related_concepts(_edges(spark, rows), threshold=3, limit=10)
    got = {(r["concept_id"], r["related_id"]): r["shared_works"] for r in out.collect()}
    assert got == {("A", "B"): 5, ("B", "A"): 5}


def test_related_concepts_tie_order_pinned(spark):
    from catalogue_pipeline_spark.plans.concepts import related_concepts

    rows = []
    for w in range(3):
        rows += [(f"w{w}", "A", "subjects"), (f"w{w}", "Z", "subjects"),
                 (f"w{w}", "B", "subjects")]
    out = related_concepts(_edges(spark, rows), threshold=3, limit=1)
    got = {r["concept_id"]: r["related_id"] for r in out.collect()}
    # equal counts -> lowest related_id wins rank 1
    assert got["A"] == "B" and got["Z"] == "A"


def test_related_concepts_supernode_cap_is_deterministic(spark):
    from catalogue_pipeline_spark.plans.concepts import related_concepts

    # HOT co-occurs with B in w0..w9 and with C in w8..w17; cap keeps the 10
    # lexicographically-lowest work ids: w0..w9 + w10..w17 sort as
    # w0,w1,w10..w17 -> B loses co-occurrences deterministically
    rows = []
    for w in range(10):
        rows += [(f"wa{w}", "HOT", "subjects"), (f"wa{w}", "B", "subjects")]
    for w in range(10, 20):
        rows += [(f"wb{w}", "HOT", "subjects"), (f"wb{w}", "C", "subjects")]
    out = related_concepts(
        _edges(spark, rows), threshold=1, limit=10, max_works_per_concept=10
    )
    got = {
        (r["concept_id"], r["related_id"]): r["shared_works"] for r in out.collect()
    }
    # cap keeps wa0..wa9 (lowest ids) -> all 10 B pairs, zero C pairs
    assert got[("HOT", "B")] == 10
    assert ("HOT", "C") not in got
    # the uncapped related side still sees HOT from C's works
    assert got[("C", "HOT")] == 10


def test_related_concepts_field_filters(spark):
    from catalogue_pipeline_spark.plans.concepts import related_concepts

    rows = []
    for w in range(3):
        rows += [
            (f"w{w}", "P1", "contributors"),
            (f"w{w}", "P2", "contributors"),
            (f"w{w}", "S1", "subjects"),
        ]
    # frequent_collaborators shape: contributors x contributors
    out = related_concepts(
        _edges(spark, rows),
        source_fields=["contributors"],
        related_fields=["contributors"],
        threshold=3,
        limit=10,
    )
    got = {(r["concept_id"], r["related_id"]) for r in out.collect()}
    assert got == {("P1", "P2"), ("P2", "P1")}


def test_concepts_graph_fed_from_sierra_slice(spark):
    """Round-4 closing ask: the concepts graph consumes SIERRA-extracted
    subjects/contributors/genres — transform_sierra_concepts +
    transform_sierra_fields emit exactly the columns extract_concept_nodes/
    extract_concept_edges expect, and related_concepts runs over the
    resulting edges."""
    import json

    from pyspark.sql import functions as F

    from catalogue_pipeline_spark.plans.concepts import (
        extract_concept_edges,
        extract_concept_nodes,
        related_concepts,
    )
    from catalogue_pipeline_spark.plans.sierra_concepts import (
        transform_sierra_concepts,
    )
    from catalogue_pipeline_spark.plans.sierra_fields import (
        transform_sierra_fields,
    )

    def bib(sid, subjects, person, genre=None):
        vfs = [
            {"fieldTag": "a", "marcTag": "650", "ind1": " ", "ind2": "0",
             "subfields": [{"tag": "a", "content": s}]}
            for s in subjects
        ]
        vfs.append({"fieldTag": "a", "marcTag": "100", "ind1": " ", "ind2": " ",
                    "subfields": [{"tag": "a", "content": person}]})
        if genre:
            vfs.append({"fieldTag": "a", "marcTag": "655", "ind1": " ",
                        "ind2": " ",
                        "subfields": [{"tag": "a", "content": genre}]})
        return (sid, json.dumps({"id": sid, "deleted": False,
                                 "suppressed": False, "varFields": vfs}))

    rows = [
        bib("1000001", ["Medicine", "Anatomy"], "Vesalius, Andreas", "Woodcuts"),
        bib("1000002", ["Medicine", "Anatomy"], "Vesalius, Andreas"),
        bib("1000003", ["Medicine", "Anatomy"], "Harvey, William", "Woodcuts"),
        bib("1000004", ["Medicine", "Surgery"], "Harvey, William"),
    ]
    bibs = spark.createDataFrame(rows, "id string, content string")
    concepts = transform_sierra_concepts(bibs)
    fields = transform_sierra_fields(bibs)
    # localCheckpoint: the two transformer plans are large expression trees
    # that would otherwise be duplicated into every downstream join
    # (the merger's documented reuse guidance, plans/merger.py:155-158)
    works = (
        concepts.join(fields.select("sierra_id", "genres"), "sierra_id")
        .select(F.col("sierra_id").alias("id"), "subjects", "contributors", "genres")
        .localCheckpoint()
    )

    nodes = {(r["type"], r["label"]) for r in extract_concept_nodes(works).collect()}
    assert ("Subject", "Medicine") in nodes
    assert ("Subject", "Anatomy") in nodes
    assert ("Genre", "Woodcuts") in nodes
    assert ("Person", "Vesalius, Andreas") in nodes

    edges = extract_concept_edges(works)
    rel = related_concepts(
        edges, source_fields=["subjects"], related_fields=["subjects"],
        threshold=3, limit=5,
    )
    labels = extract_concept_nodes(works).select(
        F.col("concept_id"), F.col("label")
    )
    out = {
        (r["src"], r["dst"]): r["shared_works"]
        for r in rel.join(labels.withColumnRenamed("label", "src"), "concept_id")
        .join(
            labels.withColumnsRenamed({"concept_id": "related_id", "label": "dst"}),
            "related_id",
        )
        .collect()
    }
    # Medicine co-occurs with Anatomy on works 1-3 (threshold 3 met); the
    # Medicine–Surgery pair (1 shared work) is below threshold
    assert out == {("Medicine", "Anatomy"): 3, ("Anatomy", "Medicine"): 3}
