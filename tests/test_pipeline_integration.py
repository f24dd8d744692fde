"""Matcher → merger integration (MergerIntegrationTest.scala:21-60 shape):
'One Sierra and multiple Miro works are matched' — updates flow through the
persistent graph, the MatcherResult's components feed the merger, redirects
point at the precedence target."""

import datetime as dt

from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans import (
    create_matcher_table,
    match_and_merge,
    update_graph,
)

UP = "work_id string, version int, candidates array<string>, suppressed boolean"
BATCH_TS = dt.datetime(2024, 7, 1, 9, 0, 0)


def test_matcher_feeds_merger(spark, tmp_path):
    table = create_matcher_table(str(tmp_path / "graph"), num_buckets=4)
    # a sierra work linked to two "miro-style" works, plus an unrelated work
    _, result = update_graph(
        spark,
        table,
        spark.createDataFrame(
            [
                ("sierra1", 1, ["miro1", "miro2"], False),
                ("miro1", 1, [], False),
                ("miro2", 1, [], False),
                ("lonely", 1, [], False),
            ],
            UP,
        ),
        batch_seq=1,
        changeset_id="b1",
    )
    comps = {tuple(sorted(w["work_id"] for w in r["works"])) for r in result.collect()}
    assert ("miro1", "miro2", "sierra1") in comps

    # merger input: component assignment from the graph + per-work payloads
    state = table.read(spark).filter(F.col("version") >= 0)
    payloads = spark.createDataFrame(
        [
            ("sierra1", "sierra", ["item-s"], ["id-s"], None),
            ("miro1", "miro", ["item-m1"], ["id-m1"], "thumb-m1"),
            ("miro2", "miro", ["item-m2"], ["id-m2"], None),
            ("lonely", "sierra", ["item-l"], ["id-l"], None),
        ],
        "work_id string, source_type string, items array<string>, "
        "identifiers array<string>, thumbnail string",
    )
    works = (
        state.select("work_id")
        .join(payloads, "work_id")
        .join(
            state.select(
                "work_id", F.col("candidates").alias("merge_candidate_ids"),
                (F.col("suppressed") == "true").alias("suppressed"),
            ),
            "work_id",
        )
    )
    merged = {r["work_id"]: r for r in match_and_merge(works, BATCH_TS,
              precedence=["sierra", "miro"]).collect()}

    assert merged["sierra1"]["type"] == "Visible"
    # two Miro sources: the ambiguous-association ItemsRule branch leaves the
    # Sierra items alone; ThumbnailRule picks the min-id Miro and counts both
    # Miros as merged ('One Sierra and multiple Miro works are matched',
    # MergerIntegrationTest.scala:58)
    assert merged["sierra1"]["items"] == ["item-s"]
    assert merged["sierra1"]["thumbnail"] == "thumb-m1"  # min-id miro's thumb
    for m in ("miro1", "miro2"):
        assert merged[m]["type"] == "Redirected"
        assert merged[m]["redirect_target"] == "sierra1"
    assert merged["lonely"]["type"] == "Visible" and merged["lonely"]["items"] == ["item-l"]
    # G5: everything stamped with the batch time
    assert merged["sierra1"]["batch_ts"] == BATCH_TS


def test_all_transformer_slices_feed_matcher(spark, tmp_path):
    """Cross-source chain: Sierra, METS, CALM and Miro records go through
    their OWN transformer slices; the emitted merge candidates become
    matcher edges; the matcher must put all four works in one component
    (the reference's physical/digitised/archive/image cluster)."""
    import json

    from catalogue_pipeline_spark.plans.calm_transform import transform_calm
    from catalogue_pipeline_spark.plans.mets_transform import transform_mets
    from catalogue_pipeline_spark.plans.miro_transform import transform_miro
    from catalogue_pipeline_spark.plans.sierra_transform import transform_sierra

    # Sierra bib b1000001x with a Miro 089 link
    sierra = transform_sierra(
        spark.createDataFrame(
            [("1000001", json.dumps({
                "id": "1000001", "deleted": False,
                "varFields": [
                    {"fieldTag": "a", "marcTag": "245", "ind1": " ", "ind2": " ",
                     "subfields": [{"tag": "a", "content": "Physical work"}]},
                    {"fieldTag": "a", "marcTag": "089", "ind1": " ", "ind2": " ",
                     "subfields": [{"tag": "a", "content": "V 123"}]},
                ]}))],
            "id string, content string",
        )
    )
    # Goobi METS for the digitised copy of the same bib
    mets = transform_mets(
        spark.createDataFrame(
            [("B1000001x", "<mets:mets></mets:mets>", False)],
            "id string, content string, deleted boolean",
        )
    )
    # CALM record harvested into Sierra (BNumber back-link)
    calm = transform_calm(
        spark.createDataFrame(
            [("calm-uuid-1", {"Title": ["Archive"], "Level": ["Collection"],
                              "RefNo": ["WA/X"], "CatalogueStatus": ["Catalogued"],
                              "BNumber": ["b1000001x"]}, False)],
            "id string, data map<string,array<string>>, deleted boolean",
        )
    )
    # Miro image V0000123 pointing at the same bib via innopac
    miro = transform_miro(
        spark.createDataFrame(
            [("V0000123", json.dumps({
                "image_title": "An image", "image_copyright_cleared": "Y",
                "image_innopac_id": "1000001x"}), True)],
            "id string, content string, cleared boolean",
        )
    )

    def scheme_id(typ, value):
        return F.concat(F.lit(typ + "/"), value)

    def to_update(works, self_type, self_value_col):
        # candidate strings are 'scheme:value:reason' -> target work id
        cands = F.transform(
            F.col("merge_candidates"),
            lambda c: F.concat_ws("/", F.slice(F.split(c, ":"), 1, 2)),
        )
        return works.select(
            scheme_id(self_type, F.col(self_value_col)).alias("work_id"),
            F.lit(1).alias("version"),
            cands.alias("candidates"),
            F.lit(False).alias("suppressed"),
        )

    # Miro has no merge_candidates of its own (the reference merges
    # Miro↔Sierra from the Sierra side's 089/962), so it joins the graph
    # as a bare node; the Sierra work's candidate provides the edge.
    miro_node = miro.select(
        scheme_id("miro-image-number", F.col("id")).alias("work_id"),
        F.lit(1).alias("version"),
        F.array().cast("array<string>").alias("candidates"),
        F.lit(False).alias("suppressed"),
    )
    updates = (
        to_update(sierra, "sierra-system-number", "id")
        .unionByName(to_update(mets, "mets", "id"))
        .unionByName(to_update(calm, "calm-record-id", "id"))
        .unionByName(miro_node)
    )
    table = create_matcher_table(str(tmp_path / "xsrc"), num_buckets=4)
    _, result = update_graph(spark, table, updates, batch_seq=1, changeset_id="x1")
    comps = {
        tuple(sorted(w["work_id"] for w in r["works"])) for r in result.collect()
    }
    assert (
        "calm-record-id/calm-uuid-1",
        "mets/b1000001x",
        "miro-image-number/V0000123",
        "sierra-system-number/b1000001x",
    ) in comps


def test_tei_internal_works_feed_matcher(spark, tmp_path):
    """TEI ask (round-4): a manuscript explodes into child works that enter
    the matcher as merge fodder — the TEI top-level work links its sierra
    b-number AND its internal works, so the matcher component contains the
    Sierra work, the TEI wrapper and every nested item."""
    import json as _json

    from catalogue_pipeline_spark.plans.sierra_transform import transform_sierra
    from catalogue_pipeline_spark.plans.tei_transform import transform_tei

    tei = transform_tei(
        spark.createDataFrame(
            [("manuscript_77", (
                '<TEI xml:id="m"><teiHeader><fileDesc><publicationStmt>'
                '<idno type="msID">WMS_77</idno></publicationStmt>'
                "<sourceDesc><msDesc><msIdentifier>"
                '<altIdentifier type="Sierra"><idno>b1000001x</idno></altIdentifier>'
                "</msIdentifier><msContents>"
                '<msItem xml:id="it1"><title>First text</title></msItem>'
                '<msItem xml:id="it2"></msItem>'
                "</msContents></msDesc></sourceDesc></fileDesc></teiHeader></TEI>"
            ))],
            "id string, content string",
        )
    )
    row = tei.collect()[0]
    assert row["internal_works"] == [
        "it1|First text||1|-",
        "it2|WMS_77 item 2||1|-",
    ]

    sierra = transform_sierra(
        spark.createDataFrame(
            [("1000001", _json.dumps({
                "id": "1000001", "deleted": False,
                "varFields": [
                    {"fieldTag": "a", "marcTag": "245", "ind1": " ", "ind2": " ",
                     "subfields": [{"tag": "a", "content": "Physical work"}]},
                ]}))],
            "id string, content string",
        )
    )

    # TEI wrapper candidates: the sierra b-number + its internal works
    tei_cands = tei.select(
        F.concat(F.lit("tei/"), F.col("id")).alias("work_id"),
        F.lit(1).alias("version"),
        F.concat(
            F.transform(
                F.col("merge_candidates"),
                lambda c: F.concat_ws("/", F.slice(F.split(c, ":"), 1, 2)),
            ),
            F.transform(
                F.col("internal_works"),
                lambda w: F.concat(F.lit("tei-nested/"), F.split(w, r"\|")[0]),
            ),
        ).alias("candidates"),
        F.lit(False).alias("suppressed"),
    )
    nested_nodes = tei.select(
        F.explode("internal_works").alias("w")
    ).select(
        F.concat(F.lit("tei-nested/"), F.split("w", r"\|")[0]).alias("work_id"),
        F.lit(1).alias("version"),
        F.array().cast("array<string>").alias("candidates"),
        F.lit(False).alias("suppressed"),
    )
    sierra_nodes = sierra.select(
        F.concat(F.lit("sierra-system-number/"), F.col("id")).alias("work_id"),
        F.lit(1).alias("version"),
        F.array().cast("array<string>").alias("candidates"),
        F.lit(False).alias("suppressed"),
    )
    updates = tei_cands.unionByName(nested_nodes).unionByName(sierra_nodes)
    table = create_matcher_table(str(tmp_path / "teigraph"), num_buckets=4)
    _, result = update_graph(spark, table, updates, batch_seq=1, changeset_id="t1")
    comps = {
        tuple(sorted(w["work_id"] for w in r["works"])) for r in result.collect()
    }
    assert (
        "sierra-system-number/b1000001x",
        "tei-nested/it1",
        "tei-nested/it2",
        "tei/manuscript_77",
    ) in comps
