"""Works-ingestor document builder parity tests — scenarios mirrored from
catalogue_graph/tests/ingestor/test_display_transformer.py,
test_query_transformer.py, test_aggregatable_values.py and the
Availability.scala semantics."""

import pytest
from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.works_ingestor import (
    NEGATIVE_INFINITY_DATE,
    NEGATIVE_INFINITY_MILLIS,
    WORK_SCHEMA,
    extract_works,
    indexable_works,
)

def concept(cid, label, ids=None, ctype="Concept"):
    return {
        "concept_id": cid,
        "label": label,
        "identifiers": ids or [],
        "concept_type": ctype,
    }


def loc(kind="physical", lt="closed-stores", **kw):
    base = {
        "kind": kind, "location_type_id": lt, "location_type_label": None,
        "label": None, "shelfmark": None, "url": None, "link_text": None,
        "credit": None, "created_date": None, "license_id": None,
        "access_status": None, "access_relationship": None,
    }
    base.update(kw)
    return base


def work(wid, **kw):
    base = dict(
        work_id=wid, type="Visible", work_type="Standard",
        source_scheme="sierra-system-number", source_value="b" + wid,
        other_identifiers=[], title="Title " + wid, alternative_titles=[],
        reference_number=None, description=None, physical_description=None,
        lettering=None, edition=None, duration=None, current_frequency=None,
        former_frequency=[], designation=[], format=None,
        created_date_label=None, thumbnail=None, languages=[], notes=[],
        items=[], holdings=[], image_data=[], subjects=[], genres=[],
        contributors=[], production=[], collection_path=None,
        series_ancestors=[], redirect_target=None,
    )
    base.update(kw)
    return base


def build(spark, rows, concept_labels=None):
    works = spark.createDataFrame(rows, WORK_SCHEMA)
    cl = None
    if concept_labels is not None:
        cl = spark.createDataFrame(
            concept_labels, "concept_id string, display_label string"
        )
    docs = indexable_works(extract_works(works, concept_labels=cl))
    return {r["work_id"]: r for r in docs.collect()}


# ---------------------------------------------------------------- dispatch
def test_type_dispatch_sections(spark):
    r = build(
        spark,
        [
            work("v1"),
            work("r1", type="Redirected", redirect_target="v1"),
            work("d1", type="Deleted"),
            work("i1", type="Invisible"),
        ],
    )
    assert r["v1"]["display"] is not None and r["v1"]["query"] is not None
    assert r["v1"]["aggregatable"] is not None and r["v1"]["filterable"] is not None
    assert r["r1"]["display"] is None and r["r1"]["redirect_target"] == "v1"
    assert r["d1"]["display"] is None and r["d1"]["redirect_target"] is None
    assert r["i1"]["query"] is None
    # works_transformer dispatch: Standard renders as display type 'Work'
    assert r["v1"]["display"]["type"] == "Work"


# ----------------------------------------------- collection path expansion
def test_collection_path_expansion(spark):
    # test_query_transformer.py::test_collection_path_expansion
    r = build(
        spark,
        [
            work("anc", collection_path={"path": "123/456", "label": None},
                 title="Ancestor"),
            work("w", collection_path={"path": "456/789", "label": "789"}),
        ],
    )
    assert r["w"]["query"]["collection_path_path"] == "123/456/789"
    assert r["w"]["query"]["collection_path_label"] == "789"


def test_collection_path_no_expansion(spark):
    # ancestor path's last segment doesn't match the work's first fragment
    r = build(
        spark,
        [
            work("anc", collection_path={"path": "456/789", "label": None}),
            work("w", collection_path={"path": "123/456/789x", "label": None}),
        ],
    )
    assert r["w"]["query"]["collection_path_path"] == "123/456/789x"


# ------------------------------------------------------- series ancestors
def _series(title, wt="Series", n=0):
    return {"title": title, "work_type": wt, "num_children": n}


def test_series_ancestor_deduplication(spark):
    # series title matching an ancestor label (dot-stripped) is dropped
    r = build(
        spark,
        [
            work("anc", collection_path={"path": "A", "label": None},
                 title="Some ancestor title."),
            work("w", collection_path={"path": "A/B", "label": None},
                 series_ancestors=[_series("Some ancestor title")]),
        ],
    )
    assert r["w"]["query"]["part_of_title"] == ["Some ancestor title."]
    po = r["w"]["display"]["part_of"]
    assert [p["title"] for p in po] == ["Some ancestor title."]
    assert po[0]["id"] == "anc"


def test_series_ancestor_no_deduplication(spark):
    r = build(
        spark,
        [
            work("anc", collection_path={"path": "A", "label": None},
                 title="Some ancestor title."),
            work("w", collection_path={"path": "A/B", "label": None},
                 series_ancestors=[_series("Some series title", n=3)]),
        ],
    )
    assert r["w"]["query"]["part_of_title"] == [
        "Some series title", "Some ancestor title."
    ]
    po = r["w"]["display"]["part_of"]
    assert po[0]["id"] is None and po[0]["title"] == "Some series title"
    assert po[0]["total_parts"] == 3 and po[0]["type"] == "Series"
    assert po[1]["id"] == "anc"


# -------------------------------------------------- concept standard labels
def test_concept_standard_labels(spark):
    # test_display_transformer.py::test_concept_standard_labels — graph label
    # 'Malaria' replaces the work's own 'malaria' on subject and nested concept
    subj = {
        "concept_id": "w5ewpsaw", "label": "malaria",
        "identifiers": [{"scheme": "nlm-mesh", "value": "D008288Q000517"}],
        "concept_type": "Subject",
        "concepts": [concept("buy5ngy9", "malaria")],
    }
    r = build(
        spark,
        [work("w", subjects=[subj])],
        concept_labels=[("w5ewpsaw", "Malaria"), ("buy5ngy9", "Malaria")],
    )
    s = r["w"]["display"]["subjects"]
    assert len(s) == 1
    assert s[0]["id"] == "w5ewpsaw" and s[0]["label"] == "Malaria"
    assert s[0]["identifiers"][0]["value"] == "D008288Q000517"
    assert (
        s[0]["identifiers"][0]["identifier_type_label"]
        == "Medical Subject Headings (MeSH) identifier"
    )
    assert s[0]["concepts"][0]["label"] == "Malaria"
    # empty nested identifier list renders as NULL (DisplayConcept)
    assert s[0]["concepts"][0]["identifiers"] is None
    assert r["w"]["query"]["subjects_concepts_label"] == ["Malaria"]
    assert r["w"]["filterable"]["subjects_label"] == ["Malaria"]
    assert [tuple(x) for x in r["w"]["aggregatable"]["subjects"]] == [
        ("w5ewpsaw", "Malaria")
    ]


def test_subject_display_dedup_single_concept_only(spark):
    single = {
        "concept_id": "s1", "label": "Malaria", "identifiers": [],
        "concept_type": "Subject", "concepts": [concept("c1", "Malaria")],
    }
    single2 = dict(single, concept_id="s2")
    composite = {
        "concept_id": "s3", "label": "Malaria", "identifiers": [],
        "concept_type": "Subject",
        "concepts": [concept("c1", "Malaria"), concept("c2", "Fever")],
    }
    composite2 = dict(composite, concept_id="s4")
    r = build(spark, [work("w", subjects=[single, single2, composite, composite2])])
    labels = [(s["id"], s["label"]) for s in r["w"]["display"]["subjects"]]
    # the duplicate single-concept subject is dropped; composites never dedup
    assert labels == [("s1", "Malaria"), ("s3", "Malaria"), ("s4", "Malaria")]


def test_contributor_dedup_by_standard_label(spark):
    c1 = {"agent": concept("a1", "Darwin, C.", ctype="Person"),
          "roles": ["author"], "primary": True}
    c2 = {"agent": concept("a2", "Charles Darwin", ctype="Person"),
          "roles": ["editor"], "primary": False}
    r = build(
        spark, [work("w", contributors=[c1, c2])],
        concept_labels=[("a1", "Darwin, Charles"), ("a2", "Darwin, Charles")],
    )
    disp = r["w"]["display"]["contributors"]
    assert len(disp) == 1
    assert disp[0]["agent"]["label"] == "Darwin, Charles"
    assert disp[0]["roles"] == ["author"] and disp[0]["primary"] is True
    assert r["w"]["query"]["contributors_agent_label"] == ["Darwin, Charles"]
    assert [tuple(x) for x in r["w"]["aggregatable"]["contributors"]] == [
        ("a1", "Darwin, Charles")
    ]


# ------------------------------------------------------------ identifiers
def test_query_identifiers_include_canonical_id(spark):
    r = build(
        spark,
        [work("canonical_id_1", source_value="b_number",
              other_identifiers=[{"scheme": "sierra-identifier", "value": "1234"}])],
    )
    ids = r["canonical_id_1"]["query"]["identifiers_value"]
    assert "canonical_id_1" in ids and "b_number" in ids and "1234" in ids
    disp = r["canonical_id_1"]["display"]["identifiers"]
    assert disp[0]["value"] == "b_number"
    assert disp[0]["identifier_type_label"] == "Sierra system number"


# ------------------------------------------------------------ aggregatable
def test_marc_language_canonical_labels(spark):
    # test_aggregatable_values.py::test_marc_languages
    r = build(
        spark,
        [work("w", languages=[
            {"id": "egy", "label": "Ancient Egyptian"},
            {"id": "dut", "label": "Some label"},
            {"id": "some_code", "label": "Some label"},
        ])],
    )
    agg = [tuple(x) for x in r["w"]["aggregatable"]["languages"]]
    assert agg[0] == ("egy", "Egyptian")
    assert agg[1] == ("dut", "Dutch")
    assert agg[2] == ("some_code", "Some label")
    # display keeps the work's own label
    assert r["w"]["display"]["languages"][0]["label"] == "Ancient Egyptian"


def test_aggregate_subject_dedup(spark):
    subj = {"concept_id": "s1", "label": "Malaria", "identifiers": [],
            "concept_type": "Subject", "concepts": [concept("c1", "Malaria")]}
    r = build(spark, [work("w", subjects=[subj, dict(subj, concept_id="s2")])])
    assert len(r["w"]["aggregatable"]["subjects"]) == 1


def test_aggregate_subject_id_falls_back_to_label(spark):
    subj = {"concept_id": None, "label": "Unidentified thing", "identifiers": [],
            "concept_type": "Subject", "concepts": []}
    r = build(spark, [work("w", subjects=[subj])])
    assert [tuple(x) for x in r["w"]["aggregatable"]["subjects"]] == [
        ("Unidentified thing", "Unidentified thing")
    ]


def test_license_dedup(spark):
    # test_aggregatable_values.py::test_license_deduplication
    dl = loc(kind="digital", lt="iiif-presentation", url="https://example.com/1",
             license_id="cc-by-nc")
    items = [
        {"id": None, "identifiers": [], "title": None, "note": None, "locations": [dl]},
        {"id": None, "identifiers": [], "title": None, "note": None, "locations": [dl]},
    ]
    r = build(spark, [work("w", items=items)])
    lic = r["w"]["aggregatable"]["item_licenses"]
    assert len(lic) == 1 and lic[0]["id"] == "cc-by-nc"
    assert lic[0]["label"].startswith("Attribution-NonCommercial 4.0")


def test_production_dates_aggregate_and_filter(spark):
    prod = [{
        "label": "London 1854", "places": ["London"], "agents": [],
        "dates": [
            {"label": "1854", "range_from": "1854-01-01T00:00:00Z"},
            {"label": "09", "range_from": "0900-01-01T00:00:00Z"},
            {"label": "inf", "range_from": NEGATIVE_INFINITY_DATE},
            {"label": "unparseable", "range_from": "not a date"},
            {"label": "no range", "range_from": None},
        ],
        "function": None,
    }]
    r = build(spark, [work("w", production=prod)])
    agg = [d["id"] for d in r["w"]["aggregatable"]["production_dates"]]
    # leading zeros stripped, sentinel year kept as -9999, unparseable
    # still yields its leading-int year (aggregate uses the raw string)
    assert agg[0] == "1854" and agg[1] == "900" and agg[2] == "-9999"
    filt = r["w"]["filterable"]["production_dates_range_from"]
    assert filt[0] == -3660595200000
    assert NEGATIVE_INFINITY_MILLIS in filt
    # unparseable and missing ranges are skipped (reference logs + skips)
    assert len(filt) == 3


# ------------------------------------------------------------ availability
def _item(locations):
    return {"id": None, "identifiers": [], "title": None, "note": None,
            "locations": locations}


def test_availability_open_shelves_and_closed_stores(spark):
    r = build(
        spark,
        [work("w", items=[_item([loc(lt="open-shelves"), loc(lt="closed-stores")])])],
    )
    assert r["w"]["filterable"]["availabilities_id"] == ["closed-stores", "open-shelves"]
    labels = [a["label"] for a in r["w"]["display"]["availabilities"]]
    assert labels == ["Closed stores", "Open shelves"]


def test_availability_closed_stores_suppressed_by_other_institution(spark):
    # Availability.scala:57-60 + 84-100
    note = {"note_type_id": "terms-of-use", "note_type_label": "Terms of use",
            "contents": "This item is available at Churchill Archives Centre"}
    r = build(
        spark,
        [work("w", items=[_item([loc(lt="closed-stores")])], notes=[note]),
         work("w2", items=[_item([loc(lt="closed-stores")])],
              notes=[dict(note, contents="Unrelated note")]),
         work("w3", items=[_item([loc(lt="closed-stores")])],
              notes=[dict(note, note_type_id="general-note")])],
    )
    assert r["w"]["filterable"]["availabilities_id"] == []
    assert r["w2"]["filterable"]["availabilities_id"] == ["closed-stores"]
    # only terms-of-use notes trigger the suppression
    assert r["w3"]["filterable"]["availabilities_id"] == ["closed-stores"]


@pytest.mark.parametrize(
    "status,rel,expect",
    [
        ("Open", None, ["online"]),
        ("OpenWithAdvisory", None, ["online"]),
        ("LicensedResources", "resource", ["online"]),
        ("LicensedResources", "related", []),
        ("Restricted", None, []),
        (None, None, []),
    ],
)
def test_availability_online(spark, status, rel, expect):
    dl = loc(kind="digital", lt="iiif-presentation", url="https://x",
             access_status=status, access_relationship=rel)
    r = build(spark, [work("w", items=[_item([dl])])])
    assert r["w"]["filterable"]["availabilities_id"] == expect


def test_availability_from_holdings_location(spark):
    r = build(
        spark,
        [work("w", holdings=[{"note": None, "enumeration": [],
                              "location": loc(lt="open-shelves")}])],
    )
    assert r["w"]["filterable"]["availabilities_id"] == ["open-shelves"]


# -------------------------------------------------------------- display
def test_notes_grouped_by_type_first_seen_order(spark):
    notes = [
        {"note_type_id": "general-note", "note_type_label": "Notes", "contents": "a"},
        {"note_type_id": "copyright-note", "note_type_label": "Copyright", "contents": "b"},
        {"note_type_id": "general-note", "note_type_label": "Notes", "contents": "c"},
    ]
    r = build(spark, [work("w", notes=notes)])
    grouped = r["w"]["display"]["notes"]
    assert [(g["note_type_id"], list(g["contents"])) for g in grouped] == [
        ("general-note", ["a", "c"]),
        ("copyright-note", ["b"]),
    ]
    # query keeps the raw per-note contents
    assert r["w"]["query"]["notes_contents"] == ["a", "b", "c"]


def test_parts_natural_sort_order(spark):
    r = build(
        spark,
        [
            work("p", collection_path={"path": "A", "label": None}),
            work("c10", collection_path={"path": "A/10", "label": None}),
            work("c9", collection_path={"path": "A/9", "label": None}),
            work("c2", collection_path={"path": "A/2x", "label": None}),
        ],
    )
    assert [p["id"] for p in r["p"]["display"]["parts"]] == ["c2", "c9", "c10"]
    assert [p["total_parts"] for p in r["p"]["display"]["parts"]] == [0, 0, 0]


def test_genre_sections(spark):
    g = {"label": "Ephemera - pamphlets",
         "concepts": [
             concept("g1", "ephemera", [{"scheme": "lc-gmgpc", "value": "tgm1"}], "Genre"),
             concept(None, "london", [], "Place"),
         ]}
    r = build(spark, [work("w", genres=[g])], concept_labels=[("g1", "Ephemera")])
    assert r["w"]["query"]["genres_concepts_label"] == ["Ephemera", "london"]
    f = r["w"]["filterable"]
    # only the FIRST concept counts for genre filters
    assert f["genres_label"] == ["Ephemera"]
    assert f["genres_concepts_id"] == ["g1"]
    assert f["genres_concepts_source_identifier"] == ["tgm1"]
    assert [tuple(x) for x in r["w"]["aggregatable"]["genres"]] == [("g1", "Ephemera")]


def test_item_fields_and_locations(spark):
    items = [_item([
        loc(lt="closed-stores", shelfmark="MS.123", label="Closed stores"),
        loc(kind="digital", lt="iiif-presentation", url="https://iiif/x",
            license_id="cc-by", access_status="Open", created_date="2020-01-02"),
    ])]
    items[0]["id"] = "item1"
    items[0]["identifiers"] = [{"scheme": "sierra-system-number", "value": "i999"}]
    r = build(spark, [work("w", items=items)])
    q, f = r["w"]["query"], r["w"]["filterable"]
    assert q["items_id"] == ["item1"] and f["items_id"] == ["item1"]
    assert q["items_identifiers_value"] == ["i999"]
    assert q["items_shelfmarks_value"] == ["MS.123"]
    assert f["items_locations_license_id"] == ["cc-by"]
    assert f["items_locations_access_conditions_status_id"] == ["open"]
    assert f["items_locations_location_type_id"] == [
        "closed-stores", "iiif-presentation"
    ]
    assert f["items_locations_created_date"] == ["2020-01-02"]
    dloc = r["w"]["display"]["items"][0]["locations"][1]
    assert dloc["license_label"].startswith("Attribution 4.0")
    assert dloc["license_url"] == "http://creativecommons.org/licenses/by/4.0/"
    assert dloc["access_status_id"] == "open"


def test_part_of_ids_root_first(spark):
    r = build(
        spark,
        [
            work("root", collection_path={"path": "R", "label": None}),
            work("mid", collection_path={"path": "R/M", "label": None}),
            work("leaf", collection_path={"path": "R/M/L", "label": None}),
        ],
    )
    # filterable part_of_id is root-first; display part_of is closest-first
    assert r["leaf"]["filterable"]["part_of_id"] == ["root", "mid"]
    assert [p["id"] for p in r["leaf"]["display"]["part_of"]] == ["mid", "root"]
    assert r["leaf"]["query"]["part_of_title"] == ["Title root", "Title mid"]


# ------------------------------------------- incremental re-ingest expansion
def test_incremental_reingest_set(spark):
    from catalogue_pipeline_spark.plans.graph_works import incremental_reingest_set

    rows = [
        work("r", collection_path={"path": "R", "label": None}),
        work("a", collection_path={"path": "R/A", "label": None}),
        work("b", collection_path={"path": "A/B", "label": None}),
        work("c", collection_path={"path": "B/C", "label": None}),
        work("x", collection_path={"path": "R/X", "label": None}),
        work("lone", collection_path=None),
    ]
    works = spark.createDataFrame(rows, WORK_SCHEMA)
    changed = spark.createDataFrame([("a",)], "work_id string")
    got = {
        r["work_id"]: r["reason"]
        for r in incremental_reingest_set(changed, works).collect()
    }
    # a changed → its descendants b, c re-ingest (their partOf embeds a),
    # its parent r re-ingests (its parts embeds a); x and lone untouched
    assert got == {"a": "changed", "b": "descendant", "c": "descendant",
                   "r": "parent"}


# ------------------------------------------------- indexable image documents
def test_indexable_image_documents(spark):
    from catalogue_pipeline_spark.plans.images import (
        indexable_image_documents,
        infer_features,
    )

    subj = {"concept_id": "s1", "label": "malaria", "identifiers": [],
            "concept_type": "Subject", "concepts": [concept("s1", "malaria")]}
    wrows = [
        work("wk1", subjects=[subj],
             items=[{"id": None, "identifiers": [], "title": None, "note": None,
                     "locations": [loc(kind="digital", lt="iiif-presentation",
                                       url="https://w", license_id="cc-by")]}]),
        work("wk2", type="Deleted"),
    ]
    wdocs = indexable_works(
        extract_works(spark.createDataFrame(wrows, WORK_SCHEMA),
                      concept_labels=spark.createDataFrame(
                          [("s1", "Malaria")],
                          "concept_id string, display_label string")))
    img_loc = [loc(kind="digital", lt="iiif-image", url="https://img/1",
                   license_id="cc-by-nc"),
               loc(kind="digital", lt="iiif-presentation", url="https://p/1")]
    imgs = spark.createDataFrame(
        [("im1", "wk1", img_loc, 1.5, "#123456", [0.1, 0.2]),
         ("im2", "wk2", img_loc, None, None, None),
         ("im3", "nope", img_loc, None, None, None)],
        "image_id string, work_id string, locations array<struct<kind:string,"
        "location_type_id:string,location_type_label:string,label:string,"
        "shelfmark:string,url:string,link_text:string,credit:string,"
        "created_date:string,license_id:string,access_status:string,"
        "access_relationship:string>>, aspect_ratio double, "
        "average_color_hex string, palette_embedding array<float>",
    )
    imgs = infer_features(imgs, dim=4)
    docs = indexable_image_documents(imgs, wdocs)
    rows = {r["image_id"]: r for r in docs.collect()}
    # orphan (im3) and deleted-parent (im2) images are dropped
    assert set(rows) == {"im1"}
    d = rows["im1"]["display"]
    assert d["aspect_ratio"] == 1.5 and d["average_color"] == "#123456"
    # thumbnail = the iiif-image location
    assert d["thumbnail"]["url"] == "https://img/1"
    assert d["source"]["id"] == "wk1"
    assert d["source"]["subjects"][0]["label"] == "Malaria"
    # filterable licenses from the IMAGE's locations; aggregatable from the
    # WORK's item locations — the reference's asymmetry
    assert rows["im1"]["filterable"]["locations_license_id"] == ["cc-by-nc"]
    assert [tuple(x)[0] for x in rows["im1"]["aggregatable"]["licenses"]] == ["cc-by"]
    assert len(rows["im1"]["vector_values"]["features"]) == 4
    assert rows["im1"]["query"]["source"]["id"] == "wk1"


def test_indexable_image_defaults(spark):
    from catalogue_pipeline_spark.plans.images import indexable_image_documents

    wdocs = indexable_works(
        extract_works(spark.createDataFrame([work("wk1")], WORK_SCHEMA)))
    imgs = spark.createDataFrame(
        [("im1", "wk1", [loc(kind="digital", lt="iiif-image", url="https://i")],
          None, None, None, None)],
        "image_id string, work_id string, locations array<struct<kind:string,"
        "location_type_id:string,location_type_label:string,label:string,"
        "shelfmark:string,url:string,link_text:string,credit:string,"
        "created_date:string,license_id:string,access_status:string,"
        "access_relationship:string>>, aspect_ratio double, "
        "average_color_hex string, features array<float>, "
        "palette_embedding array<float>",
    )
    d = indexable_image_documents(imgs, wdocs).collect()[0]["display"]
    # display/image.py:66-67 defaults
    assert d["aspect_ratio"] == 1.0 and d["average_color"] == "#ffffff"


def test_image_nodes_and_edges(spark):
    from catalogue_pipeline_spark.plans.graph_works import image_nodes_and_edges

    imgs = spark.createDataFrame(
        [("im1", "wk1", [loc(kind="digital", lt="iiif-image", url="https://i/1",
                             access_status="Open"),
                         loc(kind="digital", lt="iiif-presentation", url="https://p")]),
         ("im2", "wk1", [loc(kind="digital", lt="iiif-presentation", url="https://p")]),
         ("im3", "wk2", [loc(kind="digital", lt="iiif-image", url="https://i/3",
                             access_status="Restricted")])],
        "image_id string, work_id string, locations array<struct<kind:string,"
        "location_type_id:string,location_type_label:string,label:string,"
        "shelfmark:string,url:string,link_text:string,credit:string,"
        "created_date:string,license_id:string,access_status:string,"
        "access_relationship:string>>",
    )
    nodes, edges = image_nodes_and_edges(imgs)
    n = {r["id"]: r.asDict() for r in nodes.collect()}
    assert n["im1"]["location_url"] == "https://i/1" and n["im1"]["error"] is None
    assert n["im2"]["error"] == "no-iiif-image-location"
    assert n["im3"]["error"] == "unexpected-access-conditions"
    e = {(r["from_id"], r["to_id"]) for r in edges.collect()}
    assert ("wk1", "im1") in e and len(e) == 3


def test_plan_construction_cached_across_invocations(spark):
    # the ~27k-call Column tree is built once per SparkContext and
    # re-bound per window: a second indexable_works call must NOT rebuild
    import catalogue_pipeline_spark.plans.works_ingestor as wi

    wi._PLAN_CACHE.clear()
    r1 = build(spark, [work("w1")])
    builds_after_first = wi._PLAN_BUILDS
    r2 = build(spark, [work("w2", title="Title w2")])
    assert wi._PLAN_BUILDS == builds_after_first  # cache hit, no rebuild
    # the cached tree re-binds to the new input frame
    assert "w1" in r1 and r2["w2"]["display"]["title"] == "Title w2"
