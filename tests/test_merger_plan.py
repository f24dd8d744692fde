"""Matcher+merger plan: component semantics mirrored from
WorkGraphUpdaterTest.scala:18-516 and the per-field rule family from
MergerIntegrationTest.scala scenarios (ItemsRule/ThumbnailRule/
OtherIdentifiersRule with WorkPredicates guards)."""

import datetime as dt

from catalogue_pipeline_spark.plans import match_and_merge

BATCH_TS = dt.datetime(2024, 6, 1, 12, 0, 0)
SCHEMA = (
    "work_id string, source_type string, merge_candidate_ids array<string>, "
    "suppressed boolean, items array<string>, identifiers array<string>, thumbnail string"
)
SCHEMA_FMT = SCHEMA + ", format string"


def run(spark, rows, schema=SCHEMA, precedence=None):
    df = spark.createDataFrame(rows, schema)
    out = match_and_merge(df, BATCH_TS, precedence=precedence)
    return {r["work_id"]: r for r in out.collect()}


def test_transitive_component_merges(spark):
    """'updating A->B with B->[C,D] gives A+B+C+D' (WorkGraphUpdaterTest).
    tei target: ItemsRule replaces the tei stubs with the sources' items."""
    rows = [
        ("A", "sierra", ["B"], False, ["iA"], ["idA"], None),
        ("B", "tei", ["C", "D"], False, ["iB"], ["idB"], "thumbB"),
        ("C", "sierra", [], False, ["iC"], ["idC"], None),
        ("D", "sierra", [], False, ["iD"], ["idD"], None),
        ("E", "sierra", [], False, ["iE"], ["idE"], None),
    ]
    got = run(spark, rows)
    comp = {w: got[w]["component"] for w in "ABCD"}
    assert len(set(comp.values())) == 1
    assert got["E"]["component"] != got["A"]["component"]
    # tei outranks sierra → B is the target
    assert got["B"]["type"] == "Visible"
    for w in "ACD":
        assert got[w]["type"] == "Redirected" and got[w]["redirect_target"] == "B"
    # tei target items come FROM the sources (ItemsRule.scala mergeIntoTeiTarget)
    assert got["B"]["items"] == ["iA", "iC", "iD"]
    assert sorted(got["B"]["identifiers"]) == ["idA", "idB", "idC", "idD"]
    assert got["B"]["thumbnail"] == "thumbB"  # no mets/miro source: keeps own
    # all works in one component share the digest; E differs
    assert got["A"]["subgraph_id"] == got["B"]["subgraph_id"]
    assert got["E"]["subgraph_id"] != got["A"]["subgraph_id"]
    # G5: derived rows stamped with the batch time
    assert got["B"]["batch_ts"] == BATCH_TS


def test_suppressed_work_breaks_edges(spark):
    """Suppression removes the node's edges; components re-form without it
    (WorkGraphUpdater.scala:117-134)."""
    rows = [
        ("A", "sierra", ["B"], False, ["iA"], ["idA"], None),
        ("B", "sierra", ["C"], True, ["iB"], ["idB"], None),  # suppressed bridge
        ("C", "sierra", [], False, ["iC"], ["idC"], None),
    ]
    got = run(spark, rows)
    assert got["A"]["component"] != got["C"]["component"]
    # suppressed work is never a target but still emitted (singleton)
    assert got["B"]["type"] == "Visible" and got["B"]["component"] == "B"


def test_singletons_pass_through(spark):
    """'A single work with nothing linked to it' / 'A Tei work passes
    through unchanged' (MergerIntegrationTest.scala:41,662)."""
    rows = [
        ("A", "sierra", [], False, ["iA"], ["idA"], "tA"),
        ("T", "tei", [], False, ["iT"], ["idT"], None),
    ]
    got = run(spark, rows)
    for w, item in (("A", "iA"), ("T", "iT")):
        assert got[w]["type"] == "Visible"
        assert got[w]["items"] == [item]
    assert got["A"]["thumbnail"] == "tA"


def test_no_rule_defined_sources_pass_through(spark):
    """Sources no field rule touches stay Visible in the component (the
    MergerManager pass-through, MergerManager.scala:15-26): an ebsco target
    has no items/thumbnail rule for sierra or calm sources."""
    rows = [
        ("A", "ebsco", ["B"], False, [], ["idA"], None),
        ("B", "sierra", [], False, ["iB"], ["idB"], "thumbB"),
        ("C", "calm", ["B"], False, ["iC"], ["idC"], "thumbC"),
    ]
    got = run(spark, rows)
    assert got["A"]["type"] == "Visible"
    assert got["A"]["thumbnail"] is None  # no rule: keeps its own (none)
    assert got["A"]["items"] == []
    for w in "BC":
        assert got[w]["type"] == "Visible"  # unmerged pass-through
        assert got[w]["items"] and got[w]["thumbnail"]


def test_sierra_single_item_absorbs_miro(spark):
    """'One Sierra and one Miro work are matched' (MergerIntegrationTest
    .scala:91): single-item picture Sierra target folds the Miro locations
    into its one item (count unchanged) and takes the Miro thumbnail."""
    rows = [
        ("S", "sierra", ["M"], False, ["iS"], ["idS"], None, "picture"),
        ("M", "miro", [], False, ["iM"], ["idM"], "thumbM", None),
    ]
    got = run(spark, rows, schema=SCHEMA_FMT)
    assert got["M"]["type"] == "Redirected" and got["M"]["redirect_target"] == "S"
    assert got["S"]["items"] == ["iS"]  # locations folded in, count unchanged
    assert got["S"]["thumbnail"] == "thumbM"
    assert sorted(got["S"]["identifiers"]) == ["idM", "idS"]


def test_sierra_multi_item_redirects_miro_via_image_rule(spark):
    """'does not merge a sierra work with multiple items with a linked Miro
    work' (PlatformMergerTest.scala:304-343): ItemsRule leaves the items
    alone ('we leave the works unmerged' is items-only), but ImageDataRule
    still matches the single-digital Miro source — it joins the redirect set
    and the merged target's imageData becomes the Miro images."""
    rows = [
        ("S", "sierra", ["M"], False, ["i1", "i2"], ["idS"], None, "picture"),
        ("M", "miro", [], False, ["iM"], ["idM"], "thumbM", None),
    ]
    got = run(spark, rows, schema=SCHEMA_FMT)
    assert got["M"]["type"] == "Redirected" and got["M"]["redirect_target"] == "S"
    assert got["S"]["items"] == ["i1", "i2"]  # items untouched
    assert got["S"]["thumbnail"] is None  # miro thumb rule needs ≤1 item
    assert sorted(got["S"]["identifiers"]) == ["idM", "idS"]


def test_sierra_and_mets_matched(spark):
    """'A Sierra picture and METS work are matched' (MergerIntegrationTest
    .scala:156): single-item Sierra + single-digital METS → METS redirected,
    locations folded into the Sierra item, METS thumbnail wins."""
    rows = [
        ("S", "sierra", ["X"], False, ["iS"], ["idS"], "thumbS", None),
        ("X", "mets", [], False, ["iX"], ["idX"], "thumbX", None),
    ]
    got = run(spark, rows, schema=SCHEMA_FMT)
    assert got["X"]["type"] == "Redirected"
    assert got["S"]["items"] == ["iS"]
    assert got["S"]["thumbnail"] == "thumbX"  # METS preferred over own
    # multi-item sierra appends the METS item instead
    rows2 = [
        ("S", "sierra", ["X"], False, ["i1", "i2"], ["idS"], None, None),
        ("X", "mets", [], False, ["iX"], ["idX"], None, None),
    ]
    got2 = run(spark, rows2, schema=SCHEMA_FMT)
    assert got2["S"]["items"] == ["i1", "i2", "iX"]
    assert got2["X"]["type"] == "Redirected"


def test_calm_target_drops_own_stub_item(spark):
    """'A Calm work and a Sierra work are matched' (MergerIntegrationTest
    .scala:325): the Calm item is a stub — keep all items EXCEPT it."""
    rows = [
        ("C", "calm", ["S"], False, ["stubC"], ["idC"], None),
        ("S", "sierra", [], False, ["iS1", "iS2"], ["idS"], None),
    ]
    got = run(spark, rows)  # calm outranks sierra in DEFAULT_PRECEDENCE
    assert got["C"]["type"] == "Visible"
    assert got["C"]["items"] == ["iS1", "iS2"]  # stub dropped
    assert got["S"]["type"] == "Redirected"


def test_mets_excludes_miro_item_in_same_component(spark):
    """ItemsRule orElse exclusivity (ItemsRule.scala:25-57): a zero-item
    picture Sierra target with BOTH a single-digital METS and a single Miro
    source takes the METS items only — mergeMetsIntoSierraTarget wins the
    chain, the re-digitised-Miro duplicate's item is excluded — while the
    Miro source still redirects (knownDuplicateSources)."""
    rows = [
        ("S", "sierra", ["X", "M"], False, [], ["idS"], None, "picture"),
        ("X", "mets", [], False, ["iX"], ["idX"], "thumbX", None),
        ("M", "miro", [], False, ["iM"], ["idM"], "thumbM", None),
    ]
    got = run(spark, rows, schema=SCHEMA_FMT)
    assert got["S"]["items"] == ["iX"]  # Miro item excluded
    assert got["S"]["thumbnail"] == "thumbX"  # METS thumb preferred
    # Miro is still a merged source: redirected, identifiers contributed
    assert got["M"]["type"] == "Redirected" and got["M"]["redirect_target"] == "S"
    assert got["X"]["type"] == "Redirected"
    assert sorted(got["S"]["identifiers"]) == ["idM", "idS", "idX"]
    # without the METS member the Miro item DOES land on the target
    rows2 = [
        ("S", "sierra", ["M"], False, [], ["idS"], None, "picture"),
        ("M", "miro", [], False, ["iM"], ["idM"], "thumbM", None),
    ]
    got2 = run(spark, rows2, schema=SCHEMA_FMT)
    assert got2["S"]["items"] == ["iM"]
    assert got2["M"]["type"] == "Redirected"


def test_restricted_member_suppresses_thumbnail(spark):
    """ThumbnailRule.scala shouldSuppressThumbnail: any restricted digital
    location anywhere in the merge set blanks the thumbnail."""
    schema = SCHEMA_FMT + ", restricted boolean"
    rows = [
        ("S", "sierra", ["X"], False, ["iS"], ["idS"], "thumbS", None, False),
        ("X", "mets", [], False, ["iX"], ["idX"], "thumbX", None, True),
    ]
    got = run(spark, rows, schema=schema)
    assert got["S"]["thumbnail"] is None
    assert got["X"]["type"] == "Redirected"
