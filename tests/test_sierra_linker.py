"""Linker fold scenarios, mirroring the reference's LinkOps/LinkStore tests
(sierra_adapter/sierra_linker; the worked example in LinkOps.scala:27-44)."""

from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.sierra_linker import (
    unlink_instructions,
    update_links,
)

_SCHEMA_STATE = (
    "record_id string, bib_ids array<string>, "
    "unlinked_bib_ids array<string>, ts long"
)
_SCHEMA_UPD = "record_id string, bib_ids array<string>, ts long, seq long"


def st(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA_STATE)


def upd(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA_UPD)


def as_map(state):
    return {
        r["record_id"]: (
            sorted(r["bib_ids"]),
            sorted(r["unlinked_bib_ids"]),
            r["ts"],
        )
        for r in state.collect()
    }


def test_new_record_creates_link_with_no_unlinks(spark):
    out = as_map(
        update_links(st(spark, []), upd(spark, [("i1", ["b1", "b2"], 10, 0)]))
    )
    assert out == {"i1": (["b1", "b2"], [], 10)}


def test_linkops_worked_example(spark):
    # old = (linked {1,2,3}, unlinked {4,5}); new = {3,4} -> unlinked {1,2,5}
    state = st(spark, [("i1", ["b1", "b2", "b3"], ["b4", "b5"], 10)])
    out = as_map(update_links(state, upd(spark, [("i1", ["b3", "b4"], 20, 0)])))
    assert out == {"i1": (["b3", "b4"], ["b1", "b2", "b5"], 20)}


def test_strictly_older_update_is_discarded(spark):
    state = st(spark, [("i1", ["b1"], ["b9"], 50)])
    out = as_map(update_links(state, upd(spark, [("i1", ["b2"], 49, 0)])))
    assert out == {"i1": (["b1"], ["b9"], 50)}


def test_equal_date_update_is_applied(spark):
    state = st(spark, [("i1", ["b1"], [], 50)])
    out = as_map(update_links(state, upd(spark, [("i1", ["b2"], 50, 0)])))
    assert out == {"i1": (["b2"], ["b1"], 50)}


def test_batch_folds_in_ts_order(spark):
    # two updates in one batch: the earlier one's bibs end up unlinked
    out = as_map(
        update_links(
            st(spark, []),
            upd(spark, [("i1", ["b1"], 10, 0), ("i1", ["b2"], 20, 1)]),
        )
    )
    assert out == {"i1": (["b2"], ["b1"], 20)}


def test_ties_break_by_seq(spark):
    out = as_map(
        update_links(
            st(spark, []),
            upd(spark, [("i1", ["b1"], 10, 1), ("i1", ["b2"], 10, 0)]),
        )
    )
    assert out == {"i1": (["b1"], ["b2"], 10)}


def test_stale_updates_do_not_pollute_unlinked(spark):
    # the service would discard the stale message entirely, so its bib ids
    # must not appear in unlinkedBibIds either
    state = st(spark, [("i1", ["b1"], [], 50)])
    out = as_map(
        update_links(
            state, upd(spark, [("i1", ["b7"], 10, 0), ("i1", ["b2"], 60, 1)])
        )
    )
    assert out == {"i1": (["b2"], ["b1"], 60)}


def test_untouched_records_pass_through(spark):
    state = st(spark, [("i1", ["b1"], [], 50), ("i2", ["b2"], ["b3"], 40)])
    out = as_map(update_links(state, upd(spark, [("i1", ["b4"], 60, 0)])))
    assert out["i2"] == (["b2"], ["b3"], 40)


def test_relink_clears_unlinked(spark):
    # moving back to a previously-unlinked bib takes it off the unlink list
    state = st(spark, [("i1", ["b2"], ["b1"], 50)])
    out = as_map(update_links(state, upd(spark, [("i1", ["b1"], 60, 0)])))
    assert out == {"i1": (["b1"], ["b2"], 60)}


def test_unlink_instructions_explode(spark):
    state = st(spark, [("i1", ["b3"], ["b1", "b2"], 50), ("i2", ["b1"], [], 10)])
    rows = {
        (r["bib_id"], r["record_id"]) for r in unlink_instructions(state).collect()
    }
    assert rows == {("b1", "i1"), ("b2", "i1")}


def test_property_batched_fold_equals_sequential_service(spark):
    """Property: for per-key ts-nondecreasing arrival (the binlog ordering
    guarantee), folding updates through update_links in ANY batch split
    equals the reference service applying messages one at a time
    (LinkOps.updateLink in arrival order).  Randomized via hypothesis-style
    seeded generation, executed as one Spark run per split to keep the
    suite fast."""
    import random

    rng = random.Random(20260816)
    n_records, n_updates = 12, 80
    seqs = {}
    updates = []
    for s in range(n_updates):
        rid = f"i{rng.randrange(n_records)}"
        prev = seqs.get(rid, 0)
        ts = prev + rng.randrange(0, 3)  # nondecreasing per key, ties allowed
        seqs[rid] = ts
        bibs = sorted({f"b{rng.randrange(6)}" for _ in range(rng.randrange(1, 4))})
        updates.append((rid, bibs, ts, s))

    # sequential service oracle: apply in arrival order
    def service(upds):
        state = {}
        for rid, bibs, ts, _ in upds:
            if rid not in state:
                state[rid] = (list(bibs), [], ts)
                continue
            obib, ounl, ots = state[rid]
            if ts >= ots:
                unl = sorted((set(obib) | set(ounl)) - set(bibs))
                state[rid] = (list(bibs), unl, ts)
        return {r: (sorted(b), sorted(u), t) for r, (b, u, t) in state.items()}

    want = service(updates)

    for cuts in ([80], [37, 80], [20, 41, 62, 80]):
        state = st(spark, [])
        lo = 0
        for hi in cuts:
            batch = upd(spark, updates[lo:hi])
            state = update_links(state, batch).localCheckpoint()
            lo = hi
        assert as_map(state) == want, f"split {cuts} diverged"
