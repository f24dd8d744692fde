"""Matcher merge-on-read write mode (round-7 window-soak finding): delta
appends must be state-equivalent to the COW path batch for batch, resolve
through ``read_matcher_state``, and fold cleanly via ``compact_matcher``
— the change-proportional-bytes answer to the COW bucket-rewrite term."""

import pytest
from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.matcher import (
    compact_matcher,
    create_matcher_table,
    read_matcher_state,
    update_graph,
)

UP_SCHEMA = "work_id string, version int, candidates array<string>, suppressed boolean"

# a 4-batch scenario exercising chain merge, unlink split, version
# rejection, and same-version relink — the WorkGraphUpdaterTest arcs
BATCHES = [
    [("A", 1, ["B"], False), ("B", 1, [], False), ("X", 1, [], False)],
    [("B", 2, ["C", "D"], False), ("C", 1, [], False), ("D", 1, [], False)],
    [("A", 1, [], False), ("X", 2, ["C"], False)],  # same-version unlink + new link
    [("D", 1, [], False)],  # version 1 < stored 1? equal: re-accepted no-op shape
]


def _state(spark, table):
    rows = read_matcher_state(spark, table).collect()
    return sorted(
        (r["work_id"], r["version"], r["component"], r["subgraph_id"],
         tuple(r["candidates"]), r["suppressed"])
        for r in rows
    )


def _run(spark, tmp_path, name, write_mode, compact_every=None):
    table = create_matcher_table(str(tmp_path / name), num_buckets=4)
    for seq, rows in enumerate(BATCHES, start=1):
        df = spark.createDataFrame(rows, UP_SCHEMA)
        update_graph(
            spark, table, df, batch_seq=seq, changeset_id=f"b{seq}",
            write_mode=write_mode,
        )
        if compact_every and seq % compact_every == 0:
            compact_matcher(spark, table, changeset_id=f"c{seq}")
    return table


def test_delta_mode_state_equals_cow(spark, tmp_path):
    cow = _run(spark, tmp_path, "cow", "cow")
    mor = _run(spark, tmp_path, "mor", "delta")
    assert _state(spark, cow) == _state(spark, mor)
    # and the raw MOR table really is append-only: multiple rows per key
    raw = mor.read(spark)
    assert raw.count() > read_matcher_state(spark, mor).count()


def test_compaction_preserves_state_and_clears_deltas(spark, tmp_path):
    mor = _run(spark, tmp_path, "mor", "delta")
    before = _state(spark, mor)
    snap = compact_matcher(spark, mor)
    assert snap is not None
    assert mor.delta_buckets() == []
    assert _state(spark, mor) == before
    # idempotent: nothing left to fold
    assert compact_matcher(spark, mor) is None
    # post-compaction reads take the plain (no-window) path and agree
    assert _state(spark, mor) == before


def test_interleaved_compaction_equals_cow(spark, tmp_path):
    cow = _run(spark, tmp_path, "cow", "cow")
    mor = _run(spark, tmp_path, "mor", "delta", compact_every=2)
    assert _state(spark, cow) == _state(spark, mor)


def test_delta_mode_version_gate_still_rejects(spark, tmp_path):
    table = create_matcher_table(str(tmp_path / "g"), num_buckets=4)
    df1 = spark.createDataFrame([("A", 2, ["B"], False), ("B", 1, [], False)], UP_SCHEMA)
    update_graph(spark, table, df1, batch_seq=1, changeset_id="b1", write_mode="delta")
    df2 = spark.createDataFrame([("A", 1, [], False)], UP_SCHEMA)
    snap, _ = update_graph(
        spark, table, df2, batch_seq=2, changeset_id="b2", write_mode="delta"
    )
    assert snap is None  # stale version: V3 no-op, nothing appended
    comps = {
        frozenset(
            r["work_id"]
            for r in read_matcher_state(spark, table).collect()
            if r["component"] == c and r["version"] >= 0
        )
        for c in {
            r["component"] for r in read_matcher_state(spark, table).collect()
        }
    }
    assert frozenset({"A", "B"}) in comps


@pytest.mark.parametrize("_", [0])
def test_random_delta_equals_cow_soak(spark, tmp_path, _):
    """Round-8 randomized equivalence soak (round-7 verdict item 4,
    extending the test_cdc_random_soak pattern to ``update_graph``):
    random interleavings of link/unlink/suppress/version-bump updates
    across batches, with delta-mode compaction at a random cadence, must
    leave delta-mode state identical to COW state — tail coverage of the
    gate × region-expansion × latest-batch-wins interactions beyond the
    enumerated scenarios above."""
    import random

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    universe = [f"W{i}" for i in range(8)]
    case_n = [0]

    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(seed=st.integers(min_value=0, max_value=2**31 - 1))
    def run(seed):
        rng = random.Random(seed)
        batches = []
        for _b in range(rng.randint(2, 5)):
            ids = rng.sample(universe, rng.randint(1, 4))
            batches.append(
                [
                    (
                        w,
                        rng.randint(1, 3),  # version bumps AND stale re-sends
                        rng.sample(universe, rng.randint(0, 2)),  # link/unlink
                        rng.random() < 0.2,  # suppression flips
                    )
                    for w in ids
                ]
            )
        cadence = rng.choice([None, 1, 2, 3])
        case_n[0] += 1
        tables = {}
        for mode in ("cow", "delta"):
            t = create_matcher_table(
                str(tmp_path / f"r{case_n[0]}-{mode}"), num_buckets=4
            )
            for seq, rows in enumerate(batches, start=1):
                df = spark.createDataFrame(rows, UP_SCHEMA)
                update_graph(
                    spark, t, df, batch_seq=seq, changeset_id=f"b{seq}",
                    write_mode=mode,
                )
                if mode == "delta" and cadence and seq % cadence == 0:
                    compact_matcher(spark, t, changeset_id=f"c{seq}")
            tables[mode] = t
        assert _state(spark, tables["cow"]) == _state(spark, tables["delta"])

    run()


def test_split_read_windows_only_delta_buckets(spark, tmp_path):
    """Round-8 split-read: with deltas confined to a strict bucket subset,
    read_matcher_state must (a) equal the full-table latest-batch-wins
    resolve row-for-row and (b) carry exactly ONE exchange — the window
    over the delta-carrying buckets; clean base buckets union through with
    no shuffle (change-proportional reads, round-7 verdict item 1)."""
    from pyspark.sql import Window

    from catalogue_pipeline_spark.lake.table import bucket_expr
    from catalogue_pipeline_spark.plans.matcher import _resolve_latest

    table = _run(spark, tmp_path, "split", "delta")
    compact_matcher(spark, table, changeset_id="c-all")  # all buckets clean
    # one more delta batch: a fresh isolated work → a one-bucket region
    up = spark.createDataFrame([("Z9", 1, [], False)], UP_SCHEMA)
    update_graph(spark, table, up, batch_seq=9, changeset_id="b9", write_mode="delta")
    dbuckets = set(table.delta_buckets())
    all_buckets = {f["bucket"] for f in table.snapshot().files}
    assert dbuckets and dbuckets < all_buckets  # strict subset

    resolved = read_matcher_state(spark, table)
    plan = resolved._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan

    # row-for-row equal to the full-table window it replaced
    full = _resolve_latest(table.read(spark))
    assert sorted(map(tuple, resolved.collect())) == sorted(map(tuple, full.collect()))

    # rows outside the delta buckets never enter the window
    windowed_rows = table.read(spark, buckets=sorted(dbuckets)).count()
    clean_rows = resolved.filter(
        ~bucket_expr("work_id", table.num_buckets).isin(sorted(dbuckets))
    ).count()
    assert windowed_rows + clean_rows >= resolved.count()
