"""Property-based parity: random (seeded, deterministic) binlogs applied by
the engine must equal the naive one-event-at-a-time oracle — the
generalization of the golden scenarios, in the spirit of the reference's
randomized work generators (WorkStubGenerators.scala)."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from catalogue_pipeline_spark.cdc import (
    BINLOG_SCHEMA,
    STATE_SCHEMA,
    NaiveApplier,
    SchemaRegistry,
    merge_into_state,
    resolve_lww,
)
from catalogue_pipeline_spark.lake import LakeTable

T0 = dt.datetime(2024, 1, 1)

# tight little universe → lots of key collisions, equal timestamps, deletes
events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["insert", "update", "upsert", "delete"]),
        st.sampled_from(["a", "b", "hot"]),          # conv_id
        st.integers(min_value=0, max_value=2),        # turn_idx
        st.integers(min_value=0, max_value=5),        # ts seconds (collisions!)
        st.sampled_from(["x", "y", "z", None]),       # text
    ),
    min_size=1,
    max_size=25,
)


def to_rows(evs):
    rows = []
    for off, (op, conv, turn, tsec, text) in enumerate(evs):
        is_del = op == "delete"
        rows.append(
            (
                off,
                op,
                conv,
                turn,
                None if is_del else "user",
                None if is_del else text,
                None,
                T0 + dt.timedelta(seconds=tsec),
                3,
            )
        )
    return rows


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=events_strategy, split=st.integers(min_value=1, max_value=24))
def test_engine_equals_oracle_any_split(spark, tmp_path_factory, evs, split):
    rows = to_rows(evs)
    df = spark.createDataFrame(rows, BINLOG_SCHEMA)

    table = LakeTable.create(
        str(tmp_path_factory.mktemp("prop") / "t"),
        STATE_SCHEMA,
        bucket_key="conv_id",
        num_buckets=2,
    )
    # apply in two arbitrary chunks (by offset split point)
    reg = SchemaRegistry()
    cut = min(split, len(rows))
    for i, part in enumerate(
        [df.filter(f"offset < {cut}"), df.filter(f"offset >= {cut}")]
    ):
        if part.isEmpty():
            continue
        merge_into_state(spark, table, resolve_lww(reg.normalize(part)), f"cs{i}")

    oracle = NaiveApplier()
    oracle.apply_all([r.asDict() for r in df.collect()])

    got = sorted(tuple(r) for r in table.read(spark).collect())
    assert got == sorted(oracle.state_rows())
