"""Randomized CDC parity soak (round-6 verdict ask #7): a few hundred
seeded random op/ts/offset sequences driven through the real
``merge_into_state`` path and compared against ``NaiveApplier``
sequential replay — tail coverage of the tie-break interactions
(>=-replace × delete-priority × offset order × chunked application)
beyond the enumerated golden scenarios (reference model:
WorkStubGenerators.scala's randomized generators).

Packing: each hypothesis example packs ~40 independent random cases into
ONE binlog under namespaced conv_ids (``c{case}:{conv}``), applied in
1-4 offset-prefix chunks through a real LakeTable, then split back per
case for comparison — hundreds of cases for a handful of Spark merges.
Global offsets are assigned by a random interleaving of all cases'
events, so within-case offset order is itself a random permutation of
generation order (the oracle replays by offset; the engine must agree
whatever the arrival order inside a chunk)."""

import datetime as dt
import random

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
N_CASES = 40
OPS = ["insert", "update", "upsert", "delete", "delete", "upsert"]
CONVS = ["a", "b", "hot", "hot"]  # skewed: 'hot' collides twice as often
TEXTS = ["x", "y", "z", None]
ROLES = ["user", "assistant"]
TOOLS = ["t1", None]


def _gen_case(rng: random.Random, case_id: int) -> list[tuple]:
    """One case: 2..28 events over a 3-conv × 4-turn × 7-ts universe —
    tight enough that equal-ts and same-key collisions are the norm."""
    events = []
    for _ in range(rng.randint(2, 28)):
        op = rng.choice(OPS)
        is_del = op == "delete"
        events.append(
            (
                op,
                f"c{case_id}:{rng.choice(CONVS)}",
                rng.randint(0, 3),
                None if is_del else rng.choice(ROLES),
                None if is_del else rng.choice(TEXTS),
                None if is_del else rng.choice(TOOLS),
                T0 + dt.timedelta(seconds=rng.randint(0, 6)),
            )
        )
    return events


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_random_soak_engine_equals_oracle(spark, tmp_path_factory, seed):
    rng = random.Random(seed)
    flat = [ev for c in range(N_CASES) for ev in _gen_case(rng, c)]
    rng.shuffle(flat)  # offsets = a random interleaving across cases
    rows = [
        (off, op, conv, turn, role, text, tool, ts, 3)
        for off, (op, conv, turn, role, text, tool, ts) in enumerate(flat)
    ]
    df = spark.createDataFrame(rows, BINLOG_SCHEMA)

    table = LakeTable.create(
        str(tmp_path_factory.mktemp("soak") / "t"),
        STATE_SCHEMA,
        bucket_key="conv_id",
        num_buckets=4,
    )
    reg = SchemaRegistry()
    n_chunks = rng.randint(1, 4)
    cuts = sorted(rng.sample(range(1, len(rows)), n_chunks - 1)) + [len(rows)]
    lo = 0
    for i, hi in enumerate(cuts):
        part = df.filter(f"offset >= {lo} and offset < {hi}")
        if not part.isEmpty():
            merge_into_state(spark, table, resolve_lww(reg.normalize(part)), f"cs{i}")
        lo = hi

    oracle = NaiveApplier()
    oracle.apply_all([r.asDict() for r in df.collect()])

    got = sorted(tuple(r) for r in table.read(spark).collect())
    want = sorted(oracle.state_rows())
    assert got == want, (
        f"seed={seed}: engine/oracle diverge on "
        f"{[g for g, w in zip(got, want) if g != w][:3]}"
    )
