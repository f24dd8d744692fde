"""Persistent id minting (X3): lake-backed uniqueness table, deterministic
collision resolution, idempotent re-mint (id_generator.py:41-54 semantics
bought with determinism instead of row locks)."""

import pytest
from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.id_minter import create_minter_table, mint_ids


@pytest.fixture()
def table(tmp_path):
    return create_minter_table(str(tmp_path / "ids"), num_buckets=4)


def keys_df(spark, ks):
    return spark.createDataFrame([(k,) for k in ks], "source_key string")


def test_mint_stable_and_idempotent(spark, table):
    ks = [f"k{i}" for i in range(200)]
    got1 = {r["source_key"]: r["canonical_id"] for r in
            mint_ids(spark, table, keys_df(spark, ks), "b1").collect()}
    assert len(set(got1.values())) == 200  # all unique
    assert all(len(v) == 8 for v in got1.values())
    # re-mint same keys: identical mapping, nothing new persisted
    snap_before = table.current_snapshot_id()
    got2 = {r["source_key"]: r["canonical_id"] for r in
            mint_ids(spark, table, keys_df(spark, ks), "b2").collect()}
    assert got2 == got1
    assert table.current_snapshot_id() == snap_before
    # overlapping batch: old keys keep ids, new keys get fresh unique ones
    got3 = {r["source_key"]: r["canonical_id"] for r in
            mint_ids(spark, table, keys_df(spark, ks[:50] + ["new1", "new2"]), "b3").collect()}
    assert all(got3[k] == got1[k] for k in ks[:50])
    assert len({got3["new1"], got3["new2"]} & set(got1.values())) == 0


def test_mint_resolves_forced_collisions(spark, table):
    """length=2 over 300 keys forces birthday collisions; resolution must
    converge, keep ids unique, and stay deterministic across re-runs on a
    fresh table."""
    ks = [f"k{i}" for i in range(300)]
    got = {r["source_key"]: r["canonical_id"] for r in
           mint_ids(spark, table, keys_df(spark, ks), "b1", length=2, max_rounds=32).collect()}
    assert len(got) == 300 and len(set(got.values())) == 300


def test_mint_deterministic_across_tables(spark, tmp_path):
    ks = [f"k{i}" for i in range(300)]
    outs = []
    for tag in ("x", "y"):
        t = create_minter_table(str(tmp_path / tag), num_buckets=4)
        outs.append({r["source_key"]: r["canonical_id"] for r in
                     mint_ids(spark, t, keys_df(spark, ks), "b", length=2, max_rounds=32).collect()})
    assert outs[0] == outs[1]
