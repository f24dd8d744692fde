"""Persistent canonical-id minting (X3 — the id_minter service).

The reference mints ids from a pre-generated random pool guarded by a
uniqueness table and transactional assignment
(catalogue_graph/src/id_minter/identifiers.py:1-39,
steps/id_generator.py:41-54, migrations/0001_create_identifiers_schema.sql).
Spark-first equivalent:

  * ids derive from the source key by hash fold (replays mint identical ids
    with no coordination — functions.canonical_id)
  * the uniqueness table is a lake table (source_key → canonical_id),
    bucketed by source_key; minting a batch touches only new keys
  * collisions are resolved DETERMINISTICALLY: colliding keys re-hash with
    an incremented salt, the lexicographically-smallest key keeping the
    unsalted id — so resolution needs no transaction and is byte-stable
    across partitionings, batch orderings and cluster sizes (the property
    the reference buys with row locks, bought here with determinism)
  * re-minting an already-assigned key is a no-op returning the stored id
    (idempotent re-run, V5 semantics)

The loop converges because each round only re-salts strictly-colliding
keys and the id space (23·31^(L-1)) dwarfs any batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..functions import canonical_id
from ..lake.table import LakeTable

MINTER_SCHEMA = StructType(
    [
        StructField("source_key", StringType(), False),
        StructField("canonical_id", StringType(), False),
    ]
)


def create_minter_table(path: str, num_buckets: int = 16) -> LakeTable:
    return LakeTable.create(
        path, MINTER_SCHEMA, bucket_key="source_key", num_buckets=num_buckets
    )


def _salted(key_col, salt_col, length: int):
    """Salt 0 is the plain fold (so the common case needs no salt column in
    the stored table); salt k re-folds key + salt."""
    return F.when(salt_col == 0, canonical_id(key_col, length=length)).otherwise(
        canonical_id(key_col, salt_col.cast("string"), length=length)
    )


def mint_ids(
    spark: SparkSession,
    table: LakeTable,
    keys: DataFrame,
    changeset_id: str,
    key_col: str = "source_key",
    length: int = 8,
    max_rounds: int = 8,
) -> DataFrame:
    """Assign canonical ids to ``keys`` (one column of source keys),
    persisting NEW assignments into the uniqueness table. Returns the full
    mapping for the requested keys (existing + newly minted).

    Collision rule per round: within each claimed id, the smallest source
    key wins; losers re-hash with salt+1. Ids already in the table always
    win over new mints (stability across batches).
    """
    want = keys.select(F.col(key_col).cast("string").alias("source_key")).distinct()
    existing = table.read(spark).join(want, "source_key", "left_semi")
    new_keys = want.join(table.read(spark), "source_key", "left_anti")

    assigned = new_keys.withColumn("_salt", F.lit(0))
    taken = table.read(spark).select("canonical_id")  # ids already owned
    out = None
    for _ in range(max_rounds):
        cand = assigned.withColumn(
            "canonical_id", _salted(F.col("source_key"), F.col("_salt"), length)
        )
        # losers: collide with an already-owned id (semi-join, scale-safe),
        # or lose the in-batch min-key race for the same candidate id
        stored_clash = cand.join(taken, "canonical_id", "left_semi").select(
            "source_key"
        )
        w_min = (
            cand.groupBy("canonical_id")
            .agg(F.min("source_key").alias("_winner"))
        )
        cand = cand.join(w_min, "canonical_id")
        losers = cand.filter(F.col("source_key") != F.col("_winner")).select(
            "source_key", "_salt"
        ).unionByName(
            cand.join(stored_clash, "source_key", "left_semi").select(
                "source_key", "_salt"
            )
        ).distinct()
        winners = cand.join(losers.select("source_key"), "source_key", "left_anti").select(
            "source_key", "canonical_id"
        )
        out = winners if out is None else out.unionByName(winners)
        out = out.localCheckpoint()
        if losers.isEmpty():
            assigned = None
            break
        taken = taken.unionByName(winners.select("canonical_id")).localCheckpoint()
        # truncate the loop-carried lineage: without this the plan doubles
        # per round (losers → cand → previous assigned → …) and the driver
        # stalls on analysis long before data size matters
        assigned = (
            losers.withColumn("_salt", F.col("_salt") + 1)
            .select("source_key", "_salt")
            .localCheckpoint()
        )
    if assigned is not None and not assigned.isEmpty():
        raise RuntimeError(f"id minting did not converge in {max_rounds} rounds")
    if out is not None and not out.isEmpty():
        table.append(
            out.select("source_key", "canonical_id"),
            changeset_id=changeset_id,
            sort_cols=["source_key"],
        )
    return existing.unionByName(out) if out is not None else existing


def mint_ids_with_predecessors(
    spark: SparkSession,
    table: LakeTable,
    requests: DataFrame,
    changeset_id: str,
    length: int = 8,
    max_rounds: int = 8,
) -> DataFrame:
    """MintingResolver.mint_ids with predecessor inheritance
    (catalogue_graph/src/id_minter/resolvers/minting_resolver.py:124-300):
    ``requests(source_key, predecessor_key nullable)`` → (source_key,
    canonical_id, method ∈ looked_up|inherited|minted).

    Rules, matched to the reference:

    * a source key that already has an id returns it — the idempotent
      lookup path; its predecessor (if any) is ignored;
    * conflicting predecessors for one source key within a batch raise
      ValueError (the reference's per-work fallback trigger);
    * a missing source key WITH a predecessor inherits the predecessor's
      canonical id — the predecessor MUST already be in the table (fail
      fast otherwise: migrations ingest predecessors first), so external
      URLs stay valid across source-system migrations (Sierra→FOLIO);
    * a missing source key with no predecessor gets a fresh deterministic
      mint (the pool-claim path → this engine's salted hash fold).

    Scale shape: two left-semi/anti joins against the bucketed minter
    table plus the existing mint loop; the two integrity gates are scalar
    aggregates (the A8 pattern), never driver-side row sets.
    """
    req = requests.select(
        F.col("source_key").cast("string").alias("source_key"),
        F.col("predecessor_key").cast("string").alias("predecessor_key"),
    ).distinct()

    # conflicting predecessors: >1 distinct (incl. null-vs-value) per key
    conflicts = (
        req.groupBy("source_key")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
    )
    c = conflicts.limit(1).collect()
    if c:
        k = c[0]["source_key"]
        raise ValueError(f"Conflicting predecessors for {k}")

    stored = table.read(spark).select("source_key", "canonical_id")
    looked_up = req.join(stored, "source_key").select(
        "source_key", "canonical_id", F.lit("looked_up").alias("method")
    )
    missing = req.join(stored.select("source_key"), "source_key", "left_anti")

    with_pred = missing.filter(F.col("predecessor_key").isNotNull())
    # fail fast when a named predecessor has no id yet
    pred_lookup = stored.select(
        F.col("source_key").alias("predecessor_key"),
        F.col("canonical_id").alias("_pred_id"),
    )
    joined = with_pred.join(pred_lookup, "predecessor_key", "left")
    bad = joined.filter(F.col("_pred_id").isNull()).limit(1).collect()
    if bad:
        raise ValueError(f"Predecessor not found: {bad[0]['predecessor_key']}")
    inherited = joined.select(
        "source_key",
        F.col("_pred_id").alias("canonical_id"),
        F.lit("inherited").alias("method"),
    )
    n_inherited = inherited.count()
    if n_inherited:
        table.append(
            inherited.select("source_key", "canonical_id"),
            changeset_id=f"{changeset_id}-inherit",
            sort_cols=["source_key"],
        )

    fresh = missing.filter(F.col("predecessor_key").isNull()).select("source_key")
    minted = mint_ids(
        spark, table, fresh, changeset_id, length=length, max_rounds=max_rounds
    ).select("source_key", "canonical_id", F.lit("minted").alias("method"))

    return looked_up.unionByName(inherited).unionByName(minted)
