"""catalogue_pipeline_spark — a from-scratch, PySpark-native CDC /
incremental-ingest engine with the query and data-processing capabilities of
wellcomecollection/catalogue-pipeline (see SURVEY.md), re-expressed Spark-first.

Subpackages
-----------
lake        minimal ACID table format over parquet (snapshot log, atomic
            commits, time travel, changeset-tagged commit summaries) — the
            stand-in for Apache Iceberg in this sandbox (no Iceberg runtime
            jar is available), with the same semantics the reference relies
            on: snapshot-id fencing, atomic changeset commits, stats pruning.
cdc         the engine core: binlog generation, last-writer-wins resolution,
            MERGE application, checkpointed replay driver, schema evolution,
            parity oracle.
operators   batch operators from SURVEY.md §2 plus training-data-pipeline
            operators (dedup, similarity search, text analysis, multimodal).
functions   scalar helpers (deterministic ids, hashing, intervals).
streaming   Structured Streaming front-end over the same apply core.
"""

__version__ = "0.1.0"
