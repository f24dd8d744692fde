"""One-off scale probe for the works-ingestor document builder (round-5
verdict ask #7): show that EXECUTION scales with rows while plan
CONSTRUCTION stays fixed (and, since round 6, cached).

Synthesizes N works (spark.range — no external data) with the full
WORK_SCHEMA shape incl. a 3-level collection-path hierarchy, then times

  * build  — extract_works + indexable_works plan construction,
  * exec   — a count() over the finished documents,

at two sizes an order of magnitude apart.  Usage:

    python tools/bench_works_ingestor.py [N_SMALL N_LARGE]
"""

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from catalogue_pipeline_spark.session import build_session  # noqa: E402
from catalogue_pipeline_spark.plans.works_ingestor import (  # noqa: E402
    WORK_SCHEMA,
    extract_works,
    indexable_works,
)


def synth_works(spark, n):
    base = spark.range(n).select(F.col("id").alias("ck"))
    raw = base.selectExpr(
        "'w'||cast(ck as string) as work_id",
        "CASE WHEN ck%10=7 THEN 'Redirected' ELSE 'Visible' END as type",
        "CASE WHEN ck%20=2 THEN 'Series' ELSE 'Standard' END as work_type",
        "'sierra-system-number' as source_scheme",
        "'b'||cast(ck as string) as source_value",
        "'Work '||cast(ck as string) as title",
        # 3-level fragment path hierarchy over 64 groups
        "named_struct('path', 'P'||cast(ck%64 as string)||'/M'||cast(ck%64 as string)"
        "||'/L'||cast(ck as string), 'label', cast(null as string)) as collection_path",
        "CASE WHEN ck%3=0 THEN array(named_struct("
        " 'concept_id','c'||cast(ck%1000 as string),"
        " 'label','subj '||cast(ck%1000 as string),"
        " 'identifiers',cast(array() as array<struct<scheme:string,value:string>>),"
        " 'concept_type','Subject',"
        " 'concepts',cast(array() as array<struct<concept_id:string,label:string,"
        "identifiers:array<struct<scheme:string,value:string>>,concept_type:string>>)))"
        " ELSE array() END as subjects",
    )
    target = spark.createDataFrame([], WORK_SCHEMA).schema
    present = set(raw.columns)
    return raw.select(
        *[
            (F.col(f.name).cast(f.dataType) if f.name in present
             else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in target.fields
        ]
    )


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = build_session("works-ingestor-scale", master="local[8]",
                          shuffle_partitions=32)
    for label, n in [("warm", n_small), ("small", n_small), ("large", n_large)]:
        w = synth_works(spark, n)
        t0 = time.time()
        docs = indexable_works(extract_works(w))
        t1 = time.time()
        # force FULL document computation — a bare count() would let
        # Catalyst prune every section column
        cnt = docs.select(
            F.sum(F.xxhash64(F.to_json(F.struct(*docs.columns))) % 1_000_000).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]["n"]
        t2 = time.time()
        print(
            f"{label}: n={n} build={t1 - t0:.2f}s exec={t2 - t1:.2f}s rows={cnt}",
            flush=True,
        )


if __name__ == "__main__":
    main()
