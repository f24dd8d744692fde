"""Embargoed-holdings refresher (sierra_adapter/
update_embargoed_holdings/update_embargoed_holdings.py:1-137).

Sierra fills a holdings record's 863 "you can see issues up to <date>"
field at READ time from a rolling embargo ("Chronology adjusted by 1460
day embargo period" in subfield $x) without bumping the record's
modified date — so the incremental adapter never re-fetches it.  The
reference's scheduled Lambda:

1. searches the reporting index for holdings varfields whose subfield
   content matches "Chronology adjusted", asserting the hit count stays
   ≤ 10,000 before doing anything (:66-71 — blowing the bound means the
   query needs pagination, fail loudly instead of silently truncating);
2. mgets each matched holding's ``updatedDate`` (:73-84);
3. additionally yields ``today - d`` for d in 0..89 — a 90-day stopgap
   sweep because holdings updatedDate is "quite flaky" (:86-98);
4. collapses everything to UNIQUE calendar dates (many holdings were
   modified seconds apart on the same night, :118-121) and publishes one
   re-harvest window per date, ``[00:00:01, 23:59:59]`` of that day
   (:124-135) into the Sierra reader — i.e. back into the engine's
   windowed replay path (S1/S2).

Spark shape: two frames in — varfields ``(record_type, record_id,
content)`` and holdings ``(record_id, updated_date timestamp)`` — one
distinct-date aggregation out.  The ≤10k gate is a single-row count
(control-plane, bounded, same class as the matcher's count gate).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMBARGO_NOTE = "Chronology adjusted"
MAX_MATCHES = 10_000


def embargoed_refresh_windows(
    varfields: DataFrame,
    holdings: DataFrame,
    *,
    now: dt.datetime,
    stopgap_days: int = 90,
) -> DataFrame:
    """One re-harvest window per unique affected calendar date.  Returns
    ``(date, start, end)`` — ``start``/``end`` are the reference's exact
    message strings (``%Y-%m-%dT00:00:01+00:00`` / ``T23:59:59+00:00``),
    ready for the replay path.  Raises when the embargo-note search
    exceeds the reference's 10k pagination bound."""
    spark = varfields.sparkSession
    matched = (
        varfields.filter(
            (F.col("record_type") == "holdings")
            & F.col("content").contains(EMBARGO_NOTE)
        )
        .select("record_id")
        .distinct()
    )
    n = matched.count()
    if n > MAX_MATCHES:
        raise ValueError(
            f"Too many results! {n} embargoed holdings > {MAX_MATCHES} "
            "(reference asserts before paginating)"
        )

    affected = matched.join(holdings, "record_id").select(
        F.to_date("updated_date").alias("date")
    )
    sweep = spark.range(int(stopgap_days)).select(
        F.date_sub(F.lit(now.date()), F.col("id").cast("int")).alias("date")
    )
    dates = affected.union(sweep).filter(F.col("date").isNotNull()).distinct()
    return dates.select(
        "date",
        F.concat(F.date_format("date", "yyyy-MM-dd"), F.lit("T00:00:01+00:00")).alias(
            "start"
        ),
        F.concat(F.date_format("date", "yyyy-MM-dd"), F.lit("T23:59:59+00:00")).alias(
            "end"
        ),
    )
