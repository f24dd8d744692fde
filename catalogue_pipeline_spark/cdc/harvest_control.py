"""Harvest control plane — the OAI-PMH adapter's window bookkeeping as
DataFrame plans.

The reference threads every adapter run through a *window status table*:
the trigger reads it to compute the next harvest range, the loader
classifies candidate windows against it (skip already-successful ones but
re-emit their changeset ids), the reporter derives coverage/gap/failure
analytics from it, and the mark-published step stamps the rows whose
changesets made it through the whole pipeline so the trigger's resume
cursor only advances past *published* work.  Reference:

* ``adapters/utils/window_generator.py:34-92`` — epoch-aligned candidate
  windows, optional partial final window;
* ``adapters/utils/window_harvester.py:26-64,163-221`` — tag parsing with
  the two legacy formats, and the pending-vs-reused window split;
* ``adapters/utils/window_reporter.py:104-415`` — the coverage report
  (merged-interval coverage hours, gap complement, failures, success and
  published cursors, overlap-based row scoping);
* ``adapters/steps/oai_pmh/trigger.py:66-176`` — next-window decision:
  published-cursor resume with success fall-back, lookback default, lag
  circuit-breaker, no-new-windows error, canonical job ids;
* ``adapters/steps/oai_pmh/mark_published.py:54-119`` — covered-key
  stamping: fail loudly on key misses, stamp success-only, skip (and
  preserve) existing stamps;
* ``adapters/extractors/oai_pmh/models/step_events.py:144-185`` — the
  loader response rollup (changeset-id union, success-only covered keys);
* ``adapters/steps/oai_pmh/loader.py:275-382`` — id-mode outcome
  classification (recovered / removed / unfetchable; removed ids are
  never written and mint no window rows).

The status table is control-plane-sized (one row per 15-minute window —
~35k/year/adapter), so the global-ordered window functions used for the
interval sweep are deliberate: the frame is bounded by construction, the
same argument the reference makes for its in-memory sweep.  The heavy
side (the record table the windows describe) never passes through here.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.intervals import merge_intervals_df

DEFAULT_WINDOW_MINUTES = 15

_ISO = "yyyy-MM-dd'T'HH:mm:ss"


def iso_utc(col: Column) -> Column:
    """Python ``datetime.isoformat()`` of a UTC timestamp (second
    precision, explicit ``+00:00`` offset) — the form window keys use."""
    return F.concat(F.date_format(col, _ISO), F.lit("+00:00"))


def window_key_expr(start: Column, end: Column) -> Column:
    """``IncrementalWindow.to_iso_string`` (incremental_window.py:77-78):
    ``{start_iso}_{end_iso}``."""
    return F.concat(iso_utc(start), F.lit("_"), iso_utc(end))


def parse_window_tags(tags: Column) -> Column:
    """``WindowSummaryTags.parse`` (window_harvester.py:32-57) as one
    struct expression over a ``map<string,string>`` tags column:

    * ``changeset_ids`` — the legacy singular ``changeset_id`` tag seeds
      the list, but a JSON ``changeset_ids`` tag *replaces* it entirely
      (the reference overwrites, not appends);
    * ``upserted_record_count`` — the legacy ``record_ids_changed`` JSON
      list contributes its length; a ``upserted_record_count`` tag wins;
    * ``published_at`` — parsed leniently (window_summary.py:14-28): a
      missing, empty, or non-ISO value is NULL, so garbage stamps read as
      unstamped and get re-stamped instead of advancing the cursor.
    """
    t = F.coalesce(tags, F.map_from_arrays(F.array(), F.array()))
    singular = t.getItem("changeset_id")
    plural = F.from_json(t.getItem("changeset_ids"), "array<string>")
    changesets = F.coalesce(
        plural,
        F.when(singular.isNotNull(), F.array(singular)),
        F.array().cast("array<string>"),
    )
    legacy_count = F.size(F.from_json(t.getItem("record_ids_changed"), "array<string>"))
    count = F.coalesce(
        t.getItem("upserted_record_count").cast("long"),
        F.when(legacy_count >= 0, legacy_count.cast("long")),
        F.lit(0).cast("long"),
    )
    pub_raw = t.getItem("published_at")
    published = F.coalesce(
        F.try_to_timestamp(pub_raw, F.lit(_ISO + "XXX")),
        F.try_to_timestamp(pub_raw, F.lit(_ISO + ".SSSSSSXXX")),
        F.try_to_timestamp(pub_raw, F.lit(_ISO)),
        F.try_to_timestamp(pub_raw, F.lit(_ISO + ".SSSSSS")),
    )
    return F.struct(
        changesets.alias("changeset_ids"),
        count.alias("upserted_record_count"),
        published.alias("published_at"),
    )


def aligned_windows(
    spark: SparkSession,
    start: str | datetime,
    end: str | datetime,
    window_minutes: int = DEFAULT_WINDOW_MINUTES,
    *,
    allow_partial_final_window: bool = True,
) -> DataFrame:
    """``WindowGenerator.generate_windows`` (window_generator.py:34-92):
    candidate windows between ``start`` and ``end`` aligned to epoch
    boundaries every ``window_minutes`` — the first window runs from
    ``start`` to the next boundary, the last is clipped to ``end`` (or,
    with ``allow_partial_final_window=False``, ``end`` is first truncated
    to the previous boundary, bumped forward one period if that lands
    before ``start``).  Raises ``ValueError`` when start >= end, like the
    reference.  Built as one ``sequence``+``explode`` over boundary
    indices, so a year-long backfill range plans distributed.
    """
    s = _as_utc(start)
    e = _as_utc(end)
    if s >= e:
        raise ValueError("start_time must be earlier than end_time")
    step = window_minutes * 60
    if not allow_partial_final_window:
        aligned = datetime.fromtimestamp(
            (int(e.timestamp()) // step) * step, tz=timezone.utc
        )
        if aligned < s:
            aligned += timedelta(seconds=step)
        e = aligned
    one = spark.range(1).select(
        F.lit(s.isoformat()).cast("timestamp").alias("s"),
        F.lit(e.isoformat()).cast("timestamp").alias("e"),
    )
    # boundary index k covers [k*step, (k+1)*step); window i starts at
    # max(range start, boundary i) and ends at min(range end, boundary i+1)
    out = (
        one.select(
            "s",
            "e",
            F.explode(
                F.sequence(
                    (F.unix_timestamp("s") / step).cast("long"),
                    ((F.unix_timestamp("e") - 1) / step).cast("long"),
                )
            ).alias("k"),
        )
        .select(
            F.greatest(F.col("s"), F.timestamp_seconds(F.col("k") * step)).alias(
                "window_start"
            ),
            F.least(
                F.col("e"), F.timestamp_seconds((F.col("k") + 1) * step)
            ).alias("window_end"),
        )
        .filter(F.col("window_start") < F.col("window_end"))
    )
    return out.withColumn(
        "window_key", window_key_expr(F.col("window_start"), F.col("window_end"))
    )


def _as_utc(v: str | datetime) -> datetime:
    if isinstance(v, str):
        v = datetime.fromisoformat(v.replace("Z", "+00:00"))
    if v.tzinfo is None:
        return v.replace(tzinfo=timezone.utc)
    return v.astimezone(timezone.utc)


def _overlapping(status: DataFrame, range_start, range_end) -> DataFrame:
    """``WindowReporter._within_range`` (window_reporter.py:421-450):
    windows overlapping [range_start, range_end) — end-exclusive on both
    edges, so a window that merely touches a bound is out of scope."""
    df = status
    if range_start is not None:
        df = df.filter(F.col("window_end") > F.lit(_as_utc(range_start).isoformat()).cast("timestamp"))
    if range_end is not None:
        df = df.filter(F.col("window_start") < F.lit(_as_utc(range_end).isoformat()).cast("timestamp"))
    return df


def coverage_report(
    status: DataFrame,
    *,
    range_start: str | datetime | None = None,
    range_end: str | datetime | None = None,
    now: str | datetime | None = None,
) -> DataFrame:
    """``WindowReporter.coverage_report`` (window_reporter.py:113-228) as a
    single-row DataFrame.  Input: the window-status table with
    ``(window_start, window_end, state, attempts, last_error, tags)``.

    Output columns: ``range_start/range_end`` (the analysis bounds —
    defaulting to the first overlapping window's start and the
    latest-starting window's end), ``total_windows``, ``state_counts``
    (map), ``coverage_hours`` (successful intervals merged then clipped,
    so overlapping windows never double-count, :230-278),
    ``coverage_gaps`` (the complement of the merged successful intervals
    within the bounds, :308-362), ``failures`` (every non-success row,
    :364-383), ``last_success_end`` and ``last_published_end`` (the two
    resume cursors; published = success rows carrying a *valid*
    ``published_at`` tag).  An empty range yields zero windows and — when
    both bounds are known and ordered — one whole-range gap (:205-228;
    ``now`` stands in for missing bounds there).
    """
    rows = _overlapping(status, range_start, range_end).select(
        "window_start",
        "window_end",
        "state",
        "attempts",
        "last_error",
        parse_window_tags(F.col("tags")).alias("_tags"),
        window_key_expr(F.col("window_start"), F.col("window_end")).alias(
            "window_key"
        ),
    )
    spark = status.sparkSession
    now_dt = _as_utc(now) if now is not None else datetime.now(timezone.utc)

    # analysis bounds: explicit, else first/last of the overlapping rows,
    # else `now` (empty-range report)
    bounds = rows.agg(
        F.min("window_start").alias("first_start"),
        F.max_by("window_end", F.struct("window_start", "window_end")).alias(
            "last_end"
        ),
        F.count("*").alias("total_windows"),
    ).select(
        (
            F.lit(_as_utc(range_start).isoformat()).cast("timestamp")
            if range_start is not None
            else F.coalesce(
                F.col("first_start"),
                F.lit(now_dt.isoformat()).cast("timestamp"),
            )
        ).alias("range_start"),
        (
            F.lit(_as_utc(range_end).isoformat()).cast("timestamp")
            if range_end is not None
            else F.coalesce(
                F.col("last_end"), F.lit(now_dt.isoformat()).cast("timestamp")
            )
        ).alias("range_end"),
        "total_windows",
    )

    state_counts = rows.groupBy("state").count()
    counts_row = state_counts.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("state", "count")))
        ).alias("state_counts")
    )

    merged = merge_intervals_df(
        rows.filter(F.col("state") == "success").select(
            F.col("window_start").alias("start"), F.col("window_end").alias("end")
        )
    )
    islands = merged.agg(
        F.sort_array(F.collect_list(F.struct("start", "end"))).alias("islands")
    )

    failures_row = rows.filter(F.col("state") != "success").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "window_start",
                    "window_end",
                    "window_key",
                    "attempts",
                    "last_error",
                )
            )
        ).alias("failures")
    )
    cursors = rows.filter(F.col("state") == "success").agg(
        F.max("window_end").alias("last_success_end"),
        F.max(
            F.when(
                F.col("_tags").getField("published_at").isNotNull(),
                F.col("window_end"),
            )
        ).alias("last_published_end"),
    )

    rep = (
        bounds.crossJoin(counts_row)
        .crossJoin(islands)
        .crossJoin(failures_row)
        .crossJoin(cursors)
    )
    isl = F.col("islands")
    clip_lo, clip_hi = F.col("range_start"), F.col("range_end")
    clipped_seconds = F.aggregate(
        isl,
        F.lit(0).cast("long"),
        lambda acc, iv: acc
        + F.greatest(
            F.lit(0).cast("long"),
            F.unix_timestamp(F.least(iv.getField("end"), clip_hi))
            - F.unix_timestamp(F.greatest(iv.getField("start"), clip_lo)),
        ),
    )
    # gap complement: head gap, inter-island gaps (islands are disjoint and
    # sorted, so successive starts always exceed prior ends), tail gap —
    # UNclipped islands, exactly like the reference (:343-361)
    head = F.when(
        (F.size(isl) > 0) & (clip_lo < isl.getItem(0).getField("start")),
        F.array(
            F.struct(
                clip_lo.alias("start"), isl.getItem(0).getField("start").alias("end")
            )
        ),
    ).otherwise(F.array().cast("array<struct<start:timestamp,end:timestamp>>"))
    middle = F.when(F.size(isl) > 1, F.zip_with(
        F.slice(isl, 1, F.greatest(F.size(isl) - 1, F.lit(0))),
        F.slice(isl, 2, F.greatest(F.size(isl) - 1, F.lit(0))),
        lambda a, b: F.struct(
            a.getField("end").alias("start"), b.getField("start").alias("end")
        ),
    )).otherwise(F.array().cast("array<struct<start:timestamp,end:timestamp>>"))
    tail = F.when(
        (F.size(isl) > 0)
        & (isl.getItem(F.size(isl) - 1).getField("end") < clip_hi),
        F.array(
            F.struct(
                isl.getItem(F.size(isl) - 1).getField("end").alias("start"),
                clip_hi.alias("end"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<start:timestamp,end:timestamp>>"))
    empty_gap = F.when(
        (F.size(isl) == 0) & (clip_lo < clip_hi),
        F.array(F.struct(clip_lo.alias("start"), clip_hi.alias("end"))),
    ).otherwise(F.array().cast("array<struct<start:timestamp,end:timestamp>>"))

    return rep.select(
        "range_start",
        "range_end",
        "total_windows",
        "state_counts",
        (
            F.when(F.size(isl) > 0, clipped_seconds).otherwise(F.lit(0)) / 3600.0
        ).alias("coverage_hours"),
        F.when(F.size(isl) == 0, empty_gap)
        .otherwise(F.concat(head, middle, tail))
        .alias("coverage_gaps"),
        "failures",
        "last_success_end",
        "last_published_end",
    )


def next_window_request(
    status: DataFrame,
    *,
    now: str | datetime,
    window_lookback_days: int,
    max_lag_minutes: int,
    enforce_lag: bool = True,
    job_id: str | None = None,
    adapter_name: str = "adapter",
) -> DataFrame:
    """The trigger decision (trigger.py:66-176) as one row: resume from
    the last *published* window end, falling back to the last successful
    end while nothing carries a stamp, else ``now - lookback``; measure
    lag against the *success* cursor (a stalled mark-published step must
    not stop harvesting, :125-137); statuses mirror the reference's two
    raise sites — ``lag_exceeded`` (checked first) and
    ``no_new_windows`` (start >= end) — with ``ok`` carrying the loader
    event fields and the canonical ``YYYYMMDDTHHMM`` job id (:63-65)."""
    now_dt = _as_utc(now)
    cursors = coverage_report(status, now=now_dt).select(
        "last_success_end", "last_published_end"
    )
    now_lit = F.lit(now_dt.isoformat()).cast("timestamp")
    cursor_end = F.coalesce(F.col("last_published_end"), F.col("last_success_end"))
    start = F.coalesce(
        cursor_end,
        now_lit - F.expr(f"INTERVAL {int(window_lookback_days)} DAYS"),
    )
    lag_minutes = (
        F.unix_timestamp(now_lit) - F.unix_timestamp(F.col("last_success_end"))
    ) / 60.0
    lag_exceeded = (
        F.col("last_success_end").isNotNull() & (lag_minutes > float(max_lag_minutes))
        if enforce_lag
        else F.lit(False)
    )
    status_col = (
        F.when(lag_exceeded, F.lit("lag_exceeded"))
        .when(start >= now_lit, F.lit("no_new_windows"))
        .otherwise(F.lit("ok"))
    )
    resolved_job = (
        F.lit(job_id)
        if job_id is not None
        else F.date_format(now_lit, "yyyyMMdd'T'HHmm")
    )
    return cursors.select(
        status_col.alias("status"),
        F.when(status_col == "ok", start).alias("start_time"),
        F.when(status_col == "ok", now_lit).alias("end_time"),
        F.when(status_col == "ok", resolved_job).alias("job_id"),
        lag_minutes.alias("lag_minutes"),
        F.when(
            status_col == "lag_exceeded",
            F.concat(
                F.lit(f"{adapter_name.title()} adapter is too far behind: "),
                F.lit("last successful window ended "),
                iso_utc(F.col("last_success_end")),
            ),
        ).alias("error"),
    )


def plan_harvest(
    status: DataFrame,
    *,
    range_start: str | datetime,
    range_end: str | datetime,
    window_minutes: int = DEFAULT_WINDOW_MINUTES,
    reprocess_successful_windows: bool = False,
    max_windows: int | None = None,
) -> DataFrame:
    """``WindowHarvestManager.harvest_range``'s selection pass
    (window_harvester.py:163-221): candidate windows for the range,
    classified ``reuse`` (an exact-key ``success`` row exists — skipped,
    but its changeset ids and upsert count are re-emitted so a run that
    died between loading and publishing self-heals) vs ``harvest``.
    Resumed windows (an existing non-success row) carry
    ``attempts = prior + 1`` and their already-committed changesets/record
    ids, mirroring ``BatchProgress.from_summary`` (:122-135).
    ``reprocess_successful_windows`` forces everything pending with fresh
    attempt counts; ``max_windows`` caps the *pending* list in window
    order — candidates beyond the cap fall out of the run entirely, while
    reused windows always report (:205-210)."""
    cands = aligned_windows(
        status.sparkSession, range_start, range_end, window_minutes
    )
    if reprocess_successful_windows:
        joined = cands.withColumn("state", F.lit(None).cast("string")).withColumn(
            "attempts", F.lit(None).cast("int")
        ).withColumn(
            "_tags",
            F.lit(None).cast(
                "struct<changeset_ids:array<string>,upserted_record_count:bigint,"
                "published_at:timestamp>"
            ),
        ).withColumn("record_ids", F.lit(None).cast("array<string>"))
    else:
        existing = status.select(
            window_key_expr(F.col("window_start"), F.col("window_end")).alias(
                "window_key"
            ),
            "state",
            "attempts",
            parse_window_tags(F.col("tags")).alias("_tags"),
            "record_ids",
        )
        joined = cands.join(existing, "window_key", "left")

    classified = joined.select(
        "window_key",
        "window_start",
        "window_end",
        F.when(F.col("state") == "success", F.lit("reuse"))
        .otherwise(F.lit("harvest"))
        .alias("action"),
        F.when(F.col("state") == "success", F.col("attempts"))
        .otherwise(F.coalesce(F.col("attempts") + 1, F.lit(1)))
        .alias("attempts"),
        F.col("state").alias("prior_state"),
        F.coalesce(
            F.col("_tags").getField("changeset_ids"),
            F.array().cast("array<string>"),
        ).alias("changeset_ids"),
        F.coalesce(
            F.col("_tags").getField("upserted_record_count"), F.lit(0).cast("long")
        ).alias("upserted_record_count"),
        F.size(F.coalesce(F.col("record_ids"), F.array().cast("array<string>"))).alias(
            "resumed_record_count"
        ),
    )
    if max_windows is None:
        return classified
    w = Window.partitionBy("action").orderBy("window_start")
    return classified.withColumn("_rk", F.row_number().over(w)).filter(
        (F.col("action") == "reuse") | (F.col("_rk") <= int(max_windows))
    ).drop("_rk")


def loader_response_rollup(
    summaries: DataFrame,
    *,
    job_id: str,
    extra_changeset_ids: list[str] | None = None,
    extra_upserted_record_count: int = 0,
) -> DataFrame:
    """``OAIPMHLoaderResponse.from_summaries`` (step_events.py:144-185):
    one response row — the distinct union of every summary's changeset ids
    (plus the buffered-mode extras committed per flush rather than per
    window), the summed upsert counts, and the ``success``-state window
    keys (the set mark-published will stamp).  Changeset ids are sorted
    for determinism where the reference tolerates ``set`` order."""
    extras = sorted(set(extra_changeset_ids or []))
    parsed = summaries.select(
        F.col("state"),
        F.col("window_start"),
        window_key_expr(F.col("window_start"), F.col("window_end")).alias(
            "window_key"
        ),
        parse_window_tags(F.col("tags")).alias("_tags"),
    )
    per_window_sets = F.flatten(
        F.collect_list(F.col("_tags").getField("changeset_ids"))
    )
    all_sets = (
        F.concat(per_window_sets, F.array(*[F.lit(x) for x in extras]))
        if extras
        else per_window_sets
    )
    agg = parsed.agg(
        F.array_sort(F.array_distinct(all_sets)).alias("changeset_ids"),
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("state") == "success",
                    F.struct("window_start", "window_key"),
                )
            )
        ).getField("window_key").alias("covered_window_keys"),
        F.coalesce(
            F.sum(F.col("_tags").getField("upserted_record_count")),
            F.lit(0),
        ).alias("_count"),
    )
    return agg.select(
        F.lit(job_id).alias("job_id"),
        "changeset_ids",
        "covered_window_keys",
        (F.col("_count") + F.lit(int(extra_upserted_record_count)))
        .cast("long")
        .alias("changed_record_count"),
    )


def mark_published(
    status: DataFrame,
    covered_window_keys: list[str] | DataFrame,
    *,
    now: str | datetime,
) -> tuple[DataFrame, DataFrame]:
    """``mark_published.handler`` (mark_published.py:54-119).  Returns
    ``(stamped_rows, report)``:

    * a covered key missing from the store fails the whole step — nothing
      stamps, the report row carries ``status='error'`` plus the sorted
      missing keys (:79-92: a silent miss would stall the published
      cursor while runs look quiet);
    * otherwise rows still in ``state='success'`` and not yet carrying a
      *valid* stamp get ``tags['published_at'] = now`` (and
      ``updated_at``); already-stamped rows are skipped, keeping their
      original timestamp so retries are idempotent; non-success rows are
      silently left alone (:96-101);
    * the report carries ``windows_stamped/windows_skipped/
      last_published_end`` (:105-119).
    """
    spark = status.sparkSession
    if isinstance(covered_window_keys, DataFrame):
        keys = covered_window_keys.select(
            F.col(covered_window_keys.columns[0]).alias("window_key")
        ).distinct()
    else:
        keys = spark.createDataFrame(
            [(k,) for k in sorted(set(covered_window_keys))], "window_key string"
        )
    now_dt = _as_utc(now)
    keyed = status.withColumn(
        "window_key", window_key_expr(F.col("window_start"), F.col("window_end"))
    ).withColumn("_present", F.lit(True))
    # presence marker, not state.isNotNull(): a stored row with a NULL
    # state is *present* (stateless), not a missing key
    hit = keys.join(keyed, "window_key", "left").withColumn(
        "_found", F.col("_present").isNotNull()
    )
    missing = hit.filter(~F.col("_found"))
    pub = parse_window_tags(F.col("tags")).getField("published_at")
    covered = hit.filter(F.col("_found")).withColumn("_pub", pub)
    to_stamp = covered.filter(
        (F.col("state") == "success") & F.col("_pub").isNull()
    )
    now_iso_lit = F.lit(now_dt.isoformat())
    stamped = to_stamp.select(
        "window_key",
        "window_start",
        "window_end",
        "state",
        "attempts",
        "record_ids",
        "last_error",
        F.map_concat(
            # drop any existing (necessarily invalid — valid stamps were
            # skipped above) published_at before re-stamping: map_concat
            # rejects duplicate keys
            F.map_filter(
                F.coalesce(F.col("tags"), F.map_from_arrays(F.array(), F.array())),
                lambda k, _: k != "published_at",
            ),
            F.create_map(F.lit("published_at"), now_iso_lit),
        ).alias("tags"),
        F.lit(now_dt.isoformat()).cast("timestamp").alias("updated_at"),
    )
    # gate the stamped frame itself on the missing-key check: the
    # reference raises before any write (mark_published.py:79-92), so a
    # caller that persists `stamped` without reading the report must not
    # be able to stamp during key-format drift — in the error case the
    # frame materializes to zero rows
    stamped = (
        stamped.crossJoin(missing.agg(F.count("*").alias("_n_missing")))
        .filter(F.col("_n_missing") == 0)
        .drop("_n_missing")
    )
    report = (
        missing.agg(
            F.sort_array(F.collect_list("window_key")).alias("missing_keys")
        )
        .crossJoin(
            covered.agg(
                F.sum(
                    F.when(
                        (F.col("state") == "success") & F.col("_pub").isNull(), 1
                    ).otherwise(0)
                ).alias("_n_stamp"),
                F.sum(
                    F.when(
                        (F.col("state") == "success") & F.col("_pub").isNotNull(), 1
                    ).otherwise(0)
                ).alias("windows_skipped"),
                F.max(
                    F.when(
                        (F.col("state") == "success") & F.col("_pub").isNull(),
                        F.col("window_end"),
                    )
                ).alias("_last_pub"),
            )
        )
        .select(
            F.when(F.size("missing_keys") > 0, F.lit("error"))
            .otherwise(F.lit("ok"))
            .alias("status"),
            "missing_keys",
            F.when(F.size("missing_keys") > 0, F.lit(0))
            .otherwise(F.coalesce(F.col("_n_stamp"), F.lit(0)))
            .cast("long")
            .alias("windows_stamped"),
            F.coalesce(F.col("windows_skipped"), F.lit(0))
            .cast("long")
            .alias("windows_skipped"),
            F.when(F.size("missing_keys") == 0, F.col("_last_pub")).alias(
                "last_published_end"
            ),
        )
    )
    return stamped, report


def id_load_classify(fetches: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Id-mode outcome classification (loader.py:275-382).  Input: one row
    per *requested* id in request order — ``(seq, record_id,
    fetch_status)`` with status in ``ok`` / ``id_does_not_exist`` /
    ``error``.  Returns ``(per_id, outcome)``:

    * ids are deduplicated keeping the first occurrence, empty/null ids
      dropped (:318 ``dict.fromkeys``);
    * ``ok`` ids are recovered (written); ``id_does_not_exist`` ids are
      *removed* — reported but never written and never tombstoned (the
      signal is too weak to propagate a delete, :305-316); ``error`` ids
      are *unfetchable*, the residue to re-run (:342-358);
    * the outcome row counts all three but keeps only the removed and
      unfetchable id lists — recovered ids would be tens of thousands of
      strings for a number (:281-288).  No window rows are minted: a
      synthetic window would shift the trigger's resume cursor over a
      range that was never harvested (:316-320)."""
    w = Window.partitionBy("record_id").orderBy("seq")
    deduped = (
        fetches.filter(
            F.col("record_id").isNotNull() & (F.col("record_id") != "")
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    per_id = deduped.select(
        "seq",
        "record_id",
        F.when(F.col("fetch_status") == "ok", F.lit("recovered"))
        .when(F.col("fetch_status") == "id_does_not_exist", F.lit("removed"))
        .otherwise(F.lit("unfetchable"))
        .alias("bucket"),
        (F.col("fetch_status") == "ok").alias("written"),
    )
    outcome = per_id.agg(
        F.count("*").alias("requested"),
        F.sum(F.when(F.col("bucket") == "recovered", 1).otherwise(0))
        .cast("long")
        .alias("recovered"),
        F.sort_array(
            F.collect_list(
                F.when(F.col("bucket") == "removed", F.struct("seq", "record_id"))
            )
        ).getField("record_id").alias("removed"),
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("bucket") == "unfetchable", F.struct("seq", "record_id")
                )
            )
        ).getField("record_id").alias("unfetchable"),
    )
    return per_id, outcome
