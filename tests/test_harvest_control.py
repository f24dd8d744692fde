"""Harvest control plane parity — scenarios ported from the reference's
tests/adapters/utils/test_window_reporter.py, test_window_generator.py,
test_window_harvester.py (tag-parse + selection cases) and
tests/adapters/extractors/oai_pmh/test_trigger.py / test_mark_published.py."""

from datetime import datetime, timedelta, timezone

import pytest

from catalogue_pipeline_spark.cdc.harvest_control import (
    aligned_windows,
    coverage_report,
    id_load_classify,
    loader_response_rollup,
    mark_published,
    next_window_request,
    parse_window_tags,
    plan_harvest,
)

UTC = timezone.utc
T0 = datetime(2025, 1, 1, 12, 0, tzinfo=UTC)

STATUS_SCHEMA = (
    "window_start timestamp, window_end timestamp, state string, attempts int, "
    "record_ids array<string>, last_error string, updated_at timestamp, "
    "tags map<string,string>"
)


def _w(start, minutes=15, state="success", tags=None, attempts=1, record_ids=None):
    return (
        start.replace(tzinfo=None),
        (start + timedelta(minutes=minutes)).replace(tzinfo=None),
        state,
        attempts,
        record_ids or [],
        "Error" if state == "failed" else None,
        T0.replace(tzinfo=None),
        tags,
    )


def _status(spark, rows):
    return spark.createDataFrame(rows, STATUS_SCHEMA)


def _key(start, minutes=15):
    end = start + timedelta(minutes=minutes)
    return f"{start.isoformat()}_{end.isoformat()}"


# ------------------------------------------------------------------ reporter


def test_coverage_report_basic(spark):
    # test_window_reporter.py:80 — two adjacent success windows: 0.5 h, no gaps
    df = _status(spark, [_w(T0), _w(T0 + timedelta(minutes=15))])
    r = coverage_report(df).collect()[0]
    assert r.total_windows == 2
    assert dict(r.state_counts) == {"success": 2}
    assert r.coverage_hours == pytest.approx(0.5)
    assert r.coverage_gaps == []
    assert r.last_success_end.replace(tzinfo=UTC) == T0 + timedelta(minutes=30)
    assert r.last_published_end is None


def test_coverage_report_failed_window_is_gap_and_failure(spark):
    # test_window_reporter.py:96 — success, failed, success → one mid gap
    df = _status(
        spark,
        [
            _w(T0),
            _w(T0 + timedelta(minutes=15), state="failed", attempts=3),
            _w(T0 + timedelta(minutes=30)),
        ],
    )
    r = coverage_report(df).collect()[0]
    assert dict(r.state_counts) == {"failed": 1, "success": 2}
    assert r.coverage_hours == pytest.approx(0.5)
    assert [
        (g.start.replace(tzinfo=UTC), g.end.replace(tzinfo=UTC))
        for g in r.coverage_gaps
    ] == [(T0 + timedelta(minutes=15), T0 + timedelta(minutes=30))]
    assert len(r.failures) == 1
    f = r.failures[0]
    assert f.attempts == 3 and f.last_error == "Error"
    assert f.window_key == _key(T0 + timedelta(minutes=15))


def test_coverage_report_missing_window_gap(spark):
    # test_window_reporter.py:138 — hole between two successes
    df = _status(spark, [_w(T0), _w(T0 + timedelta(minutes=30))])
    r = coverage_report(df).collect()[0]
    assert r.total_windows == 2
    assert len(r.coverage_gaps) == 1
    assert r.coverage_gaps[0].start.replace(tzinfo=UTC) == T0 + timedelta(minutes=15)


def test_coverage_report_overlap_success_and_failure(spark):
    # test_window_reporter.py:169 — a 60-min failed window over a 15-min
    # success: coverage 0.25 h, gap 12:15-13:00
    df = _status(
        spark,
        [_w(T0, minutes=60, state="failed"), _w(T0, minutes=15)],
    )
    r = coverage_report(df, range_start=T0, range_end=T0 + timedelta(minutes=60)).collect()[0]
    assert r.total_windows == 2
    assert r.coverage_hours == pytest.approx(0.25)
    assert [
        (g.start.replace(tzinfo=UTC), g.end.replace(tzinfo=UTC))
        for g in r.coverage_gaps
    ] == [(T0 + timedelta(minutes=15), T0 + timedelta(minutes=60))]
    assert len(r.failures) == 1


def test_coverage_report_overlapping_success_merges(spark):
    # test_window_reporter.py:293 — [12:00-12:15] + [12:00-13:00] = 1 h
    df = _status(spark, [_w(T0), _w(T0, minutes=60)])
    r = coverage_report(df).collect()[0]
    assert r.coverage_hours == pytest.approx(1.0)
    assert r.coverage_gaps == []


def test_coverage_report_gap_between_overlapping_groups(spark):
    # test_window_reporter.py:354 — two overlapping clusters with a hole
    df = _status(
        spark,
        [
            _w(T0, minutes=30),
            _w(T0 + timedelta(minutes=15), minutes=30),
            _w(T0 + timedelta(minutes=75), minutes=30),
            _w(T0 + timedelta(minutes=90), minutes=30),
        ],
    )
    r = coverage_report(df).collect()[0]
    assert r.coverage_hours == pytest.approx(1.5)
    assert [
        (g.start.replace(tzinfo=UTC), g.end.replace(tzinfo=UTC))
        for g in r.coverage_gaps
    ] == [(T0 + timedelta(minutes=45), T0 + timedelta(minutes=75))]


def test_coverage_report_last_published_end_and_corrupt_tags(spark):
    # test_window_reporter.py:228,271 — published cursor reads only valid
    # stamps; corrupt/garbage stamps are ignored
    df = _status(
        spark,
        [
            _w(T0, tags={"published_at": "2025-01-01T13:00:00+00:00"}),
            _w(T0 + timedelta(minutes=15), tags={"published_at": "not-a-date"}),
            _w(T0 + timedelta(minutes=30)),
        ],
    )
    r = coverage_report(df).collect()[0]
    assert r.last_published_end.replace(tzinfo=UTC) == T0 + timedelta(minutes=15)
    assert r.last_success_end.replace(tzinfo=UTC) == T0 + timedelta(minutes=45)


def test_coverage_report_empty_range_is_one_gap(spark):
    df = _status(spark, [])
    r = coverage_report(
        df, range_start=T0, range_end=T0 + timedelta(hours=1)
    ).collect()[0]
    assert r.total_windows == 0
    assert r.coverage_hours == 0.0
    assert [
        (g.start.replace(tzinfo=UTC), g.end.replace(tzinfo=UTC))
        for g in r.coverage_gaps
    ] == [(T0, T0 + timedelta(hours=1))]


def test_coverage_report_range_scoping_is_overlap_based(spark):
    # window_reporter.py:421-450 — touching the bound is out of scope
    df = _status(spark, [_w(T0), _w(T0 + timedelta(minutes=15))])
    r = coverage_report(
        df,
        range_start=T0 + timedelta(minutes=15),
        range_end=T0 + timedelta(minutes=30),
    ).collect()[0]
    assert r.total_windows == 1
    r2 = coverage_report(
        df, range_start=T0 + timedelta(minutes=5), range_end=T0 + timedelta(minutes=40)
    ).collect()[0]
    assert r2.total_windows == 2
    # head/tail gaps clip to the requested bounds
    assert [
        (g.start.replace(tzinfo=UTC), g.end.replace(tzinfo=UTC))
        for g in r2.coverage_gaps
    ] == [(T0 + timedelta(minutes=30), T0 + timedelta(minutes=40))]
    # coverage clips to the range: only 25 of the 30 covered minutes are in it
    assert r2.coverage_hours == pytest.approx(25 / 60)


# ------------------------------------------------------------------ generator


def test_aligned_windows_aligns_to_boundaries(spark):
    # test_window_generator.py:184 — 12:07→12:40 with 15-minute windows
    rows = aligned_windows(
        spark, T0 + timedelta(minutes=7), T0 + timedelta(minutes=40)
    ).orderBy("window_start").collect()
    spans = [
        (r.window_start.replace(tzinfo=UTC), r.window_end.replace(tzinfo=UTC))
        for r in rows
    ]
    assert spans == [
        (T0 + timedelta(minutes=7), T0 + timedelta(minutes=15)),
        (T0 + timedelta(minutes=15), T0 + timedelta(minutes=30)),
        (T0 + timedelta(minutes=30), T0 + timedelta(minutes=40)),
    ]


def test_aligned_windows_no_partial_final(spark):
    # window_generator.py:60-70 — truncate end to the previous boundary
    rows = aligned_windows(
        spark,
        T0 + timedelta(minutes=7),
        T0 + timedelta(minutes=40),
        allow_partial_final_window=False,
    ).orderBy("window_start").collect()
    assert rows[-1].window_end.replace(tzinfo=UTC) == T0 + timedelta(minutes=30)
    # ...unless that lands before start: then bump forward one period
    rows2 = aligned_windows(
        spark,
        T0 + timedelta(minutes=16),
        T0 + timedelta(minutes=20),
        allow_partial_final_window=False,
    ).collect()
    assert len(rows2) == 1
    assert rows2[0].window_end.replace(tzinfo=UTC) == T0 + timedelta(minutes=30)


def test_aligned_windows_validates_range(spark):
    with pytest.raises(ValueError):
        aligned_windows(spark, T0, T0)


def test_aligned_windows_single_full_window(spark):
    rows = aligned_windows(spark, T0, T0 + timedelta(minutes=15)).collect()
    assert len(rows) == 1
    assert rows[0].window_key == _key(T0)


# ------------------------------------------------------------------ tag parse


def test_parse_window_tags_compat(spark):
    # test_window_harvester.py:769-829 — the two legacy formats
    cases = [
        (None, [], 0),
        ({"changeset_id": "a"}, ["a"], 0),
        ({"changeset_ids": '["b", "c"]'}, ["b", "c"], 0),
        ({"changeset_id": "a", "changeset_ids": '["b"]'}, ["b"], 0),  # plural wins
        ({"record_ids_changed": '["r1", "r2", "r3"]'}, [], 3),
        ({"upserted_record_count": "7"}, [], 7),
        ({"record_ids_changed": '["r1"]', "upserted_record_count": "9"}, [], 9),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(cases)],
        "i int, tags map<string,string>",
    ).select("i", parse_window_tags(F.col("tags")).alias("p"))
    got = {r.i: r.p for r in df.collect()}
    for i, (_, ids, count) in enumerate(cases):
        assert got[i].changeset_ids == ids, i
        assert got[i].upserted_record_count == count, i


# ------------------------------------------------------------------ harvester


def test_plan_harvest_skips_success_reuses_tags(spark):
    # test_window_harvester.py:285,367 — success windows are reused with
    # their changesets re-emitted; others harvest
    df = _status(
        spark,
        [
            _w(T0, tags={"changeset_ids": '["cs1"]', "upserted_record_count": "4"}),
            _w(T0 + timedelta(minutes=15), state="failed", attempts=2),
        ],
    )
    rows = {
        r.window_key: r
        for r in plan_harvest(
            df, range_start=T0, range_end=T0 + timedelta(minutes=45)
        ).collect()
    }
    assert len(rows) == 3
    reused = rows[_key(T0)]
    assert reused.action == "reuse"
    assert reused.changeset_ids == ["cs1"]
    assert reused.upserted_record_count == 4
    resumed = rows[_key(T0 + timedelta(minutes=15))]
    assert resumed.action == "harvest" and resumed.attempts == 3
    fresh = rows[_key(T0 + timedelta(minutes=30))]
    assert fresh.action == "harvest" and fresh.attempts == 1


def test_plan_harvest_reprocess_forces_all(spark):
    # test_window_harvester.py:304
    df = _status(spark, [_w(T0)])
    rows = plan_harvest(
        df,
        range_start=T0,
        range_end=T0 + timedelta(minutes=30),
        reprocess_successful_windows=True,
    ).collect()
    assert all(r.action == "harvest" and r.attempts == 1 for r in rows)
    assert len(rows) == 2


def test_plan_harvest_max_windows_caps_pending_only(spark):
    # harvest_range :205-210 — the cap applies to pending windows in time
    # order; reused windows always report
    df = _status(spark, [_w(T0 + timedelta(minutes=15))])
    rows = plan_harvest(
        df, range_start=T0, range_end=T0 + timedelta(minutes=60), max_windows=2
    ).collect()
    actions = {r.window_key: r.action for r in rows}
    assert actions == {
        _key(T0): "harvest",
        _key(T0 + timedelta(minutes=15)): "reuse",
        _key(T0 + timedelta(minutes=30)): "harvest",
    }


def test_partial_success_resume_carries_record_ids(spark):
    # test_window_harvester.py:400,700 — a partial_success row resumes
    # with its processed record ids and committed changesets
    df = _status(
        spark,
        [
            _w(
                T0,
                state="partial_success",
                attempts=1,
                record_ids=["r1", "r2"],
                tags={"changeset_ids": '["cs0"]'},
            )
        ],
    )
    row = plan_harvest(
        df, range_start=T0, range_end=T0 + timedelta(minutes=15)
    ).collect()[0]
    assert row.action == "harvest"
    assert row.attempts == 2
    assert row.resumed_record_count == 2
    assert row.changeset_ids == ["cs0"]


def test_loader_response_rollup(spark):
    # step_events.py:144-185 + test_mark_published.py:189 — distinct
    # changesets, success-only covered keys, summed counts + extras
    df = _status(
        spark,
        [
            _w(T0, tags={"changeset_ids": '["b", "a"]', "upserted_record_count": "2"}),
            _w(
                T0 + timedelta(minutes=15),
                state="failed",
                tags={"changeset_ids": '["c"]', "upserted_record_count": "1"},
            ),
            _w(T0 + timedelta(minutes=30), tags={"changeset_id": "a"}),
        ],
    )
    r = loader_response_rollup(
        df, job_id="20250101T1200", extra_changeset_ids=["z"],
        extra_upserted_record_count=5,
    ).collect()[0]
    assert r.job_id == "20250101T1200"
    assert r.changeset_ids == ["a", "b", "c", "z"]
    assert r.covered_window_keys == [_key(T0), _key(T0 + timedelta(minutes=30))]
    assert r.changed_record_count == 8


# ------------------------------------------------------------------ trigger


def _trigger(spark, rows, now, **kw):
    kw.setdefault("window_lookback_days", 3)
    kw.setdefault("max_lag_minutes", 120)
    return next_window_request(_status(spark, rows), now=now, **kw).collect()[0]


def test_trigger_uses_lookback_when_no_history(spark):
    # test_trigger.py:63
    now = T0 + timedelta(days=10)
    r = _trigger(spark, [], now)
    assert r.status == "ok"
    assert r.start_time.replace(tzinfo=UTC) == now - timedelta(days=3)
    assert r.end_time.replace(tzinfo=UTC) == now
    assert r.job_id == "20250111T1200"


def test_trigger_resumes_from_last_success(spark):
    # test_trigger.py:121,144
    now = T0 + timedelta(hours=1)
    r = _trigger(spark, [_w(T0), _w(T0 + timedelta(minutes=15))], now)
    assert r.status == "ok"
    assert r.start_time.replace(tzinfo=UTC) == T0 + timedelta(minutes=30)


def test_trigger_resumes_from_published_cursor(spark):
    # test_trigger.py:177 — loaded-but-unpublished windows stay in range
    now = T0 + timedelta(hours=1)
    r = _trigger(
        spark,
        [
            _w(T0, tags={"published_at": "2025-01-01T12:20:00+00:00"}),
            _w(T0 + timedelta(minutes=15)),  # success but never published
        ],
        now,
    )
    assert r.start_time.replace(tzinfo=UTC) == T0 + timedelta(minutes=15)


def test_trigger_lag_measured_on_success_not_published(spark):
    # test_trigger.py:228 — a stale published cursor must not trip the breaker
    now = T0 + timedelta(minutes=90)
    r = _trigger(
        spark,
        [
            _w(T0, tags={"published_at": "2025-01-01T12:20:00+00:00"}),
            _w(T0 + timedelta(minutes=60)),  # recent success, unpublished
        ],
        now,
        max_lag_minutes=30,
    )
    assert r.status == "ok"
    assert r.start_time.replace(tzinfo=UTC) == T0 + timedelta(minutes=15)


def test_trigger_lag_breaker(spark):
    # test_trigger.py:266,291
    now = T0 + timedelta(hours=5)
    r = _trigger(spark, [_w(T0)], now, max_lag_minutes=120)
    assert r.status == "lag_exceeded"
    assert r.start_time is None and r.job_id is None
    assert "too far behind" in r.error
    r2 = _trigger(spark, [_w(T0)], now, max_lag_minutes=120, enforce_lag=False)
    assert r2.status == "ok"


def test_trigger_no_new_windows(spark):
    now = T0 + timedelta(minutes=15)
    r = _trigger(spark, [_w(T0)], now)
    assert r.status == "no_new_windows"


def test_trigger_job_id_override(spark):
    # test_trigger.py:335
    r = _trigger(spark, [], T0, job_id="backfill-x")
    assert r.job_id == "backfill-x"


# ------------------------------------------------------------- mark published


def test_mark_published_stamps_only_covered_success(spark):
    # test_mark_published.py:58,83
    df = _status(
        spark,
        [
            _w(T0, tags={"changeset_ids": '["cs1"]'}),
            _w(T0 + timedelta(minutes=15), state="failed"),
            _w(T0 + timedelta(minutes=30)),  # success, not covered
        ],
    )
    now = T0 + timedelta(hours=1)
    stamped, report = mark_published(
        df, [_key(T0), _key(T0 + timedelta(minutes=15))], now=now
    )
    srows = stamped.collect()
    assert [r.window_key for r in srows] == [_key(T0)]
    assert srows[0].tags["published_at"] == now.isoformat()
    assert srows[0].tags["changeset_ids"] == '["cs1"]'  # tags survive stamping
    rep = report.collect()[0]
    assert rep.status == "ok"
    assert rep.windows_stamped == 1 and rep.windows_skipped == 0
    assert rep.last_published_end.replace(tzinfo=UTC) == T0 + timedelta(minutes=15)


def test_mark_published_skips_already_stamped(spark):
    # test_mark_published.py:100,132 — idempotent retries preserve stamps
    df = _status(
        spark, [_w(T0, tags={"published_at": "2025-01-01T12:30:00+00:00"})]
    )
    stamped, report = mark_published(df, [_key(T0)], now=T0 + timedelta(hours=2))
    assert stamped.count() == 0
    rep = report.collect()[0]
    assert rep.windows_stamped == 0 and rep.windows_skipped == 1


def test_mark_published_garbage_stamp_re_stamped(spark):
    # test_mark_published.py:118
    df = _status(spark, [_w(T0, tags={"published_at": "garbage"})])
    now = T0 + timedelta(hours=1)
    stamped, report = mark_published(df, [_key(T0)], now=now)
    srows = stamped.collect()
    assert len(srows) == 1 and srows[0].tags["published_at"] == now.isoformat()


def test_mark_published_missing_keys_error(spark):
    # test_mark_published.py:151 — fail loudly, stamp nothing
    df = _status(spark, [_w(T0)])
    missing = _key(T0 + timedelta(minutes=15))
    stamped, report = mark_published(
        df, [_key(T0), missing], now=T0 + timedelta(hours=1)
    )
    rep = report.collect()[0]
    assert rep.status == "error"
    assert rep.missing_keys == [missing]
    assert rep.windows_stamped == 0 and rep.last_published_end is None
    # the stamped frame itself is gated — persisting it without reading
    # the report cannot stamp anything (reference raises before any write)
    assert stamped.count() == 0


def test_mark_published_null_state_row_is_present_not_missing(spark):
    # a stored row whose state is NULL is present-but-stateless: it must
    # not be reported as a missing key (and is not stamped, not success)
    df = _status(spark, [_w(T0), _w(T0 + timedelta(minutes=15), state=None)])
    now = T0 + timedelta(hours=1)
    stamped, report = mark_published(
        df, [_key(T0), _key(T0 + timedelta(minutes=15))], now=now
    )
    rep = report.collect()[0]
    assert rep.status == "ok" and rep.missing_keys == []
    assert rep.windows_stamped == 1
    assert [r.window_key for r in stamped.collect()] == [_key(T0)]


def test_mark_published_empty_keys_noop(spark):
    # test_mark_published.py:146
    df = _status(spark, [_w(T0)])
    stamped, report = mark_published(df, [], now=T0)
    assert stamped.count() == 0
    rep = report.collect()[0]
    assert rep.status == "ok" and rep.windows_stamped == 0


# ------------------------------------------------------------------ id mode


def test_id_load_classify(spark):
    # loader.py:275-382 — dedupe keep-first, three buckets, removed never
    # written
    df = spark.createDataFrame(
        [
            (0, "a", "ok"),
            (1, "b", "id_does_not_exist"),
            (2, "a", "error"),  # duplicate of seq 0: dropped
            (3, "", "ok"),  # empty id: dropped
            (4, "c", "error"),
            (5, "d", "ok"),
        ],
        "seq int, record_id string, fetch_status string",
    )
    per_id, outcome = id_load_classify(df)
    rows = {r.record_id: r for r in per_id.collect()}
    assert len(rows) == 4
    assert rows["a"].bucket == "recovered" and rows["a"].written
    assert rows["b"].bucket == "removed" and not rows["b"].written
    assert rows["c"].bucket == "unfetchable"
    o = outcome.collect()[0]
    assert o.requested == 4 and o.recovered == 2
    assert o.removed == ["b"] and o.unfetchable == ["c"]
