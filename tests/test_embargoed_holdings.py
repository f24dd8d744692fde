"""Embargoed-holdings refresher parity — semantics from
sierra_adapter/update_embargoed_holdings/update_embargoed_holdings.py."""

from datetime import datetime

import pytest

from catalogue_pipeline_spark.plans.embargoed_holdings import (
    embargoed_refresh_windows,
)

NOW = datetime(2024, 6, 15, 10, 30)
VF_SCHEMA = "record_type string, record_id string, content string"
H_SCHEMA = "record_id string, updated_date timestamp"


def _run(spark, vf, holdings, **kw):
    return embargoed_refresh_windows(
        spark.createDataFrame(vf, VF_SCHEMA),
        spark.createDataFrame(holdings, H_SCHEMA),
        now=NOW,
        **kw,
    )


def test_embargo_note_dates_collapse_to_unique_days(spark):
    # :118-121 — holdings modified seconds apart on one night → ONE window
    vf = [
        ("holdings", "h1", "Chronology adjusted by 1460 day embargo period"),
        ("holdings", "h2", "Chronology adjusted by 1460 day embargo period"),
        ("holdings", "h3", "nothing to see"),
        ("items", "i1", "Chronology adjusted"),  # wrong record type
    ]
    holdings = [
        ("h1", datetime(2002, 11, 28, 0, 42, 42)),
        ("h2", datetime(2002, 11, 28, 0, 52, 38)),
        ("h3", datetime(2002, 11, 28, 1, 0, 0)),  # unmatched: excluded
    ]
    out = {r.date.isoformat(): r for r in _run(spark, vf, holdings, stopgap_days=1).collect()}
    assert "2002-11-28" in out
    r = out["2002-11-28"]
    assert r.start == "2002-11-28T00:00:01+00:00"
    assert r.end == "2002-11-28T23:59:59+00:00"
    # 1 embargo date + 1 stopgap day (today), no overlap
    assert set(out) == {"2002-11-28", "2024-06-15"}


def test_stopgap_sweep_covers_last_90_days(spark):
    out = _run(spark, [], [], stopgap_days=90).collect()
    dates = sorted(r.date.isoformat() for r in out)
    assert len(dates) == 90
    assert dates[-1] == "2024-06-15"  # today
    assert dates[0] == "2024-03-18"  # today - 89
    for r in out:
        assert r.start.endswith("T00:00:01+00:00")
        assert r.end.endswith("T23:59:59+00:00")


def test_embargo_date_inside_sweep_not_duplicated(spark):
    vf = [("holdings", "h1", "… Chronology adjusted …")]
    holdings = [("h1", datetime(2024, 6, 14, 3, 0))]
    out = _run(spark, vf, holdings, stopgap_days=3).collect()
    assert len(out) == 3  # 14th already covered by the sweep


def test_pagination_bound_fails_loudly(spark):
    # :66-71 — "Too many results!" assert before any fetch
    vf = [("holdings", f"h{i}", "Chronology adjusted") for i in range(30)]
    spark_vf = spark.createDataFrame(vf, VF_SCHEMA)
    holdings = spark.createDataFrame([], H_SCHEMA)
    import catalogue_pipeline_spark.plans.embargoed_holdings as m

    orig = m.MAX_MATCHES
    m.MAX_MATCHES = 10
    try:
        with pytest.raises(ValueError, match="Too many results"):
            embargoed_refresh_windows(spark_vf, holdings, now=NOW)
    finally:
        m.MAX_MATCHES = orig
