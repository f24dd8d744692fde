"""Fuzzy period parsing (X1): the reference's own documented-example table
(PeriodParserTest.scala:14-447, sourced from the ALM period_field_format
manual) ported 1:1, plus qualifier/half-bounded/multi-period cases
(PeriodParserTest.scala:450-565). BC dates are out of scope (Python date
has no year ≤ 0); everything else matches the reference byte-for-byte."""

import datetime as dt

import pytest

from catalogue_pipeline_spark.functions.periods import parse_period

D = dt.date

DOCUMENTED = [
    ("1900s", D(1900, 1, 1), D(1999, 12, 31)),
    ("1800s-1900s", D(1800, 1, 1), D(1999, 12, 31)),
    ("1910s", D(1910, 1, 1), D(1919, 12, 31)),
    ("1910s-1920s", D(1910, 1, 1), D(1929, 12, 31)),
    ("jan-may 1999", D(1999, 1, 1), D(1999, 5, 31)),
    ("april 1456", D(1456, 4, 1), D(1456, 4, 30)),
    ("january 1256-february 2002", D(1256, 1, 1), D(2002, 2, 28)),
    ("jan 1689-23 december 2001", D(1689, 1, 1), D(2001, 12, 23)),
    ("jan 1689-23rd december 2001", D(1689, 1, 1), D(2001, 12, 23)),
    ("late 13th century", D(1260, 1, 1), D(1299, 12, 31)),
    ("12/6/1278", D(1278, 6, 12), D(1278, 6, 12)),
    ("13/01/1245-23/08/1678", D(1245, 1, 13), D(1678, 8, 23)),
    ("12 dec-16 dec 1435", D(1435, 12, 12), D(1435, 12, 16)),
    ("15 jul 1678", D(1678, 7, 15), D(1678, 7, 15)),
    ("13 jun-15 december 1778", D(1778, 6, 13), D(1778, 12, 15)),
    ("13 aug 1787", D(1787, 8, 13), D(1787, 8, 13)),
    ("14 sep 1357-jan 1367", D(1357, 9, 14), D(1367, 1, 31)),
    ("23 apr 1278-28 feb 1456", D(1278, 4, 23), D(1456, 2, 28)),
    ("23 jan 1300-1301", D(1300, 1, 23), D(1301, 12, 31)),
    ("12-13 century", D(1100, 1, 1), D(1299, 12, 31)),
    ("23-27 jan 1987", D(1987, 1, 23), D(1987, 1, 27)),
    ("1974 nov 30", D(1974, 11, 30), D(1974, 11, 30)),
    ("early 12th century", D(1100, 1, 1), D(1139, 12, 31)),
    ("12th century-mid 20th century", D(1100, 1, 1), D(1969, 12, 31)),
    ("29th oct-30th oct 2002", D(2002, 10, 29), D(2002, 10, 30)),
    ("10th dec 2002 a.d.", D(2002, 12, 10), D(2002, 12, 10)),
    ("11th jan 1899-12 dec 1999", D(1899, 1, 11), D(1999, 12, 12)),
    ("23rd dec 1233-23rd mar 1733", D(1233, 12, 23), D(1733, 3, 23)),
    ("13th jul 1456-1789", D(1456, 7, 13), D(1789, 12, 31)),
    ("23rd 12 1899", D(1899, 12, 23), D(1899, 12, 23)),
    ("23rd 12 1899-13th 2 1999", D(1899, 12, 23), D(1999, 2, 13)),
    ("12th-16th cent.", D(1100, 1, 1), D(1599, 12, 31)),
    ("12th-13th dec 1678", D(1678, 12, 12), D(1678, 12, 13)),
    ("1456", D(1456, 1, 1), D(1456, 12, 31)),
    ("1974 nov", D(1974, 11, 1), D(1974, 11, 30)),
    ("1974 nov - dec", D(1974, 11, 1), D(1974, 12, 31)),
    ("1982 sep - nov 01", D(1982, 9, 1), D(1982, 11, 1)),
    ("1974 nov - 1975 dec", D(1974, 11, 1), D(1975, 12, 31)),
    ("1974 nov - 1975 dec 31", D(1974, 11, 1), D(1975, 12, 31)),
    ("1974 nov 01 - dec", D(1974, 11, 1), D(1974, 12, 31)),
    ("1974 nov 01 - dec 31", D(1974, 11, 1), D(1974, 12, 31)),
    ("1974 nov 01 - 30", D(1974, 11, 1), D(1974, 11, 30)),
    ("1970 mar 01 - 1990", D(1970, 3, 1), D(1990, 12, 31)),
    ("1974 nov 01 - 1975 dec 31", D(1974, 11, 1), D(1975, 12, 31)),
    ("1974 - 1975 nov", D(1974, 1, 1), D(1975, 11, 30)),
    ("1974 - 1975 nov 30", D(1974, 1, 1), D(1975, 11, 30)),
    ("1256-15th century", D(1256, 1, 1), D(1499, 12, 31)),
    ("16th century-1704", D(1500, 1, 1), D(1704, 12, 31)),
    ("1789-1867", D(1789, 1, 1), D(1867, 12, 31)),
    ("spring 1918", D(1918, 3, 1), D(1918, 5, 31)),
    ("spring 1918-summer 1920", D(1918, 3, 1), D(1920, 8, 31)),
]

EXTRA = [
    # qualifiers (PeriodParserTest.scala:450-530)
    ("fl. 1999-2001 [gaps]", D(1999, 1, 1), D(2001, 12, 31)),
    ("MDCCLXXXVII. [1787]", D(1787, 1, 1), D(1787, 12, 31)),
    ("c.1920", D(1910, 1, 1), D(1929, 12, 31)),
    ("circa 17th century", D(1590, 1, 1), D(1709, 12, 31)),
    ("mid-late 19th century", D(1830, 1, 1), D(1899, 12, 31)),
    ("2000s-2020s", D(2000, 1, 1), D(2029, 12, 31)),
    # half-bounded
    ("1897-", D(1897, 1, 1), dt.date.max),
    ("after 1897", D(1897, 1, 1), dt.date.max),
    ("-1897", dt.date.min, D(1897, 12, 31)),
    ("before 1897", dt.date.min, D(1897, 12, 31)),
    # multi-period
    ("1952, 1953, 1955, 1957-1960", D(1952, 1, 1), D(1960, 12, 31)),
    # seasons + law terms
    ("winter 1868", D(1868, 12, 1), D(1869, 2, 28)),
    ("michaelmas 1850", D(1850, 10, 1), D(1850, 11, 30)),
    ("hilary 1850", D(1850, 1, 1), D(1850, 2, 28)),
]


@pytest.mark.parametrize("label,lo,hi", DOCUMENTED + EXTRA)
def test_documented_examples(label, lo, hi):
    got = parse_period(label)
    assert got == (lo, hi), f"{label!r}: got {got}"


@pytest.mark.parametrize("label", ["n.d.", "undated", "unknown", "", None, "gibberish"])
def test_unparseable(label):
    assert parse_period(label) is None


def test_udf_plumbing(spark):
    from pyspark.sql import functions as F

    from catalogue_pipeline_spark.functions.periods import parse_period_udf

    df = spark.createDataFrame(
        [("a", "c.1920"), ("b", "spring 1918"), ("c", "n.d.")], "id string, label string"
    )
    out = {
        r["id"]: r
        for r in df.select("id", parse_period_udf()(F.col("label")).alias("p"))
        .select("id", "p.from_date", "p.to_date", "p.parsed")
        .collect()
    }
    assert out["a"]["from_date"] == D(1910, 1, 1) and out["a"]["to_date"] == D(1929, 12, 31)
    assert out["b"]["parsed"] and out["c"]["parsed"] is False
    assert out["c"]["from_date"] is None


def test_fuzz_never_crashes_never_inverts():
    """Property: arbitrary input never raises and never yields an inverted
    interval (hypothesis over both random text and date-vocabulary soup)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    vocab = st.sampled_from(
        ["century", "jan", "spring", "before", "after", "mid", "early", "late",
         "c.", "1920", "1920s", "12th", "nd", "to", "and", "michaelmas",
         "circa", "-", "1994-5", "©", "[gaps]"]
    )
    soup = st.lists(vocab, min_size=0, max_size=6).map(" ".join)
    anytext = st.text(max_size=30)

    @settings(max_examples=400, deadline=None)
    @given(st.one_of(anytext, soup))
    def run(s):
        got = parse_period(s)
        assert got is None or got[0] <= got[1]

    run()
