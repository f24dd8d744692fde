"""Calm query-expression parity — scenarios from
calm_api_client CalmQueryTest."""

from datetime import date

from pyspark.sql import functions as F

from catalogue_pipeline_spark.functions.calm_query import (
    created_or_modified_date,
    daily_query_expr,
    empty_created_and_modified_date,
    format_date,
    join_and,
    join_or,
    leaf,
    record_id,
    record_ids_query,
    ref_no,
)


def test_leaf_and_node_serialise():
    # 'a QueryLeaf serialises correctly' + 'a QueryNode serialises correctly'
    assert leaf("key", "value") == "(key=value)"
    assert leaf("key", "*", "!=") == "(key!=*)"
    assert join_or([leaf("a", "b"), leaf("c", "d")]) == "(a=b)OR(c=d)"
    assert (
        join_and([leaf("a", "b"), join_or([leaf("c", "d"), leaf("e", "f")])])
        == "(a=b)AND(c=d)OR(e=f)"
    )


def test_dates_format_correctly():
    # 'dates are formatted correctly' — dd/MM/yyyy
    assert format_date(date(2021, 3, 7)) == "07/03/2021"
    assert (
        created_or_modified_date(date(2021, 3, 7))
        == "(Created=07/03/2021)OR(Modified=07/03/2021)"
    )
    assert (
        empty_created_and_modified_date() == "(Created!=*)AND(Modified!=*)"
    )


def test_record_ids_double_quoted():
    # 'RecordIds are wrapped in double quotes when serialised'
    assert record_id("abc-123") == '(RecordId="abc-123")'
    assert (
        record_ids_query(["b", "a"]) == '(RecordId="a")OR(RecordId="b")'
    )
    assert ref_no("PP/CRI") == "(RefNo=PP/CRI)"


def test_daily_query_expr_column(spark):
    df = spark.createDataFrame(
        [("2021-03-07",), ("2024-12-31",)], "d string"
    ).select(daily_query_expr(F.col("d").cast("date")).alias("q"))
    assert [r.q for r in df.collect()] == [
        "(Created=07/03/2021)OR(Modified=07/03/2021)",
        "(Created=31/12/2024)OR(Modified=31/12/2024)",
    ]
