"""Calm search-query expressions — the ``Expr`` parameter grammar of the
Calm SOAP search API.

Reference: ``calm_adapter/calm_api_client/CalmQuery.scala:17-113`` — leaf
expressions ``(key<op>value)`` joined by bare ``OR``/``AND``; the named
queries the adapter issues: the daily harvest window
``(Created=d)OR(Modified=d)`` with ``dd/MM/yyyy`` dates, the data-quality
sweep ``(Created!=*)AND(Modified!=*)``, ``(RefNo=x)``, and
``(RecordId="x")`` — RecordId values are double-quoted ('for some
reason'), which matters because the deletion checker's group-testing
probes are OR-chains of these (``ApiDeletionChecker``).

Python-side builders serve the driver-coordinated probe paths; the
column-side ``daily_query_expr`` derives a whole frame of per-day harvest
expressions in one projection.
"""

from __future__ import annotations

from datetime import date
from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def leaf(key: str, value: str, relational_operator: str = "=") -> str:
    """``QueryLeaf``: ``(key<op>value)``."""
    return f"({key}{relational_operator}{value})"


def join_or(exprs: Iterable[str]) -> str:
    """``QueryNode`` with OR — the ``reduce(_ or _)`` shape."""
    return "OR".join(exprs)


def join_and(exprs: Iterable[str]) -> str:
    return "AND".join(exprs)


def format_date(d: date) -> str:
    """``CalmQuery.formatDate``: dd/MM/yyyy."""
    return d.strftime("%d/%m/%Y")


def modified_date(d: date) -> str:
    return leaf("Modified", format_date(d))


def created_date(d: date) -> str:
    return leaf("Created", format_date(d))


def created_or_modified_date(d: date) -> str:
    """The adapter's daily harvest window."""
    return join_or([created_date(d), modified_date(d)])


def empty_created_and_modified_date() -> str:
    """``(Created!=*)AND(Modified!=*)`` — the records-with-no-dates sweep."""
    return join_and([leaf("Created", "*", "!="), leaf("Modified", "*", "!=")])


def ref_no(value: str) -> str:
    return leaf("RefNo", value)


def record_id(value: str) -> str:
    """RecordId values are double-quoted (CalmQuery.scala:100-104)."""
    return leaf("RecordId", f'"{value}"')


def record_ids_query(ids: Iterable[str]) -> str:
    """The deletion checker's probe expression: an OR-chain of quoted
    RecordId leaves (ApiDeletionChecker, DefectiveChecker.scala:76-82)."""
    return join_or(record_id(i) for i in sorted(set(ids)))


def daily_query_expr(day: Column) -> Column:
    """Column-side ``CreatedOrModifiedDate``: one harvest expression per
    date row — the replayer's per-day backfill plan in one projection."""
    d = F.date_format(day, "dd/MM/yyyy")
    return F.concat(
        F.lit("(Created="), d, F.lit(")OR(Modified="), d, F.lit(")")
    )
