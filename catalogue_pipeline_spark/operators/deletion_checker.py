"""Deletion discovery by group testing (ST8) — finding which records a
source system silently deleted when it exposes only a *count* probe.

The reference's Calm source has no delete feed: the deletion checker asks
the Calm search API "how many of these ids still exist?" and bisects with
the group-testing scheme of Wang et al 2017 (arXiv:1407.2283, Algorithm 1
with the split size of equations (6), (7), (11)) so d deletions among n
records cost O(d·log(n/d)) count probes instead of n lookups.  Reference:
``calm_adapter/calm_deletion_checker/DefectiveChecker.scala:24-69`` (the
recursion, the M/l/k split sizes, the query-count upper bound used by its
own property test) and ``:71-100`` (the API probe: found-count > asked-for
is an invariant violation and fails the run; probes of the engine's own
lake are just filtered counts).

This operator is deliberately driver-coordinated: each probe is a call to
the *remote* source (the expensive resource being economised), and the
item sets are adapter-batch-sized (hundreds), not table-sized.  The Spark
side only appears inside a probe (a pushdown-filtered count) when checking
against a lake table, as ``table_count_probe`` does.
"""

from __future__ import annotations

import math
from typing import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _l(n: int, d: int) -> int:
    return math.ceil(math.log2(n / d)) - 1


def _k(n: int, d: int) -> int:
    return math.ceil(n / 2 ** _l(n, d)) - d


def _m(n: int, d: int) -> int:
    """Test-set size, equation (11)."""
    if d <= n / 2:
        return n - 2 ** _l(n, d) * (d + _k(n, d) - 1)
    return _m(n, n - d)


def n_tests_upper_bound(n: int, d: int) -> int:
    """Equation (5), adjusted like the reference: the initial whole-set
    count is included, minimum one test (DefectiveChecker.scala:60-66)."""
    if d == 0:
        return 1
    return max((_l(n, d) + 1) * d + _k(n, d), 1)


def find_defectives(
    items: Iterable[str],
    test: Callable[[list[str]], int],
) -> tuple[set[str], int]:
    """Run the group-testing search: ``test(subset)`` returns how many of
    the subset are defective (deleted).  Returns ``(defectives,
    n_tests)``.  Splits take the SORTED prefix where the reference takes
    Scala's arbitrary ``Set.take`` — determinism over an unordered set.
    A probe reporting more defectives than items is the reference's
    'should never happen' invariant and raises."""
    counter = {"n": 0}

    def probe(subset: list[str]) -> int:
        counter["n"] += 1
        d = test(subset)
        if d < 0 or d > len(subset):
            raise RuntimeError(
                f"Probe returned {d} defectives for {len(subset)} items: "
                "this should never happen!"
            )
        return d

    def nested(subset: list[str], d: int) -> set[str]:
        if d == 0:
            return set()
        if d == len(subset):
            return set(subset)
        take = _m(len(subset), d)
        head, tail = subset[:take], subset[take:]
        d1 = probe(head)
        return nested(head, d1) | nested(tail, d - d1)

    ordered = sorted(set(items))
    if not ordered:
        return set(), 0
    d = probe(ordered)
    return nested(ordered, d), counter["n"]


def table_count_probe(
    table: DataFrame, id_col: str = "id"
) -> Callable[[list[str]], int]:
    """A probe against a lake table: defectives = ids NOT present.  Each
    call is one pushdown-filtered count (the lake analogue of the Calm
    search probe, ApiDeletionChecker.scala:76-99)."""

    def test(ids: list[str]) -> int:
        found = table.filter(F.col(id_col).isin(*ids)).select(id_col).distinct().count()
        if found > len(ids):
            raise RuntimeError(
                f"More results returned ({found}) than searched for "
                f"({len(ids)}): this should never happen!"
            )
        return len(ids) - found

    return test


def check_deletions(
    stored_ids: Iterable[str], source_table: DataFrame, id_col: str = "id"
) -> tuple[set[str], int]:
    """Find which stored ids the source no longer holds — the deletion
    checker's whole job (DeletionCheckerWorkerService): group-test the
    batch against the source, returning (deleted_ids, probes_used)."""
    return find_defectives(stored_ids, table_count_probe(source_table, id_col))
