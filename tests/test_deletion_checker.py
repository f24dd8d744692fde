"""Group-testing deletion checker parity — scenarios from
calm_deletion_checker DefectiveCheckerTest (property-based: correctness
over random (n, d) plus the paper's probe-count upper bound)."""

import random

import pytest
from hypothesis import given, settings, strategies as st

from catalogue_pipeline_spark.operators.deletion_checker import (
    check_deletions,
    find_defectives,
    n_tests_upper_bound,
)


def _test_fn(defective: set):
    return lambda ids: len(set(ids) & defective)


@given(st.integers(1, 400), st.data())
@settings(max_examples=60, deadline=None)
def test_finds_defectives_and_respects_bound(n, data):
    # 'correctly finds defectives' + 'makes fewer queries than the bound'
    d = data.draw(st.integers(0, n))
    items = [f"r{i:05d}" for i in range(n)]
    defective = set(random.Random(n * 7919 + d).sample(items, d))
    found, probes = find_defectives(items, _test_fn(defective))
    assert found == defective
    assert probes <= n_tests_upper_bound(n, d)


def test_no_deletions_single_probe():
    items = [f"r{i}" for i in range(100)]
    found, probes = find_defectives(items, _test_fn(set()))
    assert found == set() and probes == 1


def test_all_deleted_single_probe():
    items = [f"r{i}" for i in range(50)]
    found, probes = find_defectives(items, _test_fn(set(items)))
    assert found == set(items) and probes == 1


def test_bad_probe_fails():
    # 'fails if the count doesn't make sense'
    with pytest.raises(RuntimeError):
        find_defectives(["a", "b"], lambda ids: len(ids) + 1)


def test_check_deletions_against_table(spark):
    # ApiDeletionChecker as a lake probe: stored ids vs a source table
    # missing three of them
    source = spark.createDataFrame(
        [(f"r{i:03d}",) for i in range(40) if i not in (3, 17, 29)],
        "id string",
    )
    stored = [f"r{i:03d}" for i in range(40)]
    deleted, probes = check_deletions(stored, source)
    assert deleted == {"r003", "r017", "r029"}
    assert probes <= n_tests_upper_bound(40, 3)
