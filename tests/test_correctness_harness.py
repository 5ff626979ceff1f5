"""Negative controls for the local correctness gate itself
(tools/check_correctness.compare): a gate that cannot FAIL is no gate.
Each control mutates a clean frame one way and asserts compare() flags
exactly that mutation — so a silent harness regression (e.g. a
normalization change that masks value drift) fails CI here."""

import math

import pandas as pd

import sys

sys.path.insert(0, "tools")

from check_correctness import _values_equal, compare  # noqa: E402


def _clean():
    return pd.DataFrame(
        {"k": [1, 2, 3], "v": [1.5, 2.5, 3.5], "s": ["a", "b", None]}
    )


class TestCompareCatchesDrift:
    def test_identical_passes(self):
        assert compare(_clean(), _clean(), "t") == []

    def test_value_drift_caught(self):
        bad = _clean()
        bad.loc[1, "v"] = 2.5000001
        out = compare(bad, _clean(), "t")
        assert out and "v" in out[0]

    def test_row_count_caught(self):
        out = compare(_clean().iloc[:2], _clean(), "t")
        assert out and "rowcount" in out[0]

    def test_extra_column_caught(self):
        bad = _clean()
        bad["extra"] = 1
        out = compare(bad, _clean(), "t")
        assert out and "columns" in out[0]

    def test_column_order_is_normalized_not_compared(self):
        reordered = _clean()[["s", "v", "k"]]
        assert compare(reordered, _clean(), "t") == []

    def test_row_order_is_normalized_not_compared(self):
        shuffled = _clean().iloc[[2, 0, 1]].reset_index(drop=True)
        assert compare(shuffled, _clean(), "t") == []

    def test_null_vs_value_caught(self):
        bad = _clean()
        bad.loc[0, "s"] = None
        out = compare(bad, _clean(), "t")
        assert out and "s" in out[0]

    def test_string_drift_caught(self):
        bad = _clean()
        bad.loc[0, "s"] = "a "
        out = compare(bad, _clean(), "t")
        assert out and "s" in out[0]


class TestValuesEqual:
    def test_nan_equals_nan(self):
        assert _values_equal(float("nan"), float("nan"))

    def test_nan_not_equal_number(self):
        assert not _values_equal(float("nan"), 0.0)

    def test_nested_lists(self):
        assert _values_equal([1.0, [2.0, math.nan]], [1.0, [2.0, math.nan]])
        assert not _values_equal([1.0, 2.0], [1.0, 2.0000001])
        assert not _values_equal([1.0], [1.0, 2.0])

    def test_none_pairs(self):
        assert _values_equal(None, None)
        assert not _values_equal(None, 0)
