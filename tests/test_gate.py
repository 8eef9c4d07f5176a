"""Regression tests for the local oracle gate's driver-semantics.

Round 1 taught us (VERDICT.md "What's wrong" #2/#3) that the DRIVER's
correctness hash is dtype-sensitive (DuckDB SUM(int) -> HUGEINT ->
float64 vs Spark int64 = mismatch) and its canonicalizer crashes on
array cells. The old local gate coerced to float and tupled arrays, so
it passed where the driver failed. These tests pin the hardened
behavior so the local gate can never drift soft again.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import compare  # noqa: E402


def test_equal_frames_pass():
    a = pd.DataFrame({"k": ["a", "b"], "n": [1, 2]})
    b = pd.DataFrame({"n": [2, 1], "k": ["b", "a"]})  # column/row order free
    assert compare("t", a, b) == []


def test_int_vs_float_dtype_fails_even_when_values_equal():
    # the exact r1 t01/t07/a14 failure shape: 500 (int64) vs 500.0 (float64)
    a = pd.DataFrame({"k": ["a"], "total": pd.Series([500], dtype="int64")})
    b = pd.DataFrame({"k": ["a"], "total": pd.Series([500.0], dtype="float64")})
    problems = compare("t", a, b)
    assert problems and "dtype class mismatch" in problems[0]


def test_array_cells_fail():
    # the exact r1 a02/a10 failure shape: list cells crash the driver
    a = pd.DataFrame({"k": ["a"], "qs": [[1.0, 2.0]]})
    b = pd.DataFrame({"k": ["a"], "qs": [[1.0, 2.0]]})
    problems = compare("t", a, b)
    assert problems and "array-typed" in problems[0]


def test_float_bitwise_mismatch_fails():
    a = pd.DataFrame({"x": [1.0]})
    b = pd.DataFrame({"x": [1.0 + 1e-12]})
    assert compare("t", a, b)


def test_value_mismatch_fails():
    a = pd.DataFrame({"x": [1, 2]})
    b = pd.DataFrame({"x": [1, 3]})
    assert compare("t", a, b)
