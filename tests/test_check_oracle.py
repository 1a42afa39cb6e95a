"""Unit tests for the local correctness gate's comparator.

Round-5 verdict task #2: the driver's value-hash is repr/bit-level
sensitive, while ``==``-based comparison treats ``-0.0 == +0.0`` (and
any bit-identical NaN payloads) as equal — so a signed-zero asymmetry
between Spark and DuckDB output was invisible to the local gate by
construction (covariance_matrix_embeddings was driver-red two rounds
running while the local sweep stayed green).  These tests pin the
hardened ``tools.check_oracle.compare``: bit-level float equality,
explicit signed-zero diagnostics, and no false positives on NaN pairs.
"""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_oracle import compare  # noqa: E402


def test_signed_zero_asymmetry_fails():
    a = pd.DataFrame({"k": [1, 2], "v": [0.0, 1.5]})
    b = pd.DataFrame({"k": [1, 2], "v": [-0.0, 1.5]})
    problems = compare("t", a, b)
    assert problems, "-0.0 vs +0.0 must fail the gate (driver hash splits them)"
    assert any("signed-zero" in p for p in problems)


def test_bit_equal_floats_pass():
    a = pd.DataFrame({"k": [1, 2, 3], "v": [0.0, -0.0, float("nan")]})
    b = pd.DataFrame({"k": [1, 2, 3], "v": [0.0, -0.0, float("nan")]})
    assert compare("t", a, b) == []


def test_nan_pairs_match_regardless_of_payload():
    # Two NaNs with different payload bits still count as a match —
    # pandas/parquet normalize NaN payloads before the driver hashes.
    payload_nan = np.uint64(0x7FF8000000000001).view(np.float64)
    a = pd.DataFrame({"v": [float("nan"), 2.0]})
    b = pd.DataFrame({"v": [float(payload_nan), 2.0]})
    assert compare("t", a, b) == []


def test_plain_value_mismatch_still_caught():
    a = pd.DataFrame({"v": [1.0, 2.0]})
    b = pd.DataFrame({"v": [1.0, 2.0000001]})
    problems = compare("t", a, b)
    assert problems and any("value mismatch" in p for p in problems)


def test_negative_zero_canonicalization_identity():
    # The production fix appends `+ 0.0` to rounded expressions:
    # IEEE round-to-nearest guarantees -0.0 + 0.0 = +0.0.
    assert not np.signbit(np.float64(-0.0) + 0.0)
    assert np.float64(-0.0) + 0.0 == 0.0


def test_signed_zero_ties_align_deterministically():
    # ADVICE r6: two rows that tie on every sort key but carry
    # opposite-signed zeros in engine-specific ORDER must still align
    # (multiset-equal frames pass); the old ==-based sort left them in
    # input order and reported a spurious signed-zero red.
    a = pd.DataFrame({"k": [1, 1], "v": [0.0, -0.0]})
    b = pd.DataFrame({"k": [1, 1], "v": [-0.0, 0.0]})
    assert compare("t", a, b) == []


def test_signed_zero_multiset_mismatch_still_fails():
    # ...but a genuine multiset difference (two -0.0 vs one) still fails.
    a = pd.DataFrame({"k": [1, 1], "v": [0.0, 0.0]})
    b = pd.DataFrame({"k": [1, 1], "v": [-0.0, 0.0]})
    problems = compare("t", a, b)
    assert problems and any("signed-zero" in p for p in problems)


def test_nan_sorts_deterministically_with_total_order_key():
    # NaN rows land last on both sides regardless of payload bits.
    payload_nan = float(np.uint64(0x7FF8000000000001).view(np.float64))
    a = pd.DataFrame({"v": [float("nan"), 1.0]})
    b = pd.DataFrame({"v": [1.0, payload_nan]})
    assert compare("t", a, b) == []
