"""GE-style declarative JSON fixture runner (FIXTURES.md §1).

Replicates the reference harness semantics
(self_check/util.py: build validator from inline data, run with
result_format=COMPLETE, compare only the keys present in `out`, sort
unexpected lists before comparison, floats via np.allclose with
RTOL=1e-7 / ATOL=5e-2, per-test `tolerance` override for observed_value).
Fixture files live in tests/fixtures/*.json — hand-written cases covering
the north-star expectation subset and its edge semantics.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np
import pytest

from sparkcheck import ExpectationConfiguration, ExpectationSuite, validate_df

FIXTURE_DIR = Path(__file__).parent / "fixtures"

RTOL, ATOL = 1e-7, 5e-2  # reference: self_check/util.py:468-469

_TYPE_MAP = {
    "IntegerType": "int",
    "LongType": "long",
    "DoubleType": "double",
    "FloatType": "float",
    "StringType": "string",
    "BooleanType": "boolean",
    "TimestampType": "timestamp",
}


def _cases():
    out = []
    for path in sorted(FIXTURE_DIR.glob("*.json")):
        spec = json.loads(path.read_text())
        for ds in spec["datasets"]:
            for test in ds["tests"]:
                if "spark" in test.get("suppress_test_for", ()):
                    continue
                only = test.get("only_for")
                if only and "spark" not in only:
                    continue
                out.append(pytest.param(
                    spec["expectation_type"], ds, test,
                    id=f"{path.stem}::{ds.get('dataset_name','ds')}::{test['title']}",
                ))
    return out


def _build_df(spark, ds):
    data = dict(ds["data"])
    cols = list(data)
    # reference fixtures mix ints and floats in one column (e.g. [-1.5, -1]);
    # normalize to float so schema inference doesn't see conflicting types
    schema_pre = (ds.get("schemas") or {}).get("spark") or {}
    for c in cols:
        vals = data[c]
        if any(isinstance(v, float) for v in vals):
            data[c] = [float(v) if isinstance(v, int) and not isinstance(v, bool)
                       else v for v in vals]
        if schema_pre.get(c) == "TimestampType":
            from dateutil.parser import parse as _p

            data[c] = [None if v is None else _p(v) for v in vals]
        elif schema_pre.get(c) in ("IntegerType", "LongType"):
            # reference fixtures carry typed columns as strings ('1')
            data[c] = [None if v is None else int(v) for v in data[c]]
        elif schema_pre.get(c) in ("DoubleType", "FloatType"):
            data[c] = [None if v is None else float(v) for v in data[c]]
    n = len(data[cols[0]])
    rows = [tuple(data[c][i] for c in cols) for i in range(n)]
    schema_spec = (ds.get("schemas") or {}).get("spark")
    if schema_spec:
        # backtick-quote: reference fixtures include column names with
        # spaces, numeric names ("0"), and headerless names ("_c0")
        ddl = ", ".join(f"`{c}` {_TYPE_MAP[schema_spec[c]]}" for c in cols)
        return spark.createDataFrame(rows, ddl)
    return spark.createDataFrame(rows, cols)


def _sorted(v):
    try:
        return sorted(v, key=lambda x: (x is None, str(type(x)), x))
    except TypeError:
        return sorted(v, key=str)


def _close(a, b, tol=None) -> bool:
    if isinstance(a, (int, float)) and isinstance(b, (int, float)) \
            and not isinstance(a, bool) and not isinstance(b, bool):
        if tol is not None:
            return math.isclose(a, b, rel_tol=tol, abs_tol=tol)
        return bool(np.allclose(a, b, rtol=RTOL, atol=ATOL))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_close(x, y, tol) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_close(a[k], b[k], tol) for k in a)
    return a == b


@pytest.mark.parametrize("expectation_type,ds,test", _cases())
def test_fixture(spark, expectation_type, ds, test):
    df = _build_df(spark, ds)
    suite = ExpectationSuite(
        "fixture", [ExpectationConfiguration(expectation_type, dict(test["in"]))]
    )
    evr = validate_df(df, suite, result_format="COMPLETE")["results"][0]
    out = dict(test["out"])
    result = evr.get("result", {})
    tol = test.get("tolerance", out.pop("tolerance", None))

    for key, expected in out.items():
        if key == "success":
            assert evr["success"] == expected, (
                f"success={evr['success']} expected={expected}; "
                f"result={result}; exc={evr.get('exception_info')}"
            )
        elif key in ("unexpected_list", "partial_unexpected_list"):
            got = result.get(key)
            assert got is not None, f"{key} missing from result {result}"
            assert _close(_sorted(got), _sorted(expected)), (key, got, expected)
        elif key == "observed_value":
            got = result.get("observed_value")
            assert _close(got, expected, tol), (key, got, expected)
        else:
            got = result.get(key)
            assert _close(got, expected, tol), (key, got, expected)
