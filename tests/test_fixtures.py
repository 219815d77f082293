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
        if "datasets" not in spec:
            continue  # not a test-definition file (e.g. notification payload fixtures)
        # multi-table files (row_count_to_equal_other_table): sibling
        # datasets in the same file are registered as named tables
        needs_siblings = any(
            "other_table_name" in (t.get("in") or {})
            for d in spec["datasets"] for t in d.get("tests", ())
            if isinstance(t.get("in"), dict)
        )
        for ds in spec["datasets"]:
            if needs_siblings:
                ds = dict(ds, __siblings=spec["datasets"])
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
    if not schema_spec and (
        not rows or any(all(v is None for v in data[c]) for c in cols)
    ):
        # schema inference fails on empty data / all-null columns; build a
        # DDL from the first non-null value per column (string if none)
        def infer(c):
            v = next((x for x in data[c] if x is not None), None)
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, int):
                return "bigint"
            if isinstance(v, float):
                return "double"
            return "string"

        return spark.createDataFrame(
            rows, ", ".join(f"`{c}` {infer(c)}" for c in cols)
        )
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
    import datetime as _dt

    # reference self_check harness compares datetime observed values against
    # the fixtures' ISO strings after parsing (util.py check_json_test_result)
    if isinstance(a, _dt.datetime) and isinstance(b, str):
        from dateutil.parser import parse as _p
        return a == _p(b)
    if isinstance(b, _dt.datetime) and isinstance(a, str):
        from dateutil.parser import parse as _p
        return _p(a) == b
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
    for sib in ds.get("__siblings", ()):
        from sparkcheck.referential import register_table

        register_table(sib["dataset_name"], _build_df(spark, sib))
    suite = ExpectationSuite(
        "fixture", [ExpectationConfiguration(expectation_type, dict(test["in"]))]
    )
    evr = validate_df(df, suite, result_format="COMPLETE")["results"][0]
    out = dict(test["out"])
    result = evr.get("result", {})
    tol = test.get("tolerance", out.pop("tolerance", None))

    for key, expected in out.items():
        if key == "traceback_substring":
            exc = evr.get("exception_info") or {}
            assert exc.get("raised_exception"), (
                f"expected an exception containing {expected!r}; evr={evr}"
            )
            assert expected in (exc.get("exception_traceback") or ""), (
                expected, exc.get("exception_traceback"),
            )
        elif key.startswith("observed_cdf"):
            # reference self_check/util.py:2646-2668: assertions on the
            # first/last x value of details.observed_cdf
            xs = result["details"]["observed_cdf"]["x"]
            got = xs[-1] if "x_-1" in key else xs[0]
            if key.endswith("_lt"):
                assert got < expected, (key, got, expected)
            elif key.endswith("_gt"):
                assert got > expected, (key, got, expected)
            else:
                assert _close(got, expected, tol), (key, got, expected)
        elif key == "result":
            # nested full-result compare: only the keys the fixture names
            # (reference exact_match_out=False semantics)
            for rk, rv in expected.items():
                got = result.get(rk)
                assert _close(got, rv, tol), (rk, got, rv)
        elif key == "success":
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
