"""Convert reference test-definition JSON into tests/fixtures/ported files.

Conversion rules (FIXTURES.md §2, reference tests/test_definitions/*):
- keep dataset_name, data, tests, and only the `spark` schema entry;
- drop tests suppressed for spark or gated `only_for` another engine
  (pandas/sqlalchemy/mssql/...), unless --force-engine re-gates a case
  whose semantics are engine-independent (documented per file);
- titles prefixed `ref_` for traceability;
- columns mixing ints and floats are coerced to float (Spark schema
  inference rejects mixed types; reference fixtures rely on pandas);
- test keys reduced to title/in/out (+tolerance); `out` keys our runner
  doesn't compare (unexpected_index_list, traceback_substring on
  engine-specific messages) are dropped when requested.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

REF = Path("/root/reference/tests/test_definitions")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"

SPARK_TYPES = {
    "IntegerType", "LongType", "DoubleType", "FloatType", "StringType",
    "BooleanType", "TimestampType",
}


def spark_applicable(test: dict, force: bool) -> bool:
    if "spark" in test.get("suppress_test_for", ()):
        return False
    only = test.get("only_for")
    if only:
        if any(o.startswith("spark") for o in only):
            return True
        return force  # engine-independent semantics, re-gated deliberately
    return True


def coerce_floats(data: dict) -> dict:
    out = {}
    for col, vals in data.items():
        if any(isinstance(v, float) for v in vals):
            vals = [float(v) if isinstance(v, int) and not isinstance(v, bool)
                    else v for v in vals]
        out[col] = vals
    return out


def convert(path: Path, force: bool, drop_index_list: bool = True) -> dict | None:
    spec = json.loads(path.read_text())
    datasets = []
    for ds in spec["datasets"]:
        tests = []
        for t in ds.get("tests", []):
            if not spark_applicable(t, force):
                continue
            if not isinstance(t.get("in"), dict):
                continue  # legacy positional form; not supported
            out = dict(t["out"])
            if drop_index_list:
                out.pop("unexpected_index_list", None)
            nt = {"title": "ref_" + t["title"], "in": t["in"], "out": out}
            if "tolerance" in t:
                nt["tolerance"] = t["tolerance"]
            tests.append(nt)
        if not tests and "data" not in ds:
            continue
        nds = {"dataset_name": ds.get("dataset_name", "ds"),
               "data": coerce_floats(ds["data"]), "tests": tests}
        schema = (ds.get("schemas") or {}).get("spark")
        if schema and all(v in SPARK_TYPES for v in schema.values()):
            nds["schemas"] = {"spark": schema}
        datasets.append(nds)
    n = sum(len(d["tests"]) for d in datasets)
    if n == 0:
        return None
    return {"expectation_type": spec["expectation_type"], "datasets": datasets}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="path relative to reference test_definitions")
    ap.add_argument("dest", help="output stem, e.g. ref_strftime_ported")
    ap.add_argument("--force-engine", action="store_true")
    ap.add_argument("--keep-index-list", action="store_true")
    args = ap.parse_args()
    spec = convert(REF / args.src, args.force_engine,
                   drop_index_list=not args.keep_index_list)
    if spec is None:
        print(f"SKIP {args.src}: no spark-applicable cases")
        return
    dest = OUT / f"{args.dest}.json"
    dest.write_text(json.dumps(spec, indent=1))
    n = sum(len(d["tests"]) for d in spec["datasets"])
    print(f"wrote {dest} ({n} cases)")


if __name__ == "__main__":
    main()
