"""Static data-docs site built from the results store.

The reference renders validation results into a browsable static site via
its ~10k-LoC ``render/`` + ``data_context/store`` subsystem
(great_expectations/render/renderer/site_builder.py). This is the
Spark-engine equivalent with none of the machinery: the runner already
persists every EVR row into the store's ``evaluation_parameters`` table
(runner.store_validation_result), so the site builder just reads that
table back, regroups rows into per-(run, suite) reports, and renders each
through ``report.to_html`` plus one index page.

Scale: data docs are inherently driver-sized — one row per expectation
evaluated, not per data row — but the store table grows forever, so the
builder aggregates run summaries distributed (groupBy run/suite) and only
collects the ``max_runs`` newest runs' EVRs (newest-first), never the
whole history.
"""

from __future__ import annotations

import html
import json
import os
from typing import Any

from pyspark.sql import SparkSession, functions as F

from .report import to_html


def _site_report(evrs: list[dict[str, Any]], suite: str) -> dict[str, Any]:
    """Rebuild a validate_df-shaped report dict from stored EVR rows."""
    n = len(evrs)
    ok = sum(1 for r in evrs if r.get("success"))
    return {
        "success": ok == n,
        "results": evrs,
        "statistics": {
            "evaluated_expectations": n,
            "successful_expectations": ok,
            "unsuccessful_expectations": n - ok,
            "success_percent": (100.0 * ok / n) if n else None,
        },
        "meta": {"expectation_suite_name": suite},
    }


def _page_name(run_id: str, suite: str) -> str:
    safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in f"{run_id}__{suite}")
    return f"{safe}.html"


def build_data_docs(
    store,
    spark: SparkSession,
    out_dir: str,
    max_runs: int = 200,
) -> str:
    """Render the store's validation history into ``out_dir`` as a static
    site: ``index.html`` (newest-first run table with pass/fail badges)
    plus one page per (run_id, suite). Returns the index path.

    Works against any store with ``read(spark, table)`` — ParquetStore or
    IcebergStore — reading the same ``evaluation_parameters`` table the
    URN resolver uses, so anything a suite can reference is also rendered.
    """
    os.makedirs(out_dir, exist_ok=True)
    df = store.read(spark, "evaluation_parameters")
    # distributed summary first; only the newest max_runs groups get their
    # EVR payloads collected
    groups = (
        df.groupBy("run_id", "suite_name")
        .agg(F.max("ts").alias("ts"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("ts"))
        .limit(max_runs)
        .collect()
    )
    keys = [(g["run_id"], g["suite_name"]) for g in groups]
    rows = (
        df.where(
            F.concat_ws("\x00", "run_id", "suite_name").isin(
                ["\x00".join(k) for k in keys]
            )
        )
        .select("run_id", "suite_name", "evr", "ts")
        .collect()
        if keys else []
    )
    by_key: dict[tuple[str, str], list[dict[str, Any]]] = {}
    for r in rows:
        by_key.setdefault((r["run_id"], r["suite_name"]), []).append(
            json.loads(r["evr"])
        )

    index_rows = []
    for g in groups:
        key = (g["run_id"], g["suite_name"])
        evrs = by_key.get(key, [])
        rep = _site_report(evrs, g["suite_name"])
        page = _page_name(*key)
        with open(os.path.join(out_dir, page), "w") as f:
            f.write(to_html(rep, title=f"{g['suite_name']} — run {g['run_id']}"))
        st = rep["statistics"]
        badge = (
            '<span style="color:#0a0">PASSED</span>' if rep["success"]
            else '<span style="color:#c00">FAILED</span>'
        )
        index_rows.append(
            f'<tr><td>{badge}</td>'
            f'<td><a href="{page}">{html.escape(g["suite_name"])}</a></td>'
            f"<td>{html.escape(g['run_id'])}</td>"
            f"<td>{st['successful_expectations']}/{st['evaluated_expectations']}</td>"
            f"<td>{g['ts']}</td></tr>"
        )

    index = os.path.join(out_dir, "index.html")
    with open(index, "w") as f:
        f.write(
            '<!doctype html><html><head><meta charset="utf-8">'
            "<title>Data docs</title></head>"
            '<body style="font-family:sans-serif;max-width:60em;margin:2em auto">'
            "<h1>Validation results</h1>"
            '<table border="0" cellpadding="6" '
            'style="border-collapse:collapse;width:100%">'
            '<tr style="background:#eee"><th>status</th><th>suite</th>'
            "<th>run</th><th>expectations</th><th>latest ts</th></tr>"
            f"{''.join(index_rows)}</table></body></html>"
        )
    return index
