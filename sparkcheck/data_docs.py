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


def _violations_by_run(
    store, spark: SparkSession, run_ids: list[str], cap: int
) -> tuple[dict[str, int], dict[str, list[Any]]]:
    """(total count, first-``cap`` sample rows) per rendered run from the
    store's violations table, in TWO distributed jobs total: a groupBy
    count and one window-capped collect — never the whole table to the
    driver. Empty dicts when the store has no violations table."""
    from pyspark.sql import Window

    try:
        vdf = store.read(spark, "violations")
    except Exception:  # noqa: BLE001 — store never wrote violations
        return {}, {}
    vdf = vdf.where(F.col("run_id").isin(run_ids))
    counts = {
        r["run_id"]: int(r["n"])
        for r in vdf.groupBy("run_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    w = Window.partitionBy("run_id").orderBy("doc_id", "span_index", "expectation")
    sample_rows = (
        vdf.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
        .collect()
    )
    samples: dict[str, list[Any]] = {}
    for r in sample_rows:
        samples.setdefault(r["run_id"], []).append(r)
    return counts, samples


def _violations_section(rows: list[Any], total: int, cap: int) -> str:
    if not rows:
        return ""
    cols = ["doc_id", "span_index", "expectation", "observed_value"]
    body = "".join(
        "<tr>" + "".join(
            f"<td>{html.escape(str(r[c]) if r[c] is not None else '')}</td>"
            for c in cols
        ) + "</tr>"
        for r in rows
    )
    note = (
        f"showing first {len(rows)} of {total}" if total > len(rows)
        else f"{total} rows"
    )
    return (
        f"<h2>Violation rows <small>({note})</small></h2>"
        '<table border="0" cellpadding="4" '
        'style="border-collapse:collapse;font-size:90%">'
        '<tr style="background:#eee">'
        + "".join(f"<th>{c}</th>" for c in cols)
        + f"</tr>{body}</table>"
    )


def _describe_expectation(cfg: dict[str, Any]) -> str:
    """One human-readable line per expectation config — the generic form
    of the reference's prescriptive content blocks
    (render/renderer/content_block/expectation_string.py): the type in
    words, the domain up front, remaining kwargs appended."""
    etype = str(cfg.get("expectation_type", "?"))
    kwargs = dict(cfg.get("kwargs") or {})
    words = etype.removeprefix("expect_").replace("_", " ")
    domain_bits = []
    for k in ("column", "column_A", "column_B", "column_list", "column_set"):
        if k in kwargs:
            v = kwargs.pop(k)
            domain_bits.append(
                f"{', '.join(map(str, v)) if isinstance(v, (list, tuple)) else v}"
            )
    rest = ", ".join(
        f"{k}={json.dumps(v, default=str)}" for k, v in sorted(kwargs.items())
    )
    head = f"[{' & '.join(domain_bits)}] " if domain_bits else ""
    return f"{head}{words}" + (f" ({rest})" if rest else "")


def _suite_page_name(suite: str) -> str:
    safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in suite)
    return f"suite__{safe}.html"


def _write_suite_pages(
    out_dir: str,
    groups: list[Any],
    by_key: dict[tuple[str, str], list[dict[str, Any]]],
) -> dict[str, str]:
    """One overview page per suite (reference:
    ExpectationSuitePageRenderer): the expectation list as rendered from
    the suite's NEWEST run's stored configs, plus that suite's run
    history among the rendered runs. Returns {suite: page file}."""
    newest: dict[str, Any] = {}
    history: dict[str, list[Any]] = {}
    for g in groups:  # groups arrive newest-first
        s = g["suite_name"]
        newest.setdefault(s, g)
        history.setdefault(s, []).append(g)
    pages: dict[str, str] = {}
    for s, g in newest.items():
        evrs = by_key.get((g["run_id"], s), [])
        items = "".join(
            "<li>"
            + html.escape(_describe_expectation(r.get("expectation_config") or {}))
            + (
                "" if r.get("success")
                else ' <span style="color:#c00">(failing in latest run)</span>'
            )
            + "</li>"
            for r in evrs
        )
        runs = "".join(
            f'<tr><td><a href="{_page_name(h["run_id"], s)}">'
            f'{html.escape(h["run_id"])}</a></td>'
            f"<td>{h['n']}</td><td>{h['ts']}</td></tr>"
            for h in history[s]
        )
        page = _suite_page_name(s)
        with open(os.path.join(out_dir, page), "w") as f:
            f.write(
                '<!doctype html><html><head><meta charset="utf-8">'
                f"<title>Suite {html.escape(s)}</title></head>"
                '<body style="font-family:sans-serif;max-width:60em;'
                'margin:2em auto">'
                f"<h1>Expectation suite: {html.escape(s)}</h1>"
                f"<p>{len(evrs)} expectations "
                f"(as of run {html.escape(g['run_id'])})</p>"
                f"<ul>{items}</ul>"
                "<h2>Runs</h2>"
                '<table border="0" cellpadding="4" '
                'style="border-collapse:collapse">'
                '<tr style="background:#eee"><th>run</th>'
                "<th>expectations</th><th>ts</th></tr>"
                f"{runs}</table>"
                '<p><a href="index.html">back to index</a></p></body></html>'
            )
        pages[s] = page
    return pages


def build_data_docs(
    store,
    spark: SparkSession,
    out_dir: str,
    max_runs: int = 200,
    violations_cap: int = 200,
) -> str:
    """Render the store's validation history into ``out_dir`` as a static
    site: ``index.html`` (newest-first run table with pass/fail badges and
    violation counts) plus one page per (run_id, suite), each carrying a
    capped sample of that run's violation rows when the store has a
    violations table. Returns the index path.

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

    v_counts, v_samples = _violations_by_run(
        store, spark, [g["run_id"] for g in groups], violations_cap
    )
    suite_pages = _write_suite_pages(out_dir, groups, by_key)

    index_rows = []
    for g in groups:
        key = (g["run_id"], g["suite_name"])
        evrs = by_key.get(key, [])
        rep = _site_report(evrs, g["suite_name"])
        page = _page_name(*key)
        n_viol = v_counts.get(g["run_id"], 0)
        with open(os.path.join(out_dir, page), "w") as f:
            f.write(to_html(rep, title=f"{g['suite_name']} — run {g['run_id']}"))
            f.write(
                _violations_section(
                    v_samples.get(g["run_id"], []), n_viol, violations_cap
                )
            )
        st = rep["statistics"]
        badge = (
            '<span style="color:#0a0">PASSED</span>' if rep["success"]
            else '<span style="color:#c00">FAILED</span>'
        )
        sp = suite_pages.get(g["suite_name"], page)
        index_rows.append(
            f'<tr><td>{badge}</td>'
            f'<td><a href="{sp}">{html.escape(g["suite_name"])}</a></td>'
            f'<td><a href="{page}">{html.escape(g["run_id"])}</a></td>'
            f"<td>{st['successful_expectations']}/{st['evaluated_expectations']}</td>"
            f"<td>{n_viol}</td>"
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
            "<th>run</th><th>expectations</th><th>violations</th>"
            "<th>latest ts</th></tr>"
            f"{''.join(index_rows)}</table></body></html>"
        )
    return index
