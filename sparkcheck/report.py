"""Human-readable validation reports (the data-docs replacement).

The reference renders EVRs into a static HTML site through a ~10k-LoC
render/ subsystem; per SURVEY §2.1 we deliberately keep results as
queryable tables + JSON. This module is the thin presentation layer on
top: a suite-result dict (from ``validate_df`` / the runner's ``evr``
column) renders to markdown or a self-contained HTML page — enough for a
CI artifact or a notebook cell, with zero dependencies and no site
machinery.
"""

from __future__ import annotations

import html
import json
from typing import Any


def _rows(report: dict[str, Any]) -> list[dict[str, Any]]:
    out = []
    for r in report.get("results", []):
        cfg = r.get("expectation_config", {})
        res = r.get("result", {}) or {}
        exc = r.get("exception_info", {}) or {}
        obs = res.get("observed_value")
        out.append({
            "expectation": cfg.get("expectation_type", "?"),
            "column": (cfg.get("kwargs") or {}).get("column")
            or ", ".join((cfg.get("kwargs") or {}).get("column_list") or ())
            or None,
            "success": bool(r.get("success")),
            "unexpected": res.get("unexpected_count"),
            "element_count": res.get("element_count"),
            "observed": None if obs is None else json.dumps(obs, default=str),
            "error": exc.get("exception_traceback") if exc.get(
                "raised_exception") else None,
        })
    return out


def to_markdown(report: dict[str, Any], title: str = "Validation report") -> str:
    stats = report.get("statistics", {})
    ok = report.get("success")
    lines = [
        f"# {title}",
        "",
        f"**{'PASSED' if ok else 'FAILED'}** — "
        f"{stats.get('successful_expectations', 0)}/"
        f"{stats.get('evaluated_expectations', 0)} expectations successful "
        f"({stats.get('success_percent') if stats.get('success_percent') is not None else 0:.1f}%)",
        "",
        "| status | expectation | column | unexpected | observed |",
        "|---|---|---|---|---|",
    ]
    for row in _rows(report):
        status = "✅" if row["success"] else ("💥" if row["error"] else "❌")
        obs = row["observed"] or ""
        if len(obs) > 60:
            obs = obs[:57] + "..."
        lines.append(
            f"| {status} | {row['expectation']} | {row['column'] or ''} | "
            f"{'' if row['unexpected'] is None else row['unexpected']} | "
            f"{obs} |"
        )
    errs = [r for r in _rows(report) if r["error"]]
    if errs:
        lines += ["", "## Exceptions", ""]
        for r in errs:
            lines += [f"### {r['expectation']} ({r['column']})", "```",
                      (r["error"] or "").strip()[-800:], "```", ""]
    return "\n".join(lines) + "\n"


def to_html(report: dict[str, Any], title: str = "Validation report") -> str:
    stats = report.get("statistics", {})
    ok = report.get("success")
    badge = (
        '<span style="color:#0a0">PASSED</span>' if ok
        else '<span style="color:#c00">FAILED</span>'
    )
    rows_html = []
    for row in _rows(report):
        color = "#e6ffe6" if row["success"] else "#ffe6e6"
        obs = html.escape((row["observed"] or "")[:120])
        err = (
            f'<div style="color:#c00;font-family:monospace;font-size:11px">'
            f"{html.escape((row['error'] or '').strip().splitlines()[-1] if row['error'] else '')}</div>"
        )
        rows_html.append(
            f'<tr style="background:{color}"><td>{"✓" if row["success"] else "✗"}</td>'
            f"<td>{html.escape(row['expectation'])}</td>"
            f"<td>{html.escape(row['column'] or '')}</td>"
            f"<td>{'' if row['unexpected'] is None else row['unexpected']}</td>"
            f"<td>{obs}{err}</td></tr>"
        )
    pct = stats.get("success_percent")
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(title)}</title></head>
<body style="font-family:sans-serif;max-width:60em;margin:2em auto">
<h1>{html.escape(title)}</h1>
<p>{badge} — {stats.get('successful_expectations', 0)}/{stats.get('evaluated_expectations', 0)}
expectations successful ({0.0 if pct is None else pct:.1f}%)</p>
<table border="0" cellpadding="6" style="border-collapse:collapse;width:100%">
<tr style="background:#eee"><th></th><th>expectation</th><th>column</th>
<th>unexpected</th><th>observed</th></tr>
{''.join(rows_html)}
</table></body></html>"""
