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


#: result fields rendered as a "map-style" statistics grid (reference
#: render/renderer/content_block/expectation_string.py + page_renderer
#: unexpected-statement blocks)
_MAP_FIELDS = (
    ("element_count", "Evaluated rows"),
    ("missing_count", "Missing values"),
    ("missing_percent", "Missing %"),
    ("unexpected_count", "Unexpected values"),
    ("unexpected_percent", "Unexpected %"),
    ("unexpected_percent_total", "Unexpected % (of all rows)"),
    ("unexpected_percent_nonmissing", "Unexpected % (of non-missing)"),
    ("filtered_element_count", "Filtered rows"),
)

#: expectation kwargs that state the EXPECTED side of an aggregate check
_EXPECTED_KWARGS = (
    "min_value", "max_value", "strict_min", "strict_max", "value_set",
    "value", "regex", "regex_list", "like_pattern", "like_pattern_list",
    "type_", "type_list", "json_schema", "strftime_format", "quantile_ranges",
    "partition_object", "threshold", "distribution", "p_value", "mostly",
)


def _kv_table(pairs: list[tuple[str, Any]]) -> str:
    body = "".join(
        f'<tr><td style="color:#666">{html.escape(str(k))}</td>'
        f"<td>{html.escape(json.dumps(v, default=str))}</td></tr>"
        for k, v in pairs
    )
    return (
        '<table border="0" cellpadding="3" '
        'style="border-collapse:collapse;font-size:90%">' + body + "</table>"
    )


def _detail_section(i: int, r: dict[str, Any]) -> str:
    """One per-expectation detail block (the page_renderer content-block
    analog): the expectation's kwargs (the EXPECTED side), the observed
    value, the map-style unexpected statistics, and the
    partial_unexpected_counts / partial_unexpected_list samples when the
    EVR's result_format carried them."""
    cfg = r.get("expectation_config", {})
    res = r.get("result", {}) or {}
    kwargs = cfg.get("kwargs") or {}
    name = cfg.get("expectation_type", "?")
    domain = kwargs.get("column") or ", ".join(kwargs.get("column_list") or ()) or ""
    ok = bool(r.get("success"))
    badge = (
        '<span style="color:#0a0">✓</span>' if ok
        else '<span style="color:#c00">✗</span>'
    )
    parts = [
        f'<details id="evr-{i}" {"" if ok else "open"}>'
        f"<summary>{badge} <b>{html.escape(name)}</b>"
        + (f" <code>{html.escape(domain)}</code>" if domain else "")
        + "</summary>"
        '<div style="margin:0.3em 0 1em 1.5em">'
    ]
    expected = [(k, kwargs[k]) for k in _EXPECTED_KWARGS if k in kwargs]
    if expected:
        parts.append("<h4>Expected</h4>" + _kv_table(expected))
    if "observed_value" in res:
        parts.append(
            "<h4>Observed</h4>"
            f"<code>{html.escape(json.dumps(res['observed_value'], default=str)[:500])}</code>"
        )
    stats = [(label, res[k]) for k, label in _MAP_FIELDS if res.get(k) is not None]
    if stats:
        parts.append("<h4>Unexpected statistics</h4>" + _kv_table(stats))
    puc = res.get("partial_unexpected_counts")
    if puc:
        body = "".join(
            f"<tr><td>{html.escape(json.dumps(c.get('value'), default=str))}</td>"
            f"<td>{c.get('count')}</td></tr>"
            for c in puc
        )
        parts.append(
            "<h4>Most common unexpected values</h4>"
            '<table border="0" cellpadding="3" '
            'style="border-collapse:collapse;font-size:90%">'
            '<tr style="background:#eee"><th>value</th><th>count</th></tr>'
            + body + "</table>"
        )
    elif res.get("partial_unexpected_list"):
        sample = ", ".join(
            html.escape(json.dumps(v, default=str))
            for v in res["partial_unexpected_list"][:20]
        )
        parts.append(f"<h4>Unexpected value sample</h4><code>{sample}</code>")
    exc = r.get("exception_info") or {}
    if exc.get("raised_exception"):
        parts.append(
            '<h4>Exception</h4><pre style="color:#c00;font-size:11px">'
            + html.escape((exc.get("exception_traceback") or "").strip()[-1200:])
            + "</pre>"
        )
    parts.append("</div></details>")
    return "".join(parts)


def _detail_sections(report: dict[str, Any]) -> str:
    results = report.get("results", [])
    if not results:
        return ""
    return (
        "<h2>Expectation details</h2>"
        + "".join(_detail_section(i, r) for i, r in enumerate(results))
    )


def to_html(
    report: dict[str, Any], title: str = "Validation report", details: bool = True
) -> str:
    stats = report.get("statistics", {})
    ok = report.get("success")
    badge = (
        '<span style="color:#0a0">PASSED</span>' if ok
        else '<span style="color:#c00">FAILED</span>'
    )
    rows_html = []
    for i, row in enumerate(_rows(report)):
        color = "#e6ffe6" if row["success"] else "#ffe6e6"
        obs = html.escape((row["observed"] or "")[:120])
        err = (
            f'<div style="color:#c00;font-family:monospace;font-size:11px">'
            f"{html.escape((row['error'] or '').strip().splitlines()[-1] if row['error'] else '')}</div>"
        )
        name = html.escape(row["expectation"])
        cell = f'<a href="#evr-{i}" style="color:inherit">{name}</a>' if details else name
        rows_html.append(
            f'<tr style="background:{color}"><td>{"✓" if row["success"] else "✗"}</td>'
            f"<td>{cell}</td>"
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
</table>
{_detail_sections(report) if details else ''}</body></html>"""
