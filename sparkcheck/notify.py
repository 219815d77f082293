"""Channel-specific notification payload renderers.

The reference's SlackNotificationAction / MicrosoftTeamsNotificationAction
don't just POST JSON — they render the validation result into each
channel's native rich-message schema (reference:
render/renderer/slack_renderer.py:14-254 — mrkdwn section blocks with
status/suite/run-id summary, per-failure ":x:" lines with the failing
domain, a divider + context footer, and file:// docs links downgraded to
copy-paste text; render/renderer/microsoft_teams_renderer.py:11-205 —
an AdaptiveCard with **key:** value TextBlocks and an Action.OpenUrl for
the docs site). A user wiring Slack through a bare webhook gets an
unformatted blob; these builders produce the reference's message shapes
from this engine's checkpoint result dict, driver-side and dependency
free.

These are pure functions over the finished result — no cluster access —
so they are unit-testable against captured reference-format fixtures and
reusable outside the action framework (e.g. a custom pager).
"""

from __future__ import annotations

from typing import Any

TEAMS_SCHEMA_URL = "http://adaptivecards.io/schemas/adaptive-card.json"
_DOCS_FOOTER = (
    "Learn how to review validation results in Data Docs: "
    "https://docs.greatexpectations.io/docs/terms/data_docs"
)


def _report_of(result: dict[str, Any]) -> dict[str, Any]:
    return result.get("result") or {}


def failed_expectation_domain(name: str, kwargs: dict[str, Any]) -> str | None:
    """The domain entity a failed expectation applies to (reference:
    SlackRenderer.get_failed_expectation_domain): Table for table-level
    checks, the column / column pair / column list otherwise."""
    if "expect_table_" in name:
        return "Table"
    if kwargs.get("column"):
        return str(kwargs["column"])
    if kwargs.get("column_A") and kwargs.get("column_B"):
        return f"{kwargs['column_A']}, {kwargs['column_B']}"
    if kwargs.get("column_list"):
        return str(kwargs["column_list"])
    return None


def failed_expectations_text(results: list[dict[str, Any]]) -> str:
    """':x:<type> (<domain>)' per failing expectation (reference:
    SlackRenderer.create_failed_expectations_text)."""
    out = "\n*Failed Expectations*:\n"
    for r in results:
        if r.get("success"):
            continue
        cfg = r.get("expectation_config", {})
        name = cfg.get("expectation_type", "?")
        domain = failed_expectation_domain(name, cfg.get("kwargs", {}))
        out += f":x:{name} ({domain})\n" if domain else f":x:{name}\n"
    return out


def _docs_report_element(docs_link: str) -> dict[str, Any]:
    # reference SlackRenderer._get_report_element: Slack won't render
    # file:// hyperlinks, so those downgrade to copy-paste text
    if "file://" in docs_link:
        text = (
            f"*DataDocs* can be found here: `{docs_link}` \n"
            " (Please copy and paste link into a browser to view)\n"
        )
    else:
        text = f"*DataDocs* can be found here: <{docs_link}|{docs_link}>"
    return {"type": "section", "text": {"type": "mrkdwn", "text": text}}


def render_slack_payload(
    result: dict[str, Any],
    context: dict[str, Any],
    show_failed_expectations: bool = False,
    data_docs_link: str | None = None,
) -> dict[str, Any]:
    """Slack Block Kit message in the reference's shape: one mrkdwn
    summary section (status / suite / data asset / run id / "N of M
    expectations were met"), optional ':x:' failure lines, optional docs
    link section, then divider + context footer. The root-level "text"
    is the abbreviated notification line (reference slack_renderer.py:38,
    106-108)."""
    rep = _report_of(result)
    stats = rep.get("statistics") or {}
    suite = context.get("suite_name") or rep.get("meta", {}).get(
        "expectation_suite_name", "__no_expectation_suite_name__"
    )
    asset = context.get("data_asset_name", "__no_data_asset_name__")
    run_id = result.get("run_id", "__no_run_id__")
    ok = bool(result.get("success"))
    status = "Success :tada:" if ok else "Failed :x:"
    n = stats.get("evaluated_expectations", 0)
    n_ok = stats.get("successful_expectations", 0)
    summary = f"*Batch Validation Status*: {status}"
    summary += (
        f"\n*Expectation suite name*: `{suite}`"
        f"\n*Data asset name*: `{asset}`"
        f"\n*Run ID*: `{run_id}`"
        f"\n*Summary*: *{n_ok}* of *{n}* expectations were met"
    )
    if not ok and show_failed_expectations:
        summary += failed_expectations_text(rep.get("results") or [])
    blocks: list[dict[str, Any]] = [
        {"type": "section", "text": {"type": "mrkdwn", "text": summary}}
    ]
    if data_docs_link:
        blocks.append(_docs_report_element(data_docs_link))
    blocks.append({"type": "divider"})
    blocks.append(
        {
            "type": "context",
            "elements": [{"type": "mrkdwn", "text": _DOCS_FOOTER}],
        }
    )
    return {"blocks": blocks, "text": f"{suite}: {status}"}


def _teams_kv(key: str, value: Any) -> dict[str, Any]:
    # reference MicrosoftTeamsRenderer._render_validation_result_element
    return {
        "type": "TextBlock",
        "text": f"**{key}:** {value}",
        "horizontalAlignment": "left",
    }


def render_teams_payload(
    result: dict[str, Any],
    context: dict[str, Any],
    data_docs_link: str | None = None,
) -> dict[str, Any]:
    """Microsoft Teams AdaptiveCard in the reference's shape: a title
    container, a body container of '**key:** value' TextBlocks (status /
    data asset / suite / run id / summary), and an Action.OpenUrl for the
    docs site (reference microsoft_teams_renderer.py:18-205)."""
    rep = _report_of(result)
    stats = rep.get("statistics") or {}
    suite = context.get("suite_name") or rep.get("meta", {}).get(
        "expectation_suite_name", "__no_expectation_suite_name__"
    )
    ok = bool(result.get("success"))
    status = "Success !!!" if ok else "Failed :("
    n = stats.get("evaluated_expectations", 0)
    n_ok = stats.get("successful_expectations", 0)
    elements = [
        _teams_kv("Batch validation status", status),
        _teams_kv("Data asset name", context.get("data_asset_name", "__no_data_asset_name__")),
        _teams_kv("Expectation suite name", suite),
        _teams_kv("Run ID", result.get("run_id", "__no_run_id__")),
        _teams_kv("Summary", f"*{n_ok}* of *{n}* expectations were met"),
    ]
    actions: list[dict[str, Any]] = []
    if data_docs_link:
        actions.append(
            {
                "type": "Action.OpenUrl",
                "title": "Open data docs",
                "url": data_docs_link,
            }
        )
    return {
        "type": "message",
        "attachments": [
            {
                "contentType": "application/vnd.microsoft.card.adaptive",
                "content": {
                    "$schema": TEAMS_SCHEMA_URL,
                    "type": "AdaptiveCard",
                    "version": "1.0",
                    "body": [
                        {
                            "type": "Container",
                            "height": "auto",
                            "separator": "true",
                            "items": [
                                {
                                    "type": "ColumnSet",
                                    "columns": [
                                        {
                                            "type": "Column",
                                            "width": "stretch",
                                            "items": [
                                                {
                                                    "type": "TextBlock",
                                                    "text": "Validation results",
                                                    "weight": "bolder",
                                                    "size": "large",
                                                    "wrap": "true",
                                                }
                                            ],
                                        }
                                    ],
                                }
                            ],
                        },
                        {
                            "type": "Container",
                            "height": "auto",
                            "separator": "true",
                            "items": elements,
                        },
                    ],
                    "actions": actions,
                },
            }
        ],
    }


def render_pagerduty_event(
    result: dict[str, Any],
    context: dict[str, Any],
    routing_key: str,
    severity: str = "critical",
) -> dict[str, Any]:
    """PagerDuty Events API v2 body, the reference's exact shape
    (checkpoint/actions.py:405-418: routing_key, dedup_key = suite name —
    so repeated failures of one suite collapse into one incident —
    event_action trigger, payload summary/severity/source)."""
    suite = context.get("suite_name") or _report_of(result).get("meta", {}).get(
        "expectation_suite_name", "__no_expectation_suite_name__"
    )
    verdict = "succeeded" if result.get("success") else "failed"
    return {
        "routing_key": routing_key,
        "dedup_key": suite,
        "event_action": "trigger",
        "payload": {
            "summary": f"Validation suite check {suite} has {verdict}",
            "severity": severity,
            "source": "sparkcheck",
        },
    }


def render_opsgenie_alert(
    result: dict[str, Any],
    context: dict[str, Any],
    priority: str = "P3",
    tags: list[str] | None = None,
) -> dict[str, Any]:
    """Opsgenie v2 alert body, the reference's exact shape
    (checkpoint/util.py:71-101: message names the suite + verdict,
    description carries the rendered summary, priority/tags pass
    through)."""
    suite = context.get("suite_name") or _report_of(result).get("meta", {}).get(
        "expectation_suite_name", "__no_expectation_suite_name__"
    )
    verdict = "succeeded" if result.get("success") else "failed"
    rep = _report_of(result)
    stats = rep.get("statistics") or {}
    lines = [
        f"Suite: {suite}",
        f"Run id: {result.get('run_id')}",
        f"Status: {verdict}",
        f"Expectations evaluated: {stats.get('evaluated_expectations', 0)}",
        f"Expectations failed: {stats.get('unsuccessful_expectations', 0)}",
    ]
    # only when something actually failed — failed_expectations_text always
    # emits its header line, so gate on the results, not the string
    if any(not r.get("success") for r in rep.get("results") or []):
        lines.append(failed_expectations_text(rep.get("results") or []))
    return {
        "message": f"Validation suite {suite} {verdict}",
        "description": "\n".join(lines),
        "priority": priority,
        "tags": list(tags or []),
    }
