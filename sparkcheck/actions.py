"""Checkpoint actions: the "page someone on failure" half of production
checkpoints.

The reference ships an action list on every Checkpoint — store the result,
update data docs, then notify (Slack / email / OpsGenie / SNS), each action
gated on ``notify_on`` in {"all", "success", "failure"} (reference:
checkpoint/actions.py:826-880 EmailAction.run + SlackNotificationAction).
This module is that contract on this engine, driver-side and dependency
free: actions receive the finished checkpoint result dict (the data plane
is already done — actions never touch the cluster), decide via
``notify_on``, and perform their side effect.

Built-in actions:

  ``FileAlertAction``     append a JSON-line alert to a local/NFS file —
                          the sandbox-safe pager (tail -f it, or point a
                          log shipper at it)
  ``WebhookAction``       POST the summary as JSON to an HTTP endpoint
                          (Slack-compatible with ``slack_format=True``,
                          which wraps it in {"text": ...}); stdlib urllib,
                          no requests dependency
  ``SlackNotificationAction``  the reference-shaped Slack Block Kit
                          message (render/renderer/slack_renderer.py):
                          summary section, ':x:' failure lines, docs
                          link, divider + footer
  ``TeamsNotificationAction``  the reference-shaped Microsoft Teams
                          AdaptiveCard (microsoft_teams_renderer.py)
  ``StoreMetricsAction``  route selected EVR fields / run statistics
                          into the store's ``metrics`` table (reference:
                          StoreMetricsAction); history.py reads them back
  ``UpdateDataDocsAction`` re-render the static data-docs site from the
                          results store after the run (reference:
                          UpdateDataDocsAction)

Wire them through ``run_checkpoint``'s ``actions`` config key::

    {"suite": ..., "batch": ..., "store": ...,
     "actions": [
        {"type": "file_alert", "path": "/var/alerts/ge.jsonl",
         "notify_on": "failure"},
        {"type": "webhook", "url": "https://hooks.example/T/B/x",
         "notify_on": "failure", "slack_format": true},
        {"type": "update_data_docs", "site_dir": "/srv/docs"},
     ]}

Action failures are captured per-action (an unreachable webhook must not
fail the validation that already ran), returned in the checkpoint result
under ``"actions"`` as ``{name: {"status": "ok"|"error"|"skipped", ...}}``.
"""

from __future__ import annotations

import json
import urllib.request
from datetime import datetime, timezone
from typing import Any

NOTIFY_ON = ("all", "success", "failure")


class ValidationAction:
    """Base action. Subclasses implement ``_run(result, context)`` and are
    invoked only when ``notify_on`` matches the run's success flag."""

    name = "action"

    def __init__(self, notify_on: str = "all"):
        if notify_on not in NOTIFY_ON:
            raise ValueError(f"notify_on must be one of {NOTIFY_ON}, got {notify_on!r}")
        self.notify_on = notify_on

    def should_run(self, success: bool) -> bool:
        # reference: EmailAction.run's notify_on gate (checkpoint/actions.py)
        return (
            self.notify_on == "all"
            or (self.notify_on == "success" and success)
            or (self.notify_on == "failure" and not success)
        )

    def run(self, result: dict[str, Any], context: dict[str, Any]) -> dict[str, Any]:
        if not self.should_run(bool(result.get("success"))):
            return {"status": "skipped", "reason": f"notify_on={self.notify_on}"}
        try:
            out = self._run(result, context) or {}
            return {"status": "ok", **out}
        except Exception as e:  # noqa: BLE001 — a dead pager must not fail the run
            return {"status": "error", "error": f"{type(e).__name__}: {e}"}

    def _run(self, result: dict[str, Any], context: dict[str, Any]) -> dict[str, Any]:
        raise NotImplementedError

    # -- shared payload ------------------------------------------------------

    @staticmethod
    def summary_payload(result: dict[str, Any], context: dict[str, Any]) -> dict[str, Any]:
        """Compact, JSON-safe alert body: who/when/what, failing expectation
        names (not full EVRs — an alert is a pointer, the store is the
        record)."""
        rep = result.get("result") or {}
        results = rep.get("results") or []
        failed = [
            r.get("expectation_config", {}).get("expectation_type", "?")
            for r in results
            if not r.get("success")
        ]
        stats = rep.get("statistics") or {}
        return {
            "run_id": result.get("run_id"),
            "suite": context.get("suite_name"),
            "success": bool(result.get("success")),
            "evaluated": stats.get("evaluated_expectations", len(results)),
            "failed": stats.get("unsuccessful_expectations", len(failed)),
            "failed_expectations": failed[:20],
            "ts": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        }


class FileAlertAction(ValidationAction):
    """Append one JSON line per triggered run to ``path`` — the simplest
    durable pager; atomic enough under POSIX O_APPEND for line-sized
    writes."""

    name = "file_alert"

    def __init__(self, path: str, notify_on: str = "failure"):
        super().__init__(notify_on)
        self.path = path

    def _run(self, result, context):
        line = json.dumps(self.summary_payload(result, context), default=str)
        with open(self.path, "a") as f:
            f.write(line + "\n")
        return {"path": self.path}


class WebhookAction(ValidationAction):
    """POST the summary payload to ``url``. ``slack_format=True`` sends a
    Slack-incoming-webhook body ``{"text": "<one-line summary>"}`` instead
    of the raw JSON (reference: SlackNotificationAction renders blocks; one
    line carries the same signal)."""

    name = "webhook"

    def __init__(
        self,
        url: str,
        notify_on: str = "failure",
        slack_format: bool = False,
        timeout: float = 5.0,
    ):
        super().__init__(notify_on)
        self.url = url
        self.slack_format = slack_format
        self.timeout = timeout

    def _post_json(
        self, body: dict[str, Any], extra_headers: dict[str, str] | None = None
    ) -> dict[str, Any]:
        """Shared transport for every HTTP-shaped action: one place for
        the request construction, timeout, and outcome shape."""
        headers = {"Content-Type": "application/json"}
        if extra_headers:
            headers.update(extra_headers)
        req = urllib.request.Request(
            self.url,
            data=json.dumps(body, default=str).encode(),
            headers=headers,
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return {"http_status": resp.status}

    def _run(self, result, context):
        payload = self.summary_payload(result, context)
        if self.slack_format:
            verdict = "passed" if payload["success"] else "FAILED"
            body: dict[str, Any] = {
                "text": (
                    f"Validation {verdict}: suite={payload['suite']} "
                    f"run={payload['run_id']} "
                    f"({payload['failed']}/{payload['evaluated']} failing"
                    + (f": {', '.join(payload['failed_expectations'])}" if payload["failed_expectations"] else "")
                    + ")"
                )
            }
        else:
            body = payload
        return self._post_json(body)


class EmailAction(ValidationAction):
    """Send the summary as a plain-text email over SMTP (reference:
    EmailAction, checkpoint/actions.py:826-880 — same knob set: smtp
    address/port, TLS/SSL, credentials, receiver list, notify_on gate).
    stdlib smtplib only; the message body is the JSON summary payload
    pretty-printed, the subject carries the verdict."""

    name = "email"

    def __init__(
        self,
        smtp_host: str,
        receivers: list[str],
        sender: str = "sparkcheck@localhost",
        smtp_port: int = 25,
        subject_prefix: str = "[sparkcheck]",
        notify_on: str = "failure",
        use_tls: bool = False,
        use_ssl: bool = False,
        smtp_user: str | None = None,
        smtp_password: str | None = None,
        timeout: float = 10.0,
    ):
        super().__init__(notify_on)
        if not receivers:
            raise ValueError("email action needs at least one receiver")
        self.smtp_host = smtp_host
        self.smtp_port = smtp_port
        self.sender = sender
        self.receivers = list(receivers)
        self.subject_prefix = subject_prefix
        self.use_tls = use_tls
        self.use_ssl = use_ssl
        self.smtp_user = smtp_user
        self.smtp_password = smtp_password
        self.timeout = timeout

    def _run(self, result, context):
        import smtplib
        from email.message import EmailMessage

        payload = self.summary_payload(result, context)
        verdict = "passed" if payload["success"] else "FAILED"
        msg = EmailMessage()
        msg["Subject"] = (
            f"{self.subject_prefix} validation {verdict}: "
            f"suite={payload['suite']} run={payload['run_id']}"
        )
        msg["From"] = self.sender
        msg["To"] = ", ".join(self.receivers)
        msg.set_content(json.dumps(payload, indent=2, default=str))

        cls = smtplib.SMTP_SSL if self.use_ssl else smtplib.SMTP
        with cls(self.smtp_host, self.smtp_port, timeout=self.timeout) as s:
            if self.use_tls and not self.use_ssl:
                s.starttls()
            if self.smtp_user:
                s.login(self.smtp_user, self.smtp_password or "")
            s.send_message(msg)
        return {"receivers": self.receivers}


class SlackNotificationAction(WebhookAction):
    """POST the reference-shaped Slack Block Kit message to an incoming
    webhook (reference: SlackNotificationAction + SlackRenderer,
    checkpoint/actions.py:166-320 + render/renderer/slack_renderer.py).
    Unlike the generic WebhookAction's one-line text, this sends the full
    block layout: status/suite/run-id summary section, optional per-failure
    ':x:' lines, optional data-docs link, divider + context footer."""

    name = "slack"

    def __init__(
        self,
        url: str,
        notify_on: str = "failure",
        show_failed_expectations: bool = True,
        data_docs_link: str | None = None,
        timeout: float = 5.0,
    ):
        super().__init__(url, notify_on=notify_on, timeout=timeout)
        self.show_failed_expectations = show_failed_expectations
        self.data_docs_link = data_docs_link

    def _run(self, result, context):
        from .notify import render_slack_payload

        body = render_slack_payload(
            result,
            context,
            show_failed_expectations=self.show_failed_expectations,
            data_docs_link=self.data_docs_link,
        )
        return self._post_json(body)


class TeamsNotificationAction(WebhookAction):
    """POST the reference-shaped Microsoft Teams AdaptiveCard to a Teams
    webhook (reference: MicrosoftTeamsNotificationAction +
    MicrosoftTeamsRenderer, render/renderer/microsoft_teams_renderer.py)."""

    name = "teams"

    def __init__(
        self,
        url: str,
        notify_on: str = "failure",
        data_docs_link: str | None = None,
        timeout: float = 5.0,
    ):
        super().__init__(url, notify_on=notify_on, timeout=timeout)
        self.data_docs_link = data_docs_link

    def _run(self, result, context):
        from .notify import render_teams_payload

        body = render_teams_payload(
            result, context, data_docs_link=self.data_docs_link
        )
        return self._post_json(body)


class PagerdutyAlertAction(WebhookAction):
    """POST a PagerDuty Events-API-v2 event (reference:
    PagerdutyAlertAction, checkpoint/actions.py:330-421 — there via pypd;
    here the documented v2 enqueue endpoint directly, same body:
    dedup_key = suite name so repeated failures of one suite collapse
    into one incident). ``url`` overrides the public endpoint for tests
    or EU routing."""

    name = "pagerduty"

    def __init__(
        self,
        routing_key: str,
        notify_on: str = "failure",
        severity: str = "critical",
        url: str = "https://events.pagerduty.com/v2/enqueue",
        timeout: float = 5.0,
    ):
        super().__init__(url, notify_on=notify_on, timeout=timeout)
        if not routing_key:
            raise ValueError("pagerduty needs a routing_key")
        self.routing_key = routing_key
        self.severity = severity

    def _run(self, result, context):
        from .notify import render_pagerduty_event

        body = render_pagerduty_event(
            result, context, self.routing_key, severity=self.severity
        )
        return self._post_json(body)


class OpsgenieAlertAction(WebhookAction):
    """POST an Opsgenie v2 alert (reference: OpsgenieAlertAction +
    send_opsgenie_alert, checkpoint/actions.py:542-660 +
    checkpoint/util.py:71-101 — same body and GenieKey auth header;
    ``region`` picks the EU host exactly as the reference does)."""

    name = "opsgenie"

    def __init__(
        self,
        api_key: str,
        notify_on: str = "failure",
        priority: str = "P3",
        tags: list[str] | None = None,
        region: str | None = None,
        url: str | None = None,
        timeout: float = 5.0,
    ):
        if url is None:
            host = f"api.{region}.opsgenie.com" if region else "api.opsgenie.com"
            url = f"https://{host}/v2/alerts"
        super().__init__(url, notify_on=notify_on, timeout=timeout)
        if not api_key:
            raise ValueError("opsgenie needs an api_key")
        self.api_key = api_key
        self.priority = priority
        self.tags = list(tags or [])

    def _run(self, result, context):
        from .notify import render_opsgenie_alert

        body = render_opsgenie_alert(
            result, context, priority=self.priority, tags=self.tags
        )
        return self._post_json(
            body, extra_headers={"Authorization": f"GenieKey {self.api_key}"}
        )


class SNSNotificationAction(ValidationAction):
    """Publish the summary payload to an AWS SNS topic (reference:
    SNSNotificationAction + send_sns_notification,
    checkpoint/actions.py:1166-1230 + checkpoint/util.py:490-520 — same
    publish kwargs: TopicArn, Subject defaulting to the suite name,
    JSON message). boto3 is import-gated at construction; ``publish_fn``
    injects the transport for tests (called with the publish kwargs)."""

    name = "sns"

    def __init__(
        self,
        sns_topic_arn: str,
        sns_message_subject: str | None = None,
        notify_on: str = "all",
        publish_fn=None,
    ):
        super().__init__(notify_on)
        if not sns_topic_arn:
            raise ValueError("sns needs a topic arn")
        self.sns_topic_arn = sns_topic_arn
        self.sns_message_subject = sns_message_subject
        if publish_fn is None:
            try:
                import boto3  # noqa: PLC0415

                self._boto3 = boto3
            except ImportError as e:  # pragma: no cover
                raise ImportError("SNSNotificationAction requires boto3") from e
            publish_fn = self._boto3_publish
        self.publish_fn = publish_fn

    def _boto3_publish(self, **kwargs):  # pragma: no cover — needs AWS creds
        return self._boto3.client("sns").publish(**kwargs)

    def _run(self, result, context):
        subject = self.sns_message_subject or context.get("suite_name") or "sparkcheck"
        payload = self.summary_payload(result, context)
        out = self.publish_fn(
            TopicArn=self.sns_topic_arn,
            Subject=str(subject),
            Message=json.dumps(payload, default=str),
            MessageAttributes={
                "String": {
                    "DataType": "String.Array",
                    "StringValue": "ValidationResults",
                },
            },
        )
        return {"message_id": (out or {}).get("MessageId")}


class StoreMetricsAction(ValidationAction):
    """Persist selected metrics from the run into the store's ``metrics``
    table (reference: StoreMetricsAction, checkpoint/actions.py:911-1066 —
    requested_metrics routes chosen EVR fields into a MetricsStore; here
    the target is the checkpoint's ParquetStore and history.py serves the
    time-series reads).

    ``requested_metrics`` maps a suite name (or ``"*"``) to a list of
    metric descriptors:

      * ``"statistics.<field>"`` — a run-level statistic
        (evaluated_expectations, success_percent, ...)
      * ``"<expectation_type>.result.<path>"`` — a field from every EVR
        of that type (one metrics row per matching EVR, carrying its
        column kwarg so per-column series stay separate)

    Rows: (run_id, suite, metric, column, value double, value_json, ts).
    Non-numeric values keep value NULL and land in value_json whole."""

    name = "store_metrics"

    def __init__(
        self,
        requested_metrics: dict[str, list[str]],
        notify_on: str = "all",
    ):
        super().__init__(notify_on)
        if not requested_metrics:
            raise ValueError("store_metrics needs a requested_metrics map")
        self.requested_metrics = dict(requested_metrics)

    @staticmethod
    def _dig(node: Any, path: list[str]) -> Any:
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
        return node

    def _rows(self, result, context) -> list[tuple]:
        rep = result.get("result") or {}
        suite = context.get("suite_name") or rep.get("meta", {}).get(
            "expectation_suite_name", "?"
        )
        wanted: list[str] = []
        for pat, metrics in self.requested_metrics.items():
            if pat == "*" or pat == suite:
                wanted.extend(metrics)
        run_id = result.get("run_id")
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        rows: list[tuple] = []
        for m in wanted:
            parts = m.split(".")
            if parts[0] == "statistics":
                v = self._dig(rep.get("statistics") or {}, parts[1:])
                if v is not None:
                    num = float(v) if isinstance(v, (int, float)) else None
                    rows.append(
                        (run_id, suite, m, None, num,
                         json.dumps(v, default=str), now)
                    )
                continue
            etype, path = parts[0], parts[1:]
            for r in rep.get("results") or []:
                cfg = r.get("expectation_config", {})
                if cfg.get("expectation_type") != etype:
                    continue
                v = self._dig(r, path)
                if v is None:
                    continue
                num = float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None
                rows.append(
                    (run_id, suite, m, cfg.get("kwargs", {}).get("column"),
                     num, json.dumps(v, default=str), now)
                )
        return rows

    def _run(self, result, context):
        store, spark = context.get("store"), context.get("spark")
        if store is None or spark is None:
            raise ValueError(
                "store_metrics needs the checkpoint to have a 'store' and "
                "'spark' in its context"
            )
        rows = self._rows(result, context)
        if rows:
            from pyspark.sql.types import StructType

            from .runner import append_control_rows

            schema = StructType.fromDDL(
                "run_id string, suite string, metric string, "
                "column string, value double, value_json string, "
                "ts timestamp"
            )
            append_control_rows(store, spark, "metrics", rows, schema)
        return {"metrics_written": len(rows)}


class StoreEvaluationParametersAction(ValidationAction):
    """Persist the run's EVRs into the evaluation-parameter store so later
    suites can reference them through
    ``urn:great_expectations:validations:<suite>:<metric>`` (reference:
    StoreEvaluationParametersAction, checkpoint/actions.py:911-972 —
    there it forwards to data_context.store_evaluation_parameters; here
    the target is the checkpoint's ParquetStore and
    runner.resolve_validation_urn serves the reads)."""

    name = "store_evaluation_parameters"

    def _run(self, result, context):
        from .runner import store_validation_result

        store, spark = context.get("store"), context.get("spark")
        if store is None or spark is None:
            raise ValueError(
                "store_evaluation_parameters needs the checkpoint to have "
                "a 'store' and 'spark' in its context"
            )
        rep = result.get("result") or {}
        store_validation_result(
            store,
            spark,
            rep,
            suite_name=context.get("suite_name"),
            run_id=str(result.get("run_id") or "adhoc"),
        )
        return {"evrs_written": len(rep.get("results") or [])}


class UpdateDataDocsAction(ValidationAction):
    """Re-render the static data-docs site from the checkpoint's results
    store after the run (reference: UpdateDataDocsAction). Needs the
    checkpoint to have a ``store`` — the site is built from stored EVRs."""

    name = "update_data_docs"

    def __init__(self, site_dir: str, notify_on: str = "all", max_runs: int = 200):
        super().__init__(notify_on)
        self.site_dir = site_dir
        self.max_runs = max_runs

    def _run(self, result, context):
        from .data_docs import build_data_docs

        store, spark = context.get("store"), context.get("spark")
        if store is None:
            raise ValueError("update_data_docs needs the checkpoint to have a 'store'")
        index = build_data_docs(store, spark, self.site_dir, max_runs=self.max_runs)
        return {"index": index}


_ACTION_TYPES: dict[str, type[ValidationAction]] = {
    "file_alert": FileAlertAction,
    "webhook": WebhookAction,
    "slack": SlackNotificationAction,
    "teams": TeamsNotificationAction,
    "pagerduty": PagerdutyAlertAction,
    "opsgenie": OpsgenieAlertAction,
    "sns": SNSNotificationAction,
    "store_metrics": StoreMetricsAction,
    "store_evaluation_parameters": StoreEvaluationParametersAction,
    "email": EmailAction,
    "update_data_docs": UpdateDataDocsAction,
}


def register_action(name: str, cls: type[ValidationAction]) -> None:
    """Extension point: user-defined actions become config-addressable."""
    _ACTION_TYPES[name] = cls


def action_from_config(cfg: dict[str, Any]) -> ValidationAction:
    cfg = dict(cfg)
    kind = cfg.pop("type", None)
    if kind not in _ACTION_TYPES:
        raise ValueError(
            f"unknown action type {kind!r}; known: {sorted(_ACTION_TYPES)}"
        )
    return _ACTION_TYPES[kind](**cfg)


def run_actions(
    actions: list[Any],
    result: dict[str, Any],
    context: dict[str, Any],
) -> dict[str, dict[str, Any]]:
    """Run an action list (configs or instances) against a finished
    checkpoint result; returns ``{action_name: outcome}``. Order is the
    config order, matching the reference's sequential action_list."""
    out: dict[str, dict[str, Any]] = {}
    for i, a in enumerate(actions):
        act = action_from_config(a) if isinstance(a, dict) else a
        key = act.name if act.name not in out else f"{act.name}_{i}"
        out[key] = act.run(result, context)
    return out
