"""Checkpoint actions: notify_on routing, file alerts, webhooks, data-docs
refresh, and run_checkpoint integration."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from sparkcheck.actions import (
    FileAlertAction,
    UpdateDataDocsAction,
    ValidationAction,
    WebhookAction,
    action_from_config,
    register_action,
    run_actions,
)


def _result(success: bool, failed=()):
    return {
        "run_id": "r1",
        "success": success,
        "result": {
            "results": [
                {"success": False,
                 "expectation_config": {"expectation_type": t}}
                for t in failed
            ],
            "statistics": {
                "evaluated_expectations": 3,
                "unsuccessful_expectations": len(failed),
            },
        },
    }


CTX = {"suite_name": "s1", "spark": None, "store": None}


# --- notify_on routing -------------------------------------------------------


def test_notify_on_routing(tmp_path):
    p = str(tmp_path / "alerts.jsonl")
    fail_only = FileAlertAction(p, notify_on="failure")
    assert fail_only.run(_result(True), CTX)["status"] == "skipped"
    assert fail_only.run(_result(False), CTX)["status"] == "ok"
    ok_only = FileAlertAction(p, notify_on="success")
    assert ok_only.run(_result(False), CTX)["status"] == "skipped"
    assert ok_only.run(_result(True), CTX)["status"] == "ok"
    both = FileAlertAction(p, notify_on="all")
    assert both.run(_result(True), CTX)["status"] == "ok"
    assert both.run(_result(False), CTX)["status"] == "ok"
    # 4 triggered runs -> 4 alert lines
    assert len(open(p).read().splitlines()) == 4


def test_bad_notify_on_rejected():
    with pytest.raises(ValueError, match="notify_on"):
        FileAlertAction("/tmp/x", notify_on="sometimes")


# --- file alert payload ------------------------------------------------------


def test_file_alert_payload(tmp_path):
    p = str(tmp_path / "a.jsonl")
    act = FileAlertAction(p, notify_on="failure")
    out = act.run(_result(False, failed=["expect_column_values_to_not_be_null"]), CTX)
    assert out == {"status": "ok", "path": p}
    rec = json.loads(open(p).read())
    assert rec["run_id"] == "r1" and rec["suite"] == "s1"
    assert rec["success"] is False and rec["failed"] == 1
    assert rec["failed_expectations"] == ["expect_column_values_to_not_be_null"]


# --- webhook -----------------------------------------------------------------


class _Recorder(BaseHTTPRequestHandler):
    bodies: list[dict] = []

    def do_POST(self):
        n = int(self.headers["Content-Length"])
        _Recorder.bodies.append(json.loads(self.rfile.read(n)))
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def http_server():
    _Recorder.bodies = []
    srv = HTTPServer(("127.0.0.1", 0), _Recorder)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/hook"
    srv.shutdown()


def test_webhook_posts_summary(http_server):
    act = WebhookAction(http_server, notify_on="failure")
    out = act.run(_result(False, failed=["expect_a", "expect_b"]), CTX)
    assert out == {"status": "ok", "http_status": 200}
    [body] = _Recorder.bodies
    assert body["suite"] == "s1" and body["failed"] == 2
    assert body["failed_expectations"] == ["expect_a", "expect_b"]


def test_webhook_slack_format(http_server):
    act = WebhookAction(http_server, notify_on="all", slack_format=True)
    act.run(_result(False, failed=["expect_a"]), CTX)
    [body] = _Recorder.bodies
    assert set(body) == {"text"}
    assert "FAILED" in body["text"] and "expect_a" in body["text"]


def test_webhook_error_captured_not_raised():
    # unroutable port: the dead pager must not fail the validation
    act = WebhookAction("http://127.0.0.1:1/hook", notify_on="all", timeout=0.5)
    out = act.run(_result(False), CTX)
    assert out["status"] == "error"
    assert "error" in out


# --- config + registry -------------------------------------------------------


def test_action_from_config_and_unknown_type():
    act = action_from_config(
        {"type": "file_alert", "path": "/tmp/x", "notify_on": "all"}
    )
    assert isinstance(act, FileAlertAction)
    with pytest.raises(ValueError, match="unknown action type"):
        action_from_config({"type": "carrier_pigeon"})


def test_register_custom_action(tmp_path):
    calls = []

    class Custom(ValidationAction):
        name = "custom"

        def _run(self, result, context):
            calls.append(result["run_id"])
            return {}

    register_action("custom", Custom)
    out = run_actions([{"type": "custom", "notify_on": "all"}], _result(True), CTX)
    assert out["custom"]["status"] == "ok" and calls == ["r1"]


def test_run_actions_order_and_dedup_names(tmp_path):
    p1, p2 = str(tmp_path / "a.jsonl"), str(tmp_path / "b.jsonl")
    out = run_actions(
        [FileAlertAction(p1, notify_on="all"), FileAlertAction(p2, notify_on="all")],
        _result(True),
        CTX,
    )
    assert list(out) == ["file_alert", "file_alert_1"]
    assert out["file_alert"]["path"] == p1
    assert out["file_alert_1"]["path"] == p2


# --- run_checkpoint integration ---------------------------------------------


def test_checkpoint_actions_failure_routing(spark, tmp_path, documents):
    from sparkcheck.checkpoint import run_checkpoint

    alert_path = str(tmp_path / "alerts.jsonl")
    base = {
        "batch": {"path": "/root/testdata/sf0.001/documents.parquet"},
        "store": str(tmp_path / "store"),
        "actions": [
            {"type": "file_alert", "path": alert_path, "notify_on": "failure"},
            {"type": "update_data_docs", "site_dir": str(tmp_path / "site")},
        ],
    }
    ok_suite = {
        "expectation_suite_name": "ok",
        "expectations": [
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "doc_id", "mostly": 0.9}},
        ],
    }
    res = run_checkpoint(spark, {**base, "suite": ok_suite, "run_id": "okrun"})
    assert res["success"] is True
    assert res["actions"]["file_alert"]["status"] == "skipped"
    assert res["actions"]["update_data_docs"]["status"] == "ok"
    assert not (tmp_path / "alerts.jsonl").exists()
    assert (tmp_path / "site" / "index.html").exists()

    bad_suite = {
        "expectation_suite_name": "bad",
        "expectations": [
            {"expectation_type": "expect_column_values_to_be_null",
             "kwargs": {"column": "doc_id"}},
        ],
    }
    res2 = run_checkpoint(spark, {**base, "suite": bad_suite, "run_id": "badrun"})
    assert res2["success"] is False
    assert res2["actions"]["file_alert"]["status"] == "ok"
    rec = json.loads(open(alert_path).read())
    assert rec["run_id"] == "badrun" and rec["suite"] == "bad"
    assert rec["failed_expectations"] == ["expect_column_values_to_be_null"]


# --- email action against an in-process SMTP sink ---------------------------


class _SmtpSink:
    """Minimal single-connection SMTP server: speaks just enough of the
    protocol for smtplib (220 greeting, 250s, 354 for DATA) and records
    the submitted message. Offline stand-in for a relay."""

    def __init__(self):
        import socket

        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.mail_from = None
        self.rcpt_to = []
        self.data = b""

    def serve_one(self):
        conn, _ = self.sock.accept()
        f = conn.makefile("rb")
        conn.sendall(b"220 sink ESMTP\r\n")
        in_data = False
        body = []
        while True:
            line = f.readline()
            if not line:
                break
            if in_data:
                if line.rstrip(b"\r\n") == b".":
                    self.data = b"".join(body)
                    conn.sendall(b"250 ok\r\n")
                    in_data = False
                else:
                    body.append(line)
                continue
            cmd = line.strip().upper()
            if cmd.startswith((b"EHLO", b"HELO")):
                conn.sendall(b"250 sink\r\n")
            elif cmd.startswith(b"MAIL FROM"):
                self.mail_from = line.split(b":", 1)[1].strip()
                conn.sendall(b"250 ok\r\n")
            elif cmd.startswith(b"RCPT TO"):
                self.rcpt_to.append(line.split(b":", 1)[1].strip())
                conn.sendall(b"250 ok\r\n")
            elif cmd.startswith(b"DATA"):
                conn.sendall(b"354 go\r\n")
                in_data = True
            elif cmd.startswith(b"QUIT"):
                conn.sendall(b"221 bye\r\n")
                break
            else:
                conn.sendall(b"250 ok\r\n")
        conn.close()
        self.sock.close()


def test_email_action_sends_over_smtp():
    import threading

    from sparkcheck.actions import EmailAction

    sink = _SmtpSink()
    t = threading.Thread(target=sink.serve_one, daemon=True)
    t.start()

    act = EmailAction(
        smtp_host="127.0.0.1", smtp_port=sink.port,
        receivers=["oncall@example.com", "team@example.com"],
        sender="ge@example.com", notify_on="failure",
    )
    result = {
        "success": False, "run_id": "r9",
        "result": {"results": [
            {"success": False, "expectation_config":
             {"expectation_type": "expect_column_values_to_not_be_null"}},
        ], "statistics": {"evaluated_expectations": 1,
                          "unsuccessful_expectations": 1}},
    }
    out = act.run(result, {"suite_name": "s"})
    t.join(timeout=10)
    assert out["status"] == "ok"
    assert out["receivers"] == ["oncall@example.com", "team@example.com"]
    assert b"ge@example.com" in sink.mail_from
    assert len(sink.rcpt_to) == 2
    assert b"validation FAILED" in sink.data
    assert b"expect_column_values_to_not_be_null" in sink.data


def test_email_action_gates_and_validates():
    import pytest

    from sparkcheck.actions import EmailAction

    with pytest.raises(ValueError, match="receiver"):
        EmailAction(smtp_host="x", receivers=[])
    act = EmailAction(smtp_host="127.0.0.1", smtp_port=1,
                      receivers=["a@b"], notify_on="failure")
    # success + notify_on=failure: gate skips before any socket is opened
    out = act.run({"success": True, "result": {}}, {})
    assert out["status"] == "skipped"
    # triggered but unreachable relay: error captured, never raised
    out = act.run({"success": False, "result": {}}, {})
    assert out["status"] == "error"


# --- round-5: channel renderers + metrics routing ----------------------------


def _rich_result(success=False):
    return {
        "run_id": "run-2024-01-02",
        "success": success,
        "result": {
            "meta": {"expectation_suite_name": "docs_suite"},
            "results": [
                {"success": True,
                 "expectation_config": {
                     "expectation_type": "expect_table_row_count_to_be_between",
                     "kwargs": {"min_value": 1}},
                 "result": {"observed_value": 3000}},
                {"success": True,
                 "expectation_config": {
                     "expectation_type": "expect_column_mean_to_be_between",
                     "kwargs": {"column": "n_chars"}},
                 "result": {"observed_value": 297.5}},
                {"success": success,
                 "expectation_config": {
                     "expectation_type": "expect_column_values_to_not_be_null",
                     "kwargs": {"column": "doc_id"}},
                 "result": {"observed_value": None, "unexpected_count": 7}},
            ],
            "statistics": {
                "evaluated_expectations": 3,
                "successful_expectations": 2 + int(success),
                "unsuccessful_expectations": 1 - int(success),
            },
        },
    }


def test_slack_payload_matches_reference_fixture():
    import pathlib

    from sparkcheck.notify import render_slack_payload

    got = render_slack_payload(
        _rich_result(False),
        {"suite_name": "docs_suite", "data_asset_name": "documents"},
        show_failed_expectations=True,
        data_docs_link="file:///srv/docs/index.html",
    )
    fixture = json.loads(
        (pathlib.Path(__file__).parent / "fixtures" / "ref_slack_message.json")
        .read_text()
    )
    assert got == fixture


def test_teams_payload_matches_reference_fixture():
    import pathlib

    from sparkcheck.notify import render_teams_payload

    got = render_teams_payload(
        _rich_result(False),
        {"suite_name": "docs_suite", "data_asset_name": "documents"},
        data_docs_link="https://docs.example/site/index.html",
    )
    fixture = json.loads(
        (pathlib.Path(__file__).parent / "fixtures" / "ref_teams_card.json")
        .read_text()
    )
    assert got == fixture


def test_slack_success_and_domain_lines():
    from sparkcheck.notify import (
        failed_expectation_domain,
        render_slack_payload,
    )

    ok = render_slack_payload(_rich_result(True), {"suite_name": "s"})
    assert ok["text"] == "s: Success :tada:"
    assert "Failed Expectations" not in ok["blocks"][0]["text"]["text"]
    # reference domain extraction rules
    assert failed_expectation_domain("expect_table_row_count_to_be_between", {}) == "Table"
    assert failed_expectation_domain("expect_x", {"column": "c"}) == "c"
    assert failed_expectation_domain(
        "expect_x", {"column_A": "a", "column_B": "b"}) == "a, b"
    assert failed_expectation_domain("expect_x", {"column_list": ["a", "b"]}) == "['a', 'b']"
    assert failed_expectation_domain("expect_x", {}) is None


def test_slack_and_teams_actions_post(http_server):
    from sparkcheck.actions import SlackNotificationAction, TeamsNotificationAction

    slack = SlackNotificationAction(http_server, notify_on="failure")
    out = slack.run(_rich_result(False), {"suite_name": "s"})
    assert out == {"status": "ok", "http_status": 200}
    teams = TeamsNotificationAction(http_server, notify_on="all")
    out = teams.run(_rich_result(True), {"suite_name": "s"})
    assert out == {"status": "ok", "http_status": 200}
    slack_body, teams_body = _Recorder.bodies
    assert set(slack_body) == {"blocks", "text"}
    assert teams_body["attachments"][0]["content"]["type"] == "AdaptiveCard"


def test_store_metrics_action_routes_into_store(spark, tmp_path):
    from sparkcheck.actions import StoreMetricsAction
    from sparkcheck.history import metric_history
    from sparkcheck.runner import ParquetStore

    store = ParquetStore(str(tmp_path / "mstore"))
    act = StoreMetricsAction({
        "*": ["statistics.evaluated_expectations",
              "expect_column_mean_to_be_between.result.observed_value"],
        "other_suite": ["statistics.successful_expectations"],  # no match
    })
    out = act.run(
        _rich_result(False),
        {"suite_name": "docs_suite", "store": store, "spark": spark},
    )
    assert out["status"] == "ok" and out["metrics_written"] == 2
    rows = {r["metric"]: r for r in store.read(spark, "metrics").collect()}
    assert rows["statistics.evaluated_expectations"]["value"] == 3.0
    m = rows["expect_column_mean_to_be_between.result.observed_value"]
    assert m["value"] == 297.5 and m["column"] == "n_chars"
    assert m["run_id"] == "run-2024-01-02" and m["suite"] == "docs_suite"


def test_pagerduty_action_reference_event_shape(http_server):
    from sparkcheck.actions import PagerdutyAlertAction

    act = PagerdutyAlertAction("rk-123", notify_on="failure", url=http_server)
    out = act.run(_rich_result(False), {"suite_name": "docs_suite"})
    assert out == {"status": "ok", "http_status": 200}
    [body] = _Recorder.bodies
    # the reference's Events API v2 body (checkpoint/actions.py:405-418)
    assert body["routing_key"] == "rk-123"
    assert body["dedup_key"] == "docs_suite"  # suite-keyed incident dedup
    assert body["event_action"] == "trigger"
    assert body["payload"]["severity"] == "critical"
    assert "docs_suite has failed" in body["payload"]["summary"]
    # notify_on=failure: a green run sends nothing
    assert act.run(_rich_result(True), {"suite_name": "s"})["status"] == "skipped"
    with pytest.raises(ValueError):
        PagerdutyAlertAction("")


def test_opsgenie_action_reference_alert_shape(http_server):
    from sparkcheck.actions import OpsgenieAlertAction

    act = OpsgenieAlertAction(
        "gk-1", url=http_server, priority="P1", tags=["etl", "nightly"]
    )
    out = act.run(_rich_result(False), {"suite_name": "docs_suite"})
    assert out == {"status": "ok", "http_status": 200}
    [body] = _Recorder.bodies
    # the reference's alert body (checkpoint/util.py:79-84)
    assert body["message"] == "Validation suite docs_suite failed"
    assert body["priority"] == "P1" and body["tags"] == ["etl", "nightly"]
    assert "Expectations failed: 1" in body["description"]
    # region picks the EU host exactly like the reference
    eu = OpsgenieAlertAction("gk-1", region="eu")
    assert eu.url == "https://api.eu.opsgenie.com/v2/alerts"
    # a success alert must not carry a dangling empty failures header
    ok = OpsgenieAlertAction("gk-1", url=http_server, notify_on="all")
    ok.run(_rich_result(True), {"suite_name": "docs_suite"})
    body = _Recorder.bodies[-1]
    assert "succeeded" in body["message"]
    assert "Failed Expectations" not in body["description"]


def test_sns_action_reference_publish_kwargs():
    from sparkcheck.actions import SNSNotificationAction

    calls = []

    def fake_publish(**kw):
        calls.append(kw)
        return {"MessageId": "m-1"}

    act = SNSNotificationAction(
        "arn:aws:sns:us-east-1:1:t", publish_fn=fake_publish
    )
    out = act.run(_rich_result(False), {"suite_name": "docs_suite"})
    assert out == {"status": "ok", "message_id": "m-1"}
    [kw] = calls
    # the reference's publish kwargs (checkpoint/util.py:508-516); subject
    # defaults to the suite name
    assert kw["TopicArn"] == "arn:aws:sns:us-east-1:1:t"
    assert kw["Subject"] == "docs_suite"
    assert kw["MessageAttributes"]["String"]["DataType"] == "String.Array"
    assert json.loads(kw["Message"])["run_id"] == "run-2024-01-02"
    # explicit subject wins
    act2 = SNSNotificationAction(
        "arn:x", sns_message_subject="custom", publish_fn=fake_publish
    )
    act2.run(_rich_result(True), {"suite_name": "s"})
    assert calls[-1]["Subject"] == "custom"
    # config-addressable
    a = action_from_config(
        {"type": "sns", "sns_topic_arn": "arn:x", "publish_fn": fake_publish}
    )
    assert a.run(_rich_result(False), {"suite_name": "s"})["status"] == "ok"


def test_store_evaluation_parameters_action_feeds_urns(spark, tmp_path):
    """The action routes the run's EVRs into the evaluation-parameter
    store, and a later suite's URN reference resolves against them —
    the reference's StoreEvaluationParametersAction contract."""
    from sparkcheck.actions import StoreEvaluationParametersAction
    from sparkcheck.runner import ParquetStore, resolve_validation_urn

    store = ParquetStore(str(tmp_path / "epstore"))
    act = StoreEvaluationParametersAction()
    out = act.run(
        _rich_result(False),
        {"suite_name": "docs_suite", "store": store, "spark": spark},
    )
    assert out == {"status": "ok", "evrs_written": 3}
    v = resolve_validation_urn(
        store, spark,
        "urn:great_expectations:validations:docs_suite:"
        "expect_table_row_count_to_be_between.result.observed_value",
    )
    assert v == 3000
    # config-addressable + notify_on gating like every other action
    gated = action_from_config(
        {"type": "store_evaluation_parameters", "notify_on": "failure"}
    )
    out = gated.run(
        _rich_result(True),
        {"suite_name": "docs_suite", "store": store, "spark": spark},
    )
    assert out["status"] == "skipped"
    out = StoreEvaluationParametersAction().run(_rich_result(False), {})
    assert out["status"] == "error" and "store" in out["error"]


def test_store_metrics_requires_store_and_config():
    from sparkcheck.actions import StoreMetricsAction

    with pytest.raises(ValueError):
        StoreMetricsAction({})
    act = StoreMetricsAction({"*": ["statistics.evaluated_expectations"]})
    out = act.run(_rich_result(False), {"suite_name": "s"})
    assert out["status"] == "error" and "store" in out["error"]


def test_new_actions_config_addressable(http_server):
    from sparkcheck.actions import action_from_config

    a = action_from_config({"type": "slack", "url": http_server,
                            "notify_on": "all",
                            "show_failed_expectations": False})
    assert a.name == "slack" and a.run(_rich_result(True), {})["status"] == "ok"
    b = action_from_config({"type": "teams", "url": http_server})
    assert b.name == "teams"
    c = action_from_config({"type": "store_metrics",
                            "requested_metrics": {"*": ["statistics.success_percent"]}})
    assert c.name == "store_metrics"
