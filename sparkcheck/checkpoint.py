"""Config-driven checkpoints: one dict (or JSON/YAML-shaped file), one call.

The reference's Checkpoint is the unit users actually operate — a named
config tying a batch request to a suite, a results store, and actions
(reference: checkpoint/checkpoint.py Checkpoint.run +
checkpoint/configurator.py). ``run_checkpoint`` is that workflow on this
engine: resolve the batch through ``sources.read_batch``, load the suite,
run either a single ``validate_df`` pass or the partition-checkpointed
``CheckpointRunner`` (resumable, per-partition lineage), store the result,
and optionally render a report — all from one declarative config, so a
scheduled job is `run_checkpoint(spark, json.load(f))` and nothing else.

Config keys:

  suite:        path to a suite JSON file, a JSON string, or a dict
                (ExpectationSuite.from_file / from_json / from_dict)
  batch:        kwargs for sources.read_batch — {"path": ...} or
                {"table": ...} (+ fmt/schema/reader_options/hadoop_conf)
  store:        directory for the results ParquetStore (optional — without
                it the result is returned but not persisted)
  run_id:       optional; generated when absent
  partitioned:  false (default) = one validate_df pass;
                true = CheckpointRunner with per-partition commit/resume
  n_buckets, bucket_col, max_concurrency, suite_violation_rows:
                CheckpointRunner knobs (partitioned=true only)
  result_format, evaluation_parameters: validate_df passthrough
                (single-pass only — combining either with partitioned=true
                raises, because the partitioned runner validates each
                partition with its own fixed result handling)
  report:       optional path; writes report.to_markdown there (.md) or
                to_html (.html). Partitioned checkpoints get a run-summary
                report (partitions run/skipped, docs validated, wall time)
                instead of the per-expectation report.
  actions:      optional list of action configs (see sparkcheck.actions) —
                file alerts, webhooks, data-docs refresh, each gated on
                notify_on in {"all", "success", "failure"}. Run after the
                result is stored/reported; per-action outcomes land in the
                returned dict under "actions" and never fail the run.
"""

from __future__ import annotations

import json
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .suite import ExpectationSuite


def _load_suite(spec: Any) -> ExpectationSuite:
    if isinstance(spec, ExpectationSuite):
        return spec
    if isinstance(spec, dict):
        return ExpectationSuite.from_json(json.dumps(spec))
    if isinstance(spec, str):
        s = spec.lstrip()
        if s.startswith("{"):
            return ExpectationSuite.from_json(spec)
        return ExpectationSuite.from_file(spec)
    raise TypeError(f"cannot load a suite from {type(spec).__name__}")


def run_checkpoint(
    spark: SparkSession,
    config: dict[str, Any],
    df: DataFrame | None = None,
) -> dict[str, Any]:
    """Execute one checkpoint config. Returns
    ``{"run_id", "success", "result"}`` where ``result`` is the
    validate_df report (single-pass) or the RunReport-derived summary
    (partitioned). Pass ``df`` to override the batch spec with an
    in-memory DataFrame (runtime batch)."""
    from .runner import CheckpointRunner, ParquetStore, store_validation_result
    from .sources import read_batch
    from .validator import validate_df

    suite = _load_suite(config["suite"])
    if df is None:
        batch = dict(config.get("batch") or {})
        if not batch:
            raise ValueError("config needs a 'batch' spec or an explicit df")
        df = read_batch(spark, **batch)
    run_id = config.get("run_id") or uuid.uuid4().hex[:12]
    store = ParquetStore(config["store"]) if config.get("store") else None

    if config.get("partitioned"):
        if store is None:
            raise ValueError("partitioned checkpoints need a 'store'")
        for bad in ("result_format", "evaluation_parameters"):
            if config.get(bad) is not None:
                raise ValueError(
                    f"'{bad}' does not apply to partitioned checkpoints — "
                    "the partitioned runner validates each partition with "
                    "its own result handling; remove it or set "
                    "partitioned=false"
                )
        runner = CheckpointRunner(
            spark,
            store,
            n_buckets=int(config.get("n_buckets", 8)),
            suite_violation_rows=bool(config.get("suite_violation_rows", False)),
            doc_id_col=config.get("doc_id_col", "doc_id"),
            max_concurrency=int(config.get("max_concurrency", 1)),
        )
        report = runner.run(
            df, suite, run_id=run_id,
            bucket_col=config.get("bucket_col", "doc_id"),
        )
        result: dict[str, Any] = {
            "run_id": run_id,
            "success": report.success,
            "result": {
                "partitions": len(report.partitions_run),
                "skipped_committed": len(report.partitions_skipped),
                "docs_validated": report.docs_validated,
                "wall_secs": report.wall_secs,
            },
        }
    else:
        rep = validate_df(
            df,
            suite,
            result_format=config.get("result_format", "SUMMARY"),
            evaluation_parameters=config.get("evaluation_parameters"),
        )
        if store is not None:
            store_validation_result(store, spark, rep, run_id=run_id)
        result = {"run_id": run_id, "success": rep["success"], "result": rep}

    out_path = config.get("report")
    if out_path:
        if config.get("partitioned"):
            # the partitioned result is a run summary, not an EVR report —
            # render the summary so 'report' is honored in both modes
            lines = [
                f"# Checkpoint run {result['run_id']}",
                "",
                f"- success: {result['success']}",
            ]
            lines += [f"- {k}: {v}" for k, v in result["result"].items()]
            text = "\n".join(lines) + "\n"
            if str(out_path).endswith(".html"):
                body = "".join(f"<p>{ln}</p>\n" for ln in lines if ln)
                text = f"<html><body>\n{body}</body></html>\n"
        else:
            from . import report as report_mod

            text = (
                report_mod.to_html(result["result"])
                if str(out_path).endswith(".html")
                else report_mod.to_markdown(result["result"])
            )
        with open(out_path, "w") as f:
            f.write(text)

    if config.get("actions"):
        from .actions import run_actions

        result["actions"] = run_actions(
            config["actions"],
            result,
            {"spark": spark, "store": store, "suite_name": suite.name},
        )
    return result
