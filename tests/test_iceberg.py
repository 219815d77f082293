"""Iceberg-store integration — GATED on the iceberg-spark-runtime jar.

The build sandbox has no network (curl to repo1.maven.org returns 000), so
the jar cannot be fetched here; set ICEBERG_JAR to run these for real (the
same flow is committed as scripts/iceberg_e2e.py). The ungated tests below
cover the pieces that do not need the jar: the IcebergStore commit
protocol contract (via SQL-level mocking is NOT meaningful for atomic
commits, so we only assert interface parity) and the runner's
store-agnostic resume logic, which tests/test_spans_runner.py already
proves on the ParquetStore manifest.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

ICEBERG_JAR = os.environ.get("ICEBERG_JAR", "")


def test_store_interface_parity():
    # whatever store the runner is handed must speak the same protocol;
    # IcebergStore must never silently fall back to the POSIX manifest
    from sparkcheck.runner import IcebergStore, ParquetStore

    for name in (
        "committed_partitions",
        "commit_partition",
        "append",
        "append_rows",
        "append_small",
        "read",
    ):
        assert callable(getattr(IcebergStore, name))
        assert getattr(IcebergStore, name) is not getattr(
            ParquetStore, name, None
        ), f"IcebergStore must override {name}"


@pytest.mark.skipif(
    not (ICEBERG_JAR and os.path.exists(ICEBERG_JAR)),
    reason="iceberg-spark-runtime jar not available (no network in this "
    "sandbox); set ICEBERG_JAR=/path/to/iceberg-spark-runtime-*.jar",
)
def test_iceberg_end_to_end():
    # run in a subprocess: the jar must be on the classpath at JVM launch,
    # which the session-scoped test SparkSession cannot provide
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "iceberg_e2e.py",
    )
    out = subprocess.run(
        [sys.executable, script],
        env={**os.environ, "ICEBERG_JAR": ICEBERG_JAR},
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ICEBERG E2E OK" in out.stdout, out.stdout[-2000:]
