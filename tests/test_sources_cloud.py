"""Cloud batch-spec hooks + fluent file assets (SURVEY §2.1 last gaps)."""

from __future__ import annotations

import pytest

from sparkcheck.sources import (
    FileAsset,
    apply_hadoop_conf,
    azure_account_conf,
    read_batch,
)


def test_hadoop_conf_hook_installs_keys(spark):
    apply_hadoop_conf(spark, {"sparkcheck.test.key": "v1"})
    hconf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    assert hconf.get("sparkcheck.test.key") == "v1"


def test_azure_account_conf_shape():
    conf = azure_account_conf("myacct", "SECRET")
    assert conf == {
        "fs.azure.account.key.myacct.blob.core.windows.net": "SECRET"
    }


def test_read_batch_applies_hadoop_conf(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,2\n")
    df = read_batch(spark, p, hadoop_conf={"sparkcheck.test.key2": "v2"})
    assert df.count() == 1
    hconf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    assert hconf.get("sparkcheck.test.key2") == "v2"


def test_file_asset_batching_regex(spark, tmp_path):
    for y, m, rows in (("2021", "01", 2), ("2021", "02", 3), ("2022", "01", 1)):
        with open(tmp_path / f"events_{y}-{m}.csv", "w") as f:
            f.write("a,b\n" + "\n".join(f"{i},{i}" for i in range(rows)) + "\n")
    (tmp_path / "ignore.txt").write_text("nope")

    asset = FileAsset(
        base_dir=str(tmp_path),
        batching_regex=r"events_(?P<year>\d{4})-(?P<month>\d{2})\.csv",
    )
    idents = asset.batch_identifiers()
    assert idents == [
        {"year": "2021", "month": "01"},
        {"year": "2021", "month": "02"},
        {"year": "2022", "month": "01"},
    ]
    assert asset.get_batch(spark, year="2021", month="02").count() == 3
    assert asset.get_batch(spark, year="2021").count() == 5  # both months
    assert asset.get_batch(spark).count() == 6  # everything
    with pytest.raises(FileNotFoundError):
        asset.get_batch(spark, year="1999")
