"""Round-5 batch 2: interleaved context chunking + text normalization."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from sparkcheck import spans, text


def _docs(spark, span_lists):
    """span_lists: list of lists of (kind, text)."""
    rows = []
    for i, sl in enumerate(span_lists):
        rows.append(
            Row(
                doc_id=str(i),
                spans=[
                    Row(kind=k, text=t, media_ref=(None if k == "text" else "m://x"),
                        offset=j * 10)
                    for j, (k, t) in enumerate(sl)
                ],
            )
        )
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def _greedy_ref(costs, max_tokens):
    """Python reference of the greedy layout."""
    out, chunk, fill = [], 0, 0
    for c in costs:
        if fill + c > max_tokens and fill > 0:
            chunk, fill = chunk + 1, c
        else:
            fill += c
        out.append(chunk)
    return out


def test_greedy_matches_reference(spark):
    sl = [[("text", "a b c"), ("image", None), ("text", "d"),
           ("text", "e f g h i j"), ("image", None), ("text", "k l")]]
    df = _docs(spark, sl)
    got = {
        r["span_index"]: (r["cost"], r["chunk_index"])
        for r in spans.chunk_interleaved(
            df, max_tokens=8, media_token_cost=4, mode="greedy"
        ).collect()
    }
    costs = [3, 4, 1, 6, 4, 2]
    ref = _greedy_ref(costs, 8)
    assert [got[i][0] for i in range(6)] == costs
    assert [got[i][1] for i in range(6)] == ref


def test_greedy_never_overflows_unless_single_span_does(spark):
    import random

    rng = random.Random(3)
    sls = []
    for _ in range(30):
        sl = []
        for _ in range(rng.randint(1, 25)):
            if rng.random() < 0.3:
                sl.append(("image", None))
            else:
                sl.append(("text", " ".join("w" * 1 for _ in range(rng.randint(0, 12)))))
        sls.append(sl)
    df = _docs(spark, sls)
    out = spans.chunk_interleaved(df, max_tokens=10, media_token_cost=6, mode="greedy")
    stats = spans.chunk_stats(out).collect()
    per_chunk = {(r["doc_id"], r["chunk_index"]): r for r in stats}
    spanrows = out.collect()
    for (_, _), r in per_chunk.items():
        # overflow only allowed when the chunk is a single giant span
        assert r["n_tokens"] <= 10 or r["n_spans"] == 1
    # chunk ids consecutive from 0 per doc
    by_doc = {}
    for r in spanrows:
        by_doc.setdefault(r["doc_id"], set()).add(r["chunk_index"])
    for ids in by_doc.values():
        assert ids == set(range(len(ids)))
    # greedy reference equivalence per doc
    from collections import defaultdict

    seq = defaultdict(list)
    for r in sorted(spanrows, key=lambda r: (r["doc_id"], r["span_index"])):
        seq[r["doc_id"]].append(r)
    for doc, rs in seq.items():
        ref = _greedy_ref([r["cost"] for r in rs], 10)
        assert [r["chunk_index"] for r in rs] == ref, doc


def test_interval_mode_is_budget_aligned(spark):
    sl = [[("text", "a b c d e"), ("text", "f g h i j"), ("text", "k")]]
    df = _docs(spark, sl)
    got = {
        r["span_index"]: r["chunk_index"]
        for r in spans.chunk_interleaved(df, max_tokens=4, mode="interval").collect()
    }
    # cum-before = 0, 5, 10 -> floor/4 = 0, 1, 2
    assert got == {0: 0, 1: 1, 2: 2}


def test_empty_spans_and_validation(spark):
    df = _docs(spark, [[]])
    assert spans.chunk_interleaved(df).count() == 0
    with pytest.raises(ValueError, match="mode"):
        spans.chunk_interleaved(df, mode="nope")
    with pytest.raises(ValueError, match="max_tokens"):
        spans.chunk_interleaved(df, max_tokens=0)


def test_chunk_interleaved_plan_is_narrow(spark):
    df = _docs(spark, [[("text", "a")]])
    plan = spans.chunk_interleaved(
        df, mode="greedy"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_normalize_text(spark):
    raw = (
        "\u201cHel\u200blo\u201d \u2014 it\u2019s\x00 a\u00a0test   with\t tabs \n"
        "  and lines\n\n\n\n\nend\ufeff  "
    )
    df = spark.createDataFrame([Row(text=raw)])
    got = df.select(text.normalize_text("text").alias("t")).first()["t"]
    assert got == '"Hello" - it\'s a test with tabs\nand lines\n\nend'


def test_normalize_idempotent_and_dedup_effect(spark):
    a = "It\u2019s  fine \u2013 really"
    b = "It's fine - really"
    df = spark.createDataFrame([Row(text=a), Row(text=b)])
    out = df.select(text.normalize_text("text").alias("t")).collect()
    assert out[0]["t"] == out[1]["t"]
    twice = df.select(
        text.normalize_text(text.normalize_text("text")).alias("t")
    ).collect()
    assert [r["t"] for r in twice] == [r["t"] for r in out]


def test_expect_normalized_expectation(spark):
    """expect_column_values_to_be_normalized through the public suite
    path: clean rows pass, rows carrying curly quotes / ZWSP / NBSP are
    the unexpected ones with their count exact."""
    from sparkcheck import ExpectationSuite, validate_df

    rows = [
        Row(text="already clean text"),
        Row(text="It’s got a curly quote"),
        Row(text="zero​width inside"),
        Row(text="trailing nbsp "),
        Row(text="fine too"),
    ]
    df = spark.createDataFrame(rows)
    s = ExpectationSuite("norm")
    s.add("expect_column_values_to_be_normalized", column="text")
    r = validate_df(df, s, result_format="SUMMARY")["results"][0]
    assert r["success"] is False
    assert r["result"]["unexpected_count"] == 3
    s2 = ExpectationSuite("norm2")
    s2.add("expect_column_values_to_be_normalized", column="text", mostly=0.3)
    assert validate_df(df, s2)["success"] is True
