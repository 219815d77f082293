"""Span-level checks over interleaved text+media documents.

GX has no analog for nested-array validation (SURVEY.md §1: "GX never
explodes nested data"); this is the north-rule capability on top of the
expectation engine. Two execution styles, both driver-loop-free:

1. **Exploded-native**: ``posexplode(spans)`` flattens to one row per span
   (doc_id, span_index, kind, text, media_ref, offset); every registered
   column expectation then applies unchanged — e.g.
   ``expect_column_values_to_match_regex`` over ``text``. The explode is a
   narrow transformation (no shuffle) so this composes with the fused agg
   pass at full scan speed.

2. **Arrow pandas UDFs** over the intact spans array (input_hint: "all
   span-level checks done via vectorized pandas/Arrow UDFs ... without
   per-row Python [scalar UDFs]") — used where per-document *sequence*
   semantics matter: offset monotonicity, kind/payload consistency, and
   the span-sequence fingerprint that backs the row-for-row equality
   invariant (kind, text, media_ref, order) against reference results.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def interleave_documents(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic interleaved span corpus derived from a plain
    (doc_id, text) documents table: one span per whitespace token, ~1/16
    spans are media ('image' + media_ref), with seeded defects so every
    span-level expectation has violations:

      - non-printable text  (~1/256 text spans: token + chr(1))
      - media_ref on a text span (~1/256: kind/payload inconsistency)
      - offset inversion    (~1/16 of non-first spans: offset dips by 15)

    Every branch decision is md5(doc_id|index|tag)-derived, so any engine
    (the DuckDB oracle included) reproduces the corpus bit-for-bit from the
    same documents table — which turns the span-violation and
    span-fingerprint queries into exact oracle-checked rows instead of
    rows-only checks. Pure Column ops (transform with index lambda), one
    narrow scan, no Python."""
    from .text import tokens

    did = F.col(id_col).cast("string")

    def make(tok, i):
        sid = F.concat(did, F.lit("|"), i.cast("string"))

        def h(tag):
            return F.md5(F.concat(sid, F.lit("|" + tag)))

        is_media = F.substring(h("k"), 1, 1) == "0"
        ptest = F.substring(h("p"), 1, 2) == "00"
        mtest = F.substring(h("m"), 1, 2) == "00"
        otest = (F.substring(h("o"), 1, 1) == "0") & (i > 0)
        text_val = F.when(ptest, F.concat(tok, F.lit("\x01"))).otherwise(tok)
        ref = F.concat(F.lit("media://"), F.substring(h("r"), 1, 8))
        kind = F.when(is_media, F.lit("image")).otherwise(F.lit("text"))
        text_out = F.when(~is_media, text_val)
        ref_out = F.when(is_media | mtest, ref)
        offset = F.when(otest, i * 10 - 15).otherwise(i * 10).cast("int")
        return F.struct(
            kind.alias("kind"),
            text_out.alias("text"),
            ref_out.alias("media_ref"),
            offset.alias("offset"),
        )

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(tokens(text_col), make).alias("spans"),
    )


def explode_spans(docs: DataFrame) -> DataFrame:
    """One row per span: (doc_id, span_index, kind, text, media_ref, offset).

    posexplode is narrow — no shuffle; Catalyst still prunes unused struct
    fields from the parquet scan (nested schema pruning).
    """
    return docs.select(
        "doc_id", F.posexplode("spans").alias("span_index", "span")
    ).select(
        "doc_id",
        "span_index",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


# ---------------------------------------------------------------------------
# Native whole-array checks (no explode, no Python): per-doc predicates
# ---------------------------------------------------------------------------


def offsets_strictly_increasing() -> Column:
    """True iff spans.offset is strictly increasing (native higher-order fns:
    zip_with the array against its own tail — stays in codegen)."""
    spans = F.col("spans")
    pairs_bad = F.zip_with(
        F.slice(spans, 1, F.greatest(F.size(spans) - 1, F.lit(0))),
        F.slice(spans, 2, F.greatest(F.size(spans) - 1, F.lit(0))),
        lambda a, b: b["offset"] <= a["offset"],
    )
    return ~F.exists(pairs_bad, lambda x: x)


def kind_payload_consistent() -> Column:
    """True iff every span has text XOR media_ref matching its kind."""
    ok = lambda s: F.when(  # noqa: E731
        s["kind"] == "text", s["text"].isNotNull() & s["media_ref"].isNull()
    ).otherwise(s["media_ref"].isNotNull() & s["text"].isNull())
    return F.forall(F.col("spans"), ok)


def doc_violation_flags(docs: DataFrame) -> DataFrame:
    """Per-doc boolean flags for the whole-array invariants."""
    return docs.select(
        "doc_id",
        offsets_strictly_increasing().alias("offsets_ok"),
        kind_payload_consistent().alias("kinds_ok"),
        F.size("spans").alias("n_spans"),
    )


# ---------------------------------------------------------------------------
# Arrow pandas UDFs over the intact spans array
# ---------------------------------------------------------------------------


@F.pandas_udf(T.StringType())
def span_sequence_fingerprint(spans: pd.Series) -> pd.Series:
    """md5 fingerprint of the ordered (kind, text, media_ref) sequence —
    the span-sequence equality invariant: two docs (ours vs reference
    results) agree iff fingerprints agree. Arrow-batched; the per-doc loop
    runs over an Arrow batch, never row-at-a-time through the serializer.
    """

    def fp(arr) -> str | None:
        if arr is None:
            return None
        h = hashlib.md5()
        for s in arr:
            kind = s["kind"] if s["kind"] is not None else ""
            text = s["text"] if s["text"] is not None else ""
            ref = s["media_ref"] if s["media_ref"] is not None else ""
            h.update(kind.encode())
            h.update(b"\x00")
            h.update(text.encode())
            h.update(b"\x00")
            h.update(ref.encode())
            h.update(b"\x01")
        return h.hexdigest()

    return spans.map(fp)


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def offset_violation_indices(spans: pd.Series) -> pd.Series:
    """Indices i where offset[i] <= offset[i-1] — the violation-row payload
    for the offset-monotonicity check, computed per Arrow batch."""

    def bad(arr):
        if arr is None:
            return []
        out = []
        prev = None
        for i, s in enumerate(arr):
            off = s["offset"]
            if prev is not None and off is not None and off <= prev:
                out.append(i)
            if off is not None:
                prev = off
        return out

    return spans.map(bad)


PRINTABLE_RE = r"^[\x20-\x7E]*$"
KNOWN_KINDS = ("text", "image", "audio", "video")


def span_violations(docs: DataFrame, run_id: str = "", partition_id: str = "") -> DataFrame:
    """Violation rows (doc_id, span_index, expectation, observed_value) for
    ALL span-level invariants in ONE narrow scan.

    Plan shape: zip each span with the previous span's offset
    (``arrays_zip`` against the offset array shifted by one), ``posexplode``
    once, then evaluate all three checks (printable text, kind/payload
    consistency, offset monotonicity) as FLAT row predicates. Explode is a
    codegen-friendly generator and flat predicates stay inside
    whole-stage codegen, which measured ~1.7x faster than evaluating the
    checks as array lambdas (higher-order functions are interpreted,
    allocation-bound, and thread-scale poorly — see BENCH/BASELINE.md).
    One scan, zero shuffles, zero Python. ``span_violations_arrow`` is the
    pandas-UDF variant kept for parity testing."""
    spans = F.col("spans")
    offs = F.transform(spans, lambda s: s["offset"])
    prev = F.concat(
        F.array(F.lit(None).cast("int")),
        F.slice(offs, 1, F.greatest(F.size(spans) - 1, F.lit(0))),
    )
    z = F.arrays_zip(spans, prev.alias("prev_offset"))
    ex = docs.select(
        "doc_id", F.posexplode(z).alias("span_index", "zz")
    ).select(
        "doc_id",
        "span_index",
        F.col("zz.spans.kind").alias("kind"),
        F.col("zz.spans.text").alias("text"),
        F.col("zz.spans.media_ref").alias("media_ref"),
        F.col("zz.spans.offset").alias("offset"),
        F.col("zz.prev_offset").alias("prev_offset"),
    )
    text_bad = (
        (F.col("kind") == "text")
        & F.col("text").isNotNull()
        & ~F.col("text").rlike(PRINTABLE_RE)
    )
    kind_bad = (
        ~F.col("kind").isin(*KNOWN_KINDS)
        | ((F.col("kind") == "text") & (F.col("text").isNull() | F.col("media_ref").isNotNull()))
        | ((F.col("kind") != "text") & (F.col("media_ref").isNull() | F.col("text").isNotNull()))
    )
    off_bad = (
        F.col("prev_offset").isNotNull()
        & F.col("offset").isNotNull()
        & (F.col("offset") <= F.col("prev_offset"))
    )
    vs = "array<struct<expectation:string,observed_value:string>>"

    def tagged(cond, name, observed):
        return F.when(
            cond,
            F.array(F.struct(F.lit(name).alias("expectation"), observed.alias("observed_value"))),
        ).otherwise(F.array().cast(vs))

    out = ex.where(text_bad | kind_bad | off_bad).select(
        "doc_id",
        "span_index",
        F.explode(
            F.concat(
                tagged(text_bad, "expect_span_text_printable", F.col("text")),
                tagged(kind_bad, "expect_span_kind_payload_consistent", F.col("kind")),
                tagged(off_bad, "expect_span_offsets_increasing", F.lit(None).cast("string")),
            )
        ).alias("v"),
    )
    return out.select(
        F.lit(run_id).alias("run_id"),
        F.lit(partition_id).alias("partition_id"),
        "doc_id",
        F.col("span_index").cast("int").alias("span_index"),
        F.col("v.expectation").alias("expectation"),
        F.col("v.observed_value").alias("observed_value"),
    )


def span_violations_flat(
    flat_spans: DataFrame, run_id: str = "", partition_id: str = ""
) -> DataFrame:
    """span_violations over the pre-exploded FLAT span layout
    (synth.write_flat_corpus): same three checks, but the input is already
    one row per span with ``prev_offset`` denormalized at ingest — so the
    plan is a pure scan + flat predicates with exact column pruning and no
    generator, and the parquet decode uses the vectorized flat readers
    instead of the nested array<struct> reader (the round-1 scaling
    bottleneck was nested-decode allocation pressure; this layout removes
    it at the storage level, exactly what an Iceberg table would do).
    Violation rows match span_violations on the equivalent nested corpus
    row-for-row."""
    ex = flat_spans
    text_bad = (
        (F.col("kind") == "text")
        & F.col("text").isNotNull()
        & ~F.col("text").rlike(PRINTABLE_RE)
    )
    kind_bad = (
        ~F.col("kind").isin(*KNOWN_KINDS)
        | ((F.col("kind") == "text") & (F.col("text").isNull() | F.col("media_ref").isNotNull()))
        | ((F.col("kind") != "text") & (F.col("media_ref").isNull() | F.col("text").isNotNull()))
    )
    off_bad = (
        F.col("prev_offset").isNotNull()
        & F.col("offset").isNotNull()
        & (F.col("offset") <= F.col("prev_offset"))
    )
    vs = "array<struct<expectation:string,observed_value:string>>"

    def tagged(cond, name, observed):
        return F.when(
            cond,
            F.array(F.struct(F.lit(name).alias("expectation"), observed.alias("observed_value"))),
        ).otherwise(F.array().cast(vs))

    out = ex.where(text_bad | kind_bad | off_bad).select(
        "doc_id",
        "span_index",
        F.explode(
            F.concat(
                tagged(text_bad, "expect_span_text_printable", F.col("text")),
                tagged(kind_bad, "expect_span_kind_payload_consistent", F.col("kind")),
                tagged(off_bad, "expect_span_offsets_increasing", F.lit(None).cast("string")),
            )
        ).alias("v"),
    )
    return out.select(
        F.lit(run_id).alias("run_id"),
        F.lit(partition_id).alias("partition_id"),
        "doc_id",
        F.col("span_index").cast("int").alias("span_index"),
        F.col("v.expectation").alias("expectation"),
        F.col("v.observed_value").alias("observed_value"),
    )


def span_violations_arrow(
    docs: DataFrame, run_id: str = "", partition_id: str = ""
) -> DataFrame:
    """Pandas-UDF/union variant of :func:`span_violations` — three scans,
    offset check through the Arrow-batched UDF. Kept as the cross-check
    oracle for the single-pass native form (results must match row-for-row)
    and as the template for span checks that genuinely need Python."""
    ex = explode_spans(docs)

    text_bad = ex.where(
        (F.col("kind") == "text")
        & F.col("text").isNotNull()
        & ~F.col("text").rlike(r"^[\x20-\x7E]*$")
    ).select(
        "doc_id",
        "span_index",
        F.lit("expect_span_text_printable").alias("expectation"),
        F.col("text").alias("observed_value"),
    )

    kind_bad = ex.where(
        ~F.col("kind").isin("text", "image", "audio", "video")
        | ((F.col("kind") == "text") & (F.col("text").isNull() | F.col("media_ref").isNotNull()))
        | ((F.col("kind") != "text") & (F.col("media_ref").isNull() | F.col("text").isNotNull()))
    ).select(
        "doc_id",
        "span_index",
        F.lit("expect_span_kind_payload_consistent").alias("expectation"),
        F.col("kind").alias("observed_value"),
    )

    offset_bad = (
        docs.select(
            "doc_id", F.explode(offset_violation_indices("spans")).alias("span_index")
        )
        .select(
            "doc_id",
            "span_index",
            F.lit("expect_span_offsets_increasing").alias("expectation"),
            F.lit(None).cast("string").alias("observed_value"),
        )
    )

    out = text_bad.unionByName(kind_bad).unionByName(offset_bad)
    return out.select(
        F.lit(run_id).alias("run_id"),
        F.lit(partition_id).alias("partition_id"),
        "doc_id",
        F.col("span_index").cast("int").alias("span_index"),
        "expectation",
        "observed_value",
    )


# ---------------------------------------------------------------------------
# Context-window chunking of interleaved text+media documents
# ---------------------------------------------------------------------------


def span_token_cost(
    spans_col: Column, media_token_cost: int = 64
) -> Column:
    """array<bigint> of per-span token costs: text spans cost their
    whitespace token count, media spans (anything non-text) cost the
    fixed ``media_token_cost`` — the standard budget model where an
    image/audio span consumes a fixed number of context slots."""
    return F.transform(
        spans_col,
        lambda s: F.when(
            s["kind"] == "text",
            F.size(F.filter(F.split(F.coalesce(s["text"], F.lit("")), r"\s+"),
                            lambda t: t != "")).cast("bigint"),
        ).otherwise(F.lit(int(media_token_cost)).cast("bigint")),
    )


def chunk_interleaved(
    docs: DataFrame,
    max_tokens: int = 2048,
    media_token_cost: int = 64,
    mode: str = "greedy",
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Split interleaved (doc_id, spans:array<struct<kind,text,media_ref,
    offset>>) documents into context windows WITHOUT splitting a span —
    the multimodal training-pipeline step between validation and
    sequence packing: a media span must stay whole (its embedding is
    atomic), so chunking assigns whole spans to windows by token budget.

    One row per span: (id, span_index, kind, cost, chunk_index).

    ``mode="greedy"`` (default) is the production layout: spans fill the
    current window until the next span would overflow ``max_tokens``,
    then a new window starts — windows are consecutive 0,1,2,... and
    never exceed the budget unless a SINGLE span already does (that span
    gets its own window). Implemented as a pure-JVM ``aggregate`` fold
    over the span array — per-doc sequential by nature, but narrow:
    ZERO shuffles at any corpus size.

    ``mode="interval"`` assigns span s to window
    floor(tokens_before_s / max_tokens): budget-aligned intervals,
    exactly replayable in ANSI SQL (the oracle's form); a span
    straddling a boundary spills its window past the budget and a span
    larger than the budget consumes several interval ids, so indices
    can skip — documented trade for exact cross-engine replay.

    Scale: both modes are single narrow passes over the span array
    (transform + aggregate HOFs, then one posexplode); nothing
    shuffles, so this pipelines into a writer exactly like
    text.chunk_documents. Per-DOCUMENT cost is quadratic in span count
    for both modes (interval: prefix slice-sums; greedy: the id array
    copies as the fold grows) — interleaved documents carry spans in
    the hundreds-to-thousands, where this is noise inside one JVM row;
    million-span monsters belong in text.chunk_documents' flat token
    layout instead.
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if mode not in ("greedy", "interval"):
        raise ValueError(f"mode must be 'greedy' or 'interval', got {mode!r}")
    costs = span_token_cost(F.col(spans_col), media_token_cost)
    if mode == "interval":
        # cum-before via a running-total transform: scan positions with
        # slice-sum — O(n^2) per doc on span count. The greedy fold below
        # is also quadratic per doc (each step copies the growing id
        # array), so BOTH modes are document-scale tools: spans/doc in
        # the thousands is fine inside one JVM row, million-span docs
        # belong in text.chunk_documents' flat layout instead
        chunk_ids = F.transform(
            costs,
            lambda c, i: (
                F.aggregate(
                    F.slice(costs, 1, i), F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                )
                / F.lit(int(max_tokens))
            ).cast("bigint"),
        )
    else:
        # greedy fold: acc = struct(fill, ids); the finish lambda emits ids
        def step(acc, c):
            overflow = (acc["fill"] + c > max_tokens) & (acc["fill"] > 0)
            nxt = F.when(overflow, c).otherwise(acc["fill"] + c)
            cid = F.when(
                overflow, F.try_element_at(acc["ids"], F.lit(-1)) + 1
            ).otherwise(
                F.coalesce(F.try_element_at(acc["ids"], F.lit(-1)), F.lit(0).cast("bigint"))
            )
            return F.struct(
                nxt.alias("fill"), F.concat(acc["ids"], F.array(cid)).alias("ids")
            )

        zero = F.struct(
            F.lit(0).cast("bigint").alias("fill"),
            F.array().cast("array<bigint>").alias("ids"),
        )
        chunk_ids = F.aggregate(costs, zero, step, lambda acc: acc["ids"])
    zipped = F.arrays_zip(
        F.col(spans_col).alias("s"), costs.alias("cost"), chunk_ids.alias("chunk")
    )
    ex = docs.select(
        F.col(id_col), F.posexplode(zipped).alias("span_index", "z")
    )
    return ex.select(
        id_col,
        F.col("span_index").cast("int").alias("span_index"),
        F.col("z.s.kind").alias("kind"),
        F.col("z.cost").alias("cost"),
        F.col("z.chunk").alias("chunk_index"),
    )


def chunk_stats(chunked: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-(doc, window) rollup of :func:`chunk_interleaved` output:
    (id, chunk_index, n_spans, n_tokens, n_media) — the frame a packing
    or writer stage consumes. One map-side-combined groupBy."""
    return chunked.groupBy(id_col, "chunk_index").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum("cost").alias("n_tokens"),
        F.sum(F.when(F.col("kind") != "text", 1).otherwise(0))
        .cast("bigint")
        .alias("n_media"),
    )
