"""Dataset version diffing — what changed between two batches of a table.

A training-data pipeline republishes tables constantly; the validation
question "what did this rebuild actually change?" is a key-wise diff:
added / removed / changed / unchanged. The reference has no counterpart
(its closest is expect_table_row_count_to_equal_other_table); this is the
Spark-native operator a 10^12-row corpus needs:

- Each side is first reduced to (key, xxhash64(compare_cols)) — the join
  then shuffles 8-byte hashes instead of full rows, so a diff of two wide
  document tables moves ~16 bytes/row through the exchange regardless of
  row width. Column pruning pushes the projection into the scans.
- One full-outer shuffle join on the key (sort-merge; AQE handles skew),
  classification is a pure Column CASE — no UDFs, whole-stage codegen.
- ``changed`` means the xxhash64 of the compared columns differs; a false
  "unchanged" needs a same-key 64-bit collision (p ≈ 5e-20 per changed
  row) — the standard content-hash diff trade, documented here.
- ``diff_rows`` joins the non-unchanged keys back to the new side
  (left-semi, so the bulk unchanged mass is never re-read wide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _hashed(df: DataFrame, key_cols: list[str], compare_cols: list[str], alias: str) -> DataFrame:
    return df.select(
        *[F.col(k) for k in key_cols],
        F.xxhash64(*[F.col(c) for c in compare_cols]).alias(alias),
    )


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Key-wise diff of two table versions.

    Returns (key_cols..., status) with status in
    {'added', 'removed', 'changed'} (+ 'unchanged' when
    ``include_unchanged``). ``compare_cols`` defaults to every shared
    non-key column. Keys must be unique per side (the usual primary-key
    contract; duplicate keys diff per joined pair).
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = _hashed(old, key_cols, compare_cols, "__h_old")
    n = _hashed(new, key_cols, compare_cols, "__h_new")
    joined = o.join(n, on=key_cols, how="full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*key_cols, status.alias("status"))
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One row: n_added / n_removed / n_changed / n_unchanged counts."""
    d = dataset_diff(old, new, key_cols, compare_cols, include_unchanged=True)
    return d.agg(
        F.count(F.when(F.col("status") == "added", 1)).alias("n_added"),
        F.count(F.when(F.col("status") == "removed", 1)).alias("n_removed"),
        F.count(F.when(F.col("status") == "changed", 1)).alias("n_changed"),
        F.count(F.when(F.col("status") == "unchanged", 1)).alias("n_unchanged"),
    )


def diff_rows(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """The new-side rows behind every added/changed key (full width),
    plus status — the "what do I need to reprocess" set. Left-semi shape:
    only the delta keys pull wide rows; the unchanged bulk stays pruned."""
    delta = dataset_diff(old, new, key_cols, compare_cols).where(
        F.col("status").isin("added", "changed")
    )
    return new.join(delta, on=key_cols, how="inner")


def revalidate_delta(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    suite,
    compare_cols: list[str] | None = None,
) -> "tuple[DataFrame, dict[str, str]]":
    """Incremental validation: run ``suite``'s row-local expectations over
    ONLY the rows a rebuild added or changed, so validation cost scales
    with churn, not table size. At 10^12 documents a daily rebuild
    typically touches <1% of keys; re-validating the other 99% buys
    nothing — their rows are byte-identical to the already-validated
    version (the same content-hash equality ``dataset_diff`` keys on).

    Returns ``(report, skipped)`` where report has one row per row-local
    expectation: (expectation, delta_rows, unexpected) — counts over the
    added+changed new-side rows, all expectations fused into ONE
    aggregation over the delta (the same mask projection as
    ``quarantine``). Cross-row expectations (uniqueness, ordering) land
    in ``skipped``: a dup or an order break can pair a delta row with an
    untouched one, so "delta-only" is the wrong domain for them — run
    those exact, or key-scoped via ``quarantine``.

    Scale shape: the diff moves (key, xxhash64) pairs only; the wide rows
    behind the delta come back through ``diff_rows``'s inner join, and
    the fused mask aggregate adds one column per expectation, never a
    pass."""
    from .quarantine import suite_masks

    delta = diff_rows(old, new, key_cols, compare_cols).drop("status")
    masks, skipped = suite_masks(delta, suite)
    drop_labels: set[str] = set()
    for cfg in suite.expectations:
        from .expectations import ColumnMapExpectation, get_expectation
        from .quarantine import _label

        try:
            exp = get_expectation(cfg.expectation_type)
        except KeyError:
            continue
        cond = getattr(exp, "condition_name", None)
        if cond in ("column_values.unique", "compound_columns.unique"):
            skipped[f"{cfg.expectation_type}:{cfg.get('column') or ''}"] = (
                "uniqueness is not delta-local (a dup can pair a changed "
                "row with an untouched one); run it exact over the full "
                "table or via quarantine"
            )
        # statistic-parameterized masks (z-score family) resolve mean/
        # stddev from the DataFrame they run on — over the delta those
        # are the DELTA's stats, silently different from full-table
        # validation (a delta of pure outliers normalizes itself to
        # zero violations). Refuse instead.
        rck = getattr(type(exp), "resolved_condition_kwargs", None)
        if (
            cond is not None
            and rck is not None
            and rck is not ColumnMapExpectation.resolved_condition_kwargs
        ):
            lbl = _label(cfg)
            drop_labels.add(lbl)
            skipped[lbl] = (
                "statistic-parameterized expectation: its mean/stddev "
                "would be computed from the delta rows only, not the "
                "full table; run it exact"
            )
    if drop_labels:
        masks = [(lbl, m) for lbl, m in masks if lbl not in drop_labels]
    if not masks:
        # nothing row-local to run — an empty, correctly-typed report
        spark = delta.sparkSession
        empty = spark.createDataFrame(
            [], "expectation string, delta_rows long, unexpected long"
        )
        return empty, skipped
    aggs = [F.count(F.lit(1)).alias("delta_rows")] + [
        F.sum(F.coalesce(m, F.lit(False)).cast("long")).alias(f"__u{i}")
        for i, (_, m) in enumerate(masks)
    ]
    wide = delta.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("expectation"),
                F.col(f"__u{i}").alias("unexpected"),
            )
            for i, (lbl, _) in enumerate(masks)
        ]
    )
    report = (
        wide.select("delta_rows", F.explode(pairs).alias("e"))
        .select(
            F.col("e.expectation").alias("expectation"),
            "delta_rows",
            # sum over a zero-row delta is NULL; a zero-churn rebuild has
            # zero unexpected values, not unknown
            F.coalesce(F.col("e.unexpected"), F.lit(0)).alias("unexpected"),
        )
        .orderBy("expectation")
    )
    return report, skipped


def schema_diff(old_schema, new_schema) -> dict:
    """Schema evolution between two StructTypes (or DataFrames):
    {'added': [(name, type)], 'removed': [(name, type)],
     'type_changed': [(name, old_type, new_type)]} — types compared by
    simpleString, so nested struct/array changes register as a type change
    on the containing column. Driver-side (schemas are metadata)."""
    old_schema = getattr(old_schema, "schema", old_schema)
    new_schema = getattr(new_schema, "schema", new_schema)
    o = {f.name: f.dataType.simpleString() for f in old_schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new_schema.fields}
    return {
        "added": sorted((c, t) for c, t in n.items() if c not in o),
        "removed": sorted((c, t) for c, t in o.items() if c not in n),
        "type_changed": sorted(
            (c, o[c], n[c]) for c in o.keys() & n.keys() if o[c] != n[c]
        ),
    }


def suite_diff(old_suite, new_suite) -> dict:
    """Suite evolution between two ExpectationSuites — the review artifact
    for a "who loosened the null check?" audit:
    {'added': [...], 'removed': [...], 'changed': [(key, old_kwargs,
    new_kwargs)]}. Expectations are keyed by (type, domain columns +
    row_condition), so editing a threshold registers as *changed* on the
    same check rather than a remove+add; kwargs diffs list only the keys
    that differ. Driver-side (suites are metadata). No reference analog —
    GX diffs suites by eyeballing JSON."""

    def key(cfg):
        # explicit None checks: the pair tuple (None, None) is truthy, so an
        # `or` chain would swallow column_list domains into one "(None, None)"
        # bucket and report changed instead of added+removed
        if cfg.get("column") is not None:
            dom = cfg.get("column")
        elif cfg.get("column_A") is not None or cfg.get("column_B") is not None:
            dom = (cfg.get("column_A"), cfg.get("column_B"))
        else:
            dom = tuple(cfg.get("column_list") or ())
        return (cfg.expectation_type, repr(dom), cfg.get("row_condition"))

    def kw(cfg):
        return {k: v for k, v in cfg.kwargs.items()}

    o = {}
    for cfg in old_suite.expectations:
        o.setdefault(key(cfg), []).append(cfg)
    n = {}
    for cfg in new_suite.expectations:
        n.setdefault(key(cfg), []).append(cfg)
    added, removed, changed = [], [], []
    for k in sorted(set(o) | set(n), key=repr):
        olds, news = o.get(k, []), n.get(k, [])
        for cfg in news[len(olds):]:
            added.append(cfg.to_dict())
        for cfg in olds[len(news):]:
            removed.append(cfg.to_dict())
        for oc, nc in zip(olds, news):
            ok, nk = kw(oc), kw(nc)
            if ok != nk:
                delta_keys = sorted(set(ok) | set(nk))
                delta = {
                    dk: {"old": ok.get(dk), "new": nk.get(dk)}
                    for dk in delta_keys
                    if ok.get(dk) != nk.get(dk)
                }
                changed.append(
                    {"expectation": k[0], "domain": k[1], "kwargs": delta}
                )
    return {"added": added, "removed": removed, "changed": changed}
