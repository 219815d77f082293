"""Key analytics: functional-dependency checks and join-key health.

Neither exists in the reference (its closest surface is
expect_compound_columns_to_be_unique, reference
expectations/core/expect_compound_columns_to_be_unique.py, which asserts
the *strictest* FD — every key appears once). These are the two questions
a 100 TB pipeline asks before trusting or joining a table:

  * does column A functionally determine column B (one B value per A key)?
    A broken FD ruins dimension joins and grouping assumptions silently.
  * is ``key`` healthy to join on — null fraction, distinct count,
    worst-key fanout — BEFORE paying for the shuffle? A single hot key is
    the difference between a 10-minute and a 10-hour join.

Formulation notes (scale):

  * FD does NOT use ``countDistinct(dependent)``: Spark plans grouped
    count-distinct via an Expand (row multiplication) when mixed with
    other aggregates. Instead: groupBy(A, B).count -> groupBy(A) — two
    hash aggregations, BOTH with map-side partial combine, shuffle keyed
    by (A, B) then A. NULL dependents count as a value (a key mapping to
    {x, NULL} is not a function); NULL keys are kept by the plain
    functions and dropped by the expectation (ignore-null-key parity
    with map expectations' ignore_nulls).
  * join_key_health is ONE groupBy(key).count pass + one scalar agg over
    the (already tiny) per-key counts. The per-key frame is at most
    |distinct keys| rows — the second agg never sees data volume.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pair_counts(df: DataFrame, determinant: str, dependent: str) -> DataFrame:
    return df.groupBy(determinant, dependent).agg(
        F.count(F.lit(1)).alias("__n")
    )


def _key_groups(df: DataFrame, determinant: str, dependent: str) -> DataFrame:
    """(determinant, n_values, n_rows) per key — distinct dependent values
    via the two-level groupBy (no Expand, map-side combine at both levels)."""
    return (
        _pair_counts(df, determinant, dependent)
        .groupBy(determinant)
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum("__n").alias("n_rows"),
        )
    )


def fd_violating_keys(
    df: DataFrame, determinant: str, dependent: str
) -> DataFrame:
    """Keys of ``determinant`` mapped to MORE than one ``dependent`` value:
    (determinant, n_values, n_rows). Empty iff A -> B holds exactly."""
    g = _key_groups(df, determinant, dependent)
    return g.where(F.col("n_values") > 1)


def fd_summary(df: DataFrame, determinant: str, dependent: str) -> DataFrame:
    """One row: total_keys, violating_keys, rows_in_violating_keys.

    ``rows_in_violating_keys`` is the blast radius — how many input rows
    sit under a key whose dependent value is ambiguous."""
    g = _key_groups(df, determinant, dependent)
    viol = F.col("n_values") > 1
    return g.agg(
        F.count(F.lit(1)).alias("total_keys"),
        F.sum(viol.cast("long")).alias("violating_keys"),
        F.sum(F.when(viol, F.col("n_rows")).otherwise(0)).alias(
            "rows_in_violating_keys"
        ),
    )


def join_key_health(
    df: DataFrame, key: str, fanout_threshold: int = 1000
) -> DataFrame:
    """One-row join-readiness profile of ``key``:

    total_rows, null_key_rows (they silently drop from inner joins),
    distinct_keys (non-null), max_key_rows (the hot-key fanout a shuffle
    partition must absorb — multiply by the other side's max for the
    worst joined-partition estimate), mean_key_rows (4 dp), and
    keys_over_threshold (salting candidates: every key here deserves a
    salt or an AQE skew split)."""
    g = df.groupBy(key).agg(F.count(F.lit(1)).alias("__n"))
    nn = F.col(key).isNotNull()
    return g.agg(
        F.sum("__n").alias("total_rows"),
        F.sum(F.when(~nn, F.col("__n")).otherwise(0)).alias("null_key_rows"),
        F.sum(nn.cast("long")).alias("distinct_keys"),
        F.max(F.when(nn, F.col("__n"))).alias("max_key_rows"),
        F.round(
            F.sum(F.when(nn, F.col("__n")).otherwise(0))
            / F.sum(nn.cast("long")),
            4,
        ).alias("mean_key_rows"),
        F.sum((nn & (F.col("__n") > fanout_threshold)).cast("long")).alias(
            "keys_over_threshold"
        ),
    )


def heavy_keys(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """The ``top`` heaviest non-null keys: (key, n_rows), ties broken by
    key value for determinism. This is the salting worklist."""
    return (
        df.where(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"), F.col(key))
        .limit(top)
    )


class FunctionalDependencyExpectation:
    """expect_column_pair_to_be_functionally_dependent(column_A=...,
    column_B=..., mostly=...): success iff >= mostly of non-null A keys map
    to exactly one B value. No reference analog (the reference can only
    assert the degenerate one-row-per-key form via compound uniqueness);
    registered as a sparkcheck extension."""

    name = "expect_column_pair_to_be_functionally_dependent"
    condition_name = None

    def metric_requests(self, cfg, rf):
        return {}

    def stage2_requests(self, cfg, rf, resolver):
        return {}

    def validate(self, cfg, rf, resolver) -> dict[str, Any]:
        det, dep = cfg.get("column_A"), cfg.get("column_B")
        row = (
            fd_summary(
                resolver.df.where(F.col(det).isNotNull()), det, dep
            )
            .collect()[0]
        )
        total = int(row.total_keys or 0)
        bad = int(row.violating_keys or 0)
        ratio = 1.0 if total == 0 else 1.0 - bad / total
        mostly = cfg.get("mostly", 1.0)
        ret: dict[str, Any] = {"success": ratio >= mostly}
        if rf["result_format"] != "BOOLEAN_ONLY":
            ret["result"] = {
                "observed_value": round(ratio, 6),
                "details": {
                    "total_keys": total,
                    "violating_keys": bad,
                    "rows_in_violating_keys": int(
                        row.rows_in_violating_keys or 0
                    ),
                },
            }
        return ret


def _register() -> None:
    from .expectations import register_expectation

    register_expectation(FunctionalDependencyExpectation())


_register()


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    heavy: "list | None" = None,
    heavy_top: int = 20,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join on ``key``: PARTIAL salting — only heavy
    keys pay for it.

    Full salting (replicate the whole right side n_salts ways, as the
    referential anti-join does for its key-only dim side) multiplies the
    small side by n_salts; at 10^12 rows that is only affordable when the
    replicated side is tiny. Partial salting replicates right-side rows
    ONLY for the keys in ``heavy`` (default: ``heavy_keys(left, key,
    heavy_top)`` — one extra key-only pass), and scatters the left rows of
    those keys across ``n_salts`` sub-keys; every other key joins
    unsalted. A hot key's rows then spread over n_salts tasks instead of
    melting one straggler partition, while the replication cost is
    ``len(heavy) * n_salts`` rows — constant, not proportional to the
    table.

    Left rows scatter by a hash of the whole row, so duplicate full rows
    share a salt (documented limit: a key whose skew is millions of
    IDENTICAL rows stays skewed — dedup first). ``how`` may be ``inner``
    or ``left``; each left row appears exactly as in the plain join.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    if heavy is None:
        heavy = [r[0] for r in heavy_keys(left, key, heavy_top).collect()]
    if not heavy:
        return left.join(right, on=key, how=how)
    heavy_lit = F.array(*[F.lit(v) for v in heavy])
    is_heavy_l = F.array_contains(heavy_lit, F.col(key)) & F.col(key).isNotNull()
    lsalt = F.when(
        is_heavy_l,
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)),
    ).otherwise(F.lit(0))
    lefts = left.withColumn("__salt", lsalt.cast("int"))
    is_heavy_r = F.array_contains(heavy_lit, F.col(key)) & F.col(key).isNotNull()
    rsalt = F.when(
        is_heavy_r,
        F.sequence(F.lit(0), F.lit(n_salts - 1)),
    ).otherwise(F.array(F.lit(0)))
    rights = right.withColumn("__salt", F.explode(rsalt)).withColumn(
        "__salt", F.col("__salt").cast("int")
    )
    return lefts.join(rights, on=[key, "__salt"], how=how).drop("__salt")


def reconcile_aggregates(
    left: DataFrame,
    right: DataFrame,
    checks: "list[dict]",
    rel_tol: float = 0.0,
) -> DataFrame:
    """Cross-table reconciliation: compare aggregates of two tables without
    joining them — the "does the fact table still sum to the ledger?"
    control every warehouse runs after a load.

    ``checks`` is a list of {"name", "left_expr", "right_expr"} where the
    exprs are Spark SQL aggregate expressions evaluated over each table
    (e.g. ``sum(amount)``, ``count(*)``, ``count(distinct id)``). Both
    tables are scanned ONCE each (all checks fused into one agg per side
    — adding checks adds zero passes), the two one-row frames cross-join
    (1x1), and each check reports (name, left_value, right_value,
    abs_diff, ok). ``rel_tol`` allows float drift: ok iff
    |l - r| <= rel_tol * max(|l|, |r|).

    No reference analog: expect_table_row_count_to_equal_other_table
    compares only row counts; this reconciles arbitrary aggregates.
    """
    la = left.agg(
        *[F.expr(c["left_expr"]).cast("double").alias(f"__l{i}")
          for i, c in enumerate(checks)]
    )
    ra = right.agg(
        *[F.expr(c["right_expr"]).cast("double").alias(f"__r{i}")
          for i, c in enumerate(checks)]
    )
    both = la.crossJoin(ra)
    rows = F.array(
        *[
            F.struct(
                F.lit(c["name"]).alias("name"),
                F.col(f"__l{i}").alias("left_value"),
                F.col(f"__r{i}").alias("right_value"),
            )
            for i, c in enumerate(checks)
        ]
    )
    long = both.select(F.explode(rows).alias("c")).select("c.*")
    diff = F.abs(F.col("left_value") - F.col("right_value"))
    bound = F.lit(rel_tol) * F.greatest(
        F.abs(F.col("left_value")), F.abs(F.col("right_value"))
    )
    return long.select(
        "name",
        "left_value",
        "right_value",
        diff.alias("abs_diff"),
        (diff <= bound).alias("ok"),
    ).orderBy("name")


# ---------------------------------------------------------------------------
# Fuzzy join — edit-distance record linkage with exact deletion blocking
# ---------------------------------------------------------------------------


def _deletion_neighborhood(val: Column, d: int) -> Column:
    """Array of every string reachable from ``val`` by deleting UP TO ``d``
    characters (including ``val`` itself), deduplicated.

    The SymSpell blocking theorem: if levenshtein(s, t) <= d, then s and t
    share at least one common member of their depth-d deletion
    neighborhoods — so joining on exploded neighborhoods is an EXACT
    blocking scheme (zero false negatives; false positives are removed by
    the verify filter). Neighborhood size is O(len^d), pure per-row
    Column computation.
    """

    def _del1(x: Column) -> Column:
        return F.when(
            F.length(x) > 0,
            F.transform(
                F.sequence(F.lit(1), F.length(x)),
                lambda i: F.concat(
                    x.substr(F.lit(1), (i - F.lit(1)).cast("int")),
                    x.substr((i + F.lit(1)).cast("int"), F.length(x)),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    out = F.array(val)
    frontier = F.array(val)
    for _ in range(d):
        frontier = F.array_distinct(
            F.flatten(F.transform(frontier, lambda v: _del1(v)))
        )
        out = F.array_union(out, frontier)
    return out


def _fuzzy_candidates(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_id: str,
    right_id: str,
    max_distance: int,
    max_bucket: int | None,
) -> DataFrame:
    from .sources import ensure_parallelism

    # a small dimension file arrives as ONE input split; the variant
    # explode multiplies it ~len(s)^d times and the candidate join would
    # otherwise run single-task — spread the narrow (id, value) frames
    # across the cluster before exploding
    lv = ensure_parallelism(
        left.select(
            F.col(left_id).alias("left_id"), F.col(left_on).alias("left_value")
        )
    ).withColumn(
        "__variant", F.explode(_deletion_neighborhood(F.col("left_value"), max_distance))
    )
    rv = ensure_parallelism(
        right.select(
            F.col(right_id).alias("right_id"), F.col(right_on).alias("right_value")
        )
    ).withColumn(
        "__variant", F.explode(_deletion_neighborhood(F.col("right_value"), max_distance))
    )
    if max_bucket is not None:
        # IN-PLAN guard — no extra driver jobs: each side's per-variant
        # counts collapse map-side (dimension-sized aggregate, no sort),
        # the normally-EMPTY over-limit set broadcasts back, and a match
        # raises DURING the join job — fail-loud before the quadratic
        # bucket is materialized. Earlier variants measured at sf0.1:
        # driver-side pre-count jobs ~5x the join wall, a window count
        # ~2x; this form ~1.5x (BENCH/BASELINE.md round 5).
        for side, name in (("lv", "left"), ("rv", "right")):
            frame = lv if side == "lv" else rv
            hot = (
                frame.groupBy("__variant")
                .agg(F.count(F.lit(1)).alias("__bn"))
                .where(F.col("__bn") > max_bucket)
            )
            frame = frame.join(F.broadcast(hot), "__variant", "left")
            guard = F.when(
                F.col("__bn").isNotNull(),
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"fuzzy_join: {name}-side deletion-variant bucket "
                        ),
                        F.col("__variant"),
                        F.lit(f" exceeds max_bucket={max_bucket} (size "),
                        F.col("__bn").cast("string"),
                        F.lit(
                            "). A hot variant makes the candidate join "
                            "quadratic in the bucket. Raise max_bucket "
                            "knowingly (max_bucket=None disables), "
                            "pre-filter degenerate keys, or block on an "
                            "additional column first."
                        ),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
            frame = frame.where(guard).drop("__bn")
            if side == "lv":
                lv = frame
            else:
                rv = frame
    return lv.join(rv, "__variant").drop("__variant")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_distance: int = 1,
    left_id: str = "id",
    right_id: str = "id",
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """Record linkage by edit distance: every (left, right) pair whose join
    strings are within ``max_distance`` Levenshtein edits, found WITHOUT a
    cross join. Returns (left_id, left_value, right_id, right_value,
    distance), exact — identical rows to the naive O(n·m) plan.

    Blocking is the deletion-neighborhood (SymSpell) scheme — provably
    complete for unit-cost edits (see _deletion_neighborhood) — followed
    by a verify filter with Spark's built-in ``levenshtein`` (JVM-side,
    whole-stage codegen). Candidate volume is Σ bucket² over shared
    variants, not |L|·|R|; ``max_bucket`` (ON by default at 100k, the
    house guard convention) fails loudly when a degenerate hot variant
    (e.g. thousands of near-identical short keys) would make a bucket
    quadratic, rather than silently dropping pairs — linkage is exact
    or it raises; pass ``None`` to skip the two guard count jobs when
    the key distribution is known clean.

    Scale: one explode per side (O(len^d) variants per row), one
    equi-join on the variant key (AQE-planable, skew-join eligible), one
    narrow filter + distinct on dimension-sized candidate pairs. For
    10^12-row linkage use d=1 and a pre-block (length band or first
    character rides into ``left_on`` naturally since deletions preserve
    long prefixes). ``max_distance`` is capped at 2 — the variant count
    is O(len²) there and O(len³) beyond, and real linkage beyond 2 edits
    wants a similarity join (see dedup.jaccard_pairs) instead.
    """
    if not 1 <= max_distance <= 2:
        raise ValueError("max_distance must be 1 or 2")
    cand = _fuzzy_candidates(
        left, right, left_on, right_on, left_id, right_id, max_distance, max_bucket
    )
    dist = F.levenshtein(F.col("left_value"), F.col("right_value"))
    return (
        cand.withColumn("distance", dist)
        .where(F.col("distance") <= max_distance)
        .select("left_id", "left_value", "right_id", "right_value", "distance")
        .distinct()
    )


def fuzzy_self_join(
    df: DataFrame,
    on: str,
    id_col: str = "id",
    max_distance: int = 1,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """All unordered pairs of rows whose ``on`` strings are within
    ``max_distance`` edits — near-duplicate key discovery (entity
    resolution within one table). Same exact blocking as
    :func:`fuzzy_join`; pairs are emitted once with left_id < right_id,
    and exact duplicates (distance 0 on distinct ids) ARE included —
    they are linkage hits, not self-matches."""
    out = fuzzy_join(
        df, df, on, on,
        max_distance=max_distance,
        left_id=id_col, right_id=id_col,
        max_bucket=max_bucket,
    )
    return out.where(F.col("left_id") < F.col("right_id"))
