"""Deterministic sampling operators for training-data curation.

All sampling here is HASH sampling, not Bernoulli RNG: a row is kept iff
``md5(salt || key)``'s first 32 bits, scaled to [0,1), fall under the
stratum's rate. That makes samples (a) exactly reproducible across runs,
engines, and cluster sizes, (b) consistent — raising a rate strictly grows
the sample (nested samples), and (c) join-stable: two tables sampled on the
same key keep the same entities. This is the standard trick for sampling
petabyte corpora where seeded RNG per partition is not reproducible under
repartitioning.

Scale shape: the keep-filter is a pure Column predicate (narrow, zero
shuffle, pushed into the scan stage). Token-budget sampling needs one
dimension-sized aggregate first (per-stratum token totals — at most a few
thousand rows for any real corpus), which is collected to the driver and
re-embedded as a literal map, so the data-path stays a single narrow scan.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_32 = 4294967296.0


def hash_fraction(key: str | Column, salt: str = "") -> Column:
    """Deterministic uniform-[0,1) value per key: first 8 hex digits of
    md5(salt || key) scaled by 2^-32. Exactly reproducible in any engine
    with md5 (the DuckDB oracle rebuilds it nibble-by-nibble)."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), k.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(TWO_32)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "strat",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each stratum at its own rate (strata absent from ``fractions``
    fall back to ``default_fraction``). Deterministic, nested, zero-shuffle."""
    if fractions:
        rate_map = F.create_map(
            *chain.from_iterable(
                (F.lit(s), F.lit(float(r))) for s, r in sorted(fractions.items())
            )
        )
        rate = F.coalesce(
            rate_map[F.col(strata_col)], F.lit(float(default_fraction))
        )
    else:
        rate = F.lit(float(default_fraction))
    return df.where(hash_fraction(key_col, salt) < rate)


def token_budget_rates(
    docs: DataFrame,
    budget_tokens: float,
    strata_col: str,
    token_col: str | Column,
) -> dict[str, float]:
    """Per-stratum keep-rates that downsample each stratum toward an equal
    share of ``budget_tokens`` (domain-balanced sampling): rate_s =
    min(1, (budget/|strata|) / tokens_s). One dimension-sized aggregate."""
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    totals = {
        r["s"]: r["t"]
        for r in docs.groupBy(F.col(strata_col).alias("s"))
        .agg(F.sum(tok).alias("t"))
        .collect()
    }
    share = budget_tokens / len(totals)
    return {s: min(1.0, share / t) for s, t in sorted(totals.items()) if t}


def sample_to_token_budget(
    docs: DataFrame,
    budget_tokens: float,
    strata_col: str,
    token_col: str | Column,
    key_col: str,
    salt: str = "budget",
) -> DataFrame:
    """Downsample ``docs`` so each stratum lands near an equal share of the
    token budget. Two jobs: a dimension-sized totals aggregate (collected,
    re-embedded as literals), then the narrow deterministic keep-filter."""
    rates = token_budget_rates(docs, budget_tokens, strata_col, token_col)
    return stratified_sample(docs, strata_col, rates, key_col, salt=salt)


def mixture_rates(
    df: DataFrame, strata_col: str, shares: dict[str, float]
) -> dict[str, float]:
    """Per-stratum keep-rates that downsample the corpus to the target
    mixture ``shares`` (the Pile/DoReMi "domain weights" step), keeping it
    as large as possible: with T = min_s(n_s / share_s) the largest
    feasible output under downsampling-only, rate_s = share_s * T / n_s
    (the binding stratum keeps everything). ``shares`` must cover every
    stratum present and is used as given (normalize upstream — summing
    floats here would make the rates depend on iteration order).

    One dimension-sized aggregate; every arithmetic step is a plain
    binary float op, so any engine (the DuckDB oracle included) derives
    bit-identical rates from the same counts."""
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    missing = sorted(s for s in counts if s not in shares)
    if missing:
        raise ValueError(f"strata without a target share: {missing}")
    absent = sorted(s for s, w in shares.items() if w > 0 and s not in counts)
    if absent:
        raise ValueError(
            f"target shares for strata with zero rows: {absent} — the "
            "requested mixture is infeasible by downsampling (nothing to "
            "keep); drop those shares or fix the corpus"
        )
    feasible = [
        float(counts[s]) / float(shares[s]) for s in counts if shares[s] > 0
    ]
    if not feasible:
        raise ValueError("every target share is zero — empty mixture")
    t = min(feasible)
    return {
        s: (float(shares[s]) * t / float(counts[s]) if shares[s] > 0 else 0.0)
        for s in sorted(counts)
    }


def mix_to_shares(
    df: DataFrame,
    strata_col: str,
    shares: dict[str, float],
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Resample the corpus toward the target mixture by deterministic hash
    sampling at ``mixture_rates``: reproducible across runs/engines/cluster
    sizes and nested (raising a share strictly grows that stratum's
    sample). Two jobs: the dimension-sized counts aggregate (collected,
    rates re-embedded as literals), then one narrow zero-shuffle
    keep-filter — the same scale shape as token-budget sampling."""
    rates = mixture_rates(df, strata_col, shares)
    return stratified_sample(df, strata_col, rates, key_col, salt=salt)


def per_group_cap(
    df: DataFrame,
    group_col: str,
    cap: int,
    key_col: str,
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically: the
    ``cap`` smallest ``hash_fraction(key)`` values win (ties broken by key).
    This is the per-domain quota step of web-corpus curation (C4/Gopher
    style "no domain may dominate the mix"), made reproducible — re-running
    on a grown corpus keeps a superset-stable selection per group because
    each row's hash never changes.

    Scale shape: the full rows never ride the rank shuffle. Only a narrow
    (group, key, hash) triplet frame (~tens of bytes/row) goes through the
    ``row_number`` window partitioned by group; survivors come back via a
    key left-semi join, which AQE turns into a broadcast when the kept set
    is small (it is at most |groups| * cap rows by construction). A hot
    group concentrates its triplets on one task, but triplets are so narrow
    that even a 10^9-row group is ~30 GB — within one executor's spill
    budget; past that, pre-filter the triplets with a per-group rate before
    the window (the kept set is always the hash-order prefix, so any
    pre-filter that provably retains >= cap rows per group is exact).

    Rows with a NULL key are EXCLUDED (filtered explicitly, not dropped as
    a join artifact): a quota selection needs a stable row identity, and
    md5(NULL) has none. ``key_col`` must identify rows within a group
    (doc_id-like): copies sharing a (group, key) travel together through
    the semi-join, so a within-group duplicate key counts once toward the
    cap but returns every copy.
    """
    from pyspark.sql import Window

    df = df.where(F.col(key_col).isNotNull())
    h = hash_fraction(key_col, salt)
    triplets = df.select(
        F.col(group_col).alias("__g"),
        F.col(key_col).alias("__k"),
        h.alias("__h"),
    )
    w = Window.partitionBy("__g").orderBy(F.col("__h"), F.col("__k"))
    kept = (
        triplets.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .select("__g", "__k")
    )
    # match on (group, key), not key alone: a key value reused across
    # groups (or duplicated within one) must not let another group's kept
    # triplet smuggle extra rows past the cap
    return df.join(
        kept,
        (df[group_col] == kept["__g"]) & (df[key_col] == kept["__k"]),
        "left_semi",
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by cumulative
    hash-fraction thresholds: reproducible across runs, engines, and
    cluster sizes, and join-stable — two tables split on the same key put
    the same entity in the same split, so features and labels never leak
    across the boundary. Zero shuffle (pure Column projection).

    ``weights`` need not sum to 1; they are normalized. Split boundaries
    follow the dict's insertion order.

    NULL keys have no hash (md5(NULL) is NULL, every threshold compare is
    NULL) so they all fall through to the LAST split, deterministically —
    acceptable for incidental nulls, but if NULL keys are common, assign
    real keys first or the last split inherits them all."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = hash_fraction(key_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += float(weights[name]) / total
        cond = h < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def split_balance(
    df: DataFrame, split_col: str = "split", label_col: str | None = None
) -> DataFrame:
    """Per-split (optionally per-label) counts and within-split fractions —
    the "did my split preserve the label mix?" audit. One groupBy over the
    split/label pair (dimension-sized result); the fraction window runs on
    that tiny aggregate frame, never on the data."""
    from pyspark.sql import Window

    keys = [split_col] + ([label_col] if label_col else [])
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(split_col)
    return counts.select(
        *keys,
        F.col("n").alias("rows"),
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("frac_of_split"),
    ).orderBy(*keys)


def sampled_violation_estimate(
    df: DataFrame,
    suite,
    key_col: str,
    fraction: float,
    salt: str = "sv",
    z: float = 1.959964,
) -> "tuple[DataFrame, dict[str, str]]":
    """Estimate each row-local expectation's violation rate from a
    deterministic hash sample, with Wilson score confidence bounds.

    At 10^12 documents a full validation pass is a deliberate spend; the
    pipeline question "did this delivery get WORSE?" only needs a bounded
    estimate. This keeps rows where ``hash_fraction(key) < fraction``
    (reproducible across engines/cluster sizes — re-running quotes the
    SAME sample, so estimates are comparable run-over-run) and computes
    every expectation's unexpected count in ONE aggregation pass over the
    sample (the same fused-mask projection as ``quarantine``). Returns
    ``(estimates, skipped)`` where estimates has one row per row-local
    expectation: (expectation, sample_n, sample_unexpected, p_hat,
    ci_low, ci_high) — Wilson 95% interval by default (z=1.96), which
    stays honest at p≈0, exactly where violation rates live.

    Cross-row checks (uniqueness/ordering) are reported in ``skipped``:
    a sampled uniqueness rate is biased (pairs must BOTH survive the
    sample), so refusing is correct, not lazy.
    """
    from .quarantine import suite_masks

    samp = df.where(hash_fraction(key_col, salt) < fraction)
    masks, skipped = suite_masks(samp, suite)
    for cfg in suite.expectations:
        from .expectations import get_expectation

        try:
            cond = getattr(
                get_expectation(cfg.expectation_type), "condition_name", None
            )
        except KeyError:
            continue
        if cond in ("column_values.unique", "compound_columns.unique"):
            skipped[f"{cfg.expectation_type}:{cfg.get('column') or ''}"] = (
                "sampled uniqueness is biased (both rows of a dup pair "
                "must survive the sample); run it exact"
            )
    aggs = [F.count(F.lit(1)).alias("sample_n")] + [
        F.sum(m.cast("long")).alias(f"__u{i}") for i, (_, m) in enumerate(masks)
    ]
    wide = samp.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("expectation"),
                F.col(f"__u{i}").alias("sample_unexpected"),
            )
            for i, (lbl, _) in enumerate(masks)
        ]
    )
    long = wide.select("sample_n", F.explode(pairs).alias("e")).select(
        F.col("e.expectation").alias("expectation"),
        "sample_n",
        F.col("e.sample_unexpected").alias("sample_unexpected"),
    )
    n = F.col("sample_n").cast("double")
    x = F.col("sample_unexpected").cast("double")
    p = x / n
    z2 = z * z
    denom = F.lit(1.0) + F.lit(z2) / n
    center = p + F.lit(z2) / (2 * n)
    rad = F.lit(z) * F.sqrt(p * (F.lit(1.0) - p) / n + F.lit(z2) / (4 * n * n))
    est = long.select(
        "expectation",
        "sample_n",
        "sample_unexpected",
        F.round(p, 6).alias("p_hat"),
        F.round(
            F.greatest(F.lit(0.0), (center - rad) / denom), 6
        ).alias("ci_low"),
        F.round(F.least(F.lit(1.0), (center + rad) / denom), 6).alias(
            "ci_high"
        ),
    ).orderBy("expectation")
    return est, skipped


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str | Column,
    key_col: str,
    salt: str = "pack",
    num_partitions: int | None = None,
) -> DataFrame:
    """Sequence packing for training: lay every document out on one
    deterministic global token stream (hash order — reproducible across
    runs, engines, and cluster sizes) and assign each its starting
    offset, training-bin id (``start_offset // seq_len``), and offset
    within the bin. This is the batch-construction step that turns a
    curated corpus into fixed-capacity training sequences; documents
    straddling a boundary are the trainer's split/pad decision — the
    engine's job is the exact, reproducible layout.

    Scale shape — a DISTRIBUTED PREFIX SUM, not a global window: a global
    ``sum() over (order by ...)`` puts the whole corpus through ONE task.
    Instead (1) range-partition the narrow (key, hash, n_tokens) triplets
    by the global order, (2) run the running sum per partition (window
    partitioned by spark_partition_id — parallel, because range
    partitioning makes partitions order-disjoint), (3) collect the
    per-partition totals (one row per partition), prefix-sum them on the
    driver, and fold the offsets back in as a literal map. All integer
    arithmetic — the oracle replays it with one SQL window, bit-exact."""
    from itertools import chain

    from pyspark.sql import Window

    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    h = hash_fraction(key_col, salt)
    narrow = df.select(
        F.col(key_col).alias("__k"),
        h.alias("__h"),
        # NULL token counts occupy zero stream positions instead of
        # poisoning a whole partition's running sum.
        F.coalesce(tok.cast("long"), F.lit(0)).alias("n_tokens"),
    )
    if num_partitions:
        narrow = narrow.repartitionByRange(
            num_partitions, F.col("__h"), F.col("__k")
        )
    else:
        narrow = narrow.repartitionByRange(F.col("__h"), F.col("__k"))
    # Persist the partitioned triplets: the driver-folded offsets map is
    # keyed by physical partition id, so the totals job and the output job
    # must see the same materialization (and the range shuffle is paid
    # once, not twice). Rows are ~40 B, so the cache stays tiny relative
    # to the corpus it lays out.
    narrow = narrow.withColumn("__pid", F.spark_partition_id()).persist()
    totals = sorted(
        (r["__pid"], int(r["t"] or 0))
        for r in narrow.groupBy("__pid")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    offsets, acc = {}, 0
    for pid, t in totals:
        offsets[pid] = acc
        acc += t
    if offsets:
        off_map = F.create_map(
            *chain.from_iterable(
                (F.lit(int(p)), F.lit(int(o))) for p, o in offsets.items()
            )
        )
        off = F.coalesce(off_map[F.col("__pid")], F.lit(0))
    else:
        off = F.lit(0)
    # Explicit ROWS frame: the default RANGE frame groups ties on
    # (__h, __k), which would hand duplicate keys overlapping offsets.
    w = (
        Window.partitionBy("__pid")
        .orderBy("__h", "__k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens") + off
    laid = narrow.select(
        F.col("__k").alias(key_col),
        "n_tokens",
        start.alias("start_offset"),
    )
    # Integer DIV, not floor(float /): the double mantissa runs out past
    # 2^53 stream positions and would disagree with the oracle's `//`.
    return laid.select(
        key_col,
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {int(seq_len)}").alias("bin_id"),
        (F.col("start_offset") % F.lit(int(seq_len))).alias("offset_in_bin"),
    )


def importance_resample(
    docs: DataFrame,
    target_model: "tuple[DataFrame, float]",
    corpus_model: "tuple[DataFrame, float] | None" = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    clip: float = 4.0,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR-style importance resampling (cf. Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score every
    document under a TARGET unigram LM (the distribution you want more
    of — curated text, a domain corpus) and under the RAW corpus model,
    weight by the likelihood ratio w = exp(nll_raw - nll_target), and
    accept with probability min(1, w/clip) using the deterministic md5
    hash — target-like documents survive at up to clip-times the rate of
    corpus-typical ones, and the same delivery resamples identically on
    any engine or cluster size. ``corpus_model`` defaults to the corpus's
    own unigram model (the standard self-vs-target setup).

    Returns (id, nll_corpus, nll_target, weight, sampled) over the full
    input — filter on ``sampled`` for the resampled corpus, keep the
    full frame for the selection audit.

    Scale shape: two ``lm_quality`` passes (token explode + vocab-sized
    join + per-doc agg each — the document payload never shuffles) and a
    final id-keyed join of the two per-doc NLL frames; the acceptance
    test is a pure Column expression. The weight is computed from the
    ROUNDED (4 dp) NLLs, which both engines reproduce bit-identically, so
    the oracle replays the accept/reject decision exactly."""
    from .text import lm_quality, unigram_model

    if corpus_model is None:
        corpus_model = unigram_model(docs, text_col)
    raw = lm_quality(docs, text_col, id_col, model=corpus_model).select(
        id_col, F.col("mean_nll").alias("nll_corpus")
    )
    tgt = lm_quality(docs, text_col, id_col, model=target_model).select(
        id_col, F.col("mean_nll").alias("nll_target")
    )
    j = raw.join(tgt, id_col)
    # the acceptance test uses the ROUNDED weight: exp() may differ by an
    # ulp between libms, and rounding to 6 dp first makes the compared
    # threshold bit-identical across engines except at astronomically
    # unlikely rounding boundaries
    w = F.round(F.exp(F.col("nll_corpus") - F.col("nll_target")), 6)
    keep_p = F.least(F.lit(1.0), w / F.lit(float(clip)))
    return j.select(
        id_col,
        "nll_corpus",
        "nll_target",
        w.alias("weight"),
        # empty docs (NULL NLL) carry no evidence either way: never
        # sampled. The guard must be explicit — least(1.0, NULL) IGNORES
        # the NULL (both engines), so keep_p alone would accept them.
        F.when(
            F.col("nll_corpus").isNull() | F.col("nll_target").isNull(),
            F.lit(False),
        )
        .otherwise(hash_fraction(id_col, salt) < keep_p)
        .alias("sampled"),
    )


def cluster_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    weights: dict[str, float],
    key_col: str,
    cluster_key: str = "doc_id",
    cluster_col: str = "cluster_id",
    salt: str = "split",
) -> DataFrame:
    """Leak-safe train/val/test split in the presence of NEAR-duplicates:
    every document is assigned the split of its dedup-cluster
    representative (``clusters`` = (doc_id, cluster_id) from
    ``dedup.duplicate_clusters``), so two near-identical documents can
    never straddle the train/test boundary — the contamination plain
    ``hash_split`` cannot see, because near-dups have different keys.
    Documents in no cluster split by their own key, which makes the
    assignment IDENTICAL to ``hash_split`` for them (same salt, same
    hash): running dedup first changes only the entangled docs.

    Returns df + a ``split`` column. Scale shape: the clusters frame is
    pair-graph-sized (orders of magnitude smaller than the corpus), so
    the left join broadcasts under AQE while it fits and shuffle-joins
    otherwise; the split assignment itself is the same zero-shuffle
    cumulative-threshold projection as ``hash_split``."""
    rep = clusters.select(
        F.col(cluster_key).alias("__ck"), F.col(cluster_col).alias("__cl")
    )
    joined = df.join(rep, F.col(key_col) == F.col("__ck"), "left").drop("__ck")
    tagged = joined.withColumn(
        "__rep",
        F.coalesce(F.col("__cl").cast("string"), F.col(key_col).cast("string")),
    )
    return hash_split(tagged, weights, "__rep", salt=salt).drop("__rep", "__cl")


def cluster_balanced_sample(
    corpus: DataFrame,
    cap: int,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "cbal",
    assign_impl: str = "arrow",
) -> DataFrame:
    """Diversity-preserving subsample over an embedding column: assign
    every vector to its nearest deterministic IVF seed centroid
    (similarity.ivf_assign — one narrow scan, zero shuffle) and keep at
    most ``cap`` rows per cluster via the hash-order quota
    (``per_group_cap``). Uniform hash sampling preserves the corpus's
    mode imbalance; capping per embedding-cluster flattens it — the
    cheap version of the cluster-balanced selection step in
    SemDeDup/DCLM-style curation pipelines.

    Deterministic end to end (seed centroids + deterministic argmax +
    md5-order quotas), so the selection is reproducible at any
    parallelism and superset-stable as the corpus grows. Returns the
    surviving rows with their ``centroid_id``; the only wide exchange is
    the quota's narrow (cluster, id, hash) triplet shuffle.
    ``assign_impl``: "arrow" (default) = mapInPandas gemm assignment,
    "fold" = the Column fold that replays bit-identically in SQL."""
    from .similarity import ivf_assign  # local: sampling is import-light

    _, assigned = ivf_assign(
        corpus, n_centroids, id_col, vec_col, assign_impl=assign_impl
    )
    return per_group_cap(assigned, "centroid_id", cap, id_col, salt=salt)


def weighted_sample(
    df: DataFrame,
    weight_col: "str | Column",
    k: int,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of ``k`` rows — the
    Efraimidis–Spirakis A-ES scheme: each row draws a deterministic
    uniform u from md5(salt || id) (:func:`hash_fraction`) and is ranked
    by the exponential key ln(u)/w (descending) — the top-k rows under
    that ordering are EXACTLY a weight-proportional sample without
    replacement. The curation use: "give me 100k docs biased toward high
    quality_score" with inclusion probability ∝ weight, reproducible at
    any parallelism and on any engine (the DuckDB oracle replays the md5
    key nibble-for-nibble, like every sampler here).

    Rows with NULL or non-positive weight are excluded (they carry no
    sampling mass); u = 0 (probability 2^-32 per row) is excluded too —
    ln(0) would be -inf. The key is ranked at FULL precision — rounding
    it to fixed decimals would collapse large-weight keys (ln(u)/w lies
    within (-2.2e-8, 0) at w=1e9) into ties resolved by id order,
    breaking the ∝-weight contract; ``id_col`` remains the total-order
    tie-break for genuinely equal keys.

    Scale shape: no shuffle of the payload at all — the ordering is a
    TakeOrderedAndProject (per-partition top-k heaps, driver merges
    #partitions × k ids), the distributed form of a priority sample.
    For k beyond driver comfort (many millions), switch to a two-pass
    threshold: estimate the k-th key on a hash-sample, filter, then
    top-up — not implemented until someone needs it.
    """
    if k <= 0:
        raise ValueError(f"weighted_sample: k must be positive, got {k}")
    w = (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast(
        "double"
    )
    u = hash_fraction(id_col, salt)
    eligible = df.where(w.isNotNull() & (w > 0) & (u > 0))
    key = F.log(u) / w
    return (
        eligible.withColumn("selection_key", key)
        .orderBy(F.desc("selection_key"), F.col(id_col).asc())
        .limit(k)
    )
