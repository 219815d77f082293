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
