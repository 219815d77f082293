"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (10^12-doc corpus):

- **Exact**: groupBy(fingerprint) — one shuffle on a 32-hex-char key,
  perfectly parallel; AQE handles stragglers. Never groupBy raw text: the
  md5 fingerprint keeps shuffle rows ~40 bytes instead of kilobytes.
- **Pairwise Jaccard** is O(n^2) and exists only as the small-scale oracle
  / verification stage for LSH candidates. The shingle self-join caps
  shingle document-frequency (drop shingles appearing in > max_df docs) —
  without the cap one stop-shingle creates a quadratic hot key; with it the
  join is bounded by max_df^2 per shingle.
- **MinHash+LSH** is the scale path: signature = per-seed min of
  md5(seed|shingle) (a mergeable per-doc aggregate → map-side combine),
  banded into (band, bucket) keys; only docs sharing a bucket are candidate
  pairs. Cost: one explode + one groupBy(doc) + one groupBy(bucket) — all
  linear, all shuffle-balanced because buckets are md5-uniform.
- **SimHash**: 64-bit signature via per-bit majority vote over shingle
  hashes — computed entirely with integer Column ops (no UDF); near-dups =
  signatures at small Hamming distance, found by banding the 64 bits into
  k chunks (exact match on any chunk => candidate).

MinHash mins are compared as fixed-length lowercase hex *strings*:
lexicographic order == numeric order, which sidesteps 64-bit signedness
differences across engines and keeps the DuckDB oracle exact.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .expectations import Expectation as _Expectation
from .text import fingerprint, shingles


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of docs with identical normalized text:
    (fingerprint, n_docs, doc_ids). One shuffle on the 16-byte fingerprint."""
    return (
        docs.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def prefix_duplicates(
    docs: DataFrame, n_tokens: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-exact dedup on the first-n-token prefix (cheap URL/boilerplate
    style dedup): (prefix, n_docs)."""
    from .text import tokens

    prefix = F.array_join(F.slice(tokens(text_col), 1, n_tokens), " ")
    return (
        docs.select(prefix.alias("prefix"))
        .groupBy("prefix")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )


def split_passages(
    docs: DataFrame,
    block_tokens: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-width token passages: one row per (id, idx, passage) where
    passage idx covers tokens [idx*B, (idx+1)*B) — the tail block may be
    shorter. The corpus-level unit RefinedWeb-style line/passage dedup
    operates on when documents have no line structure. Pure posexplode of
    a per-doc Column build; no shuffle."""
    from .text import tokens

    toks = tokens(text_col)
    n = F.size(toks)
    nblk = F.ceil(n / F.lit(float(block_tokens))).cast("int")
    blocks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), nblk - 1),
            lambda i: F.array_join(
                F.slice(toks, i * block_tokens + 1, block_tokens), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col), F.posexplode(blocks).alias("idx", "passage")
    )


def drop_duplicate_passages(
    docs: DataFrame,
    block_tokens: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide passage dedup: every passage keeps only its globally
    FIRST occurrence (min (id, idx)); repeats — across documents or within
    one — are cut, and each document's text is rebuilt from its surviving
    passages in order. Returns (id, kept_passages, text_dedup); documents
    whose every passage was a repeat come back with kept_passages=0 and
    empty text (candidates for dropping).

    This is the removal half of boilerplate/line dedup (RefinedWeb ch. 3
    removes duplicated lines corpus-wide); ``boilerplate_ngrams`` is the
    discovery half.

    Scale shape: passages shuffle once, keyed on the passage STRING (the
    first-occurrence argmin is a groupBy MIN(struct(id, idx)) — map-side
    combine collapses a passage duplicated a billion times to one row per
    input partition, so hot passages never pile onto one task the way a
    window would; bytes/key are bounded by block_tokens). An 8-byte
    xxhash64 key would shave the shuffle but a 64-bit collision then
    silently deletes a unique passage — at corpus-scale passage counts
    birthday collisions are expected, so exactness wins here (contrast
    dataset_diff, where a collision needs the SAME join key and the trade
    is documented). The keep-verdict join is co-partitioned on the same
    key, and the rebuild is one groupBy(id) over surviving passages."""
    p = split_passages(docs, block_tokens, text_col, id_col)
    first = p.groupBy("passage").agg(
        F.min(F.struct(F.col(id_col), F.col("idx"))).alias("__o")
    )
    kept = (
        p.join(first, "passage")
        .where(
            (F.col(f"__o.{id_col}") == F.col(id_col))
            & (F.col("__o.idx") == F.col("idx"))
        )
        .select(id_col, "idx", "passage")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("kept_passages"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "passage"))),
                lambda s: s["passage"],
            ),
            " ",
        ).alias("text_dedup"),
    )
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("kept_passages", F.lit(0)).alias("kept_passages"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


# ---------------------------------------------------------------------------
# Shingle explode (shared by Jaccard + MinHash)
# ---------------------------------------------------------------------------


def doc_shingles(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """(doc_id, shingle) distinct pairs; optionally drop shingles whose
    document frequency exceeds max_df (the quadratic-hot-key guard)."""
    from .sources import ensure_parallelism

    docs = ensure_parallelism(docs)  # shingling is pre-shuffle map work
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"),
    )
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        keep = df_counts.where(F.col("df") <= max_df).select("shingle")
        # broadcast-join when the rare-shingle dictionary is small enough;
        # at corpus scale this becomes a shuffle join — still linear.
        sh = sh.join(keep, on="shingle", how="inner")
    return sh


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = 50,
) -> DataFrame:
    """All doc pairs with shingle-set Jaccard >= threshold:
    (doc_a, doc_b, jaccard). O(n^2) verification operator — the oracle and
    the LSH-candidate verifier, not the 10^12-doc discovery path.

    EAGER: the pipeline executes at call time (the result is
    localCheckpoint(eager=True)-materialized so the shingle cache can be
    released deterministically before returning). Checkpointed blocks are
    not replicated — on a real cluster an executor loss invalidates the
    returned DataFrame (it cannot recompute; re-call the function). For a
    fault-tolerant handle, write the result to a table instead of holding
    it: ``jaccard_pairs(...).write.saveAsTable(...)`` right after the call,
    which is also the 10^12-doc shape (the verify stage persists its output
    once; nothing re-reads executor memory)."""
    # The shingle table feeds the self-join twice plus the size aggregate;
    # without caching, the scan + shingle + md5 pipeline re-runs three
    # times. The table is compact ((doc_id, shingle) pairs — a fraction of
    # corpus bytes) so MEMORY_AND_DISK is safe even at large scale. The
    # cache is explicitly released before returning (the result below is
    # eagerly localCheckpoint-ed, so the returned DataFrame no longer
    # depends on the cached lineage); relying on ContextCleaner GC left
    # cached blocks piling up across repeated calls in a long-lived driver.
    from pyspark.storagelevel import StorageLevel

    sh = doc_shingles(docs, n, text_col, id_col, max_df).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )
    # materialize the (small, above-threshold) pair set so the shingle
    # cache can be dropped deterministically — localCheckpoint truncates
    # the lineage to the stored result partitions
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = 50,
) -> DataFrame:
    """Directional near-dup containment: pairs where one document's
    shingle set is mostly INSIDE the other's —
    containment(a in b) = |S_a ∩ S_b| / |S_a| >= threshold. Catches the
    quote/expansion case symmetric Jaccard structurally misses: a short
    doc fully embedded in a long one has tiny Jaccard (union is the long
    doc) but containment 1.0. Returns (doc_inner, doc_outer, containment,
    jaccard) with doc_inner the contained side; a mutual pair (both
    directions >= threshold) emits one row per direction.

    Same verification-tier shape and guards as ``jaccard_pairs``:
    distinct-shingle self-join with the max_df hot-key cap, declared
    O(n^2) on the candidate pairs — bucket with LSH first at discovery
    scale, then verify candidates here."""
    from pyspark.storagelevel import StorageLevel

    sh = doc_shingles(docs, n, text_col, id_col, max_df).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_inner"),
            F.col("b.doc_id").alias("doc_outer"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_inner")
            .withColumnRenamed("sz", "sz_inner"),
            "doc_inner",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_outer")
            .withColumnRenamed("sz", "sz_outer"),
            "doc_outer",
        )
        .withColumn(
            "containment", F.col("inter").cast("double") / F.col("sz_inner")
        )
        .where(F.col("containment") >= threshold)
        .select(
            "doc_inner",
            "doc_outer",
            F.round("containment", 4).alias("containment"),
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_inner") + F.col("sz_outer") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
    )
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _fused_minhash(
    docs: DataFrame,
    n_hashes: int,
    n: int,
    text_col: str,
    id_col: str,
    max_df: int | None,
) -> DataFrame:
    """(doc_id, m0..m{k-1}) — all per-seed minima in ONE groupBy pass:
    k fused MIN(md5(seed|shingle)) aggregate columns instead of exploding
    the shingle table k times. Shuffle input is one shingle row (not k),
    map-side combine reduces it to one k-column row per doc."""
    sh = doc_shingles(docs, n, text_col, id_col, max_df)
    aggs = [
        F.min(F.md5(F.concat_ws("|", F.lit(str(s)), F.col("shingle")))).alias(f"m{s}")
        for s in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 12,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """(doc_id, seed, minhash-hex) — the row-form view of the fused
    signature pass (stack/unpivot of _fused_minhash; identical values to
    the per-seed-explode formulation, 1/n_hashes the shuffle volume)."""
    fused = _fused_minhash(docs, n_hashes, n, text_col, id_col, max_df)
    stack = ", ".join(f"{s}, m{s}" for s in range(n_hashes))
    return fused.select(
        "doc_id",
        F.expr(f"stack({n_hashes}, {stack})").alias("seed", "minhash"),
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    n_hashes: int = 12,
    band_size: int = 3,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any (band, bucket). Bucket key
    = the band's minhashes concatenated in seed order. Returns distinct
    (doc_a, doc_b)."""
    fused = _fused_minhash(docs, n_hashes, n, text_col, id_col, max_df)
    # band bucket keys straight from the fused columns — no second shuffle
    n_bands = (n_hashes + band_size - 1) // band_size
    stack_terms = []
    for band in range(n_bands):
        cols = [f"m{s}" for s in range(band * band_size,
                                       min((band + 1) * band_size, n_hashes))]
        stack_terms.append(f"{band}, concat_ws(',', {', '.join(cols)})")
    bands = fused.select(
        "doc_id",
        F.expr(f"stack({n_bands}, {', '.join(stack_terms)})").alias(
            "band", "bucket"
        ),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, on=["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def near_duplicates(
    docs: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 12,
    band_size: int = 3,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = 50,
) -> DataFrame:
    """Scale path end-to-end: LSH candidates -> exact-Jaccard verification
    restricted to the candidate set (semi-join), so the quadratic stage only
    touches pairs LSH already voted for."""
    cands = lsh_candidate_pairs(
        docs, n_hashes, band_size, n, text_col, id_col, max_df
    )
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select("doc_b"))
        .distinct()
    )
    subset = docs.join(
        cand_docs.withColumnRenamed("doc_id", id_col), on=id_col, how="left_semi"
    )
    verified = jaccard_pairs(subset, n, threshold, text_col, id_col, max_df)
    return verified.join(cands, on=["doc_a", "doc_b"], how="left_semi")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4  # 4 x 16-bit chunks; pigeonhole covers max_hamming <= 3
DEFAULT_MAX_BUCKET = 1000  # per-(chunk, value) doc cap — quadratic-hot-key guard


def _shingle_bit(j: int) -> Column:
    """Bit j (0..63) of the shingle hash. Contract (shared with the DuckDB
    oracle): bit j = bit j%4 of hex nibble j//4 of md5(shingle). The
    nibbles live packed in two pre-projected 32-bit ints h0/h1 (8 hex chars
    each, big-endian — conv parses char 1 as the most significant nibble),
    so extraction is one shift+mask instead of per-nibble conv/substring.
    md5 is the cross-engine hash (xxhash64 has no DuckDB equivalent)."""
    k = j // 4  # nibble index 0..15
    word, pos = divmod(k, 8)  # chars 1-8 -> h0, chars 9-16 -> h1
    shift = 4 * (7 - pos) + (j % 4)
    return F.shiftright(F.col(f"h{word}"), shift).bitwiseAND(F.lit(1))


def simhash_chunks(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, c0..c3) — the 64-bit SimHash signature as four 16-bit chunk
    ints. Bit j = majority vote of bit j of md5(shingle) over the doc's
    shingles; the vote is 64 fused sum(when) columns in ONE groupBy(doc)
    pass (map-side combine, no per-bit shuffle), chunks reassembled with
    shifts. Pure integer Column ops, zero Python.

    Chunk ints (not one bigint) are the working form: 16-bit values avoid
    the sign-bit wrap at bit 63 and give the banding join 65,536 bucket
    values per chunk — the 8-bit-chunk variant had only 256, which makes
    every bucket hold n_docs/256 docs and the self-join quadratic at
    corpus scale."""
    from .sources import ensure_parallelism

    docs = ensure_parallelism(docs)  # shingle+hash is pre-shuffle map work
    sh = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"),
        )
        .select("doc_id", F.md5("shingle").alias("hh"))
        # the first 16 hex chars packed into two 32-bit ints, projected ONCE
        # per shingle row; the 64 vote aggregates then only shift+mask
        .select(
            "doc_id",
            F.conv(F.substring("hh", 1, 8), 16, 10).cast("long").alias("h0"),
            F.conv(F.substring("hh", 9, 8), 16, 10).cast("long").alias("h1"),
        )
    )
    # Packed majority votes: 3 ones-counters per long, 21 bits each —
    # counters can't carry into each other below 2^21 shingles/doc (the
    # distinct-shingle count of a doc is bounded far under that). 64 bits
    # need ceil(64/3)=22 packed SUM aggregates + one COUNT instead of 64
    # sum(±1) aggregates: 1/3 the aggregation buffers (less hash-agg memory
    # traffic at scale) and a much smaller plan (the 64-agg form carried
    # ~2.5 s of fixed Catalyst+codegen compile, BENCH/BASELINE.md "fixed
    # plan costs"). Majority: bit j set iff 2*ones_j > n_shingles —
    # identical to the old sum(±1) > 0 form, ties still round to 0.
    per = 3
    width = 21
    groups = [list(range(g, min(g + per, SIMHASH_BITS)))
              for g in range(0, SIMHASH_BITS, per)]
    packed = []
    for gi, bits in enumerate(groups):
        expr = None
        for i, j in enumerate(bits):
            t = _shingle_bit(j).cast("long")
            if i:
                t = F.shiftleft(t, width * i)
            expr = t if expr is None else expr + t
        packed.append(F.sum(expr).alias(f"g{gi}"))
    per_doc = sh.groupBy("doc_id").agg(
        *packed, F.count(F.lit(1)).alias("__n_sh")
    )
    mask = (1 << width) - 1

    def ones(j: int) -> Column:
        gi, pos = divmod(j, per)
        return F.shiftright(F.col(f"g{gi}"), width * pos).bitwiseAND(
            F.lit(mask)
        )

    chunk_cols = []
    for c in range(SIMHASH_CHUNKS):
        chunk = F.lit(0)
        for k in range(16):
            j = c * 16 + k
            chunk = chunk + F.when(
                ones(j) * 2 > F.col("__n_sh"), F.shiftleft(F.lit(1), k)
            ).otherwise(F.lit(0))
        chunk_cols.append(chunk.cast("int").alias(f"c{c}"))
    return per_doc.select("doc_id", *chunk_cols)


def simhash(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, simhash:bigint) — the assembled 64-bit signature. Bit 63
    wraps into the sign bit exactly like Java's long<<; the signature is an
    opaque word."""
    sig = simhash_chunks(docs, n, text_col, id_col)
    out = F.lit(0).cast("long")
    for c in range(SIMHASH_CHUNKS):
        out = out.bitwiseOR(F.shiftleft(F.col(f"c{c}").cast("long"), 16 * c))
    return sig.select("doc_id", out.alias("simhash"))


def simhash_near_duplicates(
    docs: DataFrame,
    max_hamming: int = 3,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash banding: 4 x 16-bit chunks; pigeonhole =>
    any pair within max_hamming <= 3 shares at least one exact chunk. Join
    per chunk bucket, then filter by true Hamming distance (bit_count of
    per-chunk xors).

    ``max_bucket`` drops (chunk_id, chunk_val) buckets holding more than
    that many docs before the self-join — the analog of ``max_df`` in
    doc_shingles: one degenerate bucket (e.g. the all-zeros chunk from
    near-empty docs) would otherwise create a quadratic hot key. Dropping a
    bucket only loses recall for pairs whose OTHER 3 chunks all differ.

    The signature subplan is referenced FOUR times (bucket census, keep
    join, both self-join sides); Spark's exchange reuse dedupes some but
    not all of the recompute. At corpus scale, compute ``simhash_chunks``
    once yourself, ``persist()`` (or write) the tiny (doc_id, c0..c3)
    frame, and pass it via ``signatures=`` — measured ~15-20% off the
    whole query at sf0.1, and at 10^12 docs it is the difference between
    one and four shingle passes. The caller owns the persistence (and the
    unpersist) — this function never caches behind your back."""
    sig = (
        signatures
        if signatures is not None
        else simhash_chunks(docs, n, text_col, id_col)
    )
    chunks = sig.select(
        "doc_id",
        *[f"c{c}" for c in range(SIMHASH_CHUNKS)],
        F.posexplode(
            F.array(*[F.col(f"c{c}") for c in range(SIMHASH_CHUNKS)])
        ).alias("chunk_id", "chunk_val"),
    )
    if max_bucket is not None:
        bucket_counts = chunks.groupBy("chunk_id", "chunk_val").agg(
            F.count(F.lit(1)).alias("__bc")
        )
        keep = bucket_counts.where(F.col("__bc") <= max_bucket).select(
            "chunk_id", "chunk_val"
        )
        chunks = chunks.join(keep, on=["chunk_id", "chunk_val"], how="inner")
    a = chunks.alias("a")
    b = chunks.alias("b")
    hamming = reduce(
        lambda x, y: x + y,
        [
            F.bit_count(
                F.col(f"a.c{c}").bitwiseXOR(F.col(f"b.c{c}")).cast("long")
            )
            for c in range(SIMHASH_CHUNKS)
        ],
    )
    return (
        a.join(b, on=["chunk_id", "chunk_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        # filter BEFORE distinct: most shared-chunk candidates fail the
        # Hamming cut, so the dedup shuffle only sees true near-dups
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Duplicate clustering (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair graph:
    (doc_id, cluster_id) where cluster_id = the smallest doc_id reachable
    through the pairs — the canonical representative a training pipeline
    keeps while dropping the rest of the cluster.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14). Each round
    rewires every edge toward its neighborhood minimum — large-star hangs
    strictly-larger neighbors off the local min, small-star collapses the
    smaller neighborhood onto it — so component diameter HALVES (or better)
    per round and convergence is O(log n) rounds regardless of graph shape.
    The previous min-label propagation was O(component diameter): correct
    for the dense blob components near-dup graphs usually produce, but a
    chain-shaped component (transitive prefix dups produce these) needed a
    round per hop and hard-failed the job at the cap. A 10^12-node chain is
    ~40 star rounds; the default cap of 25 covers any real component
    (2^25 ≈ 3·10^7 diameter).

    Each round is two key-only shuffle groupBys + joins over the PAIR graph
    (orders of magnitude smaller than the corpus); lineage is cut per round
    with localCheckpoint so the plan does not grow. Convergence = the edge
    multiset reaches a fixed point (order-insensitive xxhash64 checksum),
    at which point every component is a star rooted at its minimum.

    No GraphFrames/GraphX dependency — pure DataFrame ops, AQE-friendly.
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .where(F.col(a_col) != F.col(b_col))
        .distinct()
        .localCheckpoint(eager=True)  # pairs are often eager/expensive plans
    )
    singletons = pairs.where(F.col(a_col) == F.col(b_col)).select(
        F.col(a_col).alias("doc_id"), F.col(a_col).alias("cluster_id")
    )

    def _checksum(e: DataFrame) -> tuple[int, int]:
        # order-insensitive edge-set fingerprint; decimal sum can't overflow
        # under ANSI mode the way a long sum of 64-bit hashes does
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (r["n"], int(r["h"]))

    prev = _checksum(edges)
    for _ in range(max_iterations):
        # large-star: for each node, connect every strictly-larger neighbor
        # to min(neighborhood ∪ self); each undirected edge is emitted once,
        # from its smaller endpoint's group
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
        )
        large = (
            sym.join(lmins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star: orient (hi, lo), collapse each node's smaller
        # neighborhood onto its minimum and keep the node's own link to it
        e2 = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).where(F.col("u") != F.col("v"))
        smins = e2.groupBy("u").agg(F.min("v").alias("m"))
        joined = e2.join(smins, "u")
        edges = (
            joined.where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = _checksum(edges)
        if cur == prev:
            # fixed point: every edge is (node, component_min)
            roots = edges.select(F.col("v")).distinct()
            labels = edges.select(
                F.col("u").alias("doc_id"), F.col("v").alias("cluster_id")
            ).union(
                roots.select(F.col("v").alias("doc_id"), F.col("v").alias("cluster_id"))
            )
            return labels.union(
                singletons.join(labels.select("doc_id"), "doc_id", "left_anti")
            )
        prev = cur
    raise RuntimeError(
        f"duplicate_clusters did not converge in {max_iterations} rounds; "
        "star-contraction halves component diameter per round, so this "
        "needs a component of diameter > 2^{max_iterations} — raise "
        "max_iterations"
    )


def cluster_summary(clusters: DataFrame) -> DataFrame:
    """(cluster_id, n_docs, doc_ids) per multi-doc cluster — the 'keep
    canonical, drop the rest' worklist."""
    return (
        clusters.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def select_canonical(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """The keep/drop decision after clustering: ``docs`` + ``cluster_id``
    (own id for docs in no cluster) + ``is_canonical`` — exactly one
    keeper per duplicate cluster, everything else is the drop list a
    training pipeline filters out.

    ``quality_col=None`` keeps each cluster's smallest doc id — which IS
    ``cluster_id`` (duplicate_clusters labels components by their minimum
    member), so the flag is a comparison: zero shuffles beyond the
    membership join. With a numeric ``quality_col`` the keeper is the
    highest-quality member (ties -> smallest id) via ``min_by`` over a
    (−quality, id) struct on the CLUSTER-member subset — a key-only
    groupBy over cluster members (tiny vs the corpus) joined back narrow;
    no window over the full table."""
    cl = clusters.withColumnRenamed("doc_id", id_col)
    joined = docs.join(cl, on=id_col, how="left")
    if quality_col is None:
        return joined.withColumn(
            "cluster_id", F.coalesce("cluster_id", F.col(id_col))
        ).withColumn("is_canonical", F.col("cluster_id") == F.col(id_col))
    winners = (
        joined.where(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .agg(
            F.min_by(
                F.col(id_col),
                F.struct(
                    (-F.col(quality_col)).alias("__negq"), F.col(id_col)
                ),
            ).alias("__keep")
        )
    )
    # a non-member's coalesced cluster_id is its own id, which cannot equal
    # any cluster label (labels are member ids; ids are unique), so the
    # left join leaves __keep null exactly for non-members
    return (
        joined.withColumn(
            "cluster_id", F.coalesce("cluster_id", F.col(id_col))
        )
        .join(winners, on="cluster_id", how="left")
        .withColumn(
            "is_canonical",
            F.col("__keep").isNull() | (F.col("__keep") == F.col(id_col)),
        )
        .drop("__keep")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap against a holdout set)
# ---------------------------------------------------------------------------


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train/test decontamination: (id, n_overlap) for every corpus doc
    sharing >= min_overlap DISTINCT word n-grams with the benchmark set —
    the GPT-3-style n-gram-collision contamination check.

    Scale shape: the benchmark n-gram set is tiny next to a 100 TB corpus,
    so it is collected into a broadcast hash join — the corpus side
    explodes its distinct per-doc shingles map-side, joins with ZERO corpus
    shuffle, and only the matched (doc, shingle) rows reach the one
    doc_id-keyed aggregation. No cartesian anything; hot shingles cannot
    skew the join (broadcast), only the final count shuffle, which is keyed
    by doc_id (near-unique).
    """
    from . import text as _text

    bench_sh = (
        benchmark.select(
            F.explode(F.array_distinct(_text.shingles(text_col, n))).alias("shingle")
        )
        .distinct()
    )
    corp_sh = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(_text.shingles(text_col, n))).alias("shingle"),
    )
    return (
        corp_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .where(F.col("n_overlap") >= min_overlap)
    )


def incremental_dedup(
    new_docs: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "tuple[DataFrame, DataFrame]":
    """Dedup a NEW delivery against the historical corpus without touching
    it: ``seen`` is the running fingerprint store (one 'fingerprint'
    column — 16-byte md5 of the normalized token stream, the same
    ``text.fingerprint`` every batch writes), and the delivery keeps only
    documents that are (a) first within the batch (min id per
    fingerprint) and (b) absent from the store. Returns
    ``(kept, new_fingerprints)`` — append new_fingerprints to the store
    and the loop is closed; day N+1 never rescans days 1..N's text.

    Scale shape: one fingerprint-keyed groupBy over the delivery (batch
    self-dedup, map-side combine), one LEFT ANTI join against the
    store's fingerprint column (un-hinted: AQE broadcasts a small store,
    shuffle-joins a 10^12-row one on the 16-byte key — the document
    payload rides only the delivery side, the store contributes keys
    alone)."""
    from .text import fingerprint

    # Recompute the fingerprint even when the delivery already carries one
    # (a previous batch's `kept` output fed back in): dropping stale
    # 'fingerprint'/reserved temporaries first keeps the output schema
    # single-valued instead of duplicating the column name.
    tagged = new_docs.drop("fingerprint", "__fp", "__keep_id").withColumn(
        "__fp", fingerprint(text_col)
    )
    batch_first = tagged.groupBy("__fp").agg(
        F.min(F.col(id_col)).alias("__keep_id")
    )
    firsts = tagged.join(batch_first, "__fp").where(
        F.col(id_col) == F.col("__keep_id")
    )
    kept = firsts.join(
        seen.select(F.col("fingerprint").alias("__fp")),
        "__fp",
        "left_anti",
    ).drop("__keep_id")
    new_fps = kept.select(F.col("__fp").alias("fingerprint"))
    return kept.withColumnRenamed("__fp", "fingerprint"), new_fps


# ---------------------------------------------------------------------------
# Exact duplicated-substring spans (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better" — the ExactSubstr variant)
# ---------------------------------------------------------------------------


def duplicate_spans(
    docs: DataFrame,
    min_len: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact: bool = False,
) -> DataFrame:
    """Maximal character spans covered by substrings of length >= min_len
    that occur more than once in the WHOLE corpus (across documents or
    within one) — the span-level exact-substring dedup of Lee et al.
    2022, reformulated for Spark without the single-machine suffix array.

    Returns (id, span_start, span_end) rows, end exclusive, 0-based.
    Coverage is exact by construction: a character sits inside a span
    iff it belongs to some duplicated substring of length >= min_len.
    Proof sketch: a duplicated s[a:b) with b-a >= L makes every L-gram
    starting in [a, b-L] duplicated, so [a, b) is fully covered by the
    merged [p, p+L) intervals; conversely every marked position IS a
    duplicated L-gram.

    Rows are identified by CONTENT, not just ``id_col``: grouping and
    the scrub join-back key on ``xxhash64(id, text)``, so two rows that
    share an id but differ in text get independent (correct) spans —
    they merely share the id in the output. Identical (id, text) rows
    collapse to one span set (their positions are unioned first, which
    is the same set).

    Scale shape (the suffix-array-free formulation): one posexplode to
    (id, position, gram-key) — ~one row per corpus CHARACTER, the
    honest cost of span-exact dedup; with ``exact=False`` the key is
    xxhash64(gram) so shuffle rows are ~20 bytes regardless of
    min_len (a 64-bit collision falsely marks one position duplicated
    — at 10^15 positions that is a ~1e-5 fraction of false spans,
    acceptable for scrubbing; pass ``exact=True`` to shuffle the gram
    text itself and make discovery collision-free, at min_len x the
    bytes). Occurrence counting is a groupBy on the key — map-side
    combine collapses a billion-fold hot gram (whitespace runs,
    boilerplate) to one row per input partition; the join back to
    positions is key-co-partitioned and AQE-skew-splittable. Span
    merging is a per-document window (lag + running sum — gaps and
    islands), bounded by document length."""
    return _attach_id(
        _dup_spans_keyed(docs, min_len, text_col, id_col, exact),
        docs, text_col, id_col,
    )


def _gram_keys(text: Column, L: int, exact: bool) -> Column:
    """Array of per-position L-gram keys for one text Column — the gram
    hash (20-byte shuffle rows at any L) or the gram text (exact)."""
    gram = lambda p: text.substr(p + 1, F.lit(L))  # noqa: E731
    key_fn = (lambda p: gram(p)) if exact else (lambda p: F.xxhash64(gram(p)))
    return F.transform(F.sequence(F.lit(0), F.length(text) - L), key_fn)


def _row_key(docs: DataFrame, text_col: str, id_col: str) -> Column:
    """Per-row content key: xxhash64(id, text)."""
    return F.xxhash64(F.col(id_col), F.col(text_col))


def _gram_frame(
    docs: DataFrame, min_len: int, text_col: str, id_col: str, exact: bool
) -> DataFrame:
    """(__rk, p, k): one row per corpus character position, where
    __rk = xxhash64(id, text) is the per-row-content key and k the
    L-gram key at position p. Deliberately id-free: the position stream
    is the largest frame in the pipeline (it crosses the occurrence
    count AND the probe join), so it carries only three fixed-width
    columns; callers re-attach the id from a document-count-sized
    (__rk, id) map at the end."""
    L = int(min_len)
    if L < 2:
        raise ValueError("min_len must be >= 2")
    base = docs.where(F.length(text_col) >= L).select(
        _row_key(docs, text_col, id_col).alias("__rk"),
        F.col(text_col).alias("__t"),
    )
    return base.select(
        "__rk",
        F.posexplode(_gram_keys(F.col("__t"), L, exact)).alias("p", "k"),
    )


def _positions_to_spans(pos: DataFrame, min_len: int) -> DataFrame:
    """Gaps-and-islands merge of marked positions into maximal
    (overlapping-or-adjacent) [p, p+L) spans, per content key:
    (__rk, span_start, span_end)."""
    L = int(min_len)
    w = Window.partitionBy("__rk").orderBy("p")
    islands = pos.withColumn(
        "__brk",
        F.when(F.col("p") > F.lag("p").over(w) + L, 1).otherwise(0),
    ).withColumn("__island", F.sum("__brk").over(w))
    return islands.groupBy("__rk", "__island").agg(
        F.min("p").alias("span_start"),
        (F.max("p") + L).alias("span_end"),
    ).select("__rk", "span_start", "span_end")


def _attach_id(
    spans: DataFrame, docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Join the per-row-content-keyed spans back to ids over the
    document-count-sized (__rk, id) map (distinct: identical (id, text)
    rows share one span set by design)."""
    rk_map = docs.select(
        _row_key(docs, text_col, id_col).alias("__rk"), F.col(id_col)
    ).distinct()
    return spans.join(rk_map, "__rk").select(
        id_col, "span_start", "span_end"
    )


def _dup_spans_keyed(
    docs: DataFrame,
    min_len: int,
    text_col: str,
    id_col: str,
    exact: bool,
) -> DataFrame:
    """duplicate_spans core, returning (__rk, span_start, span_end)
    where __rk = xxhash64(id, text) is the per-row-content key used for
    grouping (and by scrub_duplicate_spans for the join-back)."""
    grams = _gram_frame(docs, min_len, text_col, id_col, exact)
    dup_keys = (
        grams.groupBy("k").agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > 1)
        .select("k")
    )
    dup_pos = grams.join(dup_keys, "k").select("__rk", "p")
    return _positions_to_spans(dup_pos, min_len)


def scrub_duplicate_spans(
    docs: DataFrame,
    min_len: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact: bool = False,
) -> DataFrame:
    """Cut every ``duplicate_spans`` region out of each document's text
    — the removal half of exact-substring dedup. Returns
    (id, n_dup_spans, dup_chars, text_clean); untouched documents come
    back whole with zero counts, fully-duplicated ones with ''.

    The rebuild is one groupBy collecting each document's (disjoint,
    sorted) spans plus a pure-JVM F.aggregate fold over them — cursor
    walks the original text, concatenating the gaps between spans and
    the tail after the last one; no Python touches the strings. The
    join-back keys on xxhash64(id, text) (see duplicate_spans), so
    same-id rows with different text each get their own correct
    rebuild."""
    spans = _dup_spans_keyed(docs, min_len, text_col, id_col, exact)
    return _scrub_spans(
        docs, spans, text_col, id_col, "n_dup_spans", "dup_chars"
    )


def _scrub_spans(
    docs: DataFrame,
    spans_keyed: DataFrame,
    text_col: str,
    id_col: str,
    n_col: str,
    chars_col: str,
) -> DataFrame:
    """Shared rebuild: cut the (__rk, span_start, span_end) regions out
    of each document and re-concatenate the gaps with a pure-JVM
    F.aggregate fold; join-back keys on xxhash64(id, text)."""
    per_doc = spans_keyed.groupBy("__rk").agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("__spans")
    )
    joined = docs.select(
        F.xxhash64(F.col(id_col), F.col(text_col)).alias("__rk"),
        id_col,
        F.col(text_col).alias("__t"),
    ).join(per_doc, "__rk", "left")
    sp = F.coalesce(
        "__spans",
        F.array().cast("array<struct<span_start:int,span_end:int>>"),
    )
    clean = F.aggregate(
        sp,
        F.struct(F.lit(0).alias("c"), F.lit("").alias("acc")),
        lambda st, s: F.struct(
            s["span_end"].alias("c"),
            F.concat(
                st["acc"],
                F.col("__t").substr(st["c"] + 1, s["span_start"] - st["c"]),
            ).alias("acc"),
        ),
        lambda st: F.concat(
            st["acc"],
            F.col("__t").substr(st["c"] + 1, F.length("__t") - st["c"]),
        ),
    )
    return joined.select(
        id_col,
        F.size(sp).alias(n_col),
        F.aggregate(
            sp,
            F.lit(0),
            lambda a, s: a + s["span_end"] - s["span_start"],
        ).alias(chars_col),
        clean.alias("text_clean"),
    )


def _contaminated_pos(
    corpus: DataFrame,
    benchmark: DataFrame,
    min_len: int,
    text_col: str,
    id_col: str,
    bench_text_col: str | None,
    exact: bool,
) -> DataFrame:
    """Corpus character positions whose L-gram also occurs anywhere in
    the benchmark: corpus gram explode semi-joined against the
    benchmark's DISTINCT gram-key set (array_distinct per doc before the
    explode, then a map-side-combined distinct — benchmark-internal
    repetition never inflates the join input)."""
    grams = _gram_frame(corpus, min_len, text_col, id_col, exact)
    btc = bench_text_col or text_col
    L = int(min_len)
    bkeys = (
        benchmark.where(F.length(btc) >= L)
        .select(
            F.explode(
                F.array_distinct(_gram_keys(F.col(btc), L, exact))
            ).alias("k")
        )
        .distinct()
    )
    return grams.join(bkeys, "k", "left_semi").select("__rk", "p")


def contaminated_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    min_len: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    exact: bool = False,
) -> DataFrame:
    """Maximal character spans of ``corpus`` documents covered by
    substrings of length >= min_len that ALSO appear anywhere in
    ``benchmark`` — the span-level form of benchmark decontamination
    (``contamination`` counts whole-doc n-gram overlap; this localizes
    the leaked text). Returns (id, span_start, span_end), end
    exclusive; same coverage-exactness argument as duplicate_spans.

    Scale shape: the corpus side is the duplicate_spans gram explode
    (~one narrow row per corpus character). The benchmark side reduces
    to its DISTINCT gram-key set BEFORE the join — array_distinct per
    doc, then a map-side-combined distinct, so benchmark-internal
    repetition never inflates the join input — and benchmark text
    itself never crosses the shuffle (keys are 8-byte hashes unless
    ``exact=True``). Benchmarks are corpus-tiny, so the semi-join
    usually broadcasts; at worst it is key-co-partitioned."""
    pos = _contaminated_pos(
        corpus, benchmark, min_len, text_col, id_col, bench_text_col, exact
    )
    return _attach_id(
        _positions_to_spans(pos, min_len), corpus, text_col, id_col
    )


def scrub_contaminated_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    min_len: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    exact: bool = False,
) -> DataFrame:
    """Cut every ``contaminated_spans`` region out of each corpus
    document — span-level benchmark decontamination: the document
    survives, the leaked eval text does not. Returns (id,
    n_contaminated_spans, contaminated_chars, text_clean); clean
    documents come back whole, fully-leaked ones with ''. Same
    fold-rebuild and xxhash64(id, text) join-back as
    scrub_duplicate_spans."""
    pos = _contaminated_pos(
        corpus, benchmark, min_len, text_col, id_col, bench_text_col, exact
    )
    spans = _positions_to_spans(pos, min_len)
    return _scrub_spans(
        corpus,
        spans,
        text_col,
        id_col,
        "n_contaminated_spans",
        "contaminated_chars",
    )


def duplicate_span_stats(
    docs: DataFrame,
    min_len: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact: bool = False,
) -> DataFrame:
    """One-row corpus summary of exact-substring duplication: how much
    of the corpus sits inside ``duplicate_spans`` regions. Columns:
    total_docs, total_chars, docs_with_dups, dup_spans, dup_chars,
    dup_fraction (= dup_chars / total_chars, 6dp).

    Multiplicity-exact: identical (id, text) rows collapse to one span
    set inside duplicate_spans, so their per-row dup_chars is re-weighted
    by the row count of each content key — the fraction counts every
    physical copy, matching what a per-row scrub would remove. Both
    frames in the final join are document-count-sized; NULL texts count
    as zero-length (in domain, never duplicated)."""
    spans = _dup_spans_keyed(docs, min_len, text_col, id_col, exact)
    per_key = spans.groupBy("__rk").agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("__dup"),
        F.count(F.lit(1)).alias("__nspans"),
    )
    counts = docs.groupBy(
        F.xxhash64(F.col(id_col), F.col(text_col)).alias("__rk")
    ).agg(
        F.count(F.lit(1)).alias("__m"),
        F.sum(F.coalesce(F.length(text_col), F.lit(0))).alias("__chars"),
    )
    j = counts.join(per_key, "__rk", "left")
    dup = F.coalesce(F.col("__dup"), F.lit(0))
    return j.agg(
        F.sum("__m").alias("total_docs"),
        F.sum("__chars").alias("total_chars"),
        F.coalesce(
            F.sum(F.when(F.col("__dup") > 0, F.col("__m"))), F.lit(0)
        ).alias("docs_with_dups"),
        F.sum(F.coalesce(F.col("__nspans"), F.lit(0)) * F.col("__m")).alias(
            "dup_spans"
        ),
        F.sum(dup * F.col("__m")).alias("dup_chars"),
        F.round(
            F.sum(dup * F.col("__m"))
            / F.greatest(F.sum("__chars"), F.lit(1)),
            6,
        ).alias("dup_fraction"),
    )


class DuplicateSpanFractionExpectation(_Expectation):
    """expect_column_duplicate_span_fraction_to_be_less_than(column=...,
    threshold=..., min_len=40, id_column="doc_id", exact=False): success
    iff the fraction of corpus characters inside exact duplicated
    substrings of length >= min_len (duplicate_spans semantics) is below
    ``threshold`` — the checkpointable "is tomorrow's delivery still
    mostly novel text" gate, the suite-level form of
    dedup.duplicate_span_stats. An all-NULL/empty text column observes
    0.0 (rows present, nothing duplicated); only a truly empty domain is
    a vacuous success with observed None. No reference analog (GX has no
    corpus-level dedup expectation); registered as a sparkcheck
    extension."""

    name = "expect_column_duplicate_span_fraction_to_be_less_than"

    def _metric_cfg(self, cfg):
        from .expectations import build_domain
        from .metrics import MetricConfiguration, freeze_kwargs

        return MetricConfiguration(
            "column.duplicate_span_fraction",
            build_domain(cfg),
            freeze_kwargs(
                min_len=int(cfg.get("min_len", 40)),
                id_column=cfg.get("id_column", "doc_id"),
                exact=bool(cfg.get("exact", False)),
            ),
        )

    def metric_requests(self, cfg, rf):
        # a missing threshold must fail BEFORE the corpus-wide span
        # scan runs, not after it
        if cfg.get("threshold") is None:
            raise ValueError(
                "expect_column_duplicate_span_fraction_to_be_less_than "
                "needs threshold"
            )
        return {"stats": self._metric_cfg(cfg)}

    def validate(self, cfg, rf, resolver):
        threshold = cfg.get("threshold")
        obs = resolver[self._metric_cfg(cfg)]
        if obs is None:  # empty domain: vacuous success, like benford
            ret = {"success": True, "result": {"observed_value": None}}
        else:
            ret = {"success": obs["dup_fraction"] < float(threshold)}
            if rf["result_format"] != "BOOLEAN_ONLY":
                ret["result"] = {
                    "observed_value": obs["dup_fraction"],
                    "details": {
                        k: obs[k]
                        for k in (
                            "total_docs",
                            "total_chars",
                            "docs_with_dups",
                            "dup_spans",
                            "dup_chars",
                        )
                    },
                }
        if rf["result_format"] == "BOOLEAN_ONLY":
            ret.pop("result", None)
        return ret


def _register_duplicate_span_fraction():
    from .expectations import register_expectation
    from .metrics import eager_metric

    @eager_metric("column.duplicate_span_fraction")
    def _dup_span_fraction_metric(resolver, ddf, cfg, resolved):
        col = cfg.domain.column
        id_col = cfg.kw("id_column", "doc_id")
        if id_col not in ddf.columns:
            raise ValueError(
                "column.duplicate_span_fraction needs id_column "
                f"{id_col!r} in the frame (pass id_column=... on the "
                "expectation to point at the document-identity column)"
            )
        row = duplicate_span_stats(
            ddf.select(id_col, col),
            min_len=int(cfg.kw("min_len", 40)),
            text_col=col,
            id_col=id_col,
            exact=bool(cfg.kw("exact", False)),
        ).collect()[0]
        # only a rowless domain is "no observation"; rows with all-NULL
        # text are in domain and observe dup_fraction 0.0
        if not row["total_docs"]:
            return None
        return row.asDict()

    register_expectation(DuplicateSpanFractionExpectation())


_register_duplicate_span_fraction()


def lsh_design(
    threshold: float,
    n_hashes_max: int = 1024,
    target_recall: float = 0.9,
    max_fp_below: float = 0.05,
) -> "dict":
    """Pick MinHash-LSH banding parameters analytically — the knob-tuning
    companion to :func:`lsh_candidate_pairs` / :func:`near_duplicates`.

    For b bands of r rows each, a pair with Jaccard similarity s becomes
    a candidate with probability P(s) = 1 − (1 − s^r)^b (the S-curve;
    Leskovec/Rajaraman/Ullman, Mining of Massive Datasets §3.4). This
    searches every (b, r) with b·r ≤ ``n_hashes_max`` (default 1024 —
    separating s=0.5 dups from s=0.25 background needs hundreds of
    permutations, which is why production MinHash pipelines run
    256–9000 hashes) and returns the
    cheapest configuration (fewest total hashes, then fewest bands)
    whose curve has recall ≥ ``target_recall`` at ``threshold`` AND a
    candidate rate ≤ ``max_fp_below`` at similarity threshold/2 (the
    "clearly-not-duplicates" operating point) — i.e. the smallest
    signature that still separates dup from non-dup at your threshold.
    Raises if no configuration within the budget achieves both (lower
    the recall target or raise the hash budget).

    Returns {n_hashes, band_size (=r), n_bands (=b), recall_at_threshold,
    fp_rate_at_half_threshold, s50} where s50 = (1/b)^(1/r) is the
    curve's midpoint — the similarity at which a pair has ~50% candidate
    probability. Pure driver-side arithmetic; feed the result straight
    into near_duplicates(n_hashes=..., band_size=...).
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")

    def curve(s: float, b: int, r: int) -> float:
        return 1.0 - (1.0 - s**r) ** b

    best = None
    for r in range(1, n_hashes_max + 1):
        for b in range(1, n_hashes_max // r + 1):
            rec = curve(threshold, b, r)
            fp = curve(threshold / 2.0, b, r)
            if rec >= target_recall and fp <= max_fp_below:
                key = (b * r, b)
                if best is None or key < best[0]:
                    best = (key, b, r, rec, fp)
    if best is None:
        raise ValueError(
            f"no (bands, rows) with <= {n_hashes_max} hashes reaches "
            f"recall >= {target_recall} at s={threshold} with candidate "
            f"rate <= {max_fp_below} at s={threshold / 2}; raise "
            "n_hashes_max or relax the targets"
        )
    _, b, r, rec, fp = best
    return {
        "n_hashes": b * r,
        "band_size": r,
        "n_bands": b,
        "recall_at_threshold": round(rec, 6),
        "fp_rate_at_half_threshold": round(fp, 6),
        "s50": round((1.0 / b) ** (1.0 / r), 6),
    }
