"""Text analysis operators (BASELINE.json north star): language-ID,
quality scoring, token counting, fingerprinting. Pure column expressions;
the scoring tables (stopword markers) are tiny literal arrays folded into
the plan — no side lookups, no UDFs."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal high-frequency marker words per language (public common-word
# lists). Enough signal for a heuristic n-gram/stopword language ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "est", "que"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"),
    "es": ("el", "la", "los", "las", "de", "y", "un", "una", "es", "que"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "zhe4", "bu4", "ren2"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count without materializing the array."""
    return F.length(text) - F.length(F.regexp_replace(text, " ", "")) + 1


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish proxy: count word pieces after splitting on whitespace
    AND punctuation/digit boundaries (a cheap BPE stand-in: ~chars/4 floor).
    Deterministic, expression-only."""
    pieces = F.split(F.regexp_replace(text, r"([^\w\s]|\d)", " $1 "), r"\s+")
    n_pieces = F.size(F.filter(pieces, lambda x: x != ""))
    return F.greatest(n_pieces, F.ceil(F.length(text) / 4).cast("int"))


def lang_scores(text: Column) -> list[Column]:
    """Per-language marker hit counts over the token set."""
    toks = F.array_distinct(F.split(F.lower(text), " "))
    cols = []
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        cols.append(F.size(F.array_intersect(toks, marker_arr)).alias(f"score_{lang}"))
    return cols


def detect_language(text: Column) -> Column:
    """argmax over marker scores; 'und' (undetermined) when all zero.

    Tie-break: the struct comparison in array_max is (score, lang)
    lexicographic, so equal scores resolve to the alphabetically LAST
    language code (zh > fr > es > en > de) — the DuckDB oracle in
    plans/text.text_langid implements the same order."""
    toks = F.array_distinct(F.split(F.lower(text), " "))
    pairs = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        marker_arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.array_intersect(toks, marker_arr))
        pairs.append(F.struct(score.alias("s"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*pairs))
    return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard corpus-quality signals, one pass, no shuffle."""
    text = F.col(text_col)
    n_tok = token_count(text)
    toks = F.split(text, " ")
    n_distinct = F.size(F.array_distinct(toks))
    mean_word_len = (F.length(text) - (n_tok - 1)) / n_tok
    punct = F.length(F.regexp_replace(text, r"[^\.,;:!\?]", ""))
    return df.withColumns(
        {
            "n_chars": F.length(text),
            "n_tokens": n_tok,
            "n_distinct_tokens": n_distinct,
            "lexical_diversity": F.round(n_distinct / n_tok, 4),
            "mean_word_len": F.round(mean_word_len, 4),
            "punct_ratio": F.round(punct / F.greatest(F.length(text), F.lit(1)), 4),
            "quality": F.round(
                F.least(F.lit(1.0), n_tok / 200.0) * (n_distinct / n_tok), 4
            ),
        }
    )


def fingerprint(text: Column) -> Column:
    """Order-insensitive content identity: md5 over the sorted distinct
    token set (rolling-hash-class document fingerprint)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(F.split(text, " "))), " "))


def raw_ngrams(text: Column, n: int = 5) -> Column:
    """Word n-grams WITH multiplicity (unlike dedup.shingles, which
    deduplicates for set semantics). Multiplicity is the point here: the
    duplicate-n-gram fraction below needs repeated windows to count."""
    toks = F.split(text, " ")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), k), lambda i: F.array_join(F.slice(toks, i, n), " ")
    )


def duplicate_ngram_fraction(text: Column, n: int = 5) -> Column:
    """Fraction of word n-gram occurrences that are repeats of an earlier
    n-gram in the same document (Gopher-style repetition quality signal):
    1 - distinct/total. Per-row expression — no shuffle at any scale."""
    g = raw_ngrams(text, n)
    return F.round(
        1.0 - F.size(F.array_distinct(g)).cast("double") / F.size(g), 4
    )


def hash_split(id_col: Column, boundaries: tuple[str, str] = ("c0", "e0")) -> Column:
    """Deterministic train/val/test assignment from the first md5 hex byte
    of the id: < boundaries[0] -> train, < boundaries[1] -> val, else test.
    Defaults give 75/12.5/12.5. Hex-string comparison is engine-portable
    (no hex->int parse); assignment is stable under any repartitioning,
    reshuffling, or re-run — the property a 100 TB pipeline needs."""
    h = F.substring(F.md5(id_col.cast("string")), 1, 2)
    return (
        F.when(h < boundaries[0], F.lit("train"))
        .when(h < boundaries[1], F.lit("val"))
        .otherwise(F.lit("test"))
    )


def deterministic_sample(df: DataFrame, id_col: str, hex2_max: str = "1a") -> DataFrame:
    """Stable ~(x/256) sample: keep rows whose md5 first hex byte is below
    `hex2_max` ('1a' ~ 10.2%). Unlike df.sample(), membership is a pure
    function of the id — reproducible across runs, engines, partitionings."""
    return df.filter(F.substring(F.md5(F.col(id_col).cast("string")), 1, 2) < hex2_max)


def idf_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus document-frequency + inverse-document-frequency per token.
    Two-stage agg: per-doc distinct explode (map-side), then token groupBy;
    the scalar corpus size joins in as a broadcast single-row cross join."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("token"),
    )
    dfreq = toks.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    return dfreq.crossJoin(F.broadcast(n_docs)).select(
        "token",
        "df",
        F.round(F.log(F.col("n_docs").cast("double") / F.col("df")), 4).alias("idf"),
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean unigram log2-probability under the corpus's own
    unigram LM — the classic cheap quality/surprisal filter (very negative
    = rare-token-heavy gibberish; near zero = high-frequency boilerplate).

    Shape: token explode -> corpus frequency agg -> join back -> per-doc
    avg. The frequency join carries NO broadcast hint on purpose: the
    vocabulary is usually small enough that AQE converts it to a broadcast
    join at runtime from the observed shuffle size, but at web scale the
    distinct-token table (URLs, typos, numbers) can outgrow driver/
    broadcast limits, and a forced hint would OOM where a shuffle join
    just works. The single-row total IS safe to broadcast. Output: (id,
    n_tokens, lm_logprob) rounded to 6 dp for cross-engine float parity."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    return (
        toks.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.log2(F.col("c").cast("double") / F.col("t"))), 6
            ).alias("lm_logprob"),
        )
    )


def line_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style line-level repetition/format signals per document:
    n_lines, fraction of duplicate lines, fraction of characters inside
    duplicate lines, fraction of bullet-prefixed lines, fraction of
    ellipsis-terminated lines. The standard web-corpus filter set
    (boilerplate menus and nav bars show up as repeated lines).

    Shape: explode lines -> (doc, line) count agg -> per-doc rollup. Both
    aggregates are map-side combinable; grain is bounded by line count,
    never quadratic in lines per doc."""
    lines = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "\n")).alias("line")
    )
    per_line = lines.groupBy(id_col, "line").agg(F.count("*").alias("n"))
    chars = F.col("n") * F.length("line")
    dup = F.col("n") > 1
    return per_line.groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_lines"),
        F.round(1 - F.count("*") / F.sum("n").cast("double"), 6).alias(
            "frac_dup_lines"
        ),
        F.round(
            F.sum(F.when(dup, chars).otherwise(0))
            / F.greatest(F.sum(chars), F.lit(1)).cast("double"),
            6,
        ).alias("frac_chars_dup_lines"),
        F.round(
            F.sum(F.when(F.col("line").startswith("- "), F.col("n")).otherwise(0))
            / F.sum("n").cast("double"),
            6,
        ).alias("frac_bullet_lines"),
        F.round(
            F.sum(F.when(F.col("line").endswith("..."), F.col("n")).otherwise(0))
            / F.sum("n").cast("double"),
            6,
        ).alias("frac_ellipsis_lines"),
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_weight: float = 0.0,
) -> DataFrame:
    """Deterministic corpus-mixing downsample: keep each row of stratum s
    with probability ``weights[s]`` — the pretraining data-mixing step
    (e.g. upweight books, cap web crawl). Membership is a pure function of
    the row id (md5 prefix vs a per-stratum hex threshold), so the sample
    is reproducible across runs, engines, and partitionings, and composes
    with :func:`hash_split` (independent hash salts).

    Scale: one broadcastable CASE expression, zero shuffles. Thresholds
    are quantized to 4 hex digits (65536 buckets): keep-rate error ≤
    1/65536, exactness of the comparison is what makes the DuckDB oracle
    replayable."""
    def hex4(p: float) -> str:
        q = int(p * 65536)
        if q >= 65536:
            return "g"  # sorts above every 4-hex-digit prefix: keep all
        return format(max(0, q), "04x")

    expr = None
    h = F.substring(F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))), 1, 4)
    for stratum, p in sorted(weights.items()):
        cond = F.col(strata_col) == stratum
        keep = h < hex4(p)
        expr = F.when(cond, keep) if expr is None else expr.when(cond, keep)
    default_keep = h < hex4(default_weight)
    expr = expr.otherwise(default_keep) if expr is not None else default_keep
    return df.filter(expr)


def pack_sequences(
    df: DataFrame,
    capacity: int = 512,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous sequence packing for training shards: within each shard,
    lay documents end-to-end in deterministic md5(id) order and chunk the
    token stream at `capacity`. Emits per-doc placement: shard-local order,
    start offset, and the bins the doc starts/ends in (a doc may straddle
    a boundary — trainers split it across sequences).

    Scale posture: the running offset is a window over (shard, hash order)
    — state never crosses shards, so packing parallelizes over shards the
    way production packers do; no global sort exists anywhere."""
    from pyspark.sql import Window

    n_tok = token_count(F.col(text_col))
    w = Window.partitionBy(shard_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    cum = F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.select(shard_col, id_col, n_tok.alias("n_tokens"))
        .withColumn("pack_order", F.row_number().over(w))
        .withColumn("start_offset", (cum - F.col("n_tokens")).cast("long"))
        .withColumn("start_bin", (F.col("start_offset") / capacity).cast("long"))
        .withColumn(
            "end_bin",
            ((cum - 1) / capacity).cast("long"),
        )
    )


def contamination(
    df: DataFrame,
    shingle_n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
) -> DataFrame:
    """Train/test contamination: evaluation documents sharing at least one
    word `shingle_n`-gram with any training document. The shingle equi-join
    replaces the quadratic cross-comparison — same scale posture as the
    MinHash-LSH candidate join (uniform hash keys, broadcast-free)."""
    from .dedup import shingles

    sh = df.select(
        F.col(id_col),
        F.col(split_col),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    train = sh.filter(F.col(split_col) == "train").select(
        F.col("shingle"), F.col(id_col).alias("train_doc")
    )
    test = sh.filter(F.col(split_col) != "train").select(
        F.col("shingle"), F.col(id_col).alias("test_doc"), F.col(split_col)
    )
    return (
        test.join(train, "shingle")
        .groupBy("test_doc", split_col)
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("train_doc").alias("n_train_docs"),
        )
    )


def temperature_rates(
    df: DataFrame,
    strata_col: str = "source",
    alpha: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum keep rates for temperature-based mixture resampling
    (the multilingual rebalancing step): rate ∝ token-share^(alpha-1),
    normalized so the rarest stratum keeps everything. Rates are 6-dp
    rounded so both engines threshold identical doubles. Output
    (strata_col, s_tokens, rate) — |strata| rows, localCheckpointed
    because every caller consumes it at least twice (keep filter +
    reporting rollup)."""
    n_tok = (
        F.length(text_col) - F.length(F.regexp_replace(text_col, " ", "")) + 1
    )
    per = df.groupBy(strata_col).agg(F.sum(n_tok).alias("s_tokens"))
    tot = per.agg(F.sum("s_tokens").cast("double").alias("n"))
    raw = per.crossJoin(F.broadcast(tot)).select(
        strata_col,
        "s_tokens",
        F.pow(F.col("s_tokens") / F.col("n"), alpha - 1.0).alias("w"),
    )
    mx = raw.agg(F.max("w").alias("m"))
    return (
        raw.crossJoin(F.broadcast(mx))
        .select(
            strata_col,
            "s_tokens",
            F.round(F.col("w") / F.col("m"), 6).alias("rate"),
        )
        .localCheckpoint(eager=False)
    )


def temperature_keep(
    df: DataFrame,
    rates: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp:",
) -> DataFrame:
    """Apply per-stratum rates deterministically: keep a row iff the 4-hex
    md5 prefix of its salted id falls below the rate quantized to 16 bits
    (floor is explicit — Spark truncates double->int, DuckDB rounds).
    Membership is a pure function of the id: reproducible across runs,
    engines, partitionings, and composable with hash_split."""
    h = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4
    )
    thresh = F.lpad(
        F.lower(
            F.conv(
                F.floor(F.col("rate") * 65536).cast("int").cast("string"),
                10,
                16,
            )
        ),
        4,
        "0",
    )
    return df.join(
        F.broadcast(rates.select(strata_col, "rate")), strata_col
    ).filter(F.when(F.col("rate") >= 1.0, F.lit(True)).otherwise(h < thresh))


def misra_gries_candidates(
    tokens_df: DataFrame, token_col: str = "token", n_counters: int = 64
) -> DataFrame:
    """Per-partition Misra-Gries heavy-hitter summaries (mergeable-
    summaries form, Agarwal et al. 2012): each partition keeps at most
    ``n_counters`` (token, count) counters; a batch's value_counts is
    merged in, and when the table overflows, the (k+1)-th largest count
    is subtracted from every counter and non-positive ones dropped — the
    batched equivalent of classic decrement-all, preserving the MG
    guarantee that any token with partition frequency > n_p/(k+1)
    survives with count underestimated by at most n_p/(k+1).

    Output: one row per surviving counter per partition (token,
    mg_count) — at most n_counters x n_partitions rows regardless of
    vocabulary size. That bound is the 100 TB story: the true top-k over
    an unbounded key space (URLs, n-grams, user ids) reduces to a
    candidate set that always broadcasts, instead of a full-vocabulary
    shuffle."""
    import pandas as pd

    def kernel(batches):
        counters: dict = {}
        for pdf in batches:
            for tok, cnt in pdf[token_col].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(cnt)
            if len(counters) > n_counters:
                cut = sorted(counters.values(), reverse=True)[n_counters]
                counters = {
                    t: c - cut for t, c in counters.items() if c - cut > 0
                }
        if counters:
            yield pd.DataFrame(
                {token_col: list(counters), "mg_count": list(counters.values())}
            )

    return tokens_df.select(token_col).mapInPandas(
        kernel, f"{token_col} string, mg_count long"
    )


def heavy_hitters_topk(
    tokens_df: DataFrame,
    token_col: str = "token",
    k: int = 20,
    n_counters: int = 64,
) -> DataFrame:
    """Exact top-k over an unbounded key space via MG candidates + exact
    recount: sketch each partition (one pass, no shuffle), broadcast the
    candidate union back over the tokens for an exact count of ONLY the
    candidates, then take the top k. The recount makes the emitted
    counts exact; the sketch bounds what shuffles. Correct whenever
    every true top-k token exceeds the MG threshold N/(n_counters+1) —
    guaranteed in particular when n_counters >= vocabulary (no decrement
    ever fires), the regime the oracle gate runs in; the planted-skew
    pytest covers the decrementing regime."""
    cands = misra_gries_candidates(tokens_df, token_col, n_counters).select(
        token_col
    ).distinct()
    counts = (
        tokens_df.join(F.broadcast(cands), token_col, "left_semi")
        .groupBy(token_col)
        .agg(F.count("*").alias("n"))
    )
    return counts.orderBy(F.desc("n"), F.asc(token_col)).limit(k)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    group_col: str | None = None,
    salt: str = "ares",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res): each row draws u in (0,1] from md5(salt||id) — no
    RNG state, so the sample replays across runs, partitionings and
    engines — and is ranked by ln(u)/weight (the monotone log form of
    u^(1/w)); the top ``k`` per group are the weighted sample. Inclusion
    probability is proportional to weight, the property temperature/
    quality-weighted corpus subsetting needs. The key is rounded to 10 dp
    so both engines rank identical doubles; weights must be > 0.

    One window shuffle keyed by the group (or a single global group for
    ungrouped sampling — bounded by k after the filter, but the sort is
    corpus-wide; prefer a group column at scale)."""
    from pyspark.sql import Window

    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (v.cast("double") + 1.0) / 4294967296.0
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 10)
    parts = [group_col] if group_col else []
    w = Window.partitionBy(*parts).orderBy(F.desc("ares_key"), F.asc(id_col))
    return (
        df.withColumn("ares_key", key)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def length_bucketed_batches(
    df: DataFrame,
    batch_size: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Length-grouped batching (the padding-efficiency primitive —
    HF's ``group_by_length``): documents land in power-of-two length
    buckets (``bucket = floor(log2(n_tokens))``), and within each bucket
    a deterministic md5 shuffle assigns fixed-size batches. Padding waste
    per batch is bounded by the bucket's 2x length spread instead of the
    corpus-wide max.

    Emits per-doc ``(bucket, batch_idx, pos_in_batch, n_tokens)`` plus
    the batch's ``pad_to`` length (the bucket-batch max — what the
    collator pads to).

    Scale posture: one window per bucket (uniform md5 order — no skew
    beyond the true length distribution), one bucket-batch max; both
    share the (bucket) shuffle. No global sort.
    """
    from pyspark.sql import Window

    n_tok = token_count(F.col(text_col))
    # floor(log2(n)) via INTEGER bit algebra (length of the binary string
    # minus one) — a float log2 sits 1 ulp from flipping floor() at exact
    # powers of two, and both engines' libm would disagree there
    base = df.select(id_col, n_tok.alias("n_tokens")).withColumn(
        "bucket",
        (F.length(F.bin(F.greatest(F.col("n_tokens"), F.lit(1)))) - 1).cast("int"),
    )
    w = Window.partitionBy("bucket").orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    placed = (
        base.withColumn("rn", F.row_number().over(w))
        # integer `div`, not float division-then-cast: same exactness
        # rationale as the bucket computation above
        .withColumn(
            "batch_idx", F.expr(f"(rn - 1) div {int(batch_size)}").cast("long")
        )
        .withColumn(
            "pos_in_batch", ((F.col("rn") - 1) % batch_size).cast("int")
        )
        .drop("rn")
    )
    pad = Window.partitionBy("bucket", "batch_idx")
    return placed.withColumn("pad_to", F.max("n_tokens").over(pad))
