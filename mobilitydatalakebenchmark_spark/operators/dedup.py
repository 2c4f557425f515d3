"""Deduplication operators for large-scale corpus processing
(BASELINE.json north star; first-class alongside SURVEY §2).

All operators take/return DataFrames and are pure column expressions
(JVM-side) unless noted. Hash primitive is md5 — bit-identical across
engines (the DuckDB oracle twins in plans/text.py use the same
construction), uniformly distributed (no skewed shuffle keys).

Scale design:
- exact_duplicates: one shuffle on a 128-bit hash — no wide rows move,
  only (hash, id).
- minhash signatures: per-row transform, no shuffle.
- LSH candidates: band explode (r rows per doc) + self-equi-join on
  (band, hash) — linear in corpus + output size; never O(n²).
- simhash: per-row 64-bit fingerprint; near-dup = equal fingerprint
  buckets (or small Hamming radius via rotations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_N_HASHES = 8
_SLICES_PER_MD5 = 4  # a 32-hex md5 yields four independent 8-hex hashes


def tokenize(text: Column, pattern: str = " ") -> Column:
    """Whitespace tokenizer -> distinct token set (order-free)."""
    return F.array_distinct(F.split(text, pattern))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles: join each sliding n-token window back into a
    string. Pure expressions: transform over index range + slice."""
    toks = F.split(text, " ")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: groups with >1 copy, keeper = min id
    (first-seen, reference A9 semantics)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias(f"keeper_{id_col}"))
        .filter(F.col("n_copies") > 1)
    )


def drop_exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct text (the min-id row). Window-free: an
    aggregate on the hash then a semi join keeps the shuffle narrow."""
    keepers = (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("h"))
        .groupBy("h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keepers, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = DEFAULT_N_HASHES,
    shingle_n: int | None = None,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) — one row per doc, no shuffle.

    Hash budget: ONE md5 per grain per group of 4 signature elements — the
    32-hex digest is sliced into four independent 8-hex hashes (standard
    multi-hash-from-one-digest construction), so 8 signature elements cost
    2 md5 passes, not 8. Each element = min over grains of its slice
    (P[min equal] = Jaccard)."""
    grains = shingles(F.col(text_col), shingle_n) if shingle_n else tokenize(F.col(text_col))
    n_groups = (n_hashes + _SLICES_PER_MD5 - 1) // _SLICES_PER_MD5
    # explode grains to rows: md5 then runs inside WholeStageCodegen
    # (higher-order-function lambdas are interpreted per element — measured
    # ~4x slower for the same hash count); the min-aggregate shuffles only
    # (id, digest) pairs with map-side partial mins.
    exploded = df.select(F.col(id_col), F.explode(grains).alias("_g"))
    digests = exploded.select(
        id_col,
        *[
            F.md5(F.concat(F.lit(f"g{g}"), F.col("_g"))).alias(f"_h{g}")
            for g in range(n_groups)
        ],
    )
    return digests.groupBy(id_col).agg(
        *[
            F.min(
                F.substring(
                    F.col(f"_h{k // _SLICES_PER_MD5}"), 1 + 8 * (k % _SLICES_PER_MD5), 8
                )
            ).alias(f"mh_{k}")
            for k in range(n_hashes)
        ]
    )


def minhash_signatures_rowwise(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = DEFAULT_N_HASHES,
    shingle_n: int | None = None,
) -> DataFrame:
    """Same signatures as :func:`minhash_signatures`, computed entirely
    per-row (array_min over a transformed grain array) — no explode, no
    groupBy. Slower per hash than the exploded/codegen path (higher-order
    lambdas are interpreted), but ZERO shuffle and therefore legal inside
    a streaming query in append mode, where a groupBy aggregation without
    a watermark is rejected. Values are bit-identical to the batch path
    (same md5/slice/min formula over the same grain set) — asserted by
    the streaming-vs-batch equivalence test."""
    grains = shingles(F.col(text_col), shingle_n) if shingle_n else tokenize(F.col(text_col))

    def slice_hash(g: int, off: int):
        # one-arg closure: pyspark infers transform's lambda arity from the
        # python signature, so default-arg capture would read as 3 args
        return lambda x: F.substring(F.md5(F.concat(F.lit(f"g{g}"), x)), off, 8)

    sig_cols = []
    for k in range(n_hashes):
        g = k // _SLICES_PER_MD5  # same digest-slice layout as the batch path
        off = 1 + 8 * (k % _SLICES_PER_MD5)
        sig_cols.append(
            F.array_min(F.transform(grains, slice_hash(g, off))).alias(f"mh_{k}")
        )
    # NULL text: the batch path's explode emits no row for it; match that
    # here, otherwise NULL signatures all band-hash to md5(NULL) and every
    # null-text doc pairs with every other in one streaming LSH bucket
    return df.filter(F.col(text_col).isNotNull()).select(F.col(id_col), *sig_cols)


def lsh_band_keys(sig: DataFrame, id_col: str = "doc_id", bands: int = 4) -> DataFrame:
    """Signature columns -> (id, band_idx, band_hash), r = k/bands rows per
    doc. Band hash = md5 of the concatenated band slice."""
    mh_cols = [c for c in sig.columns if c.startswith("mh_")]
    rows_per_band = len(mh_cols) // bands
    assert rows_per_band * bands == len(mh_cols), "bands must divide #hashes"
    band_structs = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(F.concat(*mh_cols[b * rows_per_band : (b + 1) * rows_per_band])).alias(
                "band_hash"
            ),
        )
        for b in range(bands)
    ]
    return sig.select(
        id_col, F.explode(F.array(*band_structs)).alias("b")
    ).select(id_col, "b.band_idx", "b.band_hash")


def lsh_candidate_pairs(bands_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Docs sharing >=1 band, as bucket-local pair expansion: group by
    (band_idx, band_hash), collect the (small, sorted) member list, emit
    its ordered pairs with an indexed-lambda transform. Output:
    (doc_a, doc_b, n_bands).

    Why not a self-join on the band key: both join sides would recompute
    the full shingle->md5->min pipeline (Spark does not reuse the exchange
    across the aliased sides — measured 4 scans / 4 shuffles); this shape
    computes signatures once and shuffles once on the uniform 128-bit
    band hash. A/B at sf0.1 / 10x-sf0.1 (local[32]): self-join 2.3s/3.2s,
    pair expansion 3.1s/3.6s — the self-join wins small (its band side
    broadcasts), but its wall time grows 1.39x per 10x data vs 1.16x
    here, and at band tables beyond broadcast size it degrades to a
    sort-merge join over TWO recomputed pipelines. LSH bucket membership
    is small by construction, so the collected list is bounded; a
    degenerate corpus (every doc identical) degrades exactly like the
    self-join would (quadratic pairs exist either way)."""
    buckets = (
        bands_df.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    ids = F.col("ids")
    pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.greatest(F.size(ids) - i - 1, F.lit(1))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("n_bands"))
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = 4,
    min_jaccard: float = 0.5,
    shingle_n: int | None = None,
) -> DataFrame:
    """Full pipeline: signatures -> bands -> candidates -> exact-Jaccard
    verification of candidates only (the candidate set is tiny relative to
    n², so the verify join broadcasts the token sets of candidates)."""
    sig = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n)
    cands = lsh_candidate_pairs(lsh_band_keys(sig, id_col, bands), id_col)
    grains = shingles(F.col(text_col), shingle_n) if shingle_n else tokenize(F.col(text_col))
    toks = df.select(F.col(id_col), grains.alias("tok"))
    a = toks.select(F.col(id_col).alias("doc_a"), F.col("tok").alias("tok_a"))
    b = toks.select(F.col(id_col).alias("doc_b"), F.col("tok").alias("tok_b"))
    n_common = F.size(F.array_intersect("tok_a", "tok_b"))
    jac = n_common.cast("double") / (F.size("tok_a") + F.size("tok_b") - n_common)
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "n_bands", F.round("jaccard", 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """Per-token 64-bit hash (xxhash64, JVM built-in); fingerprint bit i is
    the sign of Σ_tokens (±1 per token's bit i). Expressed as a transform
    over bit positions — no UDF, no explode (the token array stays in-row).

    Cross-engine note: xxhash64 is Spark-specific, so simhash queries are
    rows-only in the oracle gate; the *property* (near-dup texts collide)
    is unit-tested in tests/test_dedup.py."""
    toks = F.array_distinct(F.split(text, " "))
    hashes = F.transform(toks, lambda x: F.xxhash64(x))
    # static unroll over bit positions (shift amounts must be literals);
    # Spark splits the generated code into sub-methods automatically
    fp = F.lit(0).cast("long")

    def _voter(bit: int):
        # closure factory: pyspark requires exactly-2-arg merge lambdas
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    for i in range(bits):
        vote = F.aggregate(hashes, F.lit(0), _voter(i))
        fp = fp.bitwiseOR(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return fp


def simhash_fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col), simhash(F.col(text_col)).alias("simhash"))


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Block-permuted simhash join: split the 64-bit fingerprint into
    n_blocks 16-bit blocks; two fingerprints within Hamming distance
    < n_blocks must share at least one exact block (pigeonhole) -> join on
    (block_idx, block_value), verify Hamming on candidates. Linear, like
    the MinHash LSH path."""
    fp = simhash_fingerprints(df, text_col, id_col)
    block_bits = SIMHASH_BITS // n_blocks
    blocks = fp.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.shiftrightunsigned(F.col("simhash"), i * block_bits)
                        .bitwiseAND(F.lit((1 << block_bits) - 1))
                        .alias("block_value"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("blk"),
    ).select(id_col, "simhash", "blk.block_idx", "blk.block_value")
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_value") == F.col("b.block_value"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming_distance(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Passage-level duplication (longest shared token runs between doc pairs)
# ---------------------------------------------------------------------------


def shared_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 8,
    min_shingles: int = 1,
    max_df: int | None = 1000,
) -> DataFrame:
    """Cross-document repeated PASSAGES, not whole-document similarity:
    for every doc pair sharing at least ``min_shingles`` positional
    ``shingle_n``-token shingles, report the longest contiguous shared run
    (in tokens) and the shared-shingle coverage (DISTINCT matched doc_a
    positions — bounded by doc_a's length, deliberately NOT the raw join
    match count, which inflates m*p on boilerplate repeated m times in one
    doc and p in the other). This is the passage-granular dedup signal
    (boilerplate headers, quoted blocks, licence stubs) that whole-doc
    MinHash misses. Docs shorter than ``shingle_n`` produce no shingles.

    Shape: positional shingle hashes (md5 of the joined window — pure
    expressions, no UDF) -> keep only hashes seen in >1 document (the
    LSH-style frequency gate that prevents quadratic pair expansion on
    common-but-unique-to-one-doc text) -> same-hash pair join -> runs via
    gaps-and-islands on each pair's match diagonal (pos_a - pos_b): R
    consecutive matching tokens appear as R - n + 1 consecutive shingle
    positions on one diagonal, so longest_run_tokens = max island size
    + n - 1. Shuffles: one hash agg, one equi-join keyed by hash, one
    window + one final agg keyed by pair — all linear in match count.

    ``max_df`` caps the document frequency of a shingle admitted to the
    pair join (the standard stop-shingle bound): a boilerplate shingle
    present in k documents expands to O(k^2) join rows, so without the cap
    a single licence stub shared by 10^6 docs is a job-killer at corpus
    scale. Shingles with ``nd > max_df`` are dropped — the recall trade is
    that passages occurring in MORE than ``max_df`` documents are not
    reported (by then they are corpus boilerplate, not dedup signal; the
    dropped hashes are recoverable by running the frequency agg alone with
    the complementary filter). ``max_df=None`` disables the cap."""
    toks = F.split(F.col(text_col), " ")
    # docs shorter than shingle_n produce NO shingles (a truncated window
    # would otherwise match as a full shingle_n-token run and report runs
    # longer than the document itself)
    pos_shingles = df.filter(F.size(toks) >= shingle_n).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - F.lit(shingle_n - 1)),
                lambda i: F.md5(F.array_join(F.slice(toks, i, shingle_n), " ")),
            )
        ).alias("pos", "h"),
    )
    df_gate = (
        F.col("nd").between(2, max_df) if max_df is not None else F.col("nd") > 1
    )
    repeated = (
        pos_shingles.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(df_gate)
        .select("h")
    )
    hits = pos_shingles.join(repeated, "h")
    a, b = hits.alias("a"), hits.alias("b")
    matches = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("doc_a"),
        F.col(f"b.{id_col}").alias("doc_b"),
        F.col("a.pos").alias("pos_a"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    islands = matches.withColumn(
        "island", F.col("pos_a") - F.row_number().over(w)
    )
    longest = (
        islands.groupBy("doc_a", "doc_b", "diag", "island")
        .agg(F.count("*").alias("run_shingles"))
        .groupBy("doc_a", "doc_b")
        .agg(
            (F.max("run_shingles") + F.lit(shingle_n - 1))
            .cast("long")
            .alias("longest_run_tokens")
        )
    )
    # coverage, not match count: a shingle at m positions in doc_a and p in
    # doc_b yields m*p join rows — counting DISTINCT doc_a positions keeps
    # the metric bounded by doc_a's length instead of inflating
    # quadratically on repeated boilerplate
    coverage = matches.groupBy("doc_a", "doc_b").agg(
        F.count_distinct("pos_a").cast("long").alias("n_shared_shingles")
    )
    return longest.join(coverage, ["doc_a", "doc_b"]).filter(
        F.col("n_shared_shingles") >= min_shingles
    )


# ---------------------------------------------------------------------------
# Exact substring-level duplicate spans (the ExactSubstr policy of
# "Deduplicating Training Data Makes Language Models Better", Lee et al.
# 2022): remove any token span of >= min_len that occurs more than once
# ANYWHERE in the corpus (cross-doc or within-doc).
# ---------------------------------------------------------------------------


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 8,
    min_len_tokens: int = 16,
    min_occurrences: int = 2,
) -> DataFrame:
    """Per-document duplicated SPANS — the exact-substring dedup policy:
    every maximal token run whose every ``shingle_n``-gram occurs
    ``min_occurrences``+ times in the corpus, cut at ``min_len_tokens``.
    Output: (id_col, span_start, span_end, span_tokens), token positions
    1-based inclusive.

    This is the SUFFIX-RUN generalization of ``shared_passages``: where
    that operator reports pairwise passage overlap (and pays a same-hash
    pair join), the dedup-for-training policy only needs to know WHICH
    positions of WHICH documents are duplicated — so the plan never
    forms pairs at all. The paper builds a corpus suffix array; the
    Spark-first equivalent marks positions through a global shingle
    frequency table: a run of R consecutive tokens duplicated elsewhere
    appears as R - n + 1 consecutive marked shingle positions, so
    maximal marked islands ARE the paper's duplicate spans, with span
    boundary resolution of the shingle width (spans shorter than
    ``shingle_n`` are invisible — choose n <= min_len/2 in practice).

    Within-doc repetition counts: the frequency gate is total
    occurrences, not distinct docs, so a document that repeats its own
    boilerplate marks those spans too (the paper's policy; set
    ``min_occurrences`` higher to only cut hotter text).

    Scale: one explode (corpus tokens x ~1), one hash-keyed count agg,
    one semi-join back, one per-doc window — every step linear in
    corpus tokens, no pair expansion anywhere, so no max_df cap is
    needed (hot boilerplate costs ONE count row however often it
    repeats). The per-doc window sorts within doc_id partitions only.
    """
    toks = F.split(F.col(text_col), " ")
    # 1-based positions to match the slice arithmetic (docs shorter than
    # shingle_n produce no shingles, hence no spans)
    pos_shingles = df.filter(F.size(toks) >= shingle_n).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - F.lit(shingle_n - 1)),
                lambda i: F.md5(F.array_join(F.slice(toks, i, shingle_n), " ")),
            )
        ).alias("pos0", "h"),
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "h")
    repeated = (
        pos_shingles.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= min_occurrences)
        .select("h")
    )
    marked = pos_shingles.join(repeated, "h", "leftsemi")
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    islands = marked.withColumn(
        "island", F.col("pos") - F.row_number().over(w)
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(shingle_n - 1)).cast("long").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_len_tokens)
    )
