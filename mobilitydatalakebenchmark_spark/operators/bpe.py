"""Bounded-round BPE merge-rule training as one declarative plan.

Byte-pair encoding's training loop — count adjacent token pairs, merge
the most frequent pair everywhere, repeat — is the canonical "needs a
driver loop" algorithm. It does not: each round is (pair histogram →
1-row argmax → corpus rewrite), and the 1-row winner can be CROSS-JOINED
back into the corpus instead of collected, so N rounds unroll into one
lazy DataFrame plan with no driver-side data movement at all. The same
unrolling is what makes the DuckDB oracle able to replay training
exactly (scalar subqueries where Spark uses the broadcast cross join).

Semantics pinned by the gate:

* tokens are single-space separated; for the rewrite each token is
  rendered ``\\x01tok `` (sentinel prefix, space suffix) so the merge
  pattern ``\\x01a \\x01b `` is SELF-DELIMITING: a literal left-to-right
  non-overlapping ``replace`` then lands exactly on BPE's greedy
  application order even through runs of a repeated token
  (``x x x x x`` + rule ``(x,x)`` → ``x@x x@x x``). A naive
  space-padded ``' a b '`` pattern gets runs wrong — adjacent matches
  would need to share a delimiter space;
* the winning pair each round is (count desc, pair asc) — total order,
  no ties possible.

Scale: each round is one explode + one (pair) group-by over the corpus
plus a broadcast of ONE row; the rewrite is a per-row expression. Real
BPE trainers run thousands of rounds; the standard scale move is to
pre-aggregate the corpus to (distinct line, multiplicity) once and count
pairs with the multiplicity as weight — a one-line change here (group
first, weight ``pair_count`` by the multiplicity column) left to the
caller because the gate pins the per-row semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _adjacent_pairs(text: Column) -> Column:
    """Array of adjacent-token pair strings ``'a b'`` (empty for
    single-token rows). Single-space tokenization."""
    toks = F.split(text, " ")
    n = F.size(toks)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )


def bpe_train_rounds(
    docs: DataFrame,
    text_col: str = "text",
    n_rounds: int = 3,
    joiner: str = "@",
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_rounds`` BPE merge rules. Returns ``(rules, merged)``:

    * ``rules`` — one row per round: ``(round, pair, pair_count,
      corpus_tokens_after)`` (the winning pair, its pre-merge frequency,
      and the corpus token count after applying it);
    * ``merged`` — the corpus with all rounds' merges applied (original
      columns, rewritten ``text_col``).

    The whole training is one lazy plan: no ``collect`` anywhere.
    """
    cur = docs
    rule_frames: list[DataFrame] = []
    for r in range(1, n_rounds + 1):
        # internal columns are _bpe_-prefixed so the cross join can never
        # clobber (or collide with) caller columns named 'pair'/'pair_count'
        pairs = (
            cur.select(
                F.explode(_adjacent_pairs(F.col(text_col))).alias("_bpe_pair")
            )
            .groupBy("_bpe_pair")
            .agg(F.count(F.lit(1)).alias("_bpe_count"))
        )
        # a corpus with NO adjacent pairs (all single-token rows) must make
        # the round a no-op, not an empty cross join that wipes the corpus:
        # a NULL sentinel row loses to any real pair and guards the rewrite
        sentinel = (
            docs.sparkSession.range(1)
            .select(
                F.lit(None).cast("string").alias("_bpe_pair"),
                F.lit(-1).cast("long").alias("_bpe_count"),
            )
        )
        top = (
            pairs.unionByName(sentinel)
            .orderBy(F.desc("_bpe_count"), F.asc("_bpe_pair"))
            .limit(1)
        )
        sent = F.lit("\x01")
        # render '\x01tok ' per token; the pattern '\x01a \x01b ' is then
        # self-delimiting, so literal replace == greedy BPE application
        padded = F.concat(
            sent, F.replace(F.col(text_col), F.lit(" "), F.lit(" \x01")), F.lit(" ")
        )
        search = F.concat(
            sent,
            F.replace(F.col("_bpe_pair"), F.lit(" "), F.lit(" \x01")),
            F.lit(" "),
        )
        repl = F.concat(
            sent,
            F.replace(F.col("_bpe_pair"), F.lit(" "), F.lit(joiner)),
            F.lit(" "),
        )
        merged = cur.crossJoin(F.broadcast(top)).withColumn(
            text_col,
            F.when(
                F.col("_bpe_pair").isNotNull(),
                F.trim(F.replace(F.replace(padded, search, repl), sent, F.lit(""))),
            ).otherwise(F.col(text_col)),
        ).drop("_bpe_pair", "_bpe_count")
        # each merged corpus feeds BOTH the round summary and the next
        # round's histogram: lazy localCheckpoint caps the chain at one
        # rewrite per round instead of O(rounds²) replays
        merged = merged.localCheckpoint(eager=False)
        rule_frames.append(
            merged.agg(
                F.sum(F.size(F.split(F.col(text_col), " "))).alias(
                    "corpus_tokens_after"
                )
            )
            .crossJoin(F.broadcast(top))
            .select(
                F.lit(r).alias("round"),
                F.col("_bpe_pair").alias("pair"),
                F.col("_bpe_count").alias("pair_count"),
                "corpus_tokens_after",
            )
        )
        cur = merged
    rules = rule_frames[0]
    for f in rule_frames[1:]:
        rules = rules.unionByName(f)
    # sentinel rounds (no pairs anywhere) carry a NULL pair — drop them
    rules = rules.filter(F.col("pair").isNotNull())
    return rules, cur
