"""End-to-end training-data pipeline demo — every stage in one run.

Usage: python tools/pipeline_demo.py [sf_dir] [out_dir]

Chains the engine's LLM-pipeline operators the way a production corpus
build would, printing ONE JSON line of stage-by-stage counts:

  read documents
    -> Gopher rule filter           (plans.text gate expressions)
    -> exact dedup, keep first      (md5 groupBy-min)
    -> MinHash near-dup drop        (banded LSH -> verified -> components)
    -> temperature mixture resample (token-share^(alpha-1) keep rates)
    -> train/val/test hash split
    -> token-balanced shard export + manifest verify
    -> BM25 contamination probe over the surviving corpus (round 7)
    -> GDPR erasure rehearsal: drop one source + incrementally retract
       its rollup contribution, verified == rebuild (round 7)

Each stage is lazy until the single write at the end — the whole
pipeline is ONE Spark plan per output, with the dedup/candidate joins
bucketed by construction. This is the composition story the individual
gates verify piecewise.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.session import get_spark, read_table


def main() -> None:
    import tempfile

    from mobilitydatalakebenchmark_spark.operators.dedup import (
        minhash_near_duplicates,
    )
    from mobilitydatalakebenchmark_spark.operators.text_analysis import (
        hash_split,
        temperature_keep,
        temperature_rates,
    )
    from mobilitydatalakebenchmark_spark.operators.shards import (
        verify_shards,
        write_shards,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp() + "/corpus"

    spark = get_spark("pipeline_demo")
    docs = read_table(spark, sf_dir, "documents")
    stages: dict[str, int] = {"input": docs.count()}

    # 1. Gopher rule filter (inline expressions, zero shuffle)
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    mean_wl = F.length(F.regexp_replace("text", " ", "")).cast("double") / n_words
    kept = docs.filter(
        n_words.between(10, 90) & (mean_wl >= 3) & (mean_wl <= 10)
    )
    stages["after_quality"] = kept.count()

    # 2. exact dedup keep-first
    keepers = kept.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("keeper")
    )
    kept = kept.join(
        keepers, (F.md5(kept["text"]) == keepers["h"])
        & (kept["doc_id"] == keepers["keeper"]),
    ).drop("h", "keeper")
    stages["after_exact_dedup"] = kept.count()

    # 3. MinHash near-dup drop (banded candidates -> verified Jaccard).
    # 3-gram shingles, not raw token sets: the synthetic corpus has a
    # ~30-word vocabulary, so token-set Jaccard calls nearly everything a
    # duplicate; shingled Jaccard measures shared phrasing, which is what
    # near-dup removal means on real text.
    dupes = (
        minhash_near_duplicates(kept, shingle_n=3, min_jaccard=0.8)
        .select("doc_b")
        .distinct()
    )
    # checkpoint: every later stage count re-executes the lineage prefix;
    # materialize once past the most expensive stage (the MinHash join)
    kept = kept.join(
        dupes, kept["doc_id"] == dupes["doc_b"], "left_anti"
    ).localCheckpoint(eager=False)
    stages["after_near_dedup"] = kept.count()

    # 4. temperature mixture resample (alpha=0.5, rates from data)
    rates = temperature_rates(kept, "source", alpha=0.5)
    kept = temperature_keep(kept, rates, "source").drop("rate")
    stages["after_mixture"] = kept.count()

    # 5. split + 6. shard export (train split only) with manifest verify
    kept = kept.withColumn("split", hash_split(F.col("doc_id")))
    train = kept.filter(F.col("split") == "train")
    stages["train_docs"] = train.count()
    write_shards(train, out, shard_tokens=2048)
    checks = verify_shards(spark, out).collect()
    stages["shards"] = len(checks)
    ok = all(r.ok_docs and r.ok_tokens and r.ok_content for r in checks)

    # 7. retrieval probe over the SURVIVING corpus (round-7 operators):
    # the contamination-triage question "which kept docs match this eval
    # query" — postings touch only the query terms' lists
    from mobilitydatalakebenchmark_spark.operators.retrieval import (
        bm25_topk,
        build_postings,
        literal_queries,
    )

    postings, doc_stats = build_postings(kept)
    probe = literal_queries(spark, {"probe": "spark join window"})
    stages["retrieval_hits"] = bm25_topk(
        postings, doc_stats, probe, topk=10
    ).count()

    # 8. erasure rehearsal (GDPR cascade): drop one source's docs and
    # retract them from the per-source daily token rollup incrementally
    from mobilitydatalakebenchmark_spark.operators.forget import (
        forget_rows,
        retract_from_rollup,
    )
    from mobilitydatalakebenchmark_spark.operators.rollup import build_rollup

    tokens = kept.select(
        "doc_id",
        F.lit("2024-01-01T00:00:00").cast("timestamp").alias("ts"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        "source",
    )
    rollup = build_rollup(tokens, "ts", "n_tokens", keys=("source",), bucket="day")
    biggest = (
        kept.groupBy("source").count().orderBy(F.desc("count"), "source").first()
    )["source"]
    erase = kept.filter(F.col("source") == biggest).select("doc_id")
    maintained = retract_from_rollup(
        rollup, tokens, erase, "doc_id", "ts", "n_tokens",
        keys=("source",), bucket="day",
    )
    survivors = forget_rows(tokens, erase, "doc_id")
    rebuilt = build_rollup(survivors, "ts", "n_tokens", keys=("source",), bucket="day")
    cols = ["bucket_ts", "source", "n", "total", "vmin", "vmax"]
    retract_ok = sorted(map(tuple, maintained.select(cols).collect())) == sorted(
        map(tuple, rebuilt.select(cols).collect())
    )
    stages["erased_docs"] = erase.count()
    stages["post_erasure_sources"] = maintained.select("source").distinct().count()

    print(
        json.dumps(
            {
                "metric": "pipeline_demo",
                "sf_dir": sf_dir,
                "out": out,
                "stages": stages,
                "manifest_verified": ok,
                "erasure_retraction_verified": retract_ok,
            }
        )
    )
    if not (ok and retract_ok):
        sys.exit(1)


if __name__ == "__main__":
    main()
