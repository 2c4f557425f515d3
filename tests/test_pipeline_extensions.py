"""Tests for the training-pipeline extensions: repetition signal, IDF /
TF-IDF, deterministic hash sampling/splits, nearest-centroid assignment."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators import similarity, text_analysis


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(11)
    words = "red green blue cyan magenta yellow black white".split()
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(50))) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.cache().count()
    return df


class TestRepetition:
    def test_fully_repetitive_doc_scores_high(self, spark):
        df = spark.createDataFrame(
            [(1, " ".join(["spam ham"] * 20)), (2, " ".join(f"w{i}" for i in range(40)))],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["dup"]
            for r in df.select(
                "doc_id",
                text_analysis.duplicate_ngram_fraction(F.col("text"), 5).alias("dup"),
            ).collect()
        }
        # doc 1: 40 tokens alternating spam/ham -> only 2 distinct 5-grams of 36
        assert out[1] > 0.9
        # doc 2: all tokens distinct -> zero repeated 5-grams
        assert out[2] == 0.0

    def test_short_doc_is_safe(self, spark):
        df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
        row = df.select(
            text_analysis.duplicate_ngram_fraction(F.col("text"), 5).alias("dup")
        ).first()
        assert row["dup"] == 0.0


class TestHashSplit:
    def test_split_is_deterministic_and_partition_invariant(self, docs):
        a = docs.select("doc_id", text_analysis.hash_split(F.col("doc_id")).alias("s"))
        b = docs.repartition(7).select(
            "doc_id", text_analysis.hash_split(F.col("doc_id")).alias("s")
        )
        assert sorted(a.collect()) == sorted(b.collect())

    def test_split_fractions_roughly_match(self, docs):
        counts = dict(
            docs.select(text_analysis.hash_split(F.col("doc_id")).alias("s"))
            .groupBy("s")
            .count()
            .collect()
        )
        n = sum(counts.values())
        assert counts["train"] / n == pytest.approx(0.75, abs=0.12)
        # every split is non-empty at n=200
        assert set(counts) == {"train", "val", "test"}

    def test_sample_is_subset_and_stable(self, docs):
        s1 = {r["doc_id"] for r in text_analysis.deterministic_sample(docs, "doc_id").collect()}
        s2 = {r["doc_id"] for r in text_analysis.deterministic_sample(docs, "doc_id").collect()}
        assert s1 == s2
        assert 0 < len(s1) < docs.count()


class TestIdf:
    def test_idf_math_matches_definition(self, spark):
        df = spark.createDataFrame(
            [(1, "a b"), (2, "a c"), (3, "a d")], "doc_id long, text string"
        )
        out = {r["token"]: r for r in text_analysis.idf_table(df).collect()}
        assert out["a"]["df"] == 3 and out["a"]["idf"] == 0.0
        assert out["b"]["df"] == 1
        assert out["b"]["idf"] == pytest.approx(round(math.log(3.0), 4))


class TestNearestCentroid:
    def test_planted_clusters_assign_back(self, spark):
        rng = random.Random(3)
        rows = []
        for vid in range(90):
            label = vid % 3
            base = [0.0] * 6
            base[label * 2] = 1.0
            vec = [v + rng.uniform(-0.05, 0.05) for v in base]
            rows.append((vid, vec, label))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        cents = similarity.label_centroids(df, dim=6)
        assert cents.count() == 3
        assigned = similarity.assign_nearest_centroid(df, cents, keep_cols=("label",))
        agree = assigned.filter("label = assigned_label").count()
        assert agree == 90  # well-separated planted clusters: perfect recall

    def test_numpy_twin_matches_expression_path(self, spark):
        rng = random.Random(5)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(6)], i % 4) for i in range(60)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        cents = similarity.label_centroids(df, dim=6)
        expr = {
            r["vec_id"]: (r["assigned_label"], round(r["sim"], 9))
            for r in similarity.assign_nearest_centroid(
                df, cents, keep_cols=("label",)
            ).collect()
        }
        np_ = {
            r["vec_id"]: (r["assigned_label"], round(r["sim"], 9))
            for r in similarity.assign_nearest_centroid_numpy(
                df, cents, keep_cols=("label",)
            ).collect()
        }
        assert expr == np_

    def test_assignment_has_one_row_per_vector(self, spark):
        rng = random.Random(4)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(6)], i % 2) for i in range(40)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        assigned = similarity.assign_nearest_centroid(
            df, similarity.label_centroids(df, dim=6)
        )
        assert assigned.count() == 40
        assert assigned.select("vec_id").distinct().count() == 40


class TestPacking:
    def test_offsets_are_contiguous_within_shard(self, spark):
        rows = [(i, "s0", " ".join(["w"] * (10 + i))) for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        packed = text_analysis.pack_sequences(df, capacity=16).orderBy("pack_order")
        out = packed.collect()
        # each doc starts exactly where the previous one ended
        offset = 0
        for r in out:
            assert r["start_offset"] == offset
            offset += r["n_tokens"]
        # bin ids follow from offsets
        for r in out:
            assert r["start_bin"] == r["start_offset"] // 16
            assert r["end_bin"] == (r["start_offset"] + r["n_tokens"] - 1) // 16

    def test_shards_pack_independently(self, spark):
        rows = [(1, "a", "x y z"), (2, "b", "x y z"), (3, "a", "x y")]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = {
            (r["source"], r["doc_id"]): r["start_offset"]
            for r in text_analysis.pack_sequences(df, capacity=4).collect()
        }
        # each shard starts at offset 0 regardless of the other shard
        assert 0 in [v for (s, _), v in out.items() if s == "a"]
        assert out[("b", 2)] == 0


class TestContamination:
    def test_planted_overlap_is_found_and_clean_docs_are_not(self, spark):
        train_text = "one two three four five six seven eight"
        rows = [
            (1, train_text, "train"),
            (2, "alpha beta gamma delta epsilon zeta eta theta", "test"),  # clean
            (3, "zz one two three four five yy", "test"),  # shares a 5-gram
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, split string")
        out = {r["test_doc"]: r for r in text_analysis.contamination(df, 5).collect()}
        assert 3 in out and 2 not in out
        assert out[3]["n_train_docs"] == 1


class TestSketchPercentiles:
    def test_sketch_tracks_exact_quantiles(self, spark):
        import random

        rng = random.Random(9)
        rows = [(i, rng.uniform(0, 1000)) for i in range(20000)]
        df = spark.createDataFrame(rows, "i long, value double")
        approx = df.agg(
            F.percentile_approx("value", [0.5, 0.95], 10000).alias("a")
        ).first()["a"]
        exact = df.agg(F.expr("percentile(value, array(0.5, 0.95))").alias("e")).first()["e"]
        for a, e in zip(approx, exact):
            assert a == pytest.approx(e, rel=0.02)


class TestLengthBucketedBatches:
    def _df(self, spark):
        rows = [
            (i, " ".join(["w"] * n))
            for i, n in enumerate([1, 2, 3, 4, 7, 8, 9, 15, 16, 31, 33, 64, 100, 5, 6])
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_buckets_are_power_of_two_ranges(self, spark):
        from mobilitydatalakebenchmark_spark.operators.text_analysis import (
            length_bucketed_batches,
        )

        got = length_bucketed_batches(self._df(spark), batch_size=4).collect()
        for r in got:
            assert (1 << r["bucket"]) <= r["n_tokens"] < (1 << (r["bucket"] + 1)), r
        # exact power-of-two boundaries land in their own bucket (the
        # float-log2 landmine this op avoids via integer bit algebra)
        by_id = {r["doc_id"]: r for r in got}
        assert by_id[5]["bucket"] == 3   # n=8
        assert by_id[8]["bucket"] == 4   # n=16
        assert by_id[11]["bucket"] == 6  # n=64

    def test_batches_bounded_and_pad_to_is_max(self, spark):
        from mobilitydatalakebenchmark_spark.operators.text_analysis import (
            length_bucketed_batches,
        )

        got = length_bucketed_batches(self._df(spark), batch_size=2).collect()
        import collections

        batches = collections.defaultdict(list)
        for r in got:
            batches[(r["bucket"], r["batch_idx"])].append(r)
        for rows in batches.values():
            assert len(rows) <= 2
            m = max(r["n_tokens"] for r in rows)
            assert all(r["pad_to"] == m for r in rows)
            assert sorted(r["pos_in_batch"] for r in rows) == list(range(len(rows)))

    def test_deterministic_across_partitionings(self, spark):
        from mobilitydatalakebenchmark_spark.operators.text_analysis import (
            length_bucketed_batches,
        )

        df = self._df(spark)
        a = sorted(map(tuple, length_bucketed_batches(df, 4).collect()))
        b = sorted(
            map(tuple, length_bucketed_batches(df.repartition(7), 4).collect())
        )
        assert a == b


class TestLengthBucketedProperty:
    def test_random_lengths_invariants(self, spark):
        """Random corpora: every placement obeys the bucket range, batch
        size cap, contiguous positions, and pad_to = batch max."""
        import collections
        import random

        from mobilitydatalakebenchmark_spark.operators.text_analysis import (
            length_bucketed_batches,
        )

        rng = random.Random(101)
        for trial in range(3):
            batch_size = rng.choice([2, 4, 8])
            rows = [
                (i, " ".join(["w"] * rng.randint(1, 300)))
                for i in range(rng.randint(5, 120))
            ]
            df = spark.createDataFrame(rows, "doc_id long, text string")
            got = length_bucketed_batches(df, batch_size=batch_size).collect()
            assert len(got) == len(rows)
            batches = collections.defaultdict(list)
            for r in got:
                assert (1 << r["bucket"]) <= r["n_tokens"] < (1 << (r["bucket"] + 1))
                batches[(r["bucket"], r["batch_idx"])].append(r)
            for (_, bidx), rs in batches.items():
                assert len(rs) <= batch_size
                m = max(r["n_tokens"] for r in rs)
                assert all(r["pad_to"] == m for r in rs)
                assert sorted(r["pos_in_batch"] for r in rs) == list(range(len(rs)))
            # batch indices are contiguous from 0 per bucket
            per_bucket = collections.defaultdict(set)
            for (b, bidx), _ in batches.items():
                per_bucket[b].add(bidx)
            for b, idxs in per_bucket.items():
                assert idxs == set(range(len(idxs))), b
