"""Salted aggregation correctness + operator behavior on degenerate inputs
(empty frames, empty documents, single rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.functions.skew import (
    replicate_broadcast_for_salted_join,
    salted_sum_count,
    with_salt,
)


class TestSalting:
    def test_salted_agg_matches_plain(self, spark):
        # one hot key (90% of rows) + long tail
        rows = [("hot", float(i % 7)) for i in range(9000)]
        rows += [(f"k{i}", float(i)) for i in range(1000)]
        df = spark.createDataFrame(rows, "key string, v double")
        got = {
            r.key: (round(r.total, 6), r.n)
            for r in salted_sum_count(df, ["key"], "v").collect()
        }
        want = {
            r.key: (round(r.total, 6), r.n)
            for r in df.groupBy("key")
            .agg(F.sum("v").alias("total"), F.count("*").alias("n"))
            .collect()
        }
        assert got == want

    def test_salt_spreads_hot_key(self, spark):
        df = spark.createDataFrame([("hot", 1.0)] * 5000, "key string, v double")
        n_buckets = (
            with_salt(df, n_salts=16)
            .select("_salt")
            .distinct()
            .count()
        )
        assert n_buckets == 1  # identical rows hash identically (stable)...
        # ...so real salting must include a distinguishing column:
        df2 = df.withColumn("rowid", F.monotonically_increasing_id())
        n_buckets2 = with_salt(df2, n_salts=16).select("_salt").distinct().count()
        assert n_buckets2 > 8

    def test_salted_join_dim_replication(self, spark):
        dim = spark.createDataFrame([("hot", "H"), ("cold", "C")], "key string, attr string")
        rep = replicate_broadcast_for_salted_join(dim, n_salts=4)
        assert rep.count() == 8
        fact = with_salt(
            spark.createDataFrame(
                [("hot", i) for i in range(100)] + [("cold", 0)], "key string, i long"
            ),
            n_salts=4,
            salt_col="_salt",
        )
        j = fact.join(rep, ["key", "_salt"])
        assert j.count() == 101  # every fact row finds its dim exactly once


class TestDegenerateInputs:
    def test_renest_empty(self, spark):
        from mobilitydatalakebenchmark_spark.operators.flat_store import (
            explode_features,
            renest_documents,
        )
        from mobilitydatalakebenchmark_spark.schemas import DOCUMENT_SCHEMA

        empty = spark.createDataFrame([], DOCUMENT_SCHEMA)
        assert renest_documents(explode_features(empty)).count() == 0

    def test_dedup_empty_corpus(self, spark):
        from mobilitydatalakebenchmark_spark.operators.dedup import (
            exact_duplicates,
            minhash_near_duplicates,
        )

        empty = spark.createDataFrame([], "doc_id long, text string")
        assert exact_duplicates(empty).count() == 0
        assert minhash_near_duplicates(empty).count() == 0

    def test_minhash_single_token_doc(self, spark):
        from mobilitydatalakebenchmark_spark.operators.dedup import minhash_signatures

        df = spark.createDataFrame([(1, "word")], "doc_id long, text string")
        row = minhash_signatures(df, shingle_n=3).collect()[0]
        assert row.mh_0 is not None  # sub-n docs produce one short shingle

    def test_asof_join_empty_right(self, spark):
        from mobilitydatalakebenchmark_spark.operators.asof import asof_join

        left = spark.createDataFrame(
            [("a", "2024-01-01 00:00:00", 1)], "key string, ts string, id long"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        right = spark.createDataFrame([], "key string, ts timestamp, v double")
        out = asof_join(left, right, on="ts", by="key").collect()
        assert len(out) == 1 and out[0].asof_v is None

    def test_quality_features_empty_text(self, spark):
        from mobilitydatalakebenchmark_spark.operators.text_analysis import (
            quality_features,
        )

        df = spark.createDataFrame([(1, "")], "doc_id long, text string")
        row = quality_features(df).collect()[0]
        assert row.n_chars == 0
        assert row.quality is not None


class TestRound5Edges:
    """Empty / single-row behavior of the round-5 operators — the
    degenerate inputs a pipeline stage hits on an empty partition or a
    fully-filtered upstream."""

    def test_semantic_dedup_single_vector(self, spark):
        from mobilitydatalakebenchmark_spark.operators.similarity import (
            semantic_dedup_summary,
        )

        df = spark.createDataFrame(
            [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
        )
        out = semantic_dedup_summary(
            df, n_clusters=2, threshold=0.5, max_cluster_size=10
        ).collect()
        assert sum(r.n_members for r in out) == 1
        assert all(r.n_dropped == 0 and r.n_truncated == 0 for r in out)

    def test_covariance_gram_single_row(self, spark):
        from mobilitydatalakebenchmark_spark.operators.similarity import (
            covariance_matrix_gram,
        )

        df = spark.createDataFrame(
            [(0, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<float>"
        )
        rows = covariance_matrix_gram(df, dims=4).collect()
        assert len(rows) == 10
        # population covariance of one sample is 0; corr is 0/0 -> NaN/None
        assert all(r.cov_pop == 0.0 for r in rows)

    def test_shards_single_doc(self, spark, tmp_path):
        from mobilitydatalakebenchmark_spark.operators.shards import (
            verify_shards,
            write_shards,
        )

        df = spark.createDataFrame(
            [(0, "hello world", "src0")], "doc_id long, text string, source string"
        )
        write_shards(df, str(tmp_path / "s"), shard_tokens=4)
        checks = verify_shards(spark, str(tmp_path / "s")).collect()
        assert len(checks) == 1
        assert checks[0].ok_docs and checks[0].ok_tokens and checks[0].ok_content

    def test_pq_index_probe_with_no_probes(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from mobilitydatalakebenchmark_spark.operators.ann_index import PQIndexStore

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        store = PQIndexStore(str(tmp_path / "pq"))
        store.build(e)
        empty_probes = e.filter(F.lit(False)).select(
            F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
        )
        assert store.topk(empty_probes, k=3).count() == 0
