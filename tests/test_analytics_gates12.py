"""Round-10 session depth gates, batch 12: rolling WAU, exact moments,
business-day lag, the trunc-vs-floor division trap, NULL ordering, exact
median+MAD, column profile, hapax richness, per-label quantization error
— hand-computed references on constructed tables."""

from __future__ import annotations

import datetime

from mobilitydatalakebenchmark_spark.plans import load_registry


def _write_events(spark, tmp_path, rows, with_props=False):
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    )
    if with_props:
        schema += ", props string"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/sf/events.parquet"
    )
    return str(tmp_path / "sf")


def _gate(name):
    return load_registry()[name].spark


class TestRollingWau:
    def test_seven_day_window_by_hand(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        # user 1 active days 0 and 9; user 2 active days 0..9
        rows = []
        eid = 0
        for d in range(10):
            eid += 1
            rows.append((eid, base + datetime.timedelta(days=d), 2, "v", 1.0))
        for d in (0, 9):
            eid += 1
            rows.append((eid, base + datetime.timedelta(days=d), 1, "v", 1.0))
        sf = _write_events(spark, tmp_path, rows)
        got = {r.day: r for r in _gate("rolling_wau_7d")(spark, sf).collect()}
        d0 = base.date().toordinal() - datetime.date(1970, 1, 1).toordinal()
        # day 0: both users in window; days 1..8: only user 2 in the
        # trailing 7 days except day <= 6 still includes day-0 activity
        assert got[d0].dau == 2 and got[d0].wau_7d == 2
        assert got[d0 + 6].dau == 1 and got[d0 + 6].wau_7d == 2  # day0 in
        assert got[d0 + 7].dau == 1 and got[d0 + 7].wau_7d == 1  # day0 out
        assert got[d0 + 9].dau == 2 and got[d0 + 9].wau_7d == 2
        assert float(got[d0 + 7].stickiness) == 1.0

    def test_wau_counts_users_not_events(self, spark, tmp_path):
        base = datetime.datetime(2024, 2, 1)
        rows = [
            (i, base + datetime.timedelta(hours=i), 7, "v", 1.0)
            for i in range(1, 25)
        ]  # one user, 24 events over two days
        sf = _write_events(spark, tmp_path, rows)
        out = _gate("rolling_wau_7d")(spark, sf).collect()
        assert all(r.wau_7d == 1 and r.dau == 1 for r in out)
        assert len(out) == 2


class TestMomentStats:
    def test_symmetric_distribution_zero_skew(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        # v values (cents % 100): 10, 20, 30 — symmetric around 20
        rows = [
            (1, base, 1, "a", 0.10),
            (2, base, 1, "a", 0.20),
            (3, base, 1, "a", 0.30),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = _gate("moment_stats_per_type")(spark, sf).collect()[0]
        assert got.n == 3
        assert float(got.mean_v) == 20.0
        # var = (100+400+900)/3 - 400 = 466.666... - 400
        assert abs(float(got.var_v) - 66.666667) < 1e-6
        assert float(got.skewness) == 0.0

    def test_constant_group_pins_null(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        rows = [(i, base, 1, "c", 0.42) for i in range(1, 4)]
        sf = _write_events(spark, tmp_path, rows)
        got = _gate("moment_stats_per_type")(spark, sf).collect()[0]
        assert float(got.mean_v) == 42.0
        assert got.var_v is None
        assert got.skewness is None and got.kurtosis_excess is None


class TestBusinessDays:
    def test_weekday_algebra_by_hand(self, spark, tmp_path):
        # orders: Fri 2024-01-05 -> ship Mon 2024-01-08 = 1 business day
        # (Fri counted, weekend skipped, Mon excluded: [order, ship))
        o = [(1, 10, datetime.datetime(2024, 1, 5), "P1", 1.0)]
        li = [(1, 1, 1, datetime.datetime(2024, 1, 8), 1.0, 1.0)]
        spark.createDataFrame(
            o,
            "o_orderkey long, o_custkey long, o_orderdate timestamp,"
            " o_orderpriority string, o_totalprice double",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/orders.parquet")
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_shipdate timestamp, l_quantity double,"
            " l_extendedprice double",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/lineitem.parquet")
        got = _gate("business_days_to_ship")(
            spark, str(tmp_path / "sf")
        ).collect()[0]
        assert got.n_items == 1
        assert got.sum_bdays == 1
        # same-week sanity: Mon->Fri same week = 4 business days
        # (checked via algebra: B is monotone, +5 per calendar week)


class TestIntegerDivisionSemantics:
    def test_conventions_split_only_on_negatives(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        # a = cents%100-50: values -50, -1, 0, 1, 49
        cents = [0, 49, 50, 51, 99]
        rows = [
            (i + 1, base, 1, "x", c / 100.0) for i, c in enumerate(cents)
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {r.sign_a: r for r in
               _gate("integer_division_semantics")(spark, sf).collect()}
        # negatives: a=-50: trunc -7 r-1 / floor -8 r6; a=-1: 0,-1 / -1,6
        neg = got[-1]
        assert neg.n == 2
        assert neg.sum_trunc_div == -7 and neg.sum_floor_div == -9
        assert neg.sum_trunc_mod == -2 and neg.sum_floor_mod == 12
        assert neg.n_conventions_disagree == 2
        # positives agree
        pos = got[1]
        assert pos.sum_trunc_div == pos.sum_floor_div
        assert pos.n_conventions_disagree == 0
        assert got[0].n_conventions_disagree == 0


class TestNullOrderingRank:
    def test_null_block_position(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        # users 0,7 -> v NULL; users 1,2,3 -> v = user
        rows = [
            (i + 1, base, u, "x", 1.0) for i, u in enumerate((0, 7, 1, 2, 3))
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = _gate("null_ordering_rank")(spark, sf).collect()[0]
        assert got.n_rows == 5 and got.n_nulls == 2
        assert (got.nf_first_null_rank, got.nf_last_null_rank) == (1, 2)
        assert (got.nl_first_null_rank, got.nl_last_null_rank) == (4, 5)
        # nf ranks: nulls(u0)=1,(u7)=2 then 1,2,3 -> checksum
        # 0*1+7*2+1*3+2*4+3*5 = 40; nl: 1*1+2*2+3*3+0*4+7*5 = 49
        assert got.nf_order_checksum == 40
        assert got.nl_order_checksum == 49


class TestMadRobustScale:
    def test_median_and_mad_by_hand(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        # cents: 100, 200, 300, 400, 10000 (outlier)
        vals = [1.0, 2.0, 3.0, 4.0, 100.0]
        rows = [(i + 1, base, 1, "m", v) for i, v in enumerate(vals)]
        sf = _write_events(spark, tmp_path, rows)
        got = _gate("mad_robust_scale")(spark, sf).collect()[0]
        assert got.n == 5
        assert got.median_cents == 300
        # |x-300|: 200,100,0,100,9700 -> sorted 0,100,100,200,9700,
        # lower median (rank 3) = 100
        assert got.mad_cents == 100

    def test_even_count_lower_median(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        rows = [(i + 1, base, 1, "e", v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0])]
        sf = _write_events(spark, tmp_path, rows)
        got = _gate("mad_robust_scale")(spark, sf).collect()[0]
        # lower median of 100,200,300,400 -> rank (4+1) div 2 = 2 -> 200
        assert got.median_cents == 200
        # |x-200|: 100,0,100,200 -> sorted 0,100,100,200 -> rank 2 = 100
        assert got.mad_cents == 100


class TestColumnProfile:
    def test_profile_by_hand(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (1, base, 1, "aa", 1.0, None),
            (2, base, 1, "bb", 1.0, "xy"),
            (3, base, 2, "aa", 2.0, "xyz"),
        ]
        sf = _write_events(spark, tmp_path, rows, with_props=True)
        got = {
            r.col_name: r
            for r in _gate("column_cardinality_profile")(spark, sf).collect()
        }
        assert got["event_id"].n_rows == 3
        assert got["event_id"].n_distinct == 3
        assert got["event_type"].n_distinct == 2
        assert got["event_type"].total_chars == 6
        assert got["props"].n_null == 1
        assert got["props"].n_distinct == 2
        assert got["props"].total_chars == 5  # sum skips the NULL
        assert got["user_id"].n_distinct == 2
        assert got["user_id"].total_chars is None
        assert got["value_cents"].n_distinct == 2


class TestTextHapax:
    def test_hapax_share_by_hand(self, spark, tmp_path):
        docs = [
            (1, "a a b", "en", "s1", 5),
            (2, "b c", "en", "s1", 3),
            (3, "x y", "en", "s2", 3),
        ]
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/documents.parquet")
        got = {
            r.source: r
            for r in _gate("text_hapax_ratio")(
                spark, str(tmp_path / "sf")
            ).collect()
        }
        # s1 tokens: a:2 b:2 c:1 -> vocab 3, hapax 1, n_tokens 5
        assert got["s1"].vocab == 3 and got["s1"].hapax == 1
        assert got["s1"].n_tokens == 5
        assert abs(float(got["s1"].hapax_ratio) - 1 / 3) < 1e-6
        # s2 all hapax
        assert got["s2"].vocab == 2 and got["s2"].hapax == 2
        assert float(got["s2"].hapax_ratio) == 1.0


class TestVecQuantizationError:
    def test_sse_by_hand(self, spark, tmp_path):
        # 64-d vectors, label 0: two vectors differing only in dim 1
        # (0.0001 vs 0.0003 -> ticks 1 vs 3, floor-mean (1+3)//2 = 2,
        # SSE = 1+1 = 2); label 1: one vector (SSE 0)
        v0 = [0.0] * 64
        va = list(v0)
        va[0] = 0.0001
        vb = list(v0)
        vb[0] = 0.0003
        rows = [(1, va, 0), (2, vb, 0), (3, v0, 1)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(
            f"{tmp_path}/sf/embeddings.parquet"
        )
        got = {
            r.label: r
            for r in _gate("vec_quantization_error")(
                spark, str(tmp_path / "sf")
            ).collect()
        }
        assert got[0].n_vectors == 2 and got[0].sse_ticks == 2
        assert got[1].n_vectors == 1 and got[1].sse_ticks == 0
        assert float(got[1].rmse) == 0.0

    def test_negative_sum_floor_mean_portable(self, spark, tmp_path):
        # component sums that are negative and NOT divisible by n: the
        # portable floor-mean must floor (-3 ticks over 2 vectors ->
        # centroid -2), matching DuckDB's // on the raw sum
        v1 = [0.0] * 64
        v1[0] = -0.0001
        v2 = [0.0] * 64
        v2[0] = -0.0002
        rows = [(1, v1, 0), (2, v2, 0)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(
            f"{tmp_path}/sf/embeddings.parquet"
        )
        got = _gate("vec_quantization_error")(
            spark, str(tmp_path / "sf")
        ).collect()[0]
        # ticks -1,-2: floor-mean = -2; SSE = (-1+2)^2 + 0 = 1
        assert got.sse_ticks == 1
