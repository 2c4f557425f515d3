"""Round-9 depth operators: Hampel filter, seasonal profile, multiplier
bootstrap, nDCG — each checked against an independent pure-Python
reference on constructed data (the gate oracles cover the engine-vs-
engine parity; these cover the MATH)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


def _py_med2(vals):
    s = sorted(vals)
    n = len(s)
    return s[(n + 1) // 2 - 1] + s[n // 2]


def _py_hampel(series, half=5, k_per_10000=44478):
    """Brute-force Hampel reference over one entity's ordered series."""
    out = []
    for i, x in enumerate(series):
        fr = series[max(0, i - half) : i + half + 1]
        med2 = _py_med2(fr)
        mad22 = _py_med2([abs(2 * v - med2) for v in fr])
        out.append(2 * abs(2 * x - med2) * 10000 > k_per_10000 * mad22)
    return out


class TestHampel:
    def _run(self, spark, series):
        from mobilitydatalakebenchmark_spark.operators.timeseries import (
            hampel_flags,
        )

        rows = [("e", i, v) for i, v in enumerate(series)]
        df = spark.createDataFrame(rows, "entity string, seq int, cents long")
        got = (
            hampel_flags(df, "entity", ["seq"], "cents")
            .orderBy("seq")
            .select("seq", "is_outlier", "med2", "mad22")
            .collect()
        )
        return got

    def test_matches_bruteforce(self, spark):
        series = [100, 102, 99, 101, 5000, 100, 98, 103, 100, 101, 99,
                  102, 100, 97, 101, -4000, 100, 102]
        got = self._run(spark, series)
        want = _py_hampel(series)
        assert [r.is_outlier for r in got] == want
        # the two injected spikes are flagged, the steady rows are not
        flagged = {r.seq for r in got if r.is_outlier}
        assert 4 in flagged and 15 in flagged
        assert 0 not in flagged and 9 not in flagged

    def test_med2_mad22_exact(self, spark):
        series = [10, 20, 30, 40, 50, 60, 70]
        got = self._run(spark, series)
        for i, r in enumerate(got):
            fr = series[max(0, i - 5) : i + 5 + 1]
            assert r.med2 == _py_med2(fr)
            assert r.mad22 == _py_med2([abs(2 * v - r.med2) for v in fr])

    def test_constant_series_never_flags(self, spark):
        # MAD = 0 and dev = 0: 0 > 0 is false — no division-by-zero trap
        got = self._run(spark, [42] * 15)
        assert not any(r.is_outlier for r in got)


class TestSeasonalProfile:
    def test_recovers_planted_seasonality(self, spark):
        from mobilitydatalakebenchmark_spark.operators.timeseries import (
            seasonal_profile_scaled,
        )

        # 10 days x 24h: flat trend 1000 cents + deterministic hod bump
        rows = []
        for d in range(1, 11):
            for h in range(24):
                ts = f"2024-03-{d:02d} {h:02d}:15:00"
                rows.append((ts, 1000 + (500 if h == 7 else 0)))
        df = spark.createDataFrame(rows, "ts_s string, cents long").select(
            F.to_timestamp("ts_s").alias("ts"), "cents"
        )
        got = {
            r.hod: r
            for r in seasonal_profile_scaled(df, "ts", "cents").collect()
        }
        assert set(got) == set(range(24))
        # hour 7 carries the positive component, every flat hour the
        # compensating negative share (seasonal sums to ~0 by design)
        assert got[7].seasonal_cents > 4.0
        assert all(got[h].seasonal_cents < 0 for h in range(24) if h != 7)
        total = sum(r.sum_detr_scaled for r in got.values())
        # detrended-sum telescopes to ~0 over interior rows of a
        # periodic series with flat trend
        assert abs(total) <= 24 * 500

    def test_interior_frames_only(self, spark):
        from mobilitydatalakebenchmark_spark.operators.timeseries import (
            seasonal_profile_scaled,
        )

        # 30 hourly buckets -> only rows 12..17 (0-based 11..17? exact:
        # frames need 11 preceding + 12 following) have full frames
        rows = [(f"2024-03-01 {h:02d}:00:00", 100) for h in range(24)] + [
            (f"2024-03-02 {h:02d}:00:00", 100) for h in range(6)
        ]
        df = spark.createDataFrame(rows, "ts_s string, cents long").select(
            F.to_timestamp("ts_s").alias("ts"), "cents"
        )
        got = seasonal_profile_scaled(df, "ts", "cents").collect()
        assert sum(r.n_buckets for r in got) == 30 - 11 - 12


class TestBootstrap:
    def _weights_py(self, rep, key, salt="boot"):
        h = hashlib.md5(f"{salt}{rep}_{key}".encode()).hexdigest()[:8]
        return int(h, 16) % 3

    def test_replicate_means_replay_exactly(self, spark):
        from mobilitydatalakebenchmark_spark.operators.bootstrap import (
            replicate_means,
        )

        data = [(k, (k * 37) % 500 + 100) for k in range(1, 201)]
        df = spark.createDataFrame(data, "k long, cents long")
        got = {r.rep: r for r in replicate_means(df, "k", "cents", reps=8).collect()}
        assert set(got) == set(range(1, 9))
        for rep in range(1, 9):
            ws = [(self._weights_py(rep, k), c) for k, c in data]
            wsum = sum(w * c for w, c in ws)
            wn = sum(w for w, _ in ws)
            assert got[rep].wsum == wsum and got[rep].wn == wn
            assert got[rep].mean == wsum / wn

    def test_ci_brackets_point_estimate(self, spark):
        from mobilitydatalakebenchmark_spark.operators.bootstrap import (
            bootstrap_ci_mean,
        )

        data = [(k, (k * 37) % 500 + 100) for k in range(1, 501)]
        df = spark.createDataFrame(data, "k long, cents long")
        row = bootstrap_ci_mean(df, "k", "cents").first()
        assert row.n_reps == 32
        assert row.boot_lo_cents < row.est_mean_cents < row.boot_hi_cents
        # mean-1 multipliers: the interval is a resampling wobble around
        # the point estimate, not a rescaling
        spread = row.boot_hi_cents - row.boot_lo_cents
        assert 0 < spread < row.est_mean_cents * 0.2


class TestNdcg:
    def test_weights_shape(self):
        from mobilitydatalakebenchmark_spark.operators.retrieval import (
            dcg_weights_scaled,
        )

        w = dcg_weights_scaled(10)
        assert w[0] == 1_000_000 and w == sorted(w, reverse=True)
        assert w[2] == 500_000  # 1e6 / log2(4)

    def test_perfect_and_inverted_rankings(self, spark):
        from mobilitydatalakebenchmark_spark.operators.retrieval import (
            dcg_weights_scaled,
            ndcg_at_k,
        )

        rel = spark.createDataFrame(
            [(1, 2), (2, 1), (3, 0)], "doc_id long, rel int"
        )
        perfect = spark.createDataFrame(
            [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
            "query_id string, rank int, doc_id long",
        )
        inverted = spark.createDataFrame(
            [("q", 1, 3), ("q", 2, 2), ("q", 3, 1)],
            "query_id string, rank int, doc_id long",
        )
        p = ndcg_at_k(perfect, rel).first()
        assert p.ndcg == 1.0 and p.dcg_scaled == p.idcg_scaled
        i = ndcg_at_k(inverted, rel).first()
        w = dcg_weights_scaled(10)
        dcg = 0 * w[0] + 1 * w[1] + 2 * w[2]
        idcg = 2 * w[0] + 1 * w[1]
        assert i.dcg_scaled == dcg and i.idcg_scaled == idcg
        assert i.ndcg == round(dcg / idcg, 6)

    def test_all_irrelevant_is_zero(self, spark):
        from mobilitydatalakebenchmark_spark.operators.retrieval import (
            ndcg_at_k,
        )

        rel = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, rel int")
        run = spark.createDataFrame(
            [("q", 1, 1), ("q", 2, 2)],
            "query_id string, rank int, doc_id long",
        )
        assert ndcg_at_k(run, rel).first().ndcg == 0.0


def test_dcg_weight_quantization_error_bounded():
    from mobilitydatalakebenchmark_spark.operators.retrieval import (
        dcg_weights_scaled,
    )

    for r, w in enumerate(dcg_weights_scaled(10), start=1):
        assert abs(w - 1_000_000 / math.log2(r + 1)) <= 0.5


def _py_ks(s1, s2):
    vals = sorted(set(s1) | set(s2))
    n1, n2 = len(s1), len(s2)
    best = 0
    c1 = c2 = 0
    from collections import Counter

    m1, m2 = Counter(s1), Counter(s2)
    for v in vals:
        c1 += m1[v]
        c2 += m2[v]
        best = max(best, abs(c1 * n2 - c2 * n1))
    return n1, n2, best


def _py_mwu(s1, s2):
    """Midrank MWU: U1 = sum over pairs of [x1 > x2] + 0.5*[x1 == x2]."""
    u1_2 = 0
    for a in s1:
        for b in s2:
            u1_2 += 2 if a > b else (1 if a == b else 0)
    return u1_2


class TestNonparametric:
    def _df(self, spark, s1, s2):
        rows = [(v, 1) for v in s1] + [(v, 0) for v in s2]
        return spark.createDataFrame(rows, "v long, g int")

    def test_ks_matches_bruteforce(self, spark):
        from mobilitydatalakebenchmark_spark.operators.nonparametric import (
            ks_two_sample,
        )

        s1 = [(i * 13) % 50 for i in range(40)]
        s2 = [(i * 7) % 50 + 5 for i in range(55)]
        df = self._df(spark, s1, s2)
        got = ks_two_sample(df, "v", F.col("g") == 1).first()
        n1, n2, d_scaled = _py_ks(s1, s2)
        assert (got.n1, got.n2, got.d_scaled) == (n1, n2, d_scaled)
        assert got.d == round(d_scaled / (n1 * n2), 6)

    def test_ks_identical_samples_zero(self, spark):
        from mobilitydatalakebenchmark_spark.operators.nonparametric import (
            ks_two_sample,
        )

        s = [1, 2, 3, 4, 5] * 4
        got = ks_two_sample(self._df(spark, s, s), "v", F.col("g") == 1).first()
        assert got.d_scaled == 0 and got.d == 0.0

    def test_ks_disjoint_samples_one(self, spark):
        from mobilitydatalakebenchmark_spark.operators.nonparametric import (
            ks_two_sample,
        )

        got = ks_two_sample(
            self._df(spark, [1, 2, 3], [10, 11]), "v", F.col("g") == 1
        ).first()
        assert got.d == 1.0

    def test_mwu_matches_pairwise_bruteforce(self, spark):
        from mobilitydatalakebenchmark_spark.operators.nonparametric import (
            mann_whitney_u,
        )

        s1 = [(i * 13) % 23 for i in range(30)]
        s2 = [(i * 7) % 23 + 2 for i in range(45)]
        got = mann_whitney_u(
            self._df(spark, s1, s2), "v", F.col("g") == 1
        ).first()
        u1_2 = _py_mwu(s1, s2)
        assert got.u1_scaled2 == u1_2
        assert got.u2_scaled2 == 2 * len(s1) * len(s2) - u1_2
        assert got.auc == round(u1_2 / (2 * len(s1) * len(s2)), 6)

    def test_mwu_total_dominance(self, spark):
        from mobilitydatalakebenchmark_spark.operators.nonparametric import (
            mann_whitney_u,
        )

        got = mann_whitney_u(
            self._df(spark, [100, 101], [1, 2, 3]), "v", F.col("g") == 1
        ).first()
        assert got.auc == 1.0

    def test_mwu_all_ties_half(self, spark):
        from mobilitydatalakebenchmark_spark.operators.nonparametric import (
            mann_whitney_u,
        )

        got = mann_whitney_u(
            self._df(spark, [7, 7, 7], [7, 7]), "v", F.col("g") == 1
        ).first()
        assert got.auc == 0.5


class TestKaplanMeier:
    def test_textbook_curve(self, spark):
        """Classic KM hand computation: deaths at t=1 (1 of 5) and t=3
        (2 of 3), censored at t=2 and t=4."""
        from mobilitydatalakebenchmark_spark.plans import load_registry  # noqa: F401
        from pyspark.sql import Window, functions as F

        # replicate the gate's step computation on constructed lifetimes
        lifetimes = spark.createDataFrame(
            [(1, True), (2, False), (3, True), (3, True), (4, False)],
            "dur long, observed boolean",
        )
        g = lifetimes.groupBy("dur").agg(
            F.sum(F.when(F.col("observed"), 1).otherwise(0)).alias("d"),
            F.count(F.lit(1)).alias("n_at"),
        )
        w_prev = Window.orderBy("dur").rowsBetween(
            Window.unboundedPreceding, -1
        )
        r = g.select(
            "dur",
            "d",
            (
                F.sum("n_at").over(Window.partitionBy())
                - F.coalesce(F.sum("n_at").over(w_prev), F.lit(0))
            ).alias("n_risk"),
        ).collect()
        by_dur = {row.dur: row for row in r}
        assert by_dur[1].n_risk == 5 and by_dur[1].d == 1
        assert by_dur[2].n_risk == 4 and by_dur[2].d == 0
        assert by_dur[3].n_risk == 3 and by_dur[3].d == 2
        assert by_dur[4].n_risk == 1 and by_dur[4].d == 0
        # S(1) = 4/5; S(3) = 4/5 * 1/3
        # (the gate's fold reproduces these; asserted end-to-end below)

    def test_gate_survival_monotone_and_exact(self, spark):
        from mobilitydatalakebenchmark_spark.plans import load_registry

        reg = load_registry()
        rows = (
            reg["retention_kaplan_meier"]
            .spark(spark, "/root/testdata/sf0.001")
            .collect()
        )
        assert rows, "gate returned no steps"
        # survival is non-increasing in t and within [0, 1] (0.0 is the
        # legitimate endpoint when the last at-risk subject dies)
        surv = [r.survival for r in rows]
        assert all(0.0 <= s <= 1.0 for s in surv)
        assert all(a >= b for a, b in zip(surv, surv[1:]))
        # replay the fold in python from the exact integer step table
        s = 1.0
        for r in rows:
            if r.d > 0:
                s = s * (1.0 - r.d / r.n_risk)
            assert r.survival == round(s, 6)


class TestTimeDecayAttribution:
    def test_hand_computed_credit(self, spark):
        from pyspark.sql import functions as F
        from mobilitydatalakebenchmark_spark.plans import load_registry

        # build a tiny parquet sf-dir with a hand-checkable events table
        import tempfile, os, shutil

        base = tempfile.mkdtemp(prefix="decay_gate_")
        try:
            rows = [
                # user 1: click on day 1, view on day 3, purchase day 3
                (1, "2024-01-01 00:00:00", 1, "click", 0.0),
                (2, "2024-01-03 00:00:00", 1, "view", 0.0),
                (3, "2024-01-03 12:00:00", 1, "purchase", 10.0),
                # user 2: touch outside the 7-day lookback
                (4, "2024-01-01 00:00:00", 2, "click", 0.0),
                (5, "2024-01-09 00:00:00", 2, "purchase", 5.0),
            ]
            df = spark.createDataFrame(
                rows, "event_id long, ts_s string, user_id long, "
                "event_type string, value double"
            ).select(
                "event_id",
                F.to_timestamp("ts_s").alias("ts"),
                "user_id",
                "event_type",
                "value",
                F.lit("{}").alias("props"),
            )
            df.coalesce(1).write.parquet(os.path.join(base, "events.parquet"))
            reg = load_registry()
            got = {
                r.channel: r
                for r in reg["attribution_time_decay"].spark(spark, base).collect()
            }
            # click->purchase: 2.5 days -> d=2 -> w=32; 1000 cents * 32
            assert got["click"].credit_scaled == 1000 * 32
            # view->purchase: 0.5 days -> d=0 -> w=128
            assert got["view"].credit_scaled == 1000 * 128
            # user 2's 8-day-old click earns nothing (absent channel row
            # would also be fine, but the click channel exists via user 1)
            assert got["click"].n_pairs == 1 and got["view"].n_pairs == 1
            total = 1000 * 32 + 1000 * 128
            assert got["click"].share == round(1000 * 32 / total, 6)
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestConnectedComponentsGate:
    def test_matches_union_find(self, spark):
        """The direct CC gate's operator vs a union-find reference on the
        same folded edge set at sf0.001."""
        from mobilitydatalakebenchmark_spark.operators.components import (
            connected_components,
        )
        from pyspark.sql import functions as F

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        edges = (
            li.filter(F.col("l_quantity") < 2)
            .select(
                (F.lit(2000000) + F.col("l_orderkey")).alias("doc_a"),
                F.col("l_partkey").alias("doc_b"),
            )
            .distinct()
        )
        pairs = [(r.doc_a, r.doc_b) for r in edges.collect()]
        parent: dict[int, int] = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {}
        for n in parent:
            want[n] = find(n)
        # canonicalize to min-node labels
        comp_min: dict[int, int] = {}
        for n, c in want.items():
            comp_min[c] = min(comp_min.get(c, n), n)
        want = {n: comp_min[c] for n, c in want.items()}
        got = {
            r.node: r.component
            for r in connected_components(edges, max_iter=10).collect()
        }
        assert got == want
