"""Blocked negative mining: determinism, label safety, linear join shape."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.contrastive import negative_samples


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _bucket(i: int, n_buckets: int, salt: str) -> int:
    return int(_md5(f"{salt}{i}")[:8], 16) % n_buckets


ROWS = [(i, ["en", "es", "zh", "fr"][i % 4]) for i in range(200)]


@pytest.fixture(scope="module")
def cands(spark):
    return spark.createDataFrame(ROWS, "doc_id long, lang string").cache()


class TestNegativeSamples:
    def test_matches_python_replay(self, cands):
        got = negative_samples(cands, "doc_id", "lang", k=3, n_buckets=4).collect()
        by_anchor: dict[int, list] = {}
        for r in got:
            by_anchor.setdefault(r["anchor_id"], []).append(r)
        labels = dict(ROWS)
        # python replay of the exact construction
        buckets: dict[int, list[int]] = {}
        for i, _ in ROWS:
            buckets.setdefault(_bucket(i, 4, "cand:"), []).append(i)
        for a, lab in ROWS:
            pool = [
                c
                for c in buckets.get(_bucket(a, 4, "probe:"), [])
                if labels[c] != lab and c != a
            ]
            pool.sort(key=lambda c: (_md5(f"{a}:{c}"), c))
            expect = pool[:3]
            rows = sorted(by_anchor.get(a, []), key=lambda r: r["neg_rank"])
            assert [r["neg_id"] for r in rows] == expect, a

    def test_no_same_label_no_self(self, cands):
        got = negative_samples(cands, "doc_id", "lang", k=5, n_buckets=4).collect()
        labels = dict(ROWS)
        for r in got:
            assert r["neg_label"] != labels[r["anchor_id"]]
            assert r["neg_id"] != r["anchor_id"]

    def test_deterministic_across_partitionings(self, spark, cands):
        a = sorted(map(tuple, negative_samples(cands, "doc_id", "lang", k=3).collect()))
        b = sorted(
            map(
                tuple,
                negative_samples(
                    cands.repartition(13), "doc_id", "lang", k=3
                ).collect(),
            )
        )
        assert a == b

    def test_anchor_subset(self, spark, cands):
        anchors = cands.filter(F.col("doc_id") < 10)
        got = negative_samples(
            cands, "doc_id", "lang", k=2, anchors=anchors
        ).collect()
        assert {r["anchor_id"] for r in got} <= set(range(10))
        assert all(r["neg_rank"] <= 2 for r in got)

    def test_stays_jvm_side(self, cands):
        plan = (
            negative_samples(cands, "doc_id", "lang", k=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
