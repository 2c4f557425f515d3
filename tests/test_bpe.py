"""BPE round training vs a literal Python trainer (greedy semantics)."""

from __future__ import annotations

import collections

import pytest

from mobilitydatalakebenchmark_spark.operators.bpe import bpe_train_rounds


def _py_bpe(texts: list[str], n_rounds: int, joiner: str = "@"):
    rules = []
    cur = list(texts)
    for r in range(1, n_rounds + 1):
        counts: collections.Counter = collections.Counter()
        for t in cur:
            toks = t.split(" ")
            for i in range(len(toks) - 1):
                counts[f"{toks[i]} {toks[i + 1]}"] += 1
        if not counts:
            break
        # (count desc, pair asc)
        pair = min(counts, key=lambda p: (-counts[p], p))
        a, b = pair.split(" ")
        nxt = []
        for t in cur:
            # true greedy left-to-right merge
            toks = t.split(" ")
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + joiner + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            nxt.append(" ".join(out))
        total = sum(len(t.split(" ")) for t in nxt)
        rules.append((r, pair, counts[pair], total))
        cur = nxt
    return rules, cur


CORPUS = [
    "the cat sat on the mat",
    "the cat ran",
    "a cat the cat",
    "on the mat on the mat",
    "the the the",
]


class TestBpe:
    def _spark_rules(self, spark, texts, rounds):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        rules, merged = bpe_train_rounds(docs, "text", n_rounds=rounds)
        got = [
            (r["round"], r["pair"], r["pair_count"], r["corpus_tokens_after"])
            for r in rules.orderBy("round").collect()
        ]
        texts_after = [
            r["text"] for r in merged.orderBy("doc_id").collect()
        ]
        return got, texts_after

    def test_matches_python_trainer(self, spark):
        got, merged = self._spark_rules(spark, CORPUS, 3)
        want_rules, want_texts = _py_bpe(CORPUS, 3)
        assert got == want_rules
        assert merged == want_texts

    def test_greedy_overlap_semantics(self, spark):
        # 'x x x x x' + rule (x,x): greedy non-overlap -> 'x@x x@x x'
        got, merged = self._spark_rules(spark, ["x x x x x"], 1)
        assert merged == ["x@x x@x x"]
        assert got[0][1] == "x x"

    def test_token_count_monotone_decreasing(self, spark):
        got, _ = self._spark_rules(spark, CORPUS, 3)
        totals = [g[3] for g in got]
        assert totals == sorted(totals, reverse=True)
        assert all(g[2] >= 2 for g in got)

    def test_merged_tokens_contain_joiner(self, spark):
        _, merged = self._spark_rules(spark, CORPUS, 2)
        assert any("@" in t for t in merged)


class TestBpeExhaustion:
    def test_rounds_stop_when_no_pairs_remain(self, spark):
        """Tiny corpus, many rounds: once every doc is one token, later
        rounds are no-ops and emit no rules."""
        docs = spark.createDataFrame(
            [(0, "a b"), (1, "a b")], "doc_id long, text string"
        )
        rules, merged = bpe_train_rounds(docs, "text", n_rounds=4)
        got = rules.orderBy("round").collect()
        # round 1 merges (a,b) everywhere; rounds 2-4 find no pairs
        assert len(got) == 1 and got[0]["pair"] == "a b"
        assert [r["text"] for r in merged.orderBy("doc_id").collect()] == [
            "a@b",
            "a@b",
        ]


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
