"""ANN quality audit — recall@k of every ANN tier vs brute force.

Usage: python tools/ann_recall.py [sf_dir] [n_probes] [k]

Deterministic probe set (first ``n_probes`` vec_ids), ground truth from
exact brute-force cosine, then each index answers the same probes:

- LSH multiprobe (8 hyperplanes, 1-bit flips)
- IVF seeded / Lloyd-trained at nprobe 2 and 4 (of 16 lists)
- PQ ADC, md5-seeded and 2-iter Lloyd-trained codebooks (4x16, 8 codes)

Prints ONE JSON line: {"recall": {...}, "wall": {...}, ...} — recall is
mean |top-k ∩ truth| / k over probes; wall is the end-to-end seconds for
that tier's full probe batch (index build included where the tier builds
one, since that is what a cold query pays).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.session import get_spark, read_table


def topk_sets(df, k):
    rows = df.select("probe_id", "vec_id").collect()
    out = {}
    for r in rows:
        out.setdefault(r.probe_id, set()).add(r.vec_id)
    return out


def recall(got: dict, truth: dict, k: int) -> float:
    scores = [len(got.get(p, set()) & t) / k for p, t in truth.items()]
    return round(sum(scores) / len(scores), 4)


def main() -> None:
    from mobilitydatalakebenchmark_spark.operators import similarity as S

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    spark = get_spark(
        "ann_recall", extra_conf={"spark.sql.files.maxPartitionBytes": "2m"}
    )
    e = read_table(spark, sf_dir, "embeddings", heavy=True)
    e.cache().count()
    probes = e.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    probes.cache().count()
    dim = len(e.select("embedding").first()[0])

    recalls: dict[str, float] = {}
    walls: dict[str, float] = {}

    def run(name, fn):
        t0 = time.time()
        got = topk_sets(fn(), k)
        walls[name] = round(time.time() - t0, 2)
        return got

    truth = run("bruteforce", lambda: S.brute_force_topk(e, probes, k=k))
    truth_sets = truth
    recalls["bruteforce"] = 1.0

    tiers = {
        "lsh_multiprobe": lambda: S.lsh_topk(e, probes, dim=dim, k=k),
        # OR-amplified multi-table tiers (round-6): recall compounds as
        # 1-(1-r)^L over L independent tables; audited through the numpy
        # bucket kernel (bit-identical to the expression path — pinned by
        # test — and ~10x the wall, so the audit measures the index, not
        # interpreted fold expressions)
        "lsh_mt4x8": lambda: S.lsh_topk_multitable(
            e, probes, dim=dim, n_tables=4, n_planes=8, k=k, kernel=True
        ),
        "lsh_mt8x8": lambda: S.lsh_topk_multitable(
            e, probes, dim=dim, n_tables=8, n_planes=8, k=k, kernel=True
        ),
        "lsh_mt8x10": lambda: S.lsh_topk_multitable(
            e, probes, dim=dim, n_tables=8, n_planes=10, k=k, kernel=True
        ),
        "lsh_mt16x10": lambda: S.lsh_topk_multitable(
            e, probes, dim=dim, n_tables=16, n_planes=10, k=k, kernel=True
        ),
        "ivf_seeded_np2": lambda: S.ivf_topk(
            *_ivf(S, e, lloyd=0), probes, k=k, nprobe=2
        ),
        "ivf_trained_np2": lambda: S.ivf_topk(
            *_ivf(S, e, lloyd=1), probes, k=k, nprobe=2
        ),
        "ivf_trained_np4": lambda: S.ivf_topk(
            *_ivf(S, e, lloyd=1), probes, k=k, nprobe=4
        ),
        "ivf_trained_np8": lambda: S.ivf_topk(
            *_ivf(S, e, lloyd=1), probes, k=k, nprobe=8
        ),
        "pq_adc_seeded": lambda: _pq(S, e, probes, k, train=0),
        "pq_adc_trained2": lambda: _pq(S, e, probes, k, train=2),
        # 64 codewords per subspace: the codebook-size knob — on
        # near-uniform synthetic vectors small codebooks rank almost
        # randomly, so this tier shows resolution scaling
        "pq_adc_k64_trained2": lambda: _pq(
            S, e, probes, k, train=2, n_codewords=64
        ),
        # finer subspaces x larger codebook: 8x8 geometry at 64 codewords
        # (8 bytes/vector — same budget as 4x16 at 64, double the cells)
        "pq_adc_m8_k64_trained2": lambda: _pq(
            S, e, probes, k, train=2, n_codewords=64, m=8, dsub=8
        ),
        # round-7 IVF+PQ residual tiers (IVFADC): unit-normalized,
        # 64 coarse lists, residual codebook at the full 8-byte budget
        # (8 subspaces x 256 codewords). codes-only ADC vs the
        # shortlist-50 exact-refined pipeline (IVFADC+R)
        "ivfpq_adc_8x256": lambda: _ivfpq(S, e, probes, k, refine=False),
        "ivfpq_refine_8x256_r50": lambda: _ivfpq(S, e, probes, k, refine=True),
        # the widest-routed refined rung: nprobe=16 of 64 lists + R=100
        # re-rank reaches 0.66 recall@5 at sf0.1 — matches the 8-table
        # LSH tier at a fraction of its memory (codes vs 8x bucketed
        # vector copies)
        "ivfpq_refine_8x256_np16_r100": lambda: _ivfpq(
            S, e, probes, k, refine=True, nprobe=16, shortlist=100
        ),
    }
    for name, fn in tiers.items():
        got = run(name, fn)
        recalls[name] = recall(got, truth_sets, k)

    print(
        json.dumps(
            {
                "metric": "ann_recall_at_k",
                "k": k,
                "n_probes": len(truth_sets),
                "corpus": e.count(),
                "recall": recalls,
                "wall_sec": walls,
                "sf_dir": sf_dir,
            }
        )
    )


def _ivf(S, e, lloyd):
    return S.ivf_index(e, n_centroids=16, lloyd_iters=lloyd)


def _ivfpq(S, e, probes, k, refine, nprobe=8, shortlist=50):
    codes, cents, cb = S.ivfpq_index(
        e, n_centroids=64, m_subspaces=8, dsub=8, n_codewords=256, pq_lloyd=1
    )
    if refine:
        return S.ivfpq_refine_topk(
            codes, cents, cb, probes, e, k=k, nprobe=nprobe,
            shortlist=shortlist, m_subspaces=8, dsub=8,
        )
    return S.ivfpq_adc_topk(
        codes, cents, cb, probes, k=k, nprobe=nprobe, m_subspaces=8, dsub=8
    )


def _pq(S, e, probes, k, train, n_codewords=8, m=4, dsub=16):
    if train:
        cb = S.pq_train(e, m, dsub, n_codewords, lloyd_iters=train)
    else:
        cb = S.pq_codebook(e, m, dsub, n_codewords)
    codes = S.pq_encode(e, cb, m, dsub)
    return S.pq_adc_topk(codes, cb, probes, k=k, m_subspaces=m, dsub=dsub)


if __name__ == "__main__":
    main()
