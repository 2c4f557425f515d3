"""Similarity-search gate queries over the embeddings table
(BASELINE.json north star: ANN over an array<float> column).

Brute-force cosine top-k is the exactness baseline; the scale path is the
LSH/IVF bucketed variant (random-hyperplane signs), which turns the O(n·q)
scan into a bucketed equi-join. Dot products are built-in expressions
(zip_with + aggregate) — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import register
from .relational import t


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as double. zip_with multiplies element-wise; aggregate sums
    sequentially (same order as DuckDB's list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


PROBE_IDS = [0, 1, 2]


@register(
    "vec_norms",
    oracle="""
SELECT vec_id, label,
       round(sqrt(list_sum(list_transform(embedding,
             x -> cast(x AS DOUBLE) * cast(x AS DOUBLE)))), 4) AS l2_norm,
       len(embedding) AS dim
FROM embeddings ORDER BY vec_id
""",
    doc="vector L2 norms via zip_with/aggregate (the dot-product primitive)",
    tags=("vector",),
)
def vec_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings", heavy=True)
    return e.select(
        "vec_id",
        "label",
        F.round(norm(F.col("embedding")), 4).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    ).orderBy("vec_id")


@register(
    "knn_bruteforce_cosine",
    oracle=f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS probe_vec FROM embeddings
  WHERE vec_id IN ({", ".join(map(str, PROBE_IDS))})
), sims AS (
  SELECT p.probe_id, e.vec_id, e.label,
         round(list_dot_product(p.probe_vec, e.embedding)
               / (sqrt(list_dot_product(p.probe_vec, p.probe_vec))
                  * sqrt(list_dot_product(e.embedding, e.embedding))), 4) AS cos_sim
  FROM probes p CROSS JOIN embeddings e
  WHERE e.vec_id != p.probe_id
)
SELECT probe_id, vec_id, label, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cos_sim DESC, vec_id) AS rk
  FROM sims
) WHERE rk <= 5 ORDER BY probe_id, rk
""",
    doc="brute-force cosine top-5 neighbors for 3 probe vectors; the "
    "exactness baseline every ANN variant is measured against",
    tags=("vector", "knn"),
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings", heavy=True)
    probes = e.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        norm(F.col("embedding")).alias("_pn"),
    )
    # broadcast the probe side: n_probes × corpus scan, one pass over data.
    # Norms hoisted out of the pair scoring (one fold per pair, not three
    # — measured -23%); identical doubles, so the oracle is unchanged.
    sims = (
        e.withColumn("_vn", norm(F.col("embedding")))
        .crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            "label",
            F.round(
                dot(F.col("probe_vec"), F.col("embedding"))
                / (F.col("_vn") * F.col("_pn")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("probe_id", "vec_id", "label", "cos_sim")
        .orderBy("probe_id", F.desc("cos_sim"), "vec_id")
    )


@register(
    "vec_label_centroids",
    oracle="""
SELECT label, count(*) AS n,
       round(avg(list_sum(list_transform(embedding, x -> cast(x AS DOUBLE)))), 4)
           AS avg_component_sum,
       round(avg(sqrt(list_sum(list_transform(embedding,
             x -> cast(x AS DOUBLE) * cast(x AS DOUBLE))))), 4) AS avg_norm
FROM embeddings GROUP BY label ORDER BY label
""",
    doc="per-label aggregate vector statistics (centroid-adjacent reduction)",
    tags=("vector",),
)
def vec_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings", heavy=True)
    comp_sum = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return (
        e.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(comp_sum), 4).alias("avg_component_sum"),
            F.round(F.avg(norm(F.col("embedding"))), 4).alias("avg_norm"),
        )
        .orderBy("label")
    )


def _lsh_oracle_sql() -> str:
    """The hyperplanes are deterministic md5-derived constants, so the
    DuckDB twin simply inlines them as literal arrays: bucket bit k =
    sign(list_dot_product(embedding, plane_k)). Sign flips would need a
    projection within ~1e-12 of zero — vanishing for real data."""
    from ..operators.similarity import hyperplanes

    planes = hyperplanes(dim=64, n_planes=8)
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(list_transform(embedding, x -> cast(x AS DOUBLE)), "
        f"[{', '.join(repr(c) for c in plane)}]) > 0 THEN {1 << k} ELSE 0 END)"
        for k, plane in enumerate(planes)
    )
    return f"""
SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
FROM (SELECT vec_id, {bits} AS bucket FROM embeddings)
GROUP BY bucket ORDER BY bucket
"""


@register(
    "vec_lsh_buckets",
    oracle=_lsh_oracle_sql(),
    doc="LSH bucketing: sign bits of 8 fixed pseudo-random hyperplane "
    "projections -> bucket id; the scale path for ANN (bucketed equi-join "
    "instead of full cross product). Deterministic hyperplanes from md5, "
    "inlined as literal arrays in the DuckDB twin.",
    tags=("vector", "lsh"),
)
def vec_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import hyperplanes, lsh_bucket

    e = t(spark, sf_dir, "embeddings", heavy=True)
    planes = hyperplanes(dim=64, n_planes=8)
    out = e.select("vec_id", "label", lsh_bucket(F.col("embedding"), planes).alias("bucket"))
    return (
        out.groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
        .orderBy("bucket")
    )


def _lsh_multiprobe_oracle() -> str:
    """Full SQL twin of the multi-probe LSH search: same inlined hyperplane
    constants as _lsh_oracle_sql, probe buckets = own bucket XOR each
    one-bit mask, candidates via bucket equi-join, exact cosine re-rank."""
    from ..operators.similarity import hyperplanes

    planes = hyperplanes(dim=64, n_planes=8)
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(list_transform(embedding, x -> cast(x AS DOUBLE)), "
        f"[{', '.join(repr(c) for c in plane)}]) > 0 THEN {1 << k} ELSE 0 END)"
        for k, plane in enumerate(planes)
    )
    masks = ", ".join(str(m) for m in [0] + [1 << b for b in range(8)])
    probe_list = ", ".join(map(str, PROBE_IDS))
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {bits} AS bucket FROM embeddings
), probes AS (
  SELECT vec_id AS probe_id, embedding AS probe_vec,
         xor(bucket, unnest([{masks}])) AS bucket
  FROM bucketed WHERE vec_id IN ({probe_list})
), scored AS (
  SELECT p.probe_id, c.vec_id,
         list_dot_product(p.probe_vec, c.embedding)
         / (sqrt(list_dot_product(p.probe_vec, p.probe_vec))
            * sqrt(list_dot_product(c.embedding, c.embedding))) AS raw_sim
  FROM probes p JOIN bucketed c ON p.bucket = c.bucket
  WHERE c.vec_id != p.probe_id
)
SELECT probe_id, vec_id, round(raw_sim, 4) AS cos_sim, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY raw_sim DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= 5 ORDER BY probe_id, rk
"""


@register(
    "knn_lsh_multiprobe",
    oracle=_lsh_multiprobe_oracle(),
    doc="ANN top-5 via random-hyperplane LSH with 1-bit multi-probe "
    "(operators/similarity.py) — the 100TB path: bucketed equi-join "
    "instead of a full scan per probe. Value-checked: the DuckDB twin "
    "recomputes the same buckets from inlined plane constants.",
    tags=("vector", "knn", "lsh"),
)
def knn_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_topk

    e = t(spark, sf_dir, "embeddings", heavy=True)
    probes = e.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    out = lsh_topk(e, probes, dim=64, n_planes=8, k=5)
    return out.select(
        "probe_id", "vec_id", F.round("cos_sim", 4).alias("cos_sim"), "rk"
    ).orderBy("probe_id", "rk")


@register(
    "knn_recall_floor",
    # The error-bound-boolean pattern (knn_ivf / sketch_percentiles /
    # dedup_simhash): the index's neighbor list is engine-specific, but
    # its recall@5 against the exact brute-force top-5 — computed in the
    # SAME plan — is a deterministic claim with measured floors. Observed
    # per-probe hits for the 8-table tier at sf0.001/0.01/0.1: min 3 of 5
    # (floor 2); total hits across the 3 probes: min 10 of 15 (floor 8).
    # Chance level is ~0.25 total hits, so a broken or regressed index
    # flips the booleans and hash-mismatches. This is what makes index
    # QUALITY — not just plumbing — fail a CORRECTNESS row.
    oracle=f"""
SELECT vec_id AS probe_id, 'lsh_mt8x8' AS tier, CAST(5 AS BIGINT) AS n_returned,
       TRUE AS returned_k, TRUE AS recall_ok, TRUE AS mean_floor_ok
FROM embeddings WHERE vec_id IN ({", ".join(map(str, PROBE_IDS))})
  AND (SELECT count(*) FROM embeddings) > 1  -- singleton corpus: no
  -- non-self neighbor can exist, the index returns nothing and the
  -- probe frame is EMPTY on both engines (degenerate sweep, r11)
ORDER BY probe_id
""",
    doc="recall floor for the OR-amplified multi-table LSH tier "
    "(similarity.lsh_topk_multitable, 8 tables x 8 planes, 1-bit "
    "multiprobe, numpy bucket kernel): recall@5 vs in-plan brute force "
    "asserted per probe (>= 2/5) and in aggregate (>= 8/15). The round-6 "
    "tuning: OR-amplification lifts the single-table tier's audited "
    "recall@5 from 0.13 to 0.66 (tools/ann_recall.py, sf0.1, 50 probes)",
    tags=("vector", "knn", "lsh", "kernel"),
)
def knn_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import brute_force_topk, lsh_topk_multitable

    e = t(spark, sf_dir, "embeddings", heavy=True)
    probes = e.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    exact = brute_force_topk(e, probes, k=5).select(
        F.col("probe_id").alias("e_probe"), F.col("vec_id").alias("e_id")
    )
    lsh = lsh_topk_multitable(
        e, probes, dim=64, n_tables=8, n_planes=8, k=5, kernel=True
    ).select("probe_id", "vec_id")
    hits = (
        lsh.join(
            exact,
            (F.col("probe_id") == F.col("e_probe"))
            & (F.col("vec_id") == F.col("e_id")),
            "left",
        )
        .groupBy("probe_id")
        .agg(F.count("*").alias("n_returned"), F.count("e_id").alias("n_hits"))
        # two consumers (per-probe rows + the aggregate floor) — without
        # the checkpoint each one replays brute force AND the LSH index
        .localCheckpoint(eager=False)
    )
    total = hits.agg(F.sum("n_hits").alias("_tot"))
    return (
        hits.crossJoin(F.broadcast(total))
        .select(
            "probe_id",
            F.lit("lsh_mt8x8").alias("tier"),
            "n_returned",
            (F.col("n_returned") == 5).alias("returned_k"),
            (F.col("n_hits") >= 2).alias("recall_ok"),
            (F.col("_tot") >= 8).alias("mean_floor_ok"),
        )
        .orderBy("probe_id")
    )


@register(
    "knn_pq_recall_floor",
    # Error-bound booleans for the round-7 IVF+PQ residual tier
    # (similarity.ivfpq_index / ivfpq_refine_topk — the IVFADC+R layout):
    # unit-normalize, coarse-quantize into 64 lists, PQ-encode the
    # RESIDUALS at the full 8-byte budget (8 subspaces x 256 codewords),
    # ADC-shortlist 50 per probe from nprobe=8 lists, exact-refine to
    # top-5. Recall@5 vs in-plan brute force over 10 probes. Measured
    # hits at sf0.001/0.01/0.1: per-probe min 1 (floor 1), totals
    # 30/31/27 of 50 (floor 18 ~= 2/3 of min, the knn_recall_floor
    # margin convention). Chance level is ~0.8 total hits. The plain-PQ
    # tier at the same code budget audits 0.23 recall; codes-only
    # residual ADC audits 0.30; the refined tier 0.46-0.62.
    oracle="""
SELECT vec_id AS probe_id, 'ivfpq_r8x256' AS tier,
       CAST(5 AS BIGINT) AS n_returned,
       TRUE AS returned_k, TRUE AS recall_ok, TRUE AS total_floor_ok
FROM embeddings WHERE vec_id < 10
  AND (SELECT count(*) FROM embeddings) > 1  -- see knn_recall_floor
ORDER BY probe_id
""",
    doc="recall floor for the IVF+PQ residual tier with exact "
    "refinement (ivfpq_index nc=64 m=8 dsub=8 k=256 + ivfpq_refine_topk "
    "nprobe=8 R=50): per-probe recall@5 >= 1/5 and total >= 18/50 vs "
    "in-plan brute force — the round-7 answer to the PQ ladder floor "
    "(0.23 -> 0.46+ audited at the same 8-byte code budget)",
    tags=("vector", "knn", "pq", "kernel"),
)
def knn_pq_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import (
        brute_force_topk,
        ivfpq_index,
        ivfpq_refine_topk,
    )

    e = t(spark, sf_dir, "embeddings", heavy=True)
    probes = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    exact = brute_force_topk(e, probes, k=5).select(
        F.col("probe_id").alias("e_probe"), F.col("vec_id").alias("e_id")
    )
    codes, cents, cb = ivfpq_index(
        e, n_centroids=64, m_subspaces=8, dsub=8, n_codewords=256, pq_lloyd=1
    )
    approx = ivfpq_refine_topk(
        codes, cents, cb, probes, e, k=5, nprobe=8, shortlist=50,
        m_subspaces=8, dsub=8,
    ).select("probe_id", "vec_id")
    hits = (
        approx.join(
            exact,
            (F.col("probe_id") == F.col("e_probe"))
            & (F.col("vec_id") == F.col("e_id")),
            "left",
        )
        .groupBy("probe_id")
        .agg(F.count("*").alias("n_returned"), F.count("e_id").alias("n_hits"))
        # two consumers (per-probe rows + the aggregate floor) — without
        # the checkpoint each replays brute force AND the index build
        .localCheckpoint(eager=False)
    )
    total = hits.agg(F.sum("n_hits").alias("_tot"))
    return (
        hits.crossJoin(F.broadcast(total))
        .select(
            "probe_id",
            F.lit("ivfpq_r8x256").alias("tier"),
            "n_returned",
            (F.col("n_returned") == 5).alias("returned_k"),
            (F.col("n_hits") >= 1).alias("recall_ok"),
            (F.col("_tot") >= 18).alias("total_floor_ok"),
        )
        .orderBy("probe_id")
    )


_NEARDUP_ORACLE = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.embedding, b.embedding)
             / (sqrt(list_dot_product(a.embedding, a.embedding))
                * sqrt(list_dot_product(b.embedding, b.embedding))), 4) AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND b.vec_id > a.vec_id
WHERE list_dot_product(a.embedding, b.embedding)
      / (sqrt(list_dot_product(a.embedding, a.embedding))
         * sqrt(list_dot_product(b.embedding, b.embedding))) > 0.3
ORDER BY vec_a, vec_b
"""


@register(
    "knn_ivf",
    # Value-checkable twin for an approximate op (the knn_ivf_seeded /
    # sketch_percentiles trick): the IVF neighbor list depends on
    # Spark-computed centroids, but its RECALL vs the exact brute-force
    # top-k is a deterministic in-plan claim. The plan runs IVF (nprobe=4
    # of 8) AND the exact scan, joins them, and emits per-probe booleans
    # "returned exactly k" and "recall@5 >= 2/5" (measured: 2-5 of 5 at
    # sf0.001-0.01; chance level ~0.05 of 5). A broken index flips the
    # booleans and hash-mismatches. The raw neighbor list itself is the
    # (fully value-checked) knn_ivf_seeded gate.
    oracle=f"""
SELECT vec_id AS probe_id, CAST(5 AS BIGINT) AS n_returned,
       TRUE AS returned_k, TRUE AS recall_ok
FROM embeddings WHERE vec_id IN ({", ".join(map(str, PROBE_IDS))})
  AND (SELECT count(*) FROM embeddings) > 1  -- singleton corpus: no
  -- non-self neighbor can exist, the index returns nothing and the
  -- probe frame is EMPTY on both engines (degenerate sweep, r11)
ORDER BY probe_id
""",
    doc="ANN top-5 via an IVF index (deterministic seeds + 1 Lloyd step, "
    "nprobe=4 of 8 inverted lists) — operators/similarity.ivf_index/"
    "ivf_topk — verified in-plan against the exact brute-force top-5",
    tags=("vector", "knn", "ivf", "kernel"),
)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import brute_force_topk, ivf_index, ivf_topk

    e = t(spark, sf_dir, "embeddings", heavy=True)
    probes = e.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    indexed, cents = ivf_index(e, n_centroids=8, lloyd_iters=1)
    ivf = ivf_topk(indexed, cents, probes, k=5, nprobe=4).select("probe_id", "vec_id")
    exact = brute_force_topk(e, probes, k=5).select(
        F.col("probe_id").alias("exact_probe"), F.col("vec_id").alias("exact_id")
    )
    hits = ivf.join(
        exact,
        (F.col("probe_id") == F.col("exact_probe"))
        & (F.col("vec_id") == F.col("exact_id")),
        "left",
    ).groupBy("probe_id").agg(
        F.count("*").alias("n_returned"),
        F.count("exact_id").alias("n_hits"),
    )
    return hits.select(
        "probe_id",
        "n_returned",
        (F.col("n_returned") == 5).alias("returned_k"),
        (F.col("n_hits") >= 2).alias("recall_ok"),
    ).orderBy("probe_id")


@register(
    "vec_neardup_pairs_numpy",
    oracle=_NEARDUP_ORACLE,
    doc="same semantics as vec_neardup_pairs through the blocked-numpy "
    "applyInPandas kernel (operators/similarity.py) — the Arrow-vectorized "
    "scale path, oracle-checked against the identical SQL",
    tags=("vector", "dedup", "kernel"),
)
def vec_neardup_pairs_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_pairs_numpy

    e = t(spark, sf_dir, "embeddings", heavy=True)
    out = cosine_pairs_numpy(e, block_col="label", threshold=0.3)
    return out.select(
        "vec_a", "vec_b", F.round("cos_sim", 4).alias("cos_sim")
    ).orderBy("vec_a", "vec_b")


@register(
    "vec_neardup_pairs",
    oracle="""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.embedding, b.embedding)
             / (sqrt(list_dot_product(a.embedding, a.embedding))
                * sqrt(list_dot_product(b.embedding, b.embedding))), 4) AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND b.vec_id > a.vec_id
WHERE list_dot_product(a.embedding, b.embedding)
      / (sqrt(list_dot_product(a.embedding, a.embedding))
         * sqrt(list_dot_product(b.embedding, b.embedding))) > 0.3
ORDER BY vec_a, vec_b
""",
    doc="embedding-cosine high-similarity pairs (threshold 0.3 — the synthetic vectors' max within-label cosine is ~0.5), blocked by label (the "
    "blocking key stands in for the LSH bucket at oracle scale)",
    tags=("vector", "dedup"),
)
def vec_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # precompute each vector's norm once (n rows) instead of per pair
    # (n²/blocks rows); the pair stage then does exactly one dot product.
    e = t(spark, sf_dir, "embeddings", heavy=True).select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    a = e.alias("a")
    b = e.alias("b")
    sim = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("b.vec_id") > F.col("a.vec_id")),
        )
        .withColumn("cos_raw", sim)
        .filter(F.col("cos_raw") > 0.3)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round("cos_raw", 4).alias("cos_sim"),
        )
        .orderBy("vec_a", "vec_b")
    )


_CONFUSION_ORACLE = """
WITH pos AS (
  SELECT label, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS x
  FROM embeddings
), cents AS (
  SELECT label AS c_label, i, avg(cast(x AS DOUBLE)) AS c FROM pos GROUP BY label, i
), clists AS (
  SELECT c_label, list(c ORDER BY i) AS c_list FROM cents GROUP BY c_label
), scored AS (
  SELECT e.vec_id, e.label, cl.c_label,
         list_dot_product(list_transform(e.embedding, x -> cast(x AS DOUBLE)), cl.c_list)
         / (sqrt(list_sum(list_transform(e.embedding, x -> cast(x AS DOUBLE) * cast(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(cl.c_list, x -> x * x)))) AS sim
  FROM embeddings e CROSS JOIN clists cl
), best AS (
  SELECT vec_id, label, c_label,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_label) AS rk
  FROM scored
)
SELECT label, c_label AS assigned_label, count(*) AS n_vectors
FROM best WHERE rk = 1
GROUP BY label, c_label ORDER BY label, assigned_label
"""


@register(
    "vec_nearest_centroid_confusion",
    oracle=_CONFUSION_ORACLE,
    doc="nearest-centroid assignment confusion matrix: per-label mean "
    "vectors (one label-keyed shuffle) broadcast against every embedding, "
    "cosine argmax per vector — the cluster-assignment / classification "
    "primitive; fact side never shuffles on vector contents",
    tags=("vector",),
)
def vec_nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import assign_nearest_centroid, label_centroids

    e = t(spark, sf_dir, "embeddings", heavy=True)
    assigned = assign_nearest_centroid(e, label_centroids(e), keep_cols=("label",))
    return (
        assigned.groupBy("label", "assigned_label")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("label", "assigned_label")
    )


@register(
    "vec_nearest_centroid_confusion_numpy",
    oracle=_CONFUSION_ORACLE,
    doc="same semantics as vec_nearest_centroid_confusion through the "
    "mapInPandas blocked-matmul kernel (similarity."
    "assign_nearest_centroid_numpy) — the wide-vector scale path, "
    "oracle-checked against the identical SQL",
    tags=("vector", "kernel"),
)
def vec_nearest_centroid_confusion_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import assign_nearest_centroid_numpy, label_centroids

    e = t(spark, sf_dir, "embeddings", heavy=True)
    assigned = assign_nearest_centroid_numpy(
        e, label_centroids(e), keep_cols=("label",)
    )
    return (
        assigned.groupBy("label", "assigned_label")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("label", "assigned_label")
    )


_IVF_K = 8       # seed centroids
_IVF_NPROBE = 2  # inverted lists scanned per probe


@register(
    "knn_ivf_seeded",
    oracle=f"""
WITH seeds AS (
  SELECT embedding AS cvec,
         row_number() OVER (ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id) - 1
             AS centroid_id
  FROM embeddings
  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT {_IVF_K}
), assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, s.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding, s.cvec)
                      / (sqrt(list_dot_product(e.embedding, e.embedding))
                         * sqrt(list_dot_product(s.cvec, s.cvec))) DESC,
                      s.centroid_id) AS ark
    FROM embeddings e CROSS JOIN seeds s
  ) WHERE ark = 1
), probe_lists AS (
  SELECT probe_id, probe_vec, centroid_id FROM (
    SELECT p.vec_id AS probe_id, p.embedding AS probe_vec, s.centroid_id,
           row_number() OVER (
             PARTITION BY p.vec_id
             ORDER BY list_dot_product(p.embedding, s.cvec)
                      / (sqrt(list_dot_product(p.embedding, p.embedding))
                         * sqrt(list_dot_product(s.cvec, s.cvec))) DESC,
                      s.centroid_id) AS prk
    FROM embeddings p CROSS JOIN seeds s
    WHERE p.vec_id IN ({", ".join(map(str, PROBE_IDS))})
  ) WHERE prk <= {_IVF_NPROBE}
), scored AS (
  SELECT pl.probe_id, a.vec_id,
         round(list_dot_product(pl.probe_vec, a.embedding)
               / (sqrt(list_dot_product(pl.probe_vec, pl.probe_vec))
                  * sqrt(list_dot_product(a.embedding, a.embedding))), 4)
             AS cos_sim
  FROM probe_lists pl JOIN assigned a USING (centroid_id)
  WHERE a.vec_id != pl.probe_id
)
SELECT probe_id, vec_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cos_sim DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= 5 ORDER BY probe_id, cos_sim DESC, vec_id
""",
    doc="IVF ANN with md5-seeded centroids (lloyd_iters=0), fully value-"
    "checked: the deterministic seeding makes the whole index replayable "
    "in SQL, closing the rows-only gap of the Lloyd-refined knn_ivf. "
    "Assignment + probe routing + re-rank all in expressions (sequential "
    "f64 dot product, same fold order as the oracle)",
    tags=("vector", "knn"),
)
def knn_ivf_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings", heavy=True)
    # deterministic seed centroids: first K vectors by md5(id); tiny ->
    # driver-side enumerate (bounded by K), same as ivf_index's seeding
    seeds_rows = (
        e.select("vec_id", "embedding")
        .withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h", "vec_id")
        .limit(_IVF_K)
        .collect()
    )
    from ..session import local_df

    seeds = local_df(
        spark,
        [(i, [float(x) for x in r.embedding]) for i, r in enumerate(seeds_rows)],
        "centroid_id int, cvec array<float>",
    )
    # assignment: combinable max-struct argmax (no per-vec window sort).
    # Norms hoisted — one fold per scored pair; the vector norm rides the
    # aggregate so the final re-rank also pays a single fold per pair.
    seeds = seeds.withColumn("_sn", norm(F.col("cvec")))
    sims = (
        e.withColumn("_vn", norm(F.col("embedding")))
        .crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            "embedding",
            "_vn",
            "centroid_id",
            (
                dot(F.col("embedding"), F.col("cvec"))
                / (F.col("_vn") * F.col("_sn"))
            ).alias("_cs"),
        )
    )
    assigned = (
        sims.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("_cs"), (-F.col("centroid_id")).alias("_nc"))
            ).alias("_m"),
            F.first("embedding").alias("embedding"),
            F.first("_vn").alias("_vn"),
        )
        .select(
            "vec_id",
            "embedding",
            "_vn",
            (-F.col("_m._nc")).cast("int").alias("centroid_id"),
        )
    )
    probes = e.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        norm(F.col("embedding")).alias("_pn"),
    )
    prk_w = Window.partitionBy("probe_id").orderBy(
        F.desc("_cs"), F.asc("centroid_id")
    )
    probe_lists = (
        probes.crossJoin(F.broadcast(seeds))
        .select(
            "probe_id",
            "probe_vec",
            "_pn",
            "centroid_id",
            (
                dot(F.col("probe_vec"), F.col("cvec"))
                / (F.col("_pn") * F.col("_sn"))
            ).alias("_cs"),
        )
        .withColumn("prk", F.row_number().over(prk_w))
        .filter(F.col("prk") <= _IVF_NPROBE)
        .drop("_cs", "prk")
    )
    scored = (
        assigned.join(F.broadcast(probe_lists), "centroid_id")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(
                dot(F.col("probe_vec"), F.col("embedding"))
                / (F.col("_vn") * F.col("_pn")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("probe_id", "vec_id", "cos_sim")
        .orderBy("probe_id", F.desc("cos_sim"), "vec_id")
    )


# ---------------------------------------------------------------------------
# Round 4: product-quantization ANN, SemDeDup semantic dedup, distributed
# covariance — the remaining pillars of a 100-TB embedding pipeline.
# ---------------------------------------------------------------------------

_PQ_M = 4        # subspaces
_PQ_DSUB = 16    # dims per subspace (4 x 16 = 64)
_PQ_K = 8        # codewords per subspace

_PQ_SEEDS_SQL = f"""
seeds AS (
  SELECT embedding AS svec,
         row_number() OVER (ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id) - 1
             AS codeword_id
  FROM embeddings
  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT {_PQ_K}
), subspaces AS (
  SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m
), codebook AS (
  SELECT sub.m, s.codeword_id,
         list_slice(s.svec, sub.m * {_PQ_DSUB} + 1,
                    sub.m * {_PQ_DSUB} + {_PQ_DSUB}) AS cvec
  FROM seeds s CROSS JOIN subspaces sub
)"""


@register(
    "knn_pq_adc_seeded",
    oracle=f"""
WITH {_PQ_SEEDS_SQL}, corpus_sub AS (
  SELECT e.vec_id, sub.m,
         list_slice(e.embedding, sub.m * {_PQ_DSUB} + 1,
                    sub.m * {_PQ_DSUB} + {_PQ_DSUB}) AS v
  FROM embeddings e CROSS JOIN subspaces sub
), codes AS (
  SELECT vec_id, m, codeword_id FROM (
    SELECT cs.vec_id, cs.m, cb.codeword_id,
           row_number() OVER (
             PARTITION BY cs.vec_id, cs.m
             ORDER BY list_dot_product(cs.v, cs.v)
                      - 2 * list_dot_product(cs.v, cb.cvec)
                      + list_dot_product(cb.cvec, cb.cvec) ASC,
                      cb.codeword_id) AS rk
    FROM corpus_sub cs JOIN codebook cb USING (m)
  ) WHERE rk = 1
), lut AS (
  SELECT p.vec_id AS probe_id, cb.m, cb.codeword_id,
         list_dot_product(
             list_slice(p.embedding, cb.m * {_PQ_DSUB} + 1,
                        cb.m * {_PQ_DSUB} + {_PQ_DSUB}),
             list_slice(p.embedding, cb.m * {_PQ_DSUB} + 1,
                        cb.m * {_PQ_DSUB} + {_PQ_DSUB}))
         - 2 * list_dot_product(
             list_slice(p.embedding, cb.m * {_PQ_DSUB} + 1,
                        cb.m * {_PQ_DSUB} + {_PQ_DSUB}), cb.cvec)
         + list_dot_product(cb.cvec, cb.cvec) AS d2p
  FROM embeddings p CROSS JOIN codebook cb
  WHERE p.vec_id IN ({", ".join(map(str, PROBE_IDS))})
), scored AS (
  SELECT l.probe_id, c.vec_id, round(sum(l.d2p), 4) AS adc_d2
  FROM codes c JOIN lut l USING (m, codeword_id)
  WHERE c.vec_id != l.probe_id
  GROUP BY l.probe_id, c.vec_id
)
SELECT probe_id, vec_id, adc_d2 FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY adc_d2 ASC, vec_id) AS rk
  FROM scored
) WHERE rk <= 5 ORDER BY probe_id, adc_d2, vec_id
""",
    doc="product-quantization ANN (ADC scoring) with md5-seeded codebooks, "
    "fully value-checked: 4x16-dim subspaces, 8 codewords each, squared-L2 "
    "codeword assignment via combinable min-struct, then the classic "
    "broadcast ADC lookup table — the 64x-compression index that keeps a "
    "100-TB embedding corpus scannable without touching raw vectors "
    "(operators/similarity.py pq_codebook/pq_encode/pq_adc_topk)",
    tags=("vector", "knn"),
)
def knn_pq_adc_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_adc_topk, pq_codebook, pq_encode

    e = t(spark, sf_dir, "embeddings", heavy=True)
    cb = pq_codebook(e, _PQ_M, _PQ_DSUB, _PQ_K)
    codes = pq_encode(e, cb, _PQ_M, _PQ_DSUB)
    probes = e.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    return (
        pq_adc_topk(codes, cb, probes, k=5, m_subspaces=_PQ_M, dsub=_PQ_DSUB)
        .select("probe_id", "vec_id", "adc_d2")
        .orderBy("probe_id", "adc_d2", "vec_id")
    )


_SEM_K = 8          # clusters
_SEM_THRESH = 0.25  # within-cluster cosine drop threshold
_SEM_CAP = 48       # per-cluster comparison cap (degenerate-cluster guard)


@register(
    "dedup_semantic_clusters",
    oracle=f"""
WITH seeds AS (
  SELECT embedding AS cvec,
         row_number() OVER (ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id) - 1
             AS centroid_id
  FROM embeddings
  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT {_SEM_K}
), assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, s.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding, s.cvec)
                      / (sqrt(list_dot_product(e.embedding, e.embedding))
                         * sqrt(list_dot_product(s.cvec, s.cvec))) DESC,
                      s.centroid_id) AS ark
    FROM embeddings e CROSS JOIN seeds s
  ) WHERE ark = 1
), capped AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT a.*, row_number() OVER (PARTITION BY centroid_id ORDER BY vec_id)
               AS crk
    FROM assigned a
  ) WHERE crk <= {_SEM_CAP}
), pairs AS (
  SELECT a.centroid_id, b.vec_id AS dropped_id
  FROM capped a JOIN capped b
    ON a.centroid_id = b.centroid_id AND b.vec_id > a.vec_id
  WHERE list_dot_product(a.embedding, b.embedding)
        / (sqrt(list_dot_product(a.embedding, a.embedding))
           * sqrt(list_dot_product(b.embedding, b.embedding))) > {_SEM_THRESH}
), members AS (
  SELECT centroid_id, count(*) AS n_members FROM assigned GROUP BY centroid_id
), pair_stats AS (
  SELECT centroid_id, count(*) AS n_dup_pairs,
         count(DISTINCT dropped_id) AS n_dropped
  FROM pairs GROUP BY centroid_id
)
SELECT m.centroid_id, m.n_members,
       coalesce(p.n_dup_pairs, 0) AS n_dup_pairs,
       coalesce(p.n_dropped, 0) AS n_dropped,
       m.n_members - coalesce(p.n_dropped, 0) AS n_kept,
       greatest(m.n_members - {_SEM_CAP}, 0) AS n_truncated
FROM members m LEFT JOIN pair_stats p USING (centroid_id)
ORDER BY m.centroid_id
""",
    doc="SemDeDup-style semantic deduplication: md5-seeded nearest-centroid "
    "clustering (argmax via combinable max-struct, linear), then "
    "within-cluster cosine pruning keeping the lowest vec_id — the cluster "
    "id is the blocking key, so the pair join is quadratic only inside a "
    "cluster (the documented SemDeDup trade; production raises n_clusters "
    f"with corpus size). A per-cluster comparison cap ({_SEM_CAP} here, so "
    "the guard actually fires at the gate SF) bounds the pair join against "
    "a degenerate runaway cluster; members past the cap stay un-compared "
    "and are reported as n_truncated. "
    "operators/similarity.py semantic_dedup_summary",
    tags=("vector", "dedup"),
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semantic_dedup_summary

    e = t(spark, sf_dir, "embeddings", heavy=True)
    return semantic_dedup_summary(
        e, n_clusters=_SEM_K, threshold=_SEM_THRESH, max_cluster_size=_SEM_CAP
    )


_COV_DIMS = 8  # leading dims for the covariance gate (36 upper-tri pairs)


@register(
    "vec_covariance_matrix",
    oracle=f"""
WITH dims AS (
  SELECT unnest(generate_series(1, {_COV_DIMS})) AS i
), pairs AS (
  SELECT a.i, b.i AS j FROM dims a JOIN dims b ON b.i >= a.i
)
SELECT p.i, p.j,
       round(covar_pop(CAST(embedding[p.i] AS DOUBLE),
                       CAST(embedding[p.j] AS DOUBLE)), 6) AS cov_pop,
       round(corr(CAST(embedding[p.i] AS DOUBLE),
                  CAST(embedding[p.j] AS DOUBLE)), 6) AS corr_r,
       count(*) AS n
FROM embeddings CROSS JOIN pairs p
GROUP BY p.i, p.j ORDER BY p.i, p.j
""",
    doc="distributed covariance/correlation matrix (upper triangle, leading "
    f"{_COV_DIMS} dims) — the PCA/whitening prep step: explode each vector "
    "against the broadcast (i,j) pair list, one partial-agg groupBy on 36 "
    "keys; shuffle width is |pairs|, never corpus-sized. At full d=64 the "
    "same plan carries d(d+1)/2 = 2080 keys",
    tags=("vector",),
)
def vec_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the expression path, now a library operator; callers who don't want
    # to choose use similarity.covariance_matrix, which dispatches on the
    # requested width (expr < 128 dims <= gram — the measured crossover)
    from ..operators.similarity import covariance_matrix_expr

    e = t(spark, sf_dir, "embeddings", heavy=True)
    return covariance_matrix_expr(e, _COV_DIMS)


@register(
    "vec_covariance_matrix_gram",
    # identical oracle to vec_covariance_matrix: the two plans must agree
    # value-for-value at 6 dp (the one-pass Gram sums vs DuckDB's running
    # covar_pop diverge ~1e-12 on these O(1)-magnitude components).
    oracle=f"""
WITH dims AS (
  SELECT unnest(generate_series(1, {_COV_DIMS})) AS i
), pairs AS (
  SELECT a.i, b.i AS j FROM dims a JOIN dims b ON b.i >= a.i
)
SELECT p.i, p.j,
       round(covar_pop(CAST(embedding[p.i] AS DOUBLE),
                       CAST(embedding[p.j] AS DOUBLE)), 6) AS cov_pop,
       round(corr(CAST(embedding[p.i] AS DOUBLE),
                  CAST(embedding[p.j] AS DOUBLE)), 6) AS corr_r,
       count(*) AS n
FROM embeddings CROSS JOIN pairs p
GROUP BY p.i, p.j ORDER BY p.i, p.j
""",
    doc="same covariance/correlation matrix through the one-pass Gram "
    "kernel (operators/similarity.py covariance_gram_partials): a "
    "mapInPandas batch matmul emits per-pair sufficient statistics, the "
    "merge is a groupBy-sum on d(d+1)/2 keys — each vector is touched "
    "once instead of being replicated |pairs| times by the expression "
    "plan's crossJoin. MEASURED CROSSOVER (local[32], sf0.1): at d=64 "
    "the codegen'd expression plan still wins (1.5 s vs 2.7 s at 100k "
    "vectors — the inflation is pipelined map-side into the partial agg "
    "and never shuffles, while Arrow pays per-batch array conversion); "
    "at d=256 the kernel wins 2.5x (2.1 s vs 5.2 s at 20k vectors) and "
    "the gap grows ~d^2. Pick the expression twin for narrow embeddings, "
    "this kernel for wide ones",
    tags=("vector", "kernel"),
)
def vec_covariance_matrix_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import covariance_matrix_gram

    e = t(spark, sf_dir, "embeddings", heavy=True)
    return covariance_matrix_gram(e, _COV_DIMS)


@register(
    "knn_persisted_index_probe",
    # the knn_ivf trick for approximate ops: the PERSISTED index's
    # neighbor lists depend on Spark-trained centroids, but "the store
    # indexed every vector" and "recall@5 vs the exact scan clears the
    # floor" are deterministic in-plan claims the oracle can assert.
    oracle=f"""
SELECT vec_id AS probe_id, CAST(5 AS BIGINT) AS n_returned,
       TRUE AS returned_k, TRUE AS recall_ok,
       (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_indexed
FROM embeddings WHERE vec_id IN ({", ".join(map(str, PROBE_IDS))})
  AND (SELECT count(*) FROM embeddings) > 1  -- singleton corpus: no
  -- non-self neighbor can exist, the index returns nothing and the
  -- probe frame is EMPTY on both engines (degenerate sweep, r11)
ORDER BY probe_id
""",
    doc="the persisted ANN index store gets its own driver verdict "
    "(operators/ann_index.IVFIndexStore — previously pytest-only): "
    "build the IVF index on the vec_id%5!=3 corpus slice, APPEND the "
    "held-out slice against the frozen centroids (the incremental-"
    "indexing path), then probe from the on-disk index — routed "
    "through the centroid broadcast into the centroid_id-partitioned "
    "lists (dynamic partition pruning reads nprobe/k of the files); "
    "emits per-probe returned_k and recall@5>=2 vs the exact "
    "brute-force scan, plus n_indexed == |corpus| pinning append "
    "completeness",
    tags=("vector", "knn", "ivf", "store", "write"),
)
def knn_persisted_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators.ann_index import IVFIndexStore
    from ..operators.similarity import brute_force_topk

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_gates",
        f"ann_store_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)

    # NOT heavy: the store's partitioned writes would fan every
    # centroid dir into |cores| tiny files at gate scale, and the
    # per-row work here is one argmax — scan parallelism buys nothing
    e = t(spark, sf_dir, "embeddings")
    store = IVFIndexStore(base, n_centroids=8)
    store.build(e.filter(F.col("vec_id") % 5 != 3), lloyd_iters=1)
    store.append(e.filter(F.col("vec_id") % 5 == 3))
    n_indexed = store.indexed_ids(spark).count()

    probes = e.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )
    ann = store.topk(probes, k=5, nprobe=4).select("probe_id", "vec_id")
    exact = brute_force_topk(e, probes, k=5).select(
        F.col("probe_id").alias("exact_probe"),
        F.col("vec_id").alias("exact_id"),
    )
    hits = (
        ann.join(
            exact,
            (F.col("probe_id") == F.col("exact_probe"))
            & (F.col("vec_id") == F.col("exact_id")),
            "left",
        )
        .groupBy("probe_id")
        .agg(
            F.count("*").alias("n_returned"),
            F.count("exact_id").alias("n_hits"),
        )
    )
    return hits.select(
        "probe_id",
        "n_returned",
        (F.col("n_returned") == 5).alias("returned_k"),
        (F.col("n_hits") >= 2).alias("recall_ok"),
        F.lit(n_indexed).cast("long").alias("n_indexed"),
    ).orderBy("probe_id")


# ---------------------------------------------------------------------------
# Filtered ANN: the metadata-predicate k-NN every retrieval stack needs
# ("nearest N among label = X"). The predicate lands INSIDE the inverted-
# list candidate scan — filter-then-rank — so the probe returns the k
# nearest MATCHING vectors; post-filtering an unfiltered top-k instead
# silently returns < k (often 0) matches whenever the query's neighborhood
# is dominated by non-matching vectors. Persisted-index twin:
# ann_index.IVFIndexStore.topk(where=...), pytest-pinned; this gate is the
# md5-seeded in-plan form (lloyd_iters=0), fully value-checked like
# knn_ivf_seeded.
# ---------------------------------------------------------------------------

_IVF_F_NPROBE = 3  # filtered probes scan one extra list: the predicate
# thins each list ~10x here, so a wider route keeps the candidate pool
# comparable to the unfiltered gate at the same k


@register(
    "knn_ivf_filtered",
    oracle=f"""
WITH seeds AS (
  SELECT embedding AS cvec,
         row_number() OVER (ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id) - 1
             AS centroid_id
  FROM embeddings
  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT {_IVF_K}
), assigned AS (
  SELECT vec_id, embedding, label, centroid_id FROM (
    SELECT e.vec_id, e.embedding, e.label, s.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding, s.cvec)
                      / (sqrt(list_dot_product(e.embedding, e.embedding))
                         * sqrt(list_dot_product(s.cvec, s.cvec))) DESC,
                      s.centroid_id) AS ark
    FROM embeddings e CROSS JOIN seeds s
  ) WHERE ark = 1
), probe_lists AS (
  SELECT probe_id, probe_vec, centroid_id FROM (
    SELECT p.vec_id AS probe_id, p.embedding AS probe_vec, s.centroid_id,
           row_number() OVER (
             PARTITION BY p.vec_id
             ORDER BY list_dot_product(p.embedding, s.cvec)
                      / (sqrt(list_dot_product(p.embedding, p.embedding))
                         * sqrt(list_dot_product(s.cvec, s.cvec))) DESC,
                      s.centroid_id) AS prk
    FROM embeddings p CROSS JOIN seeds s
    WHERE p.vec_id IN ({", ".join(map(str, PROBE_IDS))})
  ) WHERE prk <= {_IVF_F_NPROBE}
), scored AS (
  SELECT pl.probe_id, a.vec_id, a.label,
         round(list_dot_product(pl.probe_vec, a.embedding)
               / (sqrt(list_dot_product(pl.probe_vec, pl.probe_vec))
                  * sqrt(list_dot_product(a.embedding, a.embedding))), 4)
             AS cos_sim
  FROM probe_lists pl JOIN assigned a USING (centroid_id)
  WHERE a.label = pl.probe_id + 1 AND a.vec_id != pl.probe_id
)
SELECT probe_id, vec_id, label, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cos_sim DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= 5 ORDER BY probe_id, cos_sim DESC, vec_id
""",
    doc="filtered IVF ANN (per-probe metadata predicate label = probe_id "
    "+ 1 applied INSIDE the inverted-list candidate scan, never as a "
    "recall-losing post-filter of an unfiltered top-k): md5-seeded "
    "centroids make the whole filtered index replayable in SQL, so the "
    "gate is fully value-checked like knn_ivf_seeded; persisted twin "
    "ann_index.IVFIndexStore.topk(where=...) pushes the same predicate "
    "to the parquet list scan alongside dynamic partition pruning "
    "(pytest-pinned)",
    tags=("vector", "knn", "filter"),
)
def knn_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings", heavy=True)
    seeds_rows = (
        e.select("vec_id", "embedding")
        .withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h", "vec_id")
        .limit(_IVF_K)
        .collect()
    )
    from ..session import local_df

    seeds = local_df(
        spark,
        [(i, [float(x) for x in r.embedding]) for i, r in enumerate(seeds_rows)],
        "centroid_id int, cvec array<float>",
    ).withColumn("_sn", norm(F.col("cvec")))
    sims = (
        e.withColumn("_vn", norm(F.col("embedding")))
        .crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            "embedding",
            "label",
            "_vn",
            "centroid_id",
            (
                dot(F.col("embedding"), F.col("cvec"))
                / (F.col("_vn") * F.col("_sn"))
            ).alias("_cs"),
        )
    )
    assigned = (
        sims.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("_cs"), (-F.col("centroid_id")).alias("_nc"))
            ).alias("_m"),
            F.first("embedding").alias("embedding"),
            F.first("label").alias("label"),
            F.first("_vn").alias("_vn"),
        )
        .select(
            "vec_id",
            "embedding",
            "label",
            "_vn",
            (-F.col("_m._nc")).cast("int").alias("centroid_id"),
        )
    )
    probes = e.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        norm(F.col("embedding")).alias("_pn"),
    )
    prk_w = Window.partitionBy("probe_id").orderBy(
        F.desc("_cs"), F.asc("centroid_id")
    )
    probe_lists = (
        probes.crossJoin(F.broadcast(seeds))
        .select(
            "probe_id",
            "probe_vec",
            "_pn",
            "centroid_id",
            (
                dot(F.col("probe_vec"), F.col("cvec"))
                / (F.col("_pn") * F.col("_sn"))
            ).alias("_cs"),
        )
        .withColumn("prk", F.row_number().over(prk_w))
        .filter(F.col("prk") <= _IVF_F_NPROBE)
        .drop("_cs", "prk")
    )
    scored = (
        assigned.join(F.broadcast(probe_lists), "centroid_id")
        # filter-then-rank: the predicate thins the CANDIDATE set, so
        # top-k ranks over matching vectors only
        .filter(
            (F.col("label") == F.col("probe_id") + 1)
            & (F.col("vec_id") != F.col("probe_id"))
        )
        .select(
            "probe_id",
            "vec_id",
            "label",
            F.round(
                dot(F.col("probe_vec"), F.col("embedding"))
                / (F.col("_vn") * F.col("_pn")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("probe_id", "vec_id", "label", "cos_sim")
        .orderBy("probe_id", F.desc("cos_sim"), "vec_id")
    )


@register(
    "streaming_ann_index_ingest",
    # same oracle shape as knn_persisted_index_probe: the streamed
    # index's lists depend on Spark-trained centroids, but "every held-
    # out vector was indexed by the stream" and "recall@5 vs the exact
    # scan clears the floor" are deterministic in-plan claims.
    oracle=f"""
SELECT vec_id AS probe_id, CAST(5 AS BIGINT) AS n_returned,
       TRUE AS returned_k, TRUE AS recall_ok,
       (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_indexed
FROM embeddings WHERE vec_id IN ({", ".join(map(str, PROBE_IDS))})
  AND (SELECT count(*) FROM embeddings) > 1  -- singleton corpus: no
  -- non-self neighbor can exist, the index returns nothing and the
  -- probe frame is EMPTY on both engines (degenerate sweep, r11)
ORDER BY probe_id
""",
    doc="streaming ANN index ingest under a driver verdict (streaming/"
    "ingest.stream_to_ann_index — the living-index arrival path, "
    "previously pytest-only): the IVF index is built on the vec_id%5!=3 "
    "slice, the held-out slice STREAMS in as three micro-batches "
    "appended against the frozen centroids (idempotent: anti-membership "
    "strip + per-checkpoint epoch high-water mark), and the on-disk "
    "index is probed — per-probe returned_k and recall@5>=2 vs exact "
    "brute force, plus n_indexed == |corpus| pinning that the stream "
    "indexed every vector exactly once",
    tags=("streaming", "vector", "knn", "ivf", "store", "write"),
)
def streaming_ann_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators.ann_index import IVFIndexStore
    from ..operators.similarity import brute_force_topk
    from ..streaming.ingest import stream_to_ann_index

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_gates",
        f"ann_stream_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src_dir = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")

    e = t(spark, sf_dir, "embeddings")
    store = IVFIndexStore(os.path.join(base, "store"), n_centroids=8)
    store.build(e.filter(F.col("vec_id") % 5 != 3), lloyd_iters=1)

    held_out = e.filter(F.col("vec_id") % 5 == 3).select("vec_id", "embedding")
    for m in range(3):
        held_out.filter(F.col("vec_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    stream = (
        spark.readStream.schema(held_out.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    stream_to_ann_index(stream, store, ckpt).awaitTermination()
    n_indexed = store.indexed_ids(spark).count()

    probes = e.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )
    ann = store.topk(probes, k=5, nprobe=4).select("probe_id", "vec_id")
    exact = brute_force_topk(e, probes, k=5).select(
        F.col("probe_id").alias("exact_probe"),
        F.col("vec_id").alias("exact_id"),
    )
    hits = (
        ann.join(
            exact,
            (F.col("probe_id") == F.col("exact_probe"))
            & (F.col("vec_id") == F.col("exact_id")),
            "left",
        )
        .groupBy("probe_id")
        .agg(
            F.count("*").alias("n_returned"),
            F.count("exact_id").alias("n_hits"),
        )
    )
    return hits.select(
        "probe_id",
        "n_returned",
        (F.col("n_returned") == 5).alias("returned_k"),
        (F.col("n_hits") >= 2).alias("recall_ok"),
        F.lit(n_indexed).cast("long").alias("n_indexed"),
    ).orderBy("probe_id")


# ---------------------------------------------------------------------------
# Round-9 continuation: binary (sign-bit) vector quantization + Hamming
# top-k — the 1-bit rung under the int8 / PQ / IVF+PQ ladder: a 64-dim
# float vector collapses to TWO BIGINT words (32 sign bits each), a
# 16-byte code that turns 100 TB of fp32 embeddings into ~3 TB of
# codes scanned with xor + popcount, the standard first-pass filter
# before exact re-ranking. Charikar (2002) SimHash applied to the
# embedding column (the text SimHash gate is dedup_simhash; this is
# the retrieval/ANN face of the same bit algebra).
# Exactness: every step is integer — sign test, shift-or packing,
# xor, popcount — so both engines agree bit-for-bit; ranking breaks
# ties by vec_id.
# Scale: queries broadcast, one corpus scan, per-query top-k via one
# rank window over (query, hamming) — at 100 TB the same codes drop
# into the IVF bucket layout (knn_ivf) to prune the scan.
# ---------------------------------------------------------------------------

_BQ_WORD_SPARK = (
    "aggregate(sequence({lo}, {hi}), CAST(0 AS BIGINT), (acc, i) -> acc"
    " + IF(element_at(embedding, i + 1) > 0, shiftleft(CAST(1 AS BIGINT),"
    " i - {lo}), CAST(0 AS BIGINT)))"
)
_BQ_WORD_DUCK = (
    "CAST(list_sum(list_transform(range({lo}, {hi} + 1), i -> CASE WHEN"
    " embedding[i + 1] > 0 THEN (CAST(1 AS BIGINT) << (i - {lo})) ELSE"
    " CAST(0 AS BIGINT) END)) AS BIGINT)"
)


@register(
    "vec_hamming_topk",
    oracle=f"""
WITH codes AS (
  SELECT vec_id,
         {_BQ_WORD_DUCK.format(lo=0, hi=31)} AS w0,
         {_BQ_WORD_DUCK.format(lo=32, hi=63)} AS w1
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, w0 AS q0, w1 AS q1 FROM codes WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, c.vec_id,
         CAST(bit_count(xor(q.q0, c.w0)) + bit_count(xor(q.q1, c.w1))
              AS BIGINT) AS hamming
  FROM q JOIN codes c ON c.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id, hamming,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY hamming, vec_id) AS rnk
  FROM scored
)
SELECT query_id, CAST(rnk AS BIGINT) AS rnk, vec_id, hamming
FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk
""",
    doc="binary (sign-bit) quantization + Hamming top-10: pack 64 dims "
    "into two BIGINT words by shift-or over sign tests, score by "
    "xor + popcount, rank per query with vec_id tie-break — all "
    "integer algebra, bit-identical across engines; 16-byte codes make "
    "the scan ~64x lighter than fp32 and drop into the IVF layout at "
    "scale",
    tags=("vector", "ann"),
)
def vec_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    codes = emb.select(
        "vec_id",
        F.expr(_BQ_WORD_SPARK.format(lo=0, hi=31)).alias("w0"),
        F.expr(_BQ_WORD_SPARK.format(lo=32, hi=63)).alias("w1"),
    )
    q = codes.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
    )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                F.bit_count(F.col("q0").bitwiseXOR(F.col("w0")))
                + F.bit_count(F.col("q1").bitwiseXOR(F.col("w1")))
            )
            .cast("long")
            .alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select("query_id", "rnk", "vec_id", "hamming")
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: Matryoshka truncation evaluation — MRL
# (Kusupati 2022) trains embeddings whose PREFIX dims carry most of
# the signal, so a store can scan 16 of 64 dims (4x less IO) and
# re-rank the shortlist at full width. Before deploying that, you
# measure what prefix scan costs in recall: top-10 by 16-dim cosine vs
# top-10 by full cosine, overlap per probe.
# Exactness: both rankings use the house dot-product fold (sequential
# aggregate == DuckDB list_dot_product ordering), similarities rounded
# 4dp BEFORE ranking (the established pre-rank rounding discipline),
# vec_id tie-breaks; the recall is one small-integer division.
# Scale: two brute passes over the corpus per probe set here; at 100 TB
# the 16-dim pass IS the cheap filter (4x less data scanned) and the
# full pass runs only on the shortlist — this gate pins the quality
# side of that trade.
# ---------------------------------------------------------------------------

_MAT_DIMS = 16


@register(
    "vec_matryoshka_recall",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding,
         embedding[1:{_MAT_DIMS}] AS head
  FROM embeddings
), probes AS (
  SELECT vec_id AS probe_id, embedding AS p_full, head AS p_head
  FROM e WHERE vec_id < 5
), sims AS (
  SELECT p.probe_id, e.vec_id,
         round(list_dot_product(p.p_full, e.embedding)
               / (sqrt(list_dot_product(p.p_full, p.p_full))
                  * sqrt(list_dot_product(e.embedding, e.embedding))), 4)
           AS cos_full,
         round(list_dot_product(p.p_head, e.head)
               / (sqrt(list_dot_product(p.p_head, p.p_head))
                  * sqrt(list_dot_product(e.head, e.head))), 4) AS cos_head
  FROM probes p CROSS JOIN e
  WHERE e.vec_id <> p.probe_id
), rk AS (
  SELECT probe_id, vec_id,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos_full DESC, vec_id) AS r_full,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos_head DESC, vec_id) AS r_head
  FROM sims
)
SELECT probe_id,
       CAST(count(*) AS BIGINT) AS n_overlap,
       round(CAST(count(*) AS DOUBLE) / 10.0, 6) AS recall_at_10
FROM rk WHERE r_full <= 10 AND r_head <= 10
GROUP BY probe_id ORDER BY probe_id
""",
    doc="Matryoshka truncation eval: recall@10 of 16-dim-prefix cosine "
    "ranking vs full 64-dim ranking for 5 probes — the quality cost of "
    "scanning 1/4 of the vector bytes; house dot-product fold, 4dp "
    "pre-rank rounding, vec_id tie-breaks, recall one small division",
    tags=("vector", "ann", "eval"),
)
def vec_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        F.slice("embedding", 1, _MAT_DIMS).alias("head"),
    )
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p_full"),
        F.col("head").alias("p_head"),
        norm(F.col("embedding")).alias("_pfn"),
        norm(F.col("head")).alias("_phn"),
    )
    sims = (
        e.withColumn("_fn", norm(F.col("embedding")))
        .withColumn("_hn", norm(F.col("head")))
        .crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(
                dot(F.col("p_full"), F.col("embedding"))
                / (F.col("_pfn") * F.col("_fn")),
                4,
            ).alias("cos_full"),
            F.round(
                dot(F.col("p_head"), F.col("head"))
                / (F.col("_phn") * F.col("_hn")),
                4,
            ).alias("cos_head"),
        )
    )
    w_full = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_full"), F.asc("vec_id")
    )
    w_head = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_head"), F.asc("vec_id")
    )
    rk = sims.select(
        "probe_id",
        "vec_id",
        F.row_number().over(w_full).alias("r_full"),
        F.row_number().over(w_head).alias("r_head"),
    )
    overlap = rk.filter((F.col("r_full") <= 10) & (F.col("r_head") <= 10))
    return (
        overlap.groupBy("probe_id")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.round(F.count(F.lit(1)).cast("double") / F.lit(10.0), 6).alias(
                "recall_at_10"
            ),
        )
        .orderBy("probe_id")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: kNN-graph reciprocity — the structural health
# check on a nearest-neighbor graph: hubness shows up as lopsided
# in-degree, and low reciprocity (a is b's neighbor but not vice
# versa) flags asymmetric density — both standard diagnostics before
# trusting an ANN index or a kNN-based dedup. Built on the sign-bit
# Hamming codes (vec_hamming_topk's algebra) over a deterministic node
# sample so the graph is all-integer.
# Exactness: codes, xor+popcount distances, k=3 ranks with vec_id
# tie-breaks, degree counts and the mutual-edge join are all integer;
# reciprocity is one division rounded 6dp.
# Scale: the sample (vec_id % 20 == 0) bounds the pair table to
# (n/20)^2 popcounts — cheap integer ops; at 100 TB you subsample per
# IVF list instead, same read-out.
# ---------------------------------------------------------------------------


@register(
    "knn_graph_reciprocity",
    oracle=f"""
WITH codes AS (
  SELECT vec_id,
         {_BQ_WORD_DUCK.format(lo=0, hi=31)} AS w0,
         {_BQ_WORD_DUCK.format(lo=32, hi=63)} AS w1
  FROM embeddings WHERE vec_id % 20 = 0
  ORDER BY vec_id LIMIT 256
), scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         CAST(bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1))
              AS BIGINT) AS hamming
  FROM codes a JOIN codes b ON b.vec_id <> a.vec_id
), edges AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src
                              ORDER BY hamming, dst) AS rk
    FROM scored
  ) WHERE rk <= 3
), mutual AS (
  SELECT e.src FROM edges e JOIN edges r
    ON r.src = e.dst AND r.dst = e.src
), indeg AS (
  SELECT dst, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY dst
)
SELECT CAST((SELECT count(*) FROM codes) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM mutual) AS BIGINT) AS n_mutual,
       CASE WHEN (SELECT count(*) FROM edges) = 0 THEN NULL
            ELSE round(CAST((SELECT count(*) FROM mutual) AS DOUBLE)
                       / CAST((SELECT count(*) FROM edges) AS DOUBLE), 6)
       END AS reciprocity,
       CAST((SELECT max(d) FROM indeg) AS BIGINT) AS max_in_degree
""",
    doc="kNN-graph reciprocity and hubness diagnostics on sign-bit "
    "Hamming codes over a FIXED-SIZE probe panel (the 256 smallest "
    "vec_ids of the deterministic 1-in-20 sample — a TakeOrdered, "
    "never a fraction of the corpus): k=3 integer-ranked edges, "
    "mutual-edge self-join, in-degree max — all-integer graph, "
    "reciprocity one end division; the pair table is <= 256^2 rows "
    "via a broadcast nested-loop, CONSTANT at any corpus size",
    tags=("vector", "ann", "graph", "eval"),
)
def knn_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 20 == 0)
        .orderBy("vec_id")
        .limit(256)
    )
    codes = emb.select(
        "vec_id",
        F.expr(_BQ_WORD_SPARK.format(lo=0, hi=31)).alias("w0"),
        F.expr(_BQ_WORD_SPARK.format(lo=32, hi=63)).alias("w1"),
    )
    a = codes.select(
        F.col("vec_id").alias("src"),
        F.col("w0").alias("a0"),
        F.col("w1").alias("a1"),
    )
    b = codes.select(
        F.col("vec_id").alias("dst"),
        F.col("w0").alias("b0"),
        F.col("w1").alias("b1"),
    )
    scored = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("dst") != F.col("src"))
        .select(
            "src",
            "dst",
            (
                F.bit_count(F.col("a0").bitwiseXOR(F.col("b0")))
                + F.bit_count(F.col("a1").bitwiseXOR(F.col("b1")))
            )
            .cast("long")
            .alias("hamming"),
        )
    )
    w_rk = Window.partitionBy("src").orderBy("hamming", "dst")
    edges = (
        scored.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") <= 3)
        .select("src", "dst")
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    # scalar-broadcast assembly: four 1-row aggregates cross-joined so
    # the division and 6dp round stay IN-PLAN (engine rounding, not
    # Python's half-even round)
    nodes_c = codes.agg(F.count(F.lit(1)).alias("n_nodes"))
    edges_c = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    mutual_c = edges.join(rev, ["src", "dst"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_mutual")
    )
    indeg_m = (
        edges.groupBy("dst")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max("d").alias("max_in_degree"))
    )
    return (
        nodes_c.crossJoin(F.broadcast(edges_c))
        .crossJoin(F.broadcast(mutual_c))
        .crossJoin(F.broadcast(indeg_m))
        .select(
            "n_nodes",
            "n_edges",
            "n_mutual",
            # NULL on an edgeless (empty-input) graph instead of an
            # ANSI divide-by-zero crash; the oracle pins the same
            # convention (degenerate sweep, r11)
            F.when(
                F.col("n_edges") > 0,
                F.round(
                    F.col("n_mutual").cast("double")
                    / F.col("n_edges").cast("double"),
                    6,
                ),
            ).alias("reciprocity"),
            "max_in_degree",
        )
    )


# ---------------------------------------------------------------------------
# Round-10 depth: per-label quantization error (within-cluster scatter)
# — the k-means/IVF design input: how tight is each label's cluster, in
# EXACT integers? Components quantize to 1e-4 BIGINT ticks; the
# per-(label, dim) centroid is the PORTABLE floor-mean (the numerator
# s - floor_mod(s, n) is exactly divisible, where truncation and floor
# agree — Spark div truncates, DuckDB // floors, so a bare s // n would
# diverge on negative component sums); SSE is an exact BIGINT sum of
# squared tick deviations, and RMSE one fixed sqrt/division tree 6dp.
# Scale: posexplode is a bounded 64x fan-out into two hash rollups +
# one broadcast of the 640-row centroid table.
# ---------------------------------------------------------------------------


@register(
    "vec_quantization_error",
    oracle="""
WITH ex AS (
  SELECT label, vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000) AS BIGINT)
           AS xq
  FROM embeddings
), c AS (
  SELECT label, dim,
         (sum(xq) - ((sum(xq) % count(*)) + count(*)) % count(*))
           // count(*) AS cq
  FROM ex GROUP BY label, dim
), dev AS (
  SELECT e.label, (e.xq - c.cq) * (e.xq - c.cq) AS sq
  FROM ex e JOIN c ON c.label = e.label AND c.dim = e.dim
), per AS (
  SELECT label,
         CAST(count(*) // 64 AS BIGINT) AS n_vectors,
         CAST(sum(sq) AS BIGINT) AS sse_ticks
  FROM dev GROUP BY label
)
SELECT label, n_vectors, sse_ticks,
       round(sqrt(CAST(sse_ticks AS DOUBLE)
                  / CAST(n_vectors * 64 AS DOUBLE)) / 10000.0, 6)
         AS rmse
FROM per ORDER BY label
""",
    doc="per-label quantization error in exact integer ticks: 1e-4 "
    "quantized components, portable floor-mean centroids (numerator "
    "made exactly divisible so Spark div and DuckDB // agree on "
    "negative sums), BIGINT SSE, RMSE one fixed sqrt/division tree — "
    "the within-cluster scatter audit behind IVF/k-means list design; "
    "bounded 64x posexplode into hash rollups + a 640-row broadcast",
    tags=("vector", "eval", "compression"),
)
def vec_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings", heavy=True)
    ex = e.select(
        "label",
        "vec_id",
        F.posexplode("embedding").alias("dim0", "x"),
    ).select(
        "label",
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("x").cast("double") * 10000).cast("long").alias("xq"),
    )
    c = ex.groupBy("label", "dim").agg(
        F.expr(
            "(sum(xq) - ((sum(xq) % count(*)) + count(*)) % count(*))"
            " div count(*)"
        ).alias("cq")
    )
    dev = ex.join(F.broadcast(c), ["label", "dim"]).select(
        "label",
        ((F.col("xq") - F.col("cq")) * (F.col("xq") - F.col("cq"))).alias(
            "sq"
        ),
    )
    per = dev.groupBy("label").agg(
        F.expr("count(*) div 64").alias("n_vectors"),
        F.sum("sq").alias("sse_ticks"),
    )
    return per.select(
        "label",
        "n_vectors",
        "sse_ticks",
        F.round(
            F.sqrt(
                F.col("sse_ticks").cast("double")
                / (F.col("n_vectors") * 64).cast("double")
            )
            / 10000.0,
            6,
        ).alias("rmse"),
    ).orderBy("label")
