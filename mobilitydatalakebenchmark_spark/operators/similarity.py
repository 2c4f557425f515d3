"""Similarity search over embedding columns (array<float>).

Two tiers (BASELINE.json north star):
- brute-force cosine top-k: the exactness baseline — one pass over the
  corpus per probe batch, built-in expressions only;
- LSH (random hyperplane) bucketed ANN: sign-bit bucket key -> candidates
  share a bucket (optionally with multi-probe neighbor buckets) -> exact
  re-rank of candidates. Turns O(n·q) into a bucketed equi-join.

A numpy-backed mapInPandas variant of the scoring kernel is provided for
throughput (Arrow-batched, ~10-50× the per-row expression path on wide
vectors); semantics identical, used by bench.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
) -> DataFrame:
    """Exact cosine top-k: broadcast probes, one corpus pass, per-probe
    window head. Output: (probe_id, vec_id, cos_sim, rk). Norms hoisted —
    one higher-order fold per scored pair instead of three."""
    scored = (
        corpus.withColumn("_vn", norm(F.col(vec_col)))
        .crossJoin(
            F.broadcast(
                probes.withColumn("_pn", norm(F.col(probe_vec_col)))
            )
        )
        .filter(F.col(id_col) != F.col(probe_id_col))
        .select(
            probe_id_col,
            id_col,
            (
                dot(F.col(probe_vec_col), F.col(vec_col))
                / (F.col("_vn") * F.col("_pn"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def hyperplanes(dim: int, n_planes: int, salt: str = "plane") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — no RNG state to
    broadcast, reproducible across sessions/engines."""
    planes = []
    for k in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{salt}-{k}-{i}".encode()).hexdigest()
            row.append(int(h[:8], 16) / float(0xFFFFFFFF) * 2 - 1)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit k = sign(vec · plane_k)."""
    bucket = F.lit(0)
    for k, plane in enumerate(planes):
        coeffs = F.array(*[F.lit(c) for c in plane])
        proj = F.aggregate(
            F.zip_with(vec, coeffs, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << k)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    n_planes: int = 8,
    k: int = 5,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
) -> DataFrame:
    """ANN: bucket corpus and probes with the same hyperplanes, equi-join on
    the bucket, exact re-rank within candidates. ``multiprobe`` also probes
    every 1-bit-flip neighbor bucket (n_planes+1 buckets per probe) — the
    standard recall boost; candidates stay a tiny fraction of the corpus.
    Recall is measured against brute force in tests."""
    planes = hyperplanes(dim, n_planes)
    c = corpus.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    p = probes.withColumn("bucket", lsh_bucket(F.col(probe_vec_col), planes))
    if multiprobe:
        p = p.select(
            probe_id_col,
            probe_vec_col,
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(n_planes)],
                )
            ).alias("bucket"),
        )
    scored = (
        c.withColumn("_vn", norm(F.col(vec_col)))
        .join(
            F.broadcast(p.withColumn("_pn", norm(F.col(probe_vec_col)))),
            "bucket",
        )
        .filter(F.col(id_col) != F.col(probe_id_col))
        .select(
            probe_id_col,
            id_col,
            (
                dot(F.col(probe_vec_col), F.col(vec_col))
                / (F.col("_vn") * F.col("_pn"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def _multitable_buckets_kernel(
    df: DataFrame,
    tables: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    out_id: str,
    out_vec: str,
    out_norm: str,
) -> DataFrame:
    """Numpy twin of the per-table ``lsh_bucket`` expressions: one
    mapInPandas matmul against the stacked (L*b, dim) plane matrix computes
    every table's bucket for every vector in a batch — identical sign bits
    (a flip needs a projection within float64 ulp of zero, vanishing for
    real data), ~100x less expression-tree weight than L*b interpreted
    64-wide folds. Output is long format: (id, vec, norm, t, bucket)."""
    import numpy as np

    n_tables, n_planes = len(tables), len(tables[0])
    P = np.array(
        [plane for table in tables for plane in table], dtype="float64"
    )  # (L*b, dim)
    weights = 1 << np.arange(n_planes, dtype="int64")
    vec_type = dict(df.dtypes)[vec_col]
    schema = (
        f"{out_id} long, {out_vec} {vec_type}, {out_norm} double, "
        "t int, bucket long"
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            signs = (mat @ P.T) > 0  # (n, L*b)
            buckets = signs.reshape(len(mat), n_tables, n_planes) @ weights
            norms = np.linalg.norm(mat, axis=1)
            n = len(mat)
            yield pd.DataFrame(
                {
                    out_id: pdf[id_col].to_numpy().repeat(n_tables),
                    out_vec: pdf[vec_col].to_numpy().repeat(n_tables),
                    out_norm: norms.repeat(n_tables),
                    "t": np.tile(np.arange(n_tables, dtype="int32"), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(kernel, schema)


def lsh_topk_multitable(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    n_tables: int = 8,
    n_planes: int = 8,
    k: int = 5,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
    kernel: bool = False,
) -> DataFrame:
    """OR-amplified LSH ANN: ``n_tables`` independent hyperplane tables
    (salted md5 planes, deterministic), candidates unioned across tables,
    exact cosine re-rank. The standard recall amplification a single
    8-plane table cannot reach on weakly-clustered data: per-table recall r
    compounds to 1-(1-r)^L, so the round-5 audit's recall@5 = 0.13 tier
    becomes ~0.6-0.8 at L=8 on the same adversarially-uniform corpus (see
    tools/ann_recall.py), degrading gracefully — more tables monotonically
    buy recall at linearly more candidate scans.

    Scale: the corpus side explodes to n_tables rows per vector but stays
    map-side (the probe side broadcasts); candidate de-dup happens AFTER
    scoring via groupBy(probe, id) max — the shuffle carries scores, never
    vectors. Probe buckets are computed once per table and the multiprobe
    variants derived by integer XOR, so each probe pays L*b projections,
    not L*b*(b+1). ``kernel=True`` swaps the L*b interpreted fold
    expressions for one Arrow-batched matmul per side (identical sign
    bits, ~10x wall on wide geometries — the path the recall-floor gate
    uses)."""
    tables = [
        hyperplanes(dim, n_planes, salt=f"plane-t{t}") for t in range(n_tables)
    ]
    if kernel:
        c = _multitable_buckets_kernel(
            corpus, tables, id_col, vec_col, id_col, vec_col, "_vn"
        )
        pk = _multitable_buckets_kernel(
            probes, tables, probe_id_col, probe_vec_col,
            probe_id_col, probe_vec_col, "_pn",
        )
        masks = [0] + ([1 << bit for bit in range(n_planes)] if multiprobe else [])
        p = pk.select(
            probe_id_col,
            probe_vec_col,
            "_pn",
            "t",
            F.explode(
                F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
            ).alias("bucket"),
        )
    else:
        c_keys = F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    lsh_bucket(F.col(vec_col), planes).alias("bucket"),
                )
                for t, planes in enumerate(tables)
            ]
        )
        c = (
            corpus.withColumn("_vn", norm(F.col(vec_col)))
            .select(id_col, vec_col, "_vn", F.explode(c_keys).alias("_k"))
            .select(id_col, vec_col, "_vn", "_k.t", "_k.bucket")
        )
        # probe buckets: one projection pass per table, then cheap XOR flips
        p = probes.withColumn("_pn", norm(F.col(probe_vec_col)))
        for t, planes in enumerate(tables):
            p = p.withColumn(f"_b{t}", lsh_bucket(F.col(probe_vec_col), planes))
        entries = []
        for t in range(n_tables):
            b = F.col(f"_b{t}")
            entries.append(F.struct(F.lit(t).alias("t"), b.alias("bucket")))
            if multiprobe:
                entries.extend(
                    F.struct(
                        F.lit(t).alias("t"),
                        b.bitwiseXOR(F.lit(1 << bit)).alias("bucket"),
                    )
                    for bit in range(n_planes)
                )
        p = p.select(
            probe_id_col,
            probe_vec_col,
            "_pn",
            F.explode(F.array(*entries)).alias("_k"),
        ).select(probe_id_col, probe_vec_col, "_pn", "_k.t", "_k.bucket")
    scored = (
        c.join(F.broadcast(p), ["t", "bucket"])
        .filter(F.col(id_col) != F.col(probe_id_col))
        .select(
            probe_id_col,
            id_col,
            (
                dot(F.col(probe_vec_col), F.col(vec_col))
                / (F.col("_vn") * F.col("_pn"))
            ).alias("cos_sim"),
        )
    )
    # a vector colliding in several tables scores identically each time —
    # max() both de-duplicates and keeps the score; without this a
    # duplicate would occupy two ranks in the top-k window
    dedup = scored.groupBy(probe_id_col, id_col).agg(
        F.max("cos_sim").alias("cos_sim")
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return dedup.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, "pd.DataFrame"]:
    """IVF index: deterministic seed centroids (md5-ordered sample) refined
    by `lloyd_iters` k-means steps, then every vector assigned to its
    nearest centroid. Returns (corpus + `centroid_id`, centroid table).

    Scale: centroids are tiny (k x dim, broadcast); assignment is one
    mapInPandas pass (numpy argmax over the centroid matrix); each Lloyd
    step is one groupBy(centroid_id).avg — a bounded-width shuffle."""
    import hashlib

    import numpy as np

    spark = corpus.sparkSession
    # deterministic pseudo-random seed sample: order by md5(id)
    seeds_pdf = (
        corpus.select(id_col, vec_col)
        .withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h")
        .limit(n_centroids)
        .toPandas()
    )
    if seeds_pdf.empty:
        # empty corpus: nothing to seed from — the index is the (empty)
        # corpus with an empty assignment and an empty centroid table,
        # not an np.vstack crash (degenerate sweep, r11)
        assigned = spark.createDataFrame([], f"{id_col} long, centroid_id int")
        cent_pdf = pd.DataFrame(
            {
                "centroid_id": pd.Series([], dtype="int64"),
                "centroid_vec": pd.Series([], dtype="object"),
            }
        )
        return corpus.join(assigned, id_col), cent_pdf
    centroids = np.vstack(seeds_pdf[vec_col].to_numpy()).astype("float64")

    def assign_df(cents: "np.ndarray", with_payload: bool = False) -> DataFrame:
        """Nearest-centroid assignment. ``with_payload=False`` emits only
        (id, centroid_id) — the shape the Lloyd mean join wants.
        ``with_payload=True`` carries EVERY corpus column through the
        kernel and appends centroid_id, exactly the columns (and order)
        ``corpus.join(assigned, id_col)`` would produce — but with NO
        join: at scale the join shuffles the full vector payload by id
        just to re-attach an int the kernel already knew (guide §2.4 /
        §8: the payload should move zero extra times). Values are
        bit-identical — the embedding rides Arrow float64 round-trips
        and the assignment is the same argmax."""
        from pyspark.sql import types as T

        bc = spark.sparkContext.broadcast(cents)
        if with_payload:
            fields = [corpus.schema[id_col]] + [
                f for f in corpus.schema.fields if f.name != id_col
            ]
            out_names = [f.name for f in fields] + ["centroid_id"]
            schema = T.StructType(
                fields + [T.StructField("centroid_id", T.IntegerType())]
            )
            in_df = corpus
        else:
            out_names = [id_col, "centroid_id"]
            schema = f"{id_col} long, centroid_id int"
            in_df = corpus.select(id_col, vec_col)

        def kernel(batches):
            c = bc.value
            c_norm = np.linalg.norm(c, axis=1)
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
                sims = (mat @ c.T) / (
                    np.outer(np.linalg.norm(mat, axis=1), c_norm) + 1e-12
                )
                pdf = pdf.assign(
                    centroid_id=sims.argmax(axis=1).astype("int32")
                )
                yield pdf[out_names]

        return in_df.mapInPandas(kernel, schema)

    for _ in range(lloyd_iters):
        # the mean join stays id-keyed (NOT the payload kernel): avg's
        # float summation order must match the committed oracle outputs
        # bit-for-bit, and this join is the plan that produced them
        assigned = assign_df(centroids)
        means = (
            corpus.join(assigned, id_col)
            .groupBy("centroid_id")
            .agg(
                F.array(
                    *[
                        F.avg(F.col(vec_col).getItem(i))
                        for i in range(centroids.shape[1])
                    ]
                ).alias("mean_vec")
            )
            .toPandas()
        )
        for _, row in means.iterrows():
            centroids[int(row["centroid_id"])] = np.array(row["mean_vec"])

    cent_pdf = pd.DataFrame(
        {"centroid_id": range(len(centroids)), "centroid_vec": list(map(list, centroids))}
    )
    return assign_df(centroids, with_payload=True), cent_pdf


def assign_nearest_centroid_numpy(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Numpy twin of `assign_nearest_centroid`: one mapInPandas pass scoring
    every vector against the (collected, tiny) centroid matrix with a
    blocked matmul instead of |labels| interpreted array-lambda cosines per
    row. Same semantics: argmax by (sim desc, c_label asc) — centroid rows
    are sorted by label ascending so numpy's first-max argmax applies the
    tie-break. Scale: centroid matrix is |labels|x dim (KBs, ships in the
    closure); the vector side streams through Arrow batches, no shuffle."""
    import numpy as np

    cent_pdf = centroids.orderBy("c_label").toPandas()
    label_type = dict(centroids.dtypes)["c_label"]
    keep_struct = ", ".join(
        f"{k} {dict(df.dtypes)[k]}" for k in keep_cols
    )
    schema = (
        f"{id_col} long, "
        + (keep_struct + ", " if keep_struct else "")
        + f"sim double, assigned_label {label_type}"
    )
    if cent_pdf.empty:
        # no centroids (empty corpus): no vector can be assigned — an
        # empty result with the declared schema, not an np.vstack crash
        return df.sparkSession.createDataFrame([], schema)
    labels = cent_pdf["c_label"].to_numpy()
    cents = np.vstack(cent_pdf["centroid"].to_numpy()).astype("float64")
    c_norm = np.linalg.norm(cents, axis=1)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            sims = (mat @ cents.T) / np.outer(np.linalg.norm(mat, axis=1), c_norm)
            best = sims.argmax(axis=1)
            out = {id_col: pdf[id_col]}
            for k in keep_cols:
                out[k] = pdf[k]
            out["sim"] = sims[np.arange(len(best)), best]
            out["assigned_label"] = labels[best]
            yield pd.DataFrame(out)

    return df.select(id_col, *keep_cols, vec_col).mapInPandas(kernel, schema)


def ivf_topk(
    indexed_corpus: DataFrame,
    centroids_pdf: "pd.DataFrame",
    probes: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """ANN over an IVF index: each probe scans only its `nprobe` nearest
    inverted lists (equi-join on centroid_id), exact cosine re-rank inside.
    Recall grows with nprobe; nprobe == n_centroids degrades gracefully to
    brute force.

    Probe routing is fully in-plan: the tiny centroid table (k x dim)
    broadcasts against the probe set and a per-probe window keeps the
    `nprobe` nearest lists — no driver-side collect, so the probe set can
    be arbitrarily large (the routing shuffle is keyed by probe_id)."""
    spark = indexed_corpus.sparkSession
    from ..session import local_df

    cent_df = local_df(
        spark,
        [
            (int(r["centroid_id"]), [float(x) for x in r["centroid_vec"]])
            for _, r in centroids_pdf.iterrows()
        ],
        "centroid_id int, centroid_vec array<double>",
    )
    w_route = Window.partitionBy(probe_id_col).orderBy(
        F.desc("c_sim"), F.asc("centroid_id")
    )
    probe_lists = (
        probes.crossJoin(F.broadcast(cent_df))
        .withColumn("c_sim", cosine(F.col(probe_vec_col), F.col("centroid_vec")))
        .withColumn("c_rk", F.row_number().over(w_route))
        .filter(F.col("c_rk") <= nprobe)
        .select(probe_id_col, probe_vec_col, "centroid_id")
    )
    scored = (
        indexed_corpus.withColumn("_vn", norm(F.col(vec_col)))
        .join(
            F.broadcast(
                probe_lists.withColumn("_pn", norm(F.col(probe_vec_col)))
            ),
            "centroid_id",
        )
        .filter(
            (F.col(id_col) != F.col(probe_id_col))
            if exclude_self
            else F.lit(True)
        )
        .select(
            probe_id_col,
            id_col,
            (
                dot(F.col(probe_vec_col), F.col(vec_col))
                / (F.col("_vn") * F.col("_pn"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as ``a·a - 2a·b + b·b`` — three sequential-fold
    dot products, so both engines (Spark double fold / DuckDB
    list_dot_product) produce bitwise-identical values for ranking."""
    return dot(a, a) - 2 * dot(a, b) + dot(b, b)


def md5_seed_centroids(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic seed sample fully in-plan: the first ``k`` vectors
    ordered by ``(md5(id), id)``, numbered 0..k-1. No RNG state, no driver
    collect — replayable in any engine, which is what makes the seeded
    ANN/cluster gates value-checkable. The row_number window runs on a
    k-row DataFrame (post-limit), so the single-partition sort is bounded
    by k regardless of corpus size."""
    w = Window.orderBy("_h", id_col)
    return (
        corpus.select(id_col, vec_col)
        .withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(k)
        .withColumn("centroid_id", F.row_number().over(w) - 1)
        .select("centroid_id", F.col(vec_col).alias("cvec"))
    )


def pq_codebook(
    corpus: DataFrame,
    m_subspaces: int = 4,
    dsub: int = 16,
    n_codewords: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebook from the md5-seeded sample: each seed
    vector sliced into ``m_subspaces`` contiguous ``dsub``-dim subvectors.
    Output (m, codeword_id, cvec) — m*k rows, KBs, always broadcastable.

    Real PQ trains per-subspace k-means; the seeded variant trades recall
    for determinism the same way knn_ivf_seeded does (lloyd_iters=0), so
    the whole index replays in SQL for the correctness gate."""
    seeds = md5_seed_centroids(corpus, n_codewords, id_col, vec_col)
    slices = F.array(
        *[F.slice(F.col("cvec"), m * dsub + 1, dsub) for m in range(m_subspaces)]
    )
    # localCheckpoint: the codebook feeds two consumers (encode-side
    # scoring join and the ADC lookup table); without it each one replays
    # the seed TakeOrdered — a full corpus pass apiece at scale. The
    # materialized table is m*k rows (KBs), so the checkpoint is free.
    return (
        seeds.select(
            F.col("centroid_id").alias("codeword_id"),
            F.posexplode(slices).alias("m", "cvec"),
        )
        .select("m", "codeword_id", "cvec")
        .localCheckpoint(eager=False)
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    m_subspaces: int = 4,
    dsub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``m_subspaces`` codeword ids (nearest codeword
    per subvector by squared L2, ties to the lowest codeword id).

    Scale: the corpus explodes to n*m subvector rows, joins the broadcast
    codebook (m*k rows), and the argmin is a combinable min-struct
    aggregate — partial aggregation collapses the n*m*k scored rows back
    to n*m inside each scan partition; the one shuffle carries n*m short
    rows and no vectors. This is the standard 64x-compression step that
    lets a 100 TB embedding corpus fit a memory-resident ANN index."""
    slices = F.array(
        *[F.slice(F.col(vec_col), m * dsub + 1, dsub) for m in range(m_subspaces)]
    )
    subs = corpus.select(
        F.col(id_col), F.posexplode(slices).alias("m", "subvec")
    )
    scored = subs.join(F.broadcast(codebook), "m").select(
        id_col,
        "m",
        "codeword_id",
        l2sq(F.col("subvec"), F.col("cvec")).alias("d2"),
    )
    return (
        scored.groupBy(id_col, "m")
        .agg(F.min(F.struct(F.col("d2"), F.col("codeword_id"))).alias("_b"))
        .select(id_col, "m", F.col("_b.codeword_id").alias("codeword_id"))
    )


def pq_train(
    corpus: DataFrame,
    m_subspaces: int = 4,
    dsub: int = 16,
    n_codewords: int = 8,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: bool = False,
) -> DataFrame:
    """Per-subspace Lloyd-refined PQ codebook: start from the md5-seeded
    codebook and run k-means steps independently in every subspace (the
    standard PQ training). Each step is pq_encode (linear, combinable
    argmin) + one groupBy((m, codeword_id)) mean over dsub components —
    a bounded-width shuffle (m*k groups), identical in shape to ivf_index's
    Lloyd step. Empty cells keep their previous codeword. The result is
    localCheckpointed so downstream plans don't replay the iteration chain.

    The seeded (lloyd_iters=0) codebook stays the value-checkable gate;
    this is the quality path — recall roughly doubles on the synthetic
    corpus after 2 iterations (see test_pq_train_improves_quantization)."""
    codebook = pq_codebook(
        corpus, m_subspaces, dsub, n_codewords, id_col, vec_col
    )
    slices = F.array(
        *[F.slice(F.col(vec_col), m * dsub + 1, dsub) for m in range(m_subspaces)]
    )
    subs = corpus.select(F.col(id_col), F.posexplode(slices).alias("m", "subvec"))
    encode = pq_encode_numpy if kernel else pq_encode
    for _ in range(lloyd_iters):
        codes = encode(corpus, codebook, m_subspaces, dsub, id_col, vec_col)
        means = (
            subs.join(codes, [id_col, "m"])
            .groupBy("m", "codeword_id")
            .agg(
                F.array(
                    *[
                        F.avg(F.col("subvec").getItem(i).cast("double"))
                        for i in range(dsub)
                    ]
                ).alias("mean_vec")
            )
        )
        codebook = (
            codebook.join(means, ["m", "codeword_id"], "left")
            .select(
                "m",
                "codeword_id",
                F.coalesce(
                    F.col("mean_vec").cast("array<float>"), F.col("cvec")
                ).alias("cvec"),
            )
            .localCheckpoint(eager=False)
        )
    return codebook


def pq_quantization_error(
    corpus: DataFrame,
    codebook: DataFrame,
    m_subspaces: int = 4,
    dsub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean squared reconstruction error of a PQ codebook over the corpus —
    the quantity Lloyd training minimizes; used by tests and tuning."""
    slices = F.array(
        *[F.slice(F.col(vec_col), m * dsub + 1, dsub) for m in range(m_subspaces)]
    )
    subs = corpus.select(F.col(id_col), F.posexplode(slices).alias("m", "subvec"))
    scored = subs.join(F.broadcast(codebook), "m").select(
        id_col, "m", l2sq(F.col("subvec"), F.col("cvec")).alias("d2")
    )
    best = scored.groupBy(id_col, "m").agg(F.min("d2").alias("d2"))
    return best.agg(F.avg("d2")).first()[0]


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    probes: DataFrame,
    k: int = 5,
    m_subspaces: int = 4,
    dsub: int = 16,
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per probe, precompute
    the |m|x|codewords| table of probe-subvector-to-codeword distances (the
    classic ADC lookup table), broadcast it, and score each encoded vector
    with one equi-join + sum — never touching the original vectors.

    Output (probe_id, vec_id, adc_d2, rk) with adc_d2 rounded to 4 dp and
    rank ties broken by vec_id. Scale: the fact side is the n*m code
    table (ints only); the LUT is |probes|*m*k rows broadcast; the only
    shuffle is the per-probe top-k window keyed by probe_id."""
    slices = F.array(
        *[
            F.slice(F.col(probe_vec_col), m * dsub + 1, dsub)
            for m in range(m_subspaces)
        ]
    )
    psubs = probes.select(
        F.col(probe_id_col), F.posexplode(slices).alias("m", "psub")
    )
    lut = psubs.join(F.broadcast(codebook), "m").select(
        probe_id_col,
        "m",
        "codeword_id",
        l2sq(F.col("psub"), F.col("cvec")).alias("d2p"),
    )
    scored = codes.join(F.broadcast(lut), ["m", "codeword_id"])
    # exclude_self drops the candidate whose id equals the probe's id —
    # correct ONLY when probes are drawn from the corpus (the gate shape);
    # external probes with an unrelated id space must pass False or a
    # colliding id silently loses its true neighbor.
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col(probe_id_col))
    scored = (
        scored.groupBy(probe_id_col, id_col)
        .agg(F.round(F.sum("d2p"), 4).alias("adc_d2"))
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.asc("adc_d2"), F.asc(id_col))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def unit_normalize(vec: Column) -> Column:
    """Scale a vector to unit L2 norm (zero vectors pass through). After
    normalization, squared-L2 ranking is exactly cosine ranking
    (||a-b||^2 = 2 - 2*cos for unit vectors) — which is what lets an
    L2-metric PQ/ADC index answer cosine queries without bias."""
    n = norm(vec)
    return F.when(n == 0, vec.cast("array<double>")).otherwise(
        F.transform(vec, lambda x: x.cast("double") / n)
    )


def pq_encode_numpy(
    corpus: DataFrame,
    codebook: DataFrame,
    m_subspaces: int = 4,
    dsub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Numpy twin of ``pq_encode`` (same output contract: one row per
    (id, m) with the argmin codeword, ties to the lowest codeword id —
    numpy's first-min argmin). The in-plan variant scores n*m*k rows
    through interpreted aggregate folds; this kernel does the same
    distances as one blocked einsum per Arrow batch — the 10-100x
    Arrow-vectorized path that makes a 256-codeword codebook practical
    for index BUILDS. The codebook (m*k*dsub floats, KBs) ships in the
    closure; row chunks bound the n x m x k distance tensor."""
    import numpy as np

    cb_pdf = codebook.orderBy("m", "codeword_id").toPandas()
    n_codewords = cb_pdf["codeword_id"].nunique()
    C = np.zeros((m_subspaces, n_codewords, dsub))
    for _, r in cb_pdf.iterrows():
        C[int(r["m"]), int(r["codeword_id"])] = np.asarray(r["cvec"], dtype="f8")
    c_sq = (C**2).sum(axis=2)  # (m, k)
    schema = f"{id_col} long, m int, codeword_id int"

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype("f8")
            ids = pdf[id_col].to_numpy()
            for lo in range(0, len(pdf), 2048):
                hi = min(lo + 2048, len(pdf))
                sub = mat[lo:hi].reshape(hi - lo, m_subspaces, dsub)
                # ||s - c||^2 = s.s - 2 s.c + c.c, blocked over the chunk
                cross = np.einsum("nmd,mkd->nmk", sub, C)
                d2 = (sub**2).sum(axis=2)[:, :, None] - 2 * cross + c_sq[None]
                codes = d2.argmin(axis=2)
                n = hi - lo
                yield pd.DataFrame(
                    {
                        id_col: np.repeat(ids[lo:hi], m_subspaces),
                        "m": np.tile(
                            np.arange(m_subspaces, dtype="int32"), n
                        ),
                        "codeword_id": codes.reshape(-1).astype("int32"),
                    }
                )

    return corpus.select(id_col, vec_col).mapInPandas(kernel, schema)


def ivfpq_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    m_subspaces: int = 8,
    dsub: int = 8,
    n_codewords: int = 64,
    coarse_lloyd: int = 1,
    pq_lloyd: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: bool = True,
) -> tuple[DataFrame, "pd.DataFrame", DataFrame]:
    """IVF+PQ residual index (the IVFADC layout of Jegou, Douze &
    Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
    2011 — the standard public method): vectors are unit-normalized,
    coarsely quantized by the IVF centroids, and the PQ codebook is
    trained on the RESIDUALS ``vec - centroid`` instead of the raw
    vectors. Residuals concentrate near zero with far smaller variance
    than the raw corpus, so the same codebook budget resolves much finer
    distance differences — the classic recall lift at identical code
    size (one coarse id + m subspace codes per vector).

    Returns ``(codes, centroids_pdf, codebook)``: codes carry
    (vec_id, centroid_id, m, codeword_id) — ints only, the 100-TB
    memory-resident form; centroids and codebook are KB-sized broadcast
    tables.

    Scale: normalization and residual subtraction are JVM array
    expressions in the scan stage; codebook training is the bounded
    Lloyd shuffle of pq_train; encoding is the combinable argmin of
    pq_encode. Nothing here collects vectors beyond the k-row seed
    samples."""
    normed = corpus.select(
        F.col(id_col), unit_normalize(F.col(vec_col)).alias(vec_col)
    )
    indexed, cents_pdf = ivf_index(
        normed, n_centroids=n_centroids, lloyd_iters=coarse_lloyd,
        id_col=id_col, vec_col=vec_col,
    )
    spark = corpus.sparkSession
    from ..session import local_df

    cent_df = local_df(
        spark,
        [
            (int(r["centroid_id"]), [float(x) for x in r["centroid_vec"]])
            for _, r in cents_pdf.iterrows()
        ],
        "centroid_id int, centroid_vec array<double>",
    )
    # residual frame feeds pq_train's iteration chain AND the final
    # encode — checkpoint so the assignment kernel isn't replayed per use
    res = (
        indexed.join(F.broadcast(cent_df), "centroid_id")
        .select(
            F.col(id_col),
            F.col("centroid_id"),
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.col("centroid_vec"),
                lambda a, b: a - b,
            ).alias("_res"),
        )
        .localCheckpoint(eager=False)
    )
    codebook = pq_train(
        res, m_subspaces, dsub, n_codewords, lloyd_iters=pq_lloyd,
        id_col=id_col, vec_col="_res", kernel=kernel,
    )
    encode = pq_encode_numpy if kernel else pq_encode
    codes = encode(
        res, codebook, m_subspaces, dsub, id_col=id_col, vec_col="_res"
    ).join(res.select(id_col, "centroid_id"), id_col)
    return codes, cents_pdf, codebook


def ivfpq_adc_topk(
    codes: DataFrame,
    centroids_pdf: "pd.DataFrame",
    codebook: DataFrame,
    probes: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    m_subspaces: int = 8,
    dsub: int = 8,
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """ADC search over the IVF+PQ residual index: each probe is
    unit-normalized, routed to its ``nprobe`` nearest coarse centroids,
    and per routed list the probe RESIDUAL builds the classic
    |m| x |codewords| lookup table of residual-subvector-to-codeword
    distances. Scoring is one equi-join of the routed lists' codes on
    (centroid_id, m, codeword_id) + a sum over m — the original vectors
    are never touched.

    Output (probe_id, vec_id, adc_d2, rk), adc_d2 rounded to 4 dp, ties
    by vec_id. Scale: the only shuffle is the per-probe top-k window;
    the LUT is |probes| * nprobe * m * k rows, broadcast; codes prune to
    the routed lists through the equi-join."""
    spark = codes.sparkSession
    from ..session import local_df

    cent_df = local_df(
        spark,
        [
            (int(r["centroid_id"]), [float(x) for x in r["centroid_vec"]])
            for _, r in centroids_pdf.iterrows()
        ],
        "centroid_id int, centroid_vec array<double>",
    )
    pn = probes.select(
        F.col(probe_id_col),
        unit_normalize(F.col(probe_vec_col)).alias(probe_vec_col),
    )
    w_route = Window.partitionBy(probe_id_col).orderBy(
        F.desc("c_sim"), F.asc("centroid_id")
    )
    routed = (
        pn.crossJoin(F.broadcast(cent_df))
        .withColumn("c_sim", cosine(F.col(probe_vec_col), F.col("centroid_vec")))
        .withColumn("c_rk", F.row_number().over(w_route))
        .filter(F.col("c_rk") <= nprobe)
        .select(
            probe_id_col,
            "centroid_id",
            F.zip_with(
                F.col(probe_vec_col).cast("array<double>"),
                F.col("centroid_vec"),
                lambda a, b: a - b,
            ).alias("_pres"),
        )
    )
    slices = F.array(
        *[F.slice(F.col("_pres"), m * dsub + 1, dsub) for m in range(m_subspaces)]
    )
    psubs = routed.select(
        F.col(probe_id_col), F.col("centroid_id"), F.posexplode(slices).alias("m", "psub")
    )
    lut = psubs.join(F.broadcast(codebook), "m").select(
        probe_id_col,
        "centroid_id",
        "m",
        "codeword_id",
        l2sq(F.col("psub"), F.col("cvec")).alias("d2p"),
    )
    scored = codes.join(F.broadcast(lut), ["centroid_id", "m", "codeword_id"])
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col(probe_id_col))
    scored = scored.groupBy(probe_id_col, id_col).agg(
        F.round(F.sum("d2p"), 4).alias("adc_d2")
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.asc("adc_d2"), F.asc(id_col))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def ivfpq_refine_topk(
    codes: DataFrame,
    centroids_pdf: "pd.DataFrame",
    codebook: DataFrame,
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nprobe: int = 8,
    shortlist: int = 50,
    m_subspaces: int = 8,
    dsub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """ADC shortlist + exact refinement — the IVFADC+R pipeline (the
    re-ranking stage of Jegou et al. 2011 / FAISS's IndexRefine, both
    public): rank codes by ADC, keep the top ``shortlist`` per probe,
    fetch ONLY those vectors and re-rank by exact cosine. Recall rises
    to the routing ceiling (what nprobe lists contain) instead of the
    8-byte code resolution; audited at sf0.1/50 probes: 0.46 at
    nprobe=8 of 64 lists, R=50 — vs 0.30 codes-only and 0.23 for the
    plain-PQ tier at the same code budget.

    Scale: the per-query exact work is ``shortlist`` vector fetches (an
    equi-join on the id — at deployment scale a point-lookup into the
    vector store), not a corpus scan; everything upstream never touches
    raw vectors."""
    short = ivfpq_adc_topk(
        codes, centroids_pdf, codebook, probes,
        k=shortlist, nprobe=nprobe, m_subspaces=m_subspaces, dsub=dsub,
        id_col=id_col, probe_id_col=probe_id_col,
        probe_vec_col=probe_vec_col, exclude_self=exclude_self,
    )
    cand = (
        short.select(probe_id_col, id_col)
        .join(corpus.select(F.col(id_col), F.col(vec_col)), id_col)
        .join(F.broadcast(probes), probe_id_col)
        .select(
            probe_id_col,
            id_col,
            cosine(F.col(probe_vec_col), F.col(vec_col)).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return cand.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )


def semantic_dedup_summary(
    corpus: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023)-style semantic deduplication: cluster by
    nearest md5-seeded centroid (cosine argmax, combinable max-struct), then
    within each cluster mark every vector whose cosine to a LOWER-id cluster
    member exceeds ``threshold`` as a drop. Output one row per cluster:
    (centroid_id, n_members, n_dup_pairs, n_dropped, n_kept, n_truncated).

    Scale: the cluster id is the blocking key — the pair join shuffles on
    centroid_id and is quadratic only within a cluster, which is the
    documented SemDeDup trade (cap cluster sizes by raising n_clusters;
    production runs use n_clusters ~ corpus_size/10k). Assignment itself is
    linear: broadcast centroids, one partial-agg argmax, no window.

    ``max_cluster_size`` guards the one way the trade degenerates: a single
    centroid capturing a huge fraction of the corpus re-creates the O(k²)
    pair blowup no n_clusters sizing predicted. Members are ranked within
    their cluster by ascending id (deterministic, oracle-mirrorable) and
    only the first ``max_cluster_size`` participate in the pair comparison;
    the remainder are kept un-compared and reported per cluster as
    ``n_truncated`` so the caller sees exactly how much comparison coverage
    the guard cost. The ranking window shuffles on centroid_id — the same
    key the pair join needs, so the guard adds no extra exchange — and
    row_number is a streaming (sort-based, spillable) window, safe on a
    degenerate partition; it is the join output, not the sort, that the cap
    bounds to max_cluster_size² per cluster."""
    # Assignment shape deliberately mirrors vec_nearest_centroid_confusion:
    # broadcast the k seed rows, score k cosines per vector across the
    # crossJoin, take the combinable max-struct argmax. (A zero-shuffle
    # variant inlining centroids as literal arrays and argmax-ing an
    # expression array measured 2x SLOWER at sf0.1 — the k x 64-literal
    # expression tree defeats codegen and is re-evaluated per downstream
    # consumer, while this exchange is computed once and reused.)
    # Norms hoisted (assign_nearest_centroid pattern): one higher-order
    # fold per scored pair instead of three — the per-vector norm is
    # computed once per vector and rides the checkpoint so the pair join
    # below also pays a single fold per candidate. Same doubles.
    seeds = md5_seed_centroids(corpus, n_clusters, id_col, vec_col).withColumn(
        "_sn", norm(F.col("cvec"))
    )
    sims = (
        corpus.select(id_col, vec_col)
        .withColumn("_vn", norm(F.col(vec_col)))
        .crossJoin(F.broadcast(seeds))
        .select(
            id_col,
            vec_col,
            "_vn",
            "centroid_id",
            (
                dot(F.col(vec_col), F.col("cvec"))
                / (F.col("_vn") * F.col("_sn"))
            ).alias("_cs"),
        )
    )
    # localCheckpoint: `assigned` feeds three consumers (member counts and
    # both pair-join sides); without it each consumer replays the
    # scan+crossJoin+argmax. Materializing once measured -28% wall at
    # sf0.1. At corpus scale this is the standard trade — one
    # executor-local write of (id, vec, cluster) vs three full corpus
    # passes; the checkpoint shards with the data, nothing hits the driver.
    assigned = (
        sims.groupBy(id_col)
        .agg(
            F.max(
                F.struct(F.col("_cs"), (-F.col("centroid_id")).alias("_nc"))
            ).alias("_m"),
            F.first(vec_col).alias(vec_col),
            F.first("_vn").alias("_vn"),
        )
        .select(
            id_col,
            vec_col,
            "_vn",
            (-F.col("_m._nc")).cast("int").alias("centroid_id"),
        )
        .localCheckpoint(eager=False)
    )
    if max_cluster_size is not None:
        wcap = Window.partitionBy("centroid_id").orderBy(id_col)
        compared = (
            assigned.withColumn("_rk", F.row_number().over(wcap))
            .filter(F.col("_rk") <= max_cluster_size)
            .drop("_rk")
        )
    else:
        compared = assigned
    a = compared.alias("a")
    b = compared.alias("b")
    pairs = a.join(
        b,
        (F.col("a.centroid_id") == F.col("b.centroid_id"))
        & (F.col(f"b.{id_col}") > F.col(f"a.{id_col}")),
    ).filter(
        dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
        / (F.col("a._vn") * F.col("b._vn"))
        > threshold
    ).select(
        F.col("a.centroid_id").alias("centroid_id"),
        F.col(f"b.{id_col}").alias("dropped_id"),
    )
    members = assigned.groupBy("centroid_id").agg(F.count("*").alias("n_members"))
    pair_stats = pairs.groupBy("centroid_id").agg(
        F.count("*").alias("n_dup_pairs"),
        F.count_distinct("dropped_id").alias("n_dropped"),
    )
    cap = F.lit(max_cluster_size) if max_cluster_size is not None else None
    n_truncated = (
        F.greatest(F.col("n_members") - cap, F.lit(0))
        if cap is not None
        else F.lit(0)
    )
    return (
        members.join(pair_stats, "centroid_id", "left")
        .select(
            "centroid_id",
            "n_members",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (
                F.col("n_members") - F.coalesce("n_dropped", F.lit(0))
            ).alias("n_kept"),
            n_truncated.cast("long").alias("n_truncated"),
        )
        .orderBy("centroid_id")
    )


def cosine_pairs_numpy(
    df: DataFrame,
    block_col: str = "label",
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All within-block pairs with cosine > threshold, scored by a blocked
    numpy matmul per group (applyInPandas). Identical semantics to the
    expression path (float64 math; ~1e-13 divergence is far below the
    4-decimal rounding the gate compares at), ~10x the throughput on wide
    vectors. Blocks must fit in executor memory — at 100 TB the block key
    is the LSH bucket, which bounds group size by construction."""
    import numpy as np

    out_schema = f"vec_a long, vec_b long, cos_sim double"

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []})
        pdf = pdf.sort_values(id_col)
        mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
        ids = pdf[id_col].to_numpy()
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ mat.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(n, k=1)
        mask = sims[iu, ju] > threshold
        return pd.DataFrame(
            {
                "vec_a": ids[iu[mask]],
                "vec_b": ids[ju[mask]],
                "cos_sim": sims[iu[mask], ju[mask]],
            }
        )

    return (
        df.select(block_col, id_col, vec_col)
        .groupBy(block_col)
        .applyInPandas(score, out_schema)
    )


def brute_force_topk_numpy(
    corpus: DataFrame,
    probes_pdf: pd.DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Throughput variant: per-partition numpy matmul against the (small,
    broadcast) probe matrix via mapInPandas; per-partition top-k then a
    global top-k. Same ordering semantics (cos desc, id asc).

    probes_pdf: pandas DataFrame with columns [probe_id, probe_vec(list)].
    """
    import numpy as np

    spark = corpus.sparkSession
    probe_ids = probes_pdf["probe_id"].to_numpy()
    probe_mat = np.vstack(probes_pdf["probe_vec"].to_numpy()).astype("float64")
    probe_norms = np.linalg.norm(probe_mat, axis=1)
    bc = spark.sparkContext.broadcast((probe_ids, probe_mat, probe_norms))

    out_schema = f"probe_id long, {id_col} long, cos_sim double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p_ids, p_mat, p_norms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            norms = np.linalg.norm(mat, axis=1)
            sims = (mat @ p_mat.T) / np.outer(norms, p_norms)
            ids = pdf[id_col].to_numpy()
            frames = []
            for j, pid in enumerate(p_ids):
                col = sims[:, j]
                mask = ids != pid
                take = min(k, int(mask.sum()))
                cand_idx = np.flatnonzero(mask)
                # partial top-k per batch; exact global head done in Spark
                order = cand_idx[np.lexsort((ids[cand_idx], -col[cand_idx]))][:take]
                frames.append(
                    pd.DataFrame(
                        {"probe_id": pid, id_col: ids[order], "cos_sim": col[order]}
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def label_centroids(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label", dim: int = 64
) -> DataFrame:
    """Per-label mean vector as an array column. One shuffle keyed by label
    (map-side partial sums per component); output is |labels| rows — always
    broadcastable downstream."""
    avgs = [F.avg(F.col(vec_col)[i].cast("double")) for i in range(dim)]
    return df.groupBy(F.col(label_col).alias("c_label")).agg(
        F.array(*avgs).alias("centroid")
    )


def assign_nearest_centroid(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Nearest-centroid assignment by cosine: broadcast the (tiny) centroid
    table against every vector, argmax per vector. The classification /
    cluster-assignment primitive.

    The argmax is a `max(struct(sim, -label))` aggregate, not a window
    rank: partial aggregation collapses the |labels|·N scored rows back to
    N inside each scan partition, so the one shuffle carries N rows and no
    sort — the shape that survives 100 TB. Exact-tie break: lowest c_label
    (via the negated second struct field; c_label must be numeric, which
    `label_centroids` guarantees). `keep_cols` are carried through the
    groupBy — they must be functionally dependent on `id_col`.

    Both norms are hoisted out of the crossJoin (the row norm computed
    once per vector, the centroid norm once per centroid) so each scored
    pair evaluates ONE higher-order fold (the dot product) instead of
    three — same doubles, same argmax, measurably less interpreter time
    since Spark's lambda HOFs sit outside whole-stage codegen."""
    label_type = dict(centroids.dtypes)["c_label"]
    cents = centroids.withColumn("_cn", norm(F.col("centroid")))
    scored = (
        df.withColumn("_vn", norm(F.col(vec_col)))
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "sim",
            dot(F.col(vec_col), F.col("centroid"))
            / (F.col("_vn") * F.col("_cn")),
        )
    )
    best = scored.groupBy(id_col, *keep_cols).agg(
        F.max(
            F.struct(
                F.col("sim"),
                (-F.col("c_label")).cast("double").alias("neg_label"),
            )
        ).alias("_best")
    )
    return best.select(
        id_col,
        *keep_cols,
        F.col("_best.sim").alias("sim"),
        (-F.col("_best.neg_label")).cast(label_type).alias("assigned_label"),
    )


def covariance_matrix_expr(
    df: DataFrame, dims: int, vec_col: str = "embedding"
) -> DataFrame:
    """Expression-path covariance/correlation matrix (upper triangle over
    the leading ``dims`` components): crossJoin each vector against the
    broadcast (i, j) pair list, one partial-agg groupBy on d(d+1)/2 keys.
    The d(d+1)/2x row inflation is pipelined map-side into the partial
    aggregate and never shuffles — the winning plan for NARROW vectors,
    where whole-stage codegen beats Arrow batch conversion (measured
    crossover vs the Gram kernel at d≈128-256; see covariance_matrix)."""
    from ..session import local_df

    pairs = local_df(
        df.sparkSession,
        [(i, j) for i in range(1, dims + 1) for j in range(i, dims + 1)],
        "i int, j int",
    )
    xi = F.element_at(vec_col, F.col("i")).cast("double")
    xj = F.element_at(vec_col, F.col("j")).cast("double")
    return (
        df.crossJoin(F.broadcast(pairs))
        .select("i", "j", xi.alias("xi"), xj.alias("xj"))
        .groupBy("i", "j")
        .agg(
            F.round(F.covar_pop("xi", "xj"), 6).alias("cov_pop"),
            F.round(F.corr("xi", "xj"), 6).alias("corr_r"),
            F.count("*").alias("n"),
        )
        .orderBy("i", "j")
    )


# measured on local[32] at sf0.1: expression path wins at d=64 (1.5 s vs
# 2.7 s / 100k vectors), Gram kernel wins 2.5x at d=256 (2.1 s vs 5.2 s /
# 20k vectors) with the gap growing ~d^2 — the crossover sits at d≈128-256
_COV_GRAM_MIN_DIMS = 128


def covariance_matrix(
    df: DataFrame, dims: int | None = None, vec_col: str = "embedding"
) -> DataFrame:
    """Covariance/correlation matrix with automatic path choice: the
    codegen'd expression plan below ``_COV_GRAM_MIN_DIMS`` requested
    dims, the one-pass Gram mapInPandas kernel at or above it (each
    vector touched once instead of replicated |pairs| times). Both paths
    produce identical output columns and 6-dp-identical values (pinned by
    the twin gates sharing one oracle). ``dims=None`` covers the full
    vector width, probed from the first row."""
    if dims is None:
        dims = len(df.select(vec_col).first()[0])
    if dims >= _COV_GRAM_MIN_DIMS:
        return covariance_matrix_gram(df, dims, vec_col)
    return covariance_matrix_expr(df, dims, vec_col)


def covariance_gram_partials(
    df: DataFrame, dims: int, vec_col: str = "embedding"
) -> DataFrame:
    """One-pass Gram-matrix covariance partials over the leading ``dims``
    vector components: a mapInPandas kernel emits, per Arrow batch, one row
    per upper-triangle (i, j) pair carrying the batch's sufficient
    statistics (n, Σxᵢ, Σxⱼ, Σxᵢxⱼ, Σxᵢ², Σxⱼ²); merging partials is a
    plain JVM groupBy-sum on d(d+1)/2 keys.

    This is the quality path for the expression-based covariance plan
    (plans/vectors.py vec_covariance_matrix), which crossJoins each vector
    against the broadcast pair list — a d(d+1)/2× row inflation (2080× at
    d=64) that is pipelined but CPU-heavy. Here each vector is touched
    once: the batch matmul XᵀX computes every pairwise product
    simultaneously, the kernel's output width is |pairs| per batch
    (independent of corpus size), and the final shuffle carries only
    |pairs| × n_batches tiny rows. Same float64 math as the aggregate
    path; both gates round to 6 dp where the ~1e-12 one-pass vs two-pass
    divergence is invisible."""
    import numpy as np

    pairs = [(i, j) for i in range(dims) for j in range(i, dims)]
    ii = np.array([p[0] for p in pairs])
    jj = np.array([p[1] for p in pairs])
    out_schema = (
        "i int, j int, n long, sxi double, sxj double, "
        "sxij double, sxi2 double, sxj2 double"
    )

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_col].to_numpy())[:, :dims].astype("float64")
            s = x.sum(axis=0)
            g = x.T @ x
            yield pd.DataFrame(
                {
                    "i": ii + 1,
                    "j": jj + 1,
                    "n": len(x),
                    "sxi": s[ii],
                    "sxj": s[jj],
                    "sxij": g[ii, jj],
                    "sxi2": g[ii, ii],
                    "sxj2": g[jj, jj],
                }
            )

    return df.select(vec_col).mapInPandas(partials, out_schema)


def covariance_matrix_gram(
    df: DataFrame, dims: int, vec_col: str = "embedding"
) -> DataFrame:
    """Assemble (i, j, cov_pop, corr_r, n) from the Gram partials: one
    groupBy-sum over d(d+1)/2 keys, then pure column arithmetic
    (cov = E[xy] − E[x]E[y], corr = cov/σᵢσⱼ). Output matches the
    expression-path gate column-for-column."""
    merged = (
        covariance_gram_partials(df, dims, vec_col)
        .groupBy("i", "j")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sxi").alias("sxi"),
            F.sum("sxj").alias("sxj"),
            F.sum("sxij").alias("sxij"),
            F.sum("sxi2").alias("sxi2"),
            F.sum("sxj2").alias("sxj2"),
        )
    )
    n = F.col("n").cast("double")
    cov = F.col("sxij") / n - (F.col("sxi") / n) * (F.col("sxj") / n)
    var_i = F.col("sxi2") / n - (F.col("sxi") / n) ** 2
    var_j = F.col("sxj2") / n - (F.col("sxj") / n) ** 2
    # zero-variance guard: corr is undefined there — NULL, matching both
    # engines' corr() aggregate (and avoiding an ANSI-mode 0/0 error on
    # degenerate inputs like a single-row partition)
    denom = F.sqrt(var_i * var_j)
    corr = F.when(denom > 0, cov / denom)
    return merged.select(
        "i",
        "j",
        F.round(cov, 6).alias("cov_pop"),
        F.round(corr, 6).alias("corr_r"),
        "n",
    ).orderBy("i", "j")
