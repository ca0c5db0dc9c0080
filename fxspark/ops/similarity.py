"""Similarity-search operators over embedding columns (north-star extension).

``array<float>`` embeddings, cosine metric. Three tiers:

1. ``cosine_topk`` / ``knn_join`` — brute-force exact scan: the baseline and
   the recall oracle. The dot product is a JVM-side ``zip_with``+``aggregate``
   fold (sequential, deterministic — bit-identical to the SQL oracle's
   ``list_sum`` fold); no Python, no shuffle except the final top-k.
2. ``cosine_pairs`` — exact all-pairs above a threshold (block nested loop).
3. ``rp_lsh_buckets`` / ``rp_lsh_topk`` — random-hyperplane LSH: each vector
   hashed to a sign-bit bucket; search touches only the probe's bucket(s).
   The 100 TB path: a 16-bit code splits the corpus into 65k buckets, so a
   query compares against ~1/65k of the data; recall is tunable via
   multi-probe (hamming-adjacent buckets).

Scale notes: top-k uses a per-partition partial top-k (``sort within
partitions + limit`` under AQE) rather than a global sort of the corpus;
queries are broadcast (they're small by definition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k of ``corpus`` by cosine to a single-row ``query`` frame
    (column ``qv``). Returns (id, cos) — ties broken by id for determinism."""
    scored = corpus.crossJoin(F.broadcast(query)).select(
        F.col(id_col), cosine(F.col(vec_col), F.col("qv")).alias("cos")
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col)).limit(k)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: str = "qid",
    exclude_same_id: bool = False,
) -> DataFrame:
    """For each query vector, its k nearest corpus vectors (exact, brute
    force): broadcast the query set, score every (query, corpus) pair,
    window-rank per query.  ``exclude_same_id`` drops self-matches when the
    query set is drawn from the corpus."""
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qv")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col(query_id),
        F.col(id_col),
        cosine(F.col(vec_col), F.col("_qv")).alias("cos"),
    )
    if exclude_same_id:
        scored = scored.filter(F.col(query_id) != F.col(id_col))
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id, id_col, "cos", "rk")
    )


def centroid_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cid_col: str = "cid",
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (ties → smallest
    centroid id) — the k-means / IVF-training assignment step as one
    broadcast crossJoin + per-vector window rank. The centroid set is always
    tiny (k ≪ corpus), so the corpus never shuffles for scoring; the only
    shuffle is the rank's hash partition on the (near-unique) vector id."""
    c = centroids.select(F.col(cid_col), F.col(vec_col).alias("_cv"))
    scored = df.crossJoin(F.broadcast(c)).select(
        F.col(id_col),
        F.col(cid_col),
        cosine(F.col(vec_col), F.col("_cv")).alias("cos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cos").desc(), F.col(cid_col))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, cid_col, "cos")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact all-pairs with cosine ≥ threshold (embedding near-dup).

    Quadratic — correct at any scale but only *affordable* under ~10⁶ rows
    per block; beyond that use ``rp_lsh_buckets`` to confine pairs to
    buckets."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def cosine_pairs_blocked(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via blocked matrix multiply —
    row-identical to ``cosine_pairs`` (bit-identical ``cos``), ~20× faster.

    Plan: vectors hash to ``n_blocks`` blocks by id; the block-pair grid
    (b·(b+1)/2 cells) is cogrouped and each cell computes a numpy
    ``A @ B.T`` on normalized rows (Arrow in, BLAS inside). Candidates at
    ``threshold − 1e-9`` are then re-scored with the same sequential
    double-precision fold the JVM/SQL expression uses, so the emitted ``cos``
    is bit-identical to ``cosine()`` despite BLAS's different accumulation
    order. At 100 TB this is the verify stage after LSH bucketing — the
    grid bounds memory per task to two blocks, and blocks scale out.
    """
    import pandas as pd

    # NULL vectors are outside the pair domain — the zip_with form yields
    # NULL cos (never >= threshold); the numpy path must match, not crash.
    df = df.filter(F.col(vec_col).isNotNull())
    spark = df.sparkSession
    cells = [(a, b) for a in range(n_blocks) for b in range(n_blocks) if a <= b]
    grid_a = spark.createDataFrame(cells, "_ba int, _bb int")
    grid_b = spark.createDataFrame(cells, "_ba2 int, _bb2 int")
    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        (F.col(id_col) % n_blocks).cast("int").alias("_blk"),
    )
    vb = df.select(
        F.col(id_col).alias("_id2"),
        F.col(vec_col).cast("array<double>").alias("_v2"),
        (F.col(id_col) % n_blocks).cast("int").alias("_blk2"),
    )
    left = v.join(F.broadcast(grid_a), v["_blk"] == grid_a["_ba"]).drop("_blk")
    right = vb.join(F.broadcast(grid_b), vb["_blk2"] == grid_b["_bb2"]).drop("_blk2")

    def seq_cos(a, b) -> float:
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        na = 0.0
        for x in a:
            na += x * x
        nb = 0.0
        for y in b:
            nb += y * y
        import math

        return s / (math.sqrt(na) * math.sqrt(nb))

    def cell(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "cos": pd.Series(dtype="float64")})
        if l_pdf.empty or r_pdf.empty:
            return empty
        same = l_pdf["_ba"].iat[0] == l_pdf["_bb"].iat[0]
        A = np.stack(l_pdf["_v"].to_numpy())
        B = np.stack(r_pdf["_v2"].to_numpy())
        An = A / np.linalg.norm(A, axis=1, keepdims=True)
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        M = An @ Bn.T
        ia, ib = np.nonzero(M >= threshold - 1e-9)
        ids_a = l_pdf["_id"].to_numpy()[ia]
        ids_b = r_pdf["_id2"].to_numpy()[ib]
        out = []
        for i, j, xa, xb in zip(ids_a, ids_b, ia, ib):
            if same and not i < j:
                continue
            c = seq_cos(A[xa], B[xb])
            if c >= threshold:
                out.append((min(i, j), max(i, j), c))
        if not out:
            return empty
        return pd.DataFrame(out, columns=["id_a", "id_b", "cos"])

    return (
        left.groupBy("_ba", "_bb")
        .cogroup(right.groupBy("_ba2", "_bb2"))
        .applyInPandas(cell, "id_a long, id_b long, cos double")
    )


def train_ivf_codebook(sample, n_cells: int = 16, seed: int = 7) -> list[list[float]]:
    """Seeded Lloyd k-means on a driver-side float64 sample. Shared by
    ``ivf_assign`` and the DuckDB oracle builder (queries._ivf_oracle), so the
    oracle replays the EXACT codebook the Spark plan uses — this is what makes
    an approximate, data-adaptive index hash-checkable."""
    import numpy as np

    # A NULL vector is outside the vector space: drop None rows from the
    # sample HERE so every caller (ivf_assign's collect, the DuckDB oracle
    # builders' to_pylist) derives the identical codebook from the same
    # first-4096-by-id sample (an object array of Nones would IndexError
    # in the Lloyd tensor — sf_nulls registry sweep).
    if getattr(sample, "dtype", None) is not None and sample.dtype == object:
        sample = np.array([v for v in sample if v is not None],
                          dtype=np.float64)
    if len(sample) == 0:
        # EMPTY corpus ⇒ empty codebook (an empty np.array is 1-D, so the
        # Lloyd distance tensor below would IndexError — round-14 sf_empty
        # registry sweep); callers route zero rows through zero cells.
        return []
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(8):  # Lloyd on the sample
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return [list(map(float, c)) for c in cent]


def ivf_assign(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 7,
    id_col: str = "vec_id",
    sample_size: int = 4096,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: k-means codebook trained DRIVER-SIDE on a
    bounded sample (the FAISS topology — training cost independent of corpus
    size), then broadcast into an Arrow-batched nearest-centroid assignment.
    Returns the frame with a ``_cell`` column plus the centroid list.

    The sample is the first ``sample_size`` rows by ``id_col`` —
    deterministic; swap in reservoir sampling if ids correlate with
    embedding geometry. Lloyd iterations are few on purpose: the codebook
    only routes probes, and recall barely moves past ~8 iterations.
    At 100 TB the only distributed work is the single assignment map —
    no per-iteration cluster jobs.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # The training sample is the first sample_size rows by id of the
    # UN-filtered frame — the oracle builders (_ivf_oracle,
    # _semantic_dedup_oracle) slice first-4096-by-id and let
    # train_ivf_codebook drop Nones, so the slice must happen BEFORE any
    # NULL filter here or the two sides would train different codebooks
    # once NULL vectors appear among the first sample_size rows.
    sample = np.array(
        [r[0] for r in df.select(vec_col).orderBy(id_col).limit(sample_size).collect()],
        dtype=object,
    )
    centroids = train_ivf_codebook(sample, n_cells, seed)
    # NULL vectors cannot be assigned a cell (and would break np.stack in
    # the Arrow batch): outside the index domain by contract — but only
    # the ASSIGNMENT path drops them, not the sample construction above.
    df = df.filter(F.col(vec_col).isNotNull())
    cent = np.array(centroids, dtype=np.float64)

    def _nearest(vecs):
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        # argmin ||x-c||^2 = argmin -2xC^T + |c|^2  (|x|^2 constant per row)
        scores = -2.0 * (X @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        return pd.Series(scores.argmin(axis=1).astype("int32"))

    nearest_cell = pandas_udf(_nearest, "int")
    assigned = df.withColumn("_cell", nearest_cell(F.col(vec_col)))
    return assigned, centroids


def ivf_topk(
    corpus: DataFrame,
    query: DataFrame,
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
) -> DataFrame:
    """IVF ANN top-k: score only corpus vectors in the ``n_probe`` cells
    whose centroids are closest to the query (by cosine). The second ANN
    tier next to ``rp_lsh_topk``: data-adaptive cells (k-means) vs
    data-oblivious hyperplanes — better recall on clustered corpora, at the
    cost of training the codebook.

    ``query`` is a single-row frame with column ``qv``.
    """
    assigned, centroids = ivf_assign(corpus, n_cells, vec_col, seed)
    qv = query.select("qv")
    cent = qv.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "_cell int, _cv array<double>"
    )
    probe = (
        cent.crossJoin(F.broadcast(qv))
        .select("_cell", cosine(F.col("_cv"), F.col("qv")).alias("_sim"))
        .orderBy(F.col("_sim").desc())
        .limit(n_probe)
        .select("_cell")
    )
    scored = (
        assigned.join(F.broadcast(probe), "_cell")
        .crossJoin(F.broadcast(qv))
        .select(F.col(id_col), cosine(F.col(vec_col), F.col("qv")).alias("cos"))
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col)).limit(k)


def rp_lsh_buckets(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket code: bit i = sign(v · plane_i).

    ``planes`` is a deterministic (seeded, driver-generated) list of unit
    vectors — tiny, shipped as a literal; the bucket code is a pure map-side
    expression."""
    code = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pv = F.array(*[F.lit(float(x)) for x in p])
        code = code + F.when(dot(F.col(vec_col), pv) >= 0, F.lit(1 << i)).otherwise(0)
    return df.withColumn("bucket", code)


def rp_lsh_topk(
    corpus: DataFrame,
    query: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: score only corpus vectors in the query's LSH bucket.

    Approximate (bucket-miss ⇒ recall < 1); the exact ``cosine_topk`` is the
    recall oracle in tests."""
    c = rp_lsh_buckets(corpus, planes, vec_col)
    q = rp_lsh_buckets(query.withColumnRenamed("qv", vec_col), planes, vec_col)
    q = q.select(F.col(vec_col).alias("qv"), F.col("bucket"))
    scored = c.join(F.broadcast(q), "bucket").select(
        F.col(id_col), cosine(F.col(vec_col), F.col("qv")).alias("cos")
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col)).limit(k)


def scalar_quantize(col: Column, levels: int = 127) -> Column:
    """int8-style scalar quantization: each component → round(x·levels),
    clamped to ±levels. 4× memory/shuffle reduction vs float32 (32× vs the
    double intermediate) — the standard first compression tier for
    billion-vector corpora; recall loss is bounded by 1/(2·levels) per
    component. Pure map-side expression."""
    q = F.round(col.cast("double") * levels).cast("int")
    return F.greatest(F.lit(-levels), F.least(F.lit(levels), q))


def quantize_vec(vec: Column, levels: int = 127) -> Column:
    """Quantize every component of an ``array<float>`` column."""
    return F.transform(vec, lambda x: scalar_quantize(x, levels))


def dequantize_vec(vec: Column, levels: int = 127) -> Column:
    """Inverse of ``quantize_vec`` (components back to [-1, 1] doubles)."""
    return F.transform(vec, lambda q: q.cast("double") / levels)


def rp_project(vec: Column, planes: list[list[float]]) -> Column:
    """Random-projection dimensionality reduction: the input vector projected
    onto ``len(planes)`` fixed hyperplanes (Johnson-Lindenstrauss). The
    planes ship as literals; the projection is a pure map-side fold — at
    100 TB this is the cheap pre-filter that lets top-k run on 8 doubles
    instead of 64 floats, with exact re-scoring of the shortlist."""
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(x)) for x in p]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for p in planes
        ]
    )


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate removal by
    clustering embeddings, then comparing pairs ONLY within a cluster.

    Every vector is assigned to its max-cosine centroid (broadcast
    ``centroid_assign`` — the corpus never shuffles for scoring), then a
    self-join keyed on the cluster id finds pairs with cosine ≥
    ``threshold``; a vector is dropped when a LOWER-id near-duplicate
    exists in its cluster (deterministic keep-lowest rule, the
    SQL-expressible variant of SemDeDup's keep-one-exemplar). Emits one row
    per dropped vector: ``(vec_id, cid, kept_by, cos)`` with ``kept_by`` =
    the most-similar lower-id neighbor (ties → smallest id).

    Scale shape: the pairwise join is quadratic ONLY within a cluster —
    cluster count grows with the corpus (SemDeDup uses ~100k clusters at
    web scale), holding per-bucket width roughly constant; the exchange is
    the cluster-id hash partition. This is the embedding-space sibling of
    banded MinHash-LSH.

    Pair scoring runs on PRE-NORMALIZED vectors: each vector is unit-scaled
    once (O(corpus) folds), so every pair needs a single dot fold instead
    of dot + two norms — 3× less lambda work in the quadratic stage
    (measured 3.2 s → 2.5 s warm at sf0.1; the residual is the assignment
    + join machinery, not pair scoring). The norm is computed ONCE into a
    projected column before the per-element transform — HOF lambdas are
    interpreted with no subexpression elimination, so an inline norm would
    re-fold O(d) work per element (O(d²)/vector). Zero-norm vectors have no
    direction: they are excluded from pair scoring explicitly (never
    dropped, never a keeper)."""
    live = (
        df.select(id_col, vec_col)
        .withColumn("_n", norm(F.col(vec_col)))
        .filter(F.col("_n") > 0)  # before assignment: cosine is undefined
    )
    assigned = (
        centroid_assign(live.select(id_col, vec_col), centroids, vec_col, id_col)
        .select(id_col, "cid")
        .join(live, id_col)
        .select(
            id_col,
            "cid",
            F.transform(
                F.col(vec_col), lambda x: x.cast("double") / F.col("_n")
            ).alias("_vn"),
        )
    )
    a = assigned.select(
        F.col("cid"),
        F.col(id_col).alias("_ida"),
        F.col("_vn").alias("_vna"),
    )
    b = assigned.select(
        F.col("cid"),
        F.col(id_col).alias("_idb"),
        F.col("_vn").alias("_vnb"),
    )
    pairs = (
        a.join(b, "cid")
        .filter(F.col("_ida") < F.col("_idb"))
        .select(
            "cid",
            F.col("_idb").alias(id_col),
            F.col("_ida").alias("_keeper"),
            F.aggregate(
                F.zip_with(F.col("_vna"), F.col("_vnb"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cos").desc(), F.col("_keeper")
    )
    return (
        pairs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, "cid", F.col("_keeper").alias("kept_by"), "cos")
    )


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cent0: DataFrame,
    iters: int = 2,
) -> DataFrame:
    """Distributed Lloyd's k-means for ``iters`` full (assign, update)
    rounds from the declared seed codebook ``cent0`` (``cell``, ``cv``
    array<double>) — the training loop whose single-shot halves already
    exist here (``train_ivf_codebook`` trains on a bounded sample;
    ``semantic_dedup``/IVF only ASSIGN). This is the full distributed EM:
    every row votes in every update.

    Topology per iteration (the MLlib topology, expressed declaratively):
    assignment is a broadcast of the k×d codebook against the corpus — the
    codebook collapses to ONE array row, crossJoined broadcast, and the
    argmin is an in-row ``F.aggregate`` fold (no shuffle, no k-fold row
    blowup, and no reliance on row ids — duplicate ``id_col`` values no
    longer collapse); the update is ONE partial-combined
    (cell, dim) aggregation, so the exchange carries k×d rows regardless
    of corpus size. Nothing ever collects to the driver — centroids stay
    a (tiny) DataFrame and the loop just deepens the lazy plan.

    Determinism (what makes an ITERATIVE float algorithm oracle-hashable):
    per-dim means are exact-decimal sums divided in double (the
    ``label_centroid_stats`` discipline), and the distance fold is the
    module's sequential ``zip_with``+``aggregate`` — bit-identical to the
    oracle's ``list_sum(list_apply(list_zip(...)))`` replay, so even
    cross-iteration error propagation is reproduced exactly. Ties in the
    argmin break on the cell id in both engines.

    Returns per-cell stats after a final assignment against the trained
    codebook: ``cell, n_vecs, inertia, centroid_l2``.
    """
    e = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )

    def l2sq(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def assign(cent: DataFrame) -> DataFrame:
        # Argmin as an IN-ROW fold over the broadcast-collected codebook
        # array (sorted by cell id: strict < keeps the LOWEST cell on
        # exact distance ties — the oracle's ORDER BY dist, cell). This
        # replaces the earlier crossJoin + groupBy(_id) re-reduce, which
        # (a) blew each row up k-fold through a shuffle and (b) silently
        # COLLAPSED duplicate ids — found when the doubled-rows fixture
        # (sf_dups) halved n_vecs. Map-only: no shuffle, no id reliance.
        cent_arr = cent.agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("cell"), F.col("_cv")))
            ).alias("_cs")
        )

        def step(acc: Column, c: Column) -> Column:
            d = l2sq(F.col("_v"), c["_cv"])
            return F.when(
                acc["cell"].isNull() | (d < acc["dist"]),
                F.struct(d.alias("dist"), c["cell"].alias("cell")),
            ).otherwise(acc)

        best = F.aggregate(
            F.col("_cs"),
            F.struct(
                F.lit(None).cast("double").alias("dist"),
                F.lit(None).cast("int").alias("cell"),
            ),
            step,
        )
        return (
            e.crossJoin(F.broadcast(cent_arr))
            .select("_id", best.alias("_b"), "_v")
            .select(
                "_id",
                F.col("_b.cell").alias("cell"),
                F.col("_b.dist").alias("_dist"),
                "_v",
            )
            .filter(F.col("cell").isNotNull())  # empty codebook ⇒ no rows
        )

    cent = cent0.select("cell", F.col("cv").alias("_cv"))
    for _ in range(iters):
        assigned = assign(cent)
        cent = (
            assigned.select("cell", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(30,10)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("c")
            )
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("_cv")
            )
        )

    final = assign(cent)
    l2 = (
        cent.select("cell", F.explode("_cv").alias("c"))
        .groupBy("cell")
        .agg(
            F.round(
                F.sqrt(
                    F.sum(
                        (F.col("c") * F.col("c")).cast("decimal(38,12)")
                    ).cast("double")
                ),
                6,
            ).alias("centroid_l2")
        )
    )
    return (
        final.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(F.col("_dist").cast("decimal(38,9)")).cast("double"), 6
            ).alias("inertia"),
        )
        .join(F.broadcast(l2), "cell")
        .select("cell", "n_vecs", "inertia", "centroid_l2")
    )
