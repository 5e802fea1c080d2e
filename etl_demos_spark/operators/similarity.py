"""Similarity search over embedding columns (array<float>).

Paths:
- **Brute-force top-k** (the exact baseline): broadcast the query
  vectors, one corpus pass. The corpus-scan inner loop is an Arrow-batch
  numpy GEMM (``mapInPandas``) with per-batch partial top-k — BLAS
  throughput, and the final window only sees ≈ k·(batches)·(queries)
  rows instead of n·queries. The higher-order-function ``cosine``
  expression (zip_with + aggregate, strictly sequential summation) stays
  as the deterministic scalar form for oracle checks and candidate-set
  scoring — it is interpreted per element, so it must NOT be the
  full-scan inner loop (measured ~50× slower than GEMM).
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  (SimHash for cosine) → candidates share a band bucket → exact cosine
  only on candidates. Probe multiplicity trades recall for cost.
- **IVF (inverted file)**: k-means-style coarse centroids → search only
  the nprobe nearest cells. Centroids come from a sampled fit (driver-side
  numpy on ≤100k sampled vectors — the classic FAISS recipe); assignment
  and search are pure DataFrame joins.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double dot product (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Sequential-HOF cosine with a zero-norm guard: under Spark 4's
    ANSI default a zero-norm vector would throw DIVIDE_BY_ZERO out of
    every expression-scored path, while the GEMM paths (via
    _np_norm_rows' norm→1 convention) return 0.0 — the guard makes both
    forms agree: zero vectors are similar to nothing."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == F.lit(0.0)) | (nb == F.lit(0.0)), F.lit(0.0)).otherwise(
        dot(a, b) / (na * nb)
    )


def _np_norm_rows(M: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    return M / norms[:, None]


def _require_integral_ids(op: str, *frames_and_cols) -> None:
    """Fail at the operator boundary when a GEMM path's hardcoded
    ``long`` output schema can't carry the id column — a string id
    otherwise dies deep inside numpy/Arrow with an opaque error while
    the same input works under method='hof'."""
    from pyspark.sql.types import IntegralType

    for df, col in frames_and_cols:
        t = df.schema[col].dataType
        if not isinstance(t, IntegralType):
            raise TypeError(
                f"{op}(method='gemm') requires integer ids (column "
                f"{col!r} is {t.simpleString()}); map ids to integers "
                "first, or pass method='hof'"
            )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
    method: str = "gemm",
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    ``queries`` is expected to be small (collected/broadcast — same
    bounded-driver contract as IVF centroid fitting); the corpus is
    scanned once regardless of query count. Ties broken by corpus id for
    determinism in both methods.

    ``method="gemm"`` (default): Arrow-batch numpy GEMM corpus scan with
    per-batch partial top-k — the global top-k is a subset of the union
    of per-batch top-ks (same ordering key), so pre-pruning is lossless
    and the final window input is tiny. ``method="hof"``: the original
    all-JVM higher-order-function expression — slower (interpreted per
    element) but collect-free; kept as the cross-check path
    (tests assert both produce identical results).
    """
    if method == "hof":
        joined = corpus.crossJoin(F.broadcast(queries))
        scored = joined.select(
            F.col(q_id_col),
            F.col(id_col),
            cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos_sim"),
        )
    else:
        spark = corpus.sparkSession
        _require_integral_ids(
            "brute_force_topk", (corpus, id_col), (queries, q_id_col)
        )
        q_rows = queries.select(q_id_col, q_vec_col).collect()
        if not q_rows:
            # empty query set: the hof path returns empty naturally; the
            # gemm path would feed a 0-d array into the norm/GEMM chain
            return spark.createDataFrame(
                [], f"{q_id_col} long, {id_col} long, cos_sim double"
            )
        q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
        Qn = _np_norm_rows(np.array([r[1] for r in q_rows], dtype=np.float64))
        bq = spark.sparkContext.broadcast((q_ids, Qn))

        def score(batches):
            qids, Q = bq.value
            for pdf in batches:
                if not len(pdf):
                    continue
                c_ids = pdf[id_col].to_numpy()
                # pre-sort the batch by corpus id: a STABLE argsort of
                # -S down the corpus axis is then exactly (cos desc, id
                # asc) — ONE C-level sort for ALL queries, replacing a
                # python lexsort + DataFrame per query (r10 A/B:
                # extraction, not GEMM, dominated the pass)
                order = np.argsort(c_ids, kind="stable")
                c_ids = c_ids[order]
                C = _np_norm_rows(
                    np.array(list(pdf[vec_col]), dtype=np.float64)
                )[order]
                S = C @ Q.T  # (batch_rows, n_queries) — one GEMM per batch
                kk = min(k, len(c_ids))
                top = np.argsort(-S, axis=0, kind="stable")[:kk]  # (kk, nq)
                rows = top.T.ravel()  # query-major corpus indices
                cols = np.repeat(np.arange(len(qids)), kk)
                yield pd.DataFrame(
                    {
                        q_id_col: np.repeat(qids, kk),
                        id_col: c_ids[rows],
                        "cos_sim": S[rows, cols],
                    }
                )

        scored = corpus.select(id_col, vec_col).mapInPandas(
            score, f"{q_id_col} long, {id_col} long, cos_sim double"
        )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def blocked_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
    n_corpus_blocks: int = 8,
    n_query_blocks: int = 8,
) -> DataFrame:
    """Exact top-k where BOTH sides are corpus-sized — no driver collect.

    brute_force_topk's gemm path collects the query side to the driver
    (its contract: queries small/broadcastable). When the "queries" are
    themselves a corpus — bitext mining, all-to-all retrieval — that
    collect is a driver OOM at scale. This is the two-sided form: the
    cosine_pairs_tiled block-join shape, except the two sides are
    DISTINCT frames and each tile emits a per-tile partial top-k per
    query instead of thresholded pairs.

    Shape: corpus rows hash into ``n_corpus_blocks`` blocks, query rows
    into ``n_query_blocks``; tile (ci, qj) GEMM-scores corpus block ci
    against query block qj inside ``applyInPandas``. Each corpus row is
    replicated n_query_blocks times and each query row n_corpus_blocks
    times (the O(n·√T) bound); no single task ever holds more than one
    (|corpus|/n_c × |queries|/n_q) tile, and nothing reaches the driver.
    The global top-k per query is a subset of the union of per-tile
    top-ks under the same (cos_sim desc, id asc) key — per-tile
    pre-pruning is lossless, so the final window input is ≈
    k·n_corpus_blocks rows per query. A pair's cosine is one full-length
    dot of the same two normalized float64 vectors in every strategy, so
    results are pinned identical to brute_force_topk (tests).
    """
    _require_integral_ids(
        "blocked_topk", (corpus, id_col), (queries, q_id_col)
    )
    c_rep = corpus.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_corpus_blocks))
        .cast("int")
        .alias("_cb"),
        F.explode(F.sequence(F.lit(0), F.lit(n_query_blocks - 1))).alias("_qb"),
        F.lit(0).alias("_side"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
    )
    q_rep = queries.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_corpus_blocks - 1))).alias("_cb"),
        F.pmod(F.xxhash64(F.col(q_id_col)), F.lit(n_query_blocks))
        .cast("int")
        .alias("_qb"),
        F.lit(1).alias("_side"),
        F.col(q_id_col).alias("_id"),
        F.col(q_vec_col).alias("_vec"),
    )
    rep = c_rep.unionByName(q_rep)
    out_schema = f"{q_id_col} long, {id_col} long, cos_sim double"

    # no type hints: `from __future__ import annotations` stringifies them
    # and the applyInPandas hint resolver warns on unresolvable strings
    def tile(key, pdf):
        cmask = pdf["_side"].to_numpy() == 0
        C_pdf, Q_pdf = pdf[cmask], pdf[~cmask]
        empty = pd.DataFrame({q_id_col: [], id_col: [], "cos_sim": []}).astype(
            {q_id_col: "int64", id_col: "int64", "cos_sim": "float64"}
        )
        if not len(C_pdf) or not len(Q_pdf):
            return empty
        c_ids = C_pdf["_id"].to_numpy()
        # pre-sort the corpus side by id: a STABLE argsort of -S down
        # the corpus axis is then exactly (cos desc, id asc) — one
        # C-level sort per chunk for ALL its queries, replacing a
        # python lexsort + DataFrame per query (r10 A/B: extraction,
        # not GEMM, dominated the tile pass)
        order = np.argsort(c_ids, kind="stable")
        c_ids = c_ids[order]
        C = _np_norm_rows(np.array(list(C_pdf["_vec"]), dtype=np.float64))[order]
        Q = _np_norm_rows(np.array(list(Q_pdf["_vec"]), dtype=np.float64))
        q_ids = Q_pdf["_id"].to_numpy()
        kk = min(k, len(c_ids))
        # GEMM in query-side chunks: caps the live similarity slab at
        # ~256 MB regardless of tile size (same discipline as
        # cosine_pairs_tiled) while keeping each multiply a real dgemm.
        chunk = max(1, 32_000_000 // max(len(c_ids), 1))
        parts = []
        for s in range(0, len(q_ids), chunk):
            S = C @ Q[s : s + chunk].T  # (corpus_rows, chunk)
            top = np.argsort(-S, axis=0, kind="stable")[:kk]  # (kk, chunk)
            rows = top.T.ravel()  # query-major corpus indices
            cols = np.repeat(np.arange(S.shape[1]), kk)
            parts.append(
                pd.DataFrame(
                    {
                        q_id_col: np.repeat(q_ids[s : s + chunk], kk),
                        id_col: c_ids[rows],
                        "cos_sim": S[rows, cols],
                    }
                )
            )
        return pd.concat(parts, ignore_index=True) if parts else empty

    scored = rep.groupBy("_cb", "_qb").applyInPandas(tile, out_schema)
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def rp_lsh_buckets(
    planes: Sequence[Sequence[float]],
    vec_col: str = "embedding",
) -> Column:
    """Random-hyperplane signature: bit i = sign(v · plane_i). ``planes``
    are driver-provided constants (seeded numpy), broadcast in the plan as
    literals — no shuffle, one pass. At most 62 planes: bit 62 is the
    last that fits a positive signed-long literal — bit 63 wraps
    negative in the GEMM form and overflows the literal here, silently
    colliding buckets between the two pinned-identical forms."""
    if len(planes) > 62:
        raise ValueError(
            f"rp_lsh supports at most 62 planes (got {len(planes)}); "
            "split the signature into multiple bucket columns instead"
        )
    bits = [
        F.when(
            dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in p])) >= 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def rp_lsh_buckets_gemm(
    df: DataFrame,
    planes: Sequence[Sequence[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus-side bucket assignment as ONE Arrow-batch numpy GEMM:
    bucket bit i = sign of row i of V @ P.T. The expression form
    (rp_lsh_buckets) evaluates an interpreted higher-order dot per plane
    per row — fine for query batches, wrong as the map pass that buckets
    a 100 TB corpus. Output schema = input + ``bucket`` long; pinned
    bit-identical to the expression form on seeded data (sign flips
    require |dot| within float64 ulp of zero — measure-zero for real
    embeddings)."""
    from pyspark.sql.types import LongType, StructField, StructType

    if len(planes) > 62:  # same bound as rp_lsh_buckets — bit 63 wraps
        raise ValueError(
            f"rp_lsh supports at most 62 planes (got {len(planes)})"
        )
    P = np.array(planes, dtype=np.float64)
    schema = StructType(list(df.schema.fields) + [StructField("bucket", LongType())])

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            bits = (V @ P.T) >= 0  # (rows, planes)
            weights = (1 << np.arange(P.shape[0], dtype=np.int64))
            pdf = pdf.copy()
            pdf["bucket"] = bits @ weights
            yield pdf

    return df.mapInPandas(assign, schema)


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    planes: Sequence[Sequence[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
    multiprobe: int = 0,
    bucket_method: str = "gemm",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: exact cosine only within matching LSH buckets.
    Recall < 1 by construction; raise the plane count for precision, or
    ``multiprobe=m`` to also probe every bucket within Hamming distance 1
    on the first m signature bits (query-side fan-out only — the corpus is
    never re-bucketed, so cost grows with queries, not corpus).

    ``bucket_method="gemm"`` (default) assigns corpus buckets with the
    vectorized numpy pass (rp_lsh_buckets_gemm) — the corpus-scale path;
    broadcast queries use the expression form (tiny). The interpreted
    expression form (``"expr"``) is kept as the oracle cross-check; both
    pinned identical in tests/test_similarity.py.

    ``broadcast_queries=False`` is the TWO-CORPUS form (bitext mining,
    all-to-all retrieval): the query side is gemm-bucketed like the
    corpus and the candidate join is a plain shuffle join on bucket —
    nothing broadcast, nothing collected; AQE's skew split handles hot
    buckets. Output is identical to the broadcast form (pinned)."""
    if bucket_method == "gemm":
        c = rp_lsh_buckets_gemm(corpus, planes, vec_col)
    else:
        c = corpus.withColumn("bucket", rp_lsh_buckets(planes, vec_col))
    if broadcast_queries:
        q = queries.withColumn("bucket", rp_lsh_buckets(planes, q_vec_col))
    else:
        q = rp_lsh_buckets_gemm(queries, planes, q_vec_col)
    if multiprobe > 0:
        probes = F.array_distinct(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(min(multiprobe, len(planes)))
                ],
            )
        )
        q = q.withColumn("bucket", F.explode(probes))
    cand = c.join(F.broadcast(q) if broadcast_queries else q, "bucket")
    scored = cand.select(
        F.col(q_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def ivf_build_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    sample: int = 100_000,
    vec_col: str = "embedding",
    seed: int = 42,
    iters: int = 5,
    id_col: str = "vec_id",
):
    """Sampled k-means (driver-side numpy — the FAISS coarse-quantizer
    recipe; the sample is bounded, never the corpus). Returns a list of
    centroid vectors.

    The sample is the bottom-``sample`` rows by a ROW hash — a
    deterministic UNIFORM sample (the bottom-k discipline of
    sketches.bottomk_sample), not ``limit()``: a bare limit takes
    whatever rows the scan reaches first, and on a corpus written
    sorted/partitioned by cell (exactly the layout ivf_write produces)
    that fits centroids to one region of embedding space and collapses
    recall everywhere else. The hash salts with ``id_col`` when the
    column exists: content-only hashing gives every duplicate of a
    vector ONE rank, so a duplicate-heavy corpus (the norm for these
    pipelines) either floods the whole sample with one vector or
    excludes its mass entirely — uniform over ROWS needs row identity.
    TakeOrdered keeps it one partial-top-k pass, no full sort."""
    import numpy as np

    has_id = id_col in corpus.columns
    salt = [F.col(id_col).cast("string")] if has_id else []
    h = F.xxhash64(F.col(vec_col).cast("string"), *salt, F.lit(seed))
    cols = [vec_col] + ([id_col] if has_id else [])
    frac_rows = (
        corpus.select(*cols).orderBy(h).limit(sample).select(vec_col).collect()
    )
    if not frac_rows:
        raise ValueError("ivf_build_centroids: empty corpus")
    X = np.array([r[0] for r in frac_rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    xn = (X * X).sum(axis=1)
    for _ in range(iters):
        # |x|² − 2·x·C + |c|²: (sample × cells) result, never the
        # (sample × cells × dim) broadcast intermediate
        d = xn[:, None] - 2.0 * (X @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        assign = d.argmin(1)
        for j in range(len(cents)):
            members = X[assign == j]
            if len(members):
                cents[j] = members.mean(0)
    return [list(map(float, c)) for c in cents]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF search: score only the corpus cells whose centroids are among
    the query's ``nprobe`` nearest. At scale the corpus is *written
    partitioned by cell*, so the probe is partition pruning — the scan
    itself skips (1 - nprobe/n_cells) of the data."""
    c = ivf_assign_gemm(corpus, centroids, vec_col)
    q = ivf_assign(
        queries.withColumnRenamed(q_vec_col, vec_col), centroids, vec_col, n_cells=nprobe
    ).withColumnRenamed(vec_col, q_vec_col)
    if nprobe == 1:
        # ivf_assign's n_cells=1 contract emits a scalar `cell`
        q = q.withColumn("cells", F.array("cell"))
    q = q.select(q_id_col, q_vec_col, F.explode("cells").alias("cell"))
    cand = c.join(F.broadcast(q), "cell")
    scored = cand.select(
        F.col(q_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def ivf_write(
    corpus: DataFrame,
    centroids,
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Materialize the corpus as an on-disk IVF index: every vector is
    assigned to its nearest coarse centroid and the table is written
    ``partitionBy("cell")``. This is the 100 TB ANN layout — after this
    write, an nprobe search is *partition pruning*: the scan reads only
    nprobe/n_cells of the files and never touches the rest
    (``PartitionFilters`` on ``cell``, asserted in
    tests/test_physical_plans.py)."""
    ivf_assign_gemm(corpus, centroids, vec_col).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    centroids,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> DataFrame:
    """Search a written IVF index (see :func:`ivf_write`).

    The probe-cell set is computed from the (small, broadcastable-by-
    contract) query batch and applied as a *literal* ``isin`` filter on
    the partition column — static partition pruning that is guaranteed at
    plan time, independent of AQE/DPP heuristics. The subsequent
    broadcast join fans each query out to its own nprobe cells only.
    Equality with the in-memory :func:`ivf_topk` is pinned in
    tests/test_similarity.py."""
    q = ivf_assign(
        queries.withColumnRenamed(q_vec_col, vec_col), centroids, vec_col, n_cells=nprobe
    ).withColumnRenamed(vec_col, q_vec_col)
    if nprobe == 1:
        # ivf_assign's n_cells=1 contract emits a scalar `cell`
        q = q.withColumn("cells", F.array("cell"))
    q = q.select(q_id_col, q_vec_col, F.explode("cells").alias("cell"))
    # Bounded driver work: |queries| * nprobe cell ids, same contract as
    # the centroid fit. A literal IN list is what makes the pruning
    # visible in PartitionFilters (a join alone would rely on DPP).
    probe_cells = sorted({r[0] for r in q.select("cell").distinct().collect()})
    c = spark.read.parquet(path).filter(F.col("cell").isin(probe_cells))
    cand = c.join(F.broadcast(q), "cell")
    scored = cand.select(
        F.col(q_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def ivf_assign_gemm(
    df: DataFrame, centroids, vec_col: str = "embedding"
) -> DataFrame:
    """Corpus-side nearest-cell assignment as ONE Arrow-batch numpy GEMM
    per batch (the |x|² − 2·x·C + |c|² identity), preserving the full
    input schema plus an int ``cell`` column — the pass `ivf_write` /
    `ivf_topk` run over the whole corpus. The expression form
    (`ivf_assign`) evaluates k interpreted array-aggregates per row —
    fine for query batches, wrong as a 100 TB map pass. `np.argmin`
    takes the first minimum, matching the expression form's
    array_position tiebreak; pinned identical in tests/test_similarity.py."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    spark = df.sparkSession
    C = np.asarray([list(c) for c in centroids], dtype=np.float64)
    cn = (C * C).sum(axis=1)
    b_c = spark.sparkContext.broadcast((C, cn))
    schema = StructType(list(df.schema.fields) + [StructField("cell", IntegerType())])

    def assign(batches):
        Cm, Cn = b_c.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ Cm.T) + Cn[None, :]
            pdf = pdf.copy()
            pdf["cell"] = d.argmin(axis=1).astype(np.int32)
            yield pdf

    return df.mapInPandas(assign, schema)


def ivf_assign(
    df: DataFrame, centroids, vec_col: str = "embedding", n_cells: int = 1
) -> DataFrame:
    """Assign each vector to its nearest centroid cell(s) (argmin over
    literal centroid arrays — one narrow pass). ``n_cells=1`` adds an int
    ``cell`` column; ``n_cells>1`` adds a ``cells`` array (multi-probe).
    This is the *expression* form — query batches and cross-engine
    oracles; corpus-side passes route through :func:`ivf_assign_gemm`.
    At scale, write the corpus partitioned by ``cell`` so probes become
    partition pruning."""
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(x) for x in c]),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in centroids
        ]
    )
    if n_cells == 1:
        return df.withColumn(
            "cell", F.array_position(dists, F.array_min(dists)).cast("int") - 1
        )
    ranked = F.array_sort(
        F.transform(
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda i: F.struct(
                F.element_at(dists, i + 1).alias("d"), i.cast("int").alias("idx")
            ),
        )
    )
    return df.withColumn(
        "cells",
        F.transform(F.slice(ranked, 1, n_cells), lambda s: s["idx"]),
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
    q_label_col: str = "query_label",
    method: str = "gemm",
) -> DataFrame:
    """Hard-negative mining for metric/contrastive training (the
    triplet-loss data prep of Schroff et al. 2015 / SimCLR-style
    batches): for each query, the k most-similar corpus vectors whose
    ``label`` DIFFERS from the query's — maximally confusing negatives,
    which train far better than random ones.

    Same scale contract as brute_force_topk: one corpus pass, one GEMM
    per Arrow batch. The label exclusion is applied INSIDE the scorer —
    same-label scores are masked to −inf BEFORE the per-batch partial
    top-k — so pre-pruning stays lossless (the global top-k over
    non-matching labels is a subset of the union of per-batch top-ks
    over non-matching labels). Filtering after a plain top-k would be
    WRONG at scale: a batch's k slots could all be burned on same-label
    rows, truncating away valid negatives.

    ``method="hof"``: cross-join + label-filter + window — the
    collect-free cross-check path, pinned identical in tests.
    Ties broken by corpus id; cos_sim left unrounded (callers round).
    """
    if method == "hof":
        joined = corpus.crossJoin(F.broadcast(queries))
        scored = joined.filter(F.col(label_col) != F.col(q_label_col)).select(
            F.col(q_id_col),
            F.col(id_col),
            F.col(label_col).alias("neg_label"),
            cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos_sim"),
        )
    else:
        from pyspark.sql.types import IntegralType

        spark = corpus.sparkSession
        _require_integral_ids(
            "hard_negatives", (corpus, id_col), (queries, q_id_col)
        )
        # validate the CORPUS label dtype at the operator boundary too —
        # otherwise non-integer labels sail into the mapInPandas
        # 'neg_label long' schema and die as an opaque Arrow conversion
        # error deep inside execution (the query side is value-checked
        # below after the collect)
        c_label_type = corpus.schema[label_col].dataType
        if not isinstance(c_label_type, IntegralType):
            raise TypeError(
                "hard_negatives(method='gemm') requires integer corpus "
                f"labels (column {label_col!r} is {c_label_type.simpleString()}); "
                "hash string labels to ids first, or pass method='hof'"
            )
        q_rows = queries.select(q_id_col, q_vec_col, q_label_col).collect()
        if any(r[2] is None for r in q_rows):
            raise TypeError(
                "hard_negatives(method='gemm'): NULL query labels — a "
                "NULL label matches nothing under the hof/oracle <> "
                "semantics; filter or impute labels first"
            )
        if not q_rows:
            return spark.createDataFrame(
                [],
                f"{q_id_col} long, {id_col} long, neg_label long, cos_sim double",
            )
        q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
        Qn = _np_norm_rows(np.array([r[1] for r in q_rows], dtype=np.float64))
        if not isinstance(q_rows[0][2], (int, np.integer)):
            # fail at the operator boundary with the contract, not deep
            # inside numpy: the gemm path (and its long output schema)
            # requires integer labels; the hof path accepts any type
            raise TypeError(
                "hard_negatives(method='gemm') requires integer labels "
                f"(got {type(q_rows[0][2]).__name__}); hash string labels "
                "to ids first, or pass method='hof'"
            )
        q_labels = np.array([r[2] for r in q_rows], dtype=np.int64)
        bq = spark.sparkContext.broadcast((q_ids, Qn, q_labels))

        def score(batches):
            qids, Q, qlab = bq.value
            for pdf in batches:
                # drop NULL-label corpus rows BEFORE scoring: Arrow
                # surfaces a nullable long as float64 NaN, and
                # NaN != qlab is True — an unlabeled row would be
                # served as a mined negative, where the hof path and
                # the DuckDB oracle (both using <>) exclude it
                pdf = pdf[pdf[label_col].notna()]
                if not len(pdf):
                    continue
                c_ids = pdf[id_col].to_numpy()
                # pre-sort by id so ONE stable argsort of -S down the
                # corpus axis is (cos desc, id asc) for every query at
                # once (the blocked_topk/brute_force_topk r10
                # vectorization); same-label rows are masked to -inf
                # per column and dropped after extraction — taking k
                # rows then filtering -inf equals the old per-query
                # kk=min(k, valid) slice exactly
                order = np.argsort(c_ids, kind="stable")
                c_ids = c_ids[order]
                C = _np_norm_rows(
                    np.array(list(pdf[vec_col]), dtype=np.float64)
                )[order]
                # post-notna the dtype can be float64 (Arrow nullable
                # long) — cast back so the 'neg_label long' schema and
                # the label comparison stay integral
                c_lab = pdf[label_col].to_numpy().astype(np.int64)[order]
                S = C @ Q.T
                masked = np.where(
                    c_lab[:, None] == qlab[None, :], -np.inf, S
                )
                kk = min(k, len(c_ids))
                top = np.argsort(-masked, axis=0, kind="stable")[:kk]
                rows = top.T.ravel()
                cols = np.repeat(np.arange(len(qids)), kk)
                sims = masked[rows, cols]
                keep = sims != -np.inf
                if keep.any():
                    yield pd.DataFrame(
                        {
                            q_id_col: np.repeat(qids, kk)[keep],
                            id_col: c_ids[rows][keep],
                            "neg_label": c_lab[rows][keep],
                            "cos_sim": sims[keep],
                        }
                    )

        scored = corpus.select(id_col, vec_col, label_col).mapInPandas(
            score,
            f"{q_id_col} long, {id_col} long, neg_label long, cos_sim double",
        )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )
