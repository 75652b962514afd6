"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane) variant as the scale path: brute force is O(Q·N) dot
products — fine when the query set is small or broadcastable; the LSH path
buckets both sides so the join only compares within-bucket candidates.

All math is built-in higher-order functions (zip_with/aggregate) evaluated
JVM-side in index order, so results are bit-deterministic and
engine-portable (the DuckDB oracle reproduces them exactly).

At 100 TB: the candidate side partitions by bucket; queries broadcast. For
real ANN recall targets, raise num_planes and probe multiple buckets
(multi-probe LSH) — plumbing identical, constants larger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ytsaurus_spark.operators import spread_scan

# Deterministic pseudo-random hyperplane coefficient for (plane h, dim d):
# integer formula, identical in any engine. Values in [-3, 3].
_COEF = "(((({h} + 1) * ({d} + 3)) % 7) - 3)"


def _dot(a: str, b: str) -> str:
    """Sequential-fold dot product of two array columns (SQL expr)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0D, (acc, v) -> acc + v)"
    )


# --- Arrow-vectorized pair kernels (guide §4.2) ------------------------------
#
# The per-pair dot/cosine above is a higher-order-function fold evaluated
# INTERPRETED per element (zip_with/aggregate lambdas do not enter
# whole-stage codegen), and the pair grid then carries every scored row
# through the rank window's shuffle. The kernel below moves pair scoring
# into ONE mapInArrow stage: candidates stream through as Arrow batches,
# the query side (small/broadcastable by these operators' contract — the
# fold path already collected it into a broadcast relation) rides the task
# closure, and the numpy accumulation is FOLD-ORDER-IDENTICAL to the SQL
# expression — vectorized across rows, sequential over dims, one IEEE
# multiply and one add per element in the same order — so every score is
# bit-identical to the fold (differential-tested in
# tests/test_fold_equivalence.py and strict-oracle-checked).
#
# Top-k consumers additionally emit only the BATCH-LOCAL top-k per query,
# under exactly the rank window's ordering (score desc with Spark's
# NaN-first / NULL-last semantics, candidate id asc on ties): the top-k of
# a union is the top-k of the per-batch top-k, so the window input shrinks
# from |q|x|candidates| rows to k rows per query per batch (§2.3 — shuffle
# decisions, not payloads). Exotic inputs the vectorized path cannot
# reproduce exactly (ragged/null query vectors, non-primitive id types,
# oversized query sets) fall back to the original fold plan, which remains
# the semantic reference.

_ARROW_QUERY_CAP = 65536  # closure-shipped queries; beyond this, fold path

_SAFE_ID_TYPES = (
    "tinyint", "smallint", "int", "bigint", "float", "double", "string"
)


def _np():
    import numpy as np

    return np


def _query_matrix(vecs):
    """(m, dim) float64 matrix from collected query vectors, or None when
    the set is ragged / null-bearing (fold fallback keeps exact
    semantics)."""
    np = _np()
    if any(v is None for v in vecs):
        return None
    dims = {len(v) for v in vecs}
    if len(dims) > 1:
        return None
    dim = dims.pop() if dims else 0
    if any(e is None for v in vecs for e in v):
        return None
    out = np.empty((len(vecs), dim), dtype=np.float64)
    for i, v in enumerate(vecs):
        out[i, :] = v
    return out


def _self_dots(M):
    """Per-row self dot, fold-order-identical to ``_dot(v, v)``."""
    np = _np()
    out = np.zeros(M.shape[0], dtype=np.float64)
    for d in range(M.shape[1]):
        out += M[:, d] * M[:, d]
    return out


def _plane_coefs(num_planes: int, dim: int):
    """(planes, dim) float64 matrix of the deterministic _COEF values."""
    np = _np()
    return np.array(
        [
            [float((((h + 1) * (d + 3)) % 7) - 3) for d in range(dim)]
            for h in range(num_planes)
        ],
        dtype=np.float64,
    )


def _bucket_strings(M, coefs):
    """LSH bucket per row of ``M`` — the numpy twin of ``_bucket_expr``:
    per plane, a sequential fold over dims of v[d]*coef, sign bit '1' iff
    the fold is >= 0 (NaN compares false, like the SQL CASE)."""
    np = _np()
    n = M.shape[0]
    planes, dim = coefs.shape
    bits = np.empty((n, planes), dtype="U1")
    for h in range(planes):
        acc = np.zeros(n, dtype=np.float64)
        row = coefs[h]
        for d in range(dim):
            acc += M[:, d] * row[d]
        bits[:, h] = np.where(acc >= 0, "1", "0")
    return np.array(["".join(r) for r in bits], dtype=object)


def _cell_argmin(M, cents):
    """Nearest-cell ids per row of ``M`` against the (cells asc) centroid
    matrix — the numpy twin of ``_cell_argmin_expr`` with no rounding:
    d2 folds sequentially over dims ((x-y)*(x-y) then add, same IEEE op
    order), argmin ties break to the smaller cell (np.argmin keeps the
    first index; columns are cell-ascending)."""
    np = _np()
    cell_ids, C = cents
    n = M.shape[0]
    D2 = np.empty((n, len(cell_ids)), dtype=np.float64)
    for j in range(len(cell_ids)):
        acc = np.zeros(n, dtype=np.float64)
        cv = C[j]
        for d in range(M.shape[1]):
            diff = M[:, d] - cv[d]
            acc += diff * diff
        D2[:, j] = acc
    return np.asarray(cell_ids)[np.argmin(D2, axis=1)]


def _decode_list_col(col, np):
    """(values_np, offsets, lens, row_null, elem_null) for a pyarrow
    ListArray — offsets absolute into the child values array."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = offs[1:] - offs[:-1]
    row_null = (
        ~np.asarray(col.is_valid()) if col.null_count else
        np.zeros(len(lens), dtype=bool)
    )
    vals = col.values
    elem_null = (
        ~np.asarray(vals.is_valid()) if vals.null_count else None
    )
    values = vals.to_numpy(zero_copy_only=False).astype(np.float64)
    return values, offs, lens, row_null, elem_null


def _rows_matrix(values, offs, lens, row_null, elem_null, dim, np):
    """(good_mask, C) — C holds the good rows' elements gathered to
    (n, dim); bad rows (null entry, length != dim, null element) keep
    zeros and are masked out by ``good_mask``."""
    n = len(lens)
    good = (lens == dim) & ~row_null
    C = np.zeros((n, dim), dtype=np.float64)
    if dim == 0 or not good.any():
        return good, C
    if good.all() and elem_null is None and offs[-1] - offs[0] == n * dim:
        return good, values[offs[0]: offs[0] + n * dim].reshape(n, dim)
    idx = offs[:-1][good][:, None] + np.arange(dim)[None, :]
    if elem_null is not None:
        bad = elem_null[idx].any(axis=1)
        if bad.any():
            g2 = good.copy()
            g2[np.flatnonzero(good)[bad]] = False
            good = g2
            idx = offs[:-1][good][:, None] + np.arange(dim)[None, :]
    C[good] = values[idx]
    return good, C


def _arrow_pair_scores(
    cand: DataFrame,
    q_rows: list,
    *,
    mode: str = "cosine",
    k: int | None = None,
    threshold: float | None = None,
    planes: int | None = None,
    plane_dim: int | None = None,
    centroids: list | None = None,
    q_cells: list | None = None,
) -> "DataFrame | None":
    """(q_id, c_id, score) pairs via one mapInArrow stage, or None when
    the vectorized path cannot reproduce the fold exactly.

    ``cand`` must be exactly (c_id, cv). ``q_rows`` = collected (q_id, qv)
    rows. Grouping: ``planes``/``plane_dim`` pairs only within equal LSH
    buckets (computed in-kernel for both sides); ``centroids`` (list of
    (cell, centv), unrounded-argmin IVF) pairs only within equal cells,
    with query cells from ``q_cells`` (parallel list of per-query cell
    lists). ``k``: batch-local top-k per query under the rank window's
    exact ordering; ``threshold``: keep score >= threshold (NULL/NaN
    drop, like the SQL filter)."""
    np = _np()
    from pyspark.sql import types as T

    id_dt = cand.schema[0].dataType
    if id_dt.simpleString() not in _SAFE_ID_TYPES:
        return None
    if len(q_rows) > _ARROW_QUERY_CAP:
        return None
    Q = _query_matrix([r[1] for r in q_rows])
    if Q is None:
        return None
    q_ids = [r[0] for r in q_rows]
    m, dim = Q.shape
    qq = _self_dots(Q) if mode == "cosine" else None

    # query-side groups: list of (group_key, [query slots]) — None = all
    if planes is not None:
        coefs = _plane_coefs(planes, plane_dim)
        if dim < plane_dim:
            return None  # out-of-range plane dots go NULL in SQL; fold path
        qbuckets = _bucket_strings(Q, coefs)
        groups: dict = {}
        for j, b in enumerate(qbuckets):
            groups.setdefault(b, []).append(j)
    elif centroids is not None:
        cells = sorted(int(c) for c, _ in centroids)
        cmat = {int(c): np.asarray(v, dtype=np.float64) for c, v in centroids}
        if any(len(v) != dim for v in cmat.values()) or any(
            e is None for _, v in centroids for e in v
        ):
            return None
        cents = (cells, [cmat[c] for c in cells])
        groups = {}
        for j, qc in enumerate(q_cells):
            for cell in qc:
                groups.setdefault(int(cell), []).append(j)
    else:
        coefs = cents = None
        groups = {None: list(range(m))}

    schema = T.StructType(
        [
            T.StructField("q_id", id_dt),
            T.StructField("c_id", id_dt),
            T.StructField("score", T.DoubleType()),
        ]
    )
    chunk_rows = max(1, (1 << 22) // max(1, m))

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if n == 0 or not groups:
                continue
            ids_pa = batch.column(0)
            try:
                ids = ids_pa.to_numpy(zero_copy_only=False)
            except Exception:
                ids = np.asarray(ids_pa.to_pylist(), dtype=object)
            values, offs, lens, row_null, elem_null = _decode_list_col(
                batch.column(1), np
            )
            good, C = _rows_matrix(
                values, offs, lens, row_null, elem_null, dim, np
            )
            if centroids is not None:
                # bucket rows by nearest cell; rows the fold cannot score
                # deterministically (wrong length/null) keep the smallest
                # cell (they pair to NULL scores either way)
                cand_grp = np.full(n, cents[0][0] if cents[0] else -1)
                if good.any():
                    cand_grp[good] = _cell_argmin(C[good], cents)
            elif planes is not None:
                # bucket over the first plane_dim dims; rows shorter than
                # plane_dim (or null-bearing there) fold to all-'0' bits
                bgood = (lens >= plane_dim) & ~row_null
                if elem_null is not None and bgood.any():
                    bidx = offs[:-1][bgood][:, None] + np.arange(plane_dim)[None, :]
                    bbad = elem_null[bidx].any(axis=1)
                    t = bgood.copy()
                    t[np.flatnonzero(bgood)[bbad]] = False
                    bgood = t
                cand_grp = np.full(n, "0" * planes, dtype=object)
                if bgood.any():
                    bidx = offs[:-1][bgood][:, None] + np.arange(plane_dim)[None, :]
                    cand_grp[bgood] = _bucket_strings(values[bidx], coefs)
            else:
                cand_grp = None
            if mode == "cosine":
                cc = np.zeros(n, dtype=np.float64)
                if good.any():
                    cc[good] = _self_dots(C[good])
            out_rows: list = []
            out_qids: list = []
            out_scores: list = []
            out_null: list = []
            for gkey, slots in groups.items():
                if cand_grp is None:
                    rows_g = np.arange(n)
                else:
                    rows_g = np.flatnonzero(cand_grp == gkey)
                if rows_g.size == 0:
                    continue
                for lo in range(0, rows_g.size, chunk_rows):
                    rows_c = rows_g[lo: lo + chunk_rows]
                    nc = rows_c.size
                    Cc = C[rows_c]
                    goodc = good[rows_c]
                    acc = np.zeros((nc, len(slots)), dtype=np.float64)
                    for si, j in enumerate(slots):
                        a = np.zeros(nc, dtype=np.float64)
                        qv = Q[j]
                        for d in range(dim):
                            a += Cc[:, d] * qv[d]
                        acc[:, si] = a
                    if mode == "cosine":
                        den = np.sqrt(
                            cc[rows_c][:, None] * qq[np.asarray(slots)][None, :]
                        )
                        with np.errstate(divide="ignore", invalid="ignore"):
                            score = acc / den
                        isnull = ~goodc[:, None] | (den == 0)
                    else:
                        score = acc
                        isnull = ~goodc[:, None] & np.ones(
                            (nc, len(slots)), dtype=bool
                        )
                    key = np.where(np.isnan(score), np.inf, score)
                    key = np.where(isnull, -np.inf, key)
                    ids_c = ids[rows_c]
                    for si, j in enumerate(slots):
                        sel = ids_c != q_ids[j]
                        if threshold is not None:
                            sel &= ~isnull[:, si] & (score[:, si] >= threshold)
                            keep = np.flatnonzero(sel)
                        elif k is not None:
                            kcol = np.where(sel, key[:, si], -np.inf)
                            order = np.lexsort((ids_c, -kcol))
                            keep = [
                                i for i in order[: k + 1] if sel[i]
                            ][:k]
                        else:
                            keep = np.flatnonzero(sel)
                        for i in keep:
                            out_rows.append(int(rows_c[i]))
                            out_qids.append(q_ids[j])
                            out_scores.append(float(score[i, si]))
                            out_null.append(bool(isnull[i, si]))
            if not out_rows:
                continue
            c_arr = ids_pa.take(pa.array(out_rows, type=pa.int64()))
            q_arr = pa.array(out_qids, type=ids_pa.type)
            s_np = np.asarray(out_scores, dtype=np.float64)
            s_arr = pa.array(
                np.where(out_null, np.nan, s_np),
                type=pa.float64(),
                mask=np.asarray(out_null, dtype=bool),
            )
            yield pa.RecordBatch.from_arrays(
                [q_arr, c_arr, s_arr], names=["q_id", "c_id", "score"]
            )

    return cand.mapInArrow(fn, schema)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries`` (small) is broadcast; candidates never shuffle. Returns
    (q_id, c_id, cosine, rank) with rank 1..k, ties broken by c_id.

    The pair scoring runs as an Arrow kernel (``_arrow_pair_scores``):
    candidates stream through mapInArrow, the collected query set rides
    the closure (the fold path collected it into a broadcast relation
    anyway), scores come from the fold-order-identical numpy loop, and
    only each batch's local top-k per query reaches the rank window.
    Exotic query shapes fall back to the HOF-fold broadcast-join plan,
    which remains the semantic reference."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    cand = emb.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"))
    scored = _arrow_pair_scores(cand, q.collect(), mode="cosine", k=k)
    if scored is not None:
        scored = scored.withColumnRenamed("score", "cosine")
    else:
        qn = q.withColumn("_qq", F.expr(_dot("qv", "qv")))
        c = spread_scan(cand).withColumn("_cc", F.expr(_dot("cv", "cv")))
        scored = (
            c.join(F.broadcast(qn))
            .filter(F.col("q_id") != F.col("c_id"))
            .withColumn(
                "cosine",
                F.expr(f"{_dot('qv', 'cv')} / sqrt(_qq * _cc)"),
            )
        )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "c_id",
            F.round("cosine", 4).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _bucket_expr(num_planes: int, dim: int, vec_col: str) -> str:
    """SQL expression for the random-hyperplane LSH bucket of ``vec_col``."""
    bits = []
    for h in range(num_planes):
        dot = (
            f"aggregate(sequence(0, {dim - 1}), 0D, (acc, d) -> "
            f"acc + CAST({vec_col}[d] AS DOUBLE) * CAST({_COEF.format(h=h, d='d')} AS DOUBLE))"
        )
        bits.append(f"CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END")
    return "concat(" + ", ".join(bits) + ")"


def lsh_bucket(
    emb: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: one sign bit per plane.

    Hyperplane coefficients come from the deterministic integer formula, so
    bucketing is reproducible everywhere. Output: (vec_id, bucket)."""
    return emb.select(
        F.col(id_col), F.expr(_bucket_expr(num_planes, dim, vec_col)).alias("bucket")
    )


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    The equi-join on bucket replaces the full cross join — the scale path.
    Recall < 1 by construction; raise planes/probes for tighter recall.

    Pair scoring AND the bucket sign-bit folds run as one Arrow kernel
    (``_arrow_pair_scores`` with ``planes``): both were interpreted HOF
    folds, and the kernel pairs each candidate batch only against the
    collected queries sharing its bucket, emitting the batch-local top-k.
    Exotic query shapes fall back to the fold plan below."""
    from pyspark.sql import Window as W

    q_rows = (
        emb.join(queries.select(id_col), id_col, "left_semi")
        .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
        .collect()
    )
    cand = emb.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"))
    scored = _arrow_pair_scores(
        cand, q_rows, mode="cosine", k=k, planes=num_planes, plane_dim=dim
    )
    if scored is not None:
        w = W.partitionBy("q_id").orderBy(
            F.col("cosine").desc(), F.col("c_id")
        )
        return (
            scored.withColumnRenamed("score", "cosine")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "q_id",
                "c_id",
                F.round("cosine", 4).alias("cosine"),
                F.col("rank").cast("int").alias("rank"),
            )
        )
    # bucket + self-norm attach as scan-stage projections (the former
    # emb ⋈ lsh_bucket(emb) id-self-join re-derived the same rows through
    # a join for nothing); per-pair work is then ONE fold, not three.
    with_b = spread_scan(emb).withColumn(
        "bucket", F.expr(_bucket_expr(num_planes, dim, vec_col))
    )
    q = with_b.join(queries.select(id_col), id_col, "left_semi").select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        F.col("bucket"),
    ).withColumn("_qq", F.expr(_dot("qv", "qv")))
    c = with_b.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"), "bucket"
    ).withColumn("_cc", F.expr(_dot("cv", "cv")))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "cosine",
            F.expr(f"{_dot('qv', 'cv')} / sqrt(_qq * _cc)"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "c_id",
            F.round("cosine", 4).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _lloyd_refine(
    vecs: DataFrame,
    centroids: DataFrame,
    iterations: int,
    id_col: str,
    cent_col: str = "centv",
    dist_round: int = 6,
) -> DataFrame:
    """``iterations`` Lloyd steps over (cell, centv) centroids — the
    k-means refinement that turns exemplar seeds into trained centroids
    (re-training an IVF index). Same declarative shape as
    ``kmeans_iterations``: broadcast centroids, rounded-distance argmin
    (engine-deterministic), posexplode element-wise means; no driver-side
    data. ``vecs`` must be (id, v) with v array<double>."""
    from pyspark.sql import Window as W

    for _ in range(iterations):
        # scan-stage argmin fold over the broadcast centroid array — same
        # rounded-d2/cell-tiebreak selection as the former per-vector
        # window, without the vec × cells explode + exchange + sort
        assign = _with_cell(
            vecs,
            centroids.select("cell", F.col(cent_col).alias("centv")),
            "v",
            round_digits=dist_round,
        ).select(id_col, "cell")
        flat = vecs.join(assign, id_col).select(
            "cell", F.posexplode("v").alias("i", "e")
        )
        centroids = (
            flat.groupBy("cell", "i")
            .agg(F.avg("e").alias("m"))
            .groupBy("cell")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(i, m))), x -> x.m)"
                ).alias(cent_col)
            )
        )
    return centroids


def ivf_assign(
    emb: DataFrame,
    num_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_stride: int | None = None,
    total_rows: int | None = None,
    refine_iterations: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """IVF (inverted-file) cell assignment — the other standard ANN scale
    path next to LSH: pick exemplar centroids, assign every vector to its
    nearest, search only within probed cells.

    Centroids seed as deterministic exemplars (every ``stride``-th vector
    by id) — reproducible everywhere; ``refine_iterations > 0`` then runs
    that many Lloyd steps over the corpus (``_lloyd_refine``), the k-means
    index training that tightens cells around the real data distribution
    (measured recall uplift in SCALE.md). The refined path rounds
    distances before every argmin so assignments stay engine-
    deterministic and oracle-checkable. Returns (assignments, centroids)
    where assignments = (vec_id, cell) and centroids = (cell, centv).

    ``centroid_stride`` must be known up front — pass it, or pass
    ``total_rows`` (cheap from parquet footers: ``Catalog.row_count``) to
    derive it. No driver-side ``count()`` scan happens here: index builds
    at 100 TB must not pay an extra full pass just to size the centroid set.
    """
    from pyspark.sql import Window as W

    if centroid_stride is None:
        if total_rows is None:
            raise ValueError(
                "pass centroid_stride, or total_rows "
                "(Catalog.row_count(name) reads it from parquet footers)"
            )
        centroid_stride = max(1, total_rows // num_cells)
    # deterministic centroid set: ids {0, stride, 2*stride, ...} — no
    # order-dependent limit(), so any engine picks the identical exemplars
    centroids = emb.filter(
        (F.col(id_col) % centroid_stride == 0)
        & (F.col(id_col) < centroid_stride * num_cells)
    ).select(
        (F.col(id_col) / centroid_stride).cast("int").alias("cell"),
        F.col(vec_col).alias("centv"),
    )
    if refine_iterations > 0:
        vecs = emb.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
        )
        centroids = _lloyd_refine(
            vecs,
            centroids.withColumn("centv", F.col("centv").cast("array<double>")),
            refine_iterations,
            id_col,
        )
        dist = (
            "round(aggregate(zip_with(v, centv, (x, y) -> "
            "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
            "0D, (acc, d) -> acc + d), 6)"
        )
    else:
        dist = (
            "aggregate(zip_with(v, centv, (x, y) -> "
            "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
            "0D, (acc, d) -> acc + d)"
        )
    assignments = ivf_assign_to(emb, centroids, id_col, vec_col, dist)
    return assignments, centroids


def _cell_argmin_expr(round_digits: int | None) -> str:
    """Nearest-cell expression over a collected ``__cents`` array column:
    per-row fold argmin (d2 asc, cell-id tiebreak) — identical selection to
    a row_number()-over-(d2, cell) window, without exploding vec × cells
    rows through an exchange + sort. ``round_digits`` mirrors the
    refined/k-means paths' distance rounding (engine determinism)."""
    d2 = (
        "aggregate(zip_with(__v, __c.centv, (x, y) -> "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "0D, (acc, d) -> acc + d)"
    )
    if round_digits is not None:
        d2 = f"round({d2}, {round_digits})"
    pairs = f"transform(__cents, __c -> named_struct('cell', __c.cell, 'd2', {d2}))"
    return (
        f"aggregate({pairs}, CAST(NULL AS struct<cell:int,d2:double>), "
        "(acc, p) -> CASE WHEN acc IS NULL OR p.d2 < acc.d2 "
        "OR (p.d2 = acc.d2 AND p.cell < acc.cell) THEN p ELSE acc END).cell"
    )


def _with_cell(
    vecs: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    round_digits: int | None,
) -> DataFrame:
    """``vecs`` + a ``cell`` column (nearest centroid), computed in the
    scan stage against the broadcast collected centroid array."""
    cents = centroids.agg(
        F.collect_list(
            F.struct(F.col("cell").cast("int").alias("cell"), F.col("centv"))
        ).alias("__cents")
    )
    return (
        vecs.withColumn("__v", F.col(vec_col))
        .crossJoin(F.broadcast(cents))
        .withColumn("cell", F.expr(_cell_argmin_expr(round_digits)))
        .drop("__cents", "__v")
    )


def ivf_assign_to(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_expr: str | None = None,
) -> DataFrame:
    """Assign vectors to their nearest cell among EXISTING centroids —
    the incremental half of the IVF index: a continuously-ingesting
    pipeline persists (cell, centv) once and routes every new embedding
    batch through this, never re-deriving (let alone re-training) the
    index from the corpus. O(batch × num_cells) scan-stage math with the
    centroids broadcast; appending the assignments to the corpus's
    (vec_id, cell) table keeps ivf_topk serving the grown index.
    Deterministic: squared-L2 argmin with cell-id tiebreak, same formula
    at build and ingest time. (``dist_expr`` is honored only for its
    rounding mode — the argmin itself now folds over the broadcast
    centroid array in the scan stage instead of windowing an exploded
    vec × cells grid.)"""
    rounded = dist_expr is not None and dist_expr.lstrip().startswith("round(")
    return _with_cell(
        vecs.select(F.col(id_col), F.col(vec_col)), centroids, vec_col,
        6 if rounded else None,
    ).select(id_col, "cell")


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    num_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_stride: int | None = None,
    total_rows: int | None = None,
    nprobe: int = 1,
    refine_iterations: int = 0,
) -> DataFrame:
    """Approximate top-k within the query's ``nprobe`` nearest IVF cells.

    The equi-join on cell replaces the cross join; ``nprobe > 1`` probes
    the n nearest cells per query — same plan shape, ×nprobe candidate
    rows, the standard IVF recall/cost dial. Candidates live in exactly
    one cell, so probing distinct cells never duplicates a pair.
    ``refine_iterations`` trains the cells with that many Lloyd steps
    before assignment (see ``ivf_assign``) — the recall dial that costs
    index-build time instead of query candidates."""
    from pyspark.sql import Window as W

    _assignments, centroids = ivf_assign(
        emb, num_cells, id_col, vec_col, centroid_stride, total_rows,
        refine_iterations=refine_iterations,
    )
    if refine_iterations == 0:
        # Arrow kernel path: centroids and queries are collected (both
        # bounded — cells by num_cells, queries by the broadcast
        # contract), the candidate cell argmin AND the pair cosine run as
        # the fold-order-identical numpy loops inside one mapInArrow
        # stage, and only batch-local top-k rows reach the rank window.
        # The refined path keeps the JVM plan: its distances round with
        # Spark's HALF_UP round(), which numpy does not reproduce.
        cent_rows = [
            (r[0], list(r[1])) for r in centroids.select("cell", "centv").collect()
        ]
        q_rows = [
            (r[0], r[1])
            for r in emb.join(queries.select(id_col), id_col, "left_semi")
            .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
            .collect()
        ]
        Qm = _query_matrix([r[1] for r in q_rows])
        cents_ok = cent_rows and not any(
            v is None or any(e is None for e in v) for _, v in cent_rows
        )
        if Qm is not None and cents_ok and (
            not cent_rows or all(len(v) == Qm.shape[1] for _, v in cent_rows)
        ):
            np = _np()
            cells_sorted = sorted(int(c) for c, _ in cent_rows)
            cmat = {int(c): np.asarray(v, dtype=np.float64) for c, v in cent_rows}
            D2 = np.empty((len(q_rows), len(cells_sorted)), dtype=np.float64)
            for j, cell in enumerate(cells_sorted):
                cv = cmat[cell]
                acc = np.zeros(len(q_rows), dtype=np.float64)
                for d in range(Qm.shape[1]):
                    diff = Qm[:, d] - cv[d]
                    acc += diff * diff
                D2[:, j] = acc
            q_cells = [
                [
                    cells_sorted[j]
                    for j in sorted(
                        range(len(cells_sorted)),
                        key=lambda j: (D2[i, j], cells_sorted[j]),
                    )[: max(1, nprobe)]
                ]
                for i in range(len(q_rows))
            ]
            cand = emb.select(
                F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv")
            )
            scored = _arrow_pair_scores(
                cand, q_rows, mode="cosine", k=k,
                centroids=cent_rows, q_cells=q_cells,
            )
            if scored is not None:
                w = W.partitionBy("q_id").orderBy(
                    F.col("cosine").desc(), F.col("c_id")
                )
                return (
                    scored.withColumnRenamed("score", "cosine")
                    .withColumn("rank", F.row_number().over(w))
                    .filter(F.col("rank") <= k)
                    .select(
                        "q_id",
                        "c_id",
                        F.round("cosine", 4).alias("cosine"),
                        F.col("rank").cast("int").alias("rank"),
                    )
                )
    # attach the cell as a scan-stage fold against the broadcast centroid
    # array — the former emb ⋈ assignments id-self-join re-derived the same
    # rows through a join (and the assignment itself through a window)
    with_cell = _with_cell(
        spread_scan(emb), centroids, vec_col,
        round_digits=6 if refine_iterations > 0 else None,
    )
    if nprobe <= 1:
        q = with_cell.join(queries.select(id_col), id_col, "left_semi").select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"), "cell"
        )
    else:
        # probe the nprobe nearest centroids per query vector
        qv = emb.join(queries.select(id_col), id_col, "left_semi").select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
        )
        d2 = (
            "aggregate(zip_with(qv, centv, (x, y) -> "
            "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
            "0D, (acc, d) -> acc + d)"
        )
        if refine_iterations > 0:
            d2 = f"round({d2}, 6)"
        wq = W.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col("cell"))
        q = (
            qv.join(F.broadcast(centroids))
            .withColumn("d2", F.expr(d2))
            .withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= nprobe)
            .select("q_id", "qv", "cell")
        )
    c = with_cell.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"), "cell"
    ).withColumn("_cc", F.expr(_dot("cv", "cv")))
    scored = (
        c.join(F.broadcast(q.withColumn("_qq", F.expr(_dot("qv", "qv")))), "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "cosine",
            # self-norms pre-folded per vector (bit-identical to folding
            # them inside the pair row; 3 HOF folds per pair → 1)
            F.expr(f"{_dot('qv', 'cv')} / sqrt(_qq * _cc)"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "c_id",
            F.round("cosine", 4).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def kmeans_iterations(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_stride: int = 30,
    dist_round: int = 6,
) -> DataFrame:
    """K-means with a fixed iteration budget as chained declarative plans —
    the iterative-algorithm pattern (YQL expresses these as chained
    MapReduce ops; Spark as a loop of joins/aggregations, one plan per
    Lloyd step, no driver-side data).

    Deterministic end to end: exemplar init (ids 0, stride, 2·stride…),
    squared distances rounded to ``dist_round`` before argmin so engine-
    level last-ulp noise cannot flip assignments. Returns the final
    (vec_id, cell) assignment.
    """
    from pyspark.sql import Window as W

    vecs = spread_scan(
        emb.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
        )
    )
    centroids = vecs.filter(
        (F.col(id_col) % centroid_stride == 0)
        & (F.col(id_col) < centroid_stride * k)
    ).select(
        (F.col(id_col) / centroid_stride).cast("int").alias("cell"),
        F.col("v").alias("cv"),
    )
    assign = None
    for _ in range(iterations):
        # scan-stage argmin fold (see _cell_argmin_expr): same rounded-d2 /
        # cell-tiebreak selection as the former window, no N×k explode
        assign = _with_cell(
            vecs,
            centroids.select("cell", F.col("cv").alias("centv")),
            "v",
            round_digits=dist_round,
        ).select(id_col, "cell")
        # recompute centroids: element-wise mean per cell (posexplode keyed
        # on (cell, dim) — the scalable wide-vector shape)
        flat = vecs.join(assign, id_col).select(
            "cell", F.posexplode("v").alias("i", "e")
        )
        centroids = (
            flat.groupBy("cell", "i")
            .agg(F.avg("e").alias("m"))
            .groupBy("cell")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(i, m))), x -> x.m)"
                ).alias("cv")
            )
        )
    # NOT checkpointed: measured at bench scale, an eager cut here made
    # SemDeDup ~1.7x slower — the bounded 2-3 step chain re-derives
    # cheaply and the lazy form lets consumers share exchange reuse
    return assign


def ann_topk_lsh_multiprobe(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH ANN: each query also probes every bucket at Hamming
    distance 1 (flip one sign bit) — the standard recall lever when buckets
    are too fine. Candidate volume grows ×(planes+1); plan shape unchanged
    (still one equi-join on bucket). Measured here: recall@3 jumps 6.7% → 16%
    on isotropic random vectors at sf0.01 (see SCALE.md)."""
    from pyspark.sql import Window as W

    with_b = spread_scan(emb).withColumn(
        "bucket", F.expr(_bucket_expr(num_planes, dim, vec_col))
    )
    flips = ", ".join(
        f"concat(substr(bucket, 1, {i}), "
        f"CASE WHEN substr(bucket, {i + 1}, 1) = '1' THEN '0' ELSE '1' END, "
        f"substr(bucket, {i + 2}))"
        for i in range(num_planes)
    )
    q = (
        with_b.join(queries.select(id_col), id_col, "left_semi")
        .select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("qv"),
            F.explode(F.expr(f"array(bucket, {flips})")).alias("bucket"),
        )
    )
    c = with_b.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"), "bucket"
    ).withColumn("_cc", F.expr(_dot("cv", "cv")))
    scored = (
        c.join(F.broadcast(q.withColumn("_qq", F.expr(_dot("qv", "qv")))), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .dropDuplicates(["q_id", "c_id"])
        .withColumn(
            "cosine",
            # self-norms pre-folded per vector (bit-identical; 3 folds → 1)
            F.expr(f"{_dot('qv', 'cv')} / sqrt(_qq * _cc)"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "c_id",
            F.round("cosine", 4).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --- product quantization (IVF-PQ style ADC scan) --------------------------

def pq_codebook(
    emb: DataFrame,
    m: int,
    ksub: int,
    dim: int,
    stride: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iterations: int = 0,
) -> DataFrame:
    """Per-subspace PQ codebooks from deterministic exemplar vectors.

    Vector space splits into ``m`` subspaces of ``dim/m`` dims; subspace
    codebook entry ``c`` seeds as the corresponding slice of exemplar
    vector ``c*stride`` — reproducible on any engine/cluster (same policy
    as ``ivf_assign`` exemplars). ``refine_iterations > 0`` then runs
    per-subspace Lloyd steps over the corpus slices (all m subspaces
    train in ONE plan — the argmin window partitions on (id, sub), the
    mean groupBy on (sub, code, dim)), with rounded distances so the
    trained codebook is engine-deterministic. Returns (sub, code,
    cbslice)."""
    from pyspark.sql import Window as W

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    cb = emb.filter(
        (F.col(id_col) % stride == 0) & (F.col(id_col) < stride * ksub)
    ).select(
        (F.col(id_col) / stride).cast("int").alias("code"),
        F.col(vec_col).alias("cbv"),
    )
    codebook = cb.select(
        "code",
        "cbv",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
    ).select(
        "sub",
        "code",
        F.expr(f"slice(cbv, sub * {dsub} + 1, {dsub})").alias("cbslice"),
    )
    if refine_iterations <= 0:
        return codebook
    codebook = codebook.withColumn(
        "cbslice", F.col("cbslice").cast("array<double>")
    )
    vslices = emb.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).select(
        id_col,
        "sub",
        F.expr(f"slice(v, sub * {dsub} + 1, {dsub})").alias("vslice"),
    )
    d2 = (
        "round(aggregate(zip_with(vslice, cbslice, (x, y) -> "
        "(x - y) * (x - y)), 0D, (acc, d) -> acc + d), 6)"
    )
    w = W.partitionBy(id_col, "sub").orderBy(F.col("d2").asc(), F.col("code"))
    for _ in range(refine_iterations):
        assign = (
            vslices.join(F.broadcast(codebook), "sub")
            .withColumn("d2", F.expr(d2))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(id_col, "sub", "code")
        )
        flat = vslices.join(assign, [id_col, "sub"]).select(
            "sub", "code", F.posexplode("vslice").alias("i", "e")
        )
        codebook = (
            flat.groupBy("sub", "code", "i")
            .agg(F.avg("e").alias("m"))
            .groupBy("sub", "code")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(i, m))), x -> x.m)"
                ).alias("cbslice")
            )
        )
    return codebook


_SLICE_D2 = (
    "aggregate(zip_with(vslice, cbslice, (x, y) -> "
    "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
    "0D, (acc, d) -> acc + d)"
)


def _subspace_dists(
    vecs: DataFrame, codebook: DataFrame, m: int, dsub: int,
    id_col: str, vec_col: str,
) -> DataFrame:
    """(id, sub, code, d2): squared L2 between each vector's subspace
    slice and every codebook entry — codebook broadcast, no pairwise
    vector join."""
    vs = vecs.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col(vec_col).alias("v"),
    ).select(
        id_col, "sub", F.expr(f"slice(v, sub * {dsub} + 1, {dsub})").alias("vslice")
    )
    return vs.join(F.broadcast(codebook), "sub").select(
        id_col, "sub", "code", F.expr(_SLICE_D2).alias("d2")
    )


def pq_encode(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 8,
    dim: int = 64,
    stride: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iterations: int = 0,
) -> DataFrame:
    """PQ codes in long form: (id, sub, code) — each vector compresses to
    ``m`` small ints (the 100 TB point of PQ: the searchable index is
    ~m bytes/vector instead of dim*4). One broadcast join + one argmin
    window over m*ksub narrow rows per vector; no Python, no pairwise."""
    from pyspark.sql import Window as W

    cb = pq_codebook(
        emb, m, ksub, dim, stride, id_col, vec_col,
        refine_iterations=refine_iterations,
    )
    scored = _subspace_dists(emb, cb, m, dim // m, id_col, vec_col)
    w = W.partitionBy(id_col, "sub").orderBy(F.col("d2").asc(), F.col("code"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "sub", "code")
    )


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    m: int = 4,
    ksub: int = 8,
    dim: int = 64,
    stride: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iterations: int = 0,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes.

    Per query, the distance TABLE (m × ksub subspace distances) is tiny
    and broadcasts; approximate distance to a candidate = sum of the m
    table entries its codes select. Candidates are scanned as compressed
    codes — full vectors never join queries — so the heavy side moves
    ~m ints per row through one (sub, code) equi-join + one sum, the PQ
    scan shape that holds at 100 TB. Returns (q_id, c_id, adc, rank)."""
    from pyspark.sql import Window as W

    cb = pq_codebook(
        emb, m, ksub, dim, stride, id_col, vec_col,
        refine_iterations=refine_iterations,
    )
    codes = pq_encode(
        emb, m, ksub, dim, stride, id_col, vec_col,
        refine_iterations=refine_iterations,
    )
    qvecs = emb.join(queries.select(id_col), id_col, "left_semi")
    dtab = _subspace_dists(qvecs, cb, m, dim // m, id_col, vec_col).select(
        F.col(id_col).alias("q_id"), "sub", "code", "d2"
    )
    adc = (
        codes.withColumnRenamed(id_col, "c_id")
        .join(F.broadcast(dtab), ["sub", "code"])
        .filter(F.col("c_id") != F.col("q_id"))
        .groupBy("q_id", "c_id")
        .agg(F.round(F.sum("d2"), 4).alias("adc"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("c_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "adc", "rank")
    )


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    num_cells: int = 16,
    centroid_stride: int = 30,
    m: int = 4,
    ksub: int = 8,
    dim: int = 64,
    pq_stride: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the ADC code scan restricted to the query's IVF cell — the
    standard billion-scale ANN index (inverted file prunes the candidate
    set, product quantization compresses what remains). Cost per query =
    |cell| code rows summed over m table lookups; neither full vectors nor
    out-of-cell candidates move. Returns (q_id, c_id, adc, rank)."""
    from pyspark.sql import Window as W

    assignments, _cents = ivf_assign(
        emb, num_cells, id_col, vec_col, centroid_stride
    )
    cb = pq_codebook(emb, m, ksub, dim, pq_stride, id_col, vec_col)
    codes = pq_encode(emb, m, ksub, dim, pq_stride, id_col, vec_col)
    cand = codes.join(assignments, id_col).withColumnRenamed(id_col, "c_id")
    qvecs = emb.join(queries.select(id_col), id_col, "left_semi")
    dtab = (
        _subspace_dists(qvecs, cb, m, dim // m, id_col, vec_col)
        .join(assignments, id_col)  # the query's own cell
        .select(F.col(id_col).alias("q_id"), "cell", "sub", "code", "d2")
    )
    adc = (
        cand.join(F.broadcast(dtab), ["cell", "sub", "code"])
        .filter(F.col("c_id") != F.col("q_id"))
        .groupBy("q_id", "c_id")
        .agg(F.round(F.sum("d2"), 4).alias("adc"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("c_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "adc", "rank")
    )


def range_search(
    emb: DataFrame,
    queries: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Radius (range) similarity search: ALL candidates within a cosine
    threshold of each query — the fixed-radius complement of
    :func:`cosine_topk` (dedup wants "everything closer than r", not a
    fixed k). Queries broadcast, candidates stream through the scan
    stage with a codegen'd HOF dot product; no window, no shuffle of the
    candidate side. The threshold compares the UNROUNDED cosine — both
    engines fold the arrays in the same order, so the cut is exact (the
    Arrow kernel applies the identical >= comparison to the identical
    fold value inside the batch, so only passing pairs are emitted)."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"))
    scored = _arrow_pair_scores(
        c, q.collect(), mode="cosine", threshold=threshold
    )
    if scored is not None:
        return scored.select(
            "q_id", "c_id", F.round("score", 4).alias("cosine")
        )
    qn = q.withColumn("_qq", F.expr(_dot("qv", "qv")))
    cn = c.withColumn("_cc", F.expr(_dot("cv", "cv")))
    return (
        cn.join(F.broadcast(qn))
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "cosine",
            # self-norms pre-folded per vector (bit-identical; 3 folds → 1)
            F.expr(f"{_dot('qv', 'cv')} / sqrt(_qq * _cc)"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("q_id", "c_id", F.round("cosine", 4).alias("cosine"))
    )


def scalar_quantize_int8(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension int8 scalar quantization of an embedding column —
    the standard 4x index-compression step in front of ANN serving
    (FAISS ``SQ8``): train per-dimension (min, max) over the corpus,
    code each element as ``floor((x - lo) * 255 / (hi - lo) + 0.5)``,
    and report per-vector reconstruction fidelity.

    Outputs one row per vector: ``code_md5`` (checksum of the
    dim-ordered code string — the persistable compressed code),
    ``max_abs_err_1e9`` (worst reconstruction error in 1e-9 units, an
    exact integer), and ``n_dims``. All math is straight-line IEEE
    double with identical association in the DuckDB oracle, and the two
    lossy steps (code, error) go through the half-up-floor integer
    discipline — bit-identical across engines.

    Shape at 100 TB: posexplode to element grain, a D-row stats agg
    broadcast back, one doc-grain re-agg. The element shuffle is the
    same grain the IVF/PQ trainers already use."""
    x = F.col("x").cast("double")
    elems = vectors.select(
        F.col(id_col), F.posexplode(vec_col).alias("dim", "x")
    )
    stats = elems.groupBy("dim").agg(
        F.min(x).alias("lo"), F.max(x).alias("hi")
    )
    j = elems.join(F.broadcast(stats), "dim")
    q = F.floor((x - F.col("lo")) * 255 / (F.col("hi") - F.col("lo")) + 0.5).cast(
        "long"
    )
    xhat = F.col("lo") + F.col("q") * (F.col("hi") - F.col("lo")) / 255
    err = F.floor(F.abs(xhat - x) * 1e9 + 0.5).cast("long")
    coded = j.withColumn("q", q).withColumn("err", err)
    return (
        coded.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dims"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.expr("transform(array_sort(collect_list(struct(dim, q))), s -> CAST(s.q AS STRING))"),
                )
            ).alias("code_md5"),
            F.max("err").alias("max_abs_err_1e9"),
        )
    )


def knn_classify(
    vectors: DataFrame,
    k: int = 5,
    query_mod: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote classification with a deterministic hold-out
    split: vectors whose id ≡ 0 (mod ``query_mod``) are the evaluation
    queries, the rest the labeled corpus. Each query takes its ``k``
    nearest corpus neighbors by exact cosine and predicts the majority
    label (ties: more votes first, then smaller label) — the standard
    embedding-quality probe run after any embedding/quantization change.

    Scale shape is ``cosine_topk``'s: the query slice broadcasts, the
    corpus never shuffles for scoring, and the vote is a tiny
    (queries × k)-row aggregation. Returns one row per query:
    (q_id, true_label, pred_label, votes, correct)."""
    from pyspark.sql import Window as W

    queries = vectors.filter(F.col(id_col) % query_mod == 0)
    corpus = vectors.filter(F.col(id_col) % query_mod != 0)
    topk = cosine_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)
    votes = (
        topk.join(
            corpus.select(
                F.col(id_col).alias("c_id"), F.col(label_col).alias("nb_label")
            ),
            "c_id",
        )
        .groupBy("q_id", "nb_label")
        .agg(F.count(F.lit(1)).cast("long").alias("votes"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("votes").desc(), F.col("nb_label"))
    pred = votes.withColumn("__pr", F.row_number().over(w)).where(
        F.col("__pr") == 1
    )
    truth = queries.select(
        F.col(id_col).alias("q_id"), F.col(label_col).alias("true_label")
    )
    return pred.join(truth, "q_id").select(
        "q_id",
        "true_label",
        F.col("nb_label").alias("pred_label"),
        "votes",
        (F.col("nb_label") == F.col("true_label")).alias("correct"),
    )


def mips_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by MAXIMUM INNER PRODUCT (un-normalized dot) — the
    recommendation / reward-model scoring mode, distinct from cosine:
    a long vector can outrank a better-aligned short one.

    Scale path (documented, unit-tested in test_llm_ops): MIPS reduces
    to cosine ANN by the order-preserving augmentation x' = [x/M,
    sqrt(1 − ‖x‖²/M²)] with M ≥ max‖x‖ (Bachrach et al. 2014, the
    Xbox/ALS trick), after which the existing LSH/IVF bucketed indexes
    apply unchanged; this operator is the exact baseline those indexes
    are audited against. Queries broadcast; candidates never shuffle;
    the dot is the same sequential zip_with fold as cosine_topk, so the
    score is engine-identical."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"))
    scored = _arrow_pair_scores(c, q.collect(), mode="dot", k=k)
    if scored is not None:
        scored = scored.withColumnRenamed("score", "dot")
    else:
        scored = (
            c.join(F.broadcast(q))
            .filter(F.col("q_id") != F.col("c_id"))
            .withColumn("dot", F.expr(_dot("qv", "cv")))
        )
    w = W.partitionBy("q_id").orderBy(F.col("dot").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "c_id",
            F.round("dot", 4).alias("dot"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def power_iteration_pc1(
    emb: DataFrame,
    iterations: int = 3,
    scale: int = 1000,
    quant: int = 127,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Leading principal direction of the embedding cloud by FIXED-POINT
    power iteration — the whitening / drift-diagnostic primitive (which
    dimension combination carries the variance), computed with zero
    float summations so the result is engine-exact.

    Discipline: elements quantize to integers (round(x·quant), the SQ8
    move from scalar_quantize_int8); centering is n-scaled subtraction
    (y = n·c − Σc, exact BIGINT); the covariance is an exact integer
    (i, j) aggregate; the matrix and each iterate renormalize to
    ``scale`` fixed-point units via pure BIGINT half-up division
    ``(1000·|v| + max div 2) div max``, so every iterate is an integer
    vector and the Σ_j C'_ij·v_j products stay exact. Sign is pinned by
    the deterministic all-ones start.

    Scale shape: the (i, j) covariance explode is dim² rows PER VECTOR
    but partial-aggregates map-side, so the one shuffle carries only
    dim²·partitions rows (dim²=4096 here); everything after runs on
    dim- or dim²-sized aggregate frames with broadcast iterates. BIGINT
    bounds: the renormalization multiplies the raw covariance by
    ``scale`` before dividing, so the binding constraint is
    n³·quant²·scale < 2^63 — safe to ~10⁴ vectors at the defaults;
    beyond that pre-aggregate to means (divide y by n — same plan, one
    extra division) before the covariance. scale²·dim < 2^63 always
    holds.

    Returns one row per dimension: (dim, v1..v_iterations fixed-point
    iterate values)."""
    y = _pc1_centered(emb, quant, id_col, vec_col)
    iterates = _pc1_iterates(y, iterations, scale)
    out = iterates[0]
    for nxt in iterates[1:]:
        out = out.join(nxt, "j")
    return out.select(
        F.col("j").cast("int").alias("dim"),
        *[f"v{k}" for k in range(1, iterations + 1)],
    )


def _pc1_centered(emb, quant, id_col, vec_col):
    """Quantize + n-scale-center the embedding elements: persisted
    (vid, i, y) with y = n·round(x·quant) − Σround(x·quant), exact
    BIGINT (shared by power_iteration_pc1 and pc1_project_by_label)."""
    el = spread_scan(emb.select(F.col(id_col), F.col(vec_col))).select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col)).alias("i", "xv"),
    ).select(
        "vid",
        "i",
        F.round(F.col("xv").cast("double") * quant).cast("long").alias("c"),
    ).persist()  # per-dim stats + the centering join both read it
    stats = el.groupBy("i").agg(
        F.sum("c").cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return el.join(F.broadcast(stats), "i").select(
        "vid", "i", (F.col("n") * F.col("c") - F.col("m")).cast("long").alias("y")
    ).persist()  # both legs of the covariance self-join + any projection


def _pc1_iterates(y, iterations: int, scale: int):
    """Fixed-point power iteration over the centered codes ``y``:
    returns the list of per-pass iterate frames [(j, v1), (j, v2), ...]
    (exact-integer covariance + half-up renormalization each pass).

    The covariance aggregate stays distributed (the one corpus-scale
    pass); everything after it operates on a dim²-BOUNDED integer frame
    (4096 longs at dim=64 — a model property, independent of corpus
    size), so the renormalize + iterate recurrence runs on the COLLECTED
    covariance with the identical truncating-division integer formulas
    (Python ``//`` == Spark ``div`` on the non-negative operands each
    CASE branch guarantees; all values are in-contract BIGINT range, see
    power_iteration_pc1). The former per-pass broadcast/aggregate chain
    cost ~15 driver-coordinated mini-jobs per query for dim-sized data —
    the same aggregate-scale carve-out as BPE's vocab-sized merge loop."""
    spark = y.sparkSession
    yj = y.select(
        F.col("vid").alias("vid2"), F.col("i").alias("j"), F.col("y").alias("yj")
    )
    cov = (
        y.join(yj, F.col("vid") == F.col("vid2"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("y") * F.col("yj")).cast("long").alias("cv"))
    )
    rows = cov.collect()  # dim² rows, bounded by dimensionality
    mc = max((abs(r.cv) for r in rows), default=0)

    def _renorm(x: int, m: int) -> int:
        if m == 0:
            return 0
        if x >= 0:
            return (x * scale + m // 2) // m
        return -((-x * scale + m // 2) // m)

    cq = {(r.i, r.j): _renorm(r.cv, mc) for r in rows}
    dims = sorted({i for (i, _) in cq} | {j for (_, j) in cq})
    v = {j: 1 for j in dims}  # deterministic all-ones start
    iterates = []
    for it in range(1, iterations + 1):
        w = {i: 0 for i in dims}
        for (i, j), c in cq.items():
            w[i] += c * v[j]
        mw = max((abs(x) for x in w.values()), default=0)
        v = {i: _renorm(x, mw) for i, x in w.items()}
        iterates.append(
            spark.createDataFrame(
                spark.sparkContext.parallelize(
                    [(j, v[j]) for j in dims], 1
                ),
                schema=f"j long, v{it} long",
            )
        )
    return iterates


def pc1_project_by_label(
    emb: DataFrame,
    iterations: int = 3,
    scale: int = 1000,
    quant: int = 127,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding drift by segment: project every centered vector onto
    the fixed-point leading principal direction (the last
    power-iteration iterate) and aggregate the projection per
    ``label_col`` — the "which segment moved along the main axis"
    diagnostic a curation pipeline runs per source/language/snapshot.

    Exactness: proj = Σ_i y_i·v_i is a product of exact BIGINTs summed
    exactly; per-label sums are BIGINT; the mean is one half-up floor
    over explicit double division. Shape: the projection join broadcasts
    the dim-sized iterate into the (vid, i, y) stream — one vid-grain
    aggregate, one label-grain aggregate, nothing new at corpus scale.

    Returns (label, n_vecs, sum_proj, mean_proj)."""
    y = _pc1_centered(emb, quant, id_col, vec_col)
    v_last = _pc1_iterates(y, iterations, scale)[-1].select(
        F.col("j").alias("i"), F.col(f"v{iterations}").alias("v")
    )
    proj = (
        y.join(F.broadcast(v_last), "i")
        .groupBy("vid")
        .agg(F.sum(F.col("y") * F.col("v")).cast("long").alias("proj"))
    )
    labels = emb.select(
        F.col(id_col).alias("vid"), F.col(label_col).alias("label")
    )
    return (
        proj.join(labels, "vid")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("proj").cast("long").alias("sum_proj"),
        )
        .select(
            "label",
            "n_vecs",
            "sum_proj",
            F.floor(
                F.col("sum_proj").cast("double")
                / F.col("n_vecs").cast("double")
                + F.lit(0.5)
            ).cast("long").alias("mean_proj"),
        )
    )


def label_centroid_similarity(
    emb: DataFrame,
    quant: int = 127,
    digits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding centroids
    — the "how close are these two sources/languages/clusters in
    embedding space" diagnostic behind mix design and cluster audits.

    Exactness: cosine of mean vectors equals cosine of per-label SUM
    vectors (the 1/n factors cancel), so the whole computation runs on
    exact BIGINT sums of int8-quantized codes: one (label, dim)
    aggregate collapses the corpus, and everything after — pair dots,
    norms, the final sqrt+divide — happens on a labels×dims frame small
    enough to broadcast. The only float ops are the final
    IEEE-correctly-rounded sqrt and divide on identical integers, then
    one half-up floor at ``digits``.

    Returns (label_a, label_b, dot, cos) for label_a < label_b."""
    el = emb.select(
        F.col(label_col).alias("lab"),
        F.posexplode(F.col(vec_col)).alias("i", "xv"),
    ).select("lab", "i", F.round(F.col("xv") * quant).cast("long").alias("c"))
    cent = el.groupBy("lab", "i").agg(
        F.sum("c").cast("long").alias("s")
    ).persist()  # labels×dims; consumed by norms and both pair legs
    norms = cent.groupBy("lab").agg(
        F.sum(F.col("s") * F.col("s")).cast("long").alias("n2")
    )
    a = cent.select(
        F.col("lab").alias("label_a"), "i", F.col("s").alias("sa")
    )
    b = cent.select(
        F.col("lab").alias("label_b"), "i", F.col("s").alias("sb")
    )
    dots = (
        a.join(F.broadcast(b), "i")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("sa") * F.col("sb")).cast("long").alias("dot"))
    )
    na = norms.select(F.col("lab").alias("label_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("lab").alias("label_b"), F.col("n2").alias("nb2"))
    scale = float(10 ** digits)
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            "dot",
            (
                F.floor(
                    F.col("dot").cast("double")
                    / F.sqrt(
                        F.col("na2").cast("double") * F.col("nb2").cast("double")
                    )
                    * scale
                    + F.lit(0.5)
                ).cast("long")
                / F.lit(scale)
            ).alias("cos"),
        )
    )


def labeled_retrieval_eval(
    emb: DataFrame,
    k: int = 10,
    stride: int = 37,
    quant: int = 127,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Label-ground-truth retrieval evaluation: macro precision@k and
    recall@k of exact inner-product top-k, per label — the "does nearest-
    neighbor search actually surface same-class items" metric computed
    before an ANN index is trusted for retrieval-augmented training.

    Vectors quantize to int8 codes (round(u·quant), the SQ8 move), so
    the score is an exact BIGINT dot — no float tie ever reaches the
    rank window. The deterministic query subset (id % stride = 0)
    broadcasts; candidates never shuffle; the rank window partitions by
    query id. Per query, hits = same-label neighbors in the top k;
    macro-aggregating by query label gives P@k = hits/(n_q·k) and
    R@k = hits/(n_q·(n_label − 1)) (self excluded), each with one
    half-up floor at 1e−6. At index scale the same evaluation runs
    against ivf_topk/ann_topk_lsh output instead of the exact ranks —
    this operator is the ground-truth baseline those are audited
    against (cf. ann recall audits in SCALE.md).

    Returns one row per label:
    (label, n_queries, n_hits, p_at_k, r_at_k)."""
    from pyspark.sql import Window as W

    codes = F.expr(
        f"transform({vec_col}, u -> CAST(round(u * {quant}) AS BIGINT))"
    )
    base = emb.select(
        F.col(id_col), codes.alias("__codes"), F.col(label_col).alias("__lab")
    ).persist()  # one code projection serves queries, candidates, and the
    # per-label relevant counts (one corpus scan total)
    q = base.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("q_id"),
        F.col("__codes").alias("qc"),
        F.col("__lab").alias("q_lab"),
    )
    c = base.select(
        F.col(id_col).alias("c_id"),
        F.col("__codes").alias("cc"),
        F.col("__lab").alias("c_lab"),
    )
    dot = (
        "aggregate(zip_with(qc, cc, (x, y) -> x * y), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id", "q_lab", "c_lab", F.expr(dot).alias("dot"), "c_id"
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("dot").desc(), F.col("c_id"))
    hits = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .groupBy("q_id", "q_lab")
        .agg(
            F.sum(F.when(F.col("c_lab") == F.col("q_lab"), 1).otherwise(0))
            .cast("long")
            .alias("hits")
        )
    )
    rel = base.groupBy(F.col("__lab").alias("q_lab")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lab")
    )
    per_label = (
        hits.groupBy("q_lab")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum("hits").cast("long").alias("n_hits"),
        )
        .join(F.broadcast(rel), "q_lab")
    )
    fix6 = lambda num, den: F.when(  # noqa: E731
        den == 0, F.lit(0).cast("long")
    ).otherwise(
        F.floor(num.cast("double") * 1e6 / den.cast("double") + F.lit(0.5))
        .cast("long")
    ) / F.lit(
        1e6
    )
    return per_label.select(
        F.col("q_lab").alias("label"),
        "n_queries",
        "n_hits",
        fix6(F.col("n_hits"), F.col("n_queries") * k).alias("p_at_k"),
        fix6(
            F.col("n_hits"), F.col("n_queries") * (F.col("n_lab") - 1)
        ).alias("r_at_k"),
    ).orderBy("label")


def centroid_silhouette(
    emb: DataFrame,
    quant: int = 127,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Centroid silhouette per label — the cluster-separation audit
    ((b − a)/max(a, b) with a = distance to own-label centroid, b =
    distance to the nearest other centroid), the medoid-free variant
    every clustering / labeling pipeline can afford at corpus scale.

    Exactness discipline: codes are int8 quantized; the point-to-
    centroid distance uses the n-scaled identity d_L = sqrt(Σ_i (n_L·x_i
    − s_Li)²)/n_L with s_L the exact BIGINT per-label element sums — so
    the only floats are one sqrt + one divide per (point, label), the
    same correctly-rounded IEEE chain on both engines; the per-point
    silhouette quantizes half-up to 1e−6 before the label mean.

    Shape: centroids come from ONE (label, dim) aggregate; the
    labels×dims frame (with per-label counts) broadcasts back onto the
    element stream, so the corpus-grain work is one N·d·L partial-agged
    aggregate to (point, label) grain — never a point-point product.

    Returns (label, n_points, sil_micros_sum, mean_silhouette)."""
    codes = F.expr(
        f"transform({vec_col}, u -> CAST(round(u * {quant}) AS BIGINT))"
    )
    el = emb.select(
        F.col(id_col),
        F.col(label_col).alias("own"),
        F.posexplode(codes).alias("i", "c"),
    ).persist()  # one decode of the element stream feeds centroids, counts,
    # and the distance aggregate (keeps the query at ONE corpus scan)
    nl = el.filter(F.col("i") == 0).groupBy(F.col("own").alias("lab")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    cent = (
        el.groupBy(F.col("own").alias("lab"), "i")
        .agg(F.sum("c").cast("long").alias("s"))
        .join(nl, "lab")
    )
    diff = F.col("n") * F.col("c") - F.col("s")
    q = (
        el.join(F.broadcast(cent), "i")
        .groupBy(id_col, "own", "lab")
        .agg(
            F.sum(diff * diff).cast("long").alias("qq"),
            F.first("n").alias("n"),
        )
    )
    d = q.select(
        id_col,
        "own",
        "lab",
        (
            F.sqrt(F.col("qq").cast("double")) / F.col("n").cast("double")
        ).alias("d"),
    )
    ab = d.groupBy(id_col, "own").agg(
        F.min(F.when(F.col("lab") == F.col("own"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("lab") != F.col("own"), F.col("d"))).alias("b"),
    )
    sil = ab.select(
        "own",
        F.when(F.greatest("a", "b") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                (F.col("b") - F.col("a"))
                / F.greatest("a", "b")
                * 1e6
                + F.lit(0.5)
            ).cast("long")
        )
        .alias("sm"),
    )
    return (
        sil.groupBy(F.col("own").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum("sm").cast("long").alias("sil_micros_sum"),
            (
                F.floor(
                    F.sum("sm").cast("double")
                    / F.count(F.lit(1)).cast("double")
                    + F.lit(0.5)
                ).cast("long")
                / F.lit(1e6)
            ).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


def matryoshka_recall(
    emb: DataFrame,
    k_values: tuple = (1, 5, 10),
    trunc_dim: int = 16,
    stride: int = 41,
    quant: int = 127,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall of TRUNCATED-dimension retrieval against full-dimension
    exact top-k — the Matryoshka-representation question ("how much of
    the neighbor structure do the first d' dims carry?") that decides
    whether the cheap prefix index is safe at corpus scale.

    Both scores compute on ONE joined (query, candidate) frame — the
    full dot and the prefix dot are two exact BIGINT folds over the
    same int8 codes, so there is no second corpus pass and no float
    tie; two rank windows share the frame. recall@k = |topk_full ∩
    topk_trunc| / (n_q·k), one half-up floor each.

    Returns one row per k: (k, trunc_dim, n_queries, n_hits, recall)."""
    from pyspark.sql import Window as W

    codes = F.expr(
        f"transform({vec_col}, u -> CAST(round(u * {quant}) AS BIGINT))"
    )
    base = emb.select(F.col(id_col), codes.alias("__codes"))
    q = base.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("q_id"), F.col("__codes").alias("qc")
    )
    c = base.select(F.col(id_col).alias("c_id"), F.col("__codes").alias("cc"))
    fold = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.expr(fold.format(a="qc", b="cc")).alias("dot_full"),
            F.expr(
                fold.format(
                    a=f"slice(qc, 1, {trunc_dim})",
                    b=f"slice(cc, 1, {trunc_dim})",
                )
            ).alias("dot_trunc"),
        )
    )
    wf = W.partitionBy("q_id").orderBy(F.col("dot_full").desc(), F.col("c_id"))
    wt = W.partitionBy("q_id").orderBy(
        F.col("dot_trunc").desc(), F.col("c_id")
    )
    ranked = scored.select(
        "q_id",
        F.row_number().over(wf).alias("rk_f"),
        F.row_number().over(wt).alias("rk_t"),
    )
    kmax = max(k_values)
    agg = ranked.filter(
        (F.col("rk_f") <= kmax) | (F.col("rk_t") <= kmax)
    ).agg(
        F.countDistinct("q_id").cast("long").alias("n_q"),
        *[
            F.sum(
                F.when((F.col("rk_f") <= k) & (F.col("rk_t") <= k), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias(f"h_{k}")
            for k in k_values
        ],
    )
    stack_args = ", ".join(f"{k}, h_{k}" for k in k_values)
    rows = agg.select(
        "n_q",
        F.expr(
            f"stack({len(k_values)}, {stack_args}) AS (k, n_hits)"
        ),
    )
    return rows.select(
        F.col("k").cast("int").alias("k"),
        F.lit(trunc_dim).cast("int").alias("trunc_dim"),
        F.col("n_q").alias("n_queries"),
        "n_hits",
        (
            F.floor(
                F.col("n_hits").cast("double")
                * 1e6
                / (F.col("n_q") * F.col("k")).cast("double")
                + F.lit(0.5)
            ).cast("long")
            / F.lit(1e6)
        ).alias("recall"),
    ).orderBy("k")


# DCG discount weights in micro-units: w_r = round(1e6 / log2(r + 1)) for
# rank r = 1..10, precomputed ONCE (embedding log2 as literals keeps the
# metric free of libm — JVM and DuckDB log2 can differ in the last ulp),
# plus the cumulative ideal sums for IDCG.
NDCG_W_MICROS = (
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
)
NDCG_IDEAL_MICROS = tuple(
    sum(NDCG_W_MICROS[: i + 1]) for i in range(len(NDCG_W_MICROS))
)


def labeled_ndcg_at_k(
    emb: DataFrame,
    k: int = 10,
    stride: int = 43,
    quant: int = 127,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Macro nDCG@k of exact inner-product retrieval against label
    ground truth — the rank-weighted retrieval eval (a same-label hit
    at rank 1 is worth more than at rank 10), complementing the flat
    P@k/R@k of labeled_retrieval_eval.

    Determinism: the log2 discount enters ONLY through the precomputed
    integer weight table (NDCG_W_MICROS — literals, not libm calls),
    so per-query DCG and the ideal IDCG are exact BIGINT sums; the
    single division happens once per query with a half-up floor, and
    the per-label mean averages those exact micro values. Shape:
    queries broadcast, candidates never shuffle, rank window per query.

    Returns (label, n_queries, mean_ndcg) per query label."""
    if not 1 <= k <= len(NDCG_W_MICROS):
        raise ValueError(
            f"labeled_ndcg_at_k supports k in [1, {len(NDCG_W_MICROS)}] "
            "(the precomputed literal discount table); extend "
            "NDCG_W_MICROS with round(1e6 / log2(r + 1)) literals for "
            f"larger k, got k={k}"
        )
    from pyspark.sql import Window as W

    codes = F.expr(
        f"transform({vec_col}, u -> CAST(round(u * {quant}) AS BIGINT))"
    )
    base = emb.select(
        F.col(id_col), codes.alias("__codes"), F.col(label_col).alias("__lab")
    ).persist()  # one code projection: queries, candidates, label counts
    q = base.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("q_id"),
        F.col("__codes").alias("qc"),
        F.col("__lab").alias("q_lab"),
    )
    c = base.select(
        F.col(id_col).alias("c_id"),
        F.col("__codes").alias("cc"),
        F.col("__lab").alias("c_lab"),
    )
    dot = (
        "aggregate(zip_with(qc, cc, (x, y) -> x * y), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    w = W.partitionBy("q_id").orderBy(F.col("dot").desc(), F.col("c_id"))
    weight = F.element_at(
        F.array(*[F.lit(x).cast("long") for x in NDCG_W_MICROS]), F.col("rk")
    )
    dcg = (
        c.join(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "q_lab", "c_lab", F.expr(dot).alias("dot"), "c_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .groupBy("q_id", "q_lab")
        .agg(
            F.sum(
                F.when(F.col("c_lab") == F.col("q_lab"), weight).otherwise(
                    F.lit(0).cast("long")
                )
            )
            .cast("long")
            .alias("dcg_micros")
        )
    )
    nl = base.groupBy(F.col("__lab").alias("q_lab")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lab")
    )
    ideal = F.element_at(
        F.array(*[F.lit(x).cast("long") for x in NDCG_IDEAL_MICROS]),
        F.least(
            F.lit(k), F.greatest(F.lit(1).cast("long"), F.col("n_lab") - 1)
        ).cast("int"),
    )
    per_q = dcg.join(F.broadcast(nl), "q_lab").select(
        "q_lab",
        F.when(F.col("n_lab") <= 1, F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                F.col("dcg_micros").cast("double")
                * 1e6
                / ideal.cast("double")
                + F.lit(0.5)
            ).cast("long")
        )
        .alias("ndcg_micros"),
    )
    return (
        per_q.groupBy(F.col("q_lab").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            (
                F.floor(
                    F.sum("ndcg_micros").cast("double")
                    / F.count(F.lit(1)).cast("double")
                    + F.lit(0.5)
                ).cast("long")
                / F.lit(1e6)
            ).alias("mean_ndcg"),
        )
        .orderBy("label")
    )


# Reciprocal-rank weights in micro-units: round(1e6 / r) for r = 1..10 —
# literals on both engines, same discipline as NDCG_W_MICROS.
MRR_W_MICROS = (
    1000000, 500000, 333333, 250000, 200000,
    166667, 142857, 125000, 111111, 100000,
)


def labeled_mrr_at_k(
    emb: DataFrame,
    k: int = 10,
    stride: int = 43,
    quant: int = 127,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Macro MRR@k of exact inner-product retrieval against label
    ground truth: per query, the reciprocal rank of the FIRST same-
    label neighbor within the top k (0 if none) — the "how fast does
    the right answer appear" eval. Reciprocals come from the literal
    integer weight table (MRR_W_MICROS), so per-query values and the
    per-label mean are exact; one half-up floor at the mean. Same
    broadcast-queries / exact-BIGINT-dot / per-query-rank-window shape
    as labeled_ndcg_at_k.

    Returns (label, n_queries, mean_mrr)."""
    if not 1 <= k <= len(MRR_W_MICROS):
        raise ValueError(
            f"labeled_mrr_at_k supports k in [1, {len(MRR_W_MICROS)}] "
            "(the precomputed literal reciprocal table); extend "
            "MRR_W_MICROS with round(1e6 / r) literals for larger k, "
            f"got k={k}"
        )
    from pyspark.sql import Window as W

    codes = F.expr(
        f"transform({vec_col}, u -> CAST(round(u * {quant}) AS BIGINT))"
    )
    base = emb.select(
        F.col(id_col), codes.alias("__codes"), F.col(label_col).alias("__lab")
    )
    q = base.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("q_id"),
        F.col("__codes").alias("qc"),
        F.col("__lab").alias("q_lab"),
    )
    c = base.select(
        F.col(id_col).alias("c_id"),
        F.col("__codes").alias("cc"),
        F.col("__lab").alias("c_lab"),
    )
    dot = (
        "aggregate(zip_with(qc, cc, (x, y) -> x * y), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    w = W.partitionBy("q_id").orderBy(F.col("dot").desc(), F.col("c_id"))
    first_rel = (
        c.join(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "q_lab", "c_lab", F.expr(dot).alias("dot"), "c_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .groupBy("q_id", "q_lab")
        .agg(
            F.min(
                F.when(F.col("c_lab") == F.col("q_lab"), F.col("rk"))
            ).alias("first_rk")
        )
    )
    rr = F.when(
        F.col("first_rk").isNull(), F.lit(0).cast("long")
    ).otherwise(
        F.element_at(
            F.array(*[F.lit(x).cast("long") for x in MRR_W_MICROS]),
            F.col("first_rk").cast("int"),
        )
    )
    return (
        first_rel.select("q_lab", rr.alias("rr_micros"))
        .groupBy(F.col("q_lab").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            (
                F.floor(
                    F.sum("rr_micros").cast("double")
                    / F.count(F.lit(1)).cast("double")
                    + F.lit(0.5)
                ).cast("long")
                / F.lit(1e6)
            ).alias("mean_mrr"),
        )
        .orderBy("label")
    )


def embedding_outliers(
    emb: DataFrame,
    k_num: int = 3,
    k_den: int = 2,
    quant: int = 127,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label embedding outlier detection — flag vectors whose
    squared distance to their OWN label centroid exceeds (k_num/k_den)²
    times the label's mean squared distance: the curation filter that
    drops mislabeled or off-distribution points before training.

    Fully exact: with the n-scaled identity q = Σ_i (n·x_i − s_i)²
    (exact BIGINT), the flag is the integer cross-comparison
    q·n_lab·k_den² > k_num²·Σ_lab q — no division, no sqrt, no float
    anywhere, so the flags are bit-identical on any engine. Shape: one
    (label, dim) centroid aggregate broadcast back; one corpus-grain
    (point, own-label) distance aggregate; label-grain means broadcast
    into the flag projection.

    Returns per label: (label, n_points, n_outliers, outlier_ppm)."""
    codes = F.expr(
        f"transform({vec_col}, u -> CAST(round(u * {quant}) AS BIGINT))"
    )
    el = emb.select(
        F.col(id_col),
        F.col(label_col).alias("lab"),
        F.posexplode(codes).alias("i", "c"),
    ).persist()  # centroids and the distance pass share one decode
    cent = el.groupBy("lab", "i").agg(F.sum("c").cast("long").alias("s"))
    nl = el.filter(F.col("i") == 0).groupBy("lab").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    cw = cent.join(nl, "lab")
    diff = F.col("n") * F.col("c") - F.col("s")
    q = (
        el.join(F.broadcast(cw), ["lab", "i"])
        .groupBy(id_col, "lab")
        .agg(
            F.sum(diff * diff).cast("long").alias("qq"),
            F.first("n").alias("n"),
        )
    ).persist()  # label means and the flag projection share it
    means = q.groupBy("lab").agg(F.sum("qq").cast("long").alias("sq"))
    flagged = q.join(F.broadcast(means), "lab").select(
        "lab",
        (
            F.col("qq") * F.col("n") * (k_den * k_den)
            > (k_num * k_num) * F.col("sq")
        ).alias("out"),
    )
    return (
        flagged.groupBy(F.col("lab").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum(F.col("out").cast("long")).cast("long").alias("n_outliers"),
            F.floor(
                F.sum(F.col("out").cast("long")).cast("double")
                * 1e6
                / F.count(F.lit(1)).cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("outlier_ppm"),
        )
        .orderBy("label")
    )


def hard_negative_mining(
    emb: DataFrame,
    n_negatives: int = 3,
    stride: int = 47,
    quant: int = 127,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive training-pair mining: for each anchor, the nearest
    SAME-label neighbor (the positive) and the ``n_negatives`` nearest
    DIFFERENT-label neighbors (the hard negatives — the pairs that
    actually move a contrastive loss, vs easy random negatives).

    One scored frame (exact BIGINT int8 dots — no float tie reaches the
    windows), one rank window per (anchor, same-label?) slice. Anchors
    broadcast; candidates never shuffle. At index scale the candidate
    set comes from ivf_topk/ann buckets instead of the full corpus —
    this is the exact baseline.

    Returns (q_id, kind, rk, c_id, dot): kind 'pos' (rk 1) or 'neg'
    (rk 1..n_negatives)."""
    from pyspark.sql import Window as W

    codes = F.expr(
        f"transform({vec_col}, u -> CAST(round(u * {quant}) AS BIGINT))"
    )
    base = emb.select(
        F.col(id_col), codes.alias("__codes"), F.col(label_col).alias("__lab")
    )
    q = base.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("q_id"),
        F.col("__codes").alias("qc"),
        F.col("__lab").alias("q_lab"),
    )
    c = base.select(
        F.col(id_col).alias("c_id"),
        F.col("__codes").alias("cc"),
        F.col("__lab").alias("c_lab"),
    )
    dot = (
        "aggregate(zip_with(qc, cc, (x, y) -> x * y), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            (F.col("c_lab") == F.col("q_lab")).alias("same"),
            F.expr(dot).alias("dot"),
        )
    )
    w = W.partitionBy("q_id", "same").orderBy(
        F.col("dot").desc(), F.col("c_id")
    )
    ranked = scored.withColumn("rk", F.row_number().over(w))
    return (
        ranked.filter(
            (F.col("same") & (F.col("rk") == 1))
            | (~F.col("same") & (F.col("rk") <= n_negatives))
        )
        .select(
            "q_id",
            F.when(F.col("same"), "pos").otherwise("neg").alias("kind"),
            F.col("rk").cast("int").alias("rk"),
            "c_id",
            "dot",
        )
        .orderBy("q_id", "kind", "rk")
    )
