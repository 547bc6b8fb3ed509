"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline; the bucketed
(IVF-style) variant is the scale path — it prunes the candidate space
to the query's nearest coarse cell(s) before scoring.

Bulk scoring is one BLAS GEMM per Arrow batch against a closure-
broadcast query matrix (``_gemm_batch_topk``): the corpus streams
through the scan stage once, is reduced to batch-local exact top-k in
the same pass, and never shuffles — only k × batches × queries
candidate rows reach the final ranking window. (The earlier join
formulation Arrow-shipped |Q|·|corpus| duplicated vector pairs; at 10
queries × 32k×64-float corpus that is ~330 MB of transfer vs ~16 MB.)

Scale notes: brute force is O(|Q|·|C|) — at 100 TB you broadcast the
(small) query set and let every corpus partition score locally: one
pass, no shuffle until top-k. The IVF variant prunes to the probed
cells JVM-side before any Python sees a row; recall < 1.0 is the
documented trade.
"""

from __future__ import annotations

# Module-level pandas import: pandas_udf resolves stringified
# annotations ('pd.Series') against these globals at decoration time.
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranking import topk_per_group


#: Hard cap on the collected query side of the GEMM kNN paths. The
#: brute-force contract is |Q| small / |corpus| huge; this makes the
#: contract an enforced guard instead of a silent driver OOM.
MAX_QUERY_ROWS = 100_000


def _collect_queries(queries: DataFrame, cols: list[str], max_rows: int):
    """Collect the query side via Arrow, raising if it exceeds the
    row budget — checked with a LIMIT probe so an oversized query set
    never materializes on the driver."""
    pdf = queries.select(*cols).limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"query side exceeds the {max_rows}-row budget of the "
            "GEMM kNN paths (|Q| small / |corpus| huge by contract); "
            "filter the query set, raise max_query_rows explicitly, or "
            "reformulate as a bucketed join (srp_buckets / ivf cells)"
        )
    return pdf


def _qgrid_1e12(np, x):
    """Nearest-grid quantization of cosines at the 1e-12 grid, rounding
    exact halves AWAY FROM ZERO to match DuckDB's ``round()`` (the
    oracle side of every kNN rank key). ``np.round`` is half-to-EVEN,
    so a raw cosine landing exactly on a half-grid double would be
    binned differently by construction, not just by ulp noise
    (ADVICE r8) — measure-zero in practice, aligned by policy here.
    NaN propagates (sign/floor of NaN is NaN), matching np.round."""
    scaled = x * 1e12
    return np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)


def _gemm_batch_topk(
    corpus: DataFrame,
    query_groups: dict,
    id_col: str,
    vec_col: str,
    k: int,
    cell_col: str | None,
) -> DataFrame:
    """Score corpus batches against in-memory query matrices by GEMM.

    ``query_groups`` maps cell → (qids, Q, qnorms); ``None`` cell means
    every corpus row scores against every query. One ``M @ Q.T`` per
    Arrow batch (BLAS), then a batch-local exact top-k per query under
    the same tie-free total order the final window uses — the rank key
    is the NEAREST-GRID-QUANTIZED cosine (1e-12 grid, ``qcos``), not
    the raw float: GEMM summation order differs from the oracle's
    sequential fold in the last ulp, which flips top-k membership under
    dense near-ties (surfaced for real by the 100x replica drive, where
    duplicate embeddings make distinct vectors score ulp-apart around
    EXACTLY 1.0). round-to-nearest, NOT floor: exact duplicates produce
    grid-ALIGNED cosines (1.0 → 1e12), and ±ulp noise straddles a floor
    boundary there (measured: spark 0.99999999999999 vs duck
    1.0000000000000002 landed in different floor cells at 100x), while
    both snap to the same nearest grid point. round's residual hazard —
    a raw cosine landing EXACTLY on a half-grid double — is
    measure-zero, not structural. Only
    k × batches × queries candidate rows ever leave the scan stage,
    and the corpus itself never shuffles.
    The query set must fit driver/executor memory: that is the
    brute-force contract (|Q| small, |corpus| huge).
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        "query_id long, neighbor_id long, cosine double, qcos long"
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            frames = []
            if cell_col is None:
                groups = [(pdf, query_groups.get(None))]
            else:
                groups = [
                    (sub, query_groups.get(cell))
                    for cell, sub in pdf.groupby(cell_col, sort=False)
                ]
            for sub, qg in groups:
                if qg is None:
                    continue
                qids, Q, qnorms = qg
                ids = sub[id_col].to_numpy()
                M = np.stack(sub[vec_col].to_numpy()).astype(np.float64, copy=False)
                norms = np.sqrt(np.einsum("ij,ij->i", M, M))
                denom = np.outer(norms, qnorms)
                with np.errstate(invalid="ignore", divide="ignore"):
                    S = np.where(denom > 0, (M @ Q.T) / denom, np.nan)
                S[ids[:, None] == qids[None, :]] = np.nan  # self-matches
                for j, qid in enumerate(qids):
                    col = S[:, j]
                    valid = np.flatnonzero(~np.isnan(col))
                    if valid.size == 0:
                        continue
                    # exact batch-local top-k on (qcos desc, id asc) —
                    # the quantized key, see the docstring (half-away
                    # grid, matching DuckDB round(); _qgrid_1e12)
                    q = _qgrid_1e12(np, col[valid]).astype(np.int64)
                    order_ix = np.lexsort((ids[valid], -q))[:k]
                    order = valid[order_ix]
                    frames.append(
                        pd.DataFrame(
                            {
                                "query_id": np.full(order.size, qid, dtype=np.int64),
                                "neighbor_id": ids[order].astype(np.int64),
                                "cosine": col[order],
                                "qcos": q[order_ix],
                            }
                        )
                    )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return corpus.mapInPandas(score, schema=out_schema)


def _finalize_topk(scored: DataFrame, k: int) -> DataFrame:
    # rank on the quantized key (qcos), display the rounded raw cosine —
    # selection is divergence-proof; see _gemm_batch_topk.
    return topk_per_group(
        scored,
        "query_id",
        [F.col("qcos").desc(), F.col("neighbor_id").asc()],
        k,
        keep_rank="rank",
    ).select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_query_rows: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (brute force).

    Output: (query_id, neighbor_id, cosine, rank) with a deterministic
    (cosine desc, neighbor_id asc) order. Self-matches excluded.

    Physical design: the query set is collected (small by contract) and
    closure-broadcast; every corpus batch is scored in one GEMM and
    reduced to its local top-k — no pair materialization, no Arrow
    round-trip of duplicated query vectors (the join formulation
    shipped |Q|·|corpus| vector pairs; this ships the corpus once).
    """
    import numpy as np

    q_pdf = _collect_queries(queries, [id_col, vec_col], max_query_rows)
    if len(q_pdf):
        Q = np.stack(q_pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
        qnorms = np.sqrt(np.einsum("ij,ij->i", Q, Q))
        groups = {None: (q_pdf[id_col].to_numpy(), Q, qnorms)}
    else:
        groups = {}
    scored = _gemm_batch_topk(
        corpus.select(id_col, vec_col), groups, id_col, vec_col, k, None
    )
    return _finalize_topk(scored, k)


def neardup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = "label",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-duplicate pairs: same bucket, cosine >= threshold.

    The bucket column (cluster/label/LSH cell) bounds the pair space —
    the same blocking idea as dedup's LSH bands.

    Physical design: ``applyInPandas`` per bucket doing one BLAS GEMM
    (``M @ M.T``) and emitting only pairs over threshold. One shuffle of
    the *vectors* (never the pairs), no JVM-side pair explosion, and the
    O(n²) arithmetic runs at matrix-multiply speed. Measured ~5× faster
    than the join + per-pair-kernel formulation at 31k pairs; the gap
    widens with bucket size. A bucket must fit one executor's memory —
    that is the bucketing contract (split oversized cells upstream).
    """
    import numpy as np
    import pandas as pd

    bucket = bucket_col or "__all"
    base = (
        embeddings.select(F.col(id_col), F.col(vec_col), F.col(bucket_col))
        if bucket_col
        else embeddings.select(F.col(id_col), F.col(vec_col), F.lit(0).alias(bucket))
    )

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, ignore_index=True)
        ids = pdf[id_col].to_numpy()
        M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.sqrt((M * M).sum(axis=1))
        norms[norms == 0] = np.nan
        C = (M @ M.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(len(ids), k=1)
        cos = C[iu, ju]
        keep = cos >= threshold
        # round-half-away-from-zero, matching SQL ROUND semantics
        kept = cos[keep]
        rounded = np.sign(kept) * np.floor(np.abs(kept) * 1e6 + 0.5) / 1e6
        return pd.DataFrame(
            {"id_a": ids[iu[keep]], "id_b": ids[ju[keep]], "cosine": rounded}
        )

    return base.groupBy(bucket).applyInPandas(
        score_bucket, schema="id_a long, id_b long, cosine double"
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    k: int = 5,
    max_query_rows: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """IVF-style approximate top-k: score only the query's own cell.

    Uses an existing coarse partition (``cell_col`` — here the dataset's
    cluster label; in production, k-means cell ids). Approximate: a true
    neighbor outside the probed cell is missed — that recall trade is
    the point of the structure.
    """
    import numpy as np

    q_pdf = _collect_queries(queries, [id_col, vec_col, cell_col], max_query_rows)
    groups = {}
    for cell, sub in q_pdf.groupby(cell_col, sort=False):
        Q = np.stack(sub[vec_col].to_numpy()).astype(np.float64, copy=False)
        groups[cell] = (
            sub[id_col].to_numpy(),
            Q,
            np.sqrt(np.einsum("ij,ij->i", Q, Q)),
        )
    # Cell pruning happens JVM-side: partitions of non-probed cells are
    # filtered before any Python sees them.
    pruned = corpus.where(F.col(cell_col).isin(list(groups))).select(
        id_col, vec_col, cell_col
    )
    scored = _gemm_batch_topk(pruned, groups, id_col, vec_col, k, cell_col)
    return _finalize_topk(scored, k)


def srp_buckets(
    embeddings: DataFrame,
    planes,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple = (),
) -> DataFrame:
    """Sign-random-projection (SRP) LSH bucket per vector.

    ``planes`` is an (n_planes, dim) float64 matrix of hyperplanes;
    bit j of the bucket id is ``dot(vec, plane_j) > 0``. Cosine-similar
    vectors agree on most sign bits, so same-bucket vectors are ANN
    candidates — the LSH-bucketed scale path for similarity search
    (probe one bucket instead of the corpus; multi-probe = flip bits).

    One GEMM per Arrow batch against the closure-broadcast plane
    matrix; no shuffle at all — bucketing is a pure map. Deterministic
    given fixed planes (seeded), so it is oracle-reproducible from the
    same plane literals.
    """
    import numpy as np
    import pandas as pd

    P = np.asarray(planes, dtype=np.float64)
    weights = (1 << np.arange(P.shape[0], dtype=np.int64))

    @F.pandas_udf("long")
    def bucket(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        M = np.stack(vs.to_numpy()).astype(np.float64, copy=False)
        return pd.Series(((M @ P.T) > 0) @ weights)

    return embeddings.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        bucket(F.col(vec_col)).alias("bucket"),
    )


def default_srp_planes(n_planes: int = 8, dim: int = 64, seed: int = 7):
    """Seeded Gaussian hyperplanes shared by the Spark operator and the
    oracle SQL (emitted there as decimal literals — Python repr is
    shortest-round-trip, so both engines parse the identical double)."""
    import numpy as np

    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def srp_multiprobe_topk(
    queries: DataFrame,
    corpus: DataFrame,
    planes,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_query_rows: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Multi-probe SRP ANN: probe the query's SRP bucket AND every
    1-bit-flip neighbor bucket (the standard recall lever for LSH ANN —
    near misses usually differ in exactly one marginal sign bit).

    Query buckets and their probe sets are computed driver-side (the
    query set is small by contract); the corpus is bucketed in the scan
    stage (``srp_buckets``) and scored by the shared GEMM cell-probe
    kernel, with each query registered in all n_planes+1 cells it
    probes. A corpus vector lives in exactly one bucket, so no
    (query, neighbor) pair is scored twice. Zero corpus shuffle.
    """
    import numpy as np

    P = np.asarray(planes, dtype=np.float64)
    weights = 1 << np.arange(P.shape[0], dtype=np.int64)

    q_pdf = _collect_queries(queries, [id_col, vec_col], max_query_rows)
    groups: dict = {}
    if len(q_pdf):
        Q = np.stack(q_pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
        qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
        qids = q_pdf[id_col].to_numpy()
        qbuckets = ((Q @ P.T) > 0) @ weights
        per_cell: dict = {}
        for i, qb in enumerate(qbuckets):
            for cell in (int(qb), *(int(qb ^ w) for w in weights)):
                per_cell.setdefault(cell, []).append(i)
        for cell, idxs in per_cell.items():
            groups[cell] = (qids[idxs], Q[idxs], qn[idxs])
    bucketed = srp_buckets(corpus, P, id_col, vec_col, keep_cols=(vec_col,))
    pruned = bucketed.where(F.col("bucket").isin(list(groups)))
    scored = _gemm_batch_topk(pruned, groups, id_col, vec_col, k, "bucket")
    return _finalize_topk(scored, k)


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k most similar vectors with a DIFFERENT label — the negatives
    that are hardest to separate and therefore most informative.

    Physical design: one :func:`cosine_topk` GEMM pass per distinct
    query label, each over the complementary-label corpus slice
    (query labels are few and the query set is bounded by the same
    contract as ``cosine_topk``). Corpus scans stay pushed-down label
    filters; nothing pairs across the full corpus.
    """
    q_labels = sorted(
        r[label_col]
        for r in queries.select(label_col).distinct().collect()
        if r[label_col] is not None
    )
    out = None
    for lbl in q_labels:
        part = cosine_topk(
            queries.where(F.col(label_col) == lbl),
            corpus.where(F.col(label_col) != lbl),
            id_col=id_col,
            vec_col=vec_col,
            k=k,
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        return cosine_topk(queries.limit(0), corpus, id_col=id_col,
                           vec_col=vec_col, k=k)
    return out


def mutual_knn_edges(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    k: int = 3,
) -> DataFrame:
    """Mutual-kNN GRAPH over an embedding corpus: an undirected edge
    (u, v) exists iff v is in u's cell-bounded cosine top-k AND u is
    in v's — the standard graph substrate for density-based dedup /
    cluster analysis (mutual edges prune hub vectors' asymmetric
    links).

    This is NOT the collected-query GEMM path: here |Q| = |corpus|, so
    collecting the query side (cosine_topk's contract) would pull the
    whole corpus to the driver. Instead one ``applyInPandas`` per cell
    does a single ``M @ M.T`` BLAS GEMM and emits each row's top-k —
    the VECTORS shuffle once (grouped by cell); the n² pair rows never
    exist as Spark rows (the join formulation would ship each 64-float
    array once per PAIR — measured ~5× slower on the neardup scorer,
    similarity.py score_bucket, and the gap widens with cell size).
    The quadratic arithmetic is cell-bounded by construction (use
    IVF/SRP cells to cap it; at 100 TB you'd feed the SRP buckets —
    a cell must fit one executor, the bucketing contract).

    Output: one row per undirected edge, ``u < v``. Deterministic:
    row_number over (cosine desc, neighbor id asc), mirrored by the
    oracle's window.
    """
    import numpy as np

    kk = k

    def knn_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, ignore_index=True)
        ids = pdf[id_col].to_numpy()
        M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.sqrt((M * M).sum(axis=1))
        norms[norms == 0] = np.nan
        C = (M @ M.T) / np.outer(norms, norms)
        # Rank on NEAREST-GRID-quantized cosines (1e-12 grid): GEMM
        # float64 summation order differs from the oracle's sequential
        # dot-product fold in the last ulp, which can flip top-k
        # membership for near-tied cosines before any rounding
        # (ADVICE r7). round-to-nearest, not floor: exact-duplicate
        # vectors produce grid-ALIGNED cosines (exactly 1.0) where ±ulp
        # noise straddles a floor boundary but snaps to the same
        # nearest point (the 100x knn_srp_bucket finding); the residual
        # exact-half-grid tie is measure-zero (and binned half-AWAY to
        # match DuckDB — _qgrid_1e12). Same discipline as the
        # kmeans/PQ ordered folds.
        C = _qgrid_1e12(np, C)
        np.fill_diagonal(C, np.nan)  # self-matches never rank
        qa, qb = [], []
        for i in range(len(ids)):
            col = C[i]
            valid = np.flatnonzero(~np.isnan(col))
            if valid.size == 0:
                continue
            # exact top-k under the oracle's order: cos desc, id asc
            order = valid[np.lexsort((ids[valid], -col[valid]))][:kk]
            qa.extend([ids[i]] * order.size)
            qb.extend(ids[order])
        return pd.DataFrame({"qa": qa, "qb": qb}, dtype="int64")

    knn = (
        emb.select(
            F.col(cell_col).alias("__cell"),
            F.col(id_col).alias(id_col),
            F.col(vec_col).alias(vec_col),
        )
        .groupBy("__cell")
        .applyInPandas(knn_bucket, schema="qa long, qb long")
    )
    r1, r2 = knn.alias("r1"), knn.alias("r2")
    return (
        r1.join(
            r2,
            (F.col("r1.qa") == F.col("r2.qb"))
            & (F.col("r1.qb") == F.col("r2.qa")),
        )
        .where(F.col("r1.qa") < F.col("r1.qb"))
        .select(F.col("r1.qa").alias("src"), F.col("r1.qb").alias("dst"))
    )
