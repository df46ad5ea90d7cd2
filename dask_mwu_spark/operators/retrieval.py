"""Hybrid retrieval: reciprocal-rank fusion of heterogeneous rankers.

The standard way a training-data / RAG pipeline combines lexical
(BM25) and dense (embedding-cosine) retrieval is reciprocal-rank
fusion (Cormack, Clarke & Buettcher, SIGIR 2009): each ranker
contributes ``1 / (k_rrf + rank)`` for every item it returns, and
items are re-ranked by the summed score.  RRF fuses on RANKS, not
scores, so rankers with incomparable score scales (BM25 sums vs
cosines) combine without calibration — which is exactly why it is the
default hybrid mode in Elasticsearch/OpenSearch and most vector DBs.

Scale design: fusion operates on the rankers' TOP-``depth`` lists,
which are depth-bounded by construction (each ranker ends in a
TakeOrderedAndProject) — the fuse itself therefore joins tiny tables
regardless of corpus size; the corpus-scale work lives entirely inside
the upstream rankers, each with its own documented contract
(:func:`~dask_mwu_spark.operators.text.bm25_topk` scans tokens once
with the query-term filter pushed before the aggregation; the dense
side is one vectorized scan for a single query vector, and any ANN
ladder output — LSH / IVF / IVF-PQ — plugs into :func:`rrf_fuse`
unchanged since all emit ranked lists).

No counterpart in the reference (SURVEY.md section 2.1) — the
reference is a stats engine (dask-mwu) with no retrieval surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dask_mwu_spark.operators.similarity import _with_vec, dot
from dask_mwu_spark.operators.text import bm25_topk


def rrf_fuse(
    ranked: dict[str, DataFrame],
    *,
    k: int = 10,
    k_rrf: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuse named ranked lists by reciprocal-rank fusion.

    Each input must carry ``(id_col, rank)`` with ``rank`` 1-based and
    ids UNIQUE within a list (the shape every top-k operator in this
    package emits; a list with duplicate ids would fan out through the
    outer joins).  Output:
    ``(id_col, <name>_rank ... , rrf_score, n_lists, rank)`` — one
    ``<name>_rank`` column per input (NULL when that ranker did not
    return the item), ``rrf_score = round(sum 1/(k_rrf + rank), 6)``
    summed in the callers' dict order (a FIXED expression-tree order,
    so the float sum cannot drift on partitioning), ``n_lists`` the
    number of rankers that returned the item, and ``rank`` the fused
    1-based rank (score desc, id asc — ties across single-list items
    with equal ranks resolve deterministically by id).

    Scale: the inputs are top-``depth`` lists, so every join here is
    bounded by ``depth x n_rankers`` rows — a driver-trivial fuse no
    matter the corpus size behind the rankers.  The joins are full
    outer (an item may appear in any subset of lists), which Spark
    executes as a sort-merge over the tiny lists; no corpus-side data
    moves.
    """
    if not ranked:
        raise ValueError("ranked must contain at least one list")
    if k_rrf <= 0:
        raise ValueError(f"k_rrf must be >= 1, got {k_rrf}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    names = list(ranked)
    fused = None
    for name in names:
        df = ranked[name]
        missing = {id_col, "rank"} - set(df.columns)
        if missing:
            raise ValueError(
                f"ranked list {name!r} is missing columns {sorted(missing)}; "
                f"expected ({id_col}, rank)"
            )
        cur = df.select(
            F.col(id_col),
            F.col("rank").cast("long").alias(f"{name}_rank"),
        )
        fused = cur if fused is None else fused.join(cur, id_col, "full_outer")

    score = None
    hits = None
    for name in names:
        r = F.col(f"{name}_rank")
        term = F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + r), F.lit(0.0))
        hit = F.when(r.isNotNull(), F.lit(1)).otherwise(F.lit(0))
        score = term if score is None else score + term
        hits = hit if hits is None else hits + hit

    rank_cols = [f"{n}_rank" for n in names]
    scored = fused.select(
        id_col,
        *rank_cols,
        F.round(score, 6).alias("rrf_score"),
        hits.cast("long").alias("n_lists"),
    )
    order = [F.col("rrf_score").desc(), F.col(id_col).asc()]
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)  # k rows only — post-limit
    return top.select(
        id_col,
        *rank_cols,
        "rrf_score",
        "n_lists",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def hybrid_bm25_cosine_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    *,
    query_vec_id: int = 0,
    k: int = 10,
    depth: int = 20,
    k_rrf: int = 60,
) -> DataFrame:
    """Hybrid lexical+dense retrieval: BM25 over ``docs.text`` fused
    with embedding-cosine against the vector of ``query_vec_id``, by
    :func:`rrf_fuse`.  The dense candidate set is restricted to ids
    present in ``docs`` (``vec_id = doc_id`` — the aligned-id
    convention), so the fused id domain is documents on both paths;
    the query vector's own id is excluded (the ``cosine_topk``
    convention).  Output: ``(doc_id, bm25_rank, cosine_rank,
    rrf_score, n_lists, rank)``.

    Determinism follows the package discipline at every float
    boundary: BM25 folds term scores in ascending term order and
    rounds to 6; cosine rounds to 6 before ranking with the vec_id
    tiebreak; the RRF sum is two fixed-order terms rounded to 6.

    Scale: one token scan (query-term filter pushed below the agg) +
    one vector scan for a single query vector; both rankers end in
    TakeOrderedAndProject at ``depth``, so the fuse sees at most
    ``2 x depth`` rows.  At billion-vector scale, swap the dense side
    for an ANN ladder output and fuse the same way — :func:`rrf_fuse`
    only sees ranked lists.
    """
    lex = bm25_topk(docs, query_terms, k=depth).select("doc_id", "rank")

    vecs = _with_vec(emb)
    qv = vecs.where(F.col("vec_id") == query_vec_id).select(
        F.col("vec").alias("q_vec"), F.col("nrm").alias("q_nrm")
    )
    # ADVICE r10 (low): an absent query_vec_id made the dense cross
    # join empty, silently degrading to lexical-only fusion with
    # plausible-looking output (cosine_rank all NULL).  Fail loudly
    # instead — the probe is one pushed-filter scan returning <= 1 row
    # (the bounded-collect contract).
    if not qv.take(1):
        raise ValueError(
            f"query_vec_id={query_vec_id} not found in emb; the dense "
            "ranker would be empty and fusion would silently degrade "
            "to lexical-only"
        )
    doc_ids = docs.select("doc_id").distinct()
    dense_scored = (
        vecs.join(doc_ids, vecs["vec_id"] == doc_ids["doc_id"], "left_semi")
        .where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                dot(F.col("vec"), F.col("q_vec"))
                / (F.col("nrm") * F.col("q_nrm")),
                6,
            ).alias("cosine"),
        )
    )
    order = [F.col("cosine").desc(), F.col("doc_id").asc()]
    dense_top = dense_scored.orderBy(*order).limit(depth)
    w = Window.orderBy(*order)  # depth rows only — post-limit
    dense = dense_top.select(
        "doc_id", F.row_number().over(w).alias("rank")
    )

    return rrf_fuse(
        {"bm25": lex, "cosine": dense}, k=k, k_rrf=k_rrf, id_col="doc_id"
    )
