"""Corpus-curation operators: the end-to-end steps a training-data pipeline
runs between "raw crawl" and "training set" — benchmark decontamination,
deterministic train/val/test splitting, repetition-based quality signals,
near-dup purging, and the composed curation filter.

No counterpart in the reference (single-node stats engine); these are the
LLM-pipeline extensions (SURVEY.md section 2.1) built entirely from builtin
DataFrame algebra over the operators in text.py / dedup.py.

Scale design:
- decontamination: the eval side is small by definition (benchmarks are
  thousands of docs, the corpus is billions), so its distinct shingle set is
  BROADCAST and the probe is a map-side semi/inner join — the corpus never
  shuffles on shingle.
- hash split: pure per-row expression work (md5 of the doc id) — zero
  shuffle, stable under retries, reshards, and engine changes, which is the
  property that matters for split integrity (a rand()-based split silently
  leaks val into train on task retry).
- repetition signals: one token explode re-aggregated by doc_id (uniform
  key), same shape as text.py's stats operators.
- purge: connected components (dedup.dup_components) then a keep-the-label
  semi filter; the component table is doc-keyed — uniform join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dask_mwu_spark.cache import tracked_persist

from dask_mwu_spark.functions.hashing import MINHASH_COEFFS, md5_long
from dask_mwu_spark.operators.dedup import dup_components, exact_dedup, shingles
from dask_mwu_spark.operators.text import lang_scores, quality_scores, tokens

# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def contamination(
    train: DataFrame, eval_docs: DataFrame, *, n: int = 3
) -> DataFrame:
    """Per-training-doc overlap with an evaluation set, by shared word
    n-gram shingles: (doc_id, n_shared_shingles) for every train doc
    sharing at least one shingle with ANY eval doc.

    This is the standard n-gram decontamination test (GPT-3 appendix C /
    PaLM-style): an eval example "contaminates" a training doc if they
    share a long-enough n-gram.  The eval shingle set is deduped and
    broadcast — the corpus-side shingle table never shuffles.
    """
    ev = F.broadcast(
        shingles(eval_docs, n=n).select("shingle").distinct()
    )
    return (
        shingles(train, n=n)
        .join(ev, on="shingle")  # broadcast hash join, map-side
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


def decontaminate(
    train: DataFrame, eval_docs: DataFrame, *, n: int = 3
) -> DataFrame:
    """Training docs surviving decontamination (no shared n-gram with the
    eval set): left-anti join against the contaminated id set."""
    bad = contamination(train, eval_docs, n=n).select("doc_id")
    return train.join(bad, on="doc_id", how="left_anti")


# ---------------------------------------------------------------------------
# deterministic hash split
# ---------------------------------------------------------------------------

N_SPLIT_BUCKETS = 10_000


def hash_split(
    docs: DataFrame,
    *,
    weights: dict[str, float] | None = None,
    salt: str = "split",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket =
    md5(salt:doc_id) % 10000, split by cumulative weight thresholds.
    Adds a ``split`` column; every engine and every run assigns the same
    doc to the same split (rand()-based splits break on task retry and
    cannot be reproduced by the oracle).

    ``weights`` default {train: .9, val: .05, test: .05}; they are
    normalized, and bucket boundaries are floor(cum * 10000) — documents
    on a boundary go to the later split.
    """
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = md5_long(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    ) % N_SPLIT_BUCKETS
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        bound = int(cum * N_SPLIT_BUCKETS)
        cond = bucket < bound
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return docs.withColumn("split", expr)


def group_split(
    docs: DataFrame,
    *,
    group_col: str = "source",
    weights: dict[str, float] | None = None,
    salt: str = "gsplit",
) -> DataFrame:
    """Group-aware (source-holdout) train/val/test assignment: the split
    is decided by md5(salt:GROUP) — every document of a group lands in
    the SAME split.  Doc-level splits (``hash_split``) leak near-dups
    across the boundary whenever a source hosts templated/mirrored
    documents; holding out whole sources is the standard defense, and
    ``split_leakage`` measures how much it buys.

    Delegates to ``hash_split`` with the group column as the hashed id
    (round-7 review: the bucket scheme — md5 % 10000, cumulative-weight
    bounds, boundary docs to the later split — was duplicated verbatim;
    one implementation means a boundary-logic fix cannot diverge).
    Retry-stable, reproducible by the DuckDB oracle.  Scale: one row
    expression, no shuffle added to whatever follows; group cardinality
    is irrelevant (no group table is materialized).
    """
    return hash_split(docs, weights=weights, salt=salt, id_col=group_col)


def split_leakage(
    splits: DataFrame,
    pairs: DataFrame,
) -> DataFrame:
    """Near-dup leakage audit for a train/val/test split: label each
    verified near-dup pair with its endpoints' splits and count pairs
    per (split_a, split_b) cell — (split_a, split_b, n_pairs,
    mean_jaccard).  Off-diagonal cells ARE the leakage: a train<->test
    near-dup pair is eval contamination that survives doc-level dedup
    whenever the canonical keeps one copy on each side.  Run it once
    with ``hash_split`` and once with ``group_split`` to quantify what
    source-holdout buys.

    ``splits`` is (doc_id, split); ``pairs`` is (doc_a, doc_b, ...,
    jaccard) from ``verified_pairs``.  Scale: two key joins of the pair
    table against the split assignment (both shuffle on doc id — the
    assignment table is |corpus| rows, never broadcast), then a groupBy
    on the <= |splits|^2-cell key.  mean_jaccard rounds to 6 (the
    dedup_cross_source precedent: pair counts are LSH-bounded, the
    rounded mean absorbs sum-order noise).
    """
    sa = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("_sa")
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("_sb")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("_sa", "_sb").alias("split_a"),
            F.greatest("_sa", "_sb").alias("split_b"),
            "jaccard",
        )
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("mean_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# model-based quality scoring (hashed linear classifier)
# ---------------------------------------------------------------------------

N_CLF_BUCKETS = 64
CLF_BIAS = 0.1


def clf_weights(n_buckets: int = N_CLF_BUCKETS, seed: str = "clf") -> list[int]:
    """Deterministic integer weights in [-1e6, 1e6] (millionths), one per
    hash bucket — a stand-in for trained classifier coefficients, derived
    from md5 so tests and the DuckDB oracle can rebuild them bit-for-bit.
    A real deployment passes its fasttext/logreg coefficients instead;
    the scoring plan is identical."""
    import hashlib

    out = []
    for b in range(n_buckets):
        h = int(hashlib.md5(f"{seed}:{b}".encode()).hexdigest()[:15], 16)
        out.append(int(h % 2_000_001) - 1_000_000)
    return out


def classifier_score(
    docs: DataFrame,
    *,
    weights: list[int] | None = None,
    bias: float = CLF_BIAS,
    threshold: float = 0.5,
) -> DataFrame:
    """Quality-classifier scoring at corpus scale: a linear model over
    hashed bag-of-words features (the fasttext-style quality filter used
    to curate web corpora — CCNet/LLaMA-style), evaluated entirely as
    JVM-side DataFrame algebra: (doc_id, n_tokens, clf_score, keep).

    Model: bucket = md5(word) % B; z = bias + Σ_b tf_b · w_b where tf_b is
    the bucket's token fraction; score = sigmoid(z).  ``weights`` are
    INTEGER millionths shipped as a plan literal and folded into the
    per-token expression, so the feature sum is an exact BIGINT
    Σ count·w — no float accumulation order anywhere until the final
    sigmoid (cross-engine hash-safe, and at scale immune to partial-agg
    reordering).

    Scale: one token explode → one groupBy(doc_id) with map-side partial
    aggregation (the Σ count·w collapses per doc before the shuffle); the
    broadcast-free weight lookup is ``element_at`` on a B-element array
    literal — no join, no Python.  Cost is O(total tokens), the same shape
    as text.text_stats.
    """
    w = weights if weights is not None else clf_weights()
    n_buckets = len(w)
    warr = F.array(*[F.lit(int(x)).cast("long") for x in w])
    toks = tokens(docs)
    scored = (
        toks.withColumn("_b", md5_long(F.col("word")) % n_buckets)
        .withColumn("_w", F.element_at(warr, F.col("_b").cast("int") + 1))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_w").alias("_wsum"),
        )
        .withColumn(
            "_z",
            F.lit(bias)
            + F.col("_wsum").cast("double")
            / (F.lit(1_000_000.0) * F.col("n_tokens")),
        )
        .withColumn(
            "clf_score", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_z"))), 6)
        )
        .withColumn("keep", F.col("clf_score") >= threshold)
        .select("doc_id", "n_tokens", "clf_score", "keep")
    )
    return scored


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------


def stratified_sample(
    docs: DataFrame,
    *,
    k: int = 10,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """EXACTLY k rows per stratum, deterministically: rank rows inside each
    stratum by md5(salt:id) and keep the first k.  Unlike ``sampleBy``
    (Bernoulli per-row, approximate counts, rand()-based and thus
    retry-unstable), this gives exact counts and the same sample on every
    engine, run, and partition layout — the property audits need.

    Scale: one hash-keyed window per stratum; the sort is per-stratum
    (no global order), and skewed strata are bounded by the top-k rank
    cutoff, not materialized."""
    h = md5_long(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style quality heuristics)
# ---------------------------------------------------------------------------


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Per-doc repetition heuristics (the Gopher/MassiveText repetition
    filters, re-expressed over whitespace tokens):

    - ``top_word_frac``: count of the most frequent word / n_tokens — high
      values mean keyword-stuffed or looping text.
    - ``dup_bigram_frac``: 1 − distinct bigrams / total bigrams — high
      values mean repeated phrases.

    Both rounded to 6.  Two aggregations over the exploded token table
    (uniform doc_id shuffle key); the bigram table derives from the same
    explode via a lead() window, so the whole operator is one scan of the
    text column per branch — at corpus scale persist ``tokens(docs)``
    before calling if the plan also feeds other token consumers.
    """
    tok = tokens(docs)
    wc = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    word_stats = wc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.max("cnt").alias("top_cnt"),
    )
    # shared scan-stage bigram generator (text.adjacent_bigrams — see
    # its docstring for the measured lead()-window comparison)
    from dask_mwu_spark.operators.text import adjacent_bigrams

    bigrams = adjacent_bigrams(docs, with_pos=False).select(
        "doc_id", F.concat_ws(" ", F.col("w1"), F.col("w2")).alias("bigram")
    )
    bi_stats = bigrams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.countDistinct("bigram").alias("n_uniq_bigrams"),
    )
    return (
        word_stats.join(bi_stats, on="doc_id", how="left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("top_cnt").cast("double") / F.col("n_tokens"), 6).alias(
                "top_word_frac"
            ),
            F.round(
                F.lit(1.0)
                - F.col("n_uniq_bigrams").cast("double") / F.col("n_bigrams"),
                6,
            ).alias("dup_bigram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------


def pack_sequences(
    docs: DataFrame,
    *,
    max_tokens: int = 256,
    n_shards: int = 32,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document to a training-sequence pack, GPT-style
    concat-and-chunk: within a shard, documents are concatenated in
    ``id_col`` order and the token stream is cut into fixed ``max_tokens``
    windows; a document belongs to the pack its FIRST token lands in
    (``pack = start_offset // max_tokens``).  Adds ``shard``, ``n_tokens``
    (whitespace tokens), ``start_offset`` (tokens before this doc in its
    shard) and ``pack`` columns.

    Scale design: the prefix sum is the whole problem — a single global
    cumulative sum is one task no matter the cluster size, so packing is
    SHARDED (``shard = doc_id % n_shards``), which is how real pipelines
    pack anyway (per output file / worker).  Each shard's cumsum is an
    independent window partition; set ``n_shards`` >= cluster parallelism
    and no task ever sees more than 1/n_shards of the corpus.  The
    assignment is deterministic in (doc_id, n_shards, max_tokens) — stable
    under retries and engine changes, like ``hash_split``.
    """
    n_tok = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("shard", F.pmod(F.col(id_col), F.lit(n_shards)))
        .withColumn("n_tokens", n_tok.cast("long"))
        .withColumn(
            "start_offset", (F.sum("n_tokens").over(w) - F.col("n_tokens"))
        )
        .withColumn(
            "pack", F.floor(F.col("start_offset") / F.lit(max_tokens))
        )
    )


def pack_stats(
    docs: DataFrame, *, max_tokens: int = 256, n_shards: int = 32
) -> DataFrame:
    """Per-(shard, pack) packing summary: docs per pack and tokens starting
    in the pack — the fill-rate table a packing job reports."""
    return (
        pack_sequences(docs, max_tokens=max_tokens, n_shards=n_shards)
        .groupBy("shard", "pack")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic mixture sampling
# ---------------------------------------------------------------------------


def sample_mixture(
    docs: DataFrame,
    rates: dict[str, float],
    *,
    default_rate: float = 1.0,
    salt: str = "mix",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-source downsampling to a target corpus mixture:
    keep a doc iff ``md5(salt:doc_id) % 10000 < rate(source) * 10000``.

    The hash-gate (not ``rand()`` / ``sampleBy``) makes the sample
    reproducible across runs, engines, and task retries, and independent
    of partitioning — the properties data-mixture experiments need (the
    same doc is in or out of every ablation).  Pure per-row expression
    work: zero shuffle, fully pushdown-friendly.  Rates are capped to
    [0, 1]; upsampling is a separate concern (repeat at read time).
    """
    bucket = md5_long(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    ) % N_SPLIT_BUCKETS
    expr = None
    for src, rate in rates.items():
        bound = int(min(max(rate, 0.0), 1.0) * N_SPLIT_BUCKETS)
        cond = F.col(source_col) == src
        expr = F.when(cond, bound) if expr is None else expr.when(cond, bound)
    default_bound = int(min(max(default_rate, 0.0), 1.0) * N_SPLIT_BUCKETS)
    expr = (
        F.lit(default_bound) if expr is None else expr.otherwise(default_bound)
    )
    return docs.where(bucket < expr)


# ---------------------------------------------------------------------------
# near-dup purge + composed curation
# ---------------------------------------------------------------------------


def purge_near_dups(docs: DataFrame, pairs: DataFrame, **cc_kwargs) -> DataFrame:
    """Documents surviving near-dup purging: collapse the pair list into
    connected components (dedup.dup_components) and keep, per component,
    only the canonical survivor (the min doc_id == the component label).
    Docs in no pair survive trivially (left join, null component).
    """
    comp = dup_components(pairs, **cc_kwargs)
    return (
        docs.join(comp, on="doc_id", how="left")
        .where(F.col("component").isNull() | (F.col("component") == F.col("doc_id")))
        .drop("component")
    )


def curate(
    docs: DataFrame,
    *,
    min_quality: float = 0.5,
    max_top_word_frac: float | None = 0.2,
    require_lang_match: bool = True,
) -> DataFrame:
    """The composed corpus filter a training pipeline runs end-to-end:

    1. exact dedup (keep smallest doc_id per normalized text),
    2. quality score >= ``min_quality`` (text.quality_scores),
    3. repetition cap: top_word_frac <= ``max_top_word_frac``,
    4. language agreement: heuristic prediction matches the labeled lang
       (drops mislabeled / unidentifiable docs).

    Returns the surviving docs with their quality column attached.  Every
    stage is a doc_id-keyed join against a per-row-derived table — no
    all-pairs anywhere; the only shuffles are the dedup window and the
    doc_id joins, all on the uniform doc key.
    """
    out = exact_dedup(docs)
    q = quality_scores(docs).select("doc_id", "quality")
    out = out.join(q, on="doc_id").where(F.col("quality") >= min_quality)
    if max_top_word_frac is not None:
        rep = repetition_signals(docs).select("doc_id", "top_word_frac")
        out = out.join(rep, on="doc_id").where(
            F.col("top_word_frac") <= max_top_word_frac
        )
    if require_lang_match:
        pred = lang_scores(docs).select("doc_id", "pred_lang")
        out = out.join(pred, on="doc_id").where(
            F.col("pred_lang") == F.col("lang")
        )
    return out


def calibrated_quality_filter(
    docs: DataFrame,
    *,
    keep_fraction: float = 0.5,
    strata_col: str = "source",
    exact: bool = True,
    method: str = "agg",
) -> DataFrame:
    """Percentile-calibrated quality filtering: instead of a fixed score
    cutoff (whose meaning drifts with every corpus and model), keep the
    top ``keep_fraction`` of documents by classifier score and report per-
    stratum survival — the way production curation actually tunes its
    knives (choose a retention budget, derive the threshold).

    Returns ``(strata, n_total, n_kept, threshold)`` per stratum, where
    ``threshold`` is the GLOBAL (1 - keep_fraction) score quantile (exact
    linear interpolation — matches DuckDB ``quantile_cont`` bit-for-bit)
    and ties at the threshold are kept.

    Scale: scoring is one token pass (classifier_score); the exact
    quantile is one ``percentile`` aggregation over the (doc-level, so
    already small) score table; the 1-row threshold broadcasts back.
    ``F.percentile`` is exact but single-buffer (per-value hash map in one
    aggregation buffer) — at 1e11 docs pick one of the two scale paths:
    ``exact=True, method="histogram"`` keeps the EXACT quantile with
    bounded state (``audit.exact_quantile``: iterative histogram prune +
    value-level recount in the candidate bin, same number bit-for-bit),
    or ``exact=False`` accepts t-digest bounded error
    (``percentile_approx``, mergeable sketch).
    """
    if method not in ("agg", "histogram"):
        raise ValueError(f"unknown method {method!r}: use 'agg' or 'histogram'")
    if method == "histogram" and not exact:
        # round-7 review fix: this combination previously fell through to
        # the percentile_approx sketch SILENTLY — a contradictory request
        # (the histogram path exists precisely to keep exactness) must
        # fail loudly like the unknown-method case above
        raise ValueError(
            "method='histogram' requires exact=True (the histogram path "
            "IS the bounded-state exact quantile); use exact=False with "
            "method='agg' for the t-digest sketch"
        )
    scored = classifier_score(docs).select(
        "doc_id", "clf_score"
    )
    if strata_col not in docs.columns:
        raise ValueError(f"missing strata column {strata_col!r}")
    scored = scored.join(
        docs.select("doc_id", F.col(strata_col).alias("strata")), "doc_id"
    )
    q = F.lit(1.0 - keep_fraction)
    if exact and method == "histogram":
        from dask_mwu_spark.operators.audit import exact_quantile

        spark = docs.sparkSession
        thr = spark.createDataFrame(
            [(exact_quantile(scored, "clf_score", 1.0 - keep_fraction),)],
            "threshold: double",
        )
    else:
        thr = scored.agg(
            (
                F.percentile("clf_score", q)
                if exact
                else F.percentile_approx("clf_score", q, F.lit(10_000))
            ).alias("threshold")
        )
    return (
        scored.crossJoin(F.broadcast(thr))
        .groupBy("strata")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                (F.col("clf_score") >= F.col("threshold")).cast("long")
            ).alias("n_kept"),
            F.round(F.first("threshold"), 6).alias("threshold"),
        )
    )


def curation_funnel(
    docs: DataFrame,
    *,
    min_quality: float = 0.5,
    max_top_word_frac: float = 0.2,
) -> DataFrame:
    """Stage-by-stage loss accounting for the :func:`curate` pipeline —
    the observability every production curation run ships with (what did
    each knife cut?): ``(stage, n_in, n_out, drop_pct)`` for
    raw → exact-dedup → quality → repetition → language-match.

    Built as ONE flags table (per-doc booleans from the same derivations
    ``curate`` joins on) and ONE aggregation of progressive-AND
    conditional sums — no sequential filter/count jobs, so the whole
    report costs a single pass regardless of stage count.  Stage counts
    are definitionally consistent with ``curate``'s survivors (the last
    funnel row equals its count).
    """
    from dask_mwu_spark.operators.dedup import _text_key

    w = Window.partitionBy(_text_key(False)).orderBy("doc_id")
    flags = (
        docs.select("doc_id", "lang", "text")
        .withColumn("_keep_dedup", F.row_number().over(w) == 1)
        .join(quality_scores(docs).select("doc_id", "quality"), "doc_id")
        .join(
            repetition_signals(docs).select("doc_id", "top_word_frac"), "doc_id"
        )
        .join(lang_scores(docs).select("doc_id", "pred_lang"), "doc_id")
    )
    s1 = F.col("_keep_dedup")
    s2 = s1 & (F.col("quality") >= min_quality)
    s3 = s2 & (F.col("top_word_frac") <= max_top_word_frac)
    s4 = s3 & (F.col("pred_lang") == F.col("lang"))
    # SUM over an empty frame is NULL, not 0 — coalesce so the empty-input
    # report renders all-zero stages instead of NULLs
    wide = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.coalesce(F.sum(s1.cast("long")), F.lit(0)).alias("n1"),
        F.coalesce(F.sum(s2.cast("long")), F.lit(0)).alias("n2"),
        F.coalesce(F.sum(s3.cast("long")), F.lit(0)).alias("n3"),
        F.coalesce(F.sum(s4.cast("long")), F.lit(0)).alias("n4"),
    )
    stages = [
        ("1_exact_dedup", "n0", "n1"),
        ("2_quality", "n1", "n2"),
        ("3_repetition", "n2", "n3"),
        ("4_lang_match", "n3", "n4"),
    ]
    stack = ", ".join(
        f"'{name}', {a}, {b}" for name, a, b in stages
    )
    return wide.selectExpr(
        f"stack({len(stages)}, {stack}) AS (stage, n_in, n_out)"
    ).select(
        "stage",
        "n_in",
        "n_out",
        F.round(
            (F.col("n_in") - F.col("n_out")).cast("double")
            / F.greatest(F.col("n_in"), F.lit(1)).cast("double"),
            6,
        ).alias("drop_pct"),
    )


# ---------------------------------------------------------------------------
# token-balanced global shards (two-phase distributed prefix sum)
# ---------------------------------------------------------------------------


def token_shards(
    docs: DataFrame,
    *,
    shard_tokens: int = 4096,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    salt: str = "shard-order",
) -> DataFrame:
    """Assign every document a GLOBAL training shard so each shard holds
    ~``shard_tokens`` whitespace tokens: documents are laid out in a
    deterministic pseudo-random global order (md5 of the salted id — the
    "global shuffle" step of a training-data job, retry/engine-stable
    unlike rand()), the exclusive running token total locates each doc's
    start offset, and ``shard = start // shard_tokens``.  Adds
    ``n_tokens``, ``global_start``, ``shard``.

    Scale design — the global cumulative sum WITHOUT a global sort: the
    60-bit order key is range-split into ``n_buckets`` equal hash
    intervals, so bucket id is a pure row expression AND bucket order ==
    global order.  Phase 1 aggregates per-bucket token totals (tiny,
    n_buckets rows), turns them into exclusive bucket prefixes with a
    window over that tiny table, and broadcasts them back; phase 2 runs
    the within-bucket exclusive cumsum as a per-bucket window.  No task
    ever sorts more than ~1/n_buckets of the corpus (md5 keys are uniform
    by construction — no skew), matching the two-phase pattern of
    ``ranking.rank_values_bucketed``."""
    h = md5_long(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string")))
    divisor = -((1 << 60) // -n_buckets)  # ceil -> bucket <= n_buckets - 1
    with_key = docs.withColumn("_h", h).withColumn(
        "_bucket", F.floor(F.col("_h") / F.lit(divisor))
    ).withColumn("n_tokens", F.size(F.split("text", " ")).cast("long"))
    totals = with_key.groupBy("_bucket").agg(
        F.sum("n_tokens").alias("_btotal")
    )
    wb = (
        Window.orderBy("_bucket")  # <= n_buckets rows: tiny single-task sort
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = totals.select(
        "_bucket",
        F.coalesce(F.sum("_btotal").over(wb), F.lit(0)).alias("_bprefix"),
    )
    wl = (
        Window.partitionBy("_bucket")
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_key.join(F.broadcast(prefixes), "_bucket")
        .withColumn(
            "global_start",
            F.col("_bprefix") + F.sum("n_tokens").over(wl) - F.col("n_tokens"),
        )
        .withColumn(
            "shard", F.floor(F.col("global_start") / F.lit(shard_tokens))
        )
        .drop("_h", "_bucket", "_bprefix")
    )


def token_shard_stats(
    docs: DataFrame, *, shard_tokens: int = 4096, n_buckets: int = 64
) -> DataFrame:
    """Per-shard balance report over :func:`token_shards`: docs per shard
    and tokens STARTING in each shard (sums to the corpus total; every
    shard except the last covers >= shard_tokens - max_doc_tokens)."""
    return (
        token_shards(docs, shard_tokens=shard_tokens, n_buckets=n_buckets)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("global_start").alias("first_offset"),
        )
    )


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis A-ES keys)
# ---------------------------------------------------------------------------


def weighted_sample(
    docs: DataFrame,
    *,
    k: int = 10,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "ws",
) -> DataFrame:
    """Exact weighted sample of ``k`` rows WITHOUT replacement
    (Efraimidis & Spirakis, IPL 2006): each row gets key = ln(u)/w with u
    uniform in (0,1] and w its weight; the k largest keys are a
    probability-proportional-to-size sample.  u derives from md5 of the
    salted id, so the sample is deterministic — identical across engines,
    retries, and partitionings (a rand()-based reservoir is none of
    those).  ``key`` rounded to 6 (+0.0 so a rounded -0.0 normalizes to
    0.0 — hash-compare-safe); rows with non-positive weight are excluded
    (they have zero inclusion probability).

    The 6-decimal rounding is the cross-engine determinism compromise
    (``ln`` differs by ~1 ulp across libms, so both engines must rank
    the SAME rounded value), but it collapses nearby keys into ties —
    for large weights the whole key range is a few thousandths, so ties
    at the k-th boundary are common.  Ties break by a SALTED HASH of the
    id, not ascending id (round-7 review fix: doc_id order
    systematically favored small ids, biasing the sample away from
    weight-proportional within the tie set; a hash is uniform over the
    tie set and equally deterministic on both engines).

    Scale: key is a pure row expression; selection is orderBy().limit(k)
    = TakeOrderedAndProject (each task keeps its local k, driver merges) —
    ZERO shuffles of the corpus, the minimum possible cost for an exact
    global sample."""
    u = (md5_long(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    ).cast("double") + 1.0) / float(1 << 60)
    key = F.log(u) / F.col(weight_col).cast("double")
    tiebreak = md5_long(
        F.concat(F.lit(salt), F.lit("#tb:"), F.col(id_col).cast("string"))
    )
    order = [F.col("key").desc(), F.col("_tb").asc(), F.col(id_col).asc()]
    top = (
        docs.where(F.col(weight_col) > 0)
        .withColumn("key", F.round(key, 6) + F.lit(0.0))
        .withColumn("_tb", tiebreak)
        .orderBy(*order)
        .limit(k)
    )
    w = Window.orderBy(*order)  # k rows only — post-limit
    return top.select(
        id_col,
        F.col(weight_col).alias("weight"),
        "key",
        F.row_number().over(w).alias("rank"),
    )


# ---------------------------------------------------------------------------
# mixture divergence report
# ---------------------------------------------------------------------------


def mixture_kl(docs: DataFrame, target: dict[str, float]) -> DataFrame:
    """Per-source divergence of the corpus's ACTUAL token mixture from a
    TARGET mixture (the domain-reweighting diagnostic: is the pipeline
    delivering the data recipe it was asked for).  For each source:
    token count, actual share, target share, and the source's KL
    contribution ``actual * ln(actual / target)`` — summing the column
    gives KL(actual ‖ target).  Shares and KL terms rounded to 6.

    ``target`` weights are normalized; sources absent from ``target`` get
    a NULL target share and NULL kl term (flagging off-recipe data rather
    than silently folding it in).  Conversely a target source the corpus
    DELIVERED NOTHING of — the most important divergence the diagnostic
    exists to catch — appears as an explicit row with n_tokens=0,
    actual_share=0 and kl_term=0 (the x·ln x → 0 limit), instead of
    being silently absent (round-7 review fix; full outer join against
    the broadcast target table).

    Scale: ONE corpus scan — per-doc token counts are a row expression,
    the per-source sums a map-side-combinable groupBy on the (few-valued)
    source key, and the grand total a broadcast 1-row aggregate.  The
    target mixture is a |target|-row broadcast table."""
    total_w = sum(target.values())
    tgt = docs.sparkSession.createDataFrame(
        [(s, w / total_w) for s, w in target.items()],
        "source: string, target_share: double",
    )
    per_source = (
        docs.select(
            "source", F.size(F.split("text", " ")).cast("long").alias("_nt")
        )
        .groupBy("source")
        .agg(F.sum("_nt").alias("n_tokens"))
    )
    total = per_source.agg(F.sum("n_tokens").alias("_total"))
    n_tok = F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
    actual = n_tok.cast("double") / F.col("_total")
    return (
        per_source.join(tgt, "source", "full")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            n_tok.alias("n_tokens"),
            F.round(actual, 6).alias("actual_share"),
            F.round("target_share", 6).alias("target_share"),
            F.round(
                F.when(n_tok == 0, F.lit(0.0)).otherwise(
                    actual * F.log(actual / F.col("target_share"))
                ),
                6,
            ).alias("kl_term"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------

N_DSIR_BUCKETS = 256


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    *,
    n_buckets: int = N_DSIR_BUCKETS,
) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023): score every raw
    doc by how target-like its hashed bag-of-bigrams is, as the log
    importance ratio under two add-1-smoothed multinomials:

        log w(doc) = Σ_b  c_doc[b] · ( ln p̂_target[b] − ln p̂_raw[b] )
        p̂[b] = (C[b] + 1) / (N + B)          (add-1 over B hash buckets)

    where ``b = md5(w1 ‖ ' ' ‖ w2) mod B`` hashes each word bigram
    (md5 so the oracle rebuilds identical buckets; words contain no
    spaces, so the joint key is injective).  Sampling ∝ w is the paper's
    resampling step — ``weighted_sample`` composes directly on this
    column.  Output: (doc_id, n_bigrams, log_weight) for every ``docs``
    row; 0-bigram docs keep NULL log_weight.

    Cross-engine exactness: bucket counts are exact BIGINTs on identical
    md5 buckets, each bucket's log-ratio is one LN of a ratio of exact
    integers (bit-identical per engine), and the per-doc Σ c·ratio folds
    in ascending BUCKET order via sort_array + aggregate — same float-add
    order on any engine or partitioning.  Rounded to 6.

    Scale: one bigram explode → groupBy(doc_id, bucket) with map-side
    partial aggregation (per-doc state collapses to ≤ B rows before the
    shuffle); the target/raw distributions are ≤ B-row aggregates joined
    by BROADCAST; the per-doc fold state is ≤ B entries.  Cost is
    O(corpus tokens) with one doc-keyed shuffle — the same shape as
    text.lm_bigram_score without the per-token count join.  The target
    side is small by definition (a benchmark / curated seed set), but
    nothing here requires it: both distributions reduce to B buckets.
    No counterpart in the reference (SURVEY.md section 2.1).
    """

    def bucket_counts(d: DataFrame) -> DataFrame:
        toks = F.split(F.col("text"), " ")
        bg = d.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("bigram"),
        )
        return bg.select(
            "doc_id", (md5_long(F.col("bigram")) % n_buckets).alias("bucket")
        ).groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    # dc feeds BOTH the raw bucket distribution and the per-doc fold —
    # persist at the branch point so the corpus-wide bigram explode +
    # groupBy runs ONCE, not once per consumer (the S3-checkpoint
    # convention; at 100 TB the second scan is the whole cost)
    dc = bucket_counts(docs).transform(tracked_persist)
    tc = bucket_counts(target).groupBy("bucket").agg(F.sum("cnt").alias("ct"))
    rc = dc.groupBy("bucket").agg(F.sum("cnt").alias("cr"))
    dist = (
        rc.join(tc, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    totals = dist.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    ratio = dist.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + 1).cast("double") / (F.col("nt") + n_buckets))
            - F.log((F.col("cr") + 1).cast("double") / (F.col("nr") + n_buckets))
        ).alias("lr"),
    )
    per_doc = (
        dc.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.aggregate(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "bucket",
                            (F.col("cnt").cast("double") * F.col("lr")).alias("t"),
                        )
                    )
                ),
                F.lit(0.0).cast("double"),
                lambda acc, s: acc + s["t"],
            ).alias("_lw"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round("_lw", 6).alias("log_weight"),
        )
    )


def fuzzy_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = 3,
    est_threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy benchmark decontamination: per-training-doc MinHash-LSH
    overlap with an evaluation set — the production complement to
    ``contamination`` (exact shared shingles), which misses PARAPHRASED
    leakage: an eval item lightly reworded into the crawl keeps a high
    Jaccard but few exact 3-gram hits.  Output, for every train doc with
    at least one eval near-match: (doc_id, n_eval_matches,
    max_est_jaccard) with est_jaccard = fraction of agreeing minhash
    positions (the same 16-permutation signature as the dedup ladder),
    kept at >= ``est_threshold``.

    Scale: the eval side is small by definition (benchmarks are
    thousands of docs), so BOTH its band table and its signature table
    broadcast — the training corpus is touched by exactly ONE
    signature pass (persisted at the branch point IN ARRAY FORM: bands
    and the agreement join both read it), one sub-quadratic
    (band, band_key) equi-join, and one candidates-bounded
    signature-agreement join.  The corpus never shuffles on shingle or
    signature position.  Signatures per doc depend only on the doc's
    own text, so computing them per-side is exactly equivalent to the
    oracle's compute-then-filter — no cross-side coupling.

    Array form (optimization r13, VERDICT item 5): the former long-form
    plan exploded every candidate pair into 16 (train_id, i) rows, ran a
    16x broadcast position join and re-aggregated by (train_id,
    eval_id) — a 16x-inflated exchange per candidate.  The signature is
    a PER-DOC fact, so each side now carries one 16-slot array
    (groupBy(doc_id) with one conditional min per permutation — one
    doc-keyed exchange instead of a (doc_id, i)-keyed one 16x taller),
    band keys are array slices (pure projection, no second aggregation)
    and the agreement count is a per-row zip_with/filter expression on
    the candidates — the (train_id, eval_id, i) aggregation exchange is
    gone.
    """
    from dask_mwu_spark.operators.dedup import (
        _band_keys_from_sig_array,
        minhash_sig_arrays,
    )

    n_perm = len(MINHASH_COEFFS)
    sig_t = minhash_sig_arrays(train, n=n).transform(tracked_persist)
    # the eval signature table is tiny, but it feeds TWO broadcast
    # consumers (its band table and the agreement join) — unpersisted,
    # each broadcast job re-runs the eval shingle+minhash dataflow AND
    # re-scans the source (a doc_id predicate prunes no row groups)
    sig_e = minhash_sig_arrays(eval_docs, n=n).transform(tracked_persist)
    bands_t = _band_keys_from_sig_array(sig_t)
    bands_e = _band_keys_from_sig_array(sig_e).select(
        F.col("doc_id").alias("eval_id"), "band", "band_key"
    )
    cand = (
        bands_t.join(F.broadcast(bands_e), ["band", "band_key"])
        .select(F.col("doc_id").alias("train_id"), "eval_id")
        .distinct()
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_t"), F.col("sig_e"), lambda a, b: a == b),
            lambda x: x,
        )
    )
    est = (
        cand.join(
            sig_t.select(F.col("doc_id").alias("train_id"), F.col("sig").alias("sig_t")),
            "train_id",
        )
        .join(
            F.broadcast(
                sig_e.select(F.col("doc_id").alias("eval_id"), F.col("sig").alias("sig_e"))
            ),
            "eval_id",
        )
        .select(
            "train_id",
            "eval_id",
            F.round(agree.cast("double") / n_perm, 6).alias("est_jaccard"),
        )
    )
    return (
        est.where(F.col("est_jaccard") >= est_threshold)
        .groupBy(F.col("train_id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_matches"),
            F.max("est_jaccard").alias("max_est_jaccard"),
        )
    )


def dsir_resample(
    docs: DataFrame,
    target: DataFrame,
    *,
    k: int = 20,
    n_buckets: int = N_DSIR_BUCKETS,
    salt: str = "dsir",
) -> DataFrame:
    """The DSIR paper's RESAMPLING step composed end-to-end: an exact
    weighted sample of ``k`` docs without replacement with inclusion
    probability ∝ the importance weight exp(log_weight) from
    ``dsir_weights``.

    Log-domain Efraimidis-Spirakis: selecting the k LARGEST ln(u)/w is
    equivalent (monotone transform, w > 0) to the k SMALLEST
    ``key = ln(−ln u) − log_weight`` — the Gumbel-max form.  Working in
    the log domain avoids materializing exp(log_weight) (which
    over/underflows for strongly target-like/unlike docs) AND keeps the
    key a sum of two doubles, so cross-engine parity needs no exp()
    bit-agreement.  u derives from md5 of the salted id — deterministic
    across engines, retries, partitionings.

    Output: (doc_id, log_weight, key rounded 6, rank).  Docs with no
    bigrams (NULL weight) have zero mass and are excluded.

    Scale: dsir_weights' cost (one doc-keyed shuffle) + a pure row
    expression + orderBy().limit(k) = TakeOrderedAndProject — zero
    additional corpus shuffles.
    """
    lw = dsir_weights(docs, target, n_buckets=n_buckets)
    # clamp u strictly below 1.0: md5_long values within 64 of 2^60 round
    # UP under double conversion, making u exactly 1.0 — then ln(-ln u) is
    # ln(0), which Spark NULLs (sorting FIRST) while DuckDB yields -inf.
    # 1 - 2^-53 is the largest double below 1; probability ~6e-17/doc but
    # the clamp removes the knife-edge on both engines identically.
    u = F.least(
        (
            md5_long(
                F.concat(F.lit(salt), F.lit(":"), F.col("doc_id").cast("string"))
            ).cast("double")
            + 1.0
        )
        / float(1 << 60),
        F.lit(0.9999999999999999),
    )
    keyed = lw.where(F.col("log_weight").isNotNull()).withColumn(
        "key", F.round(F.log(-F.log(u)) - F.col("log_weight"), 6) + F.lit(0.0)
    )
    order = [F.col("key").asc(), F.col("doc_id").asc()]
    top = keyed.orderBy(*order).limit(k)
    w = Window.orderBy(*order)  # k rows only — post-limit
    return top.select(
        "doc_id", "log_weight", "key", F.row_number().over(w).alias("rank")
    )


def temperature_mixture(
    docs: DataFrame, *, alpha: float = 0.7, budget_tokens: int = 1_000_000
) -> DataFrame:
    """Temperature-based multinomial sampling weights over sources
    (Conneau & Lample 2019 / XLM-R eq. 1; the mT5/BLOOM mixture recipe):
    raise each source's token share p_s to ``alpha`` < 1 and renormalize,
    flattening the distribution so low-resource sources are upsampled.
    Per source: token mass, raw share, tempered weight, the token budget
    allocated to it, and the implied epoch factor (>1 = the source
    repeats) — (source, n_docs, n_tokens, p_raw, weight, alloc_tokens,
    epochs).

    The planning step a mixture pipeline runs BEFORE ``weighted_sample``/
    ``sample_mixture`` execute the draw: alpha=1 reproduces natural
    sampling, alpha->0 uniform; the ``epochs`` column is the
    repetition-risk audit (Muennighoff 2023's 4-epoch guidance).

    Scale: ONE corpus scan — per-doc token counts are a row expression,
    per-source sums a map-side-combinable groupBy on the few-valued source
    key, the grand totals a broadcast 1-row aggregate.  O(n_sources)
    result.

    Cross-engine exactness: p_raw is rounded to 6 BEFORE pow() so both
    engines exponentiate bit-identical doubles; pow output is rounded to 6
    (absorbing any <=1-ulp libm difference between Java Math.pow and C
    pow); the normalizing denominator sums those already-rounded doubles;
    weight rounds to 6; alloc_tokens = floor(weight * budget + 0.5) on the
    identical rounded weight; epochs = exact-integer ratio rounded to 6.
    No counterpart in the reference (SURVEY.md section 2.1).
    """
    per_source = (
        docs.select(
            "source", F.size(F.split("text", " ")).cast("long").alias("_nt")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
        )
    )
    total = per_source.agg(F.sum("n_tokens").alias("_total"))
    with_p = per_source.crossJoin(F.broadcast(total)).withColumn(
        "p_raw", F.round(F.col("n_tokens").cast("double") / F.col("_total"), 6)
    )
    with_w = with_p.withColumn(
        "_w", F.round(F.pow(F.col("p_raw"), F.lit(float(alpha))), 6)
    )
    denom = with_w.agg(F.sum("_w").alias("_denom"))
    weight = F.round(F.col("_w") / F.col("_denom"), 6)
    alloc = F.floor(weight * F.lit(float(budget_tokens)) + F.lit(0.5)).cast("long")
    return (
        with_w.crossJoin(F.broadcast(denom))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "p_raw",
            weight.alias("weight"),
            alloc.alias("alloc_tokens"),
            F.round(
                alloc.cast("double") / F.col("n_tokens").cast("double"), 6
            ).alias("epochs"),
        )
    )


def bloom_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = 3,
    m_bits: int | None = None,
) -> DataFrame:
    """Training docs surviving n-gram decontamination, with the corpus
    side pre-pruned by a Bloom filter over the eval shingle set — the
    100 TB form of ``decontaminate``.

    ``decontaminate`` broadcasts the distinct eval shingles to every
    executor; fine for a benchmark suite, but a large held-out corpus
    (dedup-against-validation, cross-pipeline exclusion lists) has more
    shingles than a broadcast can carry.  Here the eval set compresses to
    a fixed-size bit table (``build_bloom``, <=8 MB at the default
    sizing) that prunes the TRAIN shingle stream in the scan stage via k
    broadcast bit-word joins; only the surviving ~FPR + true-hit
    candidates shuffle into the exact verify join, so the expensive
    equi-join's left side drops from corpus-scale to candidate-scale.
    The final answer is EXACT — the Bloom stage only discards true
    negatives, the verify join removes its false positives — so the
    oracle is the plain exact-decontamination SQL (same contract as
    ``lineitem_bloom_semi``).

    Returns the surviving train rows (same schema as ``train``).
    """
    from dask_mwu_spark.operators.bloom import (
        DEFAULT_M_BITS,
        bloom_might_contain,
        build_bloom,
    )

    mb = DEFAULT_M_BITS if m_bits is None else m_bits
    ev_sh = shingles(eval_docs, n=n).select("shingle").distinct()
    bloom = build_bloom(ev_sh, "shingle", m_bits=mb)
    cand = bloom_might_contain(shingles(train, n=n), "shingle", bloom, m_bits=mb)
    bad = cand.join(ev_sh, "shingle").select("doc_id").distinct()
    return train.join(bad, "doc_id", "left_anti")


def dedup_aware_mixture(
    docs: DataFrame, *, alpha: float = 0.7, budget_tokens: int = 1_000_000
) -> DataFrame:
    """Temperature mixture weights over EFFECTIVE (post-dedup) token mass
    — (source, n_tokens, dup_frac, eff_tokens, p_raw, weight,
    alloc_tokens).  ``temperature_mixture`` weights raw token counts, but
    a source that is 40% duplicates contributes 40% fewer unique tokens
    than its size suggests; planning the mixture on raw mass over-samples
    duplicated crawls.  Here each source's mass is discounted by its
    exact-dup fraction (``dedup.dedup_rate_by_source``) BEFORE the
    alpha-tempering, which is the order a production mixture plan runs:
    measure dup -> discount -> temper -> allocate.

    Scale: one corpus scan computes per-doc token counts and the
    normalized-text digest together; per-source (count, countDistinct,
    token-sum) aggregates are map-side combinable; everything downstream
    is O(n_sources) arithmetic over 1-row broadcast totals.

    Cross-engine: dup_frac and eff_tokens round to 6; the effective-mass
    total folds the ROUNDED per-source values in ascending source order
    (a <=n_sources-entry fold); p_raw/weight follow the
    ``temperature_mixture`` round-before-pow contract.
    """
    from dask_mwu_spark.operators.dedup import _text_key

    per_source = (
        docs.select(
            "source",
            F.size(F.split("text", " ")).cast("long").alias("_nt"),
            _text_key(False).alias("_k"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("_nd"),
            F.countDistinct("_k").alias("_nu"),
            F.sum("_nt").alias("n_tokens"),
        )
        .select(
            "source",
            "n_tokens",
            F.round(
                F.lit(1.0) - F.col("_nu").cast("double") / F.col("_nd"), 6
            ).alias("dup_frac"),
        )
        .withColumn(
            "eff_tokens",
            F.round(
                F.col("n_tokens").cast("double")
                * (F.lit(1.0) - F.col("dup_frac")),
                6,
            ),
        )
    )
    total = per_source.groupBy().agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("source", "eff_tokens"))),
            F.lit(0.0).cast("double"),
            lambda acc, s: acc + s["eff_tokens"],
        ).alias("_total")
    )
    with_p = per_source.crossJoin(F.broadcast(total)).withColumn(
        "p_raw", F.round(F.col("eff_tokens") / F.col("_total"), 6)
    )
    with_w = with_p.withColumn(
        "_w", F.round(F.pow(F.col("p_raw"), F.lit(float(alpha))), 6)
    )
    denom = with_w.groupBy().agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("source", "_w"))),
            F.lit(0.0).cast("double"),
            lambda acc, s: acc + s["_w"],
        ).alias("_denom")
    )
    weight = F.round(F.col("_w") / F.col("_denom"), 6)
    return (
        with_w.crossJoin(F.broadcast(denom))
        .select(
            "source",
            "n_tokens",
            "dup_frac",
            "eff_tokens",
            "p_raw",
            weight.alias("weight"),
            F.floor(weight * F.lit(float(budget_tokens)) + F.lit(0.5))
            .cast("long")
            .alias("alloc_tokens"),
        )
    )
