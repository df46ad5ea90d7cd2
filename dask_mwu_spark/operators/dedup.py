"""Deduplication operators for large-scale training-data pipelines:
exact (hash groupBy), n-gram Jaccard, MinHash+LSH banding, SimHash.

All hashing is the cross-engine md5-based family (functions/hashing.py), so
every operator here has an exact DuckDB oracle twin — no engine-specific
hash functions anywhere.

Scale design notes (the whole point of these algorithms):
- exact: one groupBy on a 60-bit digest — map-side combinable, no skew
  (digests are uniform).
- n-gram Jaccard is quadratic in the worst case; the doc-frequency cap on
  shingles (``max_df``) is the standard stop-shingle guard that bounds the
  self-join blow-up (a shingle shared by d docs contributes d^2 pairs).
- MinHash+LSH replaces the all-pairs comparison with b band-bucket joins:
  only documents agreeing on one full band collide — the classic
  sub-quadratic near-dup path, and the one to use at 100 TB.
- SimHash pairs join on any-of-n bytes of the signature (pigeonhole: for
  hamming <= n_bytes-1 at least one byte is untouched under the byte-wise
  split), again avoiding all-pairs.  32-bit signatures (md5 family) are
  the oracle path; 64-bit (xxhash64, 8-byte banding) is the production
  width — collision math in functions/hashing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dask_mwu_spark.cache import tracked_persist

from dask_mwu_spark.functions.hashing import (
    MINHASH_COEFFS,
    PRIME_P,
    md5_hex,
    md5_long,
)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def normalize_text(c: F.Column) -> F.Column:
    """Canonical form for exact dedup: lowercase, trim, collapse runs of
    whitespace."""
    return F.regexp_replace(F.trim(F.lower(c)), " +", " ")


def _text_key(full_digest: bool) -> F.Column:
    c = normalize_text(F.col("text"))
    return md5_hex(c) if full_digest else md5_long(c)


def exact_dup_groups(docs: DataFrame, *, full_digest: bool = False) -> DataFrame:
    """(text_hash, n_docs, keep_doc_id): one row per distinct normalized
    text; ``keep_doc_id`` is the smallest doc_id (the survivor under
    keep-first policy).  Single map-side-combinable aggregation.

    ``full_digest=True`` keys on the full 128-bit md5 (production width —
    the 60-bit default silently merges distinct texts near 1.5e9 docs;
    collision math in functions/hashing.py).  The default stays 60-bit for
    the DuckDB oracle path."""
    return (
        docs.select(
            F.col("doc_id"), _text_key(full_digest).alias("text_hash")
        )
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def exact_dedup(docs: DataFrame, *, full_digest: bool = False) -> DataFrame:
    """Documents surviving exact dedup (keep smallest doc_id per text).
    ``full_digest=True`` = 128-bit key (see exact_dup_groups)."""
    w = Window.partitionBy(_text_key(full_digest)).orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# shingles + n-gram Jaccard
# ---------------------------------------------------------------------------


def shingles(docs: DataFrame, *, n: int = 3, max_df: int | None = None) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle).

    Built with lead() windows over the exploded token table — no arrays held
    per row, so a pathological 10 MB document costs its token count, not its
    token count squared.  ``max_df`` drops shingles appearing in more than
    that many documents (stop-shingle guard for the downstream self-join).
    """
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("word")] + [F.lead("word", i).over(w) for i in range(1, n)]
    sh = (
        toks.select("doc_id", F.concat_ws(" ", *parts).alias("shingle"),
                    F.lead("word", n - 1).over(w).alias("_last"))
        .where(F.col("_last").isNotNull())
        .select("doc_id", "shingle")
        .distinct()
    )
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("_df")
        )
        sh = (
            sh.join(df_counts, "shingle")
            .where(F.col("_df") <= max_df)
            .select("doc_id", "shingle")
        )
    return sh


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 100,
) -> DataFrame:
    """All document pairs with shingle-set Jaccard >= threshold:
    (doc_a, doc_b, jaccard).

    |A ∩ B| from the shingle self-join, |A ∪ B| = |A| + |B| − |A ∩ B| —
    the union is never materialized.  Jaccard rounded to 6 decimals
    (integer-ratio division; rounding only guards engine division quirks).

    The shingle table is persisted: it feeds three plan branches (both join
    sides + sizes) and Spark has no cross-branch CSE — without the persist
    the token-explode/window pipeline runs three times.
    """
    sh = shingles(docs, n=n, max_df=max_df).transform(tracked_persist)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), on="shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

N_HASHES = len(MINHASH_COEFFS)  # 16
BAND_SIZE = 4
N_BANDS = N_HASHES // BAND_SIZE  # 4


def minhash_signatures(docs: DataFrame, *, n: int = 3) -> DataFrame:
    """(doc_id, i, minh): 16-permutation MinHash signature over word
    3-gram shingles.

    Long-form VIEW of :func:`minhash_sig_arrays` (optimization r13): the
    former build cross-joined every shingle against the 16-row
    coefficient table and min-aggregated on (doc_id, i) — a 16x-taller
    exchange than the array build's single doc-keyed aggregate with 16
    conditional mins.  The values are pinned identical position for
    position (test_r13_ops), so this is now a posexplode of the array
    form; callers that only need per-doc facts should use the array form
    directly."""
    return minhash_sig_arrays(docs, n=n).select(
        "doc_id", F.posexplode("sig").alias("i", "minh")
    )


def minhash_sig_arrays(docs: DataFrame, *, n: int = 3) -> DataFrame:
    """(doc_id, sig: array<long>) — the SAME 16 permutation minima as
    :func:`minhash_signatures`, carried as one per-doc array.

    Optimization r13 (guide §2.3): the long form explodes every shingle
    16x through the coefficient cross join and aggregates on (doc_id, i)
    — a 16x-taller exchange whose rows are then often re-grouped by
    doc_id anyway.  Here each permutation is one conditional ``min`` in
    a single doc-keyed aggregate (identical arithmetic on the identical
    shingle hashes, so sig[i] == minh at i bit-for-bit), the exchange
    carries one row per (doc, shingle-hash) input with 16-slot partial
    state, and per-doc consumers (band slicing, signature agreement)
    become pure row expressions."""
    sh = shingles(docs, n=n)
    h = sh.select(
        "doc_id", (md5_long(F.col("shingle")) % PRIME_P).alias("hm")
    )
    mins = [
        F.min((F.col("hm") * F.lit(a) + F.lit(b)) % PRIME_P).alias(f"_m{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return h.groupBy("doc_id").agg(*mins).select(
        "doc_id",
        F.array(
            *[F.col(f"_m{i}") for i in range(len(MINHASH_COEFFS))]
        ).alias("sig"),
    )


def _band_keys_from_sig_array(sig: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) from the array signature — the
    :func:`_band_keys_from_sig` combine (sum of minh * 31^(i mod 4),
    exact in BIGINT) as a pure projection: no second aggregation."""
    keys = F.array(
        *[
            sum(
                (
                    F.element_at(F.col("sig"), band * BAND_SIZE + j + 1)
                    * F.lit(31 ** j)
                )
                for j in range(BAND_SIZE)
            )
            for band in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.posexplode(keys).alias("band", "band_key"))


def minhash_band_keys(docs: DataFrame, *, n: int = 3) -> DataFrame:
    """(doc_id, band, band_key): LSH banding of the signature — band_key is
    an order-independent integer combine of the band's 4 minhash values
    (sum of minh * 31^(i mod 4), exact in BIGINT), so the aggregation needs
    no ordered collect.  Built from the array signature (optimization
    r13): banding becomes an array-slice projection instead of a second
    aggregation over the 16x long form."""
    return _band_keys_from_sig_array(minhash_sig_arrays(docs, n=n))


def _band_keys_from_sig(sig: DataFrame) -> DataFrame:
    return (
        sig.withColumn("band", (F.col("i") / BAND_SIZE).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.sum(
                F.col("minh") * F.pow(F.lit(31.0), (F.col("i") % BAND_SIZE)).cast("long")
            ).alias("band_key")
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame, *, n: int = 3, est_threshold: float = 0.25
) -> DataFrame:
    """Candidate near-dup pairs from LSH band collisions, scored by
    estimated Jaccard = fraction of agreeing minhash positions:
    (doc_a, doc_b, est_jaccard).

    Only documents sharing a full band ever meet — the join is on
    (band, band_key), sub-quadratic at scale, and AQE's skew handling splits
    any hot bucket.

    The signature table (one 16-slot array per doc — tiny next to the
    shingle explode) is persisted: it feeds FOUR plan branches (banding +
    both sides of the estimate join via the candidate pairs), and without
    the persist Catalyst re-runs the whole shingle+minhash dataflow per
    branch (measured ~2x end-to-end on the bench corpus). This is the same
    "materialize the expensive intermediate" discipline the reference
    applies to its rank tensor (rank_data.py:221-223).

    Array form (optimization r13, the fuzzy_contamination restructure
    applied to the LSH trunk shared by the dedup AND graph families):
    the former estimate stage exploded every candidate pair into 16
    (doc, i) rows, joined positionally and re-aggregated by (doc_a,
    doc_b); signatures are per-doc facts, so the agreement count is now
    a per-row zip_with/filter expression on the candidate pairs and the
    (doc_a, doc_b, i) aggregation exchange is gone.  Values pinned
    identical by test_r13_ops + the oracle battery."""
    sig = minhash_sig_arrays(docs, n=n).transform(tracked_persist)
    bands = _band_keys_from_sig_array(sig)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), on=["band", "band_key"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("ha"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("hb"))
    agree = F.size(
        F.filter(
            F.zip_with(F.col("ha"), F.col("hb"), lambda a, b: a == b),
            lambda x: x,
        )
    )
    est = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(agree.cast("double") / N_HASHES, 6).alias("est_jaccard"),
        )
    )
    return est.where(F.col("est_jaccard") >= est_threshold)


# ---------------------------------------------------------------------------
# candidate verification (the precision stage of two-stage dedup)
# ---------------------------------------------------------------------------


def verify_jaccard(
    docs: DataFrame, cand: DataFrame, *, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """EXACT shingle-Jaccard verification of candidate pairs:
    (doc_a, doc_b, jaccard), keeping pairs with true Jaccard >= threshold.

    The precision stage of the standard two-stage near-dup pipeline:
    a cheap high-recall candidate generator (LSH bands, simhash bytes)
    proposes pairs, then the exact measure is computed ONLY on those
    candidates.  Unlike ``ngram_jaccard_pairs`` this never self-joins the
    shingle table, so it needs no ``max_df`` stop-shingle cap (which costs
    recall) and its cost is O(Σ_pairs |shingles(a)|) — linear in the
    candidate count, not quadratic in shingle document-frequency.  At
    100 TB the candidate set is the small table (LSH keeps it ~linear in
    docs), so this stage is a bounded equi-join, not a blowup.

    ``cand`` needs columns (doc_a, doc_b); extra columns (e.g. the LSH
    est_jaccard) are carried through.
    """
    sh = shingles(docs, n=n).transform(tracked_persist)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # |A ∩ B|: expand each candidate by doc_a's shingles, keep those doc_b
    # also has — two equi-joins, the second on the fat (doc_id, shingle) key
    inter = (
        cand.select("doc_a", "doc_b")
        .join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .drop("n_inter", "n_a", "n_b")
    )
    return out.where(F.col("jaccard") >= threshold)


def verified_pairs(
    docs: DataFrame,
    *,
    n: int = 3,
    est_threshold: float = 0.25,
    threshold: float = 0.5,
) -> DataFrame:
    """Two-stage near-dup pairs: MinHash-LSH candidates (recall stage)
    verified by exact shingle Jaccard (precision stage):
    (doc_a, doc_b, est_jaccard, jaccard).

    The composition a production corpus dedup actually runs — LSH bounds
    the pair count sub-quadratically, the exact measure removes LSH false
    positives (est_jaccard is a 16-sample estimate with σ ≈ 0.11 at
    J=0.25; candidates near the threshold are frequently wrong in both
    directions).
    """
    cand = minhash_lsh_pairs(docs, n=n, est_threshold=est_threshold)
    return verify_jaccard(docs, cand, n=n, threshold=threshold)


def edit_similarity_pairs(
    docs: DataFrame,
    *,
    n: int = 3,
    est_threshold: float = 0.25,
    threshold: float = 0.6,
    distance_cap: int | None = None,
) -> DataFrame:
    """LSH candidates verified by normalized Levenshtein similarity
    ``1 − lev(a, b) / max(len_a, len_b)`` over normalized text:
    (doc_a, doc_b, edit_sim), keeping edit_sim >= threshold.

    Character-level verification where shingle Jaccard is too coarse
    (short documents, heavy token overlap with different ordering).
    Levenshtein is O(len_a·len_b) per pair — viable ONLY because the LSH
    stage bounds the pair count; never run it all-pairs.  ``distance_cap``
    switches to Spark's banded ``levenshtein(l, r, cap)`` (JVM early-exit
    at cap+1, O(cap·len)) for the production path where only
    pairs within a known distance matter; the uncapped default is the
    cross-engine oracle path.
    """
    cand = minhash_lsh_pairs(docs, n=n, est_threshold=est_threshold).select(
        "doc_a", "doc_b"
    )
    txt = docs.select("doc_id", normalize_text(F.col("text")).alias("_nt"))
    ta = txt.select(F.col("doc_id").alias("doc_a"), F.col("_nt").alias("_ta"))
    tb = txt.select(F.col("doc_id").alias("doc_b"), F.col("_nt").alias("_tb"))
    joined = cand.join(ta, "doc_a").join(tb, "doc_b")
    if distance_cap is not None:
        lev = F.levenshtein(F.col("_ta"), F.col("_tb"), distance_cap)
        joined = joined.withColumn("_lev", lev).where(F.col("_lev") >= 0)
    else:
        joined = joined.withColumn("_lev", F.levenshtein(F.col("_ta"), F.col("_tb")))
    out = joined.select(
        "doc_a",
        "doc_b",
        F.round(
            F.lit(1.0)
            - F.col("_lev").cast("double")
            / F.greatest(F.length("_ta"), F.length("_tb")),
            6,
        ).alias("edit_sim"),
    )
    return out.where(F.col("edit_sim") >= threshold)


# ---------------------------------------------------------------------------
# duplicate clusters (connected components)
# ---------------------------------------------------------------------------


def dup_components(
    pairs: DataFrame, *, max_iter: int = 25, n_rounds: int | None = None
) -> DataFrame:
    """Duplicate CLUSTERS from near-dup pairs: connected components by
    iterative min-label propagation — every document gets the smallest
    doc_id in its component as ``component`` (the canonical survivor).

    Pair lists only say "a~b"; real dedup needs the transitive closure
    (a~b, b~c => one cluster {a,b,c}). This is the iterative step the SQL
    surface cannot express; each iteration is one join + grouped min over
    the edge list, state persisted between iterations, converging in
    O(diameter) rounds (near-dup clusters are shallow — a handful of
    rounds in practice; ``max_iter`` bounds adversarial chains).

    Two stopping modes (VERDICT r1 #7):
    - adaptive (default): run until no label changes, detected by a
      driver-side count per round — a job barrier per iteration.
    - fixed (``n_rounds=``): run exactly that many rounds with NO
      convergence count.  Because each round combines a hop with a
      pointer-jump, propagation distance at least doubles per round —
      ceil(log2(max chain length)) + 1 rounds suffice; callers who know
      their diameter bound (e.g. near-dup clusters from a single LSH pass
      are star-shaped, diameter <= 2·bands) skip max_iter count jobs.

    Input: any (doc_a, doc_b) pair table. Output: (doc_id, component).
    """
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(n_rounds if n_rounds is not None else max_iter):
        # hop step: each node adopts min(own comp, neighbors' comps)
        neighbor_min = (
            edges.join(labels, edges["a"] == labels["node"])
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("comp").alias("n_comp"))
        )
        hopped = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        # pointer-jump step: comp := comp(comp) — doubles the propagation
        # distance per round, so convergence is O(log diameter) instead of
        # O(diameter) (a 1M-doc duplicate chain converges in ~20 rounds)
        parents = hopped.select(
            F.col("node").alias("p_node"), F.col("comp").alias("p_comp")
        )
        new_labels = (
            hopped.join(parents, hopped["comp"] == parents["p_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("p_comp"), F.col("comp"))
                ).alias("comp"),
            )
            # localCheckpoint truncates the lineage: without it each
            # iteration's plan nests the previous one and analysis cost
            # grows until the planner overflows
            .localCheckpoint()
        )
        if n_rounds is None:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.comp") != F.col("o.comp"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    return labels.select(F.col("node").alias("doc_id"), F.col("comp").alias("component"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(docs: DataFrame, *, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): SimHash over word unigrams with counts.

    bit_b = [ sum over words of count * (+1 if bit b of word_hash else -1) > 0 ].

    The per-bit signed sums are ``bits`` AGGREGATE EXPRESSIONS in one
    map-side-combinable groupBy — not a bits-way row explode (which would
    multiply the shuffle by ``bits`` and need a second aggregation;
    rewriting this way cut the pair query ~2x). All bit columns collapse
    into the signature integer in the same projection.

    Widths (VERDICT r1 #4; collision math in functions/hashing.py):
    - ``bits=32`` (default): md5-family word hash — the DuckDB-oracle path.
    - ``bits=64``: production width (Manku et al., WWW'07) over Spark's
      builtin xxhash64 (the md5 slice only has 60 uniform bits, so bits
      60-63 would be constant).  No oracle twin; gated by the pytest that
      checks both widths agree on hamming-0 (duplicate) pairs.
    """
    if bits not in (32, 64):
        raise ValueError(f"bits must be 32 or 64, got {bits}")
    word_hash = (
        md5_long(F.col("word")) if bits == 32 else F.xxhash64(F.col("word"))
    )
    words = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("wh", word_hash)
    )
    sums = words.groupBy("doc_id").agg(
        *[
            F.sum(
                F.col("cnt")
                * F.when(
                    F.shiftright(F.col("wh"), b).bitwiseAND(1) == 1, 1
                ).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    # disjoint powers of two: bitwise OR == the previous sum form for
    # bits=32, and shiftleft(1, 63) sets the sign bit without overflow
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig.bitwiseOR(
            F.when(
                F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        )
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_pairs(
    docs: DataFrame, *, max_hamming: int = 6, bits: int = SIMHASH_BITS
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded by byte:
    pairs must share at least one of the bits/8 signature bytes (at
    hamming <= n_bytes-1 this is exact by pigeonhole; beyond that it is the
    standard recall trade-off), so the join is on (byte_index, byte_value)
    — never all-pairs.  Output (doc_a, doc_b, hamming).

    ``bits=64`` uses the production signature width with 8-byte banding
    (pigeonhole exact to hamming <= 7); the 32-bit default stays the
    oracle path.

    The simhash table (one row per doc) is persisted — it feeds both sides
    of the byte-bucket self-join, and Spark re-derives each branch from the
    raw token explode otherwise."""
    n_bytes = bits // 8
    sh = simhash(docs, bits=bits).transform(tracked_persist)
    bytes_df = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bytes - 1))).alias("k"),
    ).withColumn("byte", F.expr("shiftright(simhash, k * 8)").bitwiseAND(255))
    # a pair colliding on several bytes would surface once per match; keep
    # only the row whose k is the FIRST matching byte — a per-row predicate
    # on (sa, sb, k), replacing a DISTINCT that would shuffle the whole
    # candidate multiset (~n_bytes x the pair count) a second time
    first_match = F.lit(True)
    for k2 in range(n_bytes - 1):
        differs_at_k2 = (
            F.expr(f"shiftright(sa, {k2 * 8})").bitwiseAND(255)
            != F.expr(f"shiftright(sb, {k2 * 8})").bitwiseAND(255)
        )
        first_match = first_match & (F.when(F.col("k") > k2, differs_at_k2).otherwise(F.lit(True)))
    cand = (
        bytes_df.alias("x")
        .join(bytes_df.alias("y"), on=["k", "byte"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("sa"),
            F.col("y.simhash").alias("sb"),
            F.col("k"),
        )
        .where(first_match)
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# incremental dedup (new batch vs. historical corpus index)
# ---------------------------------------------------------------------------


def incremental_dedup_flags(
    new_docs: DataFrame,
    history_bands: DataFrame,
    *,
    n: int = 3,
    batch_bands: DataFrame | None = None,
) -> DataFrame:
    """Dedup an incoming batch against a persistent corpus index, the shape
    every production ingest pipeline has (a crawl increment lands daily; the
    full corpus never re-clusters).  No reference counterpart — the reference
    is single-dataset (SURVEY.md section 2.1); this extends its dedup family
    to continuous ingestion.

    ``history_bands`` is the accumulated LSH band index of previously KEPT
    documents — the ``(doc_id, band, band_key)`` output of
    :func:`minhash_band_keys`, maintained across runs by unioning each
    batch's kept rows (see :func:`band_index_update`).

    Returns one row per incoming document:
    ``(doc_id, dup_of_history, dup_in_batch, keep)`` where

    - ``dup_of_history``: some band collides with the history index;
    - ``dup_in_batch``: some band collides with a SMALLER-doc_id batch doc
      (first-seen-wins, evaluated greedily: a doc is dropped if ANY earlier
      batch doc shares a band, whether or not that doc itself survives —
      the monotone rule every streaming dedup uses, computable in one
      self-join with no iteration; transitive-closure clustering of a batch
      is :func:`dup_components` composed with :func:`minhash_lsh_pairs`);
    - ``keep = NOT(dup_of_history OR dup_in_batch)``.

    Documents too short to shingle (< n words) have no bands and are always
    kept — the left join reinstates them.

    100 TB design: the history index is stored bucketed by
    ``(band, band_key)`` (sources/bucketed.py), so this join shuffles ONLY
    the incoming batch (batch bands ~ 4 rows/doc) into the index's
    bucketing; history — the 100 TB side — is never re-shuffled, and a
    daily 0.1% increment costs O(batch) + the matched buckets, not
    O(corpus).  The batch-side self-join is quadratic only within a band
    bucket, the standard LSH bound.
    """
    # the internally-derived band table feeds TWO consumers below (the
    # bucket aggregate and the flags join-back), so
    # it is tracked-persisted; a CALLER-supplied batch_bands is the
    # caller's object and is NOT re-persisted or registered here — the
    # library must never let release_caches() unpersist a caller-owned
    # cache.  Callers passing a reused band table should persist it
    # themselves if their plan branches.
    batch_bands = (
        minhash_band_keys(new_docs, n=n).transform(tracked_persist)
        if batch_bands is None
        else batch_bands
    )
    # membership is a question about the KEY SET, so collapse the history
    # index to distinct (band, band_key) before joining: a hot bucket (one
    # viral template duplicated d times) would otherwise contribute
    # |batch matches| x d intermediate rows — measured 3x end-to-end on a
    # 10%-duplicated 1.6M-doc probe (tools/scale_probe_incremental.py).
    # The distinct is map-side combinable and exactly as parallel as the
    # index scan; a production index can store this key set directly.
    # Both flags are per-BUCKET facts fanned back out to docs, so compute
    # them in ONE bucket pass (optimization r12, guide §2.4): aggregate
    # the batch side once per (band, band_key) — min doc_id for the
    # greedy first-seen-wins rule (never the d^2 self-join) — left-join
    # the history KEY SET onto that bounded bucket table, re-attach to
    # the batch bands (same join key as the aggregate, so the exchange is
    # shared), and OR the flags per doc.  The earlier two-branch form
    # shuffled batch_bands by (band, band_key) three times and ran two
    # extra doc_id distincts + a second doc-level join (measured r12:
    # 30 -> ~17 Exchanges, identical rows).
    bucket = (
        batch_bands.groupBy("band", "band_key")
        .agg(F.min("doc_id").alias("_min_doc"))
        .join(
            history_bands.select("band", "band_key")
            .distinct()
            .withColumn("_hist", F.lit(True)),
            on=["band", "band_key"],
            how="left",
        )
    )
    flags = (
        batch_bands.join(bucket, on=["band", "band_key"])
        .groupBy("doc_id")
        .agg(
            F.max(F.coalesce("_hist", F.lit(False))).alias("dup_of_history"),
            F.max(F.col("doc_id") > F.col("_min_doc")).alias("dup_in_batch"),
        )
    )
    return (
        new_docs.select("doc_id")
        .join(flags, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dup_of_history", F.lit(False)).alias("dup_of_history"),
            F.coalesce("dup_in_batch", F.lit(False)).alias("dup_in_batch"),
            (
                ~(
                    F.coalesce("dup_of_history", F.lit(False))
                    | F.coalesce("dup_in_batch", F.lit(False))
                )
            ).alias("keep"),
        )
    )


def band_index_update(
    new_docs: DataFrame, history_bands: DataFrame, *, n: int = 3
) -> DataFrame:
    """The index-maintenance half of incremental dedup: history bands plus
    the bands of the batch docs that survived this run.  Writing this back
    bucketed by (band, band_key) keeps the next run's history join
    shuffle-free on the corpus side.

    The batch band table is tracked-persisted HERE (round-7 review fix:
    after incremental_dedup_flags stopped persisting caller-supplied
    tables, this caller fed four plan branches — the flags' three
    consumers plus kept_bands — with an unpersisted table, re-running
    the shingle+minhash dataflow per branch).  Library-owned, so
    registering it in the cache registry is correct."""
    bands = minhash_band_keys(new_docs, n=n).transform(tracked_persist)
    flags = incremental_dedup_flags(
        new_docs, history_bands, n=n, batch_bands=bands
    )
    kept = flags.where(F.col("keep")).select("doc_id")
    kept_bands = bands.join(kept, "doc_id")
    return history_bands.unionByName(kept_bands)


# ---------------------------------------------------------------------------
# duplicated-span detection (substring-level dedup signal)
# ---------------------------------------------------------------------------


def duplicated_spans(docs: DataFrame, *, n: int = 5) -> DataFrame:
    """Maximal duplicated token spans per document, at word-``n``-gram
    granularity — the substring-dedup signal of Lee et al., "Deduplicating
    Training Data Makes Language Models Better" (ACL'22), re-expressed
    without a suffix array: a token position is *duplicated* when the
    n-gram starting there occurs >= 2 times corpus-wide (other docs OR a
    repeat inside the same doc), and duplicated n-grams whose token ranges
    overlap or touch merge into maximal spans (gaps-and-islands with a
    variable gap: a new island starts when the start-position gap exceeds
    n-1, i.e. the previous gram's last token no longer reaches this one).

    Returns (doc_id, span_start, span_end, n_grams, span_tokens): token
    positions are 0-based inclusive, ``span_tokens = span_end - span_start
    + 1`` counts tokens covered.  Merged spans are pairwise disjoint (the
    next island's start lies strictly past the previous span_end) and have
    no internal holes (within an island consecutive gram ranges overlap),
    so per-doc sums of span_tokens are exact duplicated-token coverage.

    Scale: n-gram occurrence counting is a uniform hash-keyed groupBy with
    map-side partials (the corpus-wide df table, same shape as MinHash's
    shingle table); the position stream then re-shuffles ONCE on doc_id
    (uniform) for the per-doc island windows.  No self-join anywhere —
    cost is linear in corpus tokens, which is what makes the n-gram
    approximation scale where a distributed suffix array would not."""
    # n-gram hashes come straight off the token ARRAY (optimization r12,
    # guide §2.4): the former formulation posexploded the token stream
    # and assembled each gram with n-1 window leads over
    # (doc_id, pos) — a full corpus-token shuffle + per-doc sort before
    # any counting.  slice() over the split array builds the identical
    # "w_i .. w_{i+n-1}" strings in the scan stage; posexplode's index
    # IS the 0-based gram start, and the sequence bound reproduces the
    # old lead(word, n-1) IS NOT NULL cutoff exactly (docs shorter than
    # n tokens emit no grams — the when() guards sequence's descending
    # behavior on a negative end).
    toks_arr = docs.select("doc_id", F.split("text", " ").alias("_toks"))
    garr = F.when(
        F.size("_toks") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("_toks") - F.lit(n)),
            lambda i: md5_long(
                F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, F.lit(n)))
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = toks_arr.select(
        "doc_id", F.posexplode(garr).alias("pos", "h")
    )
    occ = grams.groupBy("h").agg(F.count(F.lit(1)).alias("_occ"))
    dup_pos = (
        grams.join(occ, "h").where(F.col("_occ") >= 2).select("doc_id", "pos")
    )
    # variable-gap islands: boundary when this duplicated start is more
    # than n-1 past the previous one (gram ranges no longer overlap/touch);
    # island id = running count of boundaries.  Both windows share ONE
    # per-doc sort.
    boundary = F.when(
        F.col("pos") - F.lag("pos").over(w) > n - 1, F.lit(1)
    ).otherwise(F.lit(0))
    island = F.sum(boundary).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ).alias("_island")
    return (
        dup_pos.select("doc_id", "pos", island)
        .groupBy("doc_id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            "n_grams",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def span_dedup_stats(docs: DataFrame, *, n: int = 5) -> DataFrame:
    """Per-doc duplicated-coverage summary over :func:`duplicated_spans`:
    how much of each document is corpus-duplicated text (the filter signal
    — docs above a dup_frac threshold get dropped or trimmed).  LEFT join
    back to all docs so never-duplicated documents report 0.  ``dup_frac``
    rounded to 6.

    Scale: one doc_id-keyed LEFT join of the (already doc_id-partitioned)
    span aggregate onto the doc-length projection — uniform key, AQE
    coalesces the post-join partitions."""
    spans = duplicated_spans(docs, n=n)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
        F.max("span_tokens").alias("max_span_tokens"),
    )
    lens = docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    return lens.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.coalesce("max_span_tokens", F.lit(0)).alias("max_span_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)).cast("double") / F.col("n_tokens"),
            6,
        ).alias("dup_frac"),
    )


def dedup_rate_by_source(docs: DataFrame, *, full_digest: bool = False) -> DataFrame:
    """Per-source exact-duplication report: doc count, distinct normalized
    texts, and the duplicate fraction — the per-crawl/per-domain health
    metric a corpus dashboard leads with.  ``dup_frac`` rounded to 6.

    Scale: countDistinct over (source, digest) — Spark plans it as two
    cascaded aggregations (partial distinct on the composite key, then the
    per-source count), both map-side combinable; the text itself collapses
    to its digest in the scan stage, so only fixed-width hashes shuffle."""
    return (
        docs.select("source", _text_key(full_digest).alias("_k"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("_k").alias("n_uniq"),
        )
        .select(
            "source",
            "n_docs",
            "n_uniq",
            F.round(
                1.0 - F.col("n_uniq").cast("double") / F.col("n_docs"), 6
            ).alias("dup_frac"),
        )
    )


def trim_duplicated_spans(docs: DataFrame, *, n: int = 5) -> DataFrame:
    """Rewrite each document with its corpus-duplicated spans REMOVED —
    the trim policy of Lee et al. ACL'22 (cutting the duplicated substring
    instead of dropping the whole document keeps the unique remainder).
    Returns (doc_id, clean_text, n_tokens, n_removed); ``clean_text`` is
    the surviving tokens re-joined in order (empty string when the doc is
    entirely duplicated).

    Spans from :func:`duplicated_spans` are pairwise disjoint, so each
    token matches at most one span and removed counts are exact.

    Scale: the token→span assignment is a doc_id equi-join with a range
    predicate on top — per-doc span lists are small, the join key is the
    uniform doc id, and no nested-loop join appears; the rebuild is one
    collect_list per doc (bounded by doc length) sorted in-memory per row,
    not a window."""
    spans = duplicated_spans(docs, n=n).select(
        "doc_id", "span_start", "span_end"
    )
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    marked = toks.join(
        spans,
        on=[
            toks["doc_id"] == spans["doc_id"],
            F.col("pos") >= F.col("span_start"),
            F.col("pos") <= F.col("span_end"),
        ],
        how="left",
    ).select(toks["doc_id"], "pos", "word", "span_start")
    rebuilt = (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("span_start").isNotNull(), 1).otherwise(0)
            ).alias("n_removed"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("span_start").isNull(),
                                F.struct("pos", "word"),
                            )
                        )
                    ),
                    lambda x: x["word"],
                ),
            ).alias("clean_text"),
        )
    )
    return rebuilt.select("doc_id", "clean_text", "n_tokens", "n_removed")


def tfidf_cosine_pairs(
    docs: DataFrame, *, n: int = 3, threshold: float = 0.3, max_df: int = 200
) -> DataFrame:
    """Weighted lexical near-dup pairs: cosine similarity over tf-idf
    n-gram-shingle vectors via an inverted-index join (the classic sparse
    similarity join — complements the SET-based ``ngram_jaccard_pairs``
    and the embedding paths by weighting rare shared shingles above
    boilerplate and by counting repeats instead of collapsing them).

    Semantics: the vector space is the word ``n``-gram shingles with
    document frequency <= ``max_df`` (the standard stop-shingle/df prune
    — dropped terms are exactly the lowest-idf, least-discriminative
    ones); weights are ``tf * ln(n_docs / df)``; norms are over the SAME
    pruned space, so cosine is well-defined and engine-reproducible.
    Emits (doc_a, doc_b, n_common_terms, cosine) for cosine >= threshold,
    doc_a < doc_b, rounded to 6.

    Scale: per-shingle fanout in the self-join is bounded by C(df, 2) <=
    C(max_df, 2) — no all-pairs anywhere; the pair-score shuffle is keyed
    on (doc_a, doc_b), uniform by construction.  Shingle tf is built with
    lead() windows over the exploded token table (token-linear, no
    per-row arrays).  Per-doc norms and per-pair dots fold their float
    sums in ascending shingle order (sort_array + aggregate), so results
    are identical on any engine or partitioning — the same
    order-free-sum discipline as ``text.bm25_topk``.
    """
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    lw = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("word")] + [F.lead("word", i).over(lw) for i in range(1, n)]
    tf = (
        toks.select(
            "doc_id",
            F.concat_ws(" ", *parts).alias("term"),
            F.lead("word", n - 1).over(lw).alias("_last"),
        )
        .where(F.col("_last").isNotNull())
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    df_ = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
    )
    w = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("w"),
        )
        .transform(tracked_persist)
    )
    # a doc whose surviving terms ALL have df == n_docs has idf 0
    # everywhere -> zero norm -> cosine undefined; such docs carry no
    # discriminative signal, so they leave the vector space (also keeps
    # the division ANSI-safe)
    norms = w.groupBy("doc_id").agg(
        F.sqrt(
            F.aggregate(
                F.sort_array(
                    F.collect_list(
                        F.struct("term", (F.col("w") * F.col("w")).alias("ww"))
                    )
                ),
                F.lit(0.0).cast("double"),
                lambda acc, s: acc + s["ww"],
            )
        ).alias("norm")
    ).where(F.col("norm") > 0)
    pairs = (
        w.alias("a")
        .join(w.alias("b"), "term")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_common_terms"),
            F.aggregate(
                F.sort_array(
                    F.collect_list(
                        F.struct("term", (F.col("a.w") * F.col("b.w")).alias("p"))
                    )
                ),
                F.lit(0.0).cast("double"),
                lambda acc, s: acc + s["p"],
            ).alias("dot"),
        )
    )
    na = norms.select(
        F.col("doc_id").alias("doc_a"), F.col("norm").alias("norm_a")
    )
    nb = norms.select(
        F.col("doc_id").alias("doc_b"), F.col("norm").alias("norm_b")
    )
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common_terms",
            F.round(
                F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def sorted_neighborhood_pairs(docs: DataFrame, *, window: int = 3) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernandez/Stolfo SNM,
    the classic record-linkage blocking method): order the corpus by the
    normalized text key and emit every pair within ``window`` positions,
    with the exact normalized-key match flag.  Complements hash blocking
    (LSH/SimHash): SNM catches near-dups whose PREFIX agrees (truncated
    or appended-suffix variants) that whole-document hashing splits
    across buckets.

    Scale — NO global window sort: the global rank is computed in two
    phases like ``cur.token_shards``: (1) bucket rows by the 2-char
    prefix of the sort key (prefix buckets are contiguous under the sort
    order, so per-bucket ranks + bucket offsets compose to the exact
    global rank); (2) rank inside each bucket with a partitioned window;
    (3) bucket offsets come from a bucket-count table that is tiny (<=
    alphabet^2 rows) and joined broadcast.  Neighbor pairing is an
    EQUI-join on ``rank_b = rank_a + delta`` with delta exploded from
    1..window — uniform integer key, no range/nested-loop join, and
    cross-bucket neighbors work because ranks are globally continuous.
    """
    key = normalize_text(F.col("text"))
    keyed = docs.select("doc_id", key.alias("_key")).select(
        "doc_id", "_key", F.substring("_key", 1, 2).alias("_bkt")
    )
    counts = keyed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_n"))
    off_w = (
        Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    )  # bucket-count table only: <= |prefix alphabet|^2 rows
    offsets = counts.select(
        "_bkt", F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off")
    )
    rank_w = Window.partitionBy("_bkt").orderBy("_key", "doc_id")
    ranked = (
        keyed.join(F.broadcast(offsets), "_bkt")
        .select(
            "doc_id",
            "_key",
            (F.col("_off") + F.row_number().over(rank_w)).alias("rank"),
        )
        .transform(tracked_persist)
    )
    probes = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("_key").alias("_key_a"),
        F.col("rank").alias("rank_a"),
        F.explode(
            F.array(*[F.lit(d) for d in range(1, window + 1)])
        ).alias("_delta"),
    ).select(
        "doc_a", "_key_a", "rank_a", (F.col("rank_a") + F.col("_delta")).alias("rank")
    )
    return probes.join(ranked, "rank").select(
        "doc_a",
        F.col("doc_id").alias("doc_b"),
        "rank_a",
        F.col("rank").alias("rank_b"),
        (F.col("_key_a") == F.col("_key")).cast("long").alias("same_norm"),
    )


def containment_pairs(
    docs: DataFrame,
    *,
    n: int = 3,
    est_threshold: float = 0.25,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidates verified by shingle CONTAINMENT — the asymmetric
    near-dup measure ``|S(a) ∩ S(b)| / min(|S(a)|, |S(b)|)`` (Broder's
    max-containment).  Jaccard misses the quote/excerpt case: a short doc
    fully embedded inside a long one has J = |a|/|b| → 0 but containment
    = 1.  Output (doc_a, doc_b, jaccard, containment) for pairs whose
    containment >= ``threshold``; both measures are emitted so the caller
    can distinguish full near-dups (both high) from subset dups
    (containment high, Jaccard low).

    Scale: identical shape to ``verify_jaccard`` — the LSH recall stage
    bounds the pair count, intersections are two equi-joins on the
    (doc_id, shingle) key, per-pair cost linear in shingle count.  The
    one caveat vs Jaccard: LSH on MinHash signatures targets JACCARD
    recall, so subset pairs with tiny Jaccard can be missed at the
    candidate stage (docstring contract: containment is exact GIVEN the
    candidate set).  No counterpart in the reference (SURVEY 2.1).
    """
    cand = minhash_lsh_pairs(docs, n=n, est_threshold=est_threshold).select(
        "doc_a", "doc_b"
    )
    sh = shingles(docs, n=n).transform(tracked_persist)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"n_inter": 0})
        .join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("n_inter").cast("double") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
    )
    return out.where(F.col("containment") >= threshold)


def lsh_recall_eval(
    docs: DataFrame,
    *,
    n: int = 3,
    est_threshold: float = 0.25,
    threshold: float = 0.5,
    max_df: int = 100,
) -> DataFrame:
    """Recall/precision of the MinHash-LSH candidate generator against the
    exact shingle-Jaccard ground truth — the tuning harness every LSH
    deployment needs before trusting its band/row configuration on a real
    corpus (est_threshold and the 16-sample signature both trade recall
    for cost; this measures what was actually traded).  ONE summary row:
    ``(n_truth, n_candidates, n_hit, recall, precision)`` where truth =
    pairs with exact Jaccard >= ``threshold`` (df-capped like
    ``ngram_jaccard_pairs``; the cap bounds the truth join and is part of
    the reported definition) and candidates = LSH pairs at
    ``est_threshold``.

    Scale: both pair tables are bounded (truth by the df cap, candidates
    by LSH), the comparison is one full-outer equi-join on the pair key +
    a 1-row aggregate; ratios are single divisions of exact BIGINTs.  Run
    it on a sampled partition of the real corpus, not the full 100 TB —
    the measurement transfers; the df-capped truth join does not.
    """
    truth = ngram_jaccard_pairs(
        docs, n=n, threshold=threshold, max_df=max_df
    ).select("doc_a", "doc_b", F.lit(1).alias("_t"))
    cand = minhash_lsh_pairs(docs, n=n, est_threshold=est_threshold).select(
        "doc_a", "doc_b", F.lit(1).alias("_c")
    )
    j = truth.join(cand, ["doc_a", "doc_b"], "full_outer")
    return j.agg(
        F.sum("_t").cast("long").alias("n_truth"),
        F.sum("_c").cast("long").alias("n_candidates"),
        F.sum(
            F.when(F.col("_t").isNotNull() & F.col("_c").isNotNull(), 1)
        ).cast("long").alias("n_hit"),
    ).select(
        "n_truth",
        "n_candidates",
        "n_hit",
        F.round(F.col("n_hit").cast("double") / F.col("n_truth"), 6).alias(
            "recall"
        ),
        F.round(
            F.col("n_hit").cast("double") / F.col("n_candidates"), 6
        ).alias("precision"),
    )


def cross_source_matrix(docs: DataFrame, **vp_kwargs) -> DataFrame:
    """Inter-source duplication matrix: verified near-dup pairs rolled up
    to the (source_a, source_b) level — (source_a, source_b, n_pairs,
    mean_jaccard), source_a <= source_b so each unordered source pair
    appears once.

    The provenance audit a multi-source corpus runs after dedup: diagonal
    entries are within-source redundancy (crawler re-fetches, mirrors),
    off-diagonal entries reveal which sources copy from each other
    (syndication, scraped aggregators) — the signal that decides whether
    to drop a source entirely rather than pay per-pair dedup cost for it.

    Scale: the pair table is the LSH-bounded ``verified_pairs`` output
    (~linear in docs), so the two doc_id->source lookups are equi-joins of
    a small table against a two-column projection of the corpus, and the
    final groupBy keys on the few-valued source pair.  Nothing here
    touches text after the verify stage.

    Cross-engine: jaccard values arrive already rounded to 6 from
    ``verify_jaccard``; mean_jaccard averages those rounded doubles and
    rounds to 6 again.  No counterpart in the reference (SURVEY.md
    section 2.1).
    """
    pairs = verified_pairs(docs, **vp_kwargs)
    src = docs.select("doc_id", "source")
    labelled = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("_sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("_sb")),
            "doc_b",
        )
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            "jaccard",
        )
    )
    return labelled.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("jaccard"), 6).alias("mean_jaccard"),
    )


def canonical_by_quality(docs: DataFrame, **pair_kwargs) -> DataFrame:
    """Quality-aware canonical selection: for each near-dup component, keep
    the HIGHEST-quality member instead of the smallest doc_id — (component,
    n_members, kept_doc, quality).  Min-id survival (``dup_purge``) is
    arbitrary; a production dedup keeps the best version of the duplicated
    content (longest / cleanest / least boilerplate), which is exactly the
    composite ``text.quality_scores`` ranks.

    Scale: components come from the LSH pair chain (bounded); quality is
    scan-stage row expressions; the winner per component is ONE
    map-side-combinable ``max(struct(quality, -doc_id))`` — no per-component
    sort or window, tiebreak = smaller doc_id on equal quality.

    Cross-engine: quality arrives rounded to 6 from ``quality_scores``;
    counts exact.  Reference keeps first-occurrence only (SURVEY.md
    section 2.1 — no quality notion exists there).
    """
    from dask_mwu_spark.operators.text import quality_scores

    comps = dup_components(minhash_lsh_pairs(docs, **pair_kwargs))
    q = quality_scores(docs).select("doc_id", "quality")
    return (
        comps.join(q, "doc_id")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(
                F.struct(
                    F.col("quality"), (-F.col("doc_id")).alias("_nid")
                )
            ).alias("_b"),
        )
        .select(
            "component",
            "n_members",
            (-F.col("_b._nid")).alias("kept_doc"),
            F.col("_b.quality").alias("quality"),
        )
    )
