"""Deduplication operators for training-data pipelines (north-star
extension): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
near-dup.

Test corpus: `documents` unioned with a derived near-duplicate of
every 4th doc (first word dropped, doc_id+100000), so each algorithm
has planted positives to find deterministically.

Scale design (100 TB):
- exact: one groupBy on md5(text) — shuffle carries (hash, id), not
  text.
- MinHash LSH: shingle explode -> per-doc minhash signature (one
  partial-aggregated groupBy) -> band keys -> self-join on band
  bucket. Only docs sharing a band bucket ever pair up, so the join
  is |bucket|^2 per bucket, not |corpus|^2; band count / rows-per-band
  trade recall vs cost exactly as in the original LSH formulation.
- SimHash: per-doc 16-bit signature via one aggregate; duplicate
  buckets via groupBy(signature) — no pairwise work at all.
- n-gram Jaccard verification: runs only on LSH candidates (a few
  pairs), each verified by one shingle-set intersection join.
- embedding near-dup: sign-bit LSH bucket (8 hyperoctants on leading
  dims) bounds the pairwise cosine to within-bucket pairs; exact
  scaled-integer arithmetic keeps the oracle bit-identical.

The minhash uses MIN(md5(seed || shingle)) — a string-min over a
cryptographic hash is a uniform random permutation proxy available
identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.queries import query, tables

# near-dup corpus: every 4th doc also appears with its first word
# dropped and doc_id shifted
_CORPUS_SQL = """
  corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000,
           substr(text, strpos(text, ' ') + 1)
    FROM documents WHERE doc_id % 4 = 0 AND strpos(text, ' ') > 0)
"""

_SHINGLES_SQL = """
  words AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
  shingles AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
    FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
    WHERE len(w) >= 3)
"""


def _corpus(t):
    d = t["documents"]
    dup = (
        d.filter((F.col("doc_id") % 4 == 0) & (F.instr("text", " ") > 0))
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
        )
    )
    return d.select("doc_id", "text").unionByName(dup)


# shared with the incremental dedup index (operators/dedup_index.py);
# the implementation (and its Generate-barrier rationale) lives in
# operators/shingles.py so both layers import it cycle-free
from idhub_spark.operators.shingles import word_shingles as _shingles  # noqa: E402


@query(
    "exact_dedup",
    f"""
    WITH {_CORPUS_SQL}
    SELECT md5(text) AS text_hash, COUNT(*) AS n_copies,
           min(doc_id) AS keeper,
           array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
    FROM corpus
    GROUP BY text_hash
    HAVING COUNT(*) > 1
    """,
    doc="Exact dedup: hash-groupBy on content hash; keeper = min id "
    "(shuffle carries 32-byte hashes, not documents).",
)
def exact_dedup(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    corpus = _corpus(t).unionByName(
        # plant exact copies too: doc 1 texts repeated at +200000
        t["documents"]
        .filter(F.col("doc_id") % 10 == 1)
        .select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    )
    return (
        corpus.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper"),
            F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias("doc_ids"),
        )
        .filter(F.col("n_copies") > 1)
    )


# the oracle needs the exact-copy plant too, so it is re-declared in
# full and patched onto the registry entry below
_EXACT_ORACLE = f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, substr(text, strpos(text, ' ') + 1)
      FROM documents WHERE doc_id % 4 = 0 AND strpos(text, ' ') > 0
      UNION ALL
      SELECT doc_id + 200000, text FROM documents WHERE doc_id % 10 = 1)
    SELECT md5(text) AS text_hash, COUNT(*) AS n_copies,
           min(doc_id) AS keeper,
           array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
    FROM corpus
    GROUP BY text_hash
    HAVING COUNT(*) > 1
    """


_N_HASHES = 4  # oracle-checked default: 2 bands x 2 rows


def _sql_minhash(i):
    return f"min(md5(CAST({i} AS VARCHAR) || ':' || sh))"


def _lsh_candidates(sh, *, n_hashes: int, bands: int):
    """Banded-minhash candidate pairs from a (doc_id, sh) shingle
    frame: per-doc signature (one partial-aggregated groupBy) -> band
    keys -> per-band bucket self-join. Split out of minhash_lsh_pairs
    so lsh_param_sweep can count candidates (the COST axis of the
    banding trade) before verification."""
    rows = n_hashes // bands
    if rows * bands != n_hashes:
        raise ValueError("n_hashes must be divisible by bands")
    hashes = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sigs = sh.groupBy("doc_id").agg(*hashes)
    bands_df = None
    for bi in range(bands):
        cols = [f"h{bi * rows + r}" for r in range(rows)]
        part = sigs.select(
            "doc_id", F.lit(bi).alias("band"), F.concat_ws("|", *cols).alias("bkey")
        )
        bands_df = part if bands_df is None else bands_df.unionByName(part)
    a, b = bands_df.alias("a"), bands_df.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    corpus,
    *,
    n_hashes: int = _N_HASHES,
    bands: int = 2,
    threshold: float = 0.5,
):
    """Parameterized MinHash+LSH near-duplicate pairs.

    Banding recall: with r = n_hashes/bands rows per band, a pair with
    true Jaccard j becomes a candidate with probability
    1 - (1 - j^r)^bands (the S-curve of the original LSH formulation).
    The 4/2 default is toy-sized for the oracle gate; at corpus scale
    pick e.g. n_hashes=128, bands=32 (r=4) for a ~0.5-threshold knee
    with >0.97 recall at j=0.8.

    Plan shape (scale-safe at any parameterization): shingle explode
    -> per-doc signature (ONE partial-aggregated groupBy; the shuffle
    carries n_hashes 32-byte minima per doc, not shingles) -> band
    keys -> self-join per band bucket (|bucket|^2 per bucket, never
    |corpus|^2) -> exact-Jaccard verify on candidates only.
    """
    # NOTE: deliberately NOT persisted — the shingle distinct's
    # exchange is ReusedExchange'd across all four consumers
    # (signatures, both verify-join sides, sizes); persisting replaces
    # that free reuse with cache write+read and measured SLOWER
    # (3.1s vs 2.0s at sf0.1). See the verify skill's Generate-barrier
    # note; ngram_jaccard_pairs persists because its anti-join-filtered
    # index breaks exchange reuse.
    sh = _shingles(corpus)
    cand = _lsh_candidates(sh, n_hashes=n_hashes, bands=bands)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa, sb = sh.alias("sa"), sh.alias("sb")
    inter = (
        cand.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, (F.col("sb.doc_id") == F.col("doc_b")) & (F.col("sa.sh") == F.col("sb.sh")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# corpus -> shingles -> minhash signatures -> banded candidates ->
# exact-Jaccard-verified pairs >= 0.5: shared by the minhash_lsh_dedup
# oracle and the dedup_cluster_canonical oracle's edge set
_LSH_PAIRS_CTE = f"""
    {_CORPUS_SQL},
    {_SHINGLES_SQL},
    sigs AS (
      SELECT doc_id,
             {_sql_minhash(0)} AS h0, {_sql_minhash(1)} AS h1,
             {_sql_minhash(2)} AS h2, {_sql_minhash(3)} AS h3
      FROM shingles GROUP BY doc_id),
    bands AS (
      SELECT doc_id, 0 AS band, h0 || '|' || h1 AS bkey FROM sigs
      UNION ALL
      SELECT doc_id, 1, h2 || '|' || h3 FROM sigs),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.doc_id < b.doc_id),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             COUNT(*) AS inter,
             (SELECT COUNT(*) FROM shingles s WHERE s.doc_id = c.doc_a) AS na,
             (SELECT COUNT(*) FROM shingles s WHERE s.doc_id = c.doc_b) AS nb
      FROM cand c
      JOIN shingles sa ON sa.doc_id = c.doc_a
      JOIN shingles sb ON sb.doc_id = c.doc_b AND sa.sh = sb.sh
      GROUP BY c.doc_a, c.doc_b),
    pairs AS (
      SELECT doc_a, doc_b,
             CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jaccard
      FROM verified
      WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.5)
"""


@query(
    "minhash_lsh_dedup",
    f"""
    WITH {_LSH_PAIRS_CTE}
    SELECT doc_a, doc_b, jaccard FROM pairs
    """,
    doc="MinHash+LSH near-dup: shingle -> 4-hash minhash signature -> "
    "2 bands -> bucket self-join -> exact-Jaccard verification >= 0.5. "
    "min(md5(seed||shingle)) is the cross-engine permutation proxy.",
)
def minhash_lsh_dedup(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    return minhash_lsh_pairs(_corpus(t)).select("doc_a", "doc_b", "jaccard")


def _simhash_sigs(corpus):
    """Per-doc 16-bit SimHash signature as a '0'/'1' string: per-word
    md5-hex-digit parity votes, ONE aggregate per doc (no pairwise
    work). Shared by the exact-bucket query and the hamming-probe
    pair query."""
    words = corpus.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    h = F.md5("w")
    bit_cols = [
        F.sum(
            F.when(F.substring(h, j + 1, 1).isin(*"89abcdef"), 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(16)
    ]
    sums = words.groupBy("doc_id").agg(*bit_cols)
    sig = F.concat(
        *[F.when(F.col(f"b{j}") >= 0, F.lit("1")).otherwise(F.lit("0")) for j in range(16)]
    )
    return sums.select("doc_id", sig.alias("simhash"))


@query(
    "simhash_buckets",
    None,  # oracle below is registered after definition (long SQL built in code)
    doc="SimHash near-dup: 16-bit signature from per-word md5-hex-digit "
    "parity, one aggregate per doc; identical signatures = candidate "
    "bucket. No pairwise work — O(n) total.",
)
def simhash_buckets(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    corpus = _corpus(t)
    return (
        _simhash_sigs(corpus)
        .groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


_SIMHASH_BITS_SQL = ", ".join(
    f"SUM(CASE WHEN substr(md5(w), {j + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS b{j}"
    for j in range(16)
)
_SIMHASH_SIG_SQL = " || ".join(
    f"CASE WHEN b{j} >= 0 THEN '1' ELSE '0' END" for j in range(16)
)

_SIMHASH_ORACLE = f"""
    WITH {_CORPUS_SQL},
    words AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w FROM corpus),
    sums AS (SELECT doc_id, {_SIMHASH_BITS_SQL} FROM words GROUP BY doc_id),
    sigs AS (SELECT doc_id, {_SIMHASH_SIG_SQL} AS simhash FROM sums)
    SELECT simhash, COUNT(*) AS n_docs,
           array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
    FROM sigs GROUP BY simhash HAVING COUNT(*) > 1
    """


# 64-bit signature for the PAIR query, as two 32-bit halves (bigint
# arithmetic stays unsigned-safe, and both engines get integer
# xor/bit_count). 16 bits — fine for exact-signature GROUPING — is
# far too coarse for distance-1 pairing on a templated corpus:
# measured 729k pairs / 30 s at sf0.1 vs 714 pairs / 3.5 s at 64
# bits (the figure pinned in docs/scale_audit_r8.md and operations.md).
# one md5 per word yields all 64 votes: bit 3 of each hex nibble
# (digit >= 8) feeds sig1, bit 2 (digit in 4-7 or c-f) feeds sig2
_SIMHASH64_BITS_SQL = ", ".join(
    f"SUM(CASE WHEN substr(md5(w), {j + 1}, 1) IN ({digits}) "
    f"THEN 1 ELSE -1 END) AS {pfx}{j}"
    for digits, pfx in (
        ("'8','9','a','b','c','d','e','f'", "b"),
        ("'4','5','6','7','c','d','e','f'", "c"),
    )
    for j in range(32)
)
_SIG1_SQL = " + ".join(
    f"CASE WHEN b{j} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END" for j in range(32)
)
_SIG2_SQL = " + ".join(
    f"CASE WHEN c{j} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END" for j in range(32)
)

_SIMHASH_PAIRS_ORACLE = f"""
    WITH {_CORPUS_SQL},
    words AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w FROM corpus),
    sums AS (SELECT doc_id, {_SIMHASH64_BITS_SQL} FROM words GROUP BY doc_id),
    sigs AS (SELECT doc_id, {_SIG1_SQL} AS sig1, {_SIG2_SQL} AS sig2 FROM sums)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sig1, b.sig1))
                + bit_count(xor(a.sig2, b.sig2)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig1, b.sig1)) + bit_count(xor(a.sig2, b.sig2)) <= 1
    """


@query(
    "simhash_hamming_pairs",
    _SIMHASH_PAIRS_ORACLE,
    doc="SimHash near-dup PAIRS at hamming distance <= 1 via "
    "multi-probe bucketing (Manku et al., WWW'07 'Detecting "
    "Near-Duplicates for Web Crawling' — public algorithm): each doc "
    "emits its 64-bit signature (two 32-bit bigint halves; bit 3 and "
    "bit 2 of each md5 hex nibble vote, so ONE hash per word) plus "
    "all 64 one-bit xor flips "
    "as integer probe keys; a bucket self-join on the probe pair "
    "generates candidates (probe collisions reach distance 2, so "
    "candidates are verified back to <= 1 with bit_count(xor)), "
    "never all-pairs — the recall extension over simhash_buckets' "
    "exact-signature groups. Scale: 65 integer probe rows per doc, "
    "join bounded per probe bucket; the brute-force all-pairs arm "
    "exists only in the ORACLE, where it is the deliberate ground "
    "truth.",
)
def simhash_hamming_pairs(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    corpus = _corpus(t)
    h = F.md5("w")
    # ONE md5 per word, parsed into four 32-bit integer chunks; the
    # 64 parity votes are then integer shift/mask reads (bit 3 of
    # each hex nibble -> sig1 votes, bit 2 -> sig2 votes) instead of
    # 64 substring+set-membership tests per word (measured 5.7 s ->
    # ~3 s at sf0.1). Hex digit 8k+p+1 is nibble (7-p) of chunk k.
    words = corpus.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("w"),
    ).select(
        "doc_id",
        *[
            F.conv(F.substring(h, 1 + 8 * k, 8), 16, 10).cast("long").alias(f"v{k}")
            for k in range(4)
        ],
    )
    votes = []
    for bit, pfx in ((3, "b"), (2, "c")):
        for j in range(32):
            k, p = j // 8, j % 8
            shift = 4 * (7 - p) + bit
            votes.append(
                F.sum(
                    F.shiftright(F.col(f"v{k}"), shift).bitwiseAND(F.lit(1)) * 2 - 1
                ).alias(f"{pfx}{j}")
            )
    sums = words.groupBy("doc_id").agg(*votes)
    mk_sig = lambda pfx: sum(  # noqa: E731
        F.when(F.col(f"{pfx}{j}") >= 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        for j in range(32)
    )
    # checkpoint the per-doc signatures (r19): both probe sides derive
    # from this one frame, and without materialization the build side
    # of the candidate join re-ran the whole md5+vote aggregation a
    # second time (duplicated subtree in the before-plan, no exchange
    # reuse across a BroadcastExchange).
    sigs = sums.select(
        "doc_id", mk_sig("b").alias("sig1"), mk_sig("c").alias("sig2")
    ).localCheckpoint(eager=True)
    # ASYMMETRIC probing (r19 — the Manku et al. table layout): flips
    # on ONE side only. For a pair at hamming distance 1, flipping the
    # differing bit in the smaller-id doc's signature yields the other
    # doc's EXACT signature (and distance 0 matches on the no-flip
    # probe), so probes(a) ⋈ exact(b) with doc_a < doc_b covers every
    # distance <= 1 pair — and ONLY those (flip_j(a) == b forces
    # d(a,b) <= 1), each exactly once. vs the old both-sides-flipped
    # self-join: the join's build side is |docs| rows instead of
    # 65*|docs|, no distance-2 false candidates, and the dedup
    # .distinct() exchange is provably unnecessary (a d=0 pair used to
    # collide on all 65 probes). The hamming verify stays as the
    # output column (and a belt-and-braces filter).
    probes_arr = [F.struct(F.col("sig1").alias("p1"), F.col("sig2").alias("p2"))]
    for j in range(32):
        probes_arr.append(
            F.struct(
                F.col("sig1").bitwiseXOR(F.lit(1 << j)).alias("p1"),
                F.col("sig2").alias("p2"),
            )
        )
        probes_arr.append(
            F.struct(
                F.col("sig1").alias("p1"),
                F.col("sig2").bitwiseXOR(F.lit(1 << j)).alias("p2"),
            )
        )
    probes = sigs.select(
        "doc_id", "sig1", "sig2", F.explode(F.array(*probes_arr)).alias("p")
    ).select("doc_id", "sig1", "sig2", "p.p1", "p.p2")
    exact = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sig1").alias("b1"),
        F.col("sig2").alias("b2"),
    )
    # NO broadcast hint: the exact side is one row per document — it
    # scales with the corpus (the r11 boundedness rule), so Catalyst's
    # threshold decides (broadcast at harness bytes, SMJ at 100 TB —
    # where the shuffle now carries 1 row/doc instead of 65)
    cand = probes.join(
        exact,
        (F.col("p1") == F.col("b1"))
        & (F.col("p2") == F.col("b2"))
        & (F.col("doc_id") < F.col("doc_b")),
    ).select(
        F.col("doc_id").alias("doc_a"),
        "doc_b",
        F.col("sig1").alias("a1"),
        F.col("sig2").alias("a2"),
        "b1",
        "b2",
    )
    hamming = (
        F.bit_count(F.col("a1").bitwiseXOR(F.col("b1")))
        + F.bit_count(F.col("a2").bitwiseXOR(F.col("b2")))
    ).cast("bigint")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 1)
        .select("doc_a", "doc_b", "hamming")
    )


# stop-shingle cap: a shingle held by more than this many documents is
# dropped from the inverted index BEFORE the self-join. Without it any
# high-frequency boilerplate shingle makes the join quadratic in its
# posting-list length (10^6 docs sharing one 3-gram => 10^12 candidate
# pairs) — the one unbounded term in this plan at corpus scale. Stop
# shingles carry ~no Jaccard signal (they're in everything), so both
# the intersection AND the per-doc sizes use the filtered universe,
# keeping the estimate symmetric.
_SHINGLE_DF_CAP = 50

@query(
    "ngram_jaccard_pairs",
    f"""
    WITH {_CORPUS_SQL},
    {_SHINGLES_SQL},
    hot AS (SELECT sh FROM shingles GROUP BY sh HAVING COUNT(*) > {_SHINGLE_DF_CAP}),
    idx AS (
      SELECT s.doc_id, s.sh FROM shingles s
      WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.sh = s.sh)),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM idx GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b)
    SELECT i.doc_a, i.doc_b,
           CAST(i.inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.inter AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.inter AS DOUBLE) >= 0.6
    """,
    doc="All-pairs n-gram Jaccard >= 0.6 via inverted shingle index "
    "self-join with a stop-shingle document-frequency cap "
    f"(df > {_SHINGLE_DF_CAP} dropped) so no posting list is ever "
    "unbounded — pairs only materialize where informative shingles "
    "collide.",
)
def ngram_jaccard_pairs(spark, sf_dir):
    from pyspark.storagelevel import StorageLevel

    t = tables(spark, sf_dir, "documents")
    # persist the inverted index: it feeds the stop-shingle count,
    # both self-join sides AND the per-doc sizes; without the cache
    # each consumer re-runs the explode+distinct shuffle (measured
    # 6.0s -> 2.5s at sf0.1). At cluster scale this is persist(DISK)
    # or a staged table.
    sh = _shingles(_corpus(t)).persist(StorageLevel.MEMORY_AND_DISK)
    # shingles are distinct per (doc, sh), so COUNT(*) per sh is the
    # document frequency; the anti-join against the (small) hot list
    # is a broadcast filter over the cached index
    hot = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > _SHINGLE_DF_CAP)
        .select("sh")
    )
    # persist the FILTERED index too: its three consumers (sizes, both
    # self-join sides) would otherwise each recompute the anti-join
    idx = sh.join(hot, "sh", "left_anti").persist(StorageLevel.MEMORY_AND_DISK)
    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = idx.alias("a"), idx.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.6)
    )
    return out


# --- embedding near-dup ----------------------------------------------------

_DOT_SQL = (
    "list_sum(list_transform(range(1, 65), i -> "
    "CAST(round(CAST(a.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) * "
    "CAST(round(CAST(b.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)))"
)
_NORM_SQL = lambda s: (  # noqa: E731
    f"list_sum(list_transform(range(1, 65), i -> "
    f"CAST(round(CAST({s}.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) * "
    f"CAST(round(CAST({s}.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)))"
)
_BUCKET_SQL = lambda s: " || ".join(  # noqa: E731
    f"CASE WHEN {s}.embedding[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(1, 7)
)


def _scaled(col):
    return F.round(col.cast("double") * 1000000.0, 0).cast("bigint")


def _dot_int(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _scaled(x) * _scaled(y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _dot_pre(a, b):
    """Dot of two already-scaled bigint arrays (see _prep_vectors)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _prep_vectors(df, id_col="vec_id"):
    """Scale each vector to int64 once and precompute its squared
    norm, so pairwise joins only do one zip_with per pair instead of
    re-scaling both sides and re-deriving norms (3x the element work;
    measured 14s -> 5s on the near-dup join at sf0.1)."""
    sv = F.transform(F.col("embedding"), _scaled)
    out = df.withColumn("sv", sv).withColumn(
        "norm",
        F.aggregate(F.col("sv"), F.lit(0).cast("bigint"), lambda acc, x: acc + x * x),
    )
    return out


def _bucket(emb):
    return F.concat(
        *[
            F.when(F.element_at(emb, i) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(1, 7)
        ]
    )


@query(
    "embedding_near_dup",
    f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 5 = 0),
    bucketed AS (SELECT vec_id, embedding, {_BUCKET_SQL('corpus').replace('corpus.', '')} AS bucket
                 FROM corpus AS corpus),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST({_DOT_SQL} AS DOUBLE)
               / (sqrt(CAST({_NORM_SQL('a')} AS DOUBLE)) * sqrt(CAST({_NORM_SQL('b')} AS DOUBLE))) AS cosine
      FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.99
    """,
    doc="Embedding near-dup: 6-sign-bit LSH bucket prefilter, then "
    "exact scaled-integer cosine >= 0.99 within buckets. Integer dot/"
    "norms are order-independent and bit-identical across engines; "
    "the only float ops (sqrt, divide) have identical expression shape.",
)
def embedding_near_dup(spark, sf_dir):
    t = tables(spark, sf_dir, "embeddings")
    e = t["embeddings"]
    corpus = e.select("vec_id", "embedding").unionByName(
        e.filter(F.col("vec_id") % 5 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    bucketed = _prep_vectors(
        corpus.select("vec_id", "embedding", _bucket(F.col("embedding")).alias("bucket"))
    ).select("vec_id", "bucket", "sv", "norm")
    a, b = bucketed.alias("a"), bucketed.alias("b")
    dot = _dot_pre(F.col("a.sv"), F.col("b.sv"))
    cosine = dot.cast("double") / (
        F.sqrt(F.col("a.norm").cast("double")) * F.sqrt(F.col("b.norm").cast("double"))
    )
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.99)
    )


@query(
    "dedup_cluster_canonical",
    f"""
    WITH RECURSIVE {_LSH_PAIRS_CTE},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS d FROM edges),
    reach(d, x) AS (
      SELECT d, d FROM nodes
      UNION
      SELECT r.d, e.b FROM reach r JOIN edges e ON e.a = r.x),
    comp AS (SELECT d, min(x) AS comp FROM reach GROUP BY d)
    SELECT comp AS keeper, CAST(COUNT(*) AS BIGINT) AS n_docs,
           array_to_string(list_sort(list(d)), ',') AS doc_ids
    FROM comp GROUP BY comp
    """,
    doc="Canonical-document selection over near-dup CLUSTERS — the "
    "step after pair generation that an actual training-data dedup "
    "needs: MinHash+LSH pairs (>= 0.5 Jaccard) become edges, "
    "connected components (operators/identity.py min-label "
    "propagation, direct symmetric form for pair graphs) collapse "
    "transitive chains (A~B, B~C => one cluster even when A!~C), and "
    "each cluster keeps its min-doc_id canonical. Oracle: recursive-"
    "CTE reachability over the same verified pairs. Scale: the edge "
    "set is LSH-bounded (pairs, not corpus^2); CC iterations shuffle "
    "only (doc, component) labels on stable keys.",
)
def dedup_cluster_canonical(spark, sf_dir):
    from idhub_spark.operators.identity import connected_components_pairs

    t = tables(spark, sf_dir, "documents")
    prs = minhash_lsh_pairs(_corpus(t)).select("doc_a", "doc_b")
    # pair edges go through the DIRECT symmetric propagation (one join
    # + one agg per iteration) — the bipartite loop is for natural
    # record<->identifier graphs, not synthetic per-pair nodes;
    # spark.idhub.cc.checkpointDir flips this to reliable checkpoints
    # on a cluster (see operators/identity.py:_cc_runtime)
    comp = connected_components_pairs(prs)  # -> (record_key, component)
    return comp.groupBy(F.col("component").alias("keeper")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.concat_ws(",", F.sort_array(F.collect_list("record_key"))).alias("doc_ids"),
    )


def _ngrams(corpus, n: int):
    """Distinct word-n-gram shingles per doc — the Generate-barrier
    build of _shingles, generalized (see _shingles for why the barrier
    matters under Spark 4's CollapseProject)."""
    parts = ", ".join(f"ws[i+{k}]" for k in range(n))
    ws = corpus.select("doc_id", F.explode(F.array(F.split("text", " "))).alias("ws"))
    return (
        ws.filter(F.size("ws") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(ws)-{n}), "
                    f"i -> concat_ws(' ', {parts}))"
                )
            ).alias("sh"),
        )
        .distinct()
    )


@query(
    "benchmark_contamination",
    """
    WITH ev0 AS (
      SELECT doc_id AS eval_id, text FROM documents WHERE doc_id % 25 = 7),
    exc AS (
      SELECT eval_id,
             array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS excerpt
      FROM ev0),
    train AS (
      SELECT d.doc_id,
             CASE WHEN d.doc_id % 10 = 3 AND e.excerpt IS NOT NULL
                  THEN d.text || ' ' || e.excerpt ELSE d.text END AS text
      FROM documents d
      LEFT JOIN exc e ON e.eval_id = (d.doc_id % 20) * 25 + 7
      WHERE d.doc_id % 25 <> 7),
    tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM train),
    tg AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS sh
      FROM tw, UNNEST(range(1, len(w) - 3)) t(i) WHERE len(w) >= 5),
    ew AS (SELECT eval_id, string_split(text, ' ') AS w FROM ev0),
    eg AS (
      SELECT DISTINCT eval_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS sh
      FROM ew, UNNEST(range(1, len(w) - 3)) t(i) WHERE len(w) >= 5),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM tg GROUP BY doc_id),
    hits AS (
      SELECT t.doc_id,
             CAST(COUNT(DISTINCT t.sh) AS BIGINT) AS n_hit_shingles,
             CAST(COUNT(DISTINCT e.eval_id) AS BIGINT) AS n_eval_docs
      FROM tg t JOIN eg e ON t.sh = e.sh GROUP BY t.doc_id)
    SELECT h.doc_id, h.n_hit_shingles, h.n_eval_docs,
           CAST(h.n_hit_shingles AS DOUBLE) / CAST(s.n_sh AS DOUBLE) AS contamination_rate
    FROM hits h JOIN sizes s ON s.doc_id = h.doc_id
    """,
    doc="Benchmark-contamination detection — the decontamination scan "
    "every pretraining pipeline runs before training: training docs "
    "sharing any word-5-gram with the (tiny) eval set are flagged "
    "with hit counts and contamination rate. Fixture plants eval "
    "excerpts into %10==3 training docs via a deterministic eval-id "
    "mapping (LEFT JOIN: no plant where the mapped eval doc doesn't "
    "exist, so the fixture scales with sf). Scale: the eval-side "
    "n-gram index is benchmark-sized -> broadcast on BOTH the plant "
    "join and the contamination join, so the corpus never shuffles "
    "except for its own per-doc aggregates; no df-cap needed because "
    "the bounded side is the broadcast index.",
)
def benchmark_contamination(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    d = t["documents"].select("doc_id", "text")
    eval_docs = d.filter(F.col("doc_id") % 25 == 7)
    excerpts = eval_docs.select(
        F.col("doc_id").alias("eval_id"),
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 5)).alias("excerpt"),
    )
    plant_key = (F.col("doc_id") % 20) * 25 + 7
    train = (
        d.filter(F.col("doc_id") % 25 != 7)
        .join(F.broadcast(excerpts), plant_key == F.col("eval_id"), "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 10 == 3) & F.col("excerpt").isNotNull(),
                F.concat_ws(" ", "text", "excerpt"),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    grams_t = _ngrams(train, 5)
    grams_e = _ngrams(
        eval_docs.select(F.col("doc_id"), "text"), 5
    ).select(F.col("doc_id").alias("eval_id"), "sh")
    sizes = grams_t.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hits = (
        grams_t.join(F.broadcast(grams_e), "sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("n_hit_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_hit_shingles",
        "n_eval_docs",
        (F.col("n_hit_shingles").cast("double") / F.col("n_sh").cast("double")).alias(
            "contamination_rate"
        ),
    )


@query(
    "lsh_recall_eval",
    f"""
    WITH {_LSH_PAIRS_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b),
    gt AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE CAST(i.i AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.i AS DOUBLE) >= 0.5),
    counts AS (
      SELECT CAST((SELECT COUNT(*) FROM gt) AS BIGINT) AS n_gt,
             CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_lsh,
             CAST((SELECT COUNT(*) FROM gt g
                   WHERE EXISTS (SELECT 1 FROM pairs p
                                 WHERE p.doc_a = g.doc_a AND p.doc_b = g.doc_b))
                  AS BIGINT) AS n_hit)
    SELECT n_gt, n_lsh, n_hit,
           CAST(n_hit AS DOUBLE) / CAST(n_gt AS DOUBLE) AS recall
    FROM counts
    """,
    doc="Recall evaluation of the MinHash+LSH candidate generator "
    "against exact all-pairs Jaccard ground truth (>= 0.5) on the "
    "same shingle universe — the dedup analogue of ann_recall_at_k. "
    "LSH pairs are exact-verified, so precision is 1.0 by "
    "construction and the number that matters is recall: what the "
    "4-hash/2-band toy parameterization misses (tune n_hashes/bands "
    "up at corpus scale; the banding S-curve in "
    "minhash_lsh_pairs's docstring quantifies the trade). The exact "
    "arm is the deliberate brute-force baseline (fixture-bounded), "
    "exactly like ann_topk_bruteforce for ANN.",
)
def lsh_recall_eval(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    corpus = _corpus(t)
    lsh = minhash_lsh_pairs(corpus).select("doc_a", "doc_b")
    sh = _shingles(corpus)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    gt = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .filter(
            F.col("i").cast("double")
            / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
            >= 0.5
        )
        .select("doc_a", "doc_b")
    )
    n_gt = gt.agg(F.count(F.lit(1)).alias("n_gt"))
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    n_hit = gt.join(lsh, ["doc_a", "doc_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return (
        n_gt.crossJoin(F.broadcast(n_lsh))
        .crossJoin(F.broadcast(n_hit))
        .select(
            "n_gt",
            "n_lsh",
            "n_hit",
            (F.col("n_hit").cast("double") / F.col("n_gt").cast("double")).alias(
                "recall"
            ),
        )
    )


_SWEEP_CONFIGS = [(4, 2), (8, 4), (16, 8)]  # r = n/bands = 2; bands sweep the S-curve


def _sweep_cte(n_hashes: int, bands: int) -> str:
    """Per-config sigs/bands/cand/pairs CTEs, name-suffixed so all
    sweep points combine into ONE oracle statement sharing the
    corpus/shingles/ground-truth CTEs."""
    rows = n_hashes // bands
    sfx = f"_{n_hashes}_{bands}"
    sig_cols = ", ".join(f"{_sql_minhash(i)} AS h{i}" for i in range(n_hashes))
    band_selects = []
    for bi in range(bands):
        key = " || '|' || ".join(f"h{bi * rows + r}" for r in range(rows))
        band_selects.append(f"SELECT doc_id, {bi} AS band, {key} AS bkey FROM sigs{sfx}")
    return f"""
    sigs{sfx} AS (SELECT doc_id, {sig_cols} FROM shingles GROUP BY doc_id),
    bands{sfx} AS ({' UNION ALL '.join(band_selects)}),
    cand{sfx} AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands{sfx} a JOIN bands{sfx} b ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.doc_id < b.doc_id),
    ver{sfx} AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS i,
             any_value(sa_n.n_sh) AS na, any_value(sb_n.n_sh) AS nb
      FROM cand{sfx} c
      JOIN shingles sa ON sa.doc_id = c.doc_a
      JOIN shingles sb ON sb.doc_id = c.doc_b AND sa.sh = sb.sh
      JOIN gsizes sa_n ON sa_n.doc_id = c.doc_a
      JOIN gsizes sb_n ON sb_n.doc_id = c.doc_b
      GROUP BY c.doc_a, c.doc_b),
    lsh{sfx} AS (
      SELECT doc_a, doc_b FROM ver{sfx}
      WHERE CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE) >= 0.5),
    row{sfx} AS (
      SELECT {n_hashes} AS n_hashes, {bands} AS bands,
             CAST((SELECT COUNT(*) FROM cand{sfx}) AS BIGINT) AS n_cand,
             CAST((SELECT COUNT(*) FROM lsh{sfx}) AS BIGINT) AS n_lsh,
             CAST((SELECT COUNT(*) FROM gt g
                   WHERE EXISTS (SELECT 1 FROM lsh{sfx} p
                                 WHERE p.doc_a = g.doc_a AND p.doc_b = g.doc_b))
                  AS BIGINT) AS n_hit)
    """


_SWEEP_ORACLE = f"""
    WITH {_CORPUS_SQL},
    {_SHINGLES_SQL},
    gsizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
    ginter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b),
    gt AS (
      SELECT i.doc_a, i.doc_b
      FROM ginter i
      JOIN gsizes sa ON sa.doc_id = i.doc_a
      JOIN gsizes sb ON sb.doc_id = i.doc_b
      WHERE CAST(i.i AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.i AS DOUBLE) >= 0.5),
    ngt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_gt FROM gt),
    {','.join(_sweep_cte(h, b) for h, b in _SWEEP_CONFIGS)}
    SELECT r.n_hashes, r.bands, r.n_cand, n.n_gt, r.n_lsh, r.n_hit,
           CAST(r.n_hit AS DOUBLE) / CAST(n.n_gt AS DOUBLE) AS recall
    FROM ({' UNION ALL '.join(f'SELECT * FROM row_{h}_{b}' for h, b in _SWEEP_CONFIGS)}) r
    CROSS JOIN ngt n
    """


@query(
    "lsh_param_sweep",
    _SWEEP_ORACLE,
    doc="The measured LSH recall-vs-cost curve the docs' banding "
    "formula promises (scale_audit_r2.md): one row per "
    "(n_hashes, bands) in {(4,2),(8,4),(16,8)} — r=2 rows/band "
    "throughout, so candidate probability is 1-(1-j^2)^bands and "
    "recall must be NON-DECREASING in bands while n_cand (the cost "
    "axis: pairs the verify stage must intersect) grows. Ground "
    "truth is the exact all-pairs >= 0.5 Jaccard arm (fixture-"
    "bounded, like lsh_recall_eval); every sweep point shares the "
    "one shingle scan via ReusedExchange. Use the measured curve to "
    "pick cluster-scale parameters; the production default stays "
    "4/2 until recall at the corpus's similarity profile demands "
    "more bands.",
)
def lsh_param_sweep(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    corpus = _corpus(t)
    sh = _shingles(corpus)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    gt = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .filter(
            F.col("i").cast("double")
            / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
            >= 0.5
        )
        .select("doc_a", "doc_b")
    )
    # Single-pass flag aggregation. Two structural facts make it work:
    # (1) the sweep's candidate sets NEST — every config has r=2 and a
    # smaller config's bands are a hash-index prefix of the next one's
    # ((4,2)'s bands (h0|h1),(h2|h3) are the first two of (8,4)'s), so
    # cand_4_2 ⊆ cand_8_4 ⊆ cand_16_8 — and (2) LSH pairs are exact-
    # verified, so a config's pair set is {cand_config} ∩ {verified}.
    # So: verify Jaccard ONCE over the widest config's candidates,
    # left-join per-config membership flags and the verified flag onto
    # that superset, full-outer the ground truth on, and read ALL nine
    # sweep counts (plus n_gt) out of ONE aggregation — each subtree
    # executes once instead of once per (config x statistic). The
    # oracle still verifies each config independently; the driver hash
    # match is what proves the nesting shortcut correct.
    h_max, b_max = _SWEEP_CONFIGS[-1]
    sizes_a = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na")
    sizes_b = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb")
    cand_max = _lsh_candidates(sh, n_hashes=h_max, bands=b_max)
    sa, sb = sh.alias("sa"), sh.alias("sb")
    ver = (
        cand_max.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, (F.col("sb.doc_id") == F.col("doc_b")) & (F.col("sa.sh") == F.col("sb.sh")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("vi"))
        .join(sizes_a, "doc_a")
        .join(sizes_b, "doc_b")
        .filter(
            F.col("vi").cast("double")
            / (F.col("na") + F.col("nb") - F.col("vi")).cast("double")
            >= 0.5
        )
        .select("doc_a", "doc_b", F.lit(1).alias("fv"))
    )
    keys = ["doc_a", "doc_b"]
    marked = cand_max.withColumn("fmax", F.lit(1))
    flags = {(h_max, b_max): "fmax"}
    for h, bnd in _SWEEP_CONFIGS[:-1]:
        flag = f"f_{h}_{bnd}"
        flags[(h, bnd)] = flag
        marked = marked.join(
            _lsh_candidates(sh, n_hashes=h, bands=bnd).withColumn(flag, F.lit(1)),
            keys,
            "left",
        )
    marked = marked.join(ver, keys, "left").join(
        gt.withColumn("fgt", F.lit(1)), keys, "full_outer"
    )
    hit = lambda *cs: F.sum(  # noqa: E731
        F.when(sum(F.coalesce(F.col(c), F.lit(0)) for c in cs) == len(cs), 1).otherwise(0)
    )
    aggs = [hit("fgt").alias("n_gt")]
    for (h, bnd), flag in flags.items():
        aggs += [
            hit(flag).alias(f"n_cand_{h}_{bnd}"),
            hit(flag, "fv").alias(f"n_lsh_{h}_{bnd}"),
            hit(flag, "fv", "fgt").alias(f"n_hit_{h}_{bnd}"),
        ]
    stats = marked.agg(*aggs)
    # reshape 1 wide row -> 3 config rows with ONE consumer of the
    # aggregation (three selects would re-execute its whole subtree)
    rows = [
        F.struct(
            F.lit(h).alias("n_hashes"),
            F.lit(bnd).alias("bands"),
            F.col(f"n_cand_{h}_{bnd}").alias("n_cand"),
            F.col("n_gt").alias("n_gt"),
            F.col(f"n_lsh_{h}_{bnd}").alias("n_lsh"),
            F.col(f"n_hit_{h}_{bnd}").alias("n_hit"),
            (
                F.col(f"n_hit_{h}_{bnd}").cast("double") / F.col("n_gt").cast("double")
            ).alias("recall"),
        )
        for (h, bnd) in flags
    ]
    return stats.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


# --- leakage-safe split -----------------------------------------------------

# same md5 bucket recipe as operators/sampling.py:hash_bucket, spelled
# in DuckDB (defined here, not imported from plans/sampling_q, so a
# direct `import plans.dedup_q` never touches a later-alphabet plan
# module mid-registration)
_SPLIT_BUCKET_SQL = (
    "CAST(CAST(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8)) "
    "AS BIGINT) % 100 AS INTEGER)"
)
_CLUSTER_KEY_SQL = "COALESCE(k.comp, c.doc_id)"


@query(
    "leakage_safe_split",
    f"""
    WITH RECURSIVE {_LSH_PAIRS_CTE},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS d FROM edges),
    reach(d, x) AS (
      SELECT d, d FROM nodes
      UNION
      SELECT r.d, e.b FROM reach r JOIN edges e ON e.a = r.x),
    comp AS (SELECT d, min(x) AS comp FROM reach GROUP BY d)
    SELECT c.doc_id,
           {_CLUSTER_KEY_SQL} AS cluster,
           CASE WHEN {_SPLIT_BUCKET_SQL.format(salt="lsplit", key=_CLUSTER_KEY_SQL)} < 20
                THEN 'test' ELSE 'train' END AS split
    FROM corpus c LEFT JOIN comp k ON k.d = c.doc_id
    """,
    doc="Near-dup-aware train/test split — the leakage fix every "
    "pretraining pipeline needs and a plain per-doc hash split "
    "cannot give: a document and its near-duplicates land on the "
    "SAME side, because the split key is the near-dup CLUSTER id "
    "(MinHash+LSH pairs -> connected components, the same engine as "
    "dedup_cluster_canonical) and singleton docs key on themselves. "
    "A doc-keyed split leaks eval content whenever a near-copy of a "
    "test doc sits in train (cf. the contamination scan). Scale: the "
    "cluster map is pairs-bounded; unpaired docs never join it "
    "(left join + coalesce), and the split stays deterministic "
    "hash-bucket (same cluster -> same side on any run/cluster/"
    "partitioning). Oracle: recursive-CTE reachability over the same "
    "verified pairs + the same md5 bucket arithmetic.",
)
def leakage_safe_split(spark, sf_dir):
    from idhub_spark.operators.identity import connected_components_pairs
    from idhub_spark.operators.sampling import hash_bucket

    t = tables(spark, sf_dir, "documents")
    corpus = _corpus(t)
    prs = minhash_lsh_pairs(corpus).select("doc_a", "doc_b")
    comp = connected_components_pairs(prs).withColumnRenamed("record_key", "doc_id")
    clustered = corpus.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component", F.col("doc_id")).alias("cluster"),
    )
    b = hash_bucket(F.col("cluster"), 100, "lsplit")
    return clustered.select(
        "doc_id",
        "cluster",
        F.when(b < 20, F.lit("test")).otherwise(F.lit("train")).alias("split"),
    )


# Patch oracles that are built programmatically (long generated SQL):
from idhub_spark.queries import REGISTRY as _R  # noqa: E402

_R["exact_dedup"].oracle = _EXACT_ORACLE
_R["simhash_buckets"].oracle = _SIMHASH_ORACLE


@query(
    "minhash_index_probe_state",
    """
    WITH hist AS (
      SELECT doc_id, text FROM documents
      WHERE POSITION(' ' IN text) > 0 AND doc_id % 3 = 0
    ),
    batch AS (
      SELECT doc_id + 1000000 AS doc_id, text FROM hist WHERE doc_id % 21 = 0
      UNION ALL
      SELECT doc_id + 3000000 AS doc_id,
             substr(text, POSITION(' ' IN text) + 1) AS text
      FROM hist
      WHERE doc_id % 15 = 0
        AND length(text) - length(replace(text, ' ', '')) >= 7
      UNION ALL
      SELECT doc_id + off AS doc_id, text
      FROM hist, (SELECT UNNEST([5000000, 5000001]) AS off)
      WHERE doc_id = (SELECT MIN(doc_id) FROM hist)
    )
    SELECT 'exact' AS kind, b.doc_id AS new_id, h.doc_id AS dup_id,
           'history' AS dup_source, CAST(1 AS BIGINT) AS ok
    FROM batch b JOIN hist h ON b.text = h.text
    UNION ALL
    SELECT 'exact' AS kind, b1.doc_id AS new_id, b2.doc_id AS dup_id,
           'batch' AS dup_source, CAST(1 AS BIGINT) AS ok
    FROM batch b1 JOIN batch b2 ON b1.text = b2.text AND b1.doc_id < b2.doc_id
    UNION ALL
    SELECT 'near_recall' AS kind, CAST(NULL AS BIGINT) AS new_id,
           CAST(NULL AS BIGINT) AS dup_id, CAST(NULL AS VARCHAR) AS dup_source,
           CAST(1 AS BIGINT) AS ok
    """,
    doc="The incremental MinHash dedup index driven end to end "
    "(operators/dedup_index.py): build the index over a history slice "
    "of `documents`, then probe a constructed batch (planted exact "
    "copies of every 21st history doc, first-word-trimmed near-dups "
    "of every 15th, and an in-batch twin pair of the oldest doc) "
    "against the persisted state. The signature hash (xxhash64) has "
    "no DuckDB twin, so the oracle pins the index's deterministic "
    "CONTRACTS instead (the kmv_accuracy_check pattern): (a) every "
    "text-equal (batch, history) and in-batch pair — derivable in "
    "ANSI SQL — MUST be reported with est_jaccard exactly 1.0 "
    "(identical text => identical signature => every band collides); "
    "the Spark side left-joins this ground truth against the probe "
    "and a missed pair flips its ok to 0. (b) banding recall over "
    "the planted near-dup pairs is >= 0.5 (expected ~0.98 at "
    "J~0.9 with 4 bands x 4 rows — hash-deterministic, a stable "
    "measurement, not a flaky tail), stated as one verdict row. "
    "The probe itself reads the bucketed index tables with "
    "file-level PartitionFilters (scan ∝ the batch's band buckets).",
)
def minhash_index_probe_state(spark, sf_dir):
    import os
    import tempfile

    from idhub_spark.operators.dedup_index import (
        minhash_index_probe,
        minhash_index_write,
    )

    t = tables(spark, sf_dir, "documents")
    docs = (
        t["documents"].select("doc_id", "text").filter(F.instr("text", " ") > 0)
    )
    hist = docs.filter(F.col("doc_id") % 3 == 0)
    path = os.path.join(
        tempfile.gettempdir(),
        "idhub_mh_index",
        f"{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    # pb/db sized to THIS history per the operations.md rule (a few
    # times the batch's band rows / candidate volume — 4096-dir
    # layouts are for 10^7+ histories and only add per-probe file
    # overhead here; the pruning CONTRACT is plan-asserted in pytest)
    minhash_index_write(
        hist, path, n_hashes=16, bands=4, pb_buckets=16, db_buckets=16
    )

    exact = hist.filter(F.col("doc_id") % 21 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    near = hist.filter(
        (F.col("doc_id") % 15 == 0) & (F.size(F.split("text", " ")) >= 8)
    ).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
    )
    mn = hist.agg(F.min("doc_id").alias("_mn"))
    twins = (
        hist.join(F.broadcast(mn), F.col("doc_id") == F.col("_mn"))
        .select(
            F.explode(F.array(F.lit(5_000_000), F.lit(5_000_001))).alias("_off"),
            "doc_id",
            "text",
        )
        .select((F.col("doc_id") + F.col("_off")).alias("doc_id"), "text")
    )
    batch = exact.unionByName(near).unionByName(twins)
    probe = minhash_index_probe(spark, path, batch, threshold_est=0.35)

    # ground truth: every text-equal pair MUST be probe-reported at 1.0
    h = hist.select(F.col("doc_id").alias("dup_id"), F.col("text").alias("_ht"))
    b = batch.select(F.col("doc_id").alias("new_id"), F.col("text").alias("_bt"))
    b2 = batch.select(F.col("doc_id").alias("dup_id"), F.col("text").alias("_bt2"))
    truth = (
        b.join(h, F.col("_bt") == F.col("_ht"))
        .select("new_id", "dup_id", F.lit("history").alias("dup_source"))
        .unionByName(
            b.join(
                b2,
                (F.col("_bt") == F.col("_bt2"))
                & (F.col("new_id") < F.col("dup_id")),
            ).select("new_id", "dup_id", F.lit("batch").alias("dup_source"))
        )
    )
    found = (
        probe.filter(F.col("est_jaccard") == 1.0)
        .select("new_id", "dup_id", "dup_source")
        .withColumn("_f", F.lit(1))
    )
    exact_rows = truth.join(
        found, ["new_id", "dup_id", "dup_source"], "left"
    ).select(
        F.lit("exact").alias("kind"),
        "new_id",
        "dup_id",
        "dup_source",
        F.coalesce("_f", F.lit(0)).cast("bigint").alias("ok"),
    )

    planted = near.select(
        F.col("doc_id").alias("new_id"),
        (F.col("doc_id") - 3_000_000).alias("dup_id"),
    )
    hits = (
        probe.filter(F.col("dup_source") == "history")
        .select("new_id", "dup_id")
        .withColumn("_f", F.lit(1))
    )
    verdict = (
        planted.join(hits, ["new_id", "dup_id"], "left")
        .agg(
            (
                F.sum(F.coalesce("_f", F.lit(0)))
                >= 0.5 * F.count(F.lit(1))
            ).alias("_ok")
        )
        .select(
            F.lit("near_recall").alias("kind"),
            F.lit(None).cast("bigint").alias("new_id"),
            F.lit(None).cast("bigint").alias("dup_id"),
            F.lit(None).cast("string").alias("dup_source"),
            F.when(F.col("_ok"), 1).otherwise(0).cast("bigint").alias("ok"),
        )
    )
    return exact_rows.unionByName(verdict)


@query(
    "minhash_index_lifecycle_state",
    """
    WITH hist AS (
      SELECT doc_id FROM documents
      WHERE POSITION(' ' IN text) > 0 AND doc_id % 3 = 0
    ),
    victims AS (SELECT doc_id FROM hist WHERE doc_id % 21 = 0),
    survivors AS (
      SELECT doc_id FROM hist WHERE doc_id % 15 = 0 AND doc_id % 21 <> 0
    )
    SELECT 'post_delete' AS phase, 'victim_absent' AS kind, doc_id,
           CAST(1 AS BIGINT) AS ok
    FROM victims
    UNION ALL
    SELECT 'post_delete' AS phase, 'survivor_found' AS kind, doc_id,
           CAST(1 AS BIGINT) AS ok
    FROM survivors
    UNION ALL
    SELECT 'post_reingest' AS phase, 'victim_found' AS kind, doc_id,
           CAST(1 AS BIGINT) AS ok
    FROM victims
    """,
    doc="The dedup index's full RETRACTION lifecycle driven end to end "
    "(operators/dedup_index.py — the takedown/GDPR path): build over "
    "half a history slice of `documents`, append the other half, "
    "DELETE a planted victim set (every 21st doc), probe exact copies "
    "of victims AND surviving docs, then REINGEST the victims and "
    "probe again. In-plan-verdict oracle (the minhash_index_probe_"
    "state pattern — the xxhash64 signatures have no DuckDB twin, but "
    "the lifecycle's contracts are exact): (a) post-delete, NO probe "
    "pair may name a victim as dup_id — retraction removed its state "
    "(partition-pruned rewrite of only the victims' db/pb "
    "partitions); (b) post-delete, every surviving doc's exact copy "
    "is still reported at est_jaccard exactly 1.0 — the rewrite "
    "touched nothing else; (c) post-reingest, every victim's copy is "
    "found again at 1.0 — delete left the index append-able. A "
    "violated contract flips that row's ok to 0 and fails the hash. "
    "Phase-1 results are eagerly checkpointed before the reingest "
    "append (a pre-write file-index snapshot must never be acted on "
    "after the write).",
)
def minhash_index_lifecycle_state(spark, sf_dir):
    import os
    import tempfile

    from idhub_spark.operators.dedup_index import (
        minhash_index_append,
        minhash_index_delete,
        minhash_index_probe,
        minhash_index_write,
    )

    t = tables(spark, sf_dir, "documents")
    docs = (
        t["documents"].select("doc_id", "text").filter(F.instr("text", " ") > 0)
    )
    hist = docs.filter(F.col("doc_id") % 3 == 0)
    path = os.path.join(
        tempfile.gettempdir(),
        "idhub_mh_lifecycle",
        f"{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    # build + append: the index accrues the way production does (the
    # lifecycle must hold over appended state, not just a fresh build).
    # Parameters are deliberately SLIM (8 hashes / 2 bands / 4+4
    # buckets): every contract below is text-set membership plus
    # est==1.0 exactness (identical text => identical signature at ANY
    # n_hashes), so larger parameters buy no verdict strength — only
    # wall (A/B at sf0.1: 10.2s at 16/4/8/8 vs 7.2s here). Realistic
    # parameterization is minhash_index_probe_state's job (16/4) and
    # the 4096/1024 audits'.
    minhash_index_write(
        hist.filter(F.col("doc_id") % 2 == 0),
        path,
        n_hashes=8,
        bands=2,
        pb_buckets=4,
        db_buckets=4,
    )
    minhash_index_append(hist.filter(F.col("doc_id") % 2 == 1), path)

    victims = hist.filter(F.col("doc_id") % 21 == 0)
    survivors = hist.filter(
        (F.col("doc_id") % 15 == 0) & (F.col("doc_id") % 21 != 0)
    )
    minhash_index_delete(spark, path, victims.select("doc_id"))

    batch = victims.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    ).unionByName(
        survivors.select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
    )
    probe1 = minhash_index_probe(
        spark, path, batch, threshold_est=0.5, include_batch_pairs=False
    ).localCheckpoint(eager=True)

    # (a) retraction: no post-delete pair may name a victim as dup_id
    hit_v = (
        probe1.select(F.col("dup_id").alias("doc_id"))
        .distinct()
        .withColumn("_h", F.lit(1))
    )
    victim_absent = (
        victims.select("doc_id")
        .join(hit_v, "doc_id", "left")
        .select(
            F.lit("post_delete").alias("phase"),
            F.lit("victim_absent").alias("kind"),
            "doc_id",
            F.when(F.col("_h").isNull(), 1).otherwise(0).cast("bigint").alias("ok"),
        )
    )

    def _found(probe, offset):
        """(doc_id, _f=1) for docs whose exact copy (doc_id+offset) the
        probe reported against history at est exactly 1.0."""
        return probe.filter(
            (F.col("est_jaccard") == 1.0) & (F.col("dup_source") == "history")
        ).select(
            (F.col("new_id") - offset).alias("_nid"),
            F.col("dup_id").alias("doc_id"),
        ).filter(F.col("_nid") == F.col("doc_id")).select("doc_id").distinct().withColumn(
            "_f", F.lit(1)
        )

    # (b) survivors' copies still found at exactly 1.0 post-delete
    survivor_found = (
        survivors.select("doc_id")
        .join(_found(probe1, 2_000_000), "doc_id", "left")
        .select(
            F.lit("post_delete").alias("phase"),
            F.lit("survivor_found").alias("kind"),
            "doc_id",
            F.coalesce("_f", F.lit(0)).cast("bigint").alias("ok"),
        )
    )

    # (c) reingest the retracted docs; their copies are found again
    minhash_index_append(victims, path)
    probe2 = minhash_index_probe(
        spark,
        path,
        victims.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"),
        threshold_est=0.5,
        include_batch_pairs=False,
    )
    victim_found = (
        victims.select("doc_id")
        .join(_found(probe2, 1_000_000), "doc_id", "left")
        .select(
            F.lit("post_reingest").alias("phase"),
            F.lit("victim_found").alias("kind"),
            "doc_id",
            F.coalesce("_f", F.lit(0)).cast("bigint").alias("ok"),
        )
    )
    return victim_absent.unionByName(survivor_found).unionByName(victim_found)


# ---------------------------------------------------------------------------
# Registered r15 (VERDICT r14 ask #1b; pre-staged r14 when the window
# had zero slack). The r14 LSM delta buffer's dedicated driver row: a
# small-batch ingest CADENCE through the buffer, probe correctness
# over MIXED layers (live + delta + direct debris), the compaction
# FOLD's parity, and a cross-layer delete — the four behaviors
# scale_audit_r14.md measures, as hash-verified contracts.
# ---------------------------------------------------------------------------
MINHASH_CADENCE_STATE_ORACLE = """
    WITH hist AS (
      SELECT doc_id FROM documents
      WHERE POSITION(' ' IN text) > 0 AND doc_id % 3 = 0
    ),
    odd AS (SELECT doc_id FROM hist WHERE doc_id % 2 = 1),
    d1 AS (SELECT doc_id FROM odd WHERE doc_id % 5 = 1),
    d2 AS (SELECT doc_id FROM odd WHERE doc_id % 5 = 2),
    direct AS (SELECT doc_id FROM odd WHERE doc_id % 5 NOT IN (1, 2)),
    victims AS (
      SELECT doc_id FROM d1 WHERE doc_id % 9 = 0
      UNION ALL
      SELECT doc_id FROM hist WHERE doc_id % 2 = 0 AND doc_id % 15 = 0
    )
    SELECT 'post_cadence' AS phase, 'delta_found' AS kind, doc_id,
           CAST(1 AS BIGINT) AS ok
    FROM (SELECT doc_id FROM d1 UNION ALL SELECT doc_id FROM d2)
    UNION ALL
    SELECT 'post_cadence' AS phase, 'direct_found' AS kind, doc_id,
           CAST(1 AS BIGINT) AS ok
    FROM direct
    UNION ALL
    SELECT 'post_fold' AS phase, 'fold_parity' AS kind, doc_id,
           CAST(1 AS BIGINT) AS ok
    FROM odd WHERE doc_id NOT IN (SELECT doc_id FROM victims)
    UNION ALL
    SELECT 'post_fold' AS phase, 'victim_absent' AS kind, doc_id,
           CAST(1 AS BIGINT) AS ok
    FROM victims
    """


@query(
    "minhash_index_cadence_state",
    MINHASH_CADENCE_STATE_ORACLE,
    doc="LSM delta-buffer ingest cadence / mixed-layer probe / fold "
    "parity / cross-layer delete as hash contracts",
)
def minhash_index_cadence_state(spark, sf_dir):
    """The LSM delta buffer driven end to end at ingest cadence
    (operators/dedup_index.py, r14 — the scale_audit_r14.md behaviors
    as hash-verified contracts): build over the even half of a history
    slice of `documents`, then ingest the odd half as a CADENCE —
    two small batches through the DELTA BUFFER, one through the
    direct partition-rename route — probe exact copies of every
    ingested doc, DELETE a cross-layer victim set (delta-resident +
    live), FOLD the surviving buffer in place with
    minhash_index_fold_delta (the MINOR compaction), and probe once
    more. In-plan-verdict oracle (the lifecycle-query pattern —
    xxhash64 signatures have no DuckDB twin, but every contract is
    text-set membership plus est_jaccard == 1.0 exactness,
    PLACEMENT-INVARIANT by construction):

    - delta_found / direct_found: every ingested doc's exact copy is
      reported against history at exactly 1.0 regardless of which
      layer holds its state (probes read bands ∪ delta).
    - fold_parity: after the in-place fold (delta dir gone, its rows
      re-laid into the Hive layout at I/O ∝ delta), every SURVIVING
      ingested doc's copy is still found at exactly 1.0.
    - victim_absent: the pre-fold delete spanned both layers (buffer
      rows anti-joined, live partitions rewritten) and the fold
      preserved the retraction — no post-fold pair names a victim.

    A violated contract flips that row's ok to 0 and fails the hash.
    Slim parameters (8 hashes / 2 bands / 4+4 buckets) for the same
    reason as the lifecycle query: est==1.0 exactness is
    parameter-invariant, so larger settings buy wall, not verdict
    strength. The two buffer batches force mode='delta' (their sizes
    straddle the auto threshold across sf dirs; the ROUTE is the
    subject here, and placement-invariance is exactly what the
    contracts prove); the third forces 'direct' so the fold packs
    real partition debris alongside the buffer."""
    import os
    import tempfile

    from idhub_spark.operators.dedup_index import (
        minhash_index_append,
        minhash_index_delete,
        minhash_index_fold_delta,
        minhash_index_probe,
        minhash_index_write,
    )

    t = tables(spark, sf_dir, "documents")
    docs = (
        t["documents"].select("doc_id", "text").filter(F.instr("text", " ") > 0)
    )
    hist = docs.filter(F.col("doc_id") % 3 == 0)
    base = os.path.join(
        tempfile.gettempdir(),
        "idhub_mh_cadence",
        f"{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    idx = f"{base}/idx"
    minhash_index_write(
        hist.filter(F.col("doc_id") % 2 == 0),
        idx,
        n_hashes=8,
        bands=2,
        pb_buckets=4,
        db_buckets=4,
    )
    odd = hist.filter(F.col("doc_id") % 2 == 1)
    d1 = odd.filter(F.col("doc_id") % 5 == 1)
    d2 = odd.filter(F.col("doc_id") % 5 == 2)
    direct = odd.filter(~(F.col("doc_id") % 5).isin(1, 2))
    minhash_index_append(d1, idx, mode="delta")
    minhash_index_append(d2, idx, mode="delta")
    minhash_index_append(direct, idx, mode="direct")

    copies = odd.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")

    def _found(path, probe_docs, offset):
        """(doc_id, _f=1) for docs whose exact copy (doc_id+offset)
        the probe reported against history at est exactly 1.0."""
        got = minhash_index_probe(
            spark, path, probe_docs, threshold_est=0.5,
            include_batch_pairs=False,
        )
        return (
            got.filter(
                (F.col("est_jaccard") == 1.0)
                & (F.col("dup_source") == "history")
            )
            .select(
                (F.col("new_id") - offset).alias("_nid"),
                F.col("dup_id").alias("doc_id"),
            )
            .filter(F.col("_nid") == F.col("doc_id"))
            .select("doc_id")
            .distinct()
            .withColumn("_f", F.lit(1))
        )

    found_mixed = _found(idx, copies, 1_000_000).localCheckpoint(eager=True)

    def verdict(src, phase, kind, hits):
        return src.select("doc_id").join(hits, "doc_id", "left").select(
            F.lit(phase).alias("phase"),
            F.lit(kind).alias("kind"),
            "doc_id",
            F.coalesce("_f", F.lit(0)).cast("bigint").alias("ok"),
        )

    delta_found = verdict(
        d1.unionByName(d2), "post_cadence", "delta_found", found_mixed
    )
    direct_found = verdict(
        direct, "post_cadence", "direct_found", found_mixed
    )

    # cross-layer retraction FIRST (buffer rows anti-joined, live
    # partitions rewritten; %9 picks a PROPER subset of the delta
    # batch — hist ids are all %3 == 0 already — so the buffer keeps
    # survivors), THEN the MINOR compaction folds the surviving
    # buffer into the Hive layout in place
    victims = d1.filter(F.col("doc_id") % 9 == 0).unionByName(
        hist.filter(
            (F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 15 == 0)
        )
    )
    minhash_index_delete(spark, idx, victims.select("doc_id"))
    minhash_index_fold_delta(spark, idx)

    # ONE post-fold probe answers both contracts: survivors' copies
    # (offset 2M) still found at exactly 1.0 on the folded layout,
    # and no pair names a victim (their ghosts ride at offset 3M)
    survivors = odd.join(victims.select("doc_id"), "doc_id", "anti")
    post_batch = survivors.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    ).unionByName(
        victims.select((F.col("doc_id") + 3_000_000).alias("doc_id"), "text")
    )
    post_probe = minhash_index_probe(
        spark, idx, post_batch, threshold_est=0.5, include_batch_pairs=False
    ).localCheckpoint(eager=True)
    found_folded = (
        post_probe.filter(
            (F.col("est_jaccard") == 1.0) & (F.col("dup_source") == "history")
        )
        .select(
            (F.col("new_id") - 2_000_000).alias("_nid"),
            F.col("dup_id").alias("doc_id"),
        )
        .filter(F.col("_nid") == F.col("doc_id"))
        .select("doc_id")
        .distinct()
        .withColumn("_f", F.lit(1))
    )
    fold_parity = verdict(survivors, "post_fold", "fold_parity", found_folded)
    hit_v = (
        post_probe.select(F.col("dup_id").alias("doc_id"))
        .distinct()
        .withColumn("_h", F.lit(1))
    )
    victim_absent = (
        victims.select("doc_id")
        .join(hit_v, "doc_id", "left")
        .select(
            F.lit("post_fold").alias("phase"),
            F.lit("victim_absent").alias("kind"),
            "doc_id",
            F.when(F.col("_h").isNull(), 1).otherwise(0).cast("bigint").alias("ok"),
        )
    )
    return (
        delta_found.unionByName(direct_found)
        .unionByName(fold_parity)
        .unionByName(victim_absent)
    )


# ---------------------------------------------------------------------------
# Registered r15 (VERDICT r14 ask #2): the stop-bucket guard —
# minhash_index_probe(max_bucket_rows=...), the index's boilerplate-
# blowup defense and its one recall-affecting knob — gets a driver
# row. Previously pytest-only (tests/test_dedup_index.py).
# ---------------------------------------------------------------------------
STOPBUCKET_TEMPLATE = (
    "standard consent boilerplate clause the participant acknowledges "
    "the study terms and conditions apply to every enrolled subject "
    "without modification or exception across all sites"
)

MINHASH_STOPBUCKET_STATE_ORACLE = """
    SELECT 'organic_found' AS kind, doc_id, CAST(1 AS BIGINT) AS ok
    FROM documents
    WHERE POSITION(' ' IN text) > 0 AND doc_id % 28 = 0
    UNION ALL
    SELECT 'blob_suppressed' AS kind, CAST(110000000 AS BIGINT) AS doc_id,
           CAST(1 AS BIGINT) AS ok
    UNION ALL
    SELECT 'blob_collides_unguarded' AS kind,
           CAST(110000000 AS BIGINT) AS doc_id, CAST(1 AS BIGINT) AS ok
    """


@query(
    "minhash_index_stopbucket_state",
    MINHASH_STOPBUCKET_STATE_ORACLE,
    doc="stop-bucket guard: boilerplate blob suppressed, organic dups "
    "kept at est 1.0, blob proven to collide unguarded",
)
def minhash_index_stopbucket_state(spark, sf_dir):
    """The STOP-BUCKET guard as hash-verified contracts
    (operators/dedup_index.py minhash_index_probe(max_bucket_rows=...)
    — minhash_index_stats' hot-bucket finding turned into an action,
    the stop-shingle idea at index level): history is a `documents`
    slice PLUS a planted 48-copy boilerplate blob (identical text →
    identical signature → every one of its band buckets holds 48
    rows); the probe batch carries one fresh blob copy and an exact
    copy of every organic dup target. With max_bucket_rows=20 between
    the organic duplicate-group size and the blob:

    - organic_found: every organic target's copy is still reported at
      est exactly 1.0 — the guard's recall trade provably spared the
      organic pairs (an exact copy only loses when EVERY agreeing
      band is a stop bucket).
    - blob_suppressed: the fresh blob copy reports ZERO pairs — the
      48-row buckets were excluded, so the 48-candidate blowup per
      colliding batch doc never reaches the estimate join.
    - blob_collides_unguarded: a control probe WITHOUT the cap
      reports the blob copy at est 1.0 — pinning that the guard did
      the suppressing, not a failure to collide.

    A violated contract flips its row's ok to 0 and fails the hash.
    Slim parameters (8 hashes / 2 bands / 4+4 buckets): est==1.0
    exactness and the bucket-size mechanics are parameter-invariant
    (the blob's bucket rows equal its copy count under ANY banding).
    Bounded by construction throughout: the blob is 48 literal rows
    (spark.range — JVM-literal), the guard's extra aggregate shuffles
    one row per surviving (band, bkey)."""
    import os
    import tempfile

    from idhub_spark.operators.dedup_index import (
        minhash_index_probe,
        minhash_index_write,
    )

    t = tables(spark, sf_dir, "documents")
    docs = (
        t["documents"].select("doc_id", "text").filter(F.instr("text", " ") > 0)
    )
    hist = docs.filter(F.col("doc_id") % 4 == 0)
    blob_hist = spark.range(48).select(
        (F.col("id") + 100_000_000).alias("doc_id"),
        F.lit(STOPBUCKET_TEMPLATE).alias("text"),
    )
    base = os.path.join(
        tempfile.gettempdir(),
        "idhub_mh_stopbucket",
        f"{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    idx = f"{base}/idx"
    minhash_index_write(
        hist.unionByName(blob_hist),
        idx,
        n_hashes=8,
        bands=2,
        pb_buckets=4,
        db_buckets=4,
    )

    organics = hist.filter(F.col("doc_id") % 7 == 0)  # % 28 of documents
    blob_probe = spark.range(1).select(
        F.lit(110_000_000).cast("bigint").alias("doc_id"),
        F.lit(STOPBUCKET_TEMPLATE).alias("text"),
    )
    batch = organics.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    ).unionByName(blob_probe)

    guarded = minhash_index_probe(
        spark, idx, batch, threshold_est=0.5, include_batch_pairs=False,
        max_bucket_rows=20,
    ).localCheckpoint(eager=True)

    found = (
        guarded.filter(
            (F.col("est_jaccard") == 1.0) & (F.col("dup_source") == "history")
        )
        .select(
            (F.col("new_id") - 1_000_000).alias("_nid"),
            F.col("dup_id").alias("doc_id"),
        )
        .filter(F.col("_nid") == F.col("doc_id"))
        .select("doc_id")
        .distinct()
        .withColumn("_f", F.lit(1))
    )
    organic_found = (
        organics.select("doc_id")
        .join(found, "doc_id", "left")
        .select(
            F.lit("organic_found").alias("kind"),
            "doc_id",
            F.coalesce("_f", F.lit(0)).cast("bigint").alias("ok"),
        )
    )
    blob_suppressed = (
        guarded.filter(F.col("new_id") == 110_000_000)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            F.lit("blob_suppressed").alias("kind"),
            F.lit(110_000_000).cast("bigint").alias("doc_id"),
            (F.col("_n") == 0).cast("bigint").alias("ok"),
        )
    )
    unguarded = minhash_index_probe(
        spark, idx, blob_probe, threshold_est=0.5, include_batch_pairs=False
    )
    blob_collides = (
        unguarded.filter(
            (F.col("new_id") == 110_000_000) & (F.col("est_jaccard") == 1.0)
        )
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            F.lit("blob_collides_unguarded").alias("kind"),
            F.lit(110_000_000).cast("bigint").alias("doc_id"),
            (F.col("_n") >= 1).cast("bigint").alias("ok"),
        )
    )
    return organic_found.unionByName(blob_suppressed).unionByName(blob_collides)
