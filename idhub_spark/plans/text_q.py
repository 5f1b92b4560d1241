"""Text-analysis operators for training-data pipelines (north-star
extension beyond the reference): language ID, quality scoring, token
counting, document fingerprinting.

All pure Catalyst expressions over the `documents` table — split/
filter/transform higher-order functions stay JVM-side, so at 100 TB
these are embarrassingly-parallel single-pass scans with no shuffle
(except the final fingerprint groupBy, which shuffles one short hash
per doc).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.queries import query, tables

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ein"],
    "es": ["el", "la", "de", "y", "un"],
    "fr": ["le", "la", "et", "un", "des"],
}


def _words(col):
    return F.split(F.lower(col), " ")


def _hits(words, lang):
    return F.size(F.filter(words, lambda w: w.isin(STOPWORDS[lang])))


def _sql_hits(lang):
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(string_split(lower(text), ' '), w -> w IN ({lst})))"


@query(
    "token_count",
    r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS re_tokens,
           n_chars
    FROM documents
    """,
    doc="Token counting: whitespace split + BPE-ish regex tokenizer "
    "(letters/digits/punct classes) — both as built-in expressions.",
)
def token_count(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    return t["documents"].select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)")).alias(
            "re_tokens"
        ),
        "n_chars",
    )


@query(
    "lang_id_heuristic",
    f"""
    SELECT doc_id,
           CASE
             WHEN {_sql_hits("en")} >= greatest({_sql_hits("de")}, {_sql_hits("es")}, {_sql_hits("fr")})
                  AND {_sql_hits("en")} > 0 THEN 'en'
             WHEN {_sql_hits("de")} >= greatest({_sql_hits("es")}, {_sql_hits("fr")})
                  AND {_sql_hits("de")} > 0 THEN 'de'
             WHEN {_sql_hits("es")} >= {_sql_hits("fr")} AND {_sql_hits("es")} > 0 THEN 'es'
             WHEN {_sql_hits("fr")} > 0 THEN 'fr'
             ELSE 'unknown'
           END AS predicted_lang,
           lang AS labeled_lang
    FROM documents
    """,
    doc="Language ID: stopword-hit heuristic with fixed priority "
    "tie-break (n-gram-free variant; a real model would be a Pandas "
    "UDF over the same plumbing).",
)
def lang_id_heuristic(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    w = _words(F.col("text"))
    en, de, es, fr = (_hits(w, l) for l in ("en", "de", "es", "fr"))
    pred = (
        F.when((en >= F.greatest(de, es, fr)) & (en > 0), F.lit("en"))
        .when((de >= F.greatest(es, fr)) & (de > 0), F.lit("de"))
        .when((es >= fr) & (es > 0), F.lit("es"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )
    return t["documents"].select(
        "doc_id", pred.alias("predicted_lang"), F.col("lang").alias("labeled_lang")
    )


@query(
    "quality_score",
    f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           CAST(n_chars AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_word_len,
           CAST({_sql_hits("en")} AS DOUBLE) / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS stopword_ratio,
           0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
             + 0.3 * (1.0 - CAST({_sql_hits("en")} AS DOUBLE) / CAST(len(string_split(lower(text), ' ')) AS DOUBLE))
             + 0.2 * least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS quality
    FROM documents
    """,
    doc="Quality scoring: length/stopword-ratio/char-budget blend — "
    "identical expression shape on both engines so the doubles are "
    "bit-equal (all deterministic IEEE ops, no reordered sums).",
)
def quality_score(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words).cast("double")
    en_hits = _hits(_words(F.col("text")), "en").cast("double")
    n_chars = F.col("n_chars").cast("double")
    quality = (
        0.5 * F.least(n_words / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - en_hits / n_words)
        + 0.2 * F.least(n_chars / 500.0, F.lit(1.0))
    )
    return t["documents"].select(
        "doc_id",
        F.size(words).alias("n_words"),
        (n_chars / n_words).alias("avg_word_len"),
        (en_hits / n_words).alias("stopword_ratio"),
        quality.alias("quality"),
    )


@query(
    "doc_fingerprint",
    """
    SELECT fingerprint, COUNT(*) AS n_docs, min(doc_id) AS representative
    FROM (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fingerprint
      FROM documents)
    GROUP BY fingerprint
    HAVING COUNT(*) > 1
    """,
    doc="Document fingerprinting: sorted-distinct-word-set hash "
    "(OpenRefine-style key collision) -> same-fingerprint groups are "
    "permutation near-dups.",
)
def doc_fingerprint(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(F.lower(F.col("text")), " "))))
    )
    return (
        t["documents"]
        .select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("representative"))
        .filter(F.col("n_docs") > 1)
    )


@query(
    "repetition_filter",
    """
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    g AS (SELECT doc_id, ws,
                 list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS gs
          FROM w)
    SELECT doc_id,
           len(ws) AS n_words,
           1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS dup_word_ratio,
           CASE WHEN len(gs) > 0
                THEN 1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / CAST(len(gs) AS DOUBLE)
                ELSE 0.0 END AS dup_2gram_ratio,
           (1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE)) <= 0.3
           AND (CASE WHEN len(gs) > 0
                     THEN 1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / CAST(len(gs) AS DOUBLE)
                     ELSE 0.0 END) <= 0.2 AS keep
    FROM g
    """,
    doc="Repetition-based quality filter (the Gopher-rules family): "
    "per-doc duplicate-word and duplicate-2-gram ratios with keep "
    "thresholds (0.3 / 0.2). Pure array projection — distinct counts "
    "happen inside the row, so at 100 TB this is a shuffle-free scan.",
)
def repetition_filter(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    with_ws = t["documents"].select(
        "doc_id", F.split(F.lower("text"), " ").alias("ws")
    )
    with_gs = with_ws.select(
        "doc_id",
        "ws",
        F.expr(
            "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),"
            " (a, b) -> concat(a, ' ', b))"
        ).alias("gs"),
    )
    n_w = F.size("ws").cast("double")
    n_g = F.size("gs")
    dup_w = 1.0 - F.size(F.array_distinct("ws")).cast("double") / n_w
    dup_g = F.when(
        n_g > 0, 1.0 - F.size(F.array_distinct("gs")).cast("double") / n_g.cast("double")
    ).otherwise(F.lit(0.0))
    return with_gs.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        dup_w.alias("dup_word_ratio"),
        dup_g.alias("dup_2gram_ratio"),
        ((dup_w <= 0.3) & (dup_g <= 0.2)).alias("keep"),
    )


@query(
    "vocabulary_topk",
    """
    SELECT w AS token, COUNT(*) AS freq
    FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents)
    WHERE w <> ''
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 50
    """,
    doc="Vocabulary building: token frequencies -> deterministic "
    "top-50 (count desc, token asc). Shuffle carries (token, partial "
    "count) — map-side combine bounds it by vocabulary size, not "
    "corpus size.",
)
def vocabulary_topk(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    return (
        t["documents"]
        .select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(50)
    )


@query(
    "bpe_pair_counts",
    """
    WITH words AS (
      SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents),
    pairs AS (
      SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
      FROM words, UNNEST(range(1, len(w))) t(i)
      WHERE len(w) >= 2)
    SELECT pair, COUNT(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 20
    """,
    doc="Tokenizer induction at corpus scale — the inner loop of BPE "
    "training: count every adjacent symbol pair within words and "
    "take the global top candidates (the pair a merge step would "
    "fuse). One explode + one partial-aggregated groupBy; the "
    "shuffle carries (2-char pair, partial count), bounded by "
    "alphabet^2 regardless of corpus size, and the top-k is "
    "TakeOrdered, not a global sort. Iterating merge rounds re-runs "
    "this same aggregate over the re-tokenized corpus.",
)
def bpe_pair_counts(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    words = t["documents"].select(
        F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


@query(
    "gopher_quality_rules",
    """
    WITH w AS (
      SELECT doc_id,
             string_split(text, ' ') AS words,
             len(text) - len(replace(text, '#', '')) AS n_hash,
             CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS n_ellipsis
      FROM documents),
    m AS (
      SELECT doc_id, n_hash, n_ellipsis,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(words, x -> len(x))) AS BIGINT) AS word_chars,
             CAST(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT)
               AS n_alpha_words
      FROM w)
    SELECT doc_id, n_words, word_chars, CAST(n_hash AS BIGINT) AS n_hash,
           n_ellipsis, n_alpha_words,
           (n_words BETWEEN 50 AND 100000
             AND word_chars BETWEEN 3 * n_words AND 10 * n_words
             AND 10 * (n_hash + n_ellipsis) <= n_words
             AND 5 * n_alpha_words >= 4 * n_words) AS passes
    FROM m
    """,
    doc="Gopher-style document quality rules (Rae et al. 2021, "
    "'Scaling Language Models: ... Gopher', App. A1.1 — public "
    "paper): word-count window [50, 100k], mean word length in "
    "[3, 10], symbol-to-word ratio (# + ellipsis) <= 0.1, >= 80% of "
    "words contain an alphabetic char. ALL rule arithmetic is "
    "integer (ratio thresholds cross-multiplied), so the pass flag "
    "is hash-exact across engines. Single-pass projection, no "
    "shuffle, higher-order functions stay JVM-side.",
)
def gopher_quality_rules(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words).cast("long")
    word_chars = F.aggregate(
        F.transform(words, F.length), F.lit(0), lambda a, x: a + x
    ).cast("long")
    n_hash = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
    ).cast("long")
    n_ellipsis = F.size(F.expr(r"regexp_extract_all(text, '\\.\\.\\.', 0)")).cast("long")
    n_alpha = F.size(F.filter(words, lambda x: x.rlike("[a-zA-Z]"))).cast("long")
    passes = (
        n_words.between(50, 100000)
        & word_chars.between(3 * n_words, 10 * n_words)
        & (10 * (n_hash + n_ellipsis) <= n_words)
        & (5 * n_alpha >= 4 * n_words)
    )
    return t["documents"].select(
        "doc_id",
        n_words.alias("n_words"),
        word_chars.alias("word_chars"),
        n_hash.alias("n_hash"),
        n_ellipsis.alias("n_ellipsis"),
        n_alpha.alias("n_alpha_words"),
        passes.alias("passes"),
    )


@query(
    "pii_redaction",
    r"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or 555-123-4567 now'
                  ELSE text END AS text
      FROM documents),
    red AS (
      SELECT doc_id,
             len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phones,
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS redacted
      FROM aug)
    SELECT doc_id, n_emails, n_phones,
           len(redacted) AS redacted_len,
           md5(redacted) AS redacted_md5
    FROM red
    """,
    doc="PII scrubbing — the redaction step every public training "
    "pipeline runs before tokenization: email and US-phone patterns "
    "replaced with typed placeholders, counted per document, and the "
    "redacted CONTENT pinned by md5 so the oracle verifies the exact "
    "output text, not just counts. Patterns are RE2-safe (no "
    "backrefs/lookaround), so Java regex and DuckDB RE2 agree. "
    "Single-pass projection, no shuffle; at 100 TB this is the same "
    "embarrassingly-parallel scan as every text_q operator.",
)
def pii_redaction(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
    # plant deterministic PII in a fifth of the corpus so the
    # redaction path is exercised, not just the no-op path
    aug = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-4567 now"),
        ),
    ).otherwise(F.col("text"))
    docs = t["documents"].select("doc_id", aug.alias("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), email, "<EMAIL>"), phone, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(email), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(phone), F.lit(0))).alias("n_phones"),
        F.length(redacted).alias("redacted_len"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )


@query(
    "doc_chunking",
    """
    WITH c AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(floor((len(text) + 149) / 150) AS BIGINT))) AS chunk_no
      FROM documents
      WHERE len(text) > 0)
    SELECT doc_id, chunk_no,
           len(substr(text, CAST(chunk_no * 150 + 1 AS BIGINT), 200)) AS chunk_len,
           md5(substr(text, CAST(chunk_no * 150 + 1 AS BIGINT), 200)) AS chunk_md5
    FROM c
    """,
    doc="Fixed-window document chunking with overlap (window 200, "
    "stride 150 — the RAG / long-context training prep step): one "
    "explode(sequence) per doc, chunk CONTENT pinned by md5 so the "
    "oracle verifies the exact byte ranges, not just counts. The "
    "empty-text guard dodges Spark's descending sequence(0,-1) "
    "gotcha (see sample_frames). Single explode + projection, no "
    "shuffle; chunk count scales with corpus bytes / stride, "
    "embarrassingly parallel at any sf.",
)
def doc_chunking(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    chunks = F.expr(
        "CASE WHEN length(text) > 0 "
        "THEN sequence(0L, (length(text) + 149) div 150 - 1) "
        "ELSE array() END"
    )
    chunk = F.substring(
        F.col("text"), (F.col("chunk_no") * 150 + 1).cast("int"), 200
    )
    return (
        t["documents"]
        .select("doc_id", "text", F.explode(chunks).alias("chunk_no"))
        .select(
            "doc_id",
            "chunk_no",
            F.length(chunk).alias("chunk_len"),
            F.md5(chunk.cast("binary")).alias("chunk_md5"),
        )
    )


@query(
    "bpe_merge_apply",
    """
    WITH words AS (
      SELECT w FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      WHERE len(w) >= 2),
    pairs AS (
      SELECT substr(w, CAST(i AS BIGINT), 2) AS pair
      FROM (SELECT w, unnest(range(1, len(w))) AS i FROM words)),
    top1 AS (
      SELECT pair FROM pairs GROUP BY pair
      ORDER BY COUNT(*) DESC, pair LIMIT 1),
    merged AS (
      SELECT replace(w, (SELECT pair FROM top1), chr(1)) AS w FROM words),
    pairs2 AS (
      SELECT substr(w, CAST(i AS BIGINT), 2) AS pair
      FROM (SELECT w, unnest(range(1, len(w))) AS i FROM merged WHERE len(w) >= 2))
    SELECT hex(encode(pair)) AS pair_hex, n FROM (
      SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
      FROM pairs2 GROUP BY pair
      ORDER BY n DESC, pair LIMIT 20)
    """,
    doc="BPE training ROUND TWO — the merge-apply step that closes "
    "the tokenizer-induction loop started by bpe_pair_counts: take "
    "the deterministic top pair (count desc, pair asc tie-break), "
    "fuse every non-overlapping occurrence left-to-right (plain "
    "substring replace, identical semantics both engines) into a "
    "single placeholder symbol (chr(1)), and recount adjacent pairs "
    "over the re-tokenized corpus. Plan shape: the top-1 pair is a "
    "1-row TakeOrdered broadcast back over the words (scalar "
    "pattern, zero single-partition stages); the recount shuffle "
    "stays bounded by (alphabet+1)^2. Pairs are emitted hex-encoded "
    "so the placeholder byte round-trips every comparator.",
)
def bpe_merge_apply(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    words = (
        t["documents"]
        .select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") >= 2)
    )
    win2 = F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
    top1 = (
        words.select(F.explode(win2).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(1)
        .select("pair")
    )
    merged = words.crossJoin(F.broadcast(top1)).select(
        F.replace(F.col("w"), F.col("pair"), F.lit("\x01")).alias("w")
    )
    pairs2 = (
        merged.filter(F.length("w") >= 2)
        .select(F.explode(win2).alias("pair"))
    )
    return (
        pairs2.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
        .select(F.hex(F.col("pair").cast("binary")).alias("pair_hex"), "n")
    )


@query(
    "tfidf_keywords",
    """
    WITH tok AS (
      SELECT source, UNNEST(string_split(lower(text), ' ')) AS token
      FROM documents),
    tf AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE token <> '' GROUP BY source, token),
    dfx AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
    ns AS (
      SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n FROM documents),
    scored AS (
      SELECT tf.source, tf.token, tf.tf, dfx.df,
             CAST(round(tf.tf * ln(CAST(ns.n AS DOUBLE) / dfx.df)
                        * 1000000.0) AS BIGINT) AS score_micro
      FROM tf JOIN dfx ON tf.token = dfx.token CROSS JOIN ns),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY score_micro DESC, token) AS rnk
      FROM scored)
    SELECT source, token, tf, df, score_micro, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
    doc="Keyword extraction: top-5 domain-characteristic terms per "
    "source by TF-IDF, each source treated as one mega-document "
    "(domain granularity keeps idf meaningful for mixture analysis "
    "and the output source-bounded). tf and df fall out of the SAME "
    "aggregate (df = rows per token in the tf table, realized as a "
    "count window over token — one plan, corpus read once, nothing "
    "persisted), the corpus source count is a single-row aggregate "
    "broadcast, and scores land as round(tf * ln(N/df) * 1e6) BIGINT "
    "— the scaled-int64 float discipline, so ranking and hashing "
    "never touch raw doubles. The df window shuffle is "
    "vocabulary-sized, independent of corpus rows; top-k is one "
    "window per source. "
    "No reference analogue — training-data-pipeline text analysis.",
)
def tfidf_keywords(spark, sf_dir):
    from pyspark.sql import Window

    t = tables(spark, sf_dir, "documents")
    docs = t["documents"]
    # df is a WINDOW over tf (count of sources per token), not a
    # self-join: the corpus is read once inside a single plan, the
    # window shuffle is vocabulary-sized, and nothing needs persisting
    # (the previous persist+join shape cached tf and never released it
    # — leaked executor storage across a long session)
    tf = (
        docs.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
        )
    )
    # one column-pruned scan (not derived from tf: a source whose every
    # doc tokenizes empty must still count in N)
    n_sources = docs.select(
        F.countDistinct("source").alias("n")
    )
    scored = (
        tf.crossJoin(F.broadcast(n_sources))
        .select(
            "source",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")) * 1000000.0
            )
            .cast("bigint")
            .alias("score_micro"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("score_micro"), F.asc("token")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .withColumn("rnk", F.col("rnk").cast("bigint"))
    )
