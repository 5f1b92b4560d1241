"""Deterministic sampling / split queries (training-pipeline
extension; operators/sampling.py). The md5-bucket selection is
reproduced verbatim in the DuckDB oracle, so the exact membership of
every split is verified — not just its size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.operators.sampling import (
    downsample_majority,
    hash_bucket,
    stratified_take,
    train_test_split,
)
from idhub_spark.queries import query, tables

_BUCKET_SQL = (
    "CAST(CAST(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS INTEGER)"
)


@query(
    "train_test_split",
    f"""
    SELECT split, COUNT(*) AS n_docs, min(doc_id) AS first_doc
    FROM (
      SELECT doc_id,
             CASE WHEN {_BUCKET_SQL.format(salt="split", key="doc_id")} < 20
                  THEN 'test' ELSE 'train' END AS split
      FROM documents)
    GROUP BY split
    """,
    doc="Deterministic hash-bucket holdout (20% test): same key -> "
    "same side on any run/cluster/partitioning, unlike randomSplit. "
    "Oracle verifies per-split counts AND representative membership.",
)
def train_test_split_q(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    train, test = train_test_split(t["documents"], "doc_id", test_pct=20)

    def tag(df, name):
        return df.select("doc_id", F.lit(name).alias("split"))

    return (
        tag(train, "train")
        .unionByName(tag(test, "test"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )


@query(
    "stratified_sample",
    f"""
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('strat' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    WHERE rn <= 10
    """,
    doc="Exactly-10-per-language deterministic sample: hash-ordered "
    "rank within stratum (stable pseudo-random order, no RNG).",
)
def stratified_sample_q(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    return stratified_take(
        t["documents"], strata="lang", key="doc_id", n_per_stratum=10
    ).select("lang", "doc_id")


@query(
    "sequence_packing",
    f"""
    WITH toks AS (
      SELECT doc_id,
             CAST({_BUCKET_SQL.format(salt="pack", key="doc_id").replace("% 100", "% 8")} AS INTEGER) AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             md5('packo' || CAST(doc_id AS VARCHAR)) AS ord
      FROM documents),
    laid AS (
      SELECT doc_id, shard, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
      FROM toks)
    SELECT doc_id, shard, o // 512 AS seq_id, o % 512 AS offset_in_seq, n_tokens
    FROM laid
    """,
    doc="GPT-style concat-and-chunk sequence-packing assignment "
    "(operators/sampling.py:pack_sequences): hash-shard, stable "
    "pseudo-random order within shard, running token offset -> "
    "(seq_id, offset_in_seq) against seq_len=512. Docs span sequence "
    "boundaries exactly as a packed training stream would. One "
    "window per shard; shards independent, so the layout step scales "
    "as width(cluster) with no cross-shard traffic. Oracle replays "
    "the identical hash order and running sum.",
)
def sequence_packing(spark, sf_dir):
    from idhub_spark.operators.sampling import pack_sequences

    t = tables(spark, sf_dir, "documents")
    return pack_sequences(
        t["documents"],
        key="doc_id",
        token_count=F.size(F.split("text", " ")),
        n_shards=8,
        seq_len=512,
    )


@query(
    "quality_percentile_filter",
    """
    WITH scored AS (
      SELECT doc_id, lang,
             0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
               + 0.2 * least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS quality
      FROM documents),
    ranked AS (
      SELECT doc_id, lang, quality,
             percent_rank() OVER (PARTITION BY lang ORDER BY quality, doc_id) AS pr
      FROM scored)
    SELECT doc_id, lang, quality, pr
    FROM ranked WHERE pr >= 0.2
    """,
    doc="Per-language quality-percentile gate — the data-mix filter "
    "step that keeps each language's top 80% by quality instead of "
    "one global threshold (which would starve low-resource "
    "languages). percent_rank within the lang stratum, doc_id "
    "tie-break; the quality blend reuses the bit-deterministic "
    "length/char-budget terms of text_q's quality_score. One window "
    "per language partition.",
)
def quality_percentile_filter(spark, sf_dir):
    from pyspark.sql import Window

    t = tables(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " ")).cast("double")
    quality = 0.5 * F.least(n_words / 100.0, F.lit(1.0)) + 0.2 * F.least(
        F.col("n_chars").cast("double") / 500.0, F.lit(1.0)
    )
    w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    return (
        t["documents"]
        .select("doc_id", "lang", quality.alias("quality"))
        .withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.2)
    )


@query(
    "downsample_majority_class",
    f"""
    SELECT lang, COUNT(*) AS n
    FROM documents
    WHERE CASE WHEN lang = 'en'
               THEN {_BUCKET_SQL.format(salt="ds", key="doc_id")} < 25
               ELSE TRUE END
    GROUP BY lang
    """,
    doc="Class rebalancing: keep ~25% of the majority language, all "
    "of the rest — a pure deterministic filter, zero shuffle.",
)
def downsample_majority_q(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    return (
        downsample_majority(
            t["documents"], label="lang", key="doc_id", keep_pct={"en": 25}
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "domain_mixture_weights",
    """
    WITH dom AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS dom_tokens
      FROM documents GROUP BY source),
    tot AS (
      SELECT CAST(SUM(dom_tokens) AS BIGINT) AS total_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_domains
      FROM dom)
    SELECT source, n_docs, dom_tokens,
           CAST(dom_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS actual_share,
           (1.0 / CAST(n_domains AS DOUBLE))
             / (CAST(dom_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)) AS sample_weight
    FROM dom CROSS JOIN tot
    """,
    doc="Training-mixture reweighting: per-domain (source) token "
    "counts -> the per-document sampling weight that equalizes each "
    "domain's token share toward the uniform target (the 'domain "
    "mixing' step of LLM data pipelines; target vectors other than "
    "uniform are a constant swap). Shape: one partial-aggregated "
    "groupBy over the corpus (shuffle carries one row per domain), "
    "then a 1-row totals aggregate broadcast back — the same "
    "zero-single-partition-stage pattern as global_distinct_flag; "
    "never a window over an empty partitioning. Double division "
    "shape is identical on both engines (exact bigint inputs), so "
    "the weights hash-match.",
)
def domain_mixture_weights(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    dom = (
        t["documents"]
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " ")).cast("long")).alias("dom_tokens"),
        )
    )
    tot = dom.agg(
        F.sum("dom_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_domains"),
    )
    share = F.col("dom_tokens").cast("double") / F.col("total_tokens").cast("double")
    return dom.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "dom_tokens",
        share.alias("actual_share"),
        ((1.0 / F.col("n_domains").cast("double")) / share).alias("sample_weight"),
    )



@query(
    "weighted_mixture_sample",
    """
    WITH doc AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents),
    dom AS (
      SELECT source, CAST(SUM(n_tok) AS BIGINT) AS dom_tokens
      FROM doc GROUP BY source),
    mn AS (SELECT CAST(MIN(dom_tokens) AS BIGINT) AS min_tok FROM dom),
    rates AS (
      SELECT source, CAST((1000000 * min_tok) // dom_tokens AS BIGINT)
               AS rate_micro
      FROM dom CROSS JOIN mn),
    kept AS (
      SELECT d.source, r.rate_micro, d.n_tok
      FROM doc d JOIN rates r ON d.source = r.source
      WHERE CAST(CAST(('0x' || substr(md5('wmix' || CAST(d.doc_id AS VARCHAR)),
                       1, 8)) AS BIGINT) % 1000000 AS BIGINT) < r.rate_micro)
    SELECT source, rate_micro,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS kept_tokens
    FROM kept GROUP BY source, rate_micro
    """,
    doc="APPLIES the mixture reweighting domain_mixture_weights only "
    "computes: per-domain acceptance thinning toward the uniform "
    "token target. The acceptance rate is derived in PURE INTEGERS — "
    "rate_micro = (1e6 * min_domain_tokens) div domain_tokens, i.e. "
    "each domain downsamples toward the smallest domain's token mass "
    "(the largest-weight domain keeps everything) — and acceptance "
    "is the deterministic md5-uniform of doc_id, so the sample is "
    "reproducible on any cluster/partitioning and the oracle matches "
    "bit-for-bit with zero float boundaries. Shape: one corpus agg "
    "(row per domain), a global-window MIN over those few rows "
    "(single plan, nothing persisted), then a broadcast-rates filter "
    "scan — no shuffle of the corpus itself; the two scans are "
    "inherent (global stats must precede the thinning).",
)
def weighted_mixture_sample(spark, sf_dir):
    from idhub_spark.operators.sampling import hash_bucket

    t = tables(spark, sf_dir, "documents")
    doc = t["documents"].select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    # the MIN is a global window over the per-domain totals (a
    # handful of rows), so dom is consumed exactly once inside one
    # plan and nothing needs persisting — the previous persist+
    # crossJoin shape cached dom and never released it
    from pyspark.sql import Window

    dom = doc.groupBy("source").agg(F.sum("n_tok").alias("dom_tokens"))
    rates = dom.withColumn(
        "min_tok", F.min("dom_tokens").over(Window.partitionBy())
    ).select(
        "source",
        # integer `div`, not `/`: double division loses exactness once
        # 1e6 * min_tok crosses 2^53 (trillion-token domains)
        F.expr("(1000000 * min_tok) div dom_tokens")
        .cast("bigint")
        .alias("rate_micro"),
    )
    u = hash_bucket(F.col("doc_id"), 1000000, "wmix").cast("bigint")
    kept = doc.join(F.broadcast(rates), "source").filter(u < F.col("rate_micro"))
    return kept.groupBy("source", "rate_micro").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tok").alias("kept_tokens"),
    )
