"""Persisted MinHash dedup index: dedupe a NEW batch against corpus
HISTORY without recomputing the corpus.

plans/dedup_q.py's minhash_lsh_pairs is batch-global — the right tool
when the whole corpus is in hand. The production cadence is
different: a crawl/ingest batch arrives and must be deduped against
everything already accepted. Recomputing shingles+signatures for a
100 TB history per batch is the dominant cost; this module persists
the per-document MinHash STATE once, so a probe pays for the BATCH's
shingle work plus a stream of history's two narrow state tables
(~(bands+n_hashes)*8 B per doc — a 100-1000x byte reduction vs the
raw text; bucket the tables for true pruning at extreme scale):

  <path>/docs/   (doc_id, sig array<bigint>, n_sh)  — one row per doc
  <path>/bands/  (band, bkey bigint, doc_id)        — bands rows per doc

Signatures are int64 minima of per-component xxhash64 — 8 bytes per
component vs the 32-byte md5 hex the in-memory path uses (an index
that persists pays for width; the hash family change is a documented
difference, not a drift: both are standard MinHash). Band keys hash
the band's components back through xxhash64. Everything is
deterministic and partitioning-invariant (min over a set).

Probe semantics: candidates = batch bands ⋈ index bands on
(band, bkey), then cross-pair Jaccard is ESTIMATED from signature
component agreement (matching/n_hashes — the classic unbiased MinHash
estimator; var ~ j(1-j)/n_hashes). Exact verification against
history would require storing shingle sets (shingles >> corpus — the
exact thing an index exists to avoid); callers needing exact J on
the survivors re-verify against retained raw text, which the
candidate set has already narrowed to ~pairs.

Scale shape: the probe joins the batch's band rows against the
index's band table on (band, bkey) — Catalyst broadcasts the batch
side when it is small (the common case) and falls back to a shuffle
join for bulk backfills; NO forced hint (the batch side is not
bounded by construction — the r11 broadcast-boundedness rule).
Appends write only new rows (files ∝ batch; existing files never
rewritten). Reference anchor: the reference has no dedup at all —
this extends plans/dedup_q.py's training-data operators to the
incremental regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_state(
    docs: DataFrame,
    *,
    n_hashes: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-doc MinHash state (doc_id, sig array<bigint>, n_sh) — ONE
    aggregation over the shingle set.

    Short-doc fallback: word_shingles emits nothing for documents
    under 3 words, which would silently exclude them from the index
    AND from probes — an exact copy of a short doc would never be
    detected. Such docs contribute their whole (trimmed) text as a
    single shingle instead: exact copies still collide on every band
    deterministically; near-dup sensitivity for them degenerates to
    exact match, which is the honest best available without n-grams.
    """
    from idhub_spark.operators.shingles import word_shingles

    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    sh = word_shingles(base).unionByName(
        base.filter(F.size(F.split("text", " ")) < 3).select(
            "doc_id", F.trim(F.col("text")).alias("sh")
        )
    )
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sigs = sh.groupBy("doc_id").agg(*mins, F.count(F.lit(1)).alias("n_sh"))
    return sigs.select(
        "doc_id",
        F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig"),
        "n_sh",
    )


def _bands_from_state(state: DataFrame, *, n_hashes: int, bands: int) -> DataFrame:
    """Band rows (doc_id, band, bkey) derived from the sig ARRAY — a
    pure projection, so it can run over the just-written docs table
    (one read of narrow columns) instead of recomputing the
    shingle+signature aggregation per output table."""
    rows = n_hashes // bands
    if rows * bands != n_hashes:
        raise ValueError("n_hashes must be divisible by bands")
    parts = [
        state.select(
            "doc_id",
            F.lit(bi).alias("band"),
            F.xxhash64(
                *[F.element_at("sig", bi * rows + r + 1) for r in range(rows)]
            ).alias("bkey"),
        )
        for bi in range(bands)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _load_params(spark, root: str) -> tuple[int, int]:
    row = spark.read.parquet(f"{root}/_params").collect()[0]
    return int(row.n_hashes), int(row.bands)


def _write_state(docs, root, *, n_hashes, bands, id_col, text_col, mode) -> None:
    """One shingle+signature pass per batch: the docs table is written
    from the aggregation, then the band rows are DERIVED from the
    just-written parquet (a narrow re-read + projection) — writing
    both tables from the live lineage would run the whole
    explode+distinct+groupBy twice (once per write job)."""
    spark = docs.sparkSession
    state = _doc_state(docs, n_hashes=n_hashes, id_col=id_col, text_col=text_col)
    state.write.mode(mode).parquet(f"{root}/docs")
    # derive bands from THIS batch's just-written rows only: on append,
    # re-reading the whole docs table would duplicate history's bands
    written = spark.read.parquet(f"{root}/docs")
    if mode == "append":
        written = written.join(
            docs.select(F.col(id_col).alias("doc_id")), "doc_id", "semi"
        )
    _bands_from_state(written, n_hashes=n_hashes, bands=bands).write.mode(
        mode
    ).parquet(f"{root}/bands")


def minhash_index_write(
    docs: DataFrame,
    path: str,
    *,
    n_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the MinHash dedup index for a document frame and
    record its build parameters under <path>/_params (underscore dir —
    invisible to data scans, same convention as the ANN _fits): band
    keys are positional functions of (n_hashes, bands), so a probe
    built with different parameters would silently find NOTHING;
    append/probe read the stored parameters instead of trusting the
    caller. doc_ids are assumed unique across the index's lifetime
    (the ingest key discipline every upsert in this engine already
    follows)."""
    root = path.rstrip("/")
    _write_state(
        docs,
        root,
        n_hashes=n_hashes,
        bands=bands,
        id_col=id_col,
        text_col=text_col,
        mode="overwrite",
    )
    docs.sparkSession.createDataFrame(
        [(n_hashes, bands)], "n_hashes int, bands int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/_params")


def minhash_index_append(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Accept a batch INTO the index (after its probe survived review):
    append-only, I/O ∝ batch, build parameters read from the index
    itself."""
    root = path.rstrip("/")
    n_hashes, bands = _load_params(docs.sparkSession, root)
    _write_state(
        docs,
        root,
        n_hashes=n_hashes,
        bands=bands,
        id_col=id_col,
        text_col=text_col,
        mode="append",
    )


def minhash_index_probe(
    spark,
    path: str,
    batch: DataFrame,
    *,
    threshold_est: float = 0.5,
    include_batch_pairs: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs of a NEW batch against the persisted index
    (and, by default, within the batch itself) WITHOUT touching
    history's raw text: (new_id, dup_id, est_jaccard, dup_source) with
    dup_source 'history' | 'batch' and est_jaccard the signature-
    agreement estimate, filtered at threshold_est. Build parameters
    come from the index's own _params (band keys are positional
    functions of them — a mismatched probe would silently find
    nothing, so the caller is not trusted with them).

    Cost shape: the batch computes its own shingle state once;
    history contributes its (band, bkey) rows to the candidate join
    and matched signatures to the estimate join — the probe STREAMS
    those two narrow tables (~(bands+n_hashes)*8 B per history doc,
    a 100-1000x byte reduction vs re-shingling raw text) rather than
    point-looking them up; at extreme history scale, bucket bands by
    bkey and docs by doc_id (storage.write_bucketed) so the joins
    prune to the batch's buckets. The r11 scale audit measured the
    streaming term directly: +0.2 s at 10x history with a fixed
    batch."""
    root = path.rstrip("/")
    n_hashes, bands = _load_params(spark, root)
    b_state = _doc_state(batch, n_hashes=n_hashes, id_col=id_col, text_col=text_col)
    b_bands = _bands_from_state(b_state, n_hashes=n_hashes, bands=bands)
    idx_bands = spark.read.parquet(f"{root}/bands")
    idx_docs = spark.read.parquet(f"{root}/docs")

    est = (
        F.aggregate(
            F.zip_with(
                "sig", "dup_sig", lambda a, b: (a == b).cast("int")
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.lit(float(n_hashes))
    )

    def scored(cand, dup_state, source):
        return (
            cand.join(b_state.select("doc_id", "sig"), cand["new_id"] == F.col("doc_id"))
            .drop("doc_id")
            .join(
                dup_state.select(
                    F.col("doc_id").alias("_did"), F.col("sig").alias("dup_sig")
                ),
                cand["dup_id"] == F.col("_did"),
            )
            .select(
                "new_id",
                "dup_id",
                est.alias("est_jaccard"),
                F.lit(source).alias("dup_source"),
            )
            .filter(F.col("est_jaccard") >= threshold_est)
        )

    hist_cand = (
        b_bands.join(idx_bands.alias("i"), ["band", "bkey"])
        .select(
            b_bands["doc_id"].alias("new_id"), F.col("i.doc_id").alias("dup_id")
        )
        .distinct()
    )
    out = scored(hist_cand, idx_docs, "history")
    if include_batch_pairs:
        a, b = b_bands.alias("a"), b_bands.alias("b")
        batch_cand = (
            a.join(b, ["band", "bkey"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("new_id"), F.col("b.doc_id").alias("dup_id")
            )
            .distinct()
        )
        out = out.unionByName(scored(batch_cand, b_state, "batch"))
    return out
