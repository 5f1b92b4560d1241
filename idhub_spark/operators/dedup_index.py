"""Persisted MinHash dedup index: dedupe a NEW batch against corpus
HISTORY without recomputing the corpus.

plans/dedup_q.py's minhash_lsh_pairs is batch-global — the right tool
when the whole corpus is in hand. The production cadence is
different: a crawl/ingest batch arrives and must be deduped against
everything already accepted. Recomputing shingles+signatures for a
100 TB history per batch is the dominant cost; this module persists
the per-document MinHash STATE once, so a probe pays for the BATCH's
shingle work plus a PRUNED read of history's two narrow state tables:

  <path>/docs/   (doc_id, sig array<bigint>, n_sh)  — one row per doc,
                 hash-partitioned by db = pmod(xxhash64(doc_id), D)
  <path>/bands/  (band, bkey bigint, doc_id)        — bands rows/doc,
                 hash-partitioned by pb = pmod(bkey, P)

The partition columns make the probe's two history reads prune at the
FILE level (Hive layout → PartitionFilters in the scan, the same
mechanism as the on-disk IVF index): the candidate join can only
match history band rows whose bkey equals a batch bkey, so reading
only the batch's pb partitions is lossless; the estimate join only
needs the matched candidates' doc rows, so reading only their db
partitions is lossless too. Both prune sets are collected as bounded
literals (≤ P and ≤ D values — partition ids, never keys). A batch
touching t of P band partitions reads t/P of history's band files
regardless of history size; state rows are ~(bands+n_hashes)*8 B per
doc — a 100-1000x byte reduction vs the raw text even unpruned.

Why Hive partitioning rather than catalog bucketing
(storage.write_bucketed): bucketBy metadata lives in the session
metastore, but this index is SELF-CONTAINED on a path — the round
driver (and any production reader) opens it from a bare SparkSession
where catalog bucket info would silently vanish and the table would
read as plain parquet. Path-based partition pruning needs no catalog
and shows up verifiably in the executed plan. Set pb_buckets /
db_buckets to 0 at write time for the flat (unpruned, stream-all)
layout; probe results are byte-identical either way (pruning only
removes partitions that cannot join).

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

Scale shape: the candidate join runs batch bands against the PRUNED
history band partitions — Catalyst broadcasts the batch side when it
is small (the common case) and falls back to a shuffle join for bulk
backfills; NO forced hint (the batch side is not bounded by
construction — the r11 broadcast-boundedness rule).

Crash safety: a batch append stages its two tables under
<path>/_append_staging, writes a _COMMITTED marker as the LAST
staging write, then FS-renames the staged part-files into the live
partition directories (append-only: existing files never touched).
A crash before the marker leaves provably-unapplied staging (the next
append discards it); a crash during the rename-in is resumed by the
next append (each file lives in exactly one place, so the promotion
is idempotent and rows are never duplicated). A full rebuild
(minhash_index_write) deletes _params FIRST and rewrites it LAST, so
a crashed rebuild raises 'no _params' on the next probe instead of
serving a half-old, half-new index. Reference anchor: the reference
has no dedup at all — this extends plans/dedup_q.py's training-data
operators to the incremental regime.

LSM delta buffer (r14 — the fix for the r13 audit's append finding):
a DIRECT append creates ~min(batch_band_rows, pb) +
min(batch_docs, db) staged files and renames each into the Hive
layout, a fixed file-op term (~47-84 s/append at pb=4096/db=1024 on
the audit host) that dominates small-batch cadence REGARDLESS of
batch bytes — and on object storage every rename is a copy. Small
appends therefore land as ONE file per state table under
<path>/delta/{docs,bands} (partition ids attached as plain DATA
columns), making a small append's file ops O(1). Every reader
composes the live Hive layout with the delta: probes and deletes
read bands ∪ delta and docs ∪ delta with the SAME bounded prune
applied to both sides (PartitionFilters on the Hive side, a row
filter on the tiny delta), so results are byte-identical to the
folded layout by construction. minhash_index_delete rewrites the
delta tables alongside the pruned partitions; minhash_index_compact
FOLDS the delta into the partitioned layout (the LSM MAJOR
compaction — the compacted copy has no delta), and
minhash_index_fold_delta is the MINOR compaction (flush): it re-lays
only the buffer's rows into the Hive layout at I/O ∝ delta bytes,
history untouched — the cadence operation that bounds the buffer's
probe tax between majors. Append mode is 'auto' by default:
batches under direct_min_docs (default 32·(pb+db) — ≥~32 rows per
file the direct path would create) buffer into the delta, larger
batches take the direct partition-rename path whose per-file cost
they amortize. The delta stays small by construction (compaction
cadence folds it), so the probe's extra scan is one tiny file per
small append since the last compaction.

Single-writer assumption: maintenance entry points (append, delete,
compact) assume ONE writer at a time — the staging/settle protocol
makes crashes of that single writer resumable, not concurrent
writers safe. Read-only entry points (probe, stats) settle pending
staging BEST-EFFORT: losing a settle race to a concurrent writer, or
probing from a read-only replica, degrades to a warning + a read of
the live files only (ADVICE r13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STAGING = "_append_staging"
_COMMITTED = "_COMMITTED"
_DELTA = "delta"
_FOLD = "_FOLD_DELTA"
_INGEST_LOG = "_ingest_log"
# root-level flag (dot-prefixed: invisible to every parquet scan) set
# by _settle_delta_rewrite's rollback branch — the one settle outcome
# that RESTORES rows a crashed delete had already retracted. Root-level
# (not inside delta/) on purpose: a later fold that empties the buffer
# drops the delta dir while the doomed rows it folded are now LIVE, so
# the flag must outlive the buffer. Cleared by the next completed
# delete that plausibly covered the restored rows (ADVICE r16: one
# that rewrote the delta buffer, or ran after a fold consumed it —
# an unrelated delete that never touched the buffer keeps the flag;
# the clear site in minhash_index_delete has the full argument), by a
# rebuild (new generation), and carried by compact (the copy holds the
# same rows). The caller-side contract is at-least-once retry of the
# SAME takedown until it returns (docs/operations.md §dedup-index).
# Surfaced as a warning by minhash_index_stats (ADVICE r15).
_RERUN_MARKER = "._delete_rerun_needed"


def _doc_state(
    docs: DataFrame,
    *,
    n_hashes: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-doc MinHash state (doc_id, sig array<bigint>, n_sh) — a
    pure per-row projection, ZERO shuffles (r19 optimization).

    The r18 shape (word_shingles -> distinct -> groupBy(doc_id) with
    n_hashes mins) paid two exchanges per invocation — a distinct over
    the exploded shingle rows and the signature aggregation — and a
    second scan of the input for the short-doc fallback union. But the
    shingle SET of one document is a per-row value: build it as an
    array column (array_distinct over the word-3-gram transform, the
    whole trimmed text for docs under 3 words) and take each signature
    component as array_min(transform(shset, s -> xxhash64(i, s))).
    min over a set is duplicate- and order-insensitive, so the values
    are bit-identical to the aggregated form; n_sh is the distinct
    count either way. Same hash evaluations per (doc, shingle), no
    exchange, one scan (plan + A/B value pins:
    tests/test_dedup_index.py::test_doc_state_plan_shape_and_ab_values).

    The two explode(array(...)) Generates are 1-row:1-row barriers
    that materialize the split array and the shingle set as real
    attributes — without them CollapseProject inlines the split into
    every shingle lookup and the shingle build into every one of the
    n_hashes array_mins (the word_shingles quadratic-replan trap;
    subexpression elimination does not reach into lambda bodies).

    Short-doc fallback: word-3-gram shingling emits nothing for
    documents under 3 words, which would silently exclude them from
    the index AND from probes — an exact copy of a short doc would
    never be detected. Such docs contribute their whole (trimmed) text
    as a single shingle instead: exact copies still collide on every
    band deterministically; near-dup sensitivity for them degenerates
    to exact match, which is the honest best available without
    n-grams. NULL-text docs are excluded entirely (the pre-r19
    behavior: neither shingle branch emitted a row for them).

    doc_ids are assumed unique across the input (the module-level
    ingest discipline); the old groupBy coincidentally merged
    duplicate ids, this form emits one row per input row.

    Memory envelope: one document's shingle SET now lives in a single
    row value (the exploded form streamed it) — per-task memory is
    bounded by the largest document's shingle bytes (~3x its text).
    Ingest-size discipline already caps documents well under row
    limits (the doc_chunking operator is the pressure valve for
    outliers); a corpus of multi-GB single documents should chunk
    before indexing.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).filter(F.col("text").isNotNull())
    ws_row = base.select(
        "doc_id",
        "text",
        F.explode(F.array(F.split("text", " "))).alias("ws"),
    )
    shset = F.array_distinct(
        F.when(
            F.size("ws") >= 3,
            F.expr(
                "transform(sequence(0, size(ws)-3), "
                "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"
            ),
        ).otherwise(F.array(F.trim(F.col("text"))))
    )
    st = ws_row.select("doc_id", F.explode(F.array(shset)).alias("shs"))
    # ONE F.expr for the whole signature array: building the n_hashes
    # array_min(transform(...)) columns through the Python DSL costs
    # hundreds of Py4J round-trips per call (~0.5 s of pure driver
    # time, x7 calls per cadence-query run — measured); the SQL string
    # is a single JVM-side parse. xxhash64(<int literal>, s) types the
    # seed exactly like F.lit(i), so values are bit-identical
    # (A/B-pinned in tests/test_dedup_index.py::
    # test_doc_state_plan_shape_and_ab_values).
    sig = (
        "array("
        + ", ".join(
            f"array_min(transform(shs, s -> xxhash64({i}, s)))"
            for i in range(n_hashes)
        )
        + ")"
    )
    return st.select(
        "doc_id",
        F.expr(sig).alias("sig"),
        F.size("shs").cast("bigint").alias("n_sh"),
    )


def _bands_from_state(state: DataFrame, *, n_hashes: int, bands: int) -> DataFrame:
    """Band rows (doc_id, band, bkey) derived from the sig ARRAY — a
    pure projection over the (checkpointed) per-doc state, so deriving
    the second table never re-runs the shingle aggregation or touches
    history."""
    rows = n_hashes // bands
    if rows * bands != n_hashes:
        raise ValueError("n_hashes must be divisible by bands")
    # one explode(array(struct...)) instead of a `bands`-way union
    # (r19): the union re-scanned the (checkpointed) state once per
    # band and scheduled a taskset per branch; the Generate emits the
    # same rows in one pass. Built as ONE SQL string — the Python DSL
    # pays a Py4J round-trip per expression node (the _doc_state
    # measurement). `<int> as band` types the literal exactly like
    # F.lit(bi).
    structs = ", ".join(
        "struct({bi} as band, xxhash64({comps}) as bkey)".format(
            bi=bi,
            comps=", ".join(
                f"element_at(sig, {bi * rows + r + 1})" for r in range(rows)
            ),
        )
        for bi in range(bands)
    )
    return state.select(
        "doc_id", F.expr(f"explode(array({structs}))").alias("_b")
    ).select("doc_id", "_b.band", "_b.bkey")


# r19: the build parameters are ALSO encoded in a marker FILENAME
# (_params/_META.<n_hashes>.<bands>.<pb>.<db>) so the per-entry-point
# parameter load is one globStatus RPC (~3 ms) instead of a full Spark
# job over the 1-row parquet (~150-300 ms measured — every maintenance
# entry point pays it, 7x per cadence-query run). The parquet row
# stays authoritative and is still written (it is the rebuild's commit
# marker and the pre-r19 readers' format); the marker is written
# beside it AFTER the parquet lands, so a crash between the two just
# means the next load takes the parquet fallback. Same
# metadata-in-the-filename discipline as the ingest log's
# <key>.<accept_ms> markers (storage-independent, no stream reads).
_PARAMS_META = "_META"


def _write_params_meta(spark, root: str, vals: tuple[int, int, int, int]) -> None:
    from idhub_spark.operators.merge_into import _hadoop_fs

    name = ".".join(str(int(v)) for v in vals)
    # use the fs RESOLVED FOR THIS PATH, never a caller's (ADVICE r19:
    # compact passed its src-resolved fs while creating the marker
    # under dst — a cross-filesystem compact threw 'Wrong FS' after
    # dst data and _params were already written)
    fs, jm = _hadoop_fs(spark, f"{root}/_params/{_PARAMS_META}.{name}")
    fs.create(jm, True).close()


def _write_small_parquet(
    spark, dir_path: str, rows: list[tuple], schema: str
) -> None:
    """Land a TINY all-integer control-plane parquet directory WITHOUT
    a Spark job (r20 — VERDICT r19 candidate #3): even the
    literal_frame + coalesce(1) write is a full job (~0.2-0.3 s), paid
    by every index write/compact (_params) and every staged split/merge
    marker. The bytes are built driver-side with pyarrow — int32 for
    'int', int64 for 'bigint', schema-exact to what the Spark write
    produced — and streamed through the Hadoop FileSystem API, so the
    path stays storage-independent (object stores included) and every
    reader is unchanged: spark.read.parquet over the directory. The
    directory is cleared first (mode='overwrite' semantics). Falls back
    to the literal_frame Spark write on any pyarrow/stream failure —
    never silently (the caller would otherwise re-pay the job forever
    without a signal)."""
    from idhub_spark.operators.merge_into import _hadoop_fs

    fields = [f.strip().rsplit(" ", 1) for f in schema.split(",")]
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pa_types = {"int": pa.int32(), "bigint": pa.int64(), "long": pa.int64()}
        table = pa.table(
            {
                name.strip(): pa.array(
                    [int(row[i]) for row in rows], pa_types[typ]
                )
                for i, (name, typ) in enumerate(fields)
            }
        )
        sink = pa.BufferOutputStream()
        pq.write_table(table, sink)
        data = sink.getvalue().to_pybytes()
        fs, jdir = _hadoop_fs(spark, dir_path)
        if fs.exists(jdir):
            fs.delete(jdir, True)
        _, jf = _hadoop_fs(
            spark, f"{dir_path.rstrip('/')}/part-00000-driver.snappy.parquet"
        )
        out = fs.create(jf, True)
        try:
            out.write(data)
        finally:
            out.close()
    except Exception as e:
        import warnings

        warnings.warn(
            f"driver-side parquet write of {dir_path!r} failed "
            f"({type(e).__name__}: {e}); falling back to the Spark "
            "parquet write",
            stacklevel=2,
        )
        from idhub_spark.session import literal_frame

        literal_frame(spark, rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(dir_path)


def _write_params_parquet(
    spark, root: str, vals: tuple[int, int, int, int]
) -> None:
    """The authoritative 1-row _params parquet, driver-side (no Spark
    job; format, the delete-first/rewrite-last commit protocol and
    every pre-r19 reader unchanged — see _write_small_parquet)."""
    _write_small_parquet(
        spark,
        f"{root}/_params",
        [tuple(int(v) for v in vals)],
        "n_hashes int, bands int, pb_buckets int, db_buckets int",
    )


def _load_params(spark, root: str) -> tuple[int, int, int, int]:
    from idhub_spark.operators.merge_into import _hadoop_fs

    fs, jp = _hadoop_fs(spark, f"{root}/_params")
    if not fs.exists(jp):
        raise ValueError(
            f"minhash index at {root!r} has no _params — not an index, "
            "or a rebuild crashed mid-write (rerun minhash_index_write)"
        )
    # fast path: parameters from the marker filename (glob-escaped
    # root — caller path, the _ingest_log_has discipline)
    _, jglob = _hadoop_fs(
        spark, f"{_glob_escape(root.rstrip('/'))}/_params/{_PARAMS_META}.*"
    )
    matches = fs.globStatus(jglob)
    if matches is not None and len(matches) == 1:
        parts = matches[0].getPath().getName().split(".")[1:]
        if len(parts) == 4 and all(p.lstrip("-").isdigit() for p in parts):
            n_hashes, bands, pb, db = (int(p) for p in parts)
            return n_hashes, bands, pb, db
    row = spark.read.parquet(f"{root}/_params").collect()[0]
    # pre-r12 indexes carry no bucket columns: flat layout, no pruning
    pb = int(getattr(row, "pb_buckets", 0) or 0)
    db = int(getattr(row, "db_buckets", 0) or 0)
    return int(row.n_hashes), int(row.bands), pb, db


def _tables(
    state: DataFrame, *, n_hashes: int, bands: int, pb_buckets: int, db_buckets: int
) -> tuple[DataFrame, DataFrame]:
    """The index's two tables for one batch's state, with partition
    columns attached when the layout is bucketed. Both derive from the
    same (checkpointed) state — one shingle pass per batch, no history
    read (the r11 append re-scanned history's docs table to re-derive
    the batch's bands; deriving from the live state makes append I/O
    strictly ∝ batch)."""
    docs_df = state
    bands_df = _bands_from_state(state, n_hashes=n_hashes, bands=bands)
    if db_buckets:
        docs_df = docs_df.withColumn(
            "db", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(db_buckets))
        )
    if pb_buckets:
        bands_df = bands_df.withColumn(
            "pb", F.pmod(F.col("bkey"), F.lit(pb_buckets))
        )
    return docs_df, bands_df


def _write_table(df: DataFrame, path: str, part_col: str | None) -> None:
    """One file per touched partition (pre-write repartition by the
    partition column — the IVF index writer's file-count discipline),
    Hive layout for PartitionFilters pruning; flat write when the
    layout is unbucketed."""
    if part_col:
        df.repartition(F.col(part_col)).write.mode("overwrite").partitionBy(
            part_col
        ).parquet(path)
    else:
        df.write.mode("overwrite").parquet(path)


def _par_jobs(*thunks) -> None:
    """Run INDEPENDENT Spark actions concurrently from driver threads
    (r19 — the optimization guide's job-overlap pattern): the index's
    docs and bands tables derive from the same checkpointed state and
    land under different paths, so writing them sequentially leaves
    the cluster idle through each job's scheduling tail. Job
    descriptions/groups are thread-local and Py4J allocates one
    gateway connection per thread, so a plain pool is safe; every
    thunk is awaited and the first exception re-raises BEFORE the
    caller proceeds to its commit marker — crash-safety ordering is
    unchanged (both tables staged, then marked). NOT used where
    write ORDER is load-bearing (minhash_index_delete's bands-first
    rewrite)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futures = [ex.submit(t) for t in thunks]
        for f in futures:
            f.result()


def _move_tree(spark, fs, src: str, dst: str) -> None:
    """Rename every data file under src into the mirrored path under
    dst (creating directories as needed). Files are never overwritten
    or copied — each lives in exactly one place, so a crashed promotion
    resumes idempotently.

    The renames run on a driver THREAD POOL (r14, measured honestly
    in scale_audit_r14.md §3b): on LOCAL disk the pool buys only
    ~1.3× (renames are ~3 ms of GIL-bound Py4J marshalling, not I/O
    wait — and the direct path's wall is dominated by the staged
    parquet write itself, not the promotion). The pool's real target
    is high-latency filesystems (object stores, remote HDFS) where
    each rename is a 50-200 ms NETWORK round-trip that releases the
    GIL — there 16 workers approach 16×, and that is where the
    promotion term would otherwise dominate. Py4J allocates one
    gateway connection per Python thread and Hadoop FileSystem
    instances are thread-safe; semantics are identical to the
    sequential loop: destination dirs are pre-created sequentially
    (few), each file still lands via a single atomic rename, and ANY
    rename returning false raises with the staging intact (order
    between files never mattered — resume is file-idempotent)."""
    from concurrent.futures import ThreadPoolExecutor

    from idhub_spark.operators.merge_into import _hadoop_fs

    pairs = []

    def walk(s: str, d: str) -> None:
        _, js = _hadoop_fs(spark, s)
        for st in fs.listStatus(js):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            if st.isFile():
                pairs.append((st.getPath(), d, f"{d}/{name}", f"{s}/{name}"))
            else:
                walk(f"{s}/{name}", f"{d}/{name}")

    walk(src, dst)
    if not pairs:
        return
    for d in sorted({p[1] for p in pairs}):
        fs.mkdirs(_hadoop_fs(spark, d)[1])

    def _rename(pair):
        jsrc_file, _, dst_file, src_file = pair
        # Hadoop rename signals failure by RETURNING false (e.g. a
        # same-named dst already exists) — ignoring it and then
        # deleting the staging would silently lose the batch's rows.
        # Part-file names are write-unique UUIDs, so this should never
        # fire; if it does, fail loudly with the staging intact (the
        # next append resumes it).
        if not fs.rename(jsrc_file, _hadoop_fs(spark, dst_file)[1]):
            raise RuntimeError(
                f"dedup-index staging promotion: rename failed for "
                f"{src_file} -> {dst_file}; staging left in place for "
                "resume"
            )

    with ThreadPoolExecutor(max_workers=16) as ex:
        list(ex.map(_rename, pairs))


def _resume_or_discard_staging(spark, root: str, *, best_effort: bool = False) -> None:
    """Append crash protocol: a staging WITH the _COMMITTED marker was
    fully written and is promoted (finishing an interrupted rename-in);
    a staging without it can never have been applied — discard.

    best_effort=True (probe/stats — the read-only entry points,
    ADVICE r13): a settle that fails (a concurrent writer won the
    promotion race mid-iteration, or the index is a read-only
    replica) degrades to a warning and the caller reads the live
    files only, instead of failing a healthy read. Writers (append,
    delete, compact) keep the mandatory settle — they must never act
    on an index they couldn't fully see."""
    from idhub_spark.operators.merge_into import _hadoop_fs

    staging = f"{root}/{_STAGING}"
    fs, jstag = _hadoop_fs(spark, staging)
    if not fs.exists(jstag):
        return
    try:
        _, jmark = _hadoop_fs(spark, f"{staging}/{_COMMITTED}")
        if fs.exists(jmark):
            _promote_staging(spark, root)
        else:
            fs.delete(jstag, True)
    except Exception:
        if not best_effort:
            raise
        import warnings

        warnings.warn(
            f"dedup index {root!r}: could not settle pending append "
            "staging (concurrent writer or read-only storage); reading "
            "live files only",
            stacklevel=2,
        )


def _batch_key(batch_id: str) -> str:
    """Filesystem-safe ingest-log key for a caller batch id (hashed —
    ids are caller strings, never trusted as path components)."""
    import hashlib

    return hashlib.sha256(batch_id.encode("utf-8")).hexdigest()[:32]


def _marker_parse(name: str, mtime_ms: int) -> tuple[str, int]:
    """(key, accept_ms) of one ingest-log entry. r17 entries encode
    the accept time in the FILENAME (<key>.<accept_ms>) so the horizon
    clock is storage-independent — Hadoop's base FileSystem.setTimes is
    a silent no-op and S3A doesn't override it, so an mtime-dated entry
    carried by compact was reborn with mtime=now on object stores and
    never aged out (VERDICT r16 what's-wrong #1; over-retention only,
    but it voided the size bound exactly on the tier it targets).
    Legacy bare-key entries (pre-r17) fall back to the file's mtime;
    the compact carry canonicalizes them to the named form."""
    stem, _, suffix = name.rpartition(".")
    if stem and suffix.isdigit():
        return stem, int(suffix)
    return name, mtime_ms


def _marker_name(key: str, accept_ms: int) -> str:
    return f"{key}.{accept_ms}"


# Hadoop glob metacharacters (org.apache.hadoop.fs.GlobPattern).
# Backslash is itself a metachar and must be IN the set so literal
# backslashes get escaped too; _glob_escape maps each character
# independently, so ordering within this string is irrelevant.
_GLOB_SPECIALS = "\\*?[]{}"


def _glob_escape(path: str) -> str:
    """Backslash-escape Hadoop glob metacharacters so a literal path
    can be embedded in a globStatus pattern. Hadoop's Globber
    unescapes during matching, so an escaped component matches the
    literal directory name."""
    return "".join(
        ("\\" + ch) if ch in _GLOB_SPECIALS else ch for ch in path
    )


def _ingest_log_has(spark, root: str, key: str) -> bool:
    """True iff the ingest log records `key` — one globStatus RPC over
    <escaped-root>/_ingest_log/<key>* (matches both the named r17 form
    and legacy bare keys; keys are fixed-length sha256 prefixes, so no
    other key shares a prefix). The index ROOT is a caller path, so it
    is glob-ESCAPED before interpolation — a root containing glob
    metacharacters ([, ], *, ?, {}) would otherwise silently misdirect
    the duplicate check and re-admit retried batches (ADVICE r17; the
    key itself is safe hex and stays unescaped). globStatus, not
    listStatus + driver-side prefix match: the matching must stay
    JVM-side — iterating FileStatus names through Py4J measured
    563-790 ms/call at the documented ~700-entry log bound vs 26-29 ms
    for the escaped glob (docs/scale_audit_r18.md §1), and on object
    stores both issue the same LIST. Null glob result = log dir
    absent."""
    from idhub_spark.operators.merge_into import _hadoop_fs

    fs, jglob = _hadoop_fs(
        spark, f"{_glob_escape(root.rstrip('/'))}/{_INGEST_LOG}/{key}*"
    )
    matches = fs.globStatus(jglob)
    return matches is not None and len(matches) > 0


def _record_ingest_entries(spark, fs, root: str, keys: list[str]) -> None:
    """Create the named ingest-log entry for each batch key, skipping
    keys already logged (a crash-resumed promotion re-enters here; the
    skip keeps the log single-entry-per-key instead of minting a second
    accept time)."""
    import time

    from idhub_spark.operators.merge_into import _hadoop_fs

    now_ms = int(time.time() * 1000)
    for key in keys:
        if _ingest_log_has(spark, root, key):
            continue
        _, jlog = _hadoop_fs(
            spark, f"{root}/{_INGEST_LOG}/{_marker_name(key, now_ms)}"
        )
        fs.create(jlog, True).close()


# Ingest-log retention (ADVICE/VERDICT r15: the log was the one r15
# structure with NO size bound — one empty marker per accepted batch,
# forever, carried entry-by-entry by every compact). Exactly-once only
# needs the log to cover the caller's at-least-once RETRY window: a
# retry that arrives after every queue/driver/orchestrator timeout has
# expired is a new ingest decision, not a replay. Entries older than
# the horizon are pruned at the maintenance cadence (fold + compact —
# never on the hot append path, which stays O(1) fs calls), so the
# log's size is bounded by batch_rate x horizon (~700 entries at the
# engine's stated ~100 batches/day and the 7-day default) instead of
# total batches ever (~36k/year). docs/operations.md §ingest-log.
INGEST_LOG_HORIZON_S = 7 * 24 * 3600.0


def _prune_ingest_log(
    spark, root: str, horizon_s: float | None, *, now_ms: int | None = None
) -> int:
    """Delete ingest-log entries whose ACCEPT time is older than the
    retry horizon. The accept time is read from the entry's filename
    (<key>.<accept_ms> — storage-independent, see _marker_parse) with
    the file mtime as the legacy fallback. One listStatus + one delete
    per expired entry — amortized O(batches accepted since the last
    prune) when run at the fold/compact cadence. horizon_s=None
    disables (a caller that truly needs replay protection over
    unbounded history keeps every entry and accepts the growth).
    Returns the number pruned."""
    if horizon_s is None:
        return 0
    import time

    from idhub_spark.operators.merge_into import _hadoop_fs

    fs, jlog = _hadoop_fs(spark, f"{root.rstrip('/')}/{_INGEST_LOG}")
    if not fs.exists(jlog):
        return 0
    if now_ms is None:
        now_ms = int(time.time() * 1000)
    cutoff = now_ms - int(horizon_s * 1000)
    pruned = 0
    for st in fs.listStatus(jlog):
        _, accept_ms = _marker_parse(
            st.getPath().getName(), st.getModificationTime()
        )
        if accept_ms < cutoff:
            fs.delete(st.getPath(), False)
            pruned += 1
    return pruned


def _promote_staging(spark, root: str) -> None:
    """Rename a committed staging's files into the live layout. A
    staging carrying the _FOLD_DELTA marker is a minor compaction
    (minhash_index_fold_delta): its staged partition trees ARE the
    delta's rows re-laid-out, so after the rename-in the delta dir is
    deleted — in that order, and the delta delete precedes the staging
    delete, so every crash point resumes idempotently (re-promote
    moves nothing, re-deletes nothing, then clears the staging).

    A staging carrying a _BATCH_<key> marker (an append with an
    idempotency batch_id, r15) additionally records
    <root>/_ingest_log/<key>.<accept_ms> AFTER the renames and BEFORE
    the staging delete (accept time in the NAME — storage-independent
    age, _marker_parse): a crash between renames and log write
    re-promotes (no-op) then writes the log; between log write and
    staging delete the re-promote and log record are both idempotent
    (_record_ingest_entries skips keys already logged) — so the log
    entry exists iff the batch's rows are fully live, which is exactly
    the exactly-once test the retry path needs."""
    from idhub_spark.operators.merge_into import _hadoop_fs

    staging = f"{root}/{_STAGING}"
    fs, jstag = _hadoop_fs(spark, staging)
    folding = fs.exists(_hadoop_fs(spark, f"{staging}/{_FOLD}")[1])
    batch_keys = [
        st.getPath().getName()[len("_BATCH_"):]
        for st in fs.listStatus(jstag)
        if st.getPath().getName().startswith("_BATCH_")
    ]
    # 'delta' last: its staged subtree mirrors delta/{docs,bands}, so
    # _move_tree lands the buffered batch's two files in one recursion
    for table in ("docs", "bands", _DELTA):
        _, jsrc = _hadoop_fs(spark, f"{staging}/{table}")
        if fs.exists(jsrc):
            _move_tree(spark, fs, f"{staging}/{table}", f"{root}/{table}")
    if folding:
        _, jdelta = _hadoop_fs(spark, f"{root}/{_DELTA}")
        fs.delete(jdelta, True)
    _record_ingest_entries(spark, fs, root, batch_keys)
    fs.delete(jstag, True)


def _read_state_table(
    spark,
    root: str,
    table: str,
    *,
    prune_col: str | None = None,
    prune_vals: list | None = None,
) -> DataFrame:
    """The LOGICAL image of one state table: live Hive layout ∪ delta
    buffer, with the same bounded prune applied to both sides — a
    PartitionFilter on the live side (file-level pruning), a row
    filter on the delta (one tiny file per buffered append, where the
    partition id is a plain column). Lossless by the same argument as
    the live prune: a row whose pb/db is outside the batch's set
    cannot join. Every reader goes through here so bands∪delta is
    byte-equivalent to the folded layout by construction."""
    from idhub_spark.operators.merge_into import _hadoop_fs

    df = spark.read.parquet(f"{root}/{table}")
    if prune_col and prune_vals is not None and prune_col in df.columns:
        df = df.filter(F.col(prune_col).isin(prune_vals))
    delta = f"{root}/{_DELTA}/{table}"
    fs, jd = _hadoop_fs(spark, delta)
    if fs.exists(jd):
        d = spark.read.parquet(delta)
        if prune_col and prune_vals is not None and prune_col in d.columns:
            d = d.filter(F.col(prune_col).isin(prune_vals))
        df = df.unionByName(d)
    return df


def _settle_delta_rewrite(spark, root: str, *, best_effort: bool = False) -> None:
    """Settle a delete's pending DELTA-TABLE rewrite (ADVICE r14): the
    retraction path replaces a delta table's image with its survivor
    set through a rename swap — stage survivors to
    _delete_staging/delta_<t>, rename the live table ASIDE to
    delta/._old_<t>, rename the staged dir in, drop the aside — so no
    crash point ever leaves a directory that fs.exists passes but
    parquet can't read (the old second-overwrite protocol's failure
    mode: dst cleared, only _temporary written). Each state is
    unambiguous:

      aside + live present          → crash between the staged
                                      rename-in and the aside drop;
                                      the live table IS the survivor
                                      set — drop the aside.
      aside present, live absent,
      staged survivors present      → crash between the aside rename
                                      and the staged rename-in —
                                      rename the survivors in, drop
                                      the aside.
      aside present, both absent    → staged survivors vanished
                                      (manual staging cleanup); the
                                      aside still holds the only copy
                                      of the survivor rows — roll BACK
                                      (rename aside to live; the
                                      doomed rows it also holds are
                                      re-retracted by the delete
                                      rerun this state implies).

    Runs FIRST at every entry point (before the append-staging
    settle): promotion of a buffered append re-creates the live delta
    dir additively, which would make the aside+live state ambiguous —
    settling the rewrite first keeps each state's meaning exact. Two
    fs.exists calls when nothing is pending. best_effort mirrors
    _resume_or_discard_staging (read-only entry points warn and read
    the live files only)."""
    from idhub_spark.operators.merge_into import _hadoop_fs

    staging = f"{root}/_delete_staging"
    for table in ("docs", "bands"):
        aside = f"{root}/{_DELTA}/._old_{table}"
        try:
            fs, jaside = _hadoop_fs(spark, aside)
            if not fs.exists(jaside):
                continue
            live = f"{root}/{_DELTA}/{table}"
            st = f"{staging}/delta_{table}"
            _, jlive = _hadoop_fs(spark, live)
            _, jst = _hadoop_fs(spark, st)
            if fs.exists(jlive):
                fs.delete(jaside, True)
            elif fs.exists(jst):
                if not fs.rename(jst, jlive):
                    raise RuntimeError(
                        f"dedup index {root!r}: delta rewrite settle "
                        f"could not rename {st} -> {live}"
                    )
                fs.delete(jaside, True)
            else:
                # ADVICE r15: the aside holds the SURVIVORS AND the
                # doomed rows — rolling it back makes documents a
                # crashed delete had retracted reappear in probe
                # results until the delete is rerun. Never let that be
                # silent: persist a root-level flag (BEFORE the rename,
                # so a crash between the two re-enters this branch and
                # re-creates it — idempotent overwrite) and warn here;
                # minhash_index_stats re-warns while the flag stands,
                # and the next completed delete clears it.
                _, jmark = _hadoop_fs(spark, f"{root}/{_RERUN_MARKER}")
                fs.create(jmark, True).close()
                if not fs.rename(jaside, jlive):
                    raise RuntimeError(
                        f"dedup index {root!r}: delta rewrite settle "
                        f"could not roll back {aside} -> {live}"
                    )
                import warnings

                warnings.warn(
                    f"dedup index {root!r}: delta rewrite rolled back — "
                    f"the restored {table!r} delta still holds rows a "
                    "crashed delete had retracted; rerun the delete to "
                    "re-complete the takedown "
                    f"({_RERUN_MARKER} set until one completes)",
                    stacklevel=2,
                )
        except Exception:
            if not best_effort:
                raise
            import warnings

            warnings.warn(
                f"dedup index {root!r}: could not settle pending delta "
                "rewrite (concurrent writer or read-only storage); "
                "reading live files only",
                stacklevel=2,
            )


def minhash_index_write(
    docs: DataFrame,
    path: str,
    *,
    n_hashes: int = 16,
    bands: int = 4,
    pb_buckets: int = 64,
    db_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the MinHash dedup index for a document frame and
    record its build parameters under <path>/_params (underscore dir —
    invisible to data scans, same convention as the ANN _fits): band
    keys are positional functions of (n_hashes, bands) and the
    partition layout of (pb_buckets, db_buckets), so a probe built
    with different parameters would silently find NOTHING; append and
    probe read the stored parameters instead of trusting the caller.
    _params doubles as the build's COMMIT marker (deleted first,
    rewritten last), so a crashed rebuild raises on the next use
    instead of serving a half-written index. doc_ids are assumed
    unique across the index's lifetime (the ingest key discipline
    every upsert in this engine already follows).

    A rebuild also clears any leftover _append_staging/_delete_staging
    FIRST (ADVICE r12): a staging committed against the OLD build's
    parameters (possibly different n_hashes/bands/pb/db) must never be
    promoted into the new index — the next append's resume would mix
    signature lengths and partition layouts, silently breaking probes
    and the lossless-pruning invariant. The old staging's batch was
    part of the old index generation; the rebuild's input corpus is
    the new truth."""
    from idhub_spark.operators.merge_into import _hadoop_fs

    root = path.rstrip("/")
    spark = docs.sparkSession
    fs, jparams = _hadoop_fs(spark, f"{root}/_params")
    # the delta buffer belongs to the OLD generation too: its rows
    # carry the old parameters' signatures, and docs/bands overwrite
    # writes would never touch the sibling delta dir — clear it first;
    # the ingest log likewise (its batch ids name batches of the old
    # corpus — a post-rebuild retry of one is a NEW ingest decision)
    for stale in (_STAGING, "_delete_staging", _DELTA, _INGEST_LOG,
                  _RERUN_MARKER):
        _, jst = _hadoop_fs(spark, f"{root}/{stale}")
        if fs.exists(jst):
            fs.delete(jst, True)
    if fs.exists(jparams):
        fs.delete(jparams, True)
    # LAZY persist instead of an eager checkpoint job (r20): the two
    # overlapped table writes below are the state's first actions — the
    # first write job computes each partition into the cache, the
    # second blocks on the per-partition cache lock and reads it, so
    # the state is still computed exactly once and the standalone
    # materialization job disappears (guide §1.2 — one fewer pass).
    state = _doc_state(
        docs, n_hashes=n_hashes, id_col=id_col, text_col=text_col
    ).persist()
    docs_df, bands_df = _tables(
        state,
        n_hashes=n_hashes,
        bands=bands,
        pb_buckets=pb_buckets,
        db_buckets=db_buckets,
    )
    _par_jobs(
        lambda: _write_table(
            docs_df, f"{root}/docs", "db" if db_buckets else None
        ),
        lambda: _write_table(
            bands_df, f"{root}/bands", "pb" if pb_buckets else None
        ),
    )
    state.unpersist()
    # driver-side parquet bytes — no Spark job (r20; format and the
    # delete-first/rewrite-last commit protocol unchanged)
    _write_params_parquet(
        spark, root, (n_hashes, bands, pb_buckets, db_buckets)
    )
    # after the parquet (the commit marker) — a crash between the two
    # leaves a valid index whose loads take the parquet fallback
    _write_params_meta(
        spark, root, (n_hashes, bands, pb_buckets, db_buckets)
    )


def minhash_index_append(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "auto",
    direct_min_docs: int | None = None,
    batch_id: str | None = None,
) -> str:
    """Accept a batch INTO the index (after its probe survived review):
    I/O strictly ∝ batch (the batch's state is checkpointed once and
    both tables derive from it — history is never read), build
    parameters from the index itself, crash-safe via the staged
    _COMMITTED-marker promotion (see module docstring). Existing files
    are never rewritten — promotion RENAMES the batch's files into
    the live layout. Returns the route taken ('direct' | 'delta' |
    'empty') so callers/audits can assert placement.

    Routing (r14 — the fix for the r13 audit's append finding): a
    DIRECT append creates ~min(batch_band_rows, pb_buckets) +
    min(batch_docs, db_buckets) files — one per touched partition —
    a fixed file-op term that dominated small-batch cadence (~70 s
    per append at pb=4096 on the audit host REGARDLESS of batch
    bytes). mode='auto' (default) therefore routes batches smaller
    than direct_min_docs into the LSM DELTA BUFFER: one coalesced
    file per state table under <root>/delta, O(1) file ops, same
    staged-marker crash protocol (the staging carries a delta/
    subtree instead of partition trees). direct_min_docs defaults to
    32·(pb_buckets+db_buckets) — the point where the direct path
    writes ≥~32 rows per file it creates; flat (pb=db=0) layouts
    default to direct (their append is already O(write partitions)
    files). mode='delta'/'direct' force a route. Probes/deletes read
    bands ∪ delta, so placement never changes results;
    minhash_index_compact folds the delta back into the layout.

    batch_id (r15) — EXACTLY-ONCE ingest under at-least-once retries.
    Without it, a retry of an append that crashed AFTER its staging
    committed silently double-ingests: the retry's entry settle
    promotes the staged batch, then the retry appends the same docs
    again — violating the doc_ids-unique-for-life discipline with no
    error. With a caller idempotency key, promotion records
    <root>/_ingest_log/<sha256(batch_id)>.<accept_ms> (accept time in
    the name — storage-independent age, _marker_parse) atomically
    within the
    existing marker protocol (log entry exists iff the batch's rows
    are fully live — see _promote_staging), and an append whose key
    is already logged returns 'duplicate' without reading the batch.
    The log is one empty marker file per batch (pure file-existence
    metadata, invisible to scans); minhash_index_compact carries it
    to the compacted copy, a rebuild clears it with the rest of the
    old generation. Returns the route taken
    ('direct' | 'delta' | 'empty' | 'duplicate')."""
    if mode not in ("auto", "delta", "direct"):
        raise ValueError(f"minhash_index_append: unknown mode {mode!r}")
    root = path.rstrip("/")
    spark = docs.sparkSession
    n_hashes, bands, pb_buckets, db_buckets = _load_params(spark, root)
    _settle_delta_rewrite(spark, root)
    _resume_or_discard_staging(spark, root)

    from idhub_spark.operators.merge_into import _hadoop_fs

    if batch_id is not None and _ingest_log_has(
        spark, root, _batch_key(batch_id)
    ):
        return "duplicate"

    staging = f"{root}/{_STAGING}"
    # lazy persist + count = ONE materialization job (r20; was an eager
    # checkpoint job AND a count job). The count doubles as the routing
    # input and the empty-batch guard (an all-null/empty batch returns
    # 'empty' without staging anything).
    state = _doc_state(
        docs, n_hashes=n_hashes, id_col=id_col, text_col=text_col
    ).persist()
    n_docs = state.count()
    if n_docs == 0:
        state.unpersist()
        return "empty"
    if mode == "auto":
        if direct_min_docs is None:
            direct_min_docs = 32 * (pb_buckets + db_buckets)
        route = "delta" if n_docs < direct_min_docs else "direct"
    else:
        route = mode
    docs_df, bands_df = _tables(
        state,
        n_hashes=n_hashes,
        bands=bands,
        pb_buckets=pb_buckets,
        db_buckets=db_buckets,
    )
    if route == "delta":
        # partition ids stay as plain data columns; one file per table
        # (state is cached by the count above, so coalesce(1) is a
        # single JVM task over materialized blocks — not the
        # Python-sequential trap literal_frame exists for)
        _par_jobs(
            lambda: docs_df.coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{staging}/{_DELTA}/docs"),
            lambda: bands_df.coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{staging}/{_DELTA}/bands"),
        )
    else:
        _par_jobs(
            lambda: _write_table(
                docs_df, f"{staging}/docs", "db" if db_buckets else None
            ),
            lambda: _write_table(
                bands_df, f"{staging}/bands", "pb" if pb_buckets else None
            ),
        )
    state.unpersist()
    fs, jmark = _hadoop_fs(spark, f"{staging}/{_COMMITTED}")
    if batch_id is not None:
        # part of the staging BEFORE the commit marker: a discarded
        # (uncommitted) staging must never leave a log entry
        _, jb = _hadoop_fs(
            spark, f"{staging}/_BATCH_{_batch_key(batch_id)}"
        )
        fs.create(jb, True).close()
    fs.create(jmark, True).close()
    _promote_staging(spark, root)
    return route


def minhash_index_fold_delta(
    spark,
    path: str,
    *,
    ingest_log_horizon_s: float | None = INGEST_LOG_HORIZON_S,
) -> dict:
    """MINOR compaction — the LSM flush: re-lay ONLY the delta
    buffer's rows into the partitioned Hive layout (one file per
    touched partition, the direct-append shape) and drop the buffer.
    I/O ∝ delta bytes — at production scale this is the cadence
    operation that bounds the buffer's probe tax WITHOUT the full
    compactor's rewrite of the entire state (minhash_index_compact
    remains the MAJOR compaction: it glues a year of append debris
    AND folds the delta, but reads and rewrites everything).

    Protocol: the buffered rows are staged in the direct layout, the
    _FOLD_DELTA marker is written, then _COMMITTED last; promotion
    renames the staged files in and — because of the marker — deletes
    the delta dir before clearing the staging. Every crash point
    resumes through the ordinary settle (the staged files and the
    delta never hold a row visible TWICE except in the narrow
    half-promoted window, which only a failed best-effort settle on a
    concurrent read-only replica could observe — the single-writer
    assumption covers writers). An empty or absent buffer is a no-op.

    Cost shape (measured, scale_audit_r14.md §4): the fold pays the
    direct path's rename-per-file promotion ONCE for the whole buffer
    — capped at ~min(buffer_band_rows, pb) + min(buffer_docs, db)
    renames per fold instead of per append (4 buffered 1k-doc appends
    + one fold ≈ 94 s vs ~216 s direct, and the cap means 40 appends
    still fold in the same ~90-120 s). Against the MAJOR compactor
    the trade is byte-volume: at harness state sizes the single-job
    full rewrite is cheaper (35 s at 2M — the state is only ~100 MB),
    but compact rewrites the ENTIRE state while fold writes only the
    delta, so fold wins exactly when state_bytes >> delta_bytes — the
    production regime a 100 TB corpus index lives in.

    Returns {"folded_rows", "files_written"}."""
    from idhub_spark.operators.merge_into import _hadoop_fs

    root = path.rstrip("/")
    _, _, pb_buckets, db_buckets = _load_params(spark, root)
    _settle_delta_rewrite(spark, root)
    _resume_or_discard_staging(spark, root)
    # the fold IS the maintenance cadence, so it also bounds the
    # ingest log (retention rationale at INGEST_LOG_HORIZON_S) — runs
    # even when the buffer turns out empty below
    _prune_ingest_log(spark, root, ingest_log_horizon_s)
    fs, jdelta = _hadoop_fs(spark, f"{root}/{_DELTA}")
    if not fs.exists(jdelta):
        return {"folded_rows": 0, "files_written": 0}
    # gate per SUBTABLE, not just the parent dir (ADVICE r14): a
    # crashed minhash_index_delete can leave (a) an empty delta/ dir
    # (both subtables dropped, parent drop not reached) or (b) bands
    # gone with docs still present — the all-buffered-docs-doomed
    # path drops bands via surv==0 first. (a) is cleaned up here; (b)
    # must NO-OP, not fold: bands absent + docs present proves every
    # buffered doc is doomed (each doc has >=1 band row, and only the
    # surv==0 branch drops a dir), so folding would push retracted
    # doc rows into the live layout — the crashed delete's rerun is
    # the resume path for that state, exactly as for the live tables.
    have_docs = fs.exists(_hadoop_fs(spark, f"{root}/{_DELTA}/docs")[1])
    have_bands = fs.exists(_hadoop_fs(spark, f"{root}/{_DELTA}/bands")[1])
    if not have_docs and not have_bands:
        fs.delete(jdelta, True)
        return {"folded_rows": 0, "files_written": 0}
    if have_docs != have_bands:
        import warnings

        warnings.warn(
            f"dedup index {root!r}: delta buffer holds only "
            f"{'docs' if have_docs else 'bands'} — crashed-delete "
            "debris; rerun the delete to finish the retraction (fold "
            "is a no-op until then)",
            stacklevel=2,
        )
        return {"folded_rows": 0, "files_written": 0}
    staging = f"{root}/{_STAGING}"
    # lazy persist + count = one materialization job (r20); the cached
    # image also pins the pre-fold file snapshot the staged write reads
    docs_df = spark.read.parquet(f"{root}/{_DELTA}/docs").persist()
    bands_df = spark.read.parquet(f"{root}/{_DELTA}/bands")
    n_rows = docs_df.count()
    _par_jobs(
        lambda: _write_table(
            docs_df, f"{staging}/docs", "db" if db_buckets else None
        ),
        lambda: _write_table(
            bands_df, f"{staging}/bands", "pb" if pb_buckets else None
        ),
    )
    docs_df.unpersist()

    def _count_staged(jp):
        n = 0
        for st in fs.listStatus(jp):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            n += 1 if st.isFile() else _count_staged(st.getPath())
        return n

    files_written = sum(
        _count_staged(_hadoop_fs(spark, f"{staging}/{t}")[1])
        for t in ("docs", "bands")
    )
    _, jfold = _hadoop_fs(spark, f"{staging}/{_FOLD}")
    fs.create(jfold, True).close()
    _, jmark = _hadoop_fs(spark, f"{staging}/{_COMMITTED}")
    fs.create(jmark, True).close()
    _promote_staging(spark, root)
    return {"folded_rows": int(n_rows), "files_written": int(files_written)}


def minhash_index_probe(
    spark,
    path: str,
    batch: DataFrame,
    *,
    threshold_est: float = 0.5,
    include_batch_pairs: bool = True,
    max_bucket_rows: int | None = None,
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

    Cost shape: the batch computes its own shingle state ONCE (the
    state is cached; every downstream job reuses it); history
    contributes only (a) the band partitions whose pb matches a batch
    band key — lossless pruning, since the candidate join requires
    bkey equality — and (b) the doc partitions whose db matches a
    matched candidate — lossless for the same reason. Both prune sets
    are bounded literal lists of PARTITION ids (≤ pb_buckets /
    ≤ db_buckets values), so file-level PartitionFilters do the work;
    a batch touching t of P band partitions reads t/P of history's
    band files at ANY history size. On a flat (unbucketed) index the
    probe degrades to streaming the two narrow tables — the r11
    behavior, still 100-1000x less I/O than re-shingling raw text.
    The returned frame is deterministic and byte-identical across
    layouts.

    Bulk-backfill caveat: on a db-bucketed index the candidate set is
    cached (executor memory/disk, ∝ matched candidates) to
    derive the doc-partition prune set without recomputing the join —
    right for the ingest-batch cadence this index serves; a backfill
    the size of history touches every bucket anyway, so run those
    against a flat (pb=db=0) index, which skips both the checkpoint
    and the pointless prune (docs/operations.md sizing note).

    max_bucket_rows — the STOP-BUCKET guard, minhash_index_stats'
    hot-bucket finding turned into an action (the stop-shingle idea
    at index level): band buckets holding MORE than this many rows
    are excluded from candidate generation on the side they're hot
    in. Boilerplate/templated corpora collapse onto few band keys —
    one bucket with 10^5 history rows makes EVERY colliding batch doc
    emit 10^5 candidate pairs and turns the estimate join into an
    all-pairs blowup. The recall trade is explicit and bounded: a
    TRUE near-dup pair is only lost if every one of its `bands`
    agreeing bands is a stop bucket, and exact copies of
    non-boilerplate docs keep all their buckets. Size it from
    minhash_index_stats' hot_bucket_rows (set the cap well above the
    corpus's organic duplicate-group size, below the boilerplate
    blob). Bucket sizes are counted per side over the PRUNED rows —
    one extra aggregate whose shuffle carries one row per surviving
    (band, bkey), never per doc.

    Like every other entry point, the probe first settles any pending
    append staging (ADVICE r12): between a crash mid-promotion and the
    next append, half the batch's files are live and half staged — a
    promoted band row whose doc row is still staged would silently
    drop its pair in the estimate join. The settle is two fs.exists
    calls when no staging exists."""
    root = path.rstrip("/")
    n_hashes, bands, pb_buckets, db_buckets = _load_params(spark, root)
    _settle_delta_rewrite(spark, root, best_effort=True)
    _resume_or_discard_staging(spark, root, best_effort=True)
    # LAZY persist (r20): the pb prune-set collect below is the state's
    # first action and materializes it into the cache in the SAME job —
    # the standalone eager-checkpoint job is gone (on a flat index the
    # first consumer of the returned frame materializes it instead).
    # Every downstream consumer still computes the batch's shingle
    # state exactly once, from the cache.
    b_state = _doc_state(
        batch, n_hashes=n_hashes, id_col=id_col, text_col=text_col
    ).persist()
    b_bands = _bands_from_state(b_state, n_hashes=n_hashes, bands=bands)

    def _drop_hot(bands_df):
        if max_bucket_rows is None:
            return bands_df
        ok = (
            bands_df.groupBy("band", "bkey")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_rows)
            .select("band", "bkey")
        )
        return bands_df.join(ok, ["band", "bkey"], "semi")

    pbs = None
    if pb_buckets:
        pbs = [
            r.pb
            for r in b_bands.select(
                F.pmod(F.col("bkey"), F.lit(pb_buckets)).alias("pb")
            )
            .distinct()
            .collect()
        ]
    # live Hive layout ∪ delta buffer, same bounded prune on both
    idx_bands = _read_state_table(
        spark, root, "bands", prune_col="pb" if pb_buckets else None,
        prune_vals=pbs,
    )
    idx_bands = _drop_hot(idx_bands.select("band", "bkey", "doc_id"))

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
    dbs = None
    if db_buckets:
        # the estimate join needs only matched candidates' doc rows;
        # their db partitions are a bounded literal set (≤ db_buckets
        # ids). LAZY persist + collect (r20): the prune-set collect is
        # the candidate join's first action and caches it in the same
        # job (was an eager checkpoint job + a collect job), so the
        # estimate join still never re-runs the candidate join.
        hist_cand = hist_cand.persist()
        dbs = [
            r.db
            for r in hist_cand.select(
                F.pmod(F.xxhash64(F.col("dup_id")), F.lit(db_buckets)).alias(
                    "db"
                )
            )
            .distinct()
            .collect()
        ]
    idx_docs = _read_state_table(
        spark, root, "docs", prune_col="db" if db_buckets else None,
        prune_vals=dbs,
    ).select("doc_id", "sig", "n_sh")

    out = scored(hist_cand, idx_docs, "history")
    if include_batch_pairs:
        safe_bands = _drop_hot(b_bands)
        a, b = safe_bands.alias("a"), safe_bands.alias("b")
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


def minhash_index_stats(spark, path: str) -> DataFrame:
    """Operational health of a persisted dedup index — the
    ivf_index_stats twin: one row per state table with
    (tbl, n_rows, n_files, n_partitions, delta_rows, delta_files,
    hot_bucket_rows).

    delta_rows/delta_files are the LSM buffer's share OF the totals —
    n_rows/n_files count the LOGICAL table (live ∪ delta), so the
    buffer is INCLUDED in them; live-only counts are n_rows -
    delta_rows / n_files - delta_files, never live + delta (that
    double-counts — ADVICE r15). The breakdown is the fold-cadence
    signal: every probe reads the WHOLE buffer (row filter, no
    partition pruning), so its cost term grows with delta_files; fold
    when they cross the operations-doc threshold (docs/operations.md,
    numbers in docs/scale_audit_r15.md). Derived from the same scan
    via the _d flag — no extra job.

    hot_bucket_rows (bands row only) is the largest (band, bkey)
    bucket — THE candidate-join cost signal: a probe that hits a hot
    bucket pairs against every doc in it, so a bucket holding 10^5
    docs makes any colliding batch row emit 10^5 candidates (the
    stop-shingle phenomenon at index scale: templated/boilerplate
    documents collapse onto few band keys). The fix is upstream
    (boilerplate stripping, or raising bands/rows so templated docs
    stop colliding) — this report is what tells an operator it's
    needed, and its aggregate shuffles one row per (band, bkey), not
    per doc. n_partitions counts the Hive layout's directories (0 on
    a flat index); n_rows/n_files/hot_bucket_rows cover the LOGICAL
    table (live ∪ delta buffer — the delta is unpartitioned by
    design, so its rows never count as partitions) from the same
    single scan per table. Settles any pending append staging first,
    BEST-EFFORT (read-only entry point — ADVICE r13), so the counts
    never read the single writer's half-promoted crash debris."""
    from idhub_spark.operators.merge_into import _hadoop_fs

    root = path.rstrip("/")
    _settle_delta_rewrite(spark, root, best_effort=True)
    _resume_or_discard_staging(spark, root, best_effort=True)
    fs_m, jmark = _hadoop_fs(spark, f"{root}/{_RERUN_MARKER}")
    if fs_m.exists(jmark):
        import warnings

        warnings.warn(
            f"dedup index {root!r}: a crashed delete's delta rewrite "
            "was rolled back — retracted documents are live again "
            "until the delete is rerun (flag cleared when one "
            "completes)",
            stacklevel=2,
        )
    rows = []
    for tbl, part_col, bucket_cols in (
        ("docs", "db", None),
        ("bands", "pb", ["band", "bkey"]),
    ):
        df = spark.read.parquet(f"{root}/{tbl}")
        has_part = part_col in df.columns

        def sel(frame, is_delta):
            return frame.select(
                F.input_file_name().alias("_f"),
                *(
                    [F.col(part_col).alias("_p")]
                    if has_part
                    else [F.lit(0).alias("_p")]
                ),
                F.lit(is_delta).alias("_d"),
                *(bucket_cols or []),
            )

        agg = sel(df, False)
        delta = f"{root}/{_DELTA}/{tbl}"
        fs, jd = _hadoop_fs(spark, delta)
        if fs.exists(jd):
            agg = agg.unionByName(sel(spark.read.parquet(delta), True))
        base = agg.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("_f").alias("n_files"),
            (
                # countDistinct skips nulls: delta rows (whose _p is a
                # data column, not a directory) never count
                F.countDistinct(F.when(~F.col("_d"), F.col("_p")))
                if has_part
                else F.lit(0).cast("bigint")
            ).alias("n_partitions"),
            F.count(F.when(F.col("_d"), F.lit(1))).alias("delta_rows"),
            F.countDistinct(F.when(F.col("_d"), F.col("_f"))).alias(
                "delta_files"
            ),
        )
        if bucket_cols:
            hot = (
                agg.groupBy(*bucket_cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(F.coalesce(F.max("_n"), F.lit(0)).alias("hot_bucket_rows"))
            )
            base = base.crossJoin(hot)
        else:
            base = base.withColumn("hot_bucket_rows", F.lit(None).cast("bigint"))
        rows.append(base.select(F.lit(tbl).alias("tbl"), "*"))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("tbl")


def minhash_index_delete(
    spark,
    path: str,
    ids: DataFrame | list,
    *,
    id_col: str = "doc_id",
) -> dict:
    """Retract documents from the index (takedown/expiry/GDPR path):
    rewrite ONLY the partitions that can hold their state, leave every
    other file untouched.

    Pruning needs no index scan to FIND the work: a doc's db partition
    is pmod(xxhash64(doc_id), D) — computable from the ids alone — and
    its band partitions derive from its stored sig (a projection over
    the db-pruned doomed rows). Per-table rewrite is the
    partition_pruned_upsert discipline (operators/merge_into.py):
    stage the touched partitions' SURVIVING image to a sibling
    _delete_staging, dynamic-overwrite the live table from the staged
    copy, and explicitly drop any partition directory whose every row
    was deleted (dynamic overwrite can only replace partitions present
    in the written data). On a FLAT (pb/db=0) index there is nothing
    to prune and both tables rewrite wholesale — correct, I/O ∝ table;
    use the bucketed layout where deletes are routine.

    Order is load-bearing: BANDS rewrite first. Band partitions are
    derived from the doomed docs' stored sigs, so deleting the docs
    rows first would strand unreachable band rows if the run crashed
    between the two rewrites. Bands-first is idempotently resumable:
    a rerun re-derives everything from the still-present docs rows
    (the bands anti-join is a no-op where already applied). A stale
    _delete_staging from a crashed run is overwritten by the next run
    and invisible to scans (underscore prefix).

    The delta buffer is a third retraction surface (r14): a doomed doc
    accepted since the last compaction lives in <root>/delta, not the
    Hive layout, so BOTH delta tables are anti-joined through a staged
    copy whenever the buffer holds doomed rows (the buffer is tiny by
    construction — one file per small append — so its rewrite is one
    cheap job; an emptied buffer drops its directory). Same bands-
    first order across both layers.

    Returns {"rows_deleted", "docs_partitions_rewritten",
    "bands_partitions_rewritten", "delta_rows_deleted"} (0-partition
    values on flat layouts mean 'whole table'; rows_deleted counts
    live + delta)."""
    from idhub_spark.session import literal_frame

    root = path.rstrip("/")
    n_hashes, bands, pb_buckets, db_buckets = _load_params(spark, root)
    # settle any pending append staging first (ADVICE r12): a retract
    # that scans only the live files while a committed batch sits half
    # (or fully) staged would miss its rows — the doomed-doc scan must
    # see every accepted document. The delta-rewrite settle runs FIRST
    # (its docstring's ordering argument).
    _settle_delta_rewrite(spark, root)
    _resume_or_discard_staging(spark, root)
    if isinstance(ids, DataFrame):
        # materialize the retraction set ONCE (r19): it feeds the db
        # prune collect, the doomed semi-join, the delta semi count,
        # and all four anti-join rewrites — seven consumers that each
        # re-ran the caller's id lineage (scan + distinct exchange)
        # otherwise. Bounded by the takedown list by construction.
        # LAZY persist (r20): the db prune collect (or, flat, the
        # doomed-stats job) is its first action and caches it in the
        # same job — the standalone checkpoint job is gone.
        ids_df = (
            ids.select(F.col(id_col).alias("doc_id"))
            .distinct()
            .persist()
        )
    else:
        if not ids:
            raise ValueError("minhash_index_delete: empty id list")
        dtype = "bigint" if all(isinstance(i, int) for i in ids) else "string"
        ids_df = literal_frame(
            spark, [(i,) for i in ids], f"doc_id {dtype}"
        ).distinct()

    staging = f"{root}/_delete_staging"

    def _pruned(table, part_col, buckets, parts):
        df = spark.read.parquet(f"{root}/{table}")
        if buckets and parts is not None:
            df = df.filter(F.col(part_col).isin(parts))
        return df

    def _rewrite(table, part_col, buckets, parts, survivors):
        """Stage survivors, dynamic-overwrite live, drop emptied dirs."""
        from idhub_spark.operators.merge_into import _hadoop_fs

        st = f"{staging}/{table}"
        if buckets:
            (
                survivors.repartition(F.col(part_col))
                .write.mode("overwrite")
                .partitionBy(part_col)
                .parquet(st)
            )
            # present set from the staged DIRECTORY listing: an
            # Observation on a ZERO-row staged write (every row of
            # every touched partition deleted) never fires its metric
            # row and the retrieval throws; the listing is empty-safe
            fs_st, jst = _hadoop_fs(spark, st)
            present = {
                int(s.getPath().getName().split("=", 1)[1])
                for s in fs_st.listStatus(jst)
                if s.getPath().getName().startswith(f"{part_col}=")
            }
            if present:
                (
                    spark.read.parquet(st)
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy(part_col)
                    .parquet(f"{root}/{table}")
                )
            fs, _ = _hadoop_fs(spark, root)
            for p in set(parts) - present:
                _, jdir = _hadoop_fs(spark, f"{root}/{table}/{part_col}={p}")
                fs.delete(jdir, True)
        else:
            # flat layout: whole-table rewrite through the staged copy
            # (never overwrite a path the plan also reads)
            survivors.write.mode("overwrite").parquet(st)
            fs_st, jst = _hadoop_fs(spark, st)
            has_data = any(
                not s.getPath().getName().startswith(("_", "."))
                for s in fs_st.listStatus(jst)
            )
            if has_data:
                staged = spark.read.parquet(st)
            else:
                # every row deleted: the staged write landed zero
                # part-files and read.parquet(st) would throw 'unable
                # to infer schema' (ADVICE r12 — the bucketed branch's
                # directory-listing guard, mirrored). Rewrite the live
                # table as a schema-preserving EMPTY parquet instead:
                # range(0) keeps the frame JVM-literal (no Python
                # partition computes — literal_frame discipline) and
                # repartition(1) forces one real footer-bearing file
                # so later probes read an empty table, not an error.
                staged = spark.range(0).select(
                    *[
                        F.lit(None).cast(f.dataType).alias(f.name)
                        for f in survivors.schema.fields
                    ]
                ).repartition(1)
            staged.write.mode("overwrite").parquet(f"{root}/{table}")

    from idhub_spark.operators.merge_into import _hadoop_fs

    def _delta_df(table):
        """The delta buffer's image of one table (None when absent),
        db-pruned where computable — the delta is one tiny file per
        buffered append, so a row filter is all the pruning it needs."""
        p = f"{root}/{_DELTA}/{table}"
        fs, jp = _hadoop_fs(spark, p)
        if not fs.exists(jp):
            return None
        return spark.read.parquet(p)

    def _rewrite_delta(table):
        """Anti-join the doomed ids out of one delta table; a fully
        emptied table drops its directory outright — probes treat a
        missing delta as 'no buffered appends', so the empty case
        needs no schema-preserving placeholder (and a staged 0-row
        write is no emptiness signal anyway: Spark writes a schema-
        bearing empty part-file for this flat coalesce(1) shape —
        verified empirically on Spark 4.1).

        An ABSENT table is 'already emptied' (ADVICE r14): when every
        buffered doc is doomed the bands leg drops its dir (the
        no-survivors branch), so a crash before the docs leg makes the
        rerun re-enter here with bands gone — reading it would throw
        PATH_NOT_FOUND, not re-derive an empty survivor set
        (spark.read.parquet of an absent path raises).

        Emptiness is read off the STAGED write itself (r20): an
        Observation on the staged write returns the survivor count in
        the SAME job (measured to fire even at zero rows for this
        flat coalesce(1) shape — unlike the dynamic-partitioned writes
        in _rewrite, where zero rows prune the metrics node, hence the
        directory-listing guard there), so the old pre-count job is
        gone. The metric is read via the non-blocking getOrEmpty with
        a tiny read-back count as the fallback — a plan shape that
        pruned the metrics could never hang the delete. Every crash
        point still resolves: a crash after the staged write re-runs
        the takedown per the at-least-once contract; a crash between
        the live drop and the staging cleanup leaves only stale
        staging the next delete overwrites.

        Survivors promote by RENAME SWAP, never a second overwrite
        over the path the anti-join just read (ADVICE r14): stage the
        survivor file, rename the live dir aside, rename the staged
        dir in, drop the aside. A crash between any two steps leaves
        a state _settle_delta_rewrite resolves exactly — the old
        overwrite-write could die with dst cleared and only
        _temporary written, a directory that passes fs.exists but
        fails every read until manual repair."""
        live = f"{root}/{_DELTA}/{table}"
        st = f"{staging}/delta_{table}"
        fs, jlive = _hadoop_fs(spark, live)
        if not fs.exists(jlive):
            return
        from pyspark.sql import Observation

        surv = spark.read.parquet(live).join(ids_df, "doc_id", "anti")
        obs = Observation()
        (
            surv.observe(obs, F.count(F.lit(1)).alias("n"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(st)
        )
        # getOrEmpty is the NON-BLOCKING presence probe (obs.get would
        # wait forever if a plan shape ever pruned the metrics node);
        # once present, obs.get returns immediately
        n_surv = (
            int(obs.get["n"])
            if not obs._jo.getOrEmpty().isEmpty()
            else spark.read.parquet(st).count()
        )
        if n_surv == 0:
            fs.delete(jlive, True)
            _, jst_dir = _hadoop_fs(spark, st)
            fs.delete(jst_dir, True)
            return
        aside = f"{root}/{_DELTA}/._old_{table}"
        _, jaside = _hadoop_fs(spark, aside)
        _, jst = _hadoop_fs(spark, st)
        if not fs.rename(jlive, jaside):
            raise RuntimeError(
                f"dedup index {root!r}: delta rewrite could not rename "
                f"{live} aside; staging left in place for resume"
            )
        if not fs.rename(jst, jlive):
            raise RuntimeError(
                f"dedup index {root!r}: delta rewrite could not promote "
                f"{st} -> {live}; settle resumes from the aside"
            )
        fs.delete(jaside, True)

    dbs = None
    if db_buckets:
        dbs = [
            r.db
            for r in ids_df.select(
                F.pmod(F.xxhash64(F.col("doc_id")), F.lit(db_buckets)).alias(
                    "db"
                )
            )
            .distinct()
            .collect()
        ]
    docs_tbl = _pruned("docs", "db", db_buckets, dbs)
    # live and delta doomed counted separately: the live count drives
    # the pb prune set (delta docs' bands live in the delta, never in
    # the Hive layout — appends write both tables to one place), the
    # sum is the logical retraction count.
    doomed = docs_tbl.join(ids_df, "doc_id", "semi").persist()
    res: dict = {}

    def _doomed_stats():
        # ONE job (r20): materializes `doomed` into the cache AND
        # returns the live doomed count plus the pb prune set — was an
        # eager checkpoint + a count + a distinct collect (three jobs).
        # Each doomed doc row emits exactly `bands` band rows (explode
        # of a bands-element array literal over a non-null sig), so the
        # doomed row count is nb / bands EXACTLY — duplicate doc_ids
        # included, same value the old doomed.count() returned.
        if pb_buckets:
            row = (
                _bands_from_state(
                    doomed.select("doc_id", "sig", "n_sh"),
                    n_hashes=n_hashes,
                    bands=bands,
                )
                .agg(
                    F.count(F.lit(1)).alias("nb"),
                    F.collect_set(
                        F.pmod(F.col("bkey"), F.lit(pb_buckets))
                    ).alias("pbs"),
                )
                .first()
            )
            res["rows_live"] = int(row.nb) // bands
            res["pbs"] = sorted(int(p) for p in row.pbs)
        else:
            res["rows_live"] = doomed.count()
            res["pbs"] = None

    def _delta_doomed():
        delta_docs = _delta_df("docs")
        if delta_docs is None:
            res["rows_delta"] = 0
            return
        dd = delta_docs
        if db_buckets and dbs is not None:
            dd = dd.filter(F.col("db").isin(dbs))
        res["rows_delta"] = int(dd.join(ids_df, "doc_id", "semi").count())

    # the two doomed scans touch disjoint surfaces (pruned live docs vs
    # the tiny delta) — overlap them on driver threads (guide §2.6)
    _par_jobs(_doomed_stats, _delta_doomed)
    rows_live = res["rows_live"]
    rows_delta = res["rows_delta"]
    pbs = res["pbs"]
    # bands-first across BOTH layers (crash between the table rewrites
    # resumes by re-deriving from the still-present docs rows), and
    # each layer skipped when it provably holds no doomed rows. WITHIN
    # a layer the live-partition rewrite and the delta rewrite are
    # independent surfaces (disjoint paths, each with its own resume
    # protocol), so they overlap on driver threads (r19 _par_jobs) —
    # the bands-before-docs ordering is preserved by the barrier
    # between the two layer passes.
    def _layer(table, part_col, buckets, parts, pruned_tbl):
        jobs = []
        if rows_live:
            jobs.append(
                lambda: _rewrite(
                    table,
                    part_col,
                    buckets,
                    parts,
                    pruned_tbl.join(ids_df, "doc_id", "anti"),
                )
            )
        if rows_delta:
            jobs.append(lambda: _rewrite_delta(table))
        if jobs:
            _par_jobs(*jobs)

    _layer("bands", "pb", pb_buckets, pbs,
           _pruned("bands", "pb", pb_buckets, pbs) if rows_live else None)
    _layer("docs", "db", db_buckets, dbs, docs_tbl)
    # drop the buffer dir whenever BOTH subtables are gone — checked
    # unconditionally (ADVICE r14), not only on the rows_delta path: a
    # prior run that emptied both tables but crashed before this drop
    # leaves an empty delta/ dir that the rerun (rows_delta now 0)
    # must still clean up, or the fold/compact entry reads of a
    # 'present' buffer hit absent subtables. Both tables empty
    # together by construction (appends write them as one batch,
    # deletes remove the same ids).
    fs, jdelta = _hadoop_fs(spark, f"{root}/{_DELTA}")
    if fs.exists(jdelta):
        fs_d, jdd = _hadoop_fs(spark, f"{root}/{_DELTA}/docs")
        fs_b, jdb = _hadoop_fs(spark, f"{root}/{_DELTA}/bands")
        if not fs_d.exists(jdd) and not fs_b.exists(jdb):
            fs.delete(jdelta, True)
    doomed.unpersist()

    fs, jstag = _hadoop_fs(spark, staging)
    fs.delete(jstag, True)
    # a COMPLETED delete is the rerun the rollback flag demands (the
    # at-least-once retry discipline: the caller retries the same
    # takedown until it returns) — clear it last, after every rewrite
    # and cleanup above, so a crash anywhere in this run leaves the
    # flag standing. Clear only when this delete plausibly covered the
    # rollback's restored rows (ADVICE r16 — an UNRELATED delete used
    # to clear the flag while the restored retracted rows stayed live):
    # the rollback restored a DELTA table, so a delete that never
    # touched the buffer (rows_delta == 0, buffer still present) is
    # provably unrelated and keeps the flag (stats keeps warning).
    # rows_delta > 0 means the buffer was rewritten through this
    # delete's anti-join; an ABSENT buffer means a fold/compact moved
    # the restored rows into the live layout since the rollback, where
    # only the documented same-takedown retry contract
    # (docs/operations.md §dedup-index) can vouch for coverage — the
    # pre-r17 any-delete-clears semantics, now confined to that case.
    _, jmark = _hadoop_fs(spark, f"{root}/{_RERUN_MARKER}")
    if fs.exists(jmark):
        _, jdelta_m = _hadoop_fs(spark, f"{root}/{_DELTA}")
        if rows_delta > 0 or not fs.exists(jdelta_m):
            fs.delete(jmark, False)
    return {
        "rows_deleted": int(rows_live + rows_delta),
        "docs_partitions_rewritten": (
            len(dbs) if (dbs is not None and rows_live) else 0
        ),
        "bands_partitions_rewritten": (
            len(pbs) if (pbs is not None and rows_live) else 0
        ),
        "delta_rows_deleted": int(rows_delta),
    }


def minhash_index_compact(
    spark,
    src_path: str,
    dst_path: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    ingest_log_horizon_s: float | None = INGEST_LOG_HORIZON_S,
) -> tuple[int, int]:
    """Compact a dedup index's append debris AND carry its _params to
    the compacted copy — ivf_index_compact's twin. Every append lands
    one file per touched partition, so a year of batch cadence is
    10^4-10^5 small files per table.

    Engine choice per table (r13): a BUCKETED table goes through
    storage.compact_partitioned — one scan + one hash-shuffle on its
    partition column + one partitioned write, ~1 file per partition —
    because the generic per-leaf compactor's job-per-directory loop is
    the dominant cost at this layout's 4096+1024 dirs (>5000
    sequential driver round-trips; measured, r13 audit) and the state
    tables are 100-1000x smaller than the corpus, so one bounded
    shuffle is the right trade. A FLAT table (pb/db=0) keeps the
    zero-shuffle compact_small_files path. Settles any pending append
    staging on the SOURCE first (ADVICE r12 class): a committed but
    unpromoted batch lives under an '_'-dir both engines skip, so it
    would silently be LEFT OUT of the compacted copy.

    Compaction is also the LSM MERGE (r14): a delta buffer on the
    source FOLDS into the compacted layout — its rows carry the
    partition ids as data columns, so the single-job engine routes
    them through the same hash-shuffle (extra_paths) and the
    compacted copy has NO delta dir; probes against it read the Hive
    layout alone. Delta files count as source files. Returns summed
    (n_source_files, n_output_files)."""
    from idhub_spark.operators.merge_into import _hadoop_fs
    from idhub_spark.storage import compact_partitioned, compact_small_files

    src = src_path.rstrip("/")
    dst = dst_path.rstrip("/")
    _settle_delta_rewrite(spark, src)
    _resume_or_discard_staging(spark, src)
    n_hashes, bands, pb_buckets, db_buckets = _load_params(spark, src)
    fs, _ = _hadoop_fs(spark, src)
    # one-sided delta = crashed-delete debris (bands dropped with docs
    # still present, reachable only on the all-buffered-docs-doomed
    # path — fold docstring's proof): the remaining delta rows are all
    # RETRACTED, so folding them into the compacted copy would undo
    # the takedown (ADVICE r14's 'silently folded back' gap). Exclude
    # the debris — the compacted copy completes the retraction — and
    # say so.
    _dd = fs.exists(_hadoop_fs(spark, f"{src}/{_DELTA}/docs")[1])
    _db = fs.exists(_hadoop_fs(spark, f"{src}/{_DELTA}/bands")[1])
    skip_delta = _dd != _db
    if skip_delta:
        import warnings

        warnings.warn(
            f"dedup index {src!r}: delta buffer holds only "
            f"{'docs' if _dd else 'bands'} — crashed-delete debris of "
            "retracted rows; excluded from the compacted copy",
            stacklevel=2,
        )
    n_src = n_out = 0
    for table, part_col, buckets in (
        ("docs", "db", db_buckets),
        ("bands", "pb", pb_buckets),
    ):
        delta_tbl = f"{src}/{_DELTA}/{table}"
        has_delta = not skip_delta and fs.exists(
            _hadoop_fs(spark, delta_tbl)[1]
        )
        if buckets:
            s, o = compact_partitioned(
                spark,
                f"{src}/{table}",
                f"{dst}/{table}",
                part_col,
                target_bytes=target_bytes,
                extra_paths=[delta_tbl] if has_delta else None,
            )
        elif has_delta:
            # flat + delta (forced-delta appends on an unbucketed
            # layout): one union write — both inputs are plain parquet
            # dirs with identical columns, no partition routing needed
            import math

            def _data_files(p):
                return [
                    st
                    for st in fs.listStatus(_hadoop_fs(spark, p)[1])
                    if st.isFile()
                    and not st.getPath().getName().startswith(("_", "."))
                ]

            sizes = _data_files(f"{src}/{table}") + _data_files(delta_tbl)
            n_files = max(
                1, math.ceil(sum(st.getLen() for st in sizes) / target_bytes)
            )
            (
                spark.read.parquet(f"{src}/{table}")
                .unionByName(spark.read.parquet(delta_tbl))
                .repartition(n_files)
                .write.mode("overwrite")
                .parquet(f"{dst}/{table}")
            )
            s, o = len(sizes), len(_data_files(f"{dst}/{table}"))
        else:
            s, o = compact_small_files(
                spark, f"{src}/{table}", f"{dst}/{table}", target_bytes=target_bytes
            )
        n_src += s
        n_out += o
    # params for the copy: driver-side parquet bytes, no Spark job
    # (r20 — the values were already loaded above; a pre-r12 source's
    # 2-column row canonicalizes to the 4-column form with zeros, the
    # same values _load_params returned for it). Parquet first, marker
    # second — the write-side ordering contract.
    _write_params_parquet(
        spark, dst, (n_hashes, bands, pb_buckets, db_buckets)
    )
    _write_params_meta(
        spark, dst, (n_hashes, bands, pb_buckets, db_buckets)
    )
    # carry the ingest log (r15): the compacted copy holds the same
    # accepted batches, so their idempotency keys must keep rejecting
    # retries — each entry is an empty marker file, recreated at dst.
    # Only entries still inside the retry horizon carry (r16, the
    # VERDICT r15 size bound): the per-entry driver loop is thereby
    # O(batch_rate x horizon), not O(total batches ever), and the dst
    # log is born pruned. Carried entries keep the SOURCE's accept time
    # in the dst FILENAME (r17 — storage-independent: the old
    # fs.setTimes carry was a silent no-op on object stores, so every
    # compact there reset the horizon clock and carried entries never
    # aged out); legacy bare-key entries are canonicalized to the named
    # form with their source mtime as the accept time.
    jlog_src = _hadoop_fs(spark, f"{src}/{_INGEST_LOG}")[1]
    if fs.exists(jlog_src):
        import time

        cutoff = (
            int(time.time() * 1000) - int(ingest_log_horizon_s * 1000)
            if ingest_log_horizon_s is not None
            else None
        )
        for st in fs.listStatus(jlog_src):
            key, accept_ms = _marker_parse(
                st.getPath().getName(), st.getModificationTime()
            )
            if cutoff is not None and accept_ms < cutoff:
                continue
            _, jd = _hadoop_fs(
                spark,
                f"{dst}/{_INGEST_LOG}/{_marker_name(key, accept_ms)}",
            )
            fs.create(jd, True).close()
    # carry the delete-rerun flag (ADVICE r15): the compacted copy
    # holds the same rows, restored-doomed included — the pending
    # takedown transfers with them
    jmark_src = _hadoop_fs(spark, f"{src}/{_RERUN_MARKER}")[1]
    if fs.exists(jmark_src):
        _, jmark_dst = _hadoop_fs(spark, f"{dst}/{_RERUN_MARKER}")
        fs.create(jmark_dst, True).close()
    return n_src, n_out


def _ingest_log_report(spark, root: str, horizon_s: float | None) -> dict:
    """Read-only profile of an index's ingest log (shared by both
    fsck surfaces): entry count, how many are legacy bare-key form
    (pre-r17, mtime-dated), the oldest/newest accept age, and how many
    are past the retry horizon (prunable at the next maintenance
    cadence). One listStatus; no Spark job; never mutates."""
    import time

    from idhub_spark.operators.merge_into import _hadoop_fs

    fs, jlog = _hadoop_fs(spark, f"{root.rstrip('/')}/{_INGEST_LOG}")
    if not fs.exists(jlog):
        return {"n_entries": 0, "n_legacy": 0, "oldest_age_s": None,
                "newest_age_s": None, "n_past_horizon": 0}
    now_ms = int(time.time() * 1000)
    ages, n_legacy = [], 0
    for st in fs.listStatus(jlog):
        name = st.getPath().getName()
        key, accept_ms = _marker_parse(name, st.getModificationTime())
        if key == name:
            n_legacy += 1
        ages.append((now_ms - accept_ms) / 1000.0)
    past = (
        sum(1 for a in ages if a > horizon_s) if horizon_s is not None else 0
    )
    return {
        "n_entries": len(ages),
        "n_legacy": n_legacy,
        "oldest_age_s": round(max(ages), 3) if ages else None,
        "newest_age_s": round(min(ages), 3) if ages else None,
        "n_past_horizon": past,
    }


def _fsck_guard(findings: list, label: str):
    """Context manager shared by both fsck surfaces: a concurrent
    writer settling/promoting debris between an fsck's exists and its
    follow-up listing/read must degrade to a FINDING ('rerun fsck'),
    never crash the check — fsck is advisory and documented safe to
    run while the single writer runs, so transient races are expected
    states, not errors."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        try:
            yield
        except Exception:
            findings.append(
                f"could not inspect {label} (changed under the check — "
                "concurrent writer? — or unreadable): rerun fsck"
            )

    return _cm()


def minhash_index_fsck(
    spark,
    path: str,
    *,
    ingest_log_horizon_s: float | None = INGEST_LOG_HORIZON_S,
) -> dict:
    """READ-ONLY health check of a persisted dedup index — the
    diagnosis half of every settle/maintenance surface, with zero
    mutations (safe on a read-only replica, safe WHILE the single
    writer runs, safe in cron alerting). Where the settle functions
    resolve crash debris, fsck only CLASSIFIES it: each pending state
    is reported with the action the next writer-entry settle would
    take, so an operator can decide to trigger one (any write entry
    point, or stats for best-effort) with full knowledge.

    Returns {"healthy", "findings": [str...], "pending_append_staging",
    "pending_delta_rewrite": {table: state}, "delete_rerun_needed",
    "stale_delete_staging", "delta": {present, files}, "ingest_log",
    "duplicate_doc_ids", "params"}. healthy == no findings;
    informational rows (prunable ingest entries, buffered delta files)
    never flag by themselves. duplicate_doc_ids (r20) counts ids
    holding more than one docs row across live ∪ delta — one bounded
    aggregate, the only Spark job fsck runs.

    States mirror _resume_or_discard_staging and _settle_delta_rewrite
    exactly (see their docstrings for the protocol arguments):
    append staging committed -> 'committed (settle promotes)' else
    'uncommitted (settle discards)'; delta rewrite aside+live ->
    'aside drop pending', aside+staged -> 'promote pending',
    aside-only -> 'ROLLBACK pending (restores retracted rows — rerun
    the takedown after settling)'."""
    from idhub_spark.operators.merge_into import _hadoop_fs

    root = path.rstrip("/")
    # raises the clear no-_params error on a non-index path
    n_hashes, bands, pb_buckets, db_buckets = _load_params(spark, root)
    fs, _ = _hadoop_fs(spark, root)
    findings: list[str] = []

    staging = f"{root}/{_STAGING}"
    append_state = None
    with _fsck_guard(findings, "append staging"):
        if fs.exists(_hadoop_fs(spark, staging)[1]):
            committed = fs.exists(
                _hadoop_fs(spark, f"{staging}/{_COMMITTED}")[1]
            )
            folding = fs.exists(_hadoop_fs(spark, f"{staging}/{_FOLD}")[1])
            batch_keys = [
                st.getPath().getName()[len("_BATCH_"):]
                for st in fs.listStatus(_hadoop_fs(spark, staging)[1])
                if st.getPath().getName().startswith("_BATCH_")
            ]
            append_state = {
                "state": "committed" if committed else "uncommitted",
                "settle_action": "promote" if committed else "discard",
                "is_fold": folding,
                "batch_keys": batch_keys,
            }
            findings.append(
                f"append staging pending ({append_state['state']}; settle "
                f"would {append_state['settle_action']})"
            )

    rewrite = {}
    for table in ("docs", "bands"):
        with _fsck_guard(findings, f"delta rewrite state of {table!r}"):
            aside = f"{root}/{_DELTA}/._old_{table}"
            if not fs.exists(_hadoop_fs(spark, aside)[1]):
                continue
            live_ok = fs.exists(
                _hadoop_fs(spark, f"{root}/{_DELTA}/{table}")[1]
            )
            staged_ok = fs.exists(
                _hadoop_fs(spark, f"{root}/_delete_staging/delta_{table}")[1]
            )
            if live_ok:
                rewrite[table] = "aside drop pending"
            elif staged_ok:
                rewrite[table] = "promote pending"
            else:
                rewrite[table] = (
                    "ROLLBACK pending (restores retracted rows — rerun "
                    "the takedown after settling)"
                )
            findings.append(
                f"delta rewrite pending on {table!r}: {rewrite[table]}"
            )

    rerun = fs.exists(_hadoop_fs(spark, f"{root}/{_RERUN_MARKER}")[1])
    if rerun:
        findings.append(
            "delete rerun needed (a rollback restored retracted rows)"
        )
    stale_del = fs.exists(_hadoop_fs(spark, f"{root}/_delete_staging")[1])
    if stale_del:
        findings.append(
            "delete staging present (a retraction crashed mid-run or is "
            "in flight — rerun the takedown to completion)"
        )

    jdelta = _hadoop_fs(spark, f"{root}/{_DELTA}")[1]
    delta_info = {"present": False, "files": 0}
    with _fsck_guard(findings, "delta buffer"):
        if fs.exists(jdelta):
            n = 0
            for table in ("docs", "bands"):
                jt = _hadoop_fs(spark, f"{root}/{_DELTA}/{table}")[1]
                if fs.exists(jt):
                    n += sum(
                        1
                        for st in fs.listStatus(jt)
                        if not st.getPath().getName().startswith(("_", "."))
                    )
            delta_info = {"present": True, "files": n}

    log_report = None
    with _fsck_guard(findings, "ingest log"):
        log_report = _ingest_log_report(spark, root, ingest_log_horizon_s)

    # duplicate doc_ids (VERDICT/ADVICE r19): the r19 per-row _doc_state
    # emits one index row per input row where the old groupBy
    # coincidentally merged duplicate ids — the module-level ingest
    # discipline keeps ids unique, but nothing enforced it, so a dirty
    # ingest now silently yields duplicate docs rows. fsck is the cheap
    # guard: one aggregate over the LOGICAL docs table (live ∪ delta),
    # no hot-path cost. Non-zero flags the index unhealthy (the fix is
    # a retract-and-reingest of the offending ids, or a rebuild).
    dup_doc_ids = None
    with _fsck_guard(findings, "docs table (duplicate-id check)"):
        dup_doc_ids = int(
            _read_state_table(spark, root, "docs")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .count()
        )
        if dup_doc_ids:
            findings.append(
                f"{dup_doc_ids} doc_id(s) hold more than one docs row — "
                "the ingest discipline was violated (probes will report "
                "duplicate pairs for them); retract and reingest the "
                "offending ids, or rebuild"
            )

    return {
        "healthy": not findings,
        "findings": findings,
        "pending_append_staging": append_state,
        "pending_delta_rewrite": rewrite,
        "delete_rerun_needed": rerun,
        "stale_delete_staging": stale_del,
        "delta": delta_info,
        "ingest_log": log_report,
        "duplicate_doc_ids": dup_doc_ids,
        "params": {
            "n_hashes": n_hashes,
            "bands": bands,
            "pb_buckets": pb_buckets,
            "db_buckets": db_buckets,
        },
    }
