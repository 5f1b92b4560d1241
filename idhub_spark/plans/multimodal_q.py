"""Multimodal-column queries: binary payloads + Arrow-batched decode
stubs (north-star extension). The payload is fabricated from document
text (utf-8 encode) since the corpus ships no real media; the
plumbing — binary column, mapInPandas decode, typed metadata — is the
real thing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from idhub_spark.operators.multimodal import decode_image_meta, sample_frames
from idhub_spark.queries import query, tables


@query(
    "multimodal_decode",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CASE octet_length(encode(text)) % 3
             WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
           CAST(64 + octet_length(encode(text)) % 640 AS INTEGER) AS width,
           CAST(64 + (octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height
    FROM documents
    """,
    doc="Binary decode via Arrow mapInPandas (stub codec: "
    "deterministic dims from payload bytes). Oracle re-derives the "
    "fake from octet_length — proving the Python batch path computes "
    "exactly what the declarative twin would.",
)
def multimodal_decode(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    with_payload = t["documents"].select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return decode_image_meta(with_payload)


@query(
    "frame_sampling",
    """
    WITH frames AS (
      SELECT doc_id, i AS frame_no
      FROM (SELECT doc_id, CAST(floor(octet_length(encode(text)) / 16.0) AS INTEGER) AS n_frames
            FROM documents),
           UNNEST(range(0, n_frames)) AS t(i)
      WHERE i % 4 = 0)
    SELECT doc_id, COUNT(*) AS n_sampled, max(frame_no) AS last_frame
    FROM frames GROUP BY doc_id
    """,
    doc="Frame sampling: chunk binary payload into fixed frames, keep "
    "every 4th (posexplode plumbing; codec stubbed to byte slices).",
)
def frame_sampling(spark, sf_dir):
    t = tables(spark, sf_dir, "documents")
    with_payload = t["documents"].select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return (
        sample_frames(with_payload, every=4)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.max("frame_no").alias("last_frame"),
        )
    )


@query(
    "image_resize_check",
    """
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT CAST(-1 AS BIGINT), ''),
    b AS (
      SELECT doc_id, hex(encode(text)) AS h,
             CAST(floor(sqrt(octet_length(encode(text)))) AS BIGINT) AS side
      FROM docs)
    SELECT doc_id, CAST(64 AS INTEGER) AS n_bytes,
           CAST(CASE WHEN side = 0 THEN 0 ELSE
             list_sum(list_transform(range(0, 64), j ->
               16 * (strpos('0123456789ABCDEF',
                      h[2 * ((((j // 8) * side) // 8) * side + (((j % 8) * side) // 8)) + 1]) - 1)
                  + (strpos('0123456789ABCDEF',
                      h[2 * ((((j // 8) * side) // 8) * side + (((j % 8) * side) // 8)) + 2]) - 1)))
           END AS BIGINT) AS checksum
    FROM b
    """,
    doc="The numpy resize kernel (operators/multimodal.py:resize_image "
    "fallback), hash-checked: payloads resample as isqrt-side "
    "grayscale rasters to 8x8 via nearest neighbor, and the query "
    "emits each output's byte checksum (JVM-side hex fold). The "
    "oracle replays the identical index arithmetic "
    "(out[r,c] = raster[(r*side)//8, (c*side)//8]) over hex(payload) "
    "nibbles — byte-exact, so any kernel drift (rounding, "
    "orientation, truncation) fails the hash. A synthetic empty "
    "payload (doc_id -1) pins the zeros-output convention.",
)
def image_resize_check(spark, sf_dir):
    from idhub_spark.operators.multimodal import resize_image

    t = tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text").unionByName(
        spark.range(1).select(
            F.lit(-1).cast("long").alias("doc_id"), F.lit("").alias("text")
        )
    )
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    # kernel pinned: the oracle replays the raster arithmetic, so the
    # PIL re-encode path must never take over even if pillow appears
    resized = resize_image(with_payload, width=8, height=8, kernel="raster")
    checksum = F.expr(
        "aggregate(sequence(0, 63), cast(0 as long), (acc, i) -> "
        "acc + cast(conv(substr(hex(payload), i * 2 + 1, 2), 16, 10) as long))"
    )
    return resized.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        checksum.alias("checksum"),
    )


@query(
    "binary_features",
    """
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT CAST(-1 AS BIGINT), ''),
    b AS (
      SELECT doc_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n_bytes
      FROM docs),
    hgrams AS (
      SELECT doc_id, n_bytes,
             list_transform(range(0, 16), bin ->
               len(list_filter(range(0, n_bytes), i ->
                 h[2*i+1] = '0123456789ABCDEF'[bin+1]))) AS counts
      FROM b)
    SELECT doc_id,
           CAST(list_position(counts, list_max(counts)) - 1 AS INTEGER) AS dominant_bin,
           CASE WHEN n_bytes > 0
                THEN CAST(list_max(counts) AS DOUBLE) / CAST(n_bytes AS DOUBLE)
                ELSE 0.0 END AS dominant_share,
           CAST(len(list_filter(counts, c -> c > 0)) AS INTEGER) AS nonzero_bins
    FROM hgrams
    """,
    doc="Feature extraction over the binary column: 16-bin byte-value "
    "histogram per payload via Arrow mapInPandas + numpy bincount "
    "(operators/multimodal.py:byte_histogram_features), projected to "
    "scalar summaries (dominant bin with first-position tie-break, its "
    "share, occupancy). The oracle is BYTE-exact, not codepoint-based: "
    "bin = byte // 16 is precisely the high hex nibble, so it "
    "histograms the odd-position chars of hex(encode(text)) — "
    "equivalence holds for any UTF-8 text, not just ASCII fixtures. "
    "A synthetic empty-payload row (doc_id -1) pins the 0-byte "
    "convention on both engines: all-zero features -> dominant_bin 0, "
    "dominant_share 0.0 (NOT NULL), nonzero_bins 0.",
)
def binary_features(spark, sf_dir):
    from idhub_spark.operators.multimodal import byte_histogram_features

    t = tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text").unionByName(
        spark.range(1).select(
            F.lit(-1).cast("long").alias("doc_id"), F.lit("").alias("text")
        )
    )
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    feats = byte_histogram_features(with_payload)
    mx = F.array_max("features")
    return feats.select(
        "doc_id",
        (F.array_position(F.col("features"), mx) - 1).cast("int").alias("dominant_bin"),
        mx.alias("dominant_share"),
        F.size(F.filter("features", lambda v: v > 0)).alias("nonzero_bins"),
    )
