"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata structs; decode
/ feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` functions — the one place Python belongs in the hot
path, because codecs are native libraries anyway.

The decode kernels themselves are STUBBED here (the image/audio libs
are not in this container): `decode_image_meta` tries PIL and falls
back to a deterministic fake derived from the byte payload. The
Spark-side plumbing — schema contract, Arrow batch iteration,
partition sizing — is real and tested.

Scale notes: mapInPandas streams Arrow batches, so memory is bounded
by `spark.sql.execution.arrow.maxRecordsPerBatch` regardless of
partition size; binary payloads should be size-bucketed
(repartitionByRange on octet_length) so one straggler partition of
4K videos doesn't pin an executor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes int, format string, width int, height int"
)


def _fake_dims(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a real codec: derive pseudo
    format/dims from the payload alone (stable across partitioning)."""
    n = len(payload)
    fmt = ["png", "jpeg", "webp"][n % 3]
    return fmt, 64 + (n % 640), 64 + ((n * 7) % 480)


def decode_image_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary payload -> metadata struct via Arrow-batched mapInPandas.

    Real decoder (PIL) is used when importable; otherwise the
    deterministic fake keeps the pipeline testable end-to-end.
    """
    try:  # pragma: no cover - container has no PIL
        import io

        from PIL import Image  # noqa: F401

        def _decode(payload: bytes):
            img = Image.open(io.BytesIO(payload))
            return (img.format or "?").lower(), img.width, img.height
    except ImportError:

        def _decode(payload: bytes):
            return _fake_dims(payload)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf[payload_col]],
                    "format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(batches, IMAGE_META_SCHEMA)


def byte_histogram_features(
    df: DataFrame,
    payload_col: str = "payload",
    *,
    n_bins: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature extraction over the binary column: an n_bins-bin
    normalized byte-value histogram per payload — a REAL (not stubbed)
    content feature computable without codec libraries, with the same
    signature a CNN-embedding extractor would have:
    (id, binary) -> (id, array<double> features).

    Arrow-batched mapInPandas with numpy bincount per payload: the
    Python work is O(bytes) vectorized, memory bounded by the Arrow
    batch. The output feature column feeds the embedding operators
    (ANN top-k, embedding_near_dup) unchanged — this is the bridge
    from raw media to the similarity stack.
    """
    import numpy as np

    width = 256 // n_bins

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf[payload_col]:
                arr = np.frombuffer(p, dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * n_bins)
                    continue
                # clip so the top partial bin (when 256 % n_bins != 0)
                # folds into the last bin instead of being sliced off
                bins = np.minimum(arr // width, n_bins - 1)
                hist = np.bincount(bins, minlength=n_bins)[:n_bins]
                feats.append((hist / arr.size).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(
        batches, f"{id_col} bigint, features array<double>"
    )


def resize_image(
    df: DataFrame,
    payload_col: str = "payload",
    *,
    width: int = 224,
    height: int = 224,
    kernel: str = "auto",
) -> DataFrame:
    """Resize: (id, binary) -> (id, binary, width, height).

    Two kernels behind one contract, chosen EXPLICITLY via `kernel`
    ('raster' | 'pil' | 'auto' = pil-when-importable-else-raster):
    - 'pil': decodes encoded formats (PNG/JPEG/...) and resamples real
      pixels (re-encoding, so bytes are codec-dependent).
    - 'raster' (deterministic everywhere, what the image_resize_check
      oracle pins): treats the payload as a row-major uint8 grayscale
      RASTER (side = isqrt(len)) and nearest-neighbor resamples it — a
      real resize for already-decoded rasters (the shape a prior decode
      stage emits), not a stub.
      out[r, c] = img[(r*side)//height, (c*side)//width]; an empty
      payload yields width*height zero bytes.

    Oracle-facing callers must pass kernel='raster': under 'auto' the
    output bytes depend on whether pillow happens to be installed.
    """
    if kernel not in ("auto", "raster", "pil"):
        raise ValueError(f"unknown resize kernel {kernel!r}")
    use_pil = kernel == "pil"
    if kernel == "auto":
        try:  # pragma: no cover - container has no PIL
            from PIL import Image  # noqa: F401

            use_pil = True
        except ImportError:
            use_pil = False

    if use_pil:  # pragma: no cover - container has no PIL
        import io

        from PIL import Image

        def _resize(payload: bytes) -> bytes:
            img = Image.open(io.BytesIO(payload))
            fmt = img.format or "PNG"  # resize() returns format=None
            buf = io.BytesIO()
            img.resize((width, height)).save(buf, format=fmt)
            return buf.getvalue()
    else:
        import math

        import numpy as np

        def _resize(payload: bytes) -> bytes:
            arr = np.frombuffer(payload, dtype=np.uint8)
            side = int(math.isqrt(arr.size))
            if side == 0:
                return bytes(width * height)
            img = arr[: side * side].reshape(side, side)
            rows = (np.arange(height) * side) // height
            cols = (np.arange(width) * side) // width
            return img[rows][:, cols].tobytes()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [_resize(p) for p in pdf[payload_col]],
                    "width": width,
                    "height": height,
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        batches, "doc_id bigint, payload binary, width int, height int"
    )


def sample_frames(df: DataFrame, payload_col: str = "payload", every: int = 4) -> DataFrame:
    """Frame-sampling plumbing: chunk the binary payload into fixed
    'frames' and keep every Nth — the explode/array plumbing a real
    video sampler would use, with the codec stubbed to byte-slicing.

    Payloads shorter than one frame yield ZERO rows (trailing partial
    frames are dropped at every length). The n_frames=0 case needs the
    explicit empty-array guard: Spark's sequence(0, -1) is the
    DESCENDING array [0, -1], which would emit two spurious frames.
    """
    n_frames = f"int(octet_length({payload_col}) / 16)"
    frame = F.expr(
        f"CASE WHEN {n_frames} > 0 THEN "
        f"transform(sequence(0, {n_frames} - 1), "
        f"i -> substring({payload_col}, i * 16 + 1, 16)) "
        f"ELSE array() END"
    )
    return (
        df.select("doc_id", F.posexplode(frame).alias("frame_no", "frame"))
        .filter(F.col("frame_no") % every == 0)
        .select("doc_id", "frame_no", F.octet_length("frame").alias("frame_bytes"))
    )
