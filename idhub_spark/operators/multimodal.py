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


def sample_frames(df: DataFrame, payload_col: str = "payload", every: int = 4) -> DataFrame:
    """Frame-sampling plumbing: chunk the binary payload into fixed
    'frames' and keep every Nth — the explode/array plumbing a real
    video sampler would use, with the codec stubbed to byte-slicing."""
    frame = F.expr(f"transform(sequence(0, int(octet_length({payload_col}) / 16) - 1), "
                   f"i -> substring({payload_col}, i * 16 + 1, 16))")
    return (
        df.select("doc_id", F.posexplode(frame).alias("frame_no", "frame"))
        .filter(F.col("frame_no") % every == 0)
        .select("doc_id", "frame_no", F.octet_length("frame").alias("frame_bytes"))
    )
