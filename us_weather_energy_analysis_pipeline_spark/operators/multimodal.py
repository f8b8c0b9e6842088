"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched Pandas-UDF decode plumbing (SURVEY extension scope).

Design for 100 TB of images/audio/video:
- payloads are opaque ``binary`` columns next to typed metadata — the
  relational planner prunes/filters on metadata without touching bytes;
- decode / feature-extract runs in ``mapInPandas`` (Arrow batches, one
  Python worker per partition — never a row-at-a-time UDF);
- partition sizing: binary rows are fat, so the reader caps
  ``maxPartitionBytes`` rather than rows-per-partition.

The image/audio codecs are NOT in this container, so the real decoders
are STUBS behind import-tries (NotImplementedError); ``fake_decode_meta``
is a deterministic md5-derived stand-in that keeps the full Spark-side
plumbing (schema, batching, partitioning) real and oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_META_SCHEMA = "doc_id bigint, n_bytes bigint, width int, height int, n_frames int"


def to_blob_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → blob table: (doc_id, payload binary, mime, n_bytes).
    Stands in for an image/audio corpus: payload = utf8 bytes of text."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def fake_decode_meta(blobs: DataFrame) -> DataFrame:
    """Deterministic FAKE decode via mapInPandas: extracts (width, height,
    n_frames) from the md5 of the payload — the real pattern is identical,
    only the body of ``_decode_batch`` changes when codecs exist.

    Arrow moves the binary column to Python in columnar batches; the
    output schema is pinned so Catalyst plans downstream ops normally.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hexes = [hashlib.md5(p).hexdigest() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [64 + int(h[0:4], 16) % 960 for h in hexes],
                    "height": [64 + int(h[4:8], 16) % 960 for h in hexes],
                    "n_frames": [1 + int(h[8:10], 16) % 30 for h in hexes],
                }
            )

    return blobs.mapInPandas(_decode_batch, DECODE_META_SCHEMA)


def decode_image(blobs: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """REAL image decode — STUB: Pillow/OpenCV are not in this container.
    The mapInPandas shape is identical to fake_decode_meta; swap the body
    for PIL.Image.open(io.BytesIO(payload)) when codecs are available."""
    try:
        import PIL  # noqa: F401, PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow; use fake_decode_meta for plumbing tests"
        ) from e
    raise NotImplementedError("wire PIL decode into the mapInPandas body")


def resize_stub(blobs: DataFrame, width: int, height: int) -> DataFrame:  # pragma: no cover
    """Image resize — STUB (no codecs in container). Kept to pin the API:
    resize is a mapInPandas over (payload) → (payload), metadata updated."""
    raise NotImplementedError("resize requires an image codec; API stub only")


def frame_sample_stub(blobs: DataFrame, every_n: int) -> DataFrame:  # pragma: no cover
    """Video frame sampling — STUB (no codecs). One input row → n output
    rows; implement as mapInPandas yielding exploded frames."""
    raise NotImplementedError("frame sampling requires a video codec; API stub only")
