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
            # NULL payload → NULL meta fields, row preserved — the same
            # "undecodable yields nulls, never crashes the task" contract
            # decode_image has (and what the oracle's md5(NULL) emits);
            # nullable Int64 arrays keep the Arrow schema integral.
            hexes = [
                None if p is None else hashlib.md5(p).hexdigest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(
                        [None if p is None else len(p) for p in pdf["payload"]],
                        dtype="Int64",
                    ),
                    "width": pd.array(
                        [
                            None if h is None else 64 + int(h[0:4], 16) % 960
                            for h in hexes
                        ],
                        dtype="Int64",
                    ),
                    "height": pd.array(
                        [
                            None if h is None else 64 + int(h[4:8], 16) % 960
                            for h in hexes
                        ],
                        dtype="Int64",
                    ),
                    "n_frames": pd.array(
                        [
                            None if h is None else 1 + int(h[8:10], 16) % 30
                            for h in hexes
                        ],
                        dtype="Int64",
                    ),
                }
            )

    return blobs.mapInPandas(_decode_batch, DECODE_META_SCHEMA)


def decode_image(blobs: DataFrame) -> DataFrame:
    """REAL image decode (PIL behind an import-try): mapInPandas over the
    binary payload → (doc_id, n_bytes, width, height, mode); undecodable
    payloads yield nulls instead of failing the task. Raises
    NotImplementedError only when Pillow is absent (this container) — the
    plumbing is the same Arrow-batched shape as fake_decode_meta."""
    try:
        import PIL.Image  # noqa: F401, PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow; use fake_decode_meta for plumbing tests"
        ) from e

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            ws, hs, modes = [], [], []
            for p in pdf["payload"]:
                try:
                    with Image.open(io.BytesIO(p)) as im:
                        ws.append(im.width)
                        hs.append(im.height)
                        modes.append(im.mode)
                except Exception:
                    ws.append(None)
                    hs.append(None)
                    modes.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": ws,
                    "height": hs,
                    "mode": modes,
                }
            )

    return blobs.mapInPandas(
        _decode_batch, "doc_id bigint, n_bytes bigint, width int, height int, mode string"
    )


def resize_images(blobs: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize (PIL behind an import-try): payload → re-encoded
    PNG payload at (width, height); undecodable payloads pass through as
    null. One mapInPandas, binary in / binary out."""
    try:
        import PIL.Image  # noqa: F401, PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "resize requires Pillow; API contract: (payload)->(payload) mapInPandas"
        ) from e

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            outs = []
            for p in pdf["payload"]:
                try:
                    with Image.open(io.BytesIO(p)) as im:
                        buf = io.BytesIO()
                        im.resize((width, height)).save(buf, format="PNG")
                        outs.append(buf.getvalue())
                except Exception:
                    outs.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": outs,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return blobs.mapInPandas(
        _resize_batch, "doc_id bigint, payload binary, width int, height int"
    )


def frame_sample_bytes(
    blobs: DataFrame, frame_size: int = 16, every_n: int = 4
) -> DataFrame:
    """Deterministic frame sampling over opaque payloads: treat the binary
    as consecutive ``frame_size``-byte frames and keep every ``every_n``-th
    — the REAL 1→N row-explosion plumbing a video sampler needs
    (mapInPandas yielding more rows than it consumes, frame index carried
    alongside), with byte-slicing standing in for the codec. Swap the
    slicing for an actual decoder (PyAV/OpenCV) when present; the schema,
    batching, and partition behavior are unchanged."""

    def _sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n = len(p) // frame_size
                for i in range(0, n, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(p[i * frame_size : (i + 1) * frame_size]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return blobs.mapInPandas(
        _sample_batch, "doc_id bigint, frame_idx int, frame binary"
    )


def frame_sample_video(blobs: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling with a REAL codec (PyAV), behind an
    import-try like the PIL decode path: decode each payload in-memory,
    keep every ``every_n``-th frame as raw RGB bytes with its index and
    dimensions. Same exploded mapInPandas shape as
    :func:`frame_sample_bytes` (the codec-free twin that keeps the
    plumbing testable in containers without PyAV); undecodable payloads
    yield zero rows rather than failing the batch.

    Raises ``NotImplementedError`` at plan-build time when PyAV is
    absent — fail fast on the driver, not per-task on executors.
    """
    if every_n < 1:
        # Validate at plan-build time: inside the per-payload loop a
        # ZeroDivisionError would be swallowed by the decode-error
        # handler and every payload would silently yield zero frames.
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    try:
        import av  # noqa: F401
    except ImportError as e:  # pragma: no cover - container has no codec
        raise NotImplementedError(
            "frame_sample_video requires PyAV; see frame_sample_bytes for "
            "the codec-free sampling plumbing"
        ) from e

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import av as _av

        # Only decode/IO failures mean "skip this payload"; logic bugs
        # (e.g. a bad argument) must still surface as task errors.
        # IndexError is a decode failure here: a well-formed container
        # with NO video stream raises it from decode(video=0).
        codec_errors = tuple(
            e
            for e in (
                getattr(_av, "AVError", None),
                getattr(getattr(_av, "error", None), "FFmpegError", None),
                OSError,
                EOFError,
                IndexError,
            )
            if isinstance(e, type)
        )
        for pdf in batches:
            ids, idxs, ws, hs, frames = [], [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    with _av.open(io.BytesIO(bytes(p))) as container:
                        for i, frame in enumerate(container.decode(video=0)):
                            if i % every_n:
                                continue
                            rgb = frame.to_ndarray(format="rgb24")
                            ids.append(doc_id)
                            idxs.append(i)
                            hs.append(rgb.shape[0])
                            ws.append(rgb.shape[1])
                            frames.append(rgb.tobytes())
                except codec_errors:
                    continue  # undecodable payload → no frames
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "width": ws,
                    "height": hs,
                    "frame": frames,
                }
            )

    return blobs.mapInPandas(
        _decode_batch,
        "doc_id bigint, frame_idx int, width int, height int, frame binary",
    )
