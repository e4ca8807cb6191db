"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python worker sees columnar batches, never
rows. The decode step has three paths, all sharing the same Spark-side
schema/partitioning/batch plumbing:

- ``decode_media`` with Pillow installed — real image decode
  (width/height/n_frames from the actual codec);
- ``decode_media`` without Pillow (this container) — raises
  NotImplementedError (the honest stub);
- ``fake_decode_media`` — deterministic fake that derives pseudo
  dimensions from the payload bytes, so the distributed plumbing is
  testable end-to-end in any environment.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the decode step (what a real image decoder yields).
DECODED_META_SCHEMA = (
    "doc_id long, n_bytes long, sha256 string, width int, height int, n_frames int"
)


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Demo payload: UTF-8 bytes of the text column as the media blob,
    plus a typed metadata struct — the shape a real ingest would carry
    (format tag, byte length)."""
    blob = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        blob.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("format"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ).alias("media_meta"),
    )


def binary_meta(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Metadata extraction kept fully JVM-side: byte length + sha256.
    (No Python needed — the cheap path for filtering before decode.)"""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
    )


def pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_media(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Real decode entry point. When Pillow is installed, decodes each
    payload as an image (JPEG/PNG/GIF/...) per Arrow batch and emits
    (width, height, n_frames) from the real codec — ``n_frames`` covers
    multi-frame formats (animated GIF/TIFF) and is 1 otherwise. Without
    Pillow the per-batch worker raises NotImplementedError (the honest
    stub; this container has no media libraries — use
    ``fake_decode_media`` for plumbing tests there). Spark-side
    plumbing (schema, Arrow batching, partition preservation) is
    identical in both branches and to ``fake_decode_media``.

    The availability check runs INSIDE the worker (not at plan time on
    the driver): on a real cluster the driver and executors are
    separate Python environments, so a driver-side check would pick
    the wrong branch under environment skew — driver-with/executors-
    without would fail mid-job with a raw ImportError, and driver-
    without/executors-with would stub out decode that would actually
    work. Worker-side, each environment answers for itself.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib
        import io

        import pandas as pd

        try:
            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "media codecs unavailable in this worker environment "
                "(Pillow not importable); install Pillow on the executors "
                "or use fake_decode_media for plumbing tests"
            ) from exc

        for pdf in batches:
            payloads = pdf[payload_col]
            n_bytes, sha, widths, heights, frames = [], [], [], [], []
            for b in payloads:
                if b is None:
                    # NULL payload -> NULL metadata (keep the row for
                    # audits); bytes(None) would TypeError the whole job
                    for acc in (n_bytes, sha, widths, heights, frames):
                        acc.append(None)
                    continue
                raw = bytes(b)
                n_bytes.append(len(raw))
                sha.append(hashlib.sha256(raw).hexdigest())
                with Image.open(io.BytesIO(raw)) as img:
                    widths.append(img.width)
                    heights.append(img.height)
                    frames.append(int(getattr(img, "n_frames", 1)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pd.array(n_bytes, dtype="Int64"),
                    "sha256": sha,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "n_frames": pd.array(frames, dtype="Int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=DECODED_META_SCHEMA)


def resize_media_fake(
    decoded: DataFrame, id_col: str = "doc_id", max_dim: int = 64
) -> DataFrame:
    """Resize step over decoded metadata (Arrow-batched, like a real
    resampler would be): clamp each dimension to ``max_dim`` and scale
    the byte estimate by the pixel ratio. Deterministic integer math so
    the distributed path is oracle-checkable; a real implementation
    swaps the body for PIL/opencv calls with the same batch shape."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            # int64 BEFORE multiplying: width*height of two int32 series
            # wraps at 2^31 (a 65536x65536 decode wraps to 0 and then
            # floor-divides by zero, which numpy silently maps to 0);
            # zero-area rows estimate 0 bytes explicitly instead
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            new_w = w.clip(upper=max_dim)
            new_h = h.clip(upper=max_dim)
            area = w * h
            scaled = (pdf["n_bytes"].astype("int64") * (new_w * new_h)).floordiv(
                area.where(area > 0, 1)
            ).where(area > 0, 0)
            yield type(pdf)(
                {
                    "doc_id": pdf[id_col],
                    "width": new_w.astype("int32"),
                    "height": new_h.astype("int32"),
                    "n_bytes_est": scaled.astype("int64"),
                }
            )

    # NULL-metadata rows (the decoders keep NULL-payload rows for
    # audits) have no defined resize: drop them JVM-side BEFORE the
    # Arrow hop — inside the batch they arrive as float64-with-NaN
    # (Arrow's null-int -> pandas conversion) and .astype('int64')
    # raises, failing the whole job on one corrupt row
    return (
        decoded.select(id_col, "width", "height", "n_bytes")
        .filter(
            F.col("width").isNotNull()
            & F.col("height").isNotNull()
            & F.col("n_bytes").isNotNull()
        )
        .mapInPandas(run, schema="doc_id long, width int, height int, n_bytes_est long")
    )


def sample_frames(
    decoded: DataFrame, id_col: str = "doc_id", every_k: int = 2
) -> DataFrame:
    """Frame sampling over decoded metadata: one row per every-k-th
    frame with its byte offset into the payload — the JVM-side
    (explode) half of a video pipeline; a real frame extractor would
    follow as a mapInPandas over (payload, frame_offset) slices."""
    # zero-frame rows (a real decoder's corrupt-file branch) must emit
    # zero sampled rows, not crash: sequence(0, -1, k) raises "Illegal
    # sequence boundaries" at runtime
    stride = decoded.filter(F.col("n_frames") > 0).select(
        F.col(id_col),
        F.col("n_bytes"),
        F.col("n_frames"),
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
        ).alias("frame_idx"),
    )
    return stride.select(
        id_col,
        "frame_idx",
        (F.col("frame_idx") * (F.col("n_bytes") / F.col("n_frames")).cast("long")).alias(
            "byte_offset"
        ),
    )


def media_pipeline_persist_once(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dim: int = 64,
    every_k: int = 2,
    reliable: bool = False,
) -> DataFrame:
    """The production form of the multimodal pipeline: decode ONCE,
    checkpoint the decoded metadata, feed all three downstream
    branches (metadata join, resize, frame sampling) from the
    materialized result.

    The registry's ``mm_media_pipeline`` keeps a single declarative
    plan so its arithmetic stays oracle-checkable end to end — the
    price is that Catalyst inlines the decode subtree into each of the
    three branches, so the (expensive: Arrow hop + Python worker)
    decode runs three times per job. Here the decode is materialized
    once — ``iter_checkpoint`` truncates the lineage so every branch
    reads settled blocks (``reliable=True`` writes to the session
    checkpoint dir and survives executor loss, the right trade for a
    100 TB corpus where the decode is hours of GPU/CPU work you never
    want to repeat). Output is row-identical to ``mm_media_pipeline``
    (pytest-asserted); the decode-once-vs-thrice cost ratio is
    measured in SCALE.md (probe: tools/probe_r7.py)."""
    from .dedup import iter_checkpoint

    docs = attach_binary(documents, id_col, text_col)
    meta = binary_meta(docs, id_col).select(
        id_col, F.col("n_bytes").alias("meta_bytes"), "sha256"
    )
    dec = iter_checkpoint(fake_decode_media(docs, id_col), reliable)
    res = resize_media_fake(dec, id_col, max_dim=max_dim).select(
        id_col,
        F.col("width").alias("rs_width"),
        F.col("height").alias("rs_height"),
        "n_bytes_est",
    )
    frames = sample_frames(dec, id_col, every_k=every_k)
    return (
        meta.join(dec.select(id_col, "width", "height", "n_frames"), id_col)
        .join(res, id_col)
        .join(frames, id_col)
    )


def fake_decode_media(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic decode stand-in: width/height/frames derived from
    the payload's length and first bytes. Exercises the exact runtime
    path of a real decoder: Arrow columnar batches in, typed batch out."""
    import pandas as pd  # noqa: F401 (executor-side import)

    def run(batches):
        import hashlib

        import pandas as pd

        def m(payloads, fn):
            # NULL payload -> NULL metadata, same contract as the real
            # decoder (len(None)/bytes(None) would fail the job)
            return payloads.map(lambda b: None if b is None else fn(bytes(b)))

        for pdf in batches:
            payloads = pdf[payload_col]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pd.array(m(payloads, len), dtype="Int64"),
                    "sha256": m(payloads, lambda b: hashlib.sha256(b).hexdigest()),
                    "width": pd.array(
                        m(payloads, lambda b: 16 + (b[0] if len(b) else 0)),
                        dtype="Int32",
                    ),
                    "height": pd.array(
                        m(payloads, lambda b: 16 + (b[-1] if len(b) else 0)),
                        dtype="Int32",
                    ),
                    "n_frames": pd.array(
                        m(payloads, lambda b: 1 + len(b) % 7), dtype="Int32"
                    ),
                }
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, schema=DECODED_META_SCHEMA)
