"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: media travels as an opaque
``binary`` column with typed metadata beside it (the reference carries
business payloads the same way — an opaque serialized ``bytes`` field the
engine never interprets, api/document.proto:17, README_EN.md:32-38).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels so bytes never cross the driver.

The actual codec is STUBBED: this container ships no image/audio
libraries, so :func:`decode_rgb` produces a deterministic fake bitmap
derived from the payload's sha256 when Pillow is absent (and raises
``NotImplementedError`` when ``strict=True``). Everything Spark-side —
schemas, partitioning, UDF signatures, batch shapes, row fan-out — is
real and tested; swapping in a real decoder changes one function.

Scale notes:
- payload rows are big: keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
  small (the session factory sets 10k; media tables should set ~64-256)
  so an Arrow batch of payloads fits in worker memory.
- `repartition(n, media_id)` before the kernels: uniform-by-id spread,
  no skew from per-source file-size imbalance.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_W, FAKE_H = 16, 12  # deterministic stub bitmap dims


def decode_rgb(payload: bytes, strict: bool = False) -> np.ndarray:
    """payload -> HxWx3 uint8 array.

    Real decode requires an image library this container doesn't ship;
    with ``strict`` it raises, otherwise it derives a deterministic fake
    bitmap from sha256(payload) so every downstream kernel is testable.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        if strict:
            raise NotImplementedError(
                "no image codec in this environment; install Pillow or "
                "swap decode_rgb for a real decoder")
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer(
            (h * ((FAKE_W * FAKE_H * 3) // len(h) + 1))[: FAKE_W * FAKE_H * 3],
            dtype=np.uint8,
        )
        return raw.reshape(FAKE_H, FAKE_W, 3).copy()
    import io

    import PIL.Image as Image
    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))


def image_features(media: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload") -> DataFrame:
    """(id, width, height, mean_r, mean_g, mean_b, sha): per-image stats.

    mapInPandas: one Arrow batch in, one stats row per image out — the
    canonical decode-then-reduce kernel shape.
    """
    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_rgb(bytes(payload))
                means = img.reshape(-1, 3).mean(axis=0)
                rows.append((mid, img.shape[1], img.shape[0],
                             float(means[0]), float(means[1]), float(means[2]),
                             hashlib.sha256(bytes(payload)).hexdigest()))
            yield pd.DataFrame(rows, columns=[
                id_col, "width", "height", "mean_r", "mean_g", "mean_b", "sha"])

    return media.mapInPandas(
        kern,
        f"{id_col} long, width int, height int, "
        "mean_r double, mean_g double, mean_b double, sha string")


def resize_images(media: DataFrame, out_w: int, out_h: int,
                  id_col: str = "media_id",
                  payload_col: str = "payload") -> DataFrame:
    """(id, payload): nearest-neighbor resize, re-emitted as raw RGB bytes
    with width/height metadata columns. Payload-in, payload-out kernel."""
    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_rgb(bytes(payload))
                yi = (np.arange(out_h) * img.shape[0] // out_h)
                xi = (np.arange(out_w) * img.shape[1] // out_w)
                small = img[yi][:, xi]
                rows.append((mid, small.tobytes(), out_w, out_h))
            yield pd.DataFrame(rows, columns=[id_col, payload_col,
                                              "width", "height"])

    return media.mapInPandas(
        kern, f"{id_col} long, {payload_col} binary, width int, height int")


def frame_sample(media: DataFrame, every_n: int = 2, n_frames: int = 8,
                 id_col: str = "media_id",
                 payload_col: str = "payload") -> DataFrame:
    """(id, frame_idx, frame_sha): sample every ``every_n``-th frame of a
    'video' payload — the row fan-out kernel shape (one input row -> many
    output rows). Frames are stubbed as per-index slices of the payload
    hash stream."""
    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                for i in range(0, n_frames, every_n):
                    frame = decode_rgb(bytes(payload) + i.to_bytes(4, "big"))
                    ids.append(mid)
                    idxs.append(i)
                    shas.append(hashlib.sha256(frame.tobytes()).hexdigest())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs,
                                "frame_sha": shas})

    return media.mapInPandas(
        kern, f"{id_col} long, frame_idx int, frame_sha string")


def media_table(df: DataFrame, id_col: str, text_col: str,
                kind: str = "image") -> DataFrame:
    """Adapter: fabricate a media table from any (id, text) frame — the
    utf-8 bytes become the opaque payload (deterministic test double for
    a real blob-store read)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )
