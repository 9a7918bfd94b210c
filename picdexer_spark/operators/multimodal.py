"""Multimodal column operators: opaque binary payloads + typed metadata.

The reference's binary branch resizes every image through an ImageMagick
subprocess and pushes it to a file server (reference:
internal/binary/binary_resizer.go:35-49, binary_pusher.go:32-68, fan-out
dispatch internal/dispatch/dispatch.go:8-23). The Spark-native shape of that
branch for a 100 TB pipeline:

- media rows are (id, media binary, mime string, meta struct) — the payload
  is never interpreted by Catalyst, only moved;
- cheap metadata ops (sniff, size, hash, routing) are JVM expressions;
- decode / resize / frame-sample are Arrow-batched ``mapInPandas`` stages
  with an explicit batch contract (bytes in, bytes + typed features out).

The image/audio codec libraries are NOT in this runtime image, so the codec
kernels are STUBBED behind ``_decode_image_stub`` (deterministic fake) /
``NotImplementedError`` — the Spark-side plumbing (schemas, partitioning,
UDF signatures, batch shapes, error semantics) is real and tested. Swapping
the stub for Pillow/ffmpeg changes one function body on the executor side.

MIME sniff mirrors the reference's content-based (not extension-based)
categorization (internal/common/common.go:21-27).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: magic-number table for content sniffing (the reference sniffs via
#: net/http DetectContentType; same idea, explicit prefixes)
_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),  # RIFF....WAVE, checked loosely
    (b"ID3", "audio/mpeg"),
    (b"\x1aE\xdf\xa3", "video/webm"),
]

MEDIA_FEATURES_SCHEMA = (
    "id long, mime string, n_bytes long, content_md5 string,"
    " width int, height int, n_channels int, mean_luma double, decode_ok boolean"
)


def sniff_mime_col(media_col: str) -> F.Column:
    """Content-sniffed MIME type (JVM-side prefix checks, no UDF)."""
    c = F.col(media_col)
    expr = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        hexs = magic.hex()
        expr = F.when(
            F.hex(F.substring(c, 1, len(magic))) == hexs.upper(), F.lit(mime)
        ).otherwise(expr)
    return expr


def media_metadata(df: DataFrame, id_col: str, media_col: str) -> DataFrame:
    """Cheap JVM-only metadata projection: size, md5 identity, sniffed mime
    (the reference's CategorizePicture + FileID, common.go:21-63)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.length(media_col).cast("long").alias("n_bytes"),
        F.md5(F.col(media_col)).alias("content_md5"),
        sniff_mime_col(media_col).alias("mime"),
    )


def _decode_image_stub(buf: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake decoder: derives (width, height, channels,
    mean_luma) from the byte content. REPLACE with a real codec (Pillow /
    turbojpeg) on a cluster image that ships one — the surrounding batch
    plumbing is codec-agnostic."""
    if len(buf) < 8:
        raise ValueError("truncated media payload")
    a = np.frombuffer(buf[:256], np.uint8)
    w = int(64 + (int(a[:16].sum()) % 192))
    h = int(64 + (int(a[16:32].sum()) % 192))
    return w, h, 3, float(np.mean(a)) / 255.0


def extract_media_features(
    df: DataFrame, id_col: str, media_col: str, batch_size_hint: int = 256
) -> DataFrame:
    """Decode/feature pass over binary media: Arrow-batched mapInPandas.

    Batch contract: each pandas batch holds raw bytes; the decode kernel is
    applied per element but vectorized per batch for the numpy parts. Rows
    that fail to decode are kept with decode_ok=false (the reference logs &
    drops per-row failures, binary.go:91-104 — here they stay visible for
    the metrics table).
    """
    cols = df.select(
        F.col(id_col).alias("id"),
        F.col(media_col).alias("media"),
        sniff_mime_col(media_col).alias("mime"),
        F.length(media_col).cast("long").alias("n_bytes"),
        F.md5(F.col(media_col)).alias("content_md5"),
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "id": pdf["id"], "mime": pdf["mime"],
                "n_bytes": pdf["n_bytes"], "content_md5": pdf["content_md5"],
                "width": np.zeros(n, np.int32),
                "height": np.zeros(n, np.int32),
                "n_channels": np.zeros(n, np.int32),
                "mean_luma": np.zeros(n, np.float64),
                "decode_ok": np.zeros(n, bool),
            }
            for i, buf in enumerate(pdf["media"]):
                try:
                    w, h, c, luma = _decode_image_stub(bytes(buf))
                except Exception:
                    continue
                out["width"][i] = w
                out["height"][i] = h
                out["n_channels"][i] = c
                out["mean_luma"][i] = luma
                out["decode_ok"][i] = True
            yield pd.DataFrame(out)

    return cols.mapInPandas(decode_batches, MEDIA_FEATURES_SCHEMA)


def resize_media(
    df: DataFrame, id_col: str, media_col: str, width: int, height: int
) -> DataFrame:
    """The resize branch (reference binary_resizer.go:35-49). STUB: the
    transform kernel raises until a codec library is present; the plan shape
    (binary in -> binary out, same partitioning, spill-free streaming
    batches) is the deliverable here."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in batches:
            raise NotImplementedError(
                "resize kernel needs an image codec (Pillow/ImageMagick); "
                "not available in this runtime image"
            )

    return df.select(
        F.col(id_col).alias("id"), F.col(media_col).alias("media")
    ).mapInPandas(resize_batches, "id long, media binary")


def frame_sample_plan(
    df: DataFrame, id_col: str, media_col: str, every_n: int = 30
) -> DataFrame:
    """Video frame-sampling plan (1 row -> N frame rows): the UDTF shape is
    an exploding mapInPandas; the decoder is stubbed to a deterministic
    2-frame fake so the fan-out semantics are testable without ffmpeg."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"id": [], "frame_no": [], "frame": []}
            for _, r in pdf.iterrows():
                buf = bytes(r["media"]) if r["media"] is not None else b""
                if len(buf) < 8:
                    continue
                for k in range(2):  # deterministic fake: 2 frames per asset
                    rows["id"].append(r["id"])
                    rows["frame_no"].append(k * every_n)
                    rows["frame"].append(buf[:16] + bytes([k]))
            yield pd.DataFrame(rows)

    return df.select(
        F.col(id_col).alias("id"), F.col(media_col).alias("media")
    ).mapInPandas(sample_batches, "id long, frame_no int, frame binary")
