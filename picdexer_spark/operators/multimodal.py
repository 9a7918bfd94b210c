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

The compressed-codec libraries (libjpeg/Pillow/ffmpeg) are NOT in this
runtime image, so jpeg/png/video payloads cannot be decoded here — but the
decode, resize and frame-sample kernels are REAL for binary PPM (P6), the
uncompressed public interchange format: header parse + numpy pixel math,
byte-exact and oracle-checkable. Swapping in Pillow for compressed formats
changes only the per-format branch of ``_decode_image``; every batch
contract stays identical.

MIME sniff mirrors the reference's content-based (not extension-based)
categorization (internal/common/common.go:21-27).
"""

from __future__ import annotations

import re
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
    (b"P6\n", "image/x-portable-pixmap"),
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


#: binary-PPM header: magic, width, height, maxval, single whitespace after
_PPM_HEADER = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")


def _decode_ppm(buf: bytes) -> tuple[int, int, np.ndarray, int]:
    """Parse a binary PPM (P6): returns (width, height, HxWx3 uint8 pixel
    array, maxval). Raises ValueError on malformed/truncated payloads."""
    m = _PPM_HEADER.match(buf)
    if not m:
        raise ValueError("not a binary PPM")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if w <= 0 or h <= 0 or not (0 < maxval < 256):
        raise ValueError("bad PPM dimensions")
    need = w * h * 3
    if len(buf) - m.end() < need:
        raise ValueError("truncated PPM payload")
    px = np.frombuffer(buf, np.uint8, count=need, offset=m.end())
    return w, h, px.reshape(h, w, 3), maxval


def _decode_image(buf: bytes) -> tuple[int, int, int, float]:
    """Decode kernel: (width, height, channels, mean_luma in [0,1]).

    Real for binary PPM, (round 6) BASELINE JPEG — the reference's own
    golden fixture is a JPEG it really decodes and resizes
    (binary_resizer.go:35-49, testdata/picture.jpg) — via the pure-numpy
    SOF0 codec in functions/jpeg.py, and (round 6) 8-bit PNG via the
    zlib+numpy codec in functions/png.py. Remaining formats (progressive
    JPEG, 16-bit/interlaced PNG, WEBP, ...) raise — the caller records
    decode_ok=false — until the cluster image ships Pillow/turbojpeg;
    only this dispatch grows a branch then."""
    if buf[:3] == b"\xFF\xD8\xFF":
        from picdexer_spark.functions.jpeg import decode_jpeg

        rgb = decode_jpeg(buf)
        return (rgb.shape[1], rgb.shape[0], rgb.shape[2],
                float(rgb.mean()) / 255.0)
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        from picdexer_spark.functions.png import decode_png

        px = decode_png(buf)
        return (px.shape[1], px.shape[0], px.shape[2],
                float(px.mean()) / 255.0)
    w, h, px, maxval = _decode_ppm(buf)
    return w, h, 3, float(px.mean()) / float(maxval)


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
                    w, h, c, luma = _decode_image(bytes(buf))
                except Exception:
                    continue
                out["width"][i] = w
                out["height"][i] = h
                out["n_channels"][i] = c
                out["mean_luma"][i] = luma
                out["decode_ok"][i] = True
            yield pd.DataFrame(out)

    return cols.mapInPandas(decode_batches, MEDIA_FEATURES_SCHEMA)


def resize_ppm_bytes(buf: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize of one binary PPM, pure index arithmetic
    (the reference resizes via ImageMagick subprocess,
    binary_resizer.go:35-49; here the kernel is in-process numpy)."""
    w, h, px, maxval = _decode_ppm(buf)
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    out = px[rows][:, cols]
    # preserve the source maxval: pixel bytes are copied unchanged, so a
    # hardcoded 255 header would silently rescale brightness for inputs
    # with maxval != 255
    return b"P6\n%d %d\n%d\n" % (width, height, maxval) + out.tobytes()


def resize_jpeg_bytes(buf: bytes, width: int, height: int,
                      quality: int = 85) -> bytes:
    """Decode -> nearest-neighbor resize -> re-encode one baseline JPEG
    (the reference's ImageMagick `-resize` subprocess,
    binary_resizer.go:35-49, done in-process: functions/jpeg.py)."""
    from picdexer_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rgb = decode_jpeg(buf)
    h, w = rgb.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return encode_jpeg(rgb[rows][:, cols], quality=quality)


def resize_png_bytes(buf: bytes, width: int, height: int) -> bytes:
    """Decode -> nearest-neighbor resize -> re-encode one 8-bit PNG
    (functions/png.py; channel count preserved — gray/alpha survive)."""
    from picdexer_spark.functions.png import decode_png, encode_png

    px = decode_png(buf)
    h, w = px.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return encode_png(px[rows][:, cols])


def resize_media(
    df: DataFrame, id_col: str, media_col: str, width: int, height: int
) -> DataFrame:
    """The resize branch: binary in -> binary out, same partitioning,
    streaming Arrow batches. Real for PPM payloads; rows whose payload
    cannot be decoded come back with media=NULL and resize_ok=false (the
    reference logs & drops per-row failures, binary.go:91-104 — here they
    stay visible for metrics)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_media: list[bytes | None] = []
            ok = np.zeros(len(pdf), bool)
            for i, buf in enumerate(pdf["media"]):
                try:
                    raw = bytes(buf)
                    if raw[:3] == b"\xFF\xD8\xFF":
                        out_media.append(
                            resize_jpeg_bytes(raw, width, height))
                    elif raw[:8] == b"\x89PNG\r\n\x1a\n":
                        out_media.append(
                            resize_png_bytes(raw, width, height))
                    else:
                        out_media.append(
                            resize_ppm_bytes(raw, width, height))
                    ok[i] = True
                except Exception:
                    out_media.append(None)
            yield pd.DataFrame(
                {"id": pdf["id"], "media": out_media, "resize_ok": ok}
            )

    return df.select(
        F.col(id_col).alias("id"), F.col(media_col).alias("media")
    ).mapInPandas(resize_batches, "id long, media binary, resize_ok boolean")


FRAMES_PER_ASSET = 2  # deterministic fake decoder: 2 frames per asset


def frame_sample_plan(
    df: DataFrame, id_col: str, media_col: str, every_n: int = 30
) -> DataFrame:
    """Video frame-sampling plan (1 row -> N frame rows): the UDTF shape is
    an exploding mapInPandas. The fan-out is vectorized (numpy repeat/tile
    over the batch — no per-row iteration); the frame decoder itself is a
    deterministic fake (head bytes + frame index) so the fan-out semantics
    are testable without ffmpeg."""
    nf = FRAMES_PER_ASSET

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["media"].to_numpy(dtype=object)
            keep = np.fromiter(
                (b is not None and len(b) >= 8 for b in media),
                bool, count=media.size,
            )
            ids = pdf["id"].to_numpy()[keep]
            heads = [bytes(b[:16]) for b in media[keep]]
            out_ids = np.repeat(ids, nf)
            frame_no = np.tile(np.arange(nf, dtype=np.int32) * every_n,
                               ids.size)
            frames = [h + bytes([k]) for h in heads for k in range(nf)]
            yield pd.DataFrame(
                {"id": out_ids, "frame_no": frame_no, "frame": frames}
            )

    return df.select(
        F.col(id_col).alias("id"), F.col(media_col).alias("media")
    ).mapInPandas(sample_batches, "id long, frame_no int, frame binary")
