"""Generate the codec conformance fixtures committed under
``tests/fixtures/codec_conformance/`` — the INDEPENDENT-decoder
validation of the pure-numpy JPEG/PNG codecs that Pillow's absence in
this environment blocked for three rounds.

The independent codec is ``javax.imageio`` from the JVM Spark already
ships (Temurin JDK 17's bundled JPEG/PNG plugins — a from-scratch Java
implementation sharing no code or lineage with this repo's numpy
codecs).  Two directions per format:

* independent ENCODER -> our decoder: ImageIO writes the stream, its
  own decode of that stream is the expected pixel array;
* our ENCODER -> independent decoder: we write the stream, ImageIO's
  decode of it is the expected pixel array (also pins our encoder's
  bytes — drift fails the byte-equality assertion).

Tolerances: PNG is lossless => exact.  JPEG decoders legitimately
differ by +-1 (IDCT rounding; ITU-T T.83 grants a tolerance per
sample) and +-2 through the color convert; 4:2:0 fixtures use
CONSTANT chroma so the decoder's chroma-upsampling filter choice
(box vs triangle — both standard-conforming, observed up to +-53 on
sharp-chroma images) cannot affect the result.

Each fixture is one ``.npz``: ``stream`` (uint8 bytes), ``expected``
(ImageIO's decoded pixels), ``original`` + ``ours_encoded`` flag when
our encoder produced the stream, and ``tol``.

Usage (needs a JVM via pyspark; run once, commit the outputs):
    python scripts/make_codec_conformance.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "tests", "fixtures", "codec_conformance")


def _jvm():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    return spark, spark._jvm


def imageio_decode(jvm, buf: bytes) -> np.ndarray:
    b = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(buf))
    )
    if b is None:
        raise ValueError("ImageIO could not parse the stream")
    r, w, h = b.getRaster(), b.getWidth(), b.getHeight()
    nc = r.getNumBands()
    if nc == 1:
        return np.array(
            [r.getSample(x, y, 0) for y in range(h) for x in range(w)],
            dtype=np.uint8,
        ).reshape(h, w)
    px = np.array(
        [
            [r.getSample(x, y, c) for c in range(3)]
            for y in range(h)
            for x in range(w)
        ],
        dtype=np.uint8,
    )
    return px.reshape(h, w, 3)


def imageio_encode(jvm, img: np.ndarray, fmt: str) -> bytes:
    h, w = img.shape[:2]
    gray = img.ndim == 2
    B = jvm.java.awt.image.BufferedImage
    b = B(w, h, B.TYPE_BYTE_GRAY if gray else B.TYPE_INT_RGB)
    r = b.getRaster()
    for y in range(h):
        for x in range(w):
            if gray:
                r.setSample(x, y, 0, int(img[y, x]))
            else:
                for c in range(3):
                    r.setSample(x, y, c, int(img[y, x, c]))
    baos = jvm.java.io.ByteArrayOutputStream()
    if not jvm.javax.imageio.ImageIO.write(b, fmt, baos):
        raise ValueError(f"no ImageIO writer for {fmt}")
    return bytes(baos.toByteArray())


def flat_chroma_rgb(h: int, w: int, cb: int = 100, cr: int = 150) -> np.ndarray:
    """RGB image whose Cb/Cr planes are CONSTANT (only luma varies):
    chroma subsampling + any upsampling filter reproduce the constant
    exactly, so 4:2:0 round-trips are upsampling-filter-independent.
    Y kept in [70, 170] so the BT.601 transform stays unclipped."""
    y = (70 + (np.arange(h * w).reshape(h, w) * 5) % 101).astype(np.float64)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(
        np.uint8
    )


def main() -> None:
    from financial_data_ingestion_pipeline_spark.functions import (
        jpeg_codec as J,
    )
    from financial_data_ingestion_pipeline_spark.functions import (
        png_codec as P,
    )

    os.makedirs(OUT, exist_ok=True)
    spark, jvm = _jvm()
    rng = np.random.default_rng(20260816)

    gray_ramp = ((np.arange(12 * 16).reshape(12, 16) * 7) % 256).astype(
        np.uint8
    )
    gray_noise = rng.integers(0, 256, (21, 17)).astype(np.uint8)
    rgb_noise = rng.integers(0, 256, (14, 19, 3)).astype(np.uint8)
    rgb_flat = flat_chroma_rgb(18, 22)

    fixtures = []

    # independent encoder -> our decoder
    for name, img, fmt, tol in [
        ("jpeg_imageio_gray_ramp", gray_ramp, "jpg", 1),
        ("jpeg_imageio_gray_noise", gray_noise, "jpg", 1),
        ("jpeg_imageio_rgb_flatchroma", rgb_flat, "jpg", 2),
        ("png_imageio_gray_noise", gray_noise, "png", 0),
        ("png_imageio_rgb_noise", rgb_noise, "png", 0),
    ]:
        stream = imageio_encode(jvm, img, fmt)
        expected = imageio_decode(jvm, stream)
        fixtures.append((name, stream, expected, None, tol))

    # our encoder -> independent decoder (expected = ImageIO's read of
    # OUR stream; `original` pins the encoder input so the test can
    # also assert byte-exact encoder stability)
    ours = [
        ("jpeg_ours_gray_baseline", gray_noise,
         J.encode_jpeg(gray_noise, quality=90), 1),
        ("jpeg_ours_gray_progressive", gray_noise,
         J.encode_jpeg(gray_noise, quality=90, progressive=True), 1),
        ("jpeg_ours_rgb444", rgb_noise,
         J.encode_jpeg(rgb_noise, quality=95, subsampling=(1, 1)), 2),
        ("jpeg_ours_rgb420_flatchroma_progressive", rgb_flat,
         J.encode_jpeg(rgb_flat, quality=90, progressive=True,
                       subsampling=(2, 2)), 2),
        ("png_ours_gray", gray_noise, P.encode_png(gray_noise), 0),
        ("png_ours_rgb", rgb_noise, P.encode_png(rgb_noise), 0),
    ]
    for name, original, stream, tol in ours:
        expected = imageio_decode(jvm, stream)
        fixtures.append((name, stream, expected, original, tol))

    for name, stream, expected, original, tol in fixtures:
        payload = {
            "stream": np.frombuffer(stream, dtype=np.uint8),
            "expected": expected,
            "tol": np.int64(tol),
        }
        if original is not None:
            payload["original"] = original
        np.savez_compressed(os.path.join(OUT, f"{name}.npz"), **payload)
        print(f"{name}: stream={len(stream)}B expected={expected.shape} "
              f"tol={tol}")
    spark.stop()


if __name__ == "__main__":
    main()
