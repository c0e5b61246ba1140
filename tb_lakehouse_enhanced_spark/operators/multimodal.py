"""Multimodal column plumbing (LLM-pipeline extension).

Images / audio / video travel through the engine as opaque ``binary``
columns with typed metadata — the lakehouse pattern for 100 TB media
corpora: the relational plane carries (id, media BLOB, media_type,
metadata MAP) while decode / feature-extraction runs as Arrow-batched
``mapInPandas`` stages on the executors, so bytes never hit the driver
and each batch amortizes the Python crossing.

The decode step is REAL for the codec-free formats — 8-bit PNG
(stdlib zlib + numpy unfiltering), binary netpbm images (P5/P6, pure
numpy) and PCM WAV audio (stdlib ``wave``) — with
typed feature extractors (``image_features``, ``audio_features``) and a
real nearest-neighbor ``resize_images`` on top. Lossy formats
(JPEG/MP3/H.264) need codec libraries absent from this container;
``decode_fn`` stays pluggable for them:

- ``fake_image_decoder``  deterministic stand-in (hash-seeded "pixels")
  that exercises the full plumbing — schema, batching, feature shapes;
- ``real_decoder`` dispatches PNG/netpbm/WAV natively and raises
  ``NotImplementedError`` for the lossy formats, clearly marking the
  remaining stub boundary.

Everything around the decode — schema handling, batch iteration, output
shapes, partition fan-out — is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = ("media_id bigint, media binary, media_type string, "
                    "width int, height int, metadata map<string,string>")

FEATURE_DIM = 16
_FEATURE_SCHEMA = f"media_id bigint, media_type string, feature array<float>, n_bytes int"


def decode_netpbm(blob: bytes) -> np.ndarray:
    """REAL image decode for binary netpbm: P5 (PGM grayscale) and P6
    (PPM RGB) — the codec-free raster formats, parseable with numpy
    alone. Returns float64 pixels in [0, 1]: (h, w) for P5,
    (h, w, 3) for P6."""
    if blob[:2] not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm image: {blob[:2]!r}")
    # header: magic, width, height, maxval — whitespace/comment-separated
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(blob) and blob[i:i + 1].isspace():
            i += 1
        if blob[i:i + 1] == b"#":                 # comment to EOL
            while i < len(blob) and blob[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j:j + 1].isspace():
            j += 1
        tokens.append(int(blob[i:j]))
        i = j
    i += 1                                        # single ws after maxval
    w, h, maxval = tokens
    channels = 3 if blob[:2] == b"P6" else 1
    dtype = np.dtype(">u2") if maxval > 255 else np.uint8
    pix = np.frombuffer(blob, dtype=dtype, count=w * h * channels, offset=i)
    arr = pix.reshape((h, w, 3) if channels == 3 else (h, w))
    return arr.astype(np.float64) / maxval


def encode_netpbm(arr: np.ndarray) -> bytes:
    """Inverse of ``decode_netpbm`` (8-bit): float [0,1] pixels ->
    P5/P6 bytes — lets resize/transform stages re-emit storable blobs."""
    a = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
    if a.ndim == 3:
        magic, (h, w) = b"P6", a.shape[:2]
    else:
        magic, (h, w) = b"P5", a.shape
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_png(blob: bytes) -> np.ndarray:
    """REAL image decode for 8-bit non-interlaced PNG (gray / RGB /
    RGBA) — pure stdlib zlib + numpy: parse chunks, inflate IDAT,
    undo the per-row filters (None/Sub/Up/Average/Paeth). Returns
    float64 pixels in [0, 1]: (h, w) gray, (h, w, c) otherwise."""
    import struct
    import zlib
    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width = 8, None
    idat = b""
    while pos < len(blob):
        (length,), ctype = struct.unpack(">I", blob[pos:pos + 4]), \
            blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace != 0:
                raise NotImplementedError(
                    f"PNG depth={depth}/interlace={interlace} unsupported "
                    "(8-bit non-interlaced only)")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise NotImplementedError(f"PNG color type {color} "
                                          "(palette) unsupported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(idat)
    stride = width * channels
    out = np.zeros((height, stride), dtype=np.int64)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=y * (stride + 1) + 1).astype(np.int64)
        prior = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            out[y] = line
        elif f == 2:                                  # Up
            out[y] = (line + prior) & 0xFF
        else:                                         # Sub/Average/Paeth
            cur = out[y]
            for x in range(stride):
                a = cur[x - channels] if x >= channels else 0
                b = prior[x]
                if f == 1:
                    v = line[x] + a
                elif f == 3:
                    v = line[x] + (a + b) // 2
                else:                                 # Paeth
                    c = prior[x - channels] if x >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    v = line[x] + pred
                cur[x] = v & 0xFF
    arr = out.astype(np.float64).reshape(height, width, channels) / 255.0
    return arr[:, :, 0] if channels == 1 else arr


def encode_png(arr: np.ndarray) -> bytes:
    """Inverse of ``decode_png`` (8-bit, filter 0 rows): float [0,1]
    pixels -> PNG bytes. Gray (h,w), RGB (h,w,3), RGBA (h,w,4)."""
    import struct
    import zlib
    a = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _decode_image(blob: bytes) -> np.ndarray:
    """Dispatch over the natively-decodable raster formats."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(blob)
    return decode_netpbm(blob)


def decode_wav(blob: bytes) -> np.ndarray:
    """REAL audio decode for PCM WAV via the stdlib ``wave`` module
    (8/16/32-bit int PCM). Returns float64 samples in [-1, 1], shape
    (n_frames, n_channels)."""
    import io
    import wave
    with wave.open(io.BytesIO(blob), "rb") as wf:
        nch = wf.getnchannels()
        sw = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    elif sw == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    return x.reshape(-1, nch)


def real_decoder(blob: bytes, media_type: str) -> np.ndarray:
    """Decode media bytes into an array (pixels / samples).

    REAL for the codec-free formats: 8-bit PNG (stdlib zlib inflate +
    numpy unfiltering), binary netpbm images (P5/P6) and PCM WAV audio
    — sniffed by magic or declared via media_type. Other compressed
    formats (JPEG/MP3/H.264) require
    codec libraries absent from this container — those raise
    ``NotImplementedError`` (the documented stub boundary; inject a
    decode_fn or use ``fake_image_decoder`` in tests)."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n" or media_type == "image/png":
        return decode_png(blob)
    if blob[:2] in (b"P5", b"P6") or media_type in (
            "image/x-portable-graymap", "image/x-portable-pixmap"):
        return decode_netpbm(blob)
    if blob[:4] == b"RIFF" or media_type in ("audio/wav", "audio/x-wav"):
        return decode_wav(blob)
    raise NotImplementedError(
        f"decode of {media_type!r} requires codec libraries not present "
        "in this environment; PNG (8-bit), netpbm (P5/P6) and PCM WAV "
        "decode natively — inject a decode_fn for other formats")


def fake_image_decoder(blob: bytes, media_type: str) -> np.ndarray:
    """Deterministic decode stand-in: md5-seeded pseudo-pixels.

    Produces a stable (8, 8) float array from the bytes so the
    downstream feature pipeline is fully exercisable and test-stable.
    """
    seed = int.from_bytes(hashlib.md5(blob).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random((8, 8), dtype=np.float64)


def extract_features(media: DataFrame,
                     decode_fn: Callable[[bytes, str], np.ndarray] = real_decoder,
                     ) -> DataFrame:
    """binary media -> fixed-dim feature vectors, executor-side.

    One Arrow batch in, one out; the decode runs per row but inside the
    batch loop (no per-row Python UDF dispatch). Output schema is fixed
    so downstream similarity/dedup operators consume it directly.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, nbytes = [], []
            for blob, mtype in zip(pdf["media"], pdf["media_type"]):
                raw = bytes(blob)
                arr = decode_fn(raw, mtype)
                flat = arr.ravel()[:FEATURE_DIM]
                vec = np.zeros(FEATURE_DIM, dtype=np.float32)
                vec[:len(flat)] = flat.astype(np.float32)
                feats.append(vec)
                nbytes.append(len(raw))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "feature": feats,
                "n_bytes": nbytes,
            })

    return media.mapInPandas(run, _FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes bytes through with updated declared dims.

    A real implementation decodes + resamples inside the same
    mapInPandas pattern as ``extract_features`` (see ``resize_images``
    for the REAL path on decodable formats); the relational contract
    (same schema, updated width/height metadata) is what matters here.
    """
    return media.withColumn("width", F.lit(width)) \
                .withColumn("height", F.lit(height))


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize for decodable (netpbm) blobs: decode ->
    nearest-neighbor resample (pure numpy index grids — deterministic,
    no interpolation-library variance) -> re-encode, all inside the
    Arrow batch loop on the executors. Same schema out, bytes and
    declared dims actually changed."""
    cols = media.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_blobs = []
            for blob in pdf["media"]:
                raw = bytes(blob)
                is_png = raw[:8] == b"\x89PNG\r\n\x1a\n"
                arr = _decode_image(raw)
                h, w = arr.shape[:2]
                yi = (np.arange(height) * h) // height
                xi = (np.arange(width) * w) // width
                resized = arr[yi][:, xi]
                out_blobs.append(encode_png(resized) if is_png
                                 else encode_netpbm(resized))
            out = pdf.copy()
            out["media"] = out_blobs
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out[cols]

    return media.mapInPandas(run, media.schema)


IMAGE_FEATURE_SCHEMA = ("media_id bigint, width int, height int, "
                        "mean_luma double, std_luma double, "
                        "histogram array<double>")


def image_features(media: DataFrame, n_bins: int = 8) -> DataFrame:
    """REAL typed image features from decoded pixels: dimensions,
    luminance mean/std, and an ``n_bins`` intensity histogram
    (normalized to sum 1) — the dedup/quality-gate signals a media
    corpus pipeline filters on."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                arr = _decode_image(bytes(blob))
                # alpha (if any) excluded from luminance
                luma = arr[:, :, :3].mean(axis=2) if arr.ndim == 3 else arr
                hist, _ = np.histogram(luma, bins=n_bins, range=(0.0, 1.0))
                rows.append({
                    "media_id": int(mid),
                    "width": int(luma.shape[1]),
                    "height": int(luma.shape[0]),
                    "mean_luma": float(luma.mean()),
                    "std_luma": float(luma.std()),
                    "histogram": (hist / max(1, luma.size)).astype(
                        np.float64)})
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = ("media_id bigint, n_samples bigint, n_channels int, "
                        "rms double, zero_cross_rate double, "
                        "dominant_bin int")


def audio_features(media: DataFrame, n_fft: int = 1024) -> DataFrame:
    """REAL typed audio features from decoded PCM: sample/channel
    counts, RMS level, zero-crossing rate, and the dominant FFT bin of
    the first ``n_fft`` mono samples (numpy rfft) — silence/clipping/
    tone gates for audio corpus prep."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                x = decode_wav(bytes(blob))
                mono = x.mean(axis=1)
                zc = float(np.mean(np.abs(np.diff(np.signbit(mono))))) \
                    if len(mono) > 1 else 0.0
                spec = np.abs(np.fft.rfft(mono[:n_fft]))
                rows.append({
                    "media_id": int(mid),
                    "n_samples": int(x.shape[0]),
                    "n_channels": int(x.shape[1]),
                    "rms": float(np.sqrt((mono ** 2).mean())) if len(mono)
                    else 0.0,
                    "zero_cross_rate": zc,
                    "dominant_bin": int(spec[1:].argmax()) + 1
                    if len(spec) > 1 else 0})
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame index.

    Demonstrates the explode-shaped contract (media row -> frame rows);
    the decode of each frame is the pluggable stub.
    """
    n_frames = F.coalesce(
        F.element_at(F.col("metadata"), "n_frames").cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return (media.select("media_id", "media_type",
                         F.explode(idx).alias("frame_index")))
