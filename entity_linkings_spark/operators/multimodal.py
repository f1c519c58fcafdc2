"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched ``mapInPandas`` plumbing.

Decode policy (this container ships no media libraries, so stdlib-decodable
formats are decoded FOR REAL and everything else fails loudly or falls back
to a marked deterministic fake):
  * image/PPM (P6): real decode + real block-mean resize, pure numpy;
  * image/BMP (24-bit BI_RGB): real decode/encode, pure struct+numpy
    (bottom-up and top-down rasters, row padding);
  * audio/WAV (RIFF/PCM): real decode via the stdlib ``wave`` module;
  * video/AVI (RIFF, uncompressed 24-bit 'DIB ' frames): real container
    walk + frame decode/encode, pure struct+numpy — frame sampling extracts
    true frames re-encoded as standalone BMPs; compressed codecs (MJPG,
    h264, ...) stay behind the loud boundary;
  * anything else: ``real_decode=True`` raises NotImplementedError at the
    exact point a production build would call PIL/torchaudio/ffmpeg;
    the default derives deterministic fake features from the payload bytes
    so the Spark-side contract — schema, partitioning, UDF signature, batch
    shape — is exercised end-to-end regardless.

Scale notes: payloads stay opaque to the JVM (binary columns move through
Tungsten untyped); feature extraction is embarrassingly parallel per batch;
frame sampling explodes rows inside ``mapInPandas`` so the expansion never
materializes driver-side.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("decoder", T.StringType(), False),  # ppm | bmp | wav | fake
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("t_ms", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


# ---------------------------------------------------------------------------
# real codecs (stdlib/numpy only)
# ---------------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. Raises ValueError on anything
    that is not a P6 stream (the loud-failure contract)."""
    payload = bytes(payload)
    # explicit header regex: exactly ONE whitespace terminates maxval (a
    # whitespace-split would eat raster bytes that happen to start with 0x20)
    import re

    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not m:
        raise ValueError("not a P6 PPM payload")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = payload[m.end() : m.end() + w * h * 3]
    if len(raster) < w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up, BGR, 4-byte row padding) — pure struct packing, stdlib only."""
    import struct

    h, w = arr.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    raster = bytearray()
    pad = b"\x00" * (stride - w * 3)
    bgr = arr[:, :, ::-1].astype(np.uint8)
    for y in range(h - 1, -1, -1):  # bottom-up row order
        raster += bgr[y].tobytes() + pad
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    return header + dib + bytes(raster)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB. Handles bottom-up and
    top-down (negative height) rasters and row padding; raises ValueError on
    anything else (the loud-failure contract)."""
    import struct

    payload = bytes(payload)
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {dib_size}")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    if len(payload) < off + stride * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(
        payload[off : off + stride * h], dtype=np.uint8
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> RIFF/WAVE bytes (stdlib wave writer)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes -> (sample_rate, int16 mono samples)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        sr = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
        x = np.frombuffer(raw, dtype="<i2")
        if wf.getnchannels() > 1:
            x = x.reshape(-1, wf.getnchannels()).mean(axis=1).astype(np.int16)
    return sr, x


def encode_avi(frames: list[np.ndarray], fps: int = 1) -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> RIFF/AVI bytes with
    UNCOMPRESSED 'DIB ' video (bottom-up BGR, BMP-style 4-byte row stride) —
    pure struct packing, stdlib only. Layout: RIFF('AVI ' LIST('hdrl' avih
    LIST('strl' strh strf)) LIST('movi' '00db'...))."""
    import struct

    if not frames:
        raise ValueError("encode_avi: need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("encode_avi: all frames must share one size")
    stride = (w * 3 + 3) // 4 * 4
    pad = b"\x00" * (stride - w * 3)
    rasters = []
    for f in frames:
        bgr = f[:, :, ::-1].astype(np.uint8)
        rasters.append(b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1)))
    frame_bytes = stride * h

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) % 2))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    us_per_frame = 1_000_000 // max(fps, 1)
    avih = chunk(b"avih", struct.pack(
        "<14I", us_per_frame, frame_bytes * fps, 0, 0, len(frames), 0, 1,
        frame_bytes, w, h, 0, 0, 0, 0,
    ))
    strh = chunk(b"strh", struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0,
        len(frames), frame_bytes, 0, 0, 0, 0, w, h,
    ))
    strf = chunk(b"strf", struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0
    ))
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(chunk(b"00db", r) for r in rasters))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_avi(payload: bytes) -> tuple[int, list[np.ndarray]]:
    """RIFF/AVI bytes -> (fps, [(h, w, 3) uint8 RGB frames]). Supports ONLY
    the uncompressed 24-bit 'DIB '/BI_RGB layout encode_avi writes (the one
    video format decodable without a codec library); compressed streams
    (MJPG, h264, ...) raise ValueError — real_decode surfaces that loudly,
    exactly where a production build swaps in ffmpeg."""
    import struct

    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    w = h = None
    fps = 1
    rasters: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal w, h, fps
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if fourcc == b"LIST":
                walk(buf, body_start + 4, body_end)  # skip the list kind
            elif fourcc == b"strh":
                typ, handler = buf[body_start:body_start + 4], buf[body_start + 4:body_start + 8]
                if typ == b"vids":
                    if handler not in (b"DIB ", b"\x00\x00\x00\x00"):
                        raise ValueError(
                            f"unsupported AVI video codec {handler!r} — only "
                            "uncompressed 'DIB ' decodes without a codec library"
                        )
                    scale, rate = struct.unpack_from("<II", buf, body_start + 20)
                    if scale:
                        fps = max(rate // scale, 1)
            elif fourcc == b"strf":
                dib = struct.unpack_from("<IiiHHI", buf, body_start)
                if dib[4] != 24 or dib[5] != 0:
                    raise ValueError(
                        f"unsupported AVI frame format (bpp={dib[4]}, "
                        f"compression={dib[5]})"
                    )
                w, h = dib[1], abs(dib[2])
            elif fourcc in (b"00db", b"00dc"):
                rasters.append(buf[body_start:body_end])
            pos = body_start + size + (size % 2)

    walk(payload, 12, len(payload))
    if w is None or not rasters:
        raise ValueError("AVI payload has no decodable video frames")
    stride = (w * 3 + 3) // 4 * 4
    frames = []
    for r in rasters:
        if len(r) < stride * h:
            raise ValueError("truncated AVI frame raster")
        rows = np.frombuffer(r[: stride * h], dtype=np.uint8).reshape(h, stride)
        frames.append(rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy())
    return fps, frames


def block_mean_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic block-mean downsample of (h, w, 3) uint8 (area filter
    on integer-divisible grids; nearest-index grouping otherwise)."""
    h, w = arr.shape[:2]
    yi = (np.arange(h) * out_h // h).clip(0, out_h - 1)
    xi = (np.arange(w) * out_w // w).clip(0, out_w - 1)
    out = np.zeros((out_h, out_w, 3), np.float64)
    cnt = np.zeros((out_h, out_w, 1), np.float64)
    np.add.at(out, (yi[:, None], xi[None, :]), arr.astype(np.float64))
    np.add.at(cnt, (yi[:, None], xi[None, :]), 1.0)
    return (out / np.maximum(cnt, 1)).round().astype(np.uint8)


# ---------------------------------------------------------------------------
# feature extraction
# ---------------------------------------------------------------------------

def _image_features(arr: np.ndarray) -> np.ndarray:
    f = np.empty(FEATURE_DIM, np.float32)
    x = arr.astype(np.float32) / 255.0
    f[0] = arr.shape[1] / 1024.0
    f[1] = arr.shape[0] / 1024.0
    f[2:5] = x.mean(axis=(0, 1))
    f[5:8] = x.std(axis=(0, 1))
    gray = x.mean(axis=2)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 1.0))
    f[8:16] = hist / max(gray.size, 1)
    return f


def _audio_features(sr: int, samples: np.ndarray) -> np.ndarray:
    f = np.empty(FEATURE_DIM, np.float32)
    x = samples.astype(np.float32) / 32768.0
    n = max(len(x), 1)
    f[0] = sr / 48000.0
    f[1] = (n / max(sr, 1)) / 10.0  # duration / 10s
    f[2] = float(np.sqrt((x**2).mean())) if len(x) else 0.0
    f[3] = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if len(x) > 1 else 0.0
    # 12-block RMS envelope
    blocks = np.array_split(x, 12) if len(x) >= 12 else [x] * 12
    f[4:16] = [float(np.sqrt((b**2).mean())) if len(b) else 0.0 for b in blocks]
    return f


def _video_features(fps: int, frames: list[np.ndarray]) -> np.ndarray:
    f = np.empty(FEATURE_DIM, np.float32)
    xs = [fr.astype(np.float32) / 255.0 for fr in frames]
    f[0] = len(frames) / 64.0
    f[1] = fps / 30.0
    f[2] = xs[0].shape[1] / 1024.0
    f[3] = xs[0].shape[0] / 1024.0
    means = np.array([x.mean() for x in xs], np.float32)
    f[4] = means.mean()
    f[5] = means.std()
    # mean absolute inter-frame difference (motion proxy)
    f[6] = (
        float(np.mean([np.abs(a - b).mean() for a, b in zip(xs[1:], xs[:-1])]))
        if len(xs) > 1 else 0.0
    )
    f[7] = xs[0].std()
    # 8-bin luminance histogram of the middle frame
    gray = xs[len(xs) // 2].mean(axis=2)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 1.0))
    f[8:16] = hist / max(gray.size, 1)
    return f


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for formats this container cannot decode."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return raw / 65535.0


def _decode_one(kind: str, payload: bytes, real_decode: bool):
    """(decoder_name, features) for one payload."""
    if payload is not None:
        # magic-byte sniff, but a payload that LOOKS like a known format yet
        # fails to decode (unsupported bpp/compression, truncated raster, a
        # fake payload that happens to start with 'BM'...) must honor the
        # module contract: loud failure only under real_decode, fake fallback
        # otherwise
        try:
            if payload.startswith(b"P6"):
                return "ppm", _image_features(decode_ppm(payload))
            if payload[:2] == b"BM":
                return "bmp", _image_features(decode_bmp(payload))
            if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                return "wav", _audio_features(*decode_wav(payload))
            if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
                return "avi", _video_features(*decode_avi(payload))
        except (ValueError, EOFError, wave.Error):
            if real_decode:
                raise
    if real_decode:
        raise NotImplementedError(
            f"no codec for kind={kind!r} payload in this container — swap in "
            "PIL/torchaudio/ffmpeg here for jpeg/png/mp4 assets (PPM, BMP, "
            "WAV and uncompressed-DIB AVI already decode for real above)"
        )
    return "fake", _fake_features(payload or b"")


def extract_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out. PPM/WAV
    payloads are decoded for real (sniffed by magic bytes); others use the
    deterministic fake unless ``real_decode=True`` (then: loud failure)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decs, feats = [], []
            for kind, p in zip(pdf["kind"], pdf["payload"]):
                d, f = _decode_one(kind, p, real_decode)
                decs.append(d)
                feats.append(f.tolist())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "decoder": decs,
                    "features": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Real image resize (block-mean) for PPM and BMP payloads, re-encoded in
    their source format; other formats are dropped (they would need the
    codec swap-in)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "width": [], "height": [], "payload": []}
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                if b.startswith(b"P6"):
                    dec, enc = decode_ppm, encode_ppm
                elif b[:2] == b"BM":
                    dec, enc = decode_bmp, encode_bmp
                else:
                    continue
                try:
                    arr = block_mean_resize(dec(b), out_w, out_h)
                except ValueError:
                    continue  # sniffed-but-undecodable: drop, per contract
                out["asset_id"].append(aid)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["payload"].append(enc(arr))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Expand video assets into frame rows. AVI payloads (the one container
    this sandbox can decode) are sampled FOR REAL: the frame nearest each
    every_ms tick is extracted and re-encoded as a standalone BMP — a
    decodable image any downstream stage (resize_images, extract_features)
    consumes directly. Undecodable containers keep the deterministic fake
    slices so the Spark plumbing is exercised regardless. Non-video rows
    produce nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "t_ms": [], "frame_payload": []}
            vids = pdf[pdf["kind"] == "video"]
            for _, row in vids.iterrows():
                # Arrow structs with nullable int fields surface as floats
                # (NaN for null) in pandas — normalize before range()
                raw = row["meta"]["duration_ms"] if row["meta"] is not None else None
                dur = 0 if raw is None or pd.isna(raw) else int(raw)
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                frames = fps = None
                if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
                    try:
                        fps, frames = decode_avi(payload)
                    except ValueError:
                        frames = None  # sniffed-but-undecodable: fake fallback
                for k, t in enumerate(range(0, dur, every_ms)):
                    if frames is not None:
                        idx = min(t * fps // 1000, len(frames) - 1)
                        fp = encode_bmp(frames[idx])
                    else:
                        lo = (k * 16) % max(len(payload), 1)
                        fp = payload[lo : lo + 16]
                    out["asset_id"].append(row["asset_id"])
                    out["frame_idx"].append(k)
                    out["t_ms"].append(t)
                    out["frame_payload"].append(fp)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# deterministic synthetic assets (REAL formats where decodable)
# ---------------------------------------------------------------------------

def synthetic_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake assets: images alternate between REAL P6 PPMs and
    REAL 24-bit BMPs, audio is REAL RIFF/PCM WAV, and videos alternate
    between REAL uncompressed-DIB RIFF/AVI containers (4 frames, 1 fps) and
    md5-stream bytes (so both the real-decode path and the fake fallback
    stay exercised end-to-end)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 64, 48
            base = np.frombuffer(
                b"".join(hashlib.md5(f"img:{i}:{j}".encode()).digest() for j in range(w * h * 3 // 16 + 1)),
                dtype=np.uint8,
            )[: w * h * 3].reshape(h, w, 3)
            payload = encode_ppm(base) if (i // 3) % 2 == 0 else encode_bmp(base)
            meta = {"width": w, "height": h, "sample_rate": None, "duration_ms": None}
        elif kind == "audio":
            sr, dur_ms = 16000, 250
            t = np.arange(sr * dur_ms // 1000, dtype=np.float64)
            freq = 200.0 + (i % 10) * 50.0
            samples = (np.sin(2 * np.pi * freq * t / sr) * 12000).astype(np.int16)
            payload = encode_wav(samples, sr)
            meta = {"width": None, "height": None, "sample_rate": sr, "duration_ms": dur_ms}
        else:
            if (i // 3) % 2 == 0:
                fw, fh = 16, 12
                frames = [
                    np.frombuffer(
                        b"".join(
                            hashlib.md5(f"vid:{i}:{k}:{j}".encode()).digest()
                            for j in range(fw * fh * 3 // 16 + 1)
                        ),
                        dtype=np.uint8,
                    )[: fw * fh * 3].reshape(fh, fw, 3)
                    for k in range(4)
                ]
                payload = encode_avi(frames, fps=1)
            else:
                payload = b"".join(
                    hashlib.md5(f"{i}:{j}".encode()).digest() for j in range(8)
                )
            meta = {"width": None, "height": None, "sample_rate": None, "duration_ms": 4000}
        rows.append((f"asset-{i:04d}", kind, payload, meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
