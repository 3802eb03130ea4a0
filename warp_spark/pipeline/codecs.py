"""REAL multimodal codecs — pure stdlib/numpy, no external image/audio
libraries — behind the same Arrow-batched ``mapInPandas`` plumbing as
the stubbed paths in ``multimodal.py``.

Three formats are fully real here:

- **PNG** (``encode_png`` / ``decode_png``): writes and parses actual
  PNG byte streams — signature, IHDR/IDAT/IEND chunks, CRC-32, zlib
  compression, and all five scanline filter types (None/Sub/Up/
  Average/Paeth) for 8-bit grayscale / RGB / RGBA. The encoder can
  apply a chosen filter per image so the decoder's unfiltering of
  every filter type is exercised, not just filter 0.
- **WAV** (``encode_wav`` / ``decode_wav``): canonical RIFF/WAVE
  PCM — fmt/data chunk walk, 8/16-bit mono/stereo.
- **Y4M** (``encode_y4m`` / ``decode_y4m``): YUV4MPEG2 — the real
  uncompressed video interchange format (the ffmpeg/x264 pipe format);
  header tags, FRAME markers, planar 4:2:0 YUV.

These are the "one real codec behind the same API" tier the stub
docstrings promise (multimodal.py:37,86,132): swap ``_decode_stub`` for
``decode_png`` and the plumbing is unchanged. The reference has no
multimodal tier — this extends it for LLM-training-data pipelines.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels -> PNG color type
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (PNG spec §9.4)."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as a real PNG, applying
    ``filter_type`` (0-4) to every scanline — a spec-exact encoder, so
    round-tripping through ``decode_png`` proves both directions."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    bpp = ch  # bytes per pixel at bit depth 8
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        line = px[y]
        left = np.vstack([np.zeros((1, ch), np.uint8), line[:-1]])
        ul = np.vstack([np.zeros((1, ch), np.uint8), prev[:-1]])
        if filter_type == 0:
            filt = line
        elif filter_type == 1:  # Sub
            filt = (line.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:  # Up
            filt = (line.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:  # Average
            filt = (
                line.astype(np.int16)
                - ((left.astype(np.int16) + prev.astype(np.int16)) >> 1)
            ).astype(np.uint8)
        elif filter_type == 4:  # Paeth
            filt = (line.astype(np.int16) - _paeth(left, prev, ul)).astype(np.uint8)
        else:
            raise ValueError(f"bad filter {filter_type}")
        raw.append(filter_type)
        raw.extend(filt.tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Parse a real PNG byte stream to an (H, W, C) uint8 array: chunk
    walk with CRC verification, zlib inflate, and per-scanline
    unfiltering of all five filter types. Supports the 8-bit
    non-interlaced gray/RGB/RGBA subset (the training-data case);
    anything else raises."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, meta = 8, bytearray(), None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or interlace != 0 or ctype not in _CHANNELS:
                raise ValueError("unsupported PNG variant")
            meta = (w, h, _CHANNELS[ctype])
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("missing IHDR")
    w, h, ch = meta
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("bad IDAT length")
    out = np.zeros((h, w, ch), dtype=np.uint8)
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).reshape(w, ch)
        if ft == 0:
            cur = line.copy()
        elif ft == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ft == 1:  # Sub: cur[x] = line[x] + cur[x-1] ≡ running mod-256 sum
            cur = np.cumsum(line.astype(np.int64), axis=0).astype(np.uint8)
        elif ft in (3, 4):  # Average/Paeth: true left-to-right dependence —
            # python-int rows (numpy scalar indexing is ~10× slower)
            lrow = line.astype(np.int32).tolist()
            prow = prev.astype(np.int32).tolist()
            out_row = [[0] * ch for _ in range(w)]
            left = [0] * ch
            for x in range(w):
                up = prow[x]
                ul = prow[x - 1] if x else [0] * ch
                px_in = lrow[x]
                nxt = out_row[x]
                for c0 in range(ch):
                    a, b2, cc = left[c0], up[c0], ul[c0]
                    if ft == 3:
                        pred = (a + b2) >> 1
                    else:
                        p = a + b2 - cc
                        pa, pb, pc = abs(p - a), abs(p - b2), abs(p - cc)
                        pred = a if (pa <= pb and pa <= pc) else (b2 if pb <= pc else cc)
                    nxt[c0] = (px_in[c0] + pred) & 0xFF
                left = nxt
            cur = np.array(out_row, dtype=np.uint8).reshape(w, ch)
        else:
            raise ValueError(f"bad filter byte {ft}")
        out[y] = cur
        prev = cur
    return out


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE PCM)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 PCM samples ((N,) mono or (N, C)) as a canonical
    RIFF/WAVE file."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes):
    """Parse RIFF/WAVE PCM (8- or 16-bit): chunk walk to fmt + data,
    returns (samples int32 array (N, C), sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", payload[:16])
            if audio_fmt != 1 or bits not in (8, 16):
                raise ValueError("unsupported WAV variant")
            fmt = (ch, rate, bits)
        elif tag == b"data":
            pcm = payload
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    ch, rate, bits = fmt
    if bits == 16:
        arr = np.frombuffer(pcm, "<i2").astype(np.int32)
    else:
        arr = np.frombuffer(pcm, np.uint8).astype(np.int32) - 128
    return arr.reshape(-1, ch), rate


# ---------------------------------------------------------------------------
# Spark surface: real-codec featurizers (same shape as multimodal.py)
# ---------------------------------------------------------------------------

PNG_FEATURE_SCHEMA = (
    "doc_id long, width long, height long, channels long, n_pixels long, "
    "sum_pixels long, px_first long, px_last long"
)


def png_decode_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode REAL PNG payloads (Arrow-batched) and emit integer pixel
    statistics — all-integer outputs so a SQL oracle that replays the
    pixel-generation rule value-matches with no float discipline
    needed. This is ``decode_features`` with the stub swapped for the
    real codec, per the documented one-function-change contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                px = decode_png(bytes(payload))
                h, w, ch = px.shape
                flat = px.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        ch,
                        int(flat.size),
                        int(flat.sum()),
                        int(flat[0]),
                        int(flat[-1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "channels",
                    "n_pixels",
                    "sum_pixels",
                    "px_first",
                    "px_last",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=PNG_FEATURE_SCHEMA)


PNG_HIST_SCHEMA = "doc_id long, bin long, n_px long"


def png_histogram(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_bins: int = 16,
) -> DataFrame:
    """Luminance histogram of REAL decoded PNGs — the feature an image
    quality filter buckets on (all-dark / blown-out / low-contrast
    detection).  One Arrow-batched pass: decode, ``np.bincount`` the
    pixels into ``n_bins`` equal-width bins, emit one row per NONEMPTY
    (doc, bin) — integer counts only, so the SQL oracle that replays
    the pixel-generation rule value-matches exactly (empty bins are
    absent on both sides because the oracle's GROUP BY never sees
    them).  Scale shape: map-side only, output ≤ n_bins rows per image
    regardless of resolution — the histogram is the bounded artifact,
    the pixels never leave the kernel."""
    if 256 % n_bins:
        raise ValueError(f"n_bins must divide 256, got {n_bins}")
    width = 256 // n_bins

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                px = decode_png(bytes(payload))
                flat = px.reshape(-1).astype(np.int64)
                counts = np.bincount(flat // width, minlength=n_bins)
                rows.extend(
                    (int(doc_id), int(b), int(c))
                    for b, c in enumerate(counts)
                    if c
                )
            yield pd.DataFrame(rows, columns=["doc_id", "bin", "n_px"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=PNG_HIST_SCHEMA)


WAV_FEATURE_SCHEMA = (
    "doc_id long, sample_rate long, n_samples long, n_channels long, "
    "sum_abs long, s_first long, s_last long"
)


WAV_ENERGY_SCHEMA = (
    "doc_id long, n_samples long, energy long, peak long, n_loud long"
)


def wav_energy_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    loud_threshold: int = 1000,
) -> DataFrame:
    """Loudness profile of REAL decoded WAV clips — the audio quality
    signal a curation pass buckets on (silence / clipping detection).
    All-integer outputs: energy = Σ v² (int16 samples, exact in
    int64), peak = max |v|, n_loud = count of samples at or above the
    threshold — so the SQL oracle that replays the sample-generation
    rule value-matches with no float discipline.  Map-side only, one
    row out per clip regardless of length."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                s, _rate = decode_wav(bytes(payload))
                flat = s.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        int(doc_id),
                        int(flat.size),
                        int((flat * flat).sum()),
                        int(np.abs(flat).max()),
                        int((np.abs(flat) >= loud_threshold).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "energy", "peak", "n_loud"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=WAV_ENERGY_SCHEMA)


def wav_decode_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode REAL WAV payloads and emit integer sample statistics —
    the audio leg of the real-codec tier."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                s, rate = decode_wav(bytes(payload))
                flat = s.reshape(-1)
                rows.append(
                    (
                        doc_id,
                        rate,
                        s.shape[0],
                        s.shape[1],
                        int(np.abs(flat).sum()),
                        int(flat[0]),
                        int(flat[-1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "n_samples",
                    "n_channels",
                    "sum_abs",
                    "s_first",
                    "s_last",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=WAV_FEATURE_SCHEMA)


def synth_png_payloads(
    df: DataFrame, id_col: str = "doc_id", out_col: str = "payload"
) -> DataFrame:
    """Deterministic REAL-PNG payload builder for testing the codec at
    scale: pixel(i) = (doc_id·31 + i·7) mod 256 over a
    (8 + doc_id mod 8) × (16 + doc_id mod 16) grayscale grid, written
    through ``encode_png`` with filter type ``doc_id mod 5`` — every
    scanline filter is exercised across the corpus. The generation rule
    (not the bytes) is what a SQL oracle replays, so a value match
    proves encode→decode fidelity end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                h, w = 8 + d % 8, 16 + d % 16
                i = np.arange(h * w, dtype=np.int64)
                px = ((d * 31 + i * 7) % 256).astype(np.uint8).reshape(h, w)
                payloads.append(encode_png(px, filter_type=d % 5))
            yield pd.DataFrame({"doc_id": pdf[id_col].values, out_col: payloads})

    return df.select(id_col).mapInPandas(run, schema=f"{id_col} long, {out_col} binary")


def resize_png_nearest(
    df: DataFrame,
    target_h: int,
    target_w: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize REAL PNG payloads to ``target_h × target_w`` by
    nearest-neighbor sampling and re-encode — the resize leg of the
    multimodal tier (decode / feature-extract / resize / frame-sample),
    with the decode→transform→encode round-trip all inside one
    Arrow-batched ``mapInPandas`` pass.

    Index map is pure integer arithmetic so an SQL oracle can replay it
    exactly: output pixel (y, x) reads source pixel
    (``(y·H) // target_h``, ``(x·W) // target_w``) — floor mapping,
    which both up- and down-samples (each source pixel is dropped or
    replicated, never blended, so uint8 values pass through exactly).

    Scale shape: per-row work bounded by payload size, no shuffle at
    all — the op is a map-side projection over the binary column; on a
    cluster it parallelizes by input partition like any scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf[payload_col]:
                px = decode_png(bytes(payload))
                h, w, ch = px.shape
                ys = (np.arange(target_h, dtype=np.int64) * h) // target_h
                xs = (np.arange(target_w, dtype=np.int64) * w) // target_w
                out = px[np.ix_(ys, xs)]
                if ch == 1:
                    out = out[:, :, 0]
                payloads.append(encode_png(out, filter_type=0))
            yield pd.DataFrame({id_col: pdf[id_col].values, payload_col: payloads})

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, {payload_col} binary"
    )


def resample_wav_nearest(
    df: DataFrame,
    target_rate: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resample REAL WAV payloads to ``target_rate`` Hz by
    nearest-neighbor (zero-order-hold) sample selection and re-encode —
    the audio resize leg of the multimodal tier, mirroring
    ``resize_png_nearest``'s contract: the decode → resample → encode
    round-trip runs inside one Arrow-batched ``mapInPandas`` pass, and
    the index map is pure integer arithmetic an SQL oracle can replay
    exactly.  Output length ``n_out = max((n·target_rate) // src_rate,
    1)`` and output sample ``i`` reads source sample ``(i·n) // n_out``
    — floor mapping, so int16 values are dropped or replicated, never
    interpolated (a production pipeline would low-pass before
    downsampling; value parity is the point here).

    Scale shape: per-row work bounded by payload size, zero shuffle —
    a map-side projection over the binary column, parallel by input
    partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf[payload_col]:
                s, rate = decode_wav(bytes(payload))
                n = s.shape[0]
                n_out = max((n * target_rate) // rate, 1)
                js = (np.arange(n_out, dtype=np.int64) * n) // n_out
                out = s[js]
                if out.shape[1] == 1:
                    out = out[:, 0]
                payloads.append(encode_wav(out.astype(np.int16), target_rate))
            yield pd.DataFrame({id_col: pdf[id_col].values, payload_col: payloads})

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, {payload_col} binary"
    )


def synth_wav_payloads(
    df: DataFrame, id_col: str = "doc_id", out_col: str = "payload"
) -> DataFrame:
    """Deterministic REAL-WAV payload builder: sample(i) =
    ((doc_id·131 + i·17) mod 2048) − 1024 over 64 + doc_id mod 64
    mono samples at rate 8000·(1 + doc_id mod 3)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n = 64 + d % 64
                i = np.arange(n, dtype=np.int64)
                s = ((d * 131 + i * 17) % 2048) - 1024
                payloads.append(encode_wav(s.astype(np.int16), 8000 * (1 + d % 3)))
            yield pd.DataFrame({"doc_id": pdf[id_col].values, out_col: payloads})

    return df.select(id_col).mapInPandas(run, schema=f"{id_col} long, {out_col} binary")


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) — the real uncompressed video interchange format
# (what ffmpeg/x264 pipe to each other); completes the real-codec
# triple: PNG (image), WAV (audio), Y4M (video)
# ---------------------------------------------------------------------------

def encode_y4m(frames: "np.ndarray", fps: int = 25) -> bytes:
    """Encode (N, H, W) uint8 luma frames as a real YUV4MPEG2 stream
    (4:2:0: chroma planes at quarter size, fixed 128 = neutral). H and W
    must be even (4:2:0 subsampling)."""
    f = np.asarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    if h % 2 or w % 2:
        raise ValueError("Y4M 4:2:0 needs even dimensions")
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()
    chroma = bytes([128]) * ((h // 2) * (w // 2))
    out = bytearray(header)
    for i in range(n):
        out += b"FRAME\n"
        out += f[i].tobytes()
        out += chroma + chroma  # U then V planes
    return bytes(out)


def decode_y4m(data: bytes):
    """Parse a YUV4MPEG2 stream: header tags (W/H/F/C), FRAME markers,
    planar YUV — returns (luma frames (N, H, W) uint8, width, height,
    fps_num). Supports C420 (and C420jpeg/C420mpeg2 aliases); anything
    else raises."""
    if not data.startswith(b"YUV4MPEG2") or b"\n" not in data:
        raise ValueError("not a Y4M stream")
    nl = data.index(b"\n")
    head = data[:nl].decode("ascii", "strict")
    w = h = fps = None
    colorspace = "C420"
    for tag in head.split()[1:]:
        if tag[0] == "W":
            w = int(tag[1:])
        elif tag[0] == "H":
            h = int(tag[1:])
        elif tag[0] == "F":
            fps = int(tag[1:].split(":")[0])
        elif tag[0] == "C":
            colorspace = tag
    if w is None or h is None:
        raise ValueError("missing W/H in Y4M header")
    if not colorspace.startswith("C420"):
        raise ValueError(f"unsupported colorspace {colorspace}")
    luma_size = w * h
    frame_size = luma_size + 2 * (w // 2) * (h // 2)
    pos, frames = nl + 1, []
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad FRAME marker")
        pos = fnl + 1
        frames.append(
            np.frombuffer(data, np.uint8, luma_size, pos).reshape(h, w)
        )
        pos += frame_size
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), w, h, fps


Y4M_FEATURE_SCHEMA = (
    "doc_id long, width long, height long, n_frames long, fps long, "
    "sum_luma long, frame0_sum long, last_frame_sum long"
)


def y4m_decode_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode REAL Y4M payloads and emit integer luma statistics — the
    video leg of the real-codec tier, same mapInPandas contract as the
    PNG/WAV featurizers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                frames, w, h, fps = decode_y4m(bytes(payload))
                flat = frames.astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        frames.shape[0],
                        fps,
                        int(flat.sum()),
                        int(flat[0].sum()) if len(frames) else 0,
                        int(flat[-1].sum()) if len(frames) else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_frames", "fps",
                    "sum_luma", "frame0_sum", "last_frame_sum",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=Y4M_FEATURE_SCHEMA)


def resample_y4m_fps(
    df: DataFrame,
    target_fps: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Temporal resample of REAL Y4M payloads to ``target_fps`` by
    nearest-frame selection — the video resize leg, completing the
    per-modality triple (image spatial / audio rate / video temporal)
    with the SAME exact-integer index-map contract: output length
    ``n_out = max((n·target_fps) // src_fps, 1)`` and output frame ``j``
    reads source frame ``(j·n) // n_out`` — frames are dropped or
    replicated, never blended, so luma bytes pass through exactly and
    an SQL oracle replays pixel-rule ∘ frame-map.  Decode → select →
    re-encode runs in one Arrow-batched ``mapInPandas`` pass; zero
    shuffle, parallel by input partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf[payload_col]:
                frames, w, h, fps = decode_y4m(bytes(payload))
                n = frames.shape[0]
                n_out = max((n * target_fps) // fps, 1)
                js = (np.arange(n_out, dtype=np.int64) * n) // n_out
                payloads.append(encode_y4m(frames[js], fps=target_fps))
            yield pd.DataFrame({id_col: pdf[id_col].values, payload_col: payloads})

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, {payload_col} binary"
    )


def synth_y4m_payloads(
    df: DataFrame, id_col: str = "doc_id", out_col: str = "payload"
) -> DataFrame:
    """Deterministic REAL-Y4M payload builder: per doc a
    (2 + id%4)-frame clip of (8 + 2·(id%4)) × (16 + 2·(id%8)) luma with
    pixel(f, i) = (id·17 + f·29 + i·3) mod 256 at fps 24 + id%2 —
    replayable by a SQL oracle from the rule alone."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n, h, w = 2 + d % 4, 8 + 2 * (d % 4), 16 + 2 * (d % 8)
                i = np.arange(h * w, dtype=np.int64)
                frames = np.stack(
                    [
                        ((d * 17 + f * 29 + i * 3) % 256)
                        .astype(np.uint8)
                        .reshape(h, w)
                        for f in range(n)
                    ]
                )
                payloads.append(encode_y4m(frames, fps=24 + d % 2))
            yield pd.DataFrame({"doc_id": pdf[id_col].values, out_col: payloads})

    return df.select(id_col).mapInPandas(run, schema=f"{id_col} long, {out_col} binary")


def y4m_scene_deltas(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Frame-differencing over REAL Y4M payloads: for every consecutive
    frame pair emit the summed absolute luma delta — the raw signal a
    scene-cut detector thresholds.  Same Arrow-batched mapInPandas
    contract as the other codec featurizers; all outputs exact integers
    (|a − b| of uint8 luma in int64), so a SQL oracle can replay the
    synthetic pixel rule bit-for-bit."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                frames, w, h, _fps = decode_y4m(bytes(payload))
                a = frames.astype(np.int64)
                for f in range(a.shape[0] - 1):
                    rows.append(
                        (
                            int(doc_id),
                            f,
                            int(np.abs(a[f + 1] - a[f]).sum()),
                            w * h,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "f_from", "delta_sum", "n_pixels"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        schema=f"{id_col} long, f_from long, delta_sum long, n_pixels long",
    )


def wav_silence_stats(
    df: DataFrame,
    threshold: int = 256,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Silence segmentation over REAL WAV payloads: run-length stats of
    |sample| < threshold — the voice-activity-detection primitive.
    Exact integers throughout (int16 samples, integer counts), so a
    SQL gaps-and-islands replay of the synthetic sample rule matches
    bit-for-bit.  Same Arrow-batched mapInPandas contract as the other
    codec featurizers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, _rate = decode_wav(bytes(payload))
                # (N, C) → flat mono stream (synth payloads are C=1)
                s = np.asarray(samples, dtype=np.int64).ravel()
                sil = (np.abs(s) < threshold).astype(np.int8)
                # run-length encode the silent mask
                n_silent = int(sil.sum())
                if n_silent == 0:
                    rows.append((int(doc_id), len(s), 0, 0, 0))
                    continue
                edges = np.diff(np.concatenate(([0], sil, [0])))
                starts = np.flatnonzero(edges == 1)
                ends = np.flatnonzero(edges == -1)
                lens = ends - starts
                rows.append(
                    (
                        int(doc_id),
                        len(s),
                        n_silent,
                        len(lens),
                        int(lens.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_samples", "n_silent", "n_runs", "longest_run"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        schema=(
            f"{id_col} long, n_samples long, n_silent long, "
            "n_runs long, longest_run long"
        ),
    )


def png_gradient_energy(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Spatial gradient energy over REAL PNG payloads: Σ|∂x| and Σ|∂y|
    of the decoded grayscale grid — the blur/texture primitive (flat or
    blurred images score low, sharp detail scores high), the image leg
    of the segmentation set (video: scene cuts, audio: silence runs).
    Exact integers (uint8 pixels diffed in int64); a SQL oracle replays
    the synthetic pixel rule with index arithmetic."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                px = decode_png(bytes(payload)).astype(np.int64)
                if px.ndim == 3:  # (H, W, C) → grayscale synth is C=1
                    px = px[:, :, 0]
                h, w = px.shape
                gx = int(np.abs(np.diff(px, axis=1)).sum())
                gy = int(np.abs(np.diff(px, axis=0)).sum())
                rows.append((int(doc_id), h, w, gx, gy))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "height", "width", "grad_x_sum", "grad_y_sum"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        schema=(
            f"{id_col} long, height long, width long, "
            "grad_x_sum long, grad_y_sum long"
        ),
    )
