"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

Decode is REAL for uncompressed container formats — pure-numpy codecs
with zero extra dependencies (this container has no PIL/soundfile):
  - PPM P6 (binary 8-bit RGB) — `decode_image` / `encode_ppm`
  - BMP 24-bit uncompressed (BI_RGB, bottom-up or top-down,
    4-byte row padding, BGR order) — `decode_image`
  - WAV PCM (RIFF chunk walk, 16-bit signed or 8-bit unsigned) —
    `decode_audio` / `encode_wav_pcm16`
  - PNG 8-bit RGB/RGBA non-interlaced (stdlib zlib inflate + all five
    RFC 2083 scanline filters) — `decode_image`
  - JPEG baseline sequential DCT (stdlib-only Huffman + IDCT +
    YCbCr→RGB) — `decode_image`
Remaining compressed formats (progressive JPEG/MP3/H.264) DISPATCH to
the optional dependencies when importable — PIL for images, soundfile
for audio — and surface honestly as decode_ok=false where those libs
are absent (this container). The pure-python paths always run FIRST,
so environments without the libs behave byte-identically to before,
and environments with them only gain formats the built-ins reject. The
Spark-side contract that matters at 100 TB — schema, batch shape,
partition sizing, the Arrow mapInPandas exchange — is identical for
every path.

Layout convention (one row per media object):
    media_id   bigint
    modality   string            ('image' | 'audio' | 'video')
    content    binary            (the encoded bytes, or null if external)
    uri        string            (object-store pointer when content is null)
    meta       string JSON       (width/height/sample_rate/... as produced)

Reference analog: the engine-boundary parsing discipline of
sp/input/SlsParser.java:13-303 (bytes → typed columns at the source
edge, malformed input surfaced per-row rather than failing the job).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("uri", T.StringType(), True),
        T.StructField("meta", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


# ---------------------------------------------------------------------------
# pure-numpy codecs (no PIL/soundfile in this container)
# ---------------------------------------------------------------------------


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _optional_pil():
    """PIL.Image when importable, else None — the optional-dependency
    seam for formats the pure-python codecs reject (progressive JPEG,
    GIF, WebP, ...). Mirrors the Kafka-jar waiver pattern: the dispatch
    is always wired; the test for it env-skips where PIL is absent."""
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency

        return Image
    except ImportError:
        return None


def _optional_soundfile():
    """soundfile when importable, else None (non-PCM audio dispatch)."""
    try:
        import soundfile  # noqa: PLC0415 — optional dependency

        return soundfile
    except ImportError:
        return None


def decode_image(content: bytes) -> np.ndarray:
    """Decode PPM P6, 24-bit uncompressed BMP, 8-bit RGB/RGBA PNG
    (non-interlaced), or baseline sequential JPEG → (h, w, 3) uint8 RGB
    via the built-in pure-python codecs; any format they reject falls
    through to PIL when importable.

    Raises NotImplementedError only when no path can decode — the
    caller surfaces that per-row as decode_ok=false."""
    try:
        if content[:2] == b"P6":
            return _decode_ppm(content)
        if content[:2] == b"BM":
            return _decode_bmp(content)
        if content[:8] == PNG_SIGNATURE:
            return _decode_png(content)
        if content[:2] == b"\xff\xd8":
            from table_computing_spark.operators.jpeg import decode_jpeg

            return decode_jpeg(content)
        raise NotImplementedError(
            "image codec: PPM P6, BMP24, PNG (8-bit RGB/RGBA), baseline JPEG built in"
        )
    except NotImplementedError:
        pil = _optional_pil()
        if pil is None:
            raise
        import io

        with pil.open(io.BytesIO(content)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _decode_png(content: bytes) -> np.ndarray:
    """Real PNG decode, stdlib-only: chunk walk → zlib inflate →
    per-scanline de-filter (all five filter types, RFC 2083 §6).
    Supports bit depth 8, color types 2 (RGB) and 6 (RGBA; alpha is
    dropped after de-filtering), no interlace."""
    import zlib

    pos, w, h, color_type, idat = 8, None, None, None, []
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color_type not in (2, 6) or interlace != 0:
                raise NotImplementedError(
                    "PNG: only 8-bit RGB/RGBA non-interlaced is built in"
                )
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise NotImplementedError("PNG: missing IHDR/IDAT")
    bpp = 3 if color_type == 2 else 4  # bytes per pixel
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) < h * (stride + 1):
        raise NotImplementedError("PNG: truncated pixel data")
    lines = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype, line = lines[y, 0], lines[y, 1:].astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need the running left pixel
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0  # left
                b = prev[x]  # up
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) >> 1
                elif ftype == 4:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise NotImplementedError(f"PNG: unknown filter {ftype}")
                cur[x] = (line[x] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    pixels = out.reshape(h, w, bpp)
    return pixels[:, :, :3].copy()


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG encoder (8-bit RGB, filter 0, one IDAT) — stdlib
    zlib, deterministic output for test fixtures."""
    import zlib

    arr = np.ascontiguousarray(arr.astype(np.uint8))
    h, w = arr.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _decode_ppm(content: bytes) -> np.ndarray:
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster
    # '#' comments may appear inside the header whitespace
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255 (16-bit) not supported")
    raster = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


def _decode_bmp(content: bytes) -> np.ndarray:
    data_offset = struct.unpack_from("<I", content, 10)[0]
    w = struct.unpack_from("<i", content, 18)[0]
    h = struct.unpack_from("<i", content, 22)[0]
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("BMP: only 24bpp BI_RGB is built in")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        content, dtype=np.uint8, count=row_bytes * h, offset=data_offset
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr.astype(np.uint8)
    ).tobytes()


def decode_audio(content: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV PCM → ((n_samples, channels) float32 in [-1, 1],
    sample_rate) via the built-in RIFF walker; formats it rejects
    (MP3/FLAC/OGG/float WAV) fall through to soundfile when
    importable, else NotImplementedError → decode_ok=false."""
    try:
        return _decode_wav_pcm(content)
    except NotImplementedError:
        sf = _optional_soundfile()
        if sf is None:
            raise
        import io

        samples, rate = sf.read(io.BytesIO(content), dtype="float32",
                                always_2d=True)
        return samples, int(rate)


def _decode_wav_pcm(content: bytes) -> tuple[np.ndarray, int]:
    """The pure-python path: RIFF chunk walk (fmt may not be first);
    16-bit signed and 8-bit unsigned PCM supported."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise NotImplementedError("audio codec: only RIFF/WAVE PCM is built in")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    audio_format, channels = struct.unpack_from("<HH", fmt, 0)
    sample_rate = struct.unpack_from("<I", fmt, 4)[0]
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format != 1:
        raise NotImplementedError("WAV: only PCM (format 1) is built in")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV: {bits}-bit PCM not supported")
    return samples.reshape(-1, channels), sample_rate


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 (n,) or (n, ch) samples → minimal RIFF/WAVE PCM16 bytes."""
    s = np.asarray(samples, dtype="<i2")
    ch = 1 if s.ndim == 1 else s.shape[1]
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize, floor mapping: src = (dst * in) // out —
    deterministic integer arithmetic (oracle-reproducible)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]


def encode_bmp24(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → standard bottom-up 24bpp BI_RGB BMP
    (BGR byte order, rows padded to 4 bytes)."""
    h, w = arr.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    raster = np.zeros((h, row_bytes), dtype=np.uint8)
    raster[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, RGB→BGR
    data = raster.tobytes()
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return file_header + info_header + data


def _decode_stub(content: bytes | None, modality: str) -> list[float] | None:
    """Deterministic fallback decoder for RAW (container-less) payloads:
    8 bytes → 8 floats. Container formats take the real codec path in
    `_feature_vector`; this keeps byte-blob media flowing with a stable
    feature contract instead of dying on a format guess.

    Raises NotImplementedError for modalities we don't fake."""
    if content is None:
        return None
    if modality in ("image", "audio"):
        head = content[:8].ljust(8, b"\0")
        return [float(b) / 255.0 for b in head]
    raise NotImplementedError(f"decode for modality {modality!r} needs a real codec")


def _feature_vector(content: bytes | None, modality: str) -> list[float] | None:
    """Real-decode path first (PPM/BMP/PNG pixels, WAV samples → 8-dim
    feature), falling back to the byte-stub for container-less blobs.
    NotImplementedError still propagates for modalities with neither
    path (video without a frame codec)."""
    if content is None:
        return None
    if modality == "image" and (
        content[:2] in (b"P6", b"BM", b"\xff\xd8") or content[:8] == PNG_SIGNATURE
    ):
        arr = decode_image(content)
        h, w = arr.shape[:2]
        p00 = arr[0, 0].astype(np.float64) / 255.0
        pc = arr[h // 2, w // 2].astype(np.float64) / 255.0
        return [w / 255.0, h / 255.0, *p00.tolist(), *pc.tolist()]
    if modality == "audio" and content[:4] == b"RIFF":
        samples, rate = decode_audio(content)
        mono = samples.mean(axis=1)
        n = len(mono)
        return [
            n / 1e6,
            rate / 1e6,
            float(mono.mean()) if n else 0.0,
            float(np.sqrt(np.mean(mono**2))) if n else 0.0,
            float(mono.min()) if n else 0.0,
            float(mono.max()) if n else 0.0,
            float(np.mean(np.abs(np.diff(np.sign(mono))) > 0)) if n > 1 else 0.0,
            n / rate if rate else 0.0,
        ]
    return _decode_stub(content, modality)


def extract_features(df: DataFrame, batch_size: int = 1024) -> DataFrame:
    """content → fixed-width feature vector via Arrow-batched
    mapInPandas. Each batch stays columnar until the decode loop; output
    schema is declared so downstream plans don't depend on Python."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else None),
            }
            feats, ok = [], []
            for content, modality in zip(pdf["content"], pdf["modality"]):
                try:
                    f = _feature_vector(content, modality)
                    feats.append(f)
                    ok.append(f is not None)
                except NotImplementedError:
                    feats.append(None)
                    ok.append(False)
            out["feature"] = feats
            out["decode_ok"] = ok
            yield pd.DataFrame(out)

    return df.mapInPandas(_map, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize: binary in → binary out + updated meta.

    REAL pixel work for PPM/BMP inputs (decode_image → nearest-neighbor
    resize_nearest → encode_ppm, pure numpy); other formats surface as
    resize_ok=false via NotImplementedError — swap `_resize_real` for
    PIL `Image.open(BytesIO(b)).resize((w,h))` to widen coverage.
    Output containers are PPM regardless of input (resize is a
    normalization step in a training pipeline)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("modality", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("meta", T.StringType(), True),
            T.StructField("resize_ok", T.BooleanType(), False),
        ]
    )

    def _resize_real(content: bytes, w: int, h: int) -> bytes:
        return encode_ppm(resize_nearest(decode_image(content), w, h))

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json as _json

        for pdf in batches:
            out_content, out_meta, ok = [], [], []
            for content, modality, meta in zip(
                pdf["content"], pdf["modality"], pdf["meta"]
            ):
                try:
                    if modality != "image" or content is None:
                        raise NotImplementedError
                    resized = _resize_real(content, width, height)
                    m = _json.loads(meta) if meta else {}
                    m.update({"w": width, "h": height})
                    out_content.append(resized)
                    out_meta.append(_json.dumps(m))
                    ok.append(True)
                except NotImplementedError:
                    out_content.append(content)
                    out_meta.append(meta)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "content": out_content,
                    "meta": out_meta,
                    "resize_ok": ok,
                }
            )

    return df.mapInPandas(_map, schema=out_schema)


def _ppm_header(content: bytes, base: int = 0) -> "tuple[int, int, int]":
    """Parse one PPM P6 header starting at `base` → (w, h, raster_off).
    Handles '#' comments inside header whitespace, like _decode_ppm."""
    pos, fields = base + 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    return fields[0], fields[1], pos + 1  # w, h, raster offset


def split_ppm_stream(content: bytes) -> "list[bytes]":
    """REAL multi-frame container parse: a 'PPM stream' video is a
    concatenation of standalone P6 frames (the uncompressed analog of
    an MJPEG stream). Returns each frame as its own decodable PPM
    blob."""
    frames, pos = [], 0
    while pos < len(content) and content[pos : pos + 2] == b"P6":
        w, h, off = _ppm_header(content, pos)
        end = off + w * h * 3
        if end > len(content):
            raise NotImplementedError("PPM stream: truncated frame")
        frames.append(content[pos:end])
        pos = end
    return frames


def sample_frames(df: DataFrame, every_n: int = 30, max_frames: int = 8) -> DataFrame:
    """Video frame sampling: one video row → up to `max_frames` frame
    rows (media_id, frame_idx, frame binary).

    REAL path: content starting with 'P6' parses as a PPM stream
    (concatenated standalone frames — the uncompressed analog of
    MJPEG) and every `every_n`-th frame is emitted as its own
    decodable PPM blob, so video → frames → decode_image/image_dhash
    composes end to end. Compressed containers (mp4/mkv) would slot in
    via pyav/ffmpeg keyframe extraction behind the same contract; for
    unknown payloads the deterministic 4-byte-slice stub remains (the
    one-to-many Arrow fan-out is the real contract either way)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, modality, content in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                if modality != "video" or content is None:
                    continue
                content = bytes(content)
                if content[:2] == b"P6":
                    all_frames = split_ppm_stream(content)
                else:
                    all_frames = [
                        content[fi * 4 : fi * 4 + 4]
                        for fi in range(max(len(content) // 4, 0))
                    ]
                for j, fi in enumerate(range(0, len(all_frames), every_n)):
                    if j >= max_frames:
                        break
                    ids.append(media_id)
                    idxs.append(fi)
                    frames.append(all_frames[fi])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(_map, schema=out_schema)


DECODE_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("px_r", T.IntegerType(), True),
        T.StructField("px_g", T.IntegerType(), True),
        T.StructField("px_b", T.IntegerType(), True),
        T.StructField("rs_r", T.IntegerType(), True),
        T.StructField("rs_g", T.IntegerType(), True),
        T.StructField("rs_b", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("s5", T.IntegerType(), True),
        T.StructField("decode_ok", T.IntegerType(), False),
    ]
)


def decode_probe(df: DataFrame, resize_to: tuple[int, int] = (4, 3)) -> DataFrame:
    """Run the REAL codecs end-to-end and emit integer-exact probes the
    value-hash oracle can reproduce analytically:

    images (PPM/BMP): parsed (w, h); pixel (y=1, x=2) RGB; and the
    (x=1, y=1) pixel of a `resize_to`-nearest-neighbor resize — this
    exercises decode_image + resize_nearest including BMP bottom-up row
    order and 4-byte padding.
    audio (WAV): sample count, rate, and raw int16 of sample index 5
    (decode_audio returns float in [-1,1]; s5 recovers round(f*32768)).

    Unknown formats → all-null probes with decode_ok=0 (per-row honesty,
    the SlsParser boundary discipline)."""
    rw, rh = resize_to

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                row = {
                    "media_id": media_id, "kind": "unknown",
                    "w": None, "h": None, "px_r": None, "px_g": None,
                    "px_b": None, "rs_r": None, "rs_g": None, "rs_b": None,
                    "n_samples": None, "sample_rate": None, "s5": None,
                    "decode_ok": 0,
                }
                try:
                    if content is None:
                        raise NotImplementedError
                    if content[:2] in (b"P6", b"BM"):
                        arr = decode_image(content)
                        rs = resize_nearest(arr, rw, rh)
                        row.update(
                            kind="ppm" if content[:2] == b"P6" else "bmp",
                            w=arr.shape[1], h=arr.shape[0],
                            px_r=int(arr[1, 2, 0]), px_g=int(arr[1, 2, 1]),
                            px_b=int(arr[1, 2, 2]),
                            rs_r=int(rs[1, 1, 0]), rs_g=int(rs[1, 1, 1]),
                            rs_b=int(rs[1, 1, 2]),
                            decode_ok=1,
                        )
                    elif content[:4] == b"RIFF":
                        samples, rate = decode_audio(content)
                        mono = samples[:, 0]
                        row.update(
                            kind="wav", n_samples=len(mono), sample_rate=rate,
                            s5=int(round(float(mono[5]) * 32768.0)),
                            decode_ok=1,
                        )
                except NotImplementedError:
                    pass
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_PROBE_SCHEMA.fields])

    return df.mapInPandas(_map, schema=DECODE_PROBE_SCHEMA)


def make_demo_codec_media(spark, n: int = 48) -> DataFrame:
    """Deterministic REAL-container media table: round-robin PPM (8×6),
    BMP (5×4 — odd width exercises 4-byte row padding + bottom-up
    order), WAV PCM16 (32 mono samples @ 8 kHz). Pixel (y,x) of image i
    with p = y*w + x:  R=(i+3p)%256, G=(2i+5p)%256, B=(7i+11p)%256;
    WAV sample j of row i: ((13i + 7j) % 2048) - 1024 — all
    closed-form, so the DuckDB oracle reproduces every probe."""
    rows = []
    for i in range(n):
        if i % 3 == 0:
            w, h = 8, 6
            p = np.arange(h * w).reshape(h, w)
            arr = np.stack(
                [(i + 3 * p) % 256, (2 * i + 5 * p) % 256, (7 * i + 11 * p) % 256],
                axis=-1,
            ).astype(np.uint8)
            rows.append((i, "image", encode_ppm(arr), None, '{"fmt": "ppm"}'))
        elif i % 3 == 1:
            w, h = 5, 4
            p = np.arange(h * w).reshape(h, w)
            arr = np.stack(
                [(i + 3 * p) % 256, (2 * i + 5 * p) % 256, (7 * i + 11 * p) % 256],
                axis=-1,
            ).astype(np.uint8)
            rows.append((i, "image", encode_bmp24(arr), None, '{"fmt": "bmp"}'))
        else:
            j = np.arange(32)
            samples = ((13 * i + 7 * j) % 2048 - 1024).astype(np.int16)
            rows.append((i, "audio", encode_wav_pcm16(samples, 8000), None, '{"fmt": "wav"}'))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def audio_spectrum(df: DataFrame) -> DataFrame:
    """Real spectral analysis per audio row: WAV PCM decode → mono →
    numpy rFFT → dominant non-DC frequency bin. Output (media_id,
    n_samples, sample_rate, dominant_bin, dominant_hz, decode_ok) —
    the feature a pipeline uses for tone/music/speech routing and
    silence detection.

    Scale shape: Arrow-batched mapInPandas, O(n log n) per clip, zero
    shuffle. Non-WAV/undecodable rows surface as decode_ok=false."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_samples", T.IntegerType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("dominant_bin", T.IntegerType(), True),
            T.StructField("dominant_hz", T.DoubleType(), True),
            T.StructField("decode_ok", T.BooleanType(), False),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                row = {
                    "media_id": mid, "n_samples": None, "sample_rate": None,
                    "dominant_bin": None, "dominant_hz": None, "decode_ok": False,
                }
                try:
                    if content is None:
                        raise NotImplementedError
                    samples, rate = decode_audio(bytes(content))
                    mono = samples.mean(axis=1).astype(np.float64)
                    n = len(mono)
                    if n >= 2:
                        spec = np.abs(np.fft.rfft(mono))
                        k = int(np.argmax(spec[1:])) + 1  # skip DC
                        row.update(
                            n_samples=n, sample_rate=rate, dominant_bin=k,
                            dominant_hz=k * rate / n, decode_ok=True,
                        )
                except NotImplementedError:
                    pass
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(_map, schema=out_schema)


def image_dhash(df: DataFrame, hash_w: int = 8, hash_h: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash) per image — the standard
    image near-dup fingerprint: decode → nearest-resize to
    (hash_w+1) x hash_h → grayscale → bit (y,x) = 1 iff the pixel
    right of (y,x) is brighter. Brightness-shift invariant, robust to
    rescaling; identical scenes at different exposures collide, so a
    hash-equality groupBy IS the image dedup (Hamming-near pairs via
    the same chunk-blocking simhash_pairs uses).

    Output (media_id, dhash, decode_ok) — dhash a 64-bit signed long
    for hash_w = hash_h = 8. Arrow-batched mapInPandas, zero shuffle."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("dhash", T.LongType(), True),
            T.StructField("decode_ok", T.BooleanType(), False),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                row = {"media_id": mid, "dhash": None, "decode_ok": False}
                try:
                    if content is None:
                        raise NotImplementedError
                    arr = decode_image(bytes(content))
                    small = resize_nearest(arr, hash_w + 1, hash_h)
                    gray = small.astype(np.int32).mean(axis=2)
                    bits = (gray[:, 1:] > gray[:, :-1]).astype(np.uint64).ravel()
                    h = np.uint64(0)
                    for b, bit in enumerate(bits):
                        h |= bit << np.uint64(b)
                    row.update(dhash=int(h.astype(np.int64)), decode_ok=True)
                except NotImplementedError:
                    pass
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(_map, schema=out_schema)


def make_demo_gradient_media(spark, n: int = 48) -> DataFrame:
    """Deterministic 9x8 gradient images for the dHash oracle: image i
    has per-row slope sign taken from bit (y % 4) of (i % 16), and a
    brightness offset that varies with i // 16. dHash depends only on
    the slope-sign pattern, so images group exactly by i % 16 —
    closed-form group structure through the REAL decode+resize+hash
    path."""
    w, h = 9, 8
    rows = []
    for i in range(n):
        pattern, base = i % 16, 100 + (i // 16) * 7
        g = np.zeros((h, w), dtype=np.int32)
        for y in range(h):
            d = 6 if (pattern >> (y % 4)) & 1 else -6
            g[y] = base + np.arange(w) * d
        arr = np.clip(g, 0, 255).astype(np.uint8)[:, :, None].repeat(3, axis=2)
        rows.append((i, "image", encode_ppm(arr), None, '{"fmt": "ppm"}'))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def make_demo_video_media(spark, n: int = 12, n_frames: int = 10) -> DataFrame:
    """Deterministic PPM-stream videos: frame f of video i is 4x3 with
    pixel (y, x, c) = (9i + 5f + 7(y*4+x) + 11c) % 256 — closed-form,
    so sampled frames decode to analytically known pixels."""
    w, h = 4, 3
    yy, xx, cc = np.meshgrid(np.arange(h), np.arange(w), np.arange(3), indexing="ij")
    rows = []
    for i in range(n):
        stream = b"".join(
            encode_ppm(
                ((9 * i + 5 * f + 7 * (yy * w + xx) + 11 * cc) % 256).astype(np.uint8)
            )
            for f in range(n_frames)
        )
        rows.append((i, "video", stream, None, '{"fmt": "ppm-stream"}'))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def make_demo_tone_media(spark, n: int = 24) -> DataFrame:
    """Deterministic pure-tone WAV table: clip i is a bin-ALIGNED sine,
    frequency = (8 + i % 12) * rate/N with rate=8000, N=256 — no
    spectral leakage, so the dominant FFT bin is exactly 8 + i % 12
    and the oracle is closed-form arithmetic."""
    rate, N = 8000, 256
    j = np.arange(N)
    rows = []
    for i in range(n):
        k = 8 + i % 12
        tone = (0.4 * 32767 * np.sin(2 * np.pi * k * j / N)).astype(np.int16)
        rows.append((i, "audio", encode_wav_pcm16(tone, rate), None, '{"fmt": "wav"}'))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def make_demo_png_media(spark, n: int = 32) -> DataFrame:
    """Deterministic PNG media table: pixel (y, x, c) of image i is
    (5i + 11(y*w + x) + 3c) % 256 at w=7, h=5 — closed-form, so an
    oracle reproduces every probe through the REAL zlib decode path."""
    w, h = 7, 5
    yy, xx, cc = np.meshgrid(np.arange(h), np.arange(w), np.arange(3), indexing="ij")
    rows = []
    for i in range(n):
        arr = ((5 * i + 11 * (yy * w + xx) + 3 * cc) % 256).astype(np.uint8)
        rows.append((i, "image", encode_png(arr), None, '{"fmt": "png"}'))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def make_demo_jpeg_media(spark, n: int = 24) -> DataFrame:
    """Deterministic baseline-JPEG media table for the closed-form
    decode oracle. Image i is 16x16; block (by, bx) (idx = 2*by + bx)
    has flat color R=(7i+30+40*idx)%256, G=(13i+11+60*idx)%256,
    B=(29i+200+50*idx)%256. Even i → 4:4:4 with four distinct flat
    blocks; odd i → 4:2:0 single color (idx 0 everywhere — flat chroma
    keeps the subsampled planes DC-only, so the decode stays
    closed-form). Quant table is uniform 16, making every block's
    reconstruction exact integer arithmetic (operators/jpeg.py
    docstring spells out the chain the oracle reproduces)."""
    from table_computing_spark.operators.jpeg import encode_jpeg_baseline

    rows = []
    for i in range(n):
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        for by in range(2):
            for bx in range(2):
                idx = (2 * by + bx) if i % 2 == 0 else 0
                img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = [
                    (7 * i + 30 + 40 * idx) % 256,
                    (13 * i + 11 + 60 * idx) % 256,
                    (29 * i + 200 + 50 * idx) % 256,
                ]
        content = encode_jpeg_baseline(
            img, subsampling="444" if i % 2 == 0 else "420"
        )
        rows.append((i, "image", content, None, '{"fmt": "jpeg"}'))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def make_demo_media(spark, n: int = 64) -> DataFrame:
    """Synthesize a small media table (deterministic bytes) for tests."""
    rows = [
        (
            i,
            "image" if i % 3 == 0 else ("audio" if i % 3 == 1 else "video"),
            bytes([(i * 7 + j) % 256 for j in range(16)]) if i % 5 != 4 else None,
            None if i % 5 != 4 else f"s3://bucket/media/{i}",
            '{"w": 64, "h": 64}',
        )
        for i in range(n)
    ]
    # few partitions: 64 demo rows across 32 default slices would spawn
    # a Python worker per near-empty partition
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def make_demo_cut_video_media(spark, n: int = 12, n_frames: int = 8) -> DataFrame:
    """Deterministic PPM-stream videos with a PLANTED scene cut: video
    i shows a left-to-right brightness ramp for its first
    (i % 5) + 2 frames, then the REVERSED ramp for the rest. A ramp
    frame dHashes to all-ones, the reversed ramp to all-zeros, so the
    cut position and its Hamming distance (64) are closed-form — the
    scene-change oracle needs no pixel math."""
    w, h = 9, 8  # dhash-native geometry: resize is the identity
    up = np.repeat(
        np.repeat((np.arange(w) * 28).astype(np.uint8)[None, :, None], h, axis=0),
        3,
        axis=2,
    )
    down = up[:, ::-1, :]
    rows = []
    for i in range(n):
        cut = (i % 5) + 2
        stream = b"".join(
            encode_ppm(up if f < cut else down) for f in range(n_frames)
        )
        rows.append((i, "video", stream, None, '{"fmt": "ppm-stream"}'))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def video_scene_changes(
    df: DataFrame,
    every_n: int = 1,
    max_frames: int = 16,
    threshold: int = 10,
) -> DataFrame:
    """Scene-cut detection over binary video columns: sample frames
    (sample_frames), perceptual-hash each frame (image_dhash), then
    flag frames whose dHash sits >= `threshold` Hamming bits from the
    previous frame — the shot-boundary heuristic every video curation
    pipeline runs before per-scene dedup/captioning.

    All-Spark composition: the only Python is the two Arrow codec
    stages; the temporal part is ONE per-video lag window +
    bit_count(xor) — JVM-side, keyed, bounded frames per video.
    Output: (media_id, frame_idx, hamming, is_cut) for every sampled
    frame after its video's first; undecodable frames propagate NULL
    hamming and is_cut=false (boundary discipline). media_id must fit
    the composite packing: |id| < ~9.2e12 (id·1e6 stays a long; the
    div/pmod recovery is exact integer arithmetic either way)."""
    frames = sample_frames(df, every_n=every_n, max_frames=max_frames)
    as_media = frames.select(
        (F.col("media_id") * F.lit(1_000_000) + F.col("frame_idx")).alias("media_id"),
        F.lit("image").alias("modality"),
        F.col("frame").alias("content"),
        F.lit(None).cast("string").alias("uri"),
        F.lit("{}").alias("meta"),
    )
    # integer div/pmod: float division corrupts composite keys above
    # 2^53, and % keeps the dividend's sign for negative ids
    hashed = image_dhash(as_media).select(
        F.expr("(media_id - pmod(media_id, 1000000)) div 1000000")
        .cast("long")
        .alias("media_id"),
        F.pmod(F.col("media_id"), F.lit(1_000_000)).cast("int").alias("frame_idx"),
        "dhash",
    )
    from pyspark.sql.window import Window as W2

    w = W2.partitionBy("media_id").orderBy(F.col("frame_idx").asc())
    # materialize lag/rank BEFORE the first-frame filter: a window
    # expression placed after the filter would re-evaluate over the
    # filtered partition and lose the new first row's predecessor
    ham = F.bit_count(F.col("dhash").bitwiseXOR(F.col("__prev")))
    return (
        hashed.withColumn("__prev", F.lag("dhash").over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)  # a video's first frame has no prior
        .select(
            "media_id",
            "frame_idx",
            ham.alias("hamming"),
            F.coalesce(ham >= F.lit(threshold), F.lit(False)).alias("is_cut"),
        )
    )
