"""Multimodal (image/audio/video) column plumbing for training-data
pipelines — 100 TB design, decode stubbed.

Layout: media as opaque `binary` columns + typed metadata struct; transforms
(decode / resize / feature-extract / frame-sample) are Arrow-batched
`mapInPandas` stages so bytes move executor-side in columnar batches, never
through the driver and never row-at-a-time.

Codec tiers: uncompressed formats (PPM/PGM/BMP images, RIFF PCM WAV
audio, YUV4MPEG2 video) decode FOR REAL in pure numpy; compressed
formats route through env-gated branches — PIL for images
(`decode_image`'s final branch, import-gated) and the ffmpeg CLI for
audio/video (`ffmpeg_decode_audio` / `ffmpeg_transcode_to_y4m`,
PATH-gated) — raising a clear NotImplementedError where the library is
absent so this container stays green. `decode_image_stub` additionally
offers a deterministic fake decode (fake=True) for plumbing tests.

Scale notes:
- media tables partition by (modality, bucket(content_hash)) — dedup and
  join locality for free; metadata-only queries never read bytes thanks to
  parquet column pruning.
- `spark.sql.files.maxPartitionBytes` governs batch memory: with ~1 MB
  blobs, 128 MB partitions hold ~128 rows — decode memory stays bounded.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, content binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:long>"
)

FEATURE_SCHEMA = (
    "media_id long, content_hash string, n_bytes long, "
    "width int, height int, feature array<float>"
)


def decode_image_stub(content: bytes, fake: bool = False) -> tuple[int, int, list[float]]:
    """Placeholder for the real decoder (PIL / torchvision / ffmpeg).

    fake=True: deterministic pseudo-decode from the content hash —
    byte-stable across executors, good enough to exercise the pipeline.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "swap in PIL.Image.open(io.BytesIO(content)) here"
        )
    h = hashlib.sha256(content).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feature = [b / 255.0 for b in h[:16]]
    return width, height, feature


def extract_features(
    media: DataFrame, fake_decode: bool = True, batch_hint: int = 64
) -> DataFrame:
    """Decode + feature-extract as an Arrow mapInPandas stage.

    Output keeps only metadata + features (bytes are dropped as early as
    possible — the downstream ANN/dedup operators never see blobs).
    """
    from ..session import ship_package

    # `run` captures module-level decode_image_stub BY REFERENCE: worker
    # pythons must be able to import the package even when the driver's
    # cwd isn't the repo root (e.g. the harness driver session)
    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "content_hash": [], "n_bytes": [],
                "width": [], "height": [], "feature": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                w, h, feat = decode_image_stub(raw, fake=fake_decode)
                out["media_id"].append(mid)
                out["content_hash"].append(hashlib.sha256(raw).hexdigest())
                out["n_bytes"].append(len(raw))
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def exact_media_dedup(features: DataFrame) -> DataFrame:
    """Byte-identical media dedup on the content hash (same cascade tier as
    text exact dedup): one shuffle on a uniform 256-bit key."""
    return (
        features.groupBy("content_hash")
        .agg(
            F.min("media_id").cast("bigint").alias("keeper_media_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
    )


def synthesize_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads with
    planted exact duplicates)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if i % 7 == 0 and rows:  # planted duplicate of an earlier blob
            content = rows[rng.randrange(len(rows))][2]
        else:
            content = bytes(rng.randrange(256) for _ in range(256 + i))
        rows.append(
            (i, "image", content, {"mime": "image/fake", "width": None,
                                   "height": None, "duration_ms": None})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, width int, height int, content binary"
)


def resize_images(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    fake_decode: bool = True,
) -> DataFrame:
    """Resize stage: decode -> scale to (target_w, target_h) -> re-encode,
    as one Arrow `mapInPandas` pass (binary in, binary out).

    The pixel work is stubbed like `decode_image_stub`: the fake "resized"
    payload is a deterministic digest-expansion of the source bytes sized
    proportionally to the target area, so output size/behavior is stable
    across executors and the real schema/batch plumbing is exercised.
    Swapping in PIL touches only `_fake_resize`.

    Scale note: 1 row in -> 1 row out with bounded output size; the stage
    pipelines inside the scan task (no shuffle), so resize throughput is
    pure executor CPU — exactly how a 100 TB re-encode should run.
    """

    def _fake_resize(raw: bytes) -> bytes:
        if not fake_decode:
            raise NotImplementedError(
                "image codecs not available; swap in PIL resize here"
            )
        digest = hashlib.sha256(raw).digest()
        # deterministic stand-in payload ~ (area / 64) bytes
        reps = max(1, (target_w * target_h) // (64 * len(digest)))
        return digest * reps

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "content": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                out["media_id"].append(mid)
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["content"].append(_fake_resize(bytes(content)))
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def sample_frames(
    media: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    fake_decode: bool = True,
) -> DataFrame:
    """Video frame sampling: 1 row in -> 0..max_frames rows out (every
    `every_n`-th frame), the UDTF-style fan-out of the media pipeline.

    Stubbed like the other codecs: the fake container pretends to hold
    `len(bytes) // 32` frames and each emitted frame is a deterministic
    digest of (content, frame_idx). `mapInPandas` output cardinality is
    independent of input cardinality, which is the point being tested —
    the real ffmpeg swap keeps the same signature.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                if not fake_decode:
                    raise NotImplementedError(
                        "video codecs not available; swap in ffmpeg here"
                    )
                n_frames = len(raw) // 32
                for k, idx in enumerate(range(0, n_frames, every_n)):
                    if k >= max_frames:
                        break
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame"].append(
                        hashlib.sha256(raw + idx.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


# --- REAL decode for uncompressed formats (pure numpy, no codec libs) -------


def _parse_pnm_header(content: bytes) -> tuple[int, int, int, int]:
    """Parse a binary PNM (P5/P6) header: whitespace-separated ASCII
    tokens with '#' comments legal between them. Returns
    (width, height, maxval, data_offset)."""
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while content[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    return w, h, maxval, pos


def decode_image(content: bytes):
    """Actually decode an image: PPM (P6) and uncompressed 24-bit BMP are
    parsed in pure numpy — a genuine byte->pixel path with no external
    codec library. Compressed formats (JPEG/PNG/...) still raise
    NotImplementedError (PIL belongs in that branch; this container has
    none). Returns (width, height, HxWx3 uint8 array).
    """
    import numpy as np

    if content[:2] == b"P6":
        w, h, maxval, pos = _parse_pnm_header(content)
        if maxval != 255:
            raise NotImplementedError("16-bit PPM not supported")
        px = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=pos)
        return w, h, px.reshape(h, w, 3)

    if content[:2] == b"P5":
        # grayscale PGM: same header grammar as P6, one byte per pixel —
        # replicated to 3 channels so downstream features stay uniform
        w, h, maxval, pos = _parse_pnm_header(content)
        if maxval != 255:
            raise NotImplementedError("16-bit PGM not supported")
        px = np.frombuffer(content, dtype=np.uint8, count=w * h, offset=pos)
        return w, h, np.repeat(px.reshape(h, w, 1), 3, axis=2)

    if content[:2] == b"BM":
        off = int.from_bytes(content[10:14], "little")
        w = int.from_bytes(content[18:22], "little", signed=True)
        h = int.from_bytes(content[22:26], "little", signed=True)
        bpp = int.from_bytes(content[28:30], "little")
        comp = int.from_bytes(content[30:34], "little")
        if bpp != 24 or comp != 0:
            raise NotImplementedError("only uncompressed 24-bit BMP")
        bottom_up = h > 0
        h = abs(h)
        row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
        rows = np.frombuffer(
            content, dtype=np.uint8, count=row_bytes * h, offset=off
        ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            rows = rows[::-1]
        return w, h, rows[:, :, ::-1]  # BGR -> RGB

    # compressed formats (JPEG/PNG/GIF/WEBP/...): the PIL branch, import-
    # gated so environments without codec libraries keep the pure-numpy
    # paths and a clear error — one function swap, as promised
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError:
        raise NotImplementedError(
            "compressed formats need a codec library; install Pillow to "
            "activate this branch (uncompressed PPM/PGM/BMP decode without it)"
        ) from None
    import io

    img = Image.open(io.BytesIO(content)).convert("RGB")
    px = np.asarray(img, dtype=np.uint8)
    return img.width, img.height, px


def image_histogram_feature(px, bins: int = 16):
    """Deterministic 3*bins feature: per-channel normalized histograms."""
    import numpy as np

    feats = []
    for c in range(3):
        hist, _ = np.histogram(px[:, :, c], bins=bins, range=(0, 256))
        feats.append(hist / max(1, px.shape[0] * px.shape[1]))
    return np.concatenate(feats).astype("float32")


def extract_features_real(media: DataFrame, bins: int = 16) -> DataFrame:
    """The real-decode variant of `extract_features`: PPM/BMP bytes decode
    to pixels in-executor (pure numpy) and featurize as channel
    histograms. Same Arrow mapInPandas shape, same output schema —
    proving the stub boundary is exactly one function swap."""
    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "content_hash": [], "n_bytes": [],
                "width": [], "height": [], "feature": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                w, h, px = decode_image(raw)
                out["media_id"].append(mid)
                out["content_hash"].append(hashlib.sha256(raw).hexdigest())
                out["n_bytes"].append(len(raw))
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(
                    [float(x) for x in image_histogram_feature(px, bins)]
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


# --- REAL audio decode: WAV (RIFF PCM), pure numpy --------------------------

AUDIO_FEATURE_SCHEMA = (
    "media_id long, content_hash string, sample_rate int, n_channels int, "
    "n_samples long, duration_ms long, rms double, zero_cross_rate double"
)


def _ffmpeg_path() -> str | None:
    """ffmpeg CLI if present — the env gate for every compressed
    audio/video branch (mirrors the PIL import gate for images)."""
    import shutil

    return shutil.which("ffmpeg")


def _ffmpeg_run(content: bytes, args: list[str]) -> bytes:
    """Pipe `content` through ffmpeg (stdin -> stdout, no temp files —
    executor-local, no shared state)."""
    import subprocess

    proc = subprocess.run(
        [_ffmpeg_path(), "-v", "error", "-i", "pipe:0", *args, "pipe:1"],
        input=content, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        check=False,
    )
    if proc.returncode != 0:
        raise ValueError(
            f"ffmpeg decode failed: {proc.stderr.decode(errors='replace')[:200]}"
        )
    return proc.stdout


def _ffprobe_audio_params(content: bytes) -> tuple[int, int] | None:
    """Native (sample_rate, channels) of the first audio stream via
    ffprobe, or None when ffprobe is absent / the probe fails — callers
    then fall back to the documented normalization."""
    import json
    import shutil
    import subprocess

    probe = shutil.which("ffprobe")
    if probe is None:
        return None
    proc = subprocess.run(
        [probe, "-v", "error", "-select_streams", "a:0", "-show_entries",
         "stream=sample_rate,channels", "-of", "json", "pipe:0"],
        input=content, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        check=False,
    )
    if proc.returncode != 0:
        return None
    try:
        st = json.loads(proc.stdout)["streams"][0]
        return int(st["sample_rate"]), int(st["channels"])
    except (KeyError, IndexError, ValueError):
        return None


def ffmpeg_decode_audio(
    content: bytes,
    sample_rate: int | None = None,
    channels: int | None = None,
):
    """Compressed audio (MP3/OGG/AAC/...) -> (rate, channels, float64
    array shaped (n_frames, channels) in [-1, 1]) via the ffmpeg CLI.

    Rate/channel contract (matches the WAV path): with no arguments the
    native stream parameters are preserved — ffprobe reports them and
    the decode pins them explicitly (a no-op when they match the
    stream). `sample_rate` and `channels` are independent knobs:
    passing `sample_rate` resamples deliberately and — the original
    contract, restored after a round-4 drift — yields MONO unless
    `channels` is also given, so existing resampling callers keep the
    (rate, 1, (n, 1)) shape they were written against. When both knobs
    are pinned (or sample_rate alone, implying mono) no ffprobe runs at
    all — one subprocess per blob, not two, in the mapInPandas hot
    path. Only when the native path's ffprobe is unavailable or cannot
    parse the stream does the decode fall back to 16 kHz mono — the one
    case where compressed features are normalized rather than native,
    flagged here because extract_audio_features' duration/zero-cross
    values are rate-relative. Env-gated: raises NotImplementedError
    when ffmpeg is absent so the pure-numpy WAV path stays the
    container default."""
    import numpy as np

    if _ffmpeg_path() is None:
        raise NotImplementedError(
            "compressed audio needs ffmpeg on PATH; WAV PCM decodes without it"
        )
    if sample_rate is not None:
        # caller pinned the rate: no probe needed (channel layout is the
        # caller's `channels` or the documented mono default)
        rate = sample_rate
        channels = 1 if channels is None else channels
    else:
        native = _ffprobe_audio_params(content)
        if native is not None:
            rate = native[0]
            channels = native[1] if channels is None else channels
        else:
            rate = 16000  # documented last-resort normalization
            channels = 1 if channels is None else channels
    raw = _ffmpeg_run(
        content,
        ["-f", "s16le", "-acodec", "pcm_s16le", "-ac", str(channels),
         "-ar", str(rate)],
    )
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    n_frames = len(x) // channels
    return rate, channels, x[: n_frames * channels].reshape(n_frames, channels)


def ffmpeg_transcode_to_y4m(content: bytes) -> bytes:
    """Compressed video (H.264/VP9/...) -> YUV4MPEG2 (4:2:0) bytes via
    the ffmpeg CLI, so the existing pure-numpy Y4M frame sampler handles
    every container once transcoded. Env-gated like the audio branch."""
    if _ffmpeg_path() is None:
        raise NotImplementedError(
            "compressed video needs ffmpeg on PATH; Y4M samples without it"
        )
    return _ffmpeg_run(
        content, ["-f", "yuv4mpegpipe", "-pix_fmt", "yuv420p"]
    )


def decode_audio_wav(content: bytes):
    """Parse a RIFF/WAVE file with 16-bit or 8-bit PCM samples in pure
    numpy (chunk walk: fmt then data; other chunks skipped). Returns
    (sample_rate, n_channels, float64 array shaped (n_frames, channels) in
    [-1, 1]). Compressed codecs route through the env-gated ffmpeg branch
    (`ffmpeg_decode_audio`) or raise NotImplementedError without it."""
    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        # not WAV at all — a compressed container belongs to the ffmpeg
        # branch (env-gated)
        return ffmpeg_decode_audio(content)
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = int.from_bytes(content[pos + 4 : pos + 8], "little")
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise NotImplementedError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise NotImplementedError("only PCM wav (format 1); codec needed")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:  # 8-bit wav is unsigned
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    n_frames = len(x) // n_channels
    return sample_rate, n_channels, x[: n_frames * n_channels].reshape(
        n_frames, n_channels
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """WAV bytes -> per-clip features (duration, RMS, zero-crossing rate)
    in one Arrow mapInPandas stage — the audio analog of
    extract_features_real, and the stage a 100 TB speech pipeline runs
    before silence-filtering / dedup."""
    import numpy as np

    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "content_hash", "sample_rate", "n_channels",
                "n_samples", "duration_ms", "rms", "zero_cross_rate",
            )}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                sr, nch, x = decode_audio_wav(raw)
                mono = x.mean(axis=1)
                out["media_id"].append(mid)
                out["content_hash"].append(hashlib.sha256(raw).hexdigest())
                out["sample_rate"].append(sr)
                out["n_channels"].append(nch)
                out["n_samples"].append(len(mono))
                out["duration_ms"].append(int(len(mono) * 1000 / sr) if sr else 0)
                out["rms"].append(float(np.sqrt((mono ** 2).mean())) if len(mono) else 0.0)
                zc = (
                    float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean())
                    if len(mono) > 1 else 0.0
                )
                out["zero_cross_rate"].append(zc)
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run, schema=AUDIO_FEATURE_SCHEMA
    )


# --- REAL video: Y4M (YUV4MPEG2) frame sampling, pure numpy -----------------

VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, "
    "mean_luma double, frame_hash string"
)


def parse_y4m_header(content: bytes):
    """YUV4MPEG2 header -> (width, height, header_len). Only 4:2:0 (the
    default and by far the common case) is supported; anything else
    raises."""
    nl = content.index(b"\n")
    head = content[:nl].decode("ascii", errors="strict")
    if not head.startswith("YUV4MPEG2"):
        raise NotImplementedError("not a YUV4MPEG2 stream")
    w = h = None
    for tok in head.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "C" and not tok.startswith("C420"):
            raise NotImplementedError(f"chroma {tok} unsupported (4:2:0 only)")
    if not w or not h:
        raise NotImplementedError("missing W/H in Y4M header")
    return w, h, nl + 1


def sample_y4m_frames(media: DataFrame, every_k: int = 5) -> DataFrame:
    """REAL frame sampling over uncompressed Y4M video: frames have a
    FIXED byte size (w*h*1.5 for 4:2:0 + the FRAME marker line), so the
    k-th frames are extracted by OFFSET ARITHMETIC — untouched frames are
    never even copied, which is the point of frame sampling as a
    data-pipeline primitive (for compressed containers the same stage
    seeks keyframes via the index instead; that branch needs ffmpeg and
    stays stubbed). Emits 1→N rows per clip (the UDTF fan-out shape) with
    each sampled frame's mean luma and content hash."""
    import numpy as np

    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "frame_idx", "width", "height",
                "mean_luma", "frame_hash",
            )}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                w, h, pos = parse_y4m_header(raw)
                y_size = w * h
                frame_size = y_size + (y_size // 2)  # 4:2:0 planar
                idx = 0
                while pos < len(raw):
                    nl = raw.index(b"\n", pos)  # FRAME marker (+params)
                    if not raw[pos:nl].startswith(b"FRAME"):
                        raise NotImplementedError("malformed FRAME marker")
                    body_start = nl + 1
                    if idx % every_k == 0:
                        y = np.frombuffer(
                            raw, dtype=np.uint8, count=y_size, offset=body_start
                        )
                        out["media_id"].append(mid)
                        out["frame_idx"].append(idx)
                        out["width"].append(w)
                        out["height"].append(h)
                        out["mean_luma"].append(float(y.mean()))
                        out["frame_hash"].append(
                            hashlib.sha256(
                                raw[body_start : body_start + frame_size]
                            ).hexdigest()
                        )
                    pos = body_start + frame_size
                    idx += 1
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run, schema=VIDEO_FRAME_SCHEMA
    )


def encode_ppm(px) -> bytes:
    """Re-encode an HxWx3 uint8 array as binary PPM (P6, maxval 255)."""
    h, w = px.shape[0], px.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def resize_nearest(px, out_w: int, out_h: int):
    """Nearest-neighbor resample in pure numpy (the same index math every
    codec library's NEAREST filter uses: src = floor((dst+0.5)*scale))."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    ys = np.minimum(((np.arange(out_h) + 0.5) * (h / out_h)).astype(int), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * (w / out_w)).astype(int), w - 1)
    return px[ys][:, xs]


def resize_images_real(
    media: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """The real-decode variant of `resize_images`: PPM/BMP bytes decode to
    pixels in-executor, nearest-neighbor resample, and re-encode as PPM —
    a genuine byte->pixel->byte path with no codec library. Same Arrow
    mapInPandas shape as the stub form (one function swap at the decode
    boundary); undecodable formats surface as ok=false rows rather than
    failing the batch (the PERMISSIVE posture of sources/files.py).
    Returns (media_id, ok boolean, out_bytes bigint, content binary).
    """
    import pandas as pd

    from ..session import ship_package

    # the closure captures module-level decode_image/encode_ppm/
    # resize_nearest BY REFERENCE (cloudpickle): workers that can't
    # import the package crash on deserialization without this — the
    # sibling extract_features/extract_audio_features call it too
    ship_package(media.sparkSession)

    def run(batches):
        for pdf in batches:
            ids, oks, sizes, blobs = [], [], [], []
            for media_id, raw in zip(pdf["media_id"], pdf["content"]):
                ids.append(media_id)
                try:
                    if raw is None:
                        raise ValueError("null content blob")
                    _, _, px = decode_image(bytes(raw))
                    out = encode_ppm(resize_nearest(px, out_w, out_h))
                    oks.append(True)
                    sizes.append(len(out))
                    blobs.append(out)
                except (NotImplementedError, ValueError, IndexError,
                        OSError):
                    # unknown format OR malformed bytes of a known format
                    # (truncated pixel buffer, garbage header tokens) —
                    # one bad blob must not fail the batch. OSError covers
                    # Pillow's UnidentifiedImageError (an OSError
                    # subclass) when the PIL branch is active: a corrupt
                    # compressed blob is an ok=false row, not a job kill
                    oks.append(False)
                    sizes.append(0)
                    blobs.append(b"")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "ok": oks,
                    "out_bytes": pd.Series(sizes, dtype="int64"),
                    "content": blobs,
                }
            )

    return media.select("media_id", "content").mapInPandas(
        run, "media_id bigint, ok boolean, out_bytes bigint, content binary"
    )
