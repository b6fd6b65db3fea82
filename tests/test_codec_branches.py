"""Env-gated compressed-codec branches (PIL images, ffmpeg audio/video):
unit-tested where the library exists, env-skipped otherwise; the GATING
itself (clear NotImplementedError, pure-numpy paths unaffected) is
asserted in every environment."""

import shutil

import numpy as np
import pytest

from moc_indexer_spark.operators.multimodal import (
    decode_audio_wav,
    decode_image,
    encode_ppm,
    ffmpeg_decode_audio,
    ffmpeg_transcode_to_y4m,
    parse_y4m_header,
)

try:
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

HAVE_FFMPEG = shutil.which("ffmpeg") is not None


# --- gating behavior: runs in EVERY environment ------------------------------


@pytest.mark.skipif(HAVE_PIL, reason="PIL present — gate inactive")
def test_compressed_image_gate_without_pil():
    # a minimal-but-valid PNG signature — recognizably compressed format
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    # the pure-numpy path is untouched by the gate
    px = np.arange(18, dtype=np.uint8).reshape(2, 3, 3)
    w, h, got = decode_image(encode_ppm(px))
    assert (w, h) == (3, 2) and got.tobytes() == px.tobytes()


@pytest.mark.skipif(HAVE_FFMPEG, reason="ffmpeg present — gate inactive")
def test_compressed_av_gate_without_ffmpeg():
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        ffmpeg_decode_audio(b"\xff\xfb\x90\x00" + b"\x00" * 64)  # MP3 frame
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        ffmpeg_transcode_to_y4m(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64)
    # non-WAV bytes route to the (gated) ffmpeg branch
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_audio_wav(b"\xff\xfb\x90\x00" + b"\x00" * 64)


# --- real-decode behavior: runs where the library exists ---------------------


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not installed")
def test_pil_branch_decodes_png_roundtrip(tmp_path):
    import io

    from PIL import Image

    px = np.zeros((4, 6, 3), dtype=np.uint8)
    px[..., 0] = 200  # red-ish
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="PNG")
    w, h, got = decode_image(buf.getvalue())
    assert (w, h) == (6, 4)
    assert np.array_equal(got, px)


@pytest.mark.skipif(not HAVE_FFMPEG, reason="ffmpeg not on PATH")
def test_ffmpeg_branch_decodes_compressed_audio():
    # synthesize a tiny WAV, transcode it to MP2 via ffmpeg, then decode
    # the compressed bytes back through the gated branch
    import subprocess

    sr = 16000
    t = np.arange(sr // 4) / sr
    pcm = (np.sin(2 * np.pi * 440 * t) * 2**14).astype("<i2").tobytes()
    wav = (
        b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + sr.to_bytes(4, "little") + (sr * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    mp2 = subprocess.run(
        [shutil.which("ffmpeg"), "-v", "error", "-i", "pipe:0",
         "-f", "mp2", "pipe:1"],
        input=wav, stdout=subprocess.PIPE, check=True,
    ).stdout
    got_sr, ch, x = ffmpeg_decode_audio(mp2, sample_rate=sr)
    assert (got_sr, ch) == (sr, 1)
    assert len(x) > sr // 8  # decoded a substantial clip
    # non-WAV container routes through decode_audio_wav transparently
    got_sr2, ch2, _ = decode_audio_wav(mp2)
    assert (got_sr2, ch2) == (16000, 1)


@pytest.mark.skipif(not HAVE_FFMPEG, reason="ffmpeg not on PATH")
def test_ffmpeg_branch_transcodes_video_to_y4m():
    import subprocess

    # 2 frames of 16x16 yuv420p rawvideo -> mpeg1 -> back to y4m
    frame = bytes(range(256)) + b"\x80" * 128
    raw = frame * 2
    mpeg = subprocess.run(
        [shutil.which("ffmpeg"), "-v", "error", "-f", "rawvideo",
         "-pix_fmt", "yuv420p", "-s", "16x16", "-r", "5", "-i", "pipe:0",
         "-f", "mpeg1video", "pipe:1"],
        input=raw, stdout=subprocess.PIPE, check=True,
    ).stdout
    y4m = ffmpeg_transcode_to_y4m(mpeg)
    w, h, pos = parse_y4m_header(y4m)
    assert (w, h) == (16, 16)
    assert y4m[pos : pos + 5] == b"FRAME"
