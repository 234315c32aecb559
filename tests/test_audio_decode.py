"""Audio container decode: WAV (stdlib), mp3/ogg/flac (SDL2_mixer).

The reference decodes compressed audio via symphonia
(src/utils/audio_utils.rs:381-589); our host path sniffs the container and
decodes through SDL2_mixer at the stream's native rate.  Real mp3 fixtures
are taken from packages already in the image (skipped when absent).
"""

import io
import os
import wave

import numpy as np
import pytest

from aha_tpu.utils.audio import (
    float_range_normalize,
    load_audio_bytes,
    prepare_audio,
    resample,
    sniff_container,
    to_mono,
    wav_bytes,
    _native_rate,
)

MP3_FIXTURES = [p for p in (
    "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3",
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3",
) if os.path.exists(p)]


def test_sniff_container():
    wav = wav_bytes(np.zeros(100, np.float32), 16000)
    assert sniff_container(wav) == "wav"
    assert sniff_container(b"ID3\x04\x00\x00\x00\x00\x00\x00rest") == "mp3"
    assert sniff_container(b"\xff\xfb\x90\x00data") == "mp3"
    assert sniff_container(b"OggS\x00junk") == "ogg"
    assert sniff_container(b"fLaC\x00junk") == "flac"
    assert sniff_container(b"\x00\x00\x00 ftypM4A ") == "m4a"
    assert sniff_container(b"garbage!") == "unknown"


def _frames(header: bytes, flen: int, n: int = 2) -> bytes:
    buf = bytearray()
    for _ in range(n):
        buf += header + b"\x00" * (flen - 4)
    return bytes(buf)


def test_mp3_rate_parsing_synthetic():
    # MPEG-1 L3 44.1 kHz 128 kbps: FF FB 90 00, frame 417 bytes
    assert _native_rate(_frames(b"\xff\xfb\x90\x00", 417), "mp3") == 44100
    # 48 kHz: sr_idx=1 → FF FB 94 00, frame 384 bytes
    assert _native_rate(_frames(b"\xff\xfb\x94\x00", 384), "mp3") == 48000
    # MPEG-2 16 kHz 64 kbps: FF F3 88 00, frame 288 bytes
    assert _native_rate(_frames(b"\xff\xf3\x88\x00", 288), "mp3") == 16000
    # lone false sync with no following frame → rejected
    assert _native_rate(b"\xff\xfb\x90\x00" + b"\x00" * 64, "mp3") is None


def test_flac_rate_parsing():
    # STREAMINFO: bytes 18-20 carry the rate in the top 20 bits
    hdr = bytearray(b"fLaC" + b"\x00\x00\x00\x22" + b"\x00" * 34)
    hdr[18:21] = bytes([(44100 >> 12) & 0xFF, (44100 >> 4) & 0xFF,
                        ((44100 & 0xF) << 4)])
    assert _native_rate(bytes(hdr), "flac") == 44100


def test_unknown_container_raises():
    with pytest.raises(ValueError, match="unsupported audio container"):
        load_audio_bytes(b"not audio at all")


@pytest.mark.skipif(not MP3_FIXTURES, reason="no mp3 fixtures in image")
@pytest.mark.parametrize("path", MP3_FIXTURES)
def test_mp3_decode(path):
    with open(path, "rb") as f:
        data = f.read()
    assert sniff_container(data) == "mp3"
    audio, rate = load_audio_bytes(data)
    assert rate in (44100, 48000, 32000, 22050, 24000, 16000, 11025,
                    12000, 8000)
    dur = audio.shape[0] / rate
    assert 0.2 < dur < 600.0
    mono = to_mono(audio)
    rms = float(np.sqrt((mono ** 2).mean()))
    assert rms < 1.0, rms
    if "house_lo" in path:             # real music; test.mp3 is silence
        assert rms > 1e-4, rms


@pytest.mark.skipif(not MP3_FIXTURES, reason="no mp3 fixtures in image")
def test_prepare_audio_mp3_end_to_end(tmp_path):
    """The ASR front door must take an mp3 path straight to 16 kHz mono."""
    src = MP3_FIXTURES[0]
    with open(src, "rb") as f:
        raw = f.read()
    audio, rate = load_audio_bytes(raw)
    out = prepare_audio(src, 16000)
    assert out.ndim == 1 and out.dtype == np.float32
    expect_len = int(round(audio.shape[0] * 16000 / rate))
    assert abs(out.shape[0] - expect_len) <= 2
    assert np.abs(out).max() <= 1.0 + 1e-6


def test_wav_still_exact():
    """WAV keeps the bit-exact stdlib path (no SDL involved)."""
    t = np.arange(1600, dtype=np.float32) / 16000.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    data = wav_bytes(sig, 16000)
    audio, rate = load_audio_bytes(data)
    assert rate == 16000
    np.testing.assert_allclose(audio, sig, atol=2.0 / 32767)
