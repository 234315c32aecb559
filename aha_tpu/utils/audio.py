"""Host-side audio IO: decode, resample, normalize, chunk.

Equivalent of the host parts of src/utils/audio_utils.rs (load via
hound/symphonia :381-589, sinc resampler :42-256, chunk splitting :1743,
float_range_normalize modules.rs:1353).  Decoding stays on host; everything
after "samples as arrays" (mel/STFT) runs on device
(aha_tpu.ops.audio_feats).

WAV decodes via the stdlib; other containers need ffmpeg, which this image
doesn't ship — a clear error tells the caller to send WAV.
"""

from __future__ import annotations

import base64
import io
import os
import urllib.parse
import wave

import numpy as np


def load_wav_bytes(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV container → (float32 mono-or-multi (T,) or (T, C), rate)."""
    with wave.open(io.BytesIO(data)) as w:
        rate = w.getframerate()
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 2:
        arr = np.frombuffer(frames, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        arr = np.frombuffer(frames, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        arr = (np.frombuffer(frames, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_channels > 1:
        arr = arr.reshape(-1, n_channels)
    return arr, rate


def load_audio(source: str) -> tuple[np.ndarray, int]:
    """Load from file://, data: base64, raw base64, or a plain path."""
    if source.startswith("file://"):
        path = urllib.parse.urlparse(source).path or source[7:]
        with open(path, "rb") as f:
            data = f.read()
    elif source.startswith("data:"):
        data = base64.b64decode(source.split(",", 1)[1])
    elif os.path.exists(source):
        with open(source, "rb") as f:
            data = f.read()
    else:
        # assume raw base64 payload (reference accepts it, img_utils.rs style)
        data = base64.b64decode(source)
    if data[:4] != b"RIFF":
        raise ValueError(
            "only WAV input is supported in this environment (no ffmpeg); "
            "got a non-RIFF container")
    return load_wav_bytes(data)


def to_mono(audio: np.ndarray) -> np.ndarray:
    if audio.ndim == 2:
        return audio.mean(axis=1)
    return audio


def resample(audio: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Polyphase resampling (scipy) — the host equivalent of the reference's
    sinc/Kaiser resampler (audio_utils.rs:42-256)."""
    if src_rate == dst_rate:
        return audio
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(src_rate, dst_rate)
    return resample_poly(audio, dst_rate // g, src_rate // g).astype(np.float32)


def float_range_normalize(audio: np.ndarray) -> np.ndarray:
    """Scale into [-1, 1] only if the peak exceeds 1 (modules.rs:1353-1368)."""
    peak = float(np.abs(audio).max()) if audio.size else 0.0
    if peak > 1.0:
        return (audio / peak).astype(np.float32)
    return audio.astype(np.float32)


def prepare_audio(source: str, target_rate: int = 16000) -> np.ndarray:
    """load → mono → resample → normalize: the standard ASR front door."""
    audio, rate = load_audio(source)
    audio = to_mono(audio)
    audio = resample(audio, rate, target_rate)
    return float_range_normalize(audio)


def split_audio_into_chunks(audio: np.ndarray, sample_rate: int,
                            max_seconds: float) -> list[np.ndarray]:
    """Split long audio at the frontend (audio_utils.rs:1743-1761)."""
    max_len = int(sample_rate * max_seconds)
    if len(audio) <= max_len:
        return [audio]
    return [audio[i:i + max_len] for i in range(0, len(audio), max_len)]


def save_wav(path_or_buf, audio: np.ndarray, sample_rate: int) -> None:
    """float32 (T,) → 16-bit PCM WAV."""
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    with wave.open(path_or_buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def wav_bytes(audio: np.ndarray, sample_rate: int) -> bytes:
    buf = io.BytesIO()
    save_wav(buf, audio, sample_rate)
    return buf.getvalue()
