"""FireRedVAD: FSMN voice-activity detection (aux model feeding ASR).

Parity with src/models/fire_red_vad (reference):
- DetectModel (model.rs:261-294): DFSMN stack — fc1(relu) → fc2(relu) →
  fsmn1 → (r−1)×[fc1(relu) → fc2(no bias) → fsmn → +residual] → m dnn(relu)
  → out linear → sigmoid.
- FSMN memory (model.rs:13-146): depthwise causal lookback conv (kernel n1,
  dilation s1) + optional strictly-future lookahead conv (kernel n2,
  dilation s2, offline only); streaming keeps the last (n1−1)·s1 frames of
  the conv input as cache.
- Frontend (processor.rs:61-144): kaldi fbank (16 kHz, 25/10 ms, dither 0,
  snip_edges, ×32768) + CMVN from cmvn.json (mean/inv-std from
  count-normalised stats, variance floored at 1e-20).
- Post-processing (processor.rs:146-247): moving-average smoothing (window
  5 offline / 1 streaming, 'full' conv with running-mean head), threshold,
  binary-decision → (start, end) second segments.
- Streaming detect_frame (vad.rs:94-167): per-frame probs, speech/pred
  buffers, ≥10% speech frames to buffer, 30-frame (~250 ms) minimum,
  15-frame look-back with ≥80% end-silence to flush.

TPU-first notes: the depthwise FSMN convs are expressed as stacked shifts
(sum of rolled slices — XLA fuses these into one fused elementwise chain),
caches are fixed-shape (B, (n1−1)·s1, P) f32 arrays zero-initialised so
streaming steps compile once, and the per-frame streaming step is jitted
(T=1). Post-processing state machines stay on host (numpy).
"""

from __future__ import annotations

import dataclasses
import json
import os
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from aha_tpu.io.weights import batched_load


@dataclasses.dataclass(frozen=True)
class DetectModelConfig:
    """config.rs:78-136."""

    idim: int = 80
    r: int = 8
    m: int = 1
    h: int = 256
    p: int = 128
    n1: int = 20
    s1: int = 1
    n2: int = 20
    s2: int = 1
    odim: int = 1

    @classmethod
    def default_vad(cls):
        return cls()

    @classmethod
    def default_stream_vad(cls):
        return cls(n2=0)

    @classmethod
    def default_aed(cls):
        return cls(odim=3)


@dataclasses.dataclass(frozen=True)
class FireRedVadConfig:
    """config.rs:1-71."""

    smooth_window_size: int = 5
    speech_threshold: float = 0.4
    min_speech_frame: int = 20
    max_speech_frame: int = 2000
    min_silence_frame: int = 20
    chunk_max_frame: int = 30000

    @classmethod
    def default_vad(cls):
        return cls()

    @classmethod
    def default_stream_vad(cls):
        return cls(smooth_window_size=1, speech_threshold=0.5,
                   min_speech_frame=8)

    @classmethod
    def default_aed(cls):
        return cls(min_speech_frame=8)


@dataclasses.dataclass
class VadFrameResult:
    """common/modules.rs VadFrameResult."""

    is_speech: bool
    orig_audio: np.ndarray | None
    model_name: str = "VAD"
    mode: str = "speech"


@dataclasses.dataclass
class VadResult:
    dur: float
    timestamps: list[tuple[float, float]]
    model_name: str
    mode: str = "speech"


def _fsmn_lookback(x, w, cache):
    """Causal depthwise conv: y[t] = Σ_j w[j]·x[t−(n1−1)s1+j·s1].

    x: (B, T, P); w: (n1, P); cache: (B, (n1−1)·s1, P) trailing context
    (zeros initially). Returns (y, new_cache).
    """
    n1 = w.shape[0]
    pad = cache.shape[1]  # (n1−1)·s1
    s1 = pad // max(n1 - 1, 1) if n1 > 1 else 1
    xp = jnp.concatenate([cache, x], axis=1)
    T = x.shape[1]
    y = sum(xp[:, j * s1:j * s1 + T, :] * w[j] for j in range(n1))
    new_cache = xp[:, xp.shape[1] - pad:] if pad else cache
    return y, new_cache


def _fsmn_lookahead(x, w, s2):
    """Strictly-future depthwise conv: y[t] = Σ_j w[j]·x[t+(j+1)·s2],
    zero-padded past the end (model.rs:120-139)."""
    n2 = w.shape[0]
    T = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (0, n2 * s2), (0, 0)))
    return sum(xp[:, (j + 1) * s2:(j + 1) * s2 + T, :] * w[j]
               for j in range(n2))


class DetectModel:
    """Functional FSMN detector; caches is a list of fixed-shape arrays."""

    def __init__(self, config: DetectModelConfig):
        self.config = config

    def init_caches(self, batch: int = 1) -> list[jnp.ndarray]:
        c = self.config
        pad = (c.n1 - 1) * c.s1
        return [jnp.zeros((batch, pad, c.p), jnp.float32) for _ in range(c.r)]

    def forward(self, params, feats, caches=None, streaming: bool = False):
        """feats (B, T, idim) → (probs (B, T, odim), new_caches).

        streaming=True keeps conv caches and disables lookahead (the stream
        checkpoint has n2=0 anyway; offline T>1 enables lookahead,
        model.rs:120)."""
        c = self.config
        if caches is None:
            caches = self.init_caches(feats.shape[0])
        use_ahead = c.n2 > 0 and not streaming and feats.shape[1] > 1

        def fsmn(p, x, cache):
            y, new_cache = _fsmn_lookback(x, p["lookback"], cache)
            mem = x + y
            if use_ahead and "lookahead" in p:
                mem = mem + _fsmn_lookahead(x, p["lookahead"], c.s2)
            return mem, new_cache

        x = jax.nn.relu(feats @ params["fc1"]["w"] + params["fc1"]["b"])
        x = jax.nn.relu(x @ params["fc2"]["w"] + params["fc2"]["b"])
        new_caches = []
        x, nc = fsmn(params["fsmn1"], x, caches[0])
        new_caches.append(nc)
        for i, bp in enumerate(params["blocks"]):
            h = jax.nn.relu(x @ bp["fc1"]["w"] + bp["fc1"]["b"])
            p = h @ bp["fc2"]["w"]
            mem, nc = fsmn(bp["fsmn"], p, caches[i + 1])
            new_caches.append(nc)
            x = x + mem
        for dp in params["dnns"]:
            x = jax.nn.relu(x @ dp["w"] + dp["b"])
        logits = x @ params["out"]["w"] + params["out"]["b"]
        return jax.nn.sigmoid(logits), new_caches

    # -- loading --------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.float32) -> dict:
        def lin(name, bias=True):
            out = {"w": np.asarray(src.get(name + ".weight", dtype)).T}
            if bias:
                out["b"] = np.asarray(src.get(name + ".bias", dtype))
            return out

        def fsmn(prefix, ahead):
            # depthwise conv weight (P, 1, K) → (K, P)
            out = {"lookback": np.asarray(
                src.get(prefix + ".lookback_filter.weight", dtype))[:, 0, :].T}
            if ahead:
                out["lookahead"] = np.asarray(
                    src.get(prefix + ".lookahead_filter.weight",
                            dtype))[:, 0, :].T
            return out

        c = self.config
        ahead = c.n2 > 0
        params = {
            "fc1": lin("dfsmn.fc1.0"),
            "fc2": lin("dfsmn.fc2.0"),
            "fsmn1": fsmn("dfsmn.fsmn1", ahead),
            "blocks": [{
                "fc1": lin(f"dfsmn.fsmns.{i}.fc1.0"),
                "fc2": lin(f"dfsmn.fsmns.{i}.fc2", bias=False),
                "fsmn": fsmn(f"dfsmn.fsmns.{i}.fsmn", ahead),
            } for i in range(c.r - 1)],
            "dnns": [lin(f"dfsmn.dnns.{i}") for i in range(c.m)],
            "out": lin("out"),
        }
        return jax.tree.map(jnp.asarray, params)

    def init_random(self, key, scale: float = 0.2) -> dict:
        c = self.config
        ks = iter(jax.random.split(key, 8 * c.r + 8))

        def w(shape):
            return jax.random.normal(next(ks), shape, jnp.float32) * scale

        def lin(i, o, bias=True):
            out = {"w": w((i, o))}
            if bias:
                out["b"] = jnp.zeros(o, jnp.float32)
            return out

        def fsmn():
            out = {"lookback": w((c.n1, c.p)) * 0.1}
            if c.n2 > 0:
                out["lookahead"] = w((c.n2, c.p)) * 0.1
            return out

        return {
            "fc1": lin(c.idim, c.h),
            "fc2": lin(c.h, c.p),
            "fsmn1": fsmn(),
            "blocks": [{"fc1": lin(c.p, c.h), "fc2": lin(c.h, c.p, False),
                        "fsmn": fsmn()} for _ in range(c.r - 1)],
            "dnns": [lin(c.p if i == 0 else c.h, c.h) for i in range(c.m)],
            "out": lin(c.h, c.odim),
        }


# ---------------------------------------------------------------------------
# CMVN + fbank frontend (processor.rs:17-144)
# ---------------------------------------------------------------------------


class CMVN:
    def __init__(self, stats: np.ndarray):
        stats = np.asarray(stats, np.float32)
        assert stats.ndim == 2 and stats.shape[0] == 2
        dim = stats.shape[1] - 1
        count = stats[0, dim]
        means = stats[0, :dim] / count
        var = np.clip(stats[1, :dim] / count - means ** 2, 1e-20, None)
        self.means = means
        self.inv_std = 1.0 / np.sqrt(var)

    @classmethod
    def from_file(cls, path: str) -> "CMVN":
        with open(os.path.join(path, "cmvn.json")) as f:
            return cls(np.asarray(json.load(f)["cmvn"]))

    def __call__(self, feats: np.ndarray) -> np.ndarray:
        return (feats - self.means) * self.inv_std


def extract_feats(cmvn: CMVN, waveform: np.ndarray) -> np.ndarray:
    """16 kHz float waveform → CMVN'd 80-dim fbank (kaldi_fbank applies the
    ×32768 i16 scaling internally, matching vad.rs:102)."""
    from aha_tpu.ops.audio_feats import kaldi_fbank

    return cmvn(kaldi_fbank(waveform, num_mel_bins=80))


# ---------------------------------------------------------------------------
# Post-processing (processor.rs:146-247)
# ---------------------------------------------------------------------------


def smooth_probs(probs: np.ndarray, window: int) -> np.ndarray:
    """Moving average ('full' conv truncated to len), with the first
    window−1 entries replaced by the running mean (processor.rs:228-246)."""
    if window <= 1:
        return probs
    n = len(probs)
    out = np.convolve(probs, np.full(window, 1.0 / window), mode="full")[:n]
    head = min(window - 1, n)
    for i in range(head):
        out[i] = probs[:i + 1].mean()
    return out


class VadPostprocessor:
    def __init__(self, cfg: FireRedVadConfig):
        self.cfg = cfg
        self.frame_shift_s = 0.01

    def process_thresh(self, probs: np.ndarray) -> np.ndarray:
        sm = smooth_probs(np.asarray(probs, np.float32),
                          self.cfg.smooth_window_size)
        return (sm >= self.cfg.speech_threshold).astype(np.int32)

    def decision_to_segment(self, decisions: np.ndarray,
                            dur: float) -> list[tuple[float, float]]:
        segments, start = [], -1
        for t, flag in enumerate(decisions):
            if flag and start == -1:
                start = t
            elif not flag and start != -1:
                segments.append((start * self.frame_shift_s,
                                 t * self.frame_shift_s))
                start = -1
        if start != -1:
            end = min(dur, (len(decisions) - 1) * self.frame_shift_s)
            segments.append((start * self.frame_shift_s, end))
        return segments

    def process(self, probs: np.ndarray, dur: float):
        return self.decision_to_segment(self.process_thresh(probs), dur)


# ---------------------------------------------------------------------------
# FireRedVad (vad.rs:29-234)
# ---------------------------------------------------------------------------


class FireRedVad:
    FRAME_LENGTH_SAMPLES = 400
    MIN_SPEECH_FRAMES = 30   # ~250 ms
    LOOK_BACK_FRAMES = 15    # ~80 ms
    MIN_SPEECH_RATIO = 0.1
    END_SILENCE_RATIO = 0.8

    def __init__(self, model: DetectModel, params, cmvn: CMVN,
                 cfg: FireRedVadConfig, model_name: str = "VAD"):
        self.model = model
        self.params = params
        self.cmvn = cmvn
        self.cfg = cfg
        self.model_name = model_name
        self.post = VadPostprocessor(cfg)
        self.caches: list | None = None
        self.speech_cache: list[np.ndarray] = []
        self.pred_cache: list[int] = []
        self._stream_step = jax.jit(
            partial(self.model.forward, streaming=True))

    @classmethod
    def init(cls, path: str) -> "FireRedVad":
        from aha_tpu.io.weights import open_weights

        name = os.path.basename(path.rstrip("/")) or "VAD"
        low = name.lower()
        if "stream" in low:
            mc, cfg = (DetectModelConfig.default_stream_vad(),
                       FireRedVadConfig.default_stream_vad())
        elif "aed" in low:
            mc, cfg = (DetectModelConfig.default_aed(),
                       FireRedVadConfig.default_aed())
        else:
            mc, cfg = (DetectModelConfig.default_vad(),
                       FireRedVadConfig.default_vad())
        model = DetectModel(mc)
        params = model.load_params(open_weights(path))
        return cls(model, params, CMVN.from_file(path), cfg, name)

    def reset(self):
        self.caches = None
        self.speech_cache.clear()
        self.pred_cache.clear()

    # -- streaming (vad.rs:94-167) --------------------------------------------

    def detect_frame(self, audio_frame: np.ndarray) -> VadFrameResult | None:
        if len(audio_frame) < self.FRAME_LENGTH_SAMPLES:
            raise ValueError(
                f"Expected {self.FRAME_LENGTH_SAMPLES} samples, "
                f"got {len(audio_frame)}")
        feats = extract_feats(self.cmvn, np.asarray(audio_frame, np.float32))
        probs, self.caches = self._stream_step(
            self.params, jnp.asarray(feats[None]), self.caches)
        probs = np.asarray(probs)[0, :, 0]
        preds = self.post.process_thresh(probs)

        final = None
        if preds.sum() > len(probs) * self.MIN_SPEECH_RATIO:
            self.speech_cache.append(np.asarray(audio_frame, np.float32))
            self.pred_cache.extend(int(p) for p in preds)
            if len(self.pred_cache) >= self.MIN_SPEECH_FRAMES:
                look_back = sum(self.pred_cache[-self.LOOK_BACK_FRAMES:])
                silence = 1.0 - look_back / self.LOOK_BACK_FRAMES
                if silence >= self.END_SILENCE_RATIO:
                    final = np.concatenate(self.speech_cache)
                    self.speech_cache.clear()
                    self.pred_cache.clear()
        else:
            if len(self.pred_cache) >= self.MIN_SPEECH_FRAMES:
                final = np.concatenate(self.speech_cache)
            self.speech_cache.clear()
            self.pred_cache.clear()
        if final is None:
            return None
        return VadFrameResult(is_speech=True, orig_audio=final,
                              model_name=self.model_name)

    # -- offline (vad.rs:198-229) ----------------------------------------------

    def detect_waveform(self, waveform: np.ndarray,
                        sample_rate: int = 16000) -> VadResult:
        if sample_rate != 16000:
            from aha_tpu.utils.audio import resample

            waveform = resample(waveform, sample_rate, 16000)
        dur = len(waveform) / 16000.0
        feats = extract_feats(self.cmvn, np.asarray(waveform, np.float32))
        chunk = self.cfg.chunk_max_frame
        probs = []
        for s in range(0, len(feats), chunk):
            p, _ = self.model.forward(self.params,
                                      jnp.asarray(feats[None, s:s + chunk]))
            probs.append(np.asarray(p)[0])
        probs = np.concatenate(probs)
        probs = probs[:, 0]  # aed: only the speech channel (vad.rs:212-220)
        return VadResult(dur=dur,
                         timestamps=self.post.process(probs, dur),
                         model_name=self.model_name)

    def detect_file(self, audio_path: str) -> VadResult:
        from aha_tpu.utils.audio import load_audio

        wav, sr = load_audio(audio_path)
        return self.detect_waveform(wav, sr)
