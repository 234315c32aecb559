"""FireRedVAD: FSMN conv semantics, streaming==offline, post-processing,
and the detect_frame state machine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.models.fire_red_vad import (
    CMVN,
    DetectModel,
    DetectModelConfig,
    FireRedVad,
    FireRedVadConfig,
    VadPostprocessor,
    _fsmn_lookahead,
    _fsmn_lookback,
    smooth_probs,
)

TINY_STREAM = DetectModelConfig(idim=8, r=3, m=1, h=16, p=8, n1=4, s1=1,
                                n2=0, s2=1, odim=1)
TINY_OFFLINE = DetectModelConfig(idim=8, r=3, m=1, h=16, p=8, n1=4, s1=1,
                                 n2=4, s2=1, odim=1)


def test_lookback_is_causal_conv():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 10, 3)).astype(np.float32)
    w = rng.standard_normal((4, 3)).astype(np.float32)
    cache = jnp.zeros((1, 3, 3), jnp.float32)
    y, nc = _fsmn_lookback(jnp.asarray(x), jnp.asarray(w), cache)
    # y[t] = sum_j w[j] * x[t-3+j] (zero-padded)
    xp = np.concatenate([np.zeros((1, 3, 3), np.float32), x], axis=1)
    ref = sum(xp[:, j:j + 10] * w[j] for j in range(4))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nc), x[:, -3:], rtol=1e-6)


def test_lookahead_is_strictly_future():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 10, 3)).astype(np.float32)
    w = rng.standard_normal((4, 3)).astype(np.float32)
    y = np.asarray(_fsmn_lookahead(jnp.asarray(x), jnp.asarray(w), 1))
    xp = np.concatenate([x, np.zeros((1, 4, 3), np.float32)], axis=1)
    ref = sum(xp[:, j + 1:j + 11] * w[j] for j in range(4))
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)
    # perturbing the PAST must not change y[t]
    x2 = x.copy()
    x2[0, 0] += 1.0
    y2 = np.asarray(_fsmn_lookahead(jnp.asarray(x2), jnp.asarray(w), 1))
    np.testing.assert_allclose(y[0, 0:], y2[0, 0:], rtol=1e-6)


def test_streaming_matches_offline():
    """Frame-by-frame forward with caches == one-shot forward (stream cfg)."""
    model = DetectModel(TINY_STREAM)
    params = model.init_random(jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((1, 24, 8)).astype(np.float32)

    full, _ = model.forward(params, jnp.asarray(feats), streaming=True)
    full = np.asarray(full)

    caches = None
    outs = []
    for t in range(0, 24, 3):  # chunks of 3 frames
        p, caches = model.forward(params, jnp.asarray(feats[:, t:t + 3]),
                                  caches, streaming=True)
        outs.append(np.asarray(p))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, full, rtol=1e-4, atol=1e-5)


def test_offline_lookahead_active():
    """With n2>0 and T>1, future frames influence current probs."""
    model = DetectModel(TINY_OFFLINE)
    params = model.init_random(jax.random.PRNGKey(4))
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((1, 16, 8)).astype(np.float32)
    p1, _ = model.forward(params, jnp.asarray(feats))
    feats2 = feats.copy()
    feats2[0, 10] += 1.0
    p2, _ = model.forward(params, jnp.asarray(feats2))
    d = np.abs(np.asarray(p1) - np.asarray(p2))[0, :, 0]
    assert d[9] > 1e-5  # earlier frame sees the future change
    # streaming mode disables lookahead: strictly causal
    p1s, _ = model.forward(params, jnp.asarray(feats), streaming=True)
    p2s, _ = model.forward(params, jnp.asarray(feats2), streaming=True)
    ds = np.abs(np.asarray(p1s) - np.asarray(p2s))[0, :, 0]
    assert ds[:10].max() == 0


def test_cmvn_formula():
    stats = np.zeros((2, 4), np.float32)
    stats[0] = [10.0, 20.0, 30.0, 10.0]   # sums, count=10
    stats[1] = [11.0, 44.0, 99.0, 10.0]   # sum of squares
    c = CMVN(stats)
    np.testing.assert_allclose(c.means, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(c.inv_std, 1.0 / np.sqrt([0.1, 0.4, 0.9]),
                               rtol=1e-5)
    out = c(np.asarray([[1.0, 2.0, 3.0]], np.float32))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_smooth_probs_running_mean_head():
    p = np.asarray([1.0, 0.0, 1.0, 0.0, 1.0, 1.0], np.float32)
    s = smooth_probs(p, 3)
    np.testing.assert_allclose(s[0], 1.0)
    np.testing.assert_allclose(s[1], 0.5)
    np.testing.assert_allclose(s[2:], np.convolve(
        p, np.full(3, 1 / 3), mode="full")[2:6], rtol=1e-6)
    np.testing.assert_allclose(smooth_probs(p, 1), p)


def test_decision_to_segment():
    post = VadPostprocessor(FireRedVadConfig())
    dec = np.asarray([0, 1, 1, 1, 0, 0, 1, 1], np.int32)
    segs = post.decision_to_segment(dec, dur=1.0)
    assert segs == [(pytest.approx(0.01), pytest.approx(0.04)),
                    (pytest.approx(0.06), pytest.approx(0.07))]


class _FakeVad(FireRedVad):
    """Overrides the model step to emit scripted per-frame probs."""

    def __init__(self, script):
        model = DetectModel(DetectModelConfig.default_stream_vad())
        self.model = model
        self.params = None
        self.cmvn = CMVN(np.asarray([[0.0] * 80 + [1.0],
                                     [80.0] * 80 + [1.0]], np.float32))
        self.cfg = FireRedVadConfig.default_stream_vad()
        self.model_name = "stream-fake"
        self.post = VadPostprocessor(self.cfg)
        self.caches = None
        self.speech_cache = []
        self.pred_cache = []
        self._it = iter(script)
        self._stream_step = lambda params, feats, caches: (
            jnp.asarray([[[next(self._it)]]], jnp.float32), caches)


def test_detect_frame_state_machine():
    frame = np.zeros(400, np.float32)
    # 35 speech frames, then 15 silence-prob frames (still buffered because
    # each frame's own pred ratio > 0.1? no: prob 0 → ratio 0 → flush path)
    vad = _FakeVad([0.9] * 35 + [0.0])
    results = [vad.detect_frame(frame) for _ in range(36)]
    flushed = [r for r in results if r is not None]
    assert len(flushed) == 1  # silence frame flushed the buffered speech
    assert flushed[0].is_speech
    assert len(flushed[0].orig_audio) == 35 * 400

    # too-short speech burst (< 30 frames) is discarded on silence
    vad2 = _FakeVad([0.9] * 10 + [0.0])
    results2 = [vad2.detect_frame(frame) for _ in range(11)]
    assert all(r is None for r in results2)

    # short frame raises
    with pytest.raises(ValueError):
        vad2.detect_frame(np.zeros(100, np.float32))


def test_detect_waveform_segments():
    """End-to-end offline: random model, real fbank frontend, segments are
    within [0, dur] and well-formed."""
    model = DetectModel(DetectModelConfig(idim=80, r=2, m=1, h=16, p=8,
                                          n1=4, s1=1, n2=4, s2=1, odim=1))
    params = model.init_random(jax.random.PRNGKey(7))
    cmvn = CMVN(np.asarray([[0.0] * 80 + [1.0],
                            [80.0] * 80 + [1.0]], np.float32))
    vad = FireRedVad(model, params, cmvn, FireRedVadConfig(), "tiny-vad")
    wav = np.random.default_rng(8).standard_normal(16000).astype(
        np.float32) * 0.1
    res = vad.detect_waveform(wav)
    assert res.dur == pytest.approx(1.0)
    for s, e in res.timestamps:
        assert 0.0 <= s < e <= res.dur + 1e-6
