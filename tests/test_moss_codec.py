"""Moss LFQ audio tokenizer + MaskGCT RepCodec: quantizer parity vs scalar
reference semantics, windowed-mask behavior, encode/decode plumbing, and the
Moss-TTS frames → waveform glue."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aha_tpu.models.moss_audio_tokenizer import (
    MossAudioTokenizer,
    MossAudioTokenizerConfig,
    MossModuleConfig,
    MossQuantizerConfig,
    lfq_encode,
    patched_decode,
    patched_encode,
    residual_lfq_decode,
    residual_lfq_encode,
    transformer_forward,
)


def test_patched_pretransform_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 12)), jnp.float32)
    lengths = jnp.asarray([12.0, 8.0])
    enc, l2 = patched_encode(x, lengths, 4)
    assert enc.shape == (2, 16, 3)
    np.testing.assert_array_equal(np.asarray(l2), [3.0, 2.0])
    dec, l3 = patched_decode(enc, l2, 4)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(x), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(l3), [12.0, 8.0])


def _lfq_params(rng, rvq, cb_dim, cb_size):
    p = {"codebook": jnp.asarray(
        rng.standard_normal((cb_size, cb_dim)), jnp.float32)}
    p["codebook_l2"] = p["codebook"] / jnp.linalg.norm(
        p["codebook"], axis=1, keepdims=True)
    if rvq != cb_dim:
        p["in_proj"] = {"w": jnp.asarray(
            rng.standard_normal((rvq, cb_dim)) * 0.3, jnp.float32),
            "b": jnp.zeros(cb_dim)}
        p["out_proj"] = {"w": jnp.asarray(
            rng.standard_normal((cb_dim, rvq)) * 0.3, jnp.float32),
            "b": jnp.zeros(rvq)}
    return p


def test_lfq_matches_scalar_reference():
    """LFQ nearest-code selection + straight-through vs a literal
    transcription of mod.rs:376-402."""
    rng = np.random.default_rng(1)
    rvq, cb_dim, cb_size, B, T = 6, 4, 16, 2, 5
    p = _lfq_params(rng, rvq, cb_dim, cb_size)
    z = rng.standard_normal((B, rvq, T)).astype(np.float32)

    z_q, idx = lfq_encode(p, jnp.asarray(z), None)

    # scalar reference
    in_w = np.asarray(p["in_proj"]["w"])
    out_w = np.asarray(p["out_proj"]["w"])
    cb = np.asarray(p["codebook"])
    cbn = cb / np.linalg.norm(cb, axis=1, keepdims=True)
    want_idx = np.zeros((B, T), np.int64)
    want_zq = np.zeros((B, rvq, T), np.float32)
    for b in range(B):
        for t in range(T):
            e = z[b, :, t] @ in_w
            en = e / np.linalg.norm(e)
            d = ((en ** 2).sum() - 2 * en @ cbn.T + (cbn ** 2).sum(1))
            i = int(np.argmax(-d))
            want_idx[b, t] = i
            want_zq[b, :, t] = cb[i] @ out_w
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(z_q), want_zq, atol=1e-5)


def test_residual_lfq_roundtrip_decode():
    """decode(encode(x)) equals the sum of selected codes' projections."""
    rng = np.random.default_rng(2)
    rvq, cb_dim, cb_size, nq = 6, 4, 32, 3
    p = {"quantizers": [_lfq_params(rng, rvq, cb_dim, cb_size)
                        for _ in range(nq)]}
    z = jnp.asarray(rng.standard_normal((1, rvq, 7)), jnp.float32)
    codes = residual_lfq_encode(p, z, jnp.asarray([7.0]))
    assert codes.shape == (nq, 1, 7)
    emb = residual_lfq_decode(p, codes)
    want = sum(np.asarray(p["quantizers"][i]["codebook"])[np.asarray(codes)[i, 0]]
               @ np.asarray(p["quantizers"][i]["out_proj"]["w"])
               for i in range(nq)).T[None]
    np.testing.assert_allclose(np.asarray(emb), want, atol=1e-5)


def _tiny_transformer(rng, d_in, d_model, d_out, heads, layers):
    def lin(i, o):
        return {"w": jnp.asarray(rng.standard_normal((i, o)) * 0.1,
                                 jnp.float32)}

    def norm(d):
        return {"w": jnp.ones(d), "b": jnp.zeros(d)}

    return {"input_proj": lin(d_in, d_model),
            "output_proj": lin(d_model, d_out),
            "layers": [{
                "norm1": norm(d_model), "norm2": norm(d_model),
                "in_proj": lin(d_model, 3 * d_model),
                "out_proj": lin(d_model, d_model),
                "ffn0": lin(d_model, 2 * d_model),
                "ffn2": lin(2 * d_model, d_model),
                "scale1": jnp.full(d_model, 0.5),
                "scale2": jnp.full(d_model, 0.5),
            } for _ in range(layers)]}


def test_transformer_window_and_length_invariance():
    """Padded batch entries match the unpadded run; the windowed mask keeps
    position t blind to anything before t-context."""
    rng = np.random.default_rng(3)
    cfg = MossModuleConfig(module_type="Transformer", d_model=16,
                           dim_feedforward=32, num_heads=2, num_layers=2,
                           input_dimension=8, output_dimension=8)
    p = _tiny_transformer(rng, 8, 16, 8, 2, 2)
    x = rng.standard_normal((1, 8, 10)).astype(np.float32)
    full, _ = transformer_forward(p, jnp.asarray(x), jnp.asarray([10.0]),
                                  cfg, context=4)
    # pad to length 16 with garbage: valid prefix must be unchanged
    xp = np.concatenate([x, rng.standard_normal((1, 8, 6)).astype(np.float32)],
                        axis=2)
    padded, _ = transformer_forward(p, jnp.asarray(xp), jnp.asarray([10.0]),
                                    cfg, context=4)
    np.testing.assert_allclose(np.asarray(padded)[:, :, :10],
                               np.asarray(full), atol=1e-5)
    # context window (single layer — windows widen across layers): changing
    # x[t=0] must not affect output at t >= 4
    cfg1 = MossModuleConfig(module_type="Transformer", d_model=16,
                            dim_feedforward=32, num_heads=2, num_layers=1,
                            input_dimension=8, output_dimension=8)
    p1 = {**p, "layers": p["layers"][:1]}
    base, _ = transformer_forward(p1, jnp.asarray(x), jnp.asarray([10.0]),
                                  cfg1, context=4)
    x2 = x.copy()
    x2[0, :, 0] += 10.0
    out2, _ = transformer_forward(p1, jnp.asarray(x2), jnp.asarray([10.0]),
                                  cfg1, context=4)
    np.testing.assert_allclose(np.asarray(out2)[:, :, 4:],
                               np.asarray(base)[:, :, 4:], atol=1e-5)
    assert not np.allclose(np.asarray(out2)[:, :, :4],
                           np.asarray(base)[:, :, :4], atol=1e-3)


def _tiny_tokenizer(rng):
    cfg = MossAudioTokenizerConfig(
        sampling_rate=100, downsample_rate=8, number_channels=1,
        causal_transformer_context_duration=1.0,
        encoder=(MossModuleConfig("PatchedPretransform", patch_size=8),
                 MossModuleConfig("Transformer", d_model=16,
                                  dim_feedforward=32, num_heads=2,
                                  num_layers=1, input_dimension=8,
                                  output_dimension=12)),
        decoder=(MossModuleConfig("Transformer", d_model=16,
                                  dim_feedforward=32, num_heads=2,
                                  num_layers=1, input_dimension=12,
                                  output_dimension=8),
                 MossModuleConfig("PatchedPretransform", patch_size=8)),
        quantizer=MossQuantizerConfig(codebook_dim=4, codebook_size=32,
                                      input_dim=12, output_dim=12,
                                      rvq_dim=12, num_quantizers=3))
    tok = MossAudioTokenizer(cfg)
    params = {
        "encoder": [{}, _tiny_transformer(rng, 8, 16, 12, 2, 1)],
        "decoder": [_tiny_transformer(rng, 12, 16, 8, 2, 1), {}],
        "quantizer": {"quantizers": [_lfq_params(rng, 12, 4, 32)
                                     for _ in range(3)]},
    }
    return tok, params


def test_moss_tokenizer_encode_decode_shapes():
    rng = np.random.default_rng(4)
    tok, params = _tiny_tokenizer(rng)
    wav = jnp.asarray(rng.standard_normal((1, 1, 50)), jnp.float32)
    codes = tok.encode(params, wav, jnp.asarray([50.0]))
    # 50 → padded 56 → /8 = 7 frames, 3 quantizers
    assert codes.shape == (3, 1, 7)
    assert np.asarray(codes).max() < 32

    frames = jnp.asarray(np.asarray(codes)[:, 0].T)  # (T, nq)
    audio = tok.decode_frames(params, frames)
    assert audio.shape == (1, 1, 56)
    assert np.isfinite(np.asarray(audio)).all()


def test_moss_tts_frames_to_waveform():
    """The Moss-TTS generator's frame output decodes to audio (the round-1
    gap: moss_tts emitted frames with no codec)."""
    from aha_tpu.models.moss_tts import MossTTSConfig, MossTTSModel
    from aha_tpu.models.gpt2 import GPT2Config

    rng = np.random.default_rng(5)
    tok, tok_params = _tiny_tokenizer(rng)
    cfg = MossTTSConfig(
        gpt2=GPT2Config(vocab_size=64, n_embd=32, n_head=2, n_layer=2,
                        n_positions=128),
        n_vq=3, audio_codebook_sizes=(33, 33, 33),
        local_transformer_layers=1, audio_pad_token_id=32,
        audio_end_token_id=1)
    model = MossTTSModel(cfg)
    params = model.init_random(jax.random.PRNGKey(0))
    ids = np.full((4, 1 + cfg.n_vq), cfg.audio_pad_token_id, np.int32)
    ids[:, 0] = [2, 5, 7, 9]
    frames = model.generate(params, ids, max_frames=5)
    assert frames.shape[1] == cfg.n_vq
    if frames.shape[0] == 0:
        pytest.skip("random model emitted audio_end immediately")
    frames = np.clip(frames, 0, 31)  # codec codebook is 32 entries
    audio = tok.decode_frames(tok_params, jnp.asarray(frames))
    assert audio.shape[0] == 1 and audio.shape[2] == frames.shape[0] * 8
    assert np.isfinite(np.asarray(audio)).all()


# ---------------------------------------------------------------------------
# MaskGCT RepCodec
# ---------------------------------------------------------------------------


def _repcodec():
    from aha_tpu.models.mask_gct import RepCodec, SemanticCodecConfig

    cfg = SemanticCodecConfig(codebook_size=32, hidden_size=16,
                              codebook_dim=4, vocos_dim=12,
                              vocos_intermediate_dim=24, vocos_num_layers=2,
                              num_quantizers=1, downsample_scale=2)
    rng = np.random.default_rng(6)

    def lin(i, o):
        return {"w": jnp.asarray(rng.standard_normal((i, o)) * 0.2,
                                 jnp.float32), "b": jnp.zeros(o)}

    def convp(i, o, k, groups=1):
        return {"w": jnp.asarray(
            rng.standard_normal((o, i // groups, k)) * 0.2, jnp.float32),
            "b": jnp.zeros(o)}

    def vocos(cin):
        return {"embed": convp(cin, 12, 7),
                "norm": {"w": jnp.ones(12), "b": jnp.zeros(12)},
                "final": {"w": jnp.ones(12), "b": jnp.zeros(12)},
                "blocks": [{
                    "dwconv": convp(12, 12, 7, groups=12),
                    "norm": {"w": jnp.ones(12), "b": jnp.zeros(12)},
                    "pw1": lin(12, 24), "pw2": lin(24, 12),
                    "gamma": jnp.full(12, 0.8),
                } for _ in range(2)]}

    q = {"codebook": jnp.asarray(rng.standard_normal((32, 4)), jnp.float32),
         "in_proj": lin(16, 4), "out_proj": lin(4, 16)}
    q["codebook_l2"] = q["codebook"] / jnp.linalg.norm(q["codebook"], axis=1,
                                                       keepdims=True)
    params = {"enc0": vocos(16), "enc1": lin(12, 16),
              "dec0": vocos(16), "dec1": lin(12, 16),
              "down": convp(16, 16, 3), "up": convp(16, 16, 3),
              "quantizer": {"quantizers": [q]}}
    return RepCodec(cfg), params


def test_repcodec_forward_and_quantize():
    codec, params = _repcodec()
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 10, 16)), jnp.float32)
    recon, codes = codec.forward(params, x)
    assert recon.shape == (2, 10, 16)
    assert codes.shape == (1, 2, 5)  # downsample 2
    q_codes, quantized = codec.quantize(params, x)
    assert q_codes.shape == (2, 5)
    assert quantized.shape == (2, 5, 16)
    np.testing.assert_array_equal(np.asarray(q_codes),
                                  np.asarray(codes)[0])
    emb = codec.vq2emb(params, codes)
    assert emb.shape == (2, 16, 5)
    assert np.isfinite(np.asarray(recon)).all()


def test_repcodec_depthwise_conv_matches_torch():
    import torch

    from aha_tpu.models.mask_gct import _convnext_block

    torch.manual_seed(0)
    D, T = 8, 11
    conv = torch.nn.Conv1d(D, D, 7, padding=3, groups=D)
    norm = torch.nn.LayerNorm(D, eps=1e-6)
    pw1 = torch.nn.Linear(D, 16)
    pw2 = torch.nn.Linear(16, D)
    gamma = torch.randn(D) * 0.5
    x = torch.randn(1, D, T)
    with torch.no_grad():
        h = conv(x).transpose(1, 2)
        h = norm(h)
        h = pw2(torch.nn.functional.gelu(pw1(h)))
        want = (x + (h * gamma).transpose(1, 2)).numpy()

    p = {"dwconv": {"w": jnp.asarray(conv.weight.detach().numpy()),
                    "b": jnp.asarray(conv.bias.detach().numpy())},
         "norm": {"w": jnp.asarray(norm.weight.detach().numpy()),
                  "b": jnp.asarray(norm.bias.detach().numpy())},
         "pw1": {"w": jnp.asarray(pw1.weight.detach().numpy()).T,
                 "b": jnp.asarray(pw1.bias.detach().numpy())},
         "pw2": {"w": jnp.asarray(pw2.weight.detach().numpy()).T,
                 "b": jnp.asarray(pw2.bias.detach().numpy())},
         "gamma": jnp.asarray(gamma.numpy())}
    got = np.asarray(_convnext_block(p, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-5)
