"""VoxCPM: CFM schedule/solver semantics, scalar quantization, AudioVAE
causal-conv shapes and streaming invariance, tokenizer splitting, and an
end-to-end tiny synthesis through the served wrapper."""

import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.models.audio_vae import (
    AudioVAE,
    causal_conv1d,
    causal_conv_transpose1d,
    fold_weight_norm,
)
from aha_tpu.models.voxcpm import (
    VoxCPMConfig,
    VoxCPMModel,
    VoxMiniCPM,
    cfm_sway_t_span,
    scalar_quantize,
    sinusoidal_time_emb,
)

TINY_CFG = {
    "architecture": "voxcpm",
    "patch_size": 2,
    "feat_dim": 8,
    "scalar_quantization_latent_dim": 16,
    "scalar_quantization_scale": 9,
    "residual_lm_num_layers": 1,
    "residual_lm_no_rope": True,
    "max_length": 512,
    "dtype": "float32",
    "lm_config": {
        "hidden_size": 32, "intermediate_size": 64,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "num_hidden_layers": 2, "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0, "max_position_embeddings": 512,
        "vocab_size": 128, "scale_emb": 12.0, "dim_model_base": 32,
        "scale_depth": 1.4, "use_mup": True,
        "rope_scaling": {"type": "longrope",
                         "short_factor": [1.0] * 4, "long_factor": [1.0] * 4,
                         "original_max_position_embeddings": 512}},
    "encoder_config": {"hidden_dim": 24, "ffn_dim": 48, "num_heads": 2,
                       "num_layers": 1},
    "dit_config": {"hidden_dim": 24, "ffn_dim": 48, "num_heads": 2,
                   "num_layers": 1,
                   "cfm_config": {"sigma_min": 1e-6, "solver": "euler",
                                  "t_scheduler": "cosine",
                                  "inference_cfg_rate": 2.0}},
    "audio_vae_config": {
        "encoder_dim": 4, "encoder_rates": [2, 2], "latent_dim": 8,
        "decoder_dim": 16, "decoder_rates": [2, 2], "sample_rate": 16000},
}


def test_sway_t_span():
    t = np.asarray(cfm_sway_t_span(10, sway=1.0))
    assert t[0] == pytest.approx(1.0 + (math.cos(math.pi / 2) - 1 + 1))
    assert t[-1] == pytest.approx(0.0)  # cos(0)-1+0 = 0 at t=0
    assert (np.diff(t) < 0).all()       # monotone decreasing


def test_scalar_quantize_rounds():
    p = {"in_proj": {"w": jnp.eye(4), "b": jnp.zeros(4)},
         "out_proj": {"w": jnp.eye(4), "b": jnp.zeros(4)}}
    x = jnp.asarray([[0.1, -0.26, 2.0, 0.0]])
    out = np.asarray(scalar_quantize(p, x, scale=9))
    expected = np.round(np.tanh(np.asarray(x)) * 9) / 9
    np.testing.assert_allclose(out, expected, rtol=1e-6)
    # quantized: all outputs are multiples of 1/9
    assert np.allclose(out * 9, np.round(out * 9), atol=1e-5)


def test_sinusoidal_time_emb_shape():
    e = sinusoidal_time_emb(jnp.asarray([0.5, 1.0]), 32)
    assert e.shape == (2, 32)
    assert np.isfinite(np.asarray(e)).all()


def test_causal_conv_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 20)).astype(np.float32)
    w = rng.standard_normal((5, 3, 7)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    # reference: pad left 2*3, VALID conv (dilation 1)
    got = np.asarray(causal_conv1d(jnp.asarray(x), jnp.asarray(w),
                                   jnp.asarray(b), padding=3))
    xp = torch.nn.functional.pad(torch.tensor(x), (6, 0))
    ref = torch.nn.functional.conv1d(xp, torch.tensor(w), torch.tensor(b))
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_causal_conv_transpose_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    stride = 4
    x = rng.standard_normal((1, 6, 10)).astype(np.float32)
    w = rng.standard_normal((6, 3, 2 * stride)).astype(np.float32)
    b = rng.standard_normal(3).astype(np.float32)
    pad = math.ceil(stride / 2)
    got = np.asarray(causal_conv_transpose1d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride,
        padding=pad, output_padding=stride % 2))
    full = torch.nn.functional.conv_transpose1d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=stride)
    keep = full.shape[-1] - (2 * pad - stride % 2)
    np.testing.assert_allclose(got, full[..., :keep].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_weight_norm_fold():
    rng = np.random.default_rng(2)
    v = rng.standard_normal((4, 3, 7)).astype(np.float32)
    g = rng.standard_normal((4, 1, 1)).astype(np.float32)
    w = fold_weight_norm(v, g)
    norms = np.sqrt((w ** 2).sum(axis=(1, 2)))
    np.testing.assert_allclose(norms, np.abs(g[:, 0, 0]), rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_vae():
    vae = AudioVAE(encoder_dim=4, encoder_rates=(2, 2), latent_dim=8,
                   decoder_dim=16, decoder_rates=(2, 2))
    params = vae.init_random(jax.random.PRNGKey(3))
    return vae, params


def test_vae_shapes_roundtrip(tiny_vae):
    vae, params = tiny_vae
    wav = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, 1, 64)).astype(np.float32) * 0.1)
    mu = vae.encode(params, wav)
    assert mu.shape == (1, 8, 64 // vae.hop_length)
    out = vae.decode(params, mu)
    assert out.shape == (1, 1, 64)
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh output


def test_vae_encoder_is_causal(tiny_vae):
    """Changing future samples must not change earlier latent frames."""
    vae, params = tiny_vae
    rng = np.random.default_rng(5)
    wav = rng.standard_normal((1, 1, 64)).astype(np.float32)
    wav2 = wav.copy()
    wav2[..., 40:] += 1.0
    mu1 = np.asarray(vae.encode(params, jnp.asarray(wav)))
    mu2 = np.asarray(vae.encode(params, jnp.asarray(wav2)))
    # frames strictly before 40/hop are unchanged
    n_safe = 40 // vae.hop_length
    np.testing.assert_allclose(mu1[..., :n_safe], mu2[..., :n_safe],
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(mu1[..., n_safe:], mu2[..., n_safe:])


@pytest.fixture(scope="module")
def tiny_model():
    cfg = VoxCPMConfig.from_dict(TINY_CFG)
    model = VoxCPMModel(cfg, latent_dim=8)
    params = model.init_random(jax.random.PRNGKey(6))
    return cfg, model, params


def test_minicpm_cache_matches_full(tiny_model):
    cfg, model, params = tiny_model
    lm = model.base_lm
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 6, 32)).astype(np.float32))
    full = np.asarray(lm.forward(params["base_lm"], x, causal=True))
    cache = lm.init_cache(1, 16)
    h1, cache = lm.forward_with_cache(params["base_lm"], x[:, :4], cache)
    h2, cache = lm.forward_with_cache(params["base_lm"], x[:, 4:5], cache)
    h3, _ = lm.forward_with_cache(params["base_lm"], x[:, 5:6], cache)
    got = np.concatenate([np.asarray(h1), np.asarray(h2), np.asarray(h3)],
                         axis=1)
    np.testing.assert_allclose(got, full, rtol=1e-4, atol=1e-5)


def test_inference_emits_patches_and_stops(tiny_model):
    cfg, model, params = tiny_model
    ids = [5, 9, 11]
    tt, tm, af, am = model.build_context(ids, None)
    assert len(tt) == len(ids) + 1  # + audio_start token
    latents = model.inference(params, tt, tm, af, am, min_len=1, max_len=4,
                              n_timesteps=3, cfg_value=2.0, seed=0)
    assert latents.shape[1] == 8
    assert latents.shape[0] % cfg.patch_size == 0
    assert 1 <= latents.shape[0] // cfg.patch_size <= 4
    # deterministic for a fixed seed
    latents2 = model.inference(params, tt, tm, af, am, min_len=1, max_len=4,
                               n_timesteps=3, cfg_value=2.0, seed=0)
    np.testing.assert_allclose(latents, latents2, rtol=1e-5, atol=1e-6)


def test_voice_prompt_context(tiny_model):
    cfg, model, params = tiny_model
    feat = np.random.default_rng(8).standard_normal(
        (3, cfg.patch_size, 8)).astype(np.float32)
    tt, tm, af, am = model.build_context([5, 9], feat)
    assert len(tt) == 3 + 3  # 2 text + audio_start + 3 audio frames
    assert tm.sum() == 3 and am.sum() == 3
    np.testing.assert_allclose(af[3:], feat)
    latents = model.inference(params, tt, tm, af, am, min_len=1, max_len=3,
                              n_timesteps=2, cfg_value=2.0)
    assert latents.shape[0] % cfg.patch_size == 0


def _build_tiny_repo(path: str):
    torch = pytest.importorskip("torch")

    cfg = VoxCPMConfig.from_dict(TINY_CFG)
    model = VoxCPMModel(cfg, latent_dim=8)
    params = model.init_random(jax.random.PRNGKey(10))
    vae = AudioVAE.from_config(TINY_CFG["audio_vae_config"])
    vae_params = vae.init_random(jax.random.PRNGKey(11))

    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(TINY_CFG, f)

    sd = {}

    def put_lin(name, p):
        sd[name + ".weight"] = torch.tensor(np.asarray(p["w"]).T.copy())
        if "b" in p:
            sd[name + ".bias"] = torch.tensor(np.asarray(p["b"]).copy())

    def put_lm(prefix, lp, cfgv):
        for i, l in enumerate(lp["layers"]):
            b = f"{prefix}layers.{i}."
            sd[b + "input_layernorm.weight"] = torch.tensor(
                np.asarray(l["ln1"]["w"]).copy())
            sd[b + "post_attention_layernorm.weight"] = torch.tensor(
                np.asarray(l["ln2"]["w"]).copy())
            for n in ("q", "k", "v", "o"):
                put_lin(b + f"self_attn.{n}_proj", l[n])
            put_lin(b + "mlp.gate_proj", l["mlp"]["gate"])
            put_lin(b + "mlp.up_proj", l["mlp"]["up"])
            put_lin(b + "mlp.down_proj", l["mlp"]["down"])
        sd[prefix + "norm.weight"] = torch.tensor(
            np.asarray(lp["norm"]["w"]).copy())
        if "embed" in lp:
            sd[prefix + "embed_tokens.weight"] = torch.tensor(
                np.asarray(lp["embed"]["w"]).copy())

    put_lm("base_lm.", params["base_lm"], cfg.lm)
    put_lm("residual_lm.", params["residual_lm"], None)
    fe = params["feat_encoder"]
    sd["feat_encoder.special_token"] = torch.tensor(
        np.asarray(fe["special_token"]).copy())[None, None]
    put_lin("feat_encoder.in_proj", fe["in_proj"])
    put_lm("feat_encoder.encoder.", fe["encoder"], None)
    fd = params["feat_dit"]
    for n in ("in_proj", "cond_proj", "out_proj"):
        put_lin(f"feat_decoder.estimator.{n}", fd[n])
    for n in ("time_mlp", "delta_time_mlp"):
        put_lin(f"feat_decoder.estimator.{n}.linear_1", fd[n]["linear_1"])
        put_lin(f"feat_decoder.estimator.{n}.linear_2", fd[n]["linear_2"])
    put_lm("feat_decoder.estimator.decoder.", fd["decoder"], None)
    put_lin("fsq_layer.in_proj", params["fsq_layer"]["in_proj"])
    put_lin("fsq_layer.out_proj", params["fsq_layer"]["out_proj"])
    for n in ("enc_to_lm_proj", "lm_to_dit_proj", "res_to_dit_proj",
              "stop_proj", "stop_head"):
        put_lin(n, params[n])
    torch.save({"state_dict": sd}, os.path.join(path, "pytorch_model.bin"))

    # VAE .pth with weight-norm split: v = w, g = per-channel norm → folds
    # back to w exactly
    vsd = {}

    def put_wn(name, p, transpose_in_out=False):
        w = np.asarray(p["w"])
        if transpose_in_out:
            w = w  # already (in, out, K) for transpose convs
        norm = np.sqrt((w ** 2).sum(axis=(1, 2), keepdims=True))
        vsd[name + ".weight_v"] = torch.tensor(w.copy())
        vsd[name + ".weight_g"] = torch.tensor(norm.copy())
        if "b" in p:
            vsd[name + ".bias"] = torch.tensor(np.asarray(p["b"]).copy())

    def put_unit(name, u):
        vsd[name + ".block.0.alpha"] = torch.tensor(np.asarray(u["a0"]).copy())
        vsd[name + ".block.2.alpha"] = torch.tensor(np.asarray(u["a2"]).copy())
        put_wn(name + ".block.1", {"w": u["w1"], "b": u["b1"]})
        put_wn(name + ".block.3", {"w": u["w3"], "b": u["b3"]})

    ep = vae_params["encoder"]
    put_wn("encoder.block.0", ep["stem"])
    for i, bp in enumerate(ep["blocks"]):
        base = f"encoder.block.{i + 1}"
        for j, u in enumerate(bp["units"]):
            put_unit(f"{base}.block.{j}", u)
        vsd[f"{base}.block.3.alpha"] = torch.tensor(np.asarray(bp["a"]).copy())
        put_wn(f"{base}.block.4", bp["down"])
    put_wn("encoder.fc_mu", ep["fc_mu"])
    dp = vae_params["decoder"]
    put_wn("decoder.model.0", dp["stem"])
    put_wn("decoder.model.1", dp["in"])
    for i, bp in enumerate(dp["blocks"]):
        base = f"decoder.model.{i + 2}"
        vsd[f"{base}.block.0.alpha"] = torch.tensor(np.asarray(bp["a"]).copy())
        put_wn(f"{base}.block.1", bp["up"], transpose_in_out=True)
        for j, u in enumerate(bp["units"]):
            put_unit(f"{base}.block.{j + 2}", u)
    n_up = len(vae.decoder_rates)
    vsd[f"decoder.model.{n_up + 2}.alpha"] = torch.tensor(
        np.asarray(dp["a_out"]).copy())
    put_wn(f"decoder.model.{n_up + 3}", dp["out"])
    torch.save({"state_dict": vsd}, os.path.join(path, "audiovae.pth"))

    # char-level tokenizer covering ascii + a couple of CJK chars
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {chr(c): i for i, c in enumerate(range(32, 127))}
    vocab["你好"] = len(vocab)
    vocab["你"] = len(vocab)
    vocab["好"] = len(vocab)
    vocab["[UNK]"] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    tok.save(os.path.join(path, "tokenizer.json"))
    return params, vae_params


def test_served_end_to_end(tmp_path_factory):
    from aha_tpu.models.loader import load_model
    from aha_tpu.models.voxcpm_served import VoxCPMServed
    from aha_tpu.params import ChatCompletionParameters

    path = str(tmp_path_factory.mktemp("voxcpm-tiny"))
    orig_params, orig_vae = _build_tiny_repo(path)
    served = load_model("OpenBMB/VoxCPM-0.5B", path, max_seq_len=512)
    assert isinstance(served, VoxCPMServed)
    # loaded params match the generated ones (incl. weight-norm folding)
    for a, b in zip(jax.tree.leaves(orig_params),
                    jax.tree.leaves(served.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(orig_vae),
                    jax.tree.leaves(served.vae_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    mes = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": "hi"}],
        "model": "m",
        "metadata": {"max_len": "3", "inference_timesteps": "2",
                     "min_len": "1"}})
    resp = served.generate(mes)
    part = resp.choices[0].message.content[0]
    assert part.type == "audio"
    assert part.audio_url.url.startswith("data:audio/wav;base64,")

    # non-v2 + prompt wav without prompt_text errors (generate.rs:239-243)
    from aha_tpu.models.base import UnsupportedOperation

    mes2 = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "hi"},
            {"type": "audio_url", "audio_url": {"url": "x.wav"}}]}],
        "model": "m"})
    with pytest.raises(UnsupportedOperation):
        served.generate(mes2)

    # streaming unsupported
    with pytest.raises(UnsupportedOperation):
        served.generate_stream(mes)


def test_single_chinese_tokenizer(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("voxtok"))
    pytest.importorskip("torch")
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {chr(c): i for i, c in enumerate(range(32, 127))}
    vocab["你好"] = len(vocab)
    vocab["你"] = len(vocab)
    vocab["好"] = len(vocab)
    vocab["[UNK]"] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    tok.save(os.path.join(path, "tokenizer.json"))

    from aha_tpu.models.voxcpm import SingleChineseTokenizer

    t = SingleChineseTokenizer(path)
    assert "你好" in t.multichar
    # multi-char CJK tokens split into per-character ids
    ids = t.encode("你好")
    assert ids == [vocab["你"], vocab["好"]]
    assert t.encode("ab") == [vocab["a"], vocab["b"]]
