"""Qwen3-ASR: feature lengths, mel frontend, audio splice, end-to-end serve."""

import asyncio
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core import cache as kvmod
from aha_tpu.models.qwen3 import Qwen3Config
from aha_tpu.models.qwen3_asr import (
    Qwen3ASRAudioConfig,
    Qwen3ASRConfig,
    Qwen3ASRModel,
    get_feat_extract_output_lengths,
)

TINY_AUDIO = Qwen3ASRAudioConfig(
    d_model=64, encoder_attention_heads=4, encoder_ffn_dim=128,
    encoder_layers=2, num_mel_bins=128, downsample_hidden_size=16,
    n_window=50, output_dim=48)
TINY_TEXT = Qwen3Config(
    vocab_size=200, hidden_size=48, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=12, tie_word_embeddings=True, max_position_embeddings=512)
AUDIO_TOKEN = 190
TINY = Qwen3ASRConfig(audio=TINY_AUDIO, text=TINY_TEXT,
                      audio_token_id=AUDIO_TOKEN)


def test_feat_extract_output_lengths():
    # per-chunk semantics: 13 tokens per full 100-frame window
    assert get_feat_extract_output_lengths(100) == 13
    assert get_feat_extract_output_lengths(200) == 26
    assert get_feat_extract_output_lengths(1) == 1
    assert get_feat_extract_output_lengths(150) == 13 + 7
    # matches ceil-division through three stride-2 convs for the remainder
    for leave in range(1, 100):
        f = (leave - 1) // 2 + 1
        f = (f - 1) // 2 + 1
        f = (f - 1) // 2 + 1
        assert get_feat_extract_output_lengths(leave) == f


def test_whisper_mel_matches_hf():
    from transformers.audio_utils import (
        mel_filter_bank as hf_mel,
        spectrogram,
        window_function,
    )

    from aha_tpu.ops.audio_feats import whisper_log_mel

    np.random.seed(0)
    wav = (np.random.randn(16000) * 0.1).astype(np.float32)
    filters = hf_mel(num_frequency_bins=201, num_mel_filters=128,
                     min_frequency=0.0, max_frequency=8000.0,
                     sampling_rate=16000, norm="slaney", mel_scale="slaney")
    ref = spectrogram(wav, window_function(400, "hann"), frame_length=400,
                      hop_length=160, power=2.0, mel_filters=filters,
                      log_mel="log10", mel_floor=1e-10)[:, :-1]
    ref = np.maximum(ref, ref.max() - 8.0)
    ref = (ref + 4.0) / 4.0
    got = np.asarray(whisper_log_mel(jnp.asarray(wav)[None]))[0]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3)


@pytest.fixture(scope="module")
def tiny_asr():
    model = Qwen3ASRModel(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(5))
    return model, params


def _mm(n_frames=150, bucket=200, seed=0):
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((1, 128, bucket)).astype(np.float32)
    mel[:, :, n_frames:] = 0.0
    n_out = get_feat_extract_output_lengths(n_frames)
    return {"mel": jnp.asarray(mel), "n_out": jnp.int32(n_out)}, n_out


def test_audio_splice_changes_embeddings(tiny_asr):
    model, params = tiny_asr
    mm, n_out = _mm()
    ids = [1, 2] + [AUDIO_TOKEN] * n_out + [3, 4]
    cache = model.init_cache(1, 64, jnp.float32)
    with_audio, _ = model.backbone(params, jnp.asarray([ids]), cache, mm=mm)
    cache = model.init_cache(1, 64, jnp.float32)
    without, _ = model.backbone(params, jnp.asarray([ids]), cache)
    assert not np.allclose(np.asarray(with_audio), np.asarray(without))


def test_asr_incremental_decode_matches_full(tiny_asr):
    model, params = tiny_asr
    mm, n_out = _mm()
    ids = [1, 2] + [AUDIO_TOKEN] * n_out + [3, 4, 5]

    cache = model.init_cache(1, len(ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([ids]), cache, mm=mm)
    ref = model.logits(params, hidden)[0]

    split = len(ids) - 2
    cache = model.init_cache(1, 64, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids[:split]]), cache,
                                   mm=mm)
    cache = kvmod.advance(cache, split)
    outs = [model.logits(params, hidden)[0, -1]]
    for tok in ids[split:-1]:
        hidden, cache = model.backbone(params, jnp.asarray([[tok]]), cache)
        cache = kvmod.advance(cache, 1)
        outs.append(model.logits(params, hidden)[0, 0])
    got = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[split - 1:-1]),
                               atol=5e-3)


def test_audio_padding_invariance(tiny_asr):
    """Encoder output for valid rows must not depend on padded chunks."""
    model, params = tiny_asr
    mm_small, n_out = _mm(n_frames=150, bucket=200)
    mm_big, _ = _mm(n_frames=150, bucket=400)
    # same real mel content in both
    mm_big["mel"] = mm_big["mel"].at[:, :, :200].set(mm_small["mel"])
    mm_big["mel"] = mm_big["mel"].at[:, :, 200:].set(0.0)
    f_small = model.encode_audio(params["audio"], mm_small["mel"],
                                 mm_small["n_out"])
    f_big = model.encode_audio(params["audio"], mm_big["mel"],
                               mm_big["n_out"])
    np.testing.assert_allclose(np.asarray(f_small[:n_out]),
                               np.asarray(f_big[:n_out]), atol=1e-4)


# -- end-to-end through the server -------------------------------------------


def build_tiny_asr_repo(path: str) -> None:
    from safetensors.numpy import save_file

    from tests.fixtures import CHAT_TEMPLATE, build_tokenizer

    os.makedirs(path, exist_ok=True)
    from tokenizers import AddedToken

    tok = build_tokenizer(path)
    tok.add_special_tokens([AddedToken(t, special=True) for t in
                            ("<|audio_start|>", "<|audio_pad|>",
                             "<|audio_end|>")])
    tok.save(os.path.join(path, "tokenizer.json"))
    audio_token_id = tok.token_to_id("<|audio_pad|>")
    eos_id = tok.token_to_id("<|im_end|>")

    text_cfg = dict(vocab_size=tok.get_vocab_size(), hidden_size=48,
                    intermediate_size=96, num_hidden_layers=2,
                    num_attention_heads=4, num_key_value_heads=2,
                    head_dim=12, tie_word_embeddings=True,
                    max_position_embeddings=4096, rms_norm_eps=1e-6,
                    rope_theta=1000000.0)
    audio_cfg = dict(d_model=64, encoder_attention_heads=4,
                     encoder_ffn_dim=128, encoder_layers=2, num_mel_bins=128,
                     downsample_hidden_size=16, n_window=50, output_dim=48)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"architectures": ["Qwen3ASRForConditionalGeneration"],
                   "thinker_config": {"audio_config": audio_cfg,
                                      "text_config": text_cfg,
                                      "audio_token_id": audio_token_id}}, f)
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump({"eos_token_id": [eos_id]}, f)
    tpl = CHAT_TEMPLATE.replace(
        "{{ message.content }}",
        "{% if message.content is string %}{{ message.content }}"
        "{% else %}{% for part in message.content %}"
        "{% if part.type == 'text' %}{{ part.text }}"
        "{% elif part.type == 'audio_url' %}"
        "<|audio_start|><|audio_pad|><|audio_end|>{% endif %}"
        "{% endfor %}{% endif %}")
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"chat_template": tpl}, f)

    cfg = Qwen3ASRConfig(
        audio=Qwen3ASRAudioConfig(**audio_cfg),
        text=Qwen3Config.from_dict(text_cfg),
        audio_token_id=audio_token_id)
    model = Qwen3ASRModel(cfg, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(0))

    tensors = {}

    def emit(prefix, tree):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                emit(name, v)
            else:
                tensors[name] = np.asarray(v)

    ap = params["audio"]
    at = "thinker.audio_tower"
    for i, lp in enumerate(ap["layers"]):
        base = f"{at}.layers.{i}"
        for ours, theirs in (("ln1", "self_attn_layer_norm"),
                             ("ln2", "final_layer_norm"),
                             ("q", "self_attn.q_proj"),
                             ("k", "self_attn.k_proj"),
                             ("v", "self_attn.v_proj"),
                             ("o", "self_attn.out_proj"),
                             ("fc1", "fc1"), ("fc2", "fc2")):
            p = lp[ours]
            if "b" in p:
                tensors[f"{base}.{theirs}.bias"] = np.asarray(p["b"])
            w = np.asarray(p["w"])
            tensors[f"{base}.{theirs}.weight"] = (
                w.T if theirs not in ("self_attn_layer_norm",
                                      "final_layer_norm") else w)
    for i in (1, 2, 3):
        tensors[f"{at}.conv2d{i}.weight"] = np.asarray(ap[f"conv{i}"]["w"])
        tensors[f"{at}.conv2d{i}.bias"] = np.asarray(ap[f"conv{i}"]["b"])
    tensors[f"{at}.ln_post.weight"] = np.asarray(ap["ln_post"]["w"])
    tensors[f"{at}.ln_post.bias"] = np.asarray(ap["ln_post"]["b"])
    tensors[f"{at}.conv_out.weight"] = np.asarray(ap["conv_out"]["w"]).T
    for n in ("proj1", "proj2"):
        tensors[f"{at}.{n}.weight"] = np.asarray(ap[n]["w"]).T
        tensors[f"{at}.{n}.bias"] = np.asarray(ap[n]["b"])

    tp = params["text"]
    tm = "thinker.model"
    tensors[f"{tm}.embed_tokens.weight"] = np.asarray(tp["embed"]["w"])
    tensors[f"{tm}.norm.weight"] = np.asarray(tp["norm"]["w"])
    L = text_cfg["num_hidden_layers"]
    for i in range(L):
        lp = jax.tree.map(lambda x: np.asarray(x[i]), tp["layers"])
        base = f"{tm}.layers.{i}"
        tensors[f"{base}.input_layernorm.weight"] = lp["ln1"]["w"]
        tensors[f"{base}.post_attention_layernorm.weight"] = lp["ln2"]["w"]
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("o", "o_proj")):
            tensors[f"{base}.self_attn.{theirs}.weight"] = lp[ours]["w"].T
        tensors[f"{base}.self_attn.q_norm.weight"] = lp["q_norm"]["w"]
        tensors[f"{base}.self_attn.k_norm.weight"] = lp["k_norm"]["w"]
        for n in ("gate", "up", "down"):
            tensors[f"{base}.mlp.{n}_proj.weight"] = lp["mlp"][n]["w"].T
    save_file(tensors, os.path.join(path, "model.safetensors"))


@pytest.fixture(scope="module")
def asr_repo(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("asr-tiny"))
    build_tiny_asr_repo(path)
    return path


def test_asr_served_end_to_end(asr_repo, tmp_path):
    from aiohttp import FormData
    from aiohttp.test_utils import TestClient, TestServer

    from aha_tpu.models.loader import load_model
    from aha_tpu.server.app import ServerState, create_app
    from aha_tpu.utils.audio import wav_bytes

    model = load_model("Qwen/Qwen3-ASR-0.6B", asr_repo, max_seq_len=512)

    # 1.5 s of a 440 Hz tone as a WAV upload
    t = np.arange(int(16000 * 1.5)) / 16000
    wav = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    payload = wav_bytes(wav, 16000)

    async def scenario():
        app = create_app(ServerState(model=model))
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            form = FormData()
            form.add_field("file", payload, filename="tone.wav",
                           content_type="audio/wav")
            form.add_field("language", "en")
            r = await client.post("/v1/audio/transcriptions", data=form)
            assert r.status == 200, await r.text()
            body = await r.json()
            assert "text" in body
            assert "<asr_text>" not in body["text"]
        finally:
            await client.close()

    asyncio.run(scenario())


def test_asr_long_audio_chunking(asr_repo):
    """Audio longer than the chunk limit produces multiple prepared chunks."""
    from aha_tpu.models.loader import load_model
    import aha_tpu.models.qwen3_asr_served as served

    model = load_model("Qwen/Qwen3-ASR-0.6B", asr_repo, max_seq_len=512)
    old = served.MAX_ASR_SECONDS
    served.MAX_ASR_SECONDS = 1.0
    try:
        from aha_tpu.params import ChatCompletionParameters
        from aha_tpu.utils.audio import wav_bytes
        import base64

        wav = (0.1 * np.random.default_rng(0).standard_normal(16000 * 3)
               ).astype(np.float32)
        b64 = base64.b64encode(wav_bytes(wav, 16000)).decode()
        mes = ChatCompletionParameters.model_validate({
            "messages": [{"role": "user", "content": [
                {"type": "audio_url",
                 "audio_url": {"url": f"data:audio/wav;base64,{b64}"}}]}],
            "model": "m", "max_tokens": 4})
        chunks = model.prepare_chunks(mes)
        assert len(chunks) == 3
        resp = model.generate(mes)
        assert resp.choices[0].message.content is not None
    finally:
        served.MAX_ASR_SECONDS = old


def test_asr_vad_res_wiring(asr_repo):
    """FireRedVAD → Qwen3ASRChat.asr_vad_res (reference generate.rs:89-98)."""
    from aha_tpu.models.fire_red_vad import VadFrameResult
    from aha_tpu.models.loader import load_model

    model = load_model("Qwen/Qwen3-ASR-0.6B", asr_repo, max_seq_len=512)
    assert model.asr_vad_res(VadFrameResult(is_speech=False,
                                            orig_audio=None)) == ""
    wav = (0.1 * np.random.default_rng(1).standard_normal(16000)
           ).astype(np.float32)
    text = model.asr_vad_res(VadFrameResult(is_speech=True, orig_audio=wav))
    assert isinstance(text, str)
    # deterministic greedy output matches asr_waveform directly
    assert text == model.asr_waveform(wav)


def test_asr_transcriptions_mp3_upload(asr_repo):
    """mp3 upload through /v1/audio/transcriptions (SDL2_mixer decode path,
    reference parity: symphonia handles mp3 in audio_utils.rs:381-589)."""
    import os as _os

    mp3 = ("/opt/venv/lib/python3.12/site-packages/pygame/examples/data/"
           "house_lo.mp3")
    if not _os.path.exists(mp3):
        pytest.skip("no mp3 fixture in image")
    from aiohttp import FormData
    from aiohttp.test_utils import TestClient, TestServer

    from aha_tpu.models.loader import load_model
    from aha_tpu.server.app import ServerState, create_app

    model = load_model("Qwen/Qwen3-ASR-0.6B", asr_repo, max_seq_len=512)
    with open(mp3, "rb") as f:
        payload = f.read()

    async def scenario():
        app = create_app(ServerState(model=model))
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            form = FormData()
            form.add_field("file", payload, filename="clip.mp3",
                           content_type="audio/mpeg")
            r = await client.post("/v1/audio/transcriptions", data=form)
            assert r.status == 200, await r.text()
            body = await r.json()
            assert "text" in body
        finally:
            await client.close()

    asyncio.run(scenario())
