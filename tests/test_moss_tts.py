"""Moss-TTS-Nano: embeds masking, audio sampling semantics, generation
loop shape/determinism, torch state-dict loading roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.models.gpt2 import GPT2Config
from aha_tpu.models.moss_tts import (
    MossTTSConfig,
    MossTTSModel,
    _sample_audio_token,
)

TINY = MossTTSConfig(
    gpt2=GPT2Config(vocab_size=64, n_positions=64, n_embd=32, n_layer=2,
                    n_head=4),
    n_vq=3, audio_codebook_sizes=(16, 16, 16), local_transformer_layers=1,
    audio_pad_token_id=15, audio_assistant_slot_token_id=2,
    audio_end_token_id=3)


@pytest.fixture(scope="module")
def tiny():
    model = MossTTSModel(TINY)
    params = model.init_random(jax.random.PRNGKey(0))
    return model, params


def test_inputs_embeds_pad_masking(tiny):
    model, params = tiny
    row_pad = np.asarray([[[5, 15, 15, 15]]], np.int32)   # all channels pad
    row_tok = np.asarray([[[5, 1, 15, 15]]], np.int32)    # channel 0 active
    e_pad = model.build_inputs_embeds(params, jnp.asarray(row_pad))
    e_tok = model.build_inputs_embeds(params, jnp.asarray(row_tok))
    wte = np.asarray(params["transformer"]["wte"]["w"][5])
    np.testing.assert_allclose(np.asarray(e_pad[0, 0]), wte, rtol=1e-6)
    emb0 = np.asarray(params["audio_embeddings"][0]["w"][1])
    np.testing.assert_allclose(np.asarray(e_tok[0, 0]), wte + emb0,
                               rtol=1e-5)


def test_sample_audio_token_semantics():
    rng = np.random.default_rng(0)
    logits = np.full(16, -10.0, np.float32)
    logits[7] = 10.0
    assert _sample_audio_token(logits, [], rng) == 7
    # repetition penalty pushes a previously-emitted dominant token down
    logits2 = np.zeros(16, np.float32)
    logits2[7] = 2.0
    logits2[8] = 1.9
    counts = {7: 0, 8: 0}
    for i in range(50):
        t = _sample_audio_token(logits2, [7], np.random.default_rng(i),
                                temperature=0.1, repetition_penalty=2.0)
        counts[t] = counts.get(t, 0) + 1
    assert counts[8] > counts[7]  # penalized 7 → 1.0 < 1.9


def _bias_slot(params, stop=False):
    """Pin the local transformer's final hidden to a constant (ln_f w=0,
    b=1) and point the text head at slot (or end when stop=True) so the
    loop's continue/stop branch is deterministic."""
    import jax

    p2 = jax.tree.map(lambda x: x, params)
    lt = p2["local_transformer"]["ln_f"]
    p2["local_transformer"]["ln_f"] = {
        "w": jnp.zeros_like(lt["w"]), "b": jnp.ones_like(lt["b"])}
    w = np.asarray(p2["text_lm_head"]["w"]).copy()
    w[:, TINY.audio_assistant_slot_token_id] = -1.0 if stop else 1.0
    w[:, TINY.audio_end_token_id] = 1.0 if stop else -1.0
    p2["text_lm_head"]["w"] = jnp.asarray(w)
    return p2


def test_generate_frames_shape_and_determinism(tiny):
    model, params = tiny
    params = _bias_slot(params)
    prompt = np.zeros((4, 1 + TINY.n_vq), np.int32)
    prompt[:, 0] = [4, 5, 6, TINY.audio_assistant_slot_token_id]
    prompt[:, 1:] = TINY.audio_pad_token_id
    frames = model.generate(params, prompt, max_frames=5, seed=1)
    assert frames.shape == (5, TINY.n_vq)  # slot always wins → max_frames
    assert (frames < 16).all() and (frames >= 0).all()
    frames2 = model.generate(params, prompt, max_frames=5, seed=1)
    np.testing.assert_array_equal(frames, frames2)
    # end-biased head stops immediately
    frames3 = model.generate(_bias_slot(params, stop=True), prompt,
                             max_frames=5, seed=1)
    assert frames3.shape == (0, TINY.n_vq)


def test_load_params_roundtrip(tiny):
    torch = pytest.importorskip("torch")
    from aha_tpu.io.weights import DictSource

    model, params = tiny
    sd = {}

    def put_gpt2(prefix, gp, with_wte=True):
        if with_wte:
            sd[prefix + "wte.weight"] = np.asarray(gp["wte"]["w"])
        sd[prefix + "wpe.weight"] = np.asarray(gp["wpe"]["w"])
        sd[prefix + "ln_f.weight"] = np.asarray(gp["ln_f"]["w"])
        sd[prefix + "ln_f.bias"] = np.asarray(gp["ln_f"]["b"])
        L = gp["layers"]["ln1"]["w"].shape[0]
        for i in range(L):
            h = f"{prefix}h.{i}."
            sd[h + "ln_1.weight"] = np.asarray(L_(gp, "ln1", "w", i))
            sd[h + "ln_1.bias"] = np.asarray(L_(gp, "ln1", "b", i))
            sd[h + "ln_2.weight"] = np.asarray(L_(gp, "ln2", "w", i))
            sd[h + "ln_2.bias"] = np.asarray(L_(gp, "ln2", "b", i))
            for src_n, dst_n in (("c_attn", "attn.c_attn"),
                                 ("c_proj", "attn.c_proj"),
                                 ("mlp_fc", "mlp.c_fc"),
                                 ("mlp_proj", "mlp.c_proj")):
                sd[h + dst_n + ".weight"] = np.asarray(
                    L_(gp, src_n, "w", i))
                sd[h + dst_n + ".bias"] = np.asarray(L_(gp, src_n, "b", i))

    def L_(gp, layer, leaf, i):
        return gp["layers"][layer][leaf][i]

    put_gpt2("transformer.", params["transformer"])
    put_gpt2("local_transformer.", params["local_transformer"],
             with_wte=False)
    for i, e in enumerate(params["audio_embeddings"]):
        sd[f"audio_embeddings.{i}.weight"] = np.asarray(e["w"])
    sd["text_lm_head.weight"] = np.asarray(params["text_lm_head"]["w"]).T
    for i, hd in enumerate(params["audio_lm_heads"]):
        sd[f"audio_lm_heads.{i}.weight"] = np.asarray(hd["w"]).T

    loaded = model.load_params(DictSource(sd))
    prompt = np.zeros((3, 1 + TINY.n_vq), np.int32)
    prompt[:, 0] = [4, 5, TINY.audio_assistant_slot_token_id]
    prompt[:, 1:] = TINY.audio_pad_token_id
    a = model.generate(_bias_slot(params), prompt, max_frames=3, seed=7)
    b = model.generate(_bias_slot(loaded), prompt, max_frames=3, seed=7)
    assert a.shape == (3, TINY.n_vq)
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# Processor (moss_tts_nano/processor.rs) + TTS text normalization
# ---------------------------------------------------------------------------


def test_prepare_tts_text():
    from aha_tpu.utils.text import contains_cjk, prepare_tts_text

    # non-CJK: capitalize, punctuate, pad short texts (utils/mod.rs:759-799)
    assert prepare_tts_text("hello world this is a test") == \
        "Hello world this is a test."
    assert prepare_tts_text("hi there") == " " * 8 + "Hi there."
    assert prepare_tts_text("Already. ") == " " * 8 + "Already."
    assert prepare_tts_text("line\none  two\r three four five") == \
        "Line one two three four five."
    # CJK: append sentence-final punctuation only if missing (:746-757)
    assert prepare_tts_text("你好世界") == "你好世界。"
    assert prepare_tts_text("你好世界！") == "你好世界！"
    assert contains_cjk("abcあ")
    assert not contains_cjk("abc")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        prepare_tts_text("   ")


def _toy_processor():
    from aha_tpu.models.moss_tts_processor import (MossPromptIds,
                                                   MossTTSProcessor)

    cfg = MossTTSConfig(gpt2=GPT2Config(
        vocab_size=300, n_positions=512, n_embd=32, n_layer=1, n_head=2),
        n_vq=3, audio_codebook_sizes=(16,) * 3,
        local_transformer_layers=1, audio_pad_token_id=15)
    ids = MossPromptIds(
        im_start_token_id=200, im_end_token_id=201, audio_start_token_id=202,
        audio_end_token_id=203, audio_user_slot_token_id=204,
        audio_assistant_slot_token_id=205, audio_pad_token_id=15)
    # deterministic toy "tokenizer": one id per char, offset into vocab
    enc = lambda s: [10 + (ord(ch) % 100) for ch in s]
    return MossTTSProcessor(cfg, ids, enc), ids, enc


def test_processor_tts_mode_rows():
    proc, ids, enc = _toy_processor()
    rows = proc.build_inference_input_ids("hello world one two three",
                                          mode="tts")
    assert rows.ndim == 2 and rows.shape[1] == 4      # 1 + n_vq
    # every text row is audio-padded
    assert (rows[:, 1:] == 15).all()
    # layout: im_start … ends with audio_start
    assert rows[0, 0] == ids.im_start_token_id
    assert rows[-1, 0] == ids.audio_start_token_id


def test_processor_voice_clone_rows():
    import numpy as np

    proc, ids, enc = _toy_processor()
    codes = np.arange(12, dtype=np.int32).reshape(4, 3) % 16
    rows = proc.build_inference_input_ids(
        "hello world one two three", prompt_audio_codes=codes,
        mode="voice_clone")
    # the 4 audio rows carry the user slot token + the codebook ids
    slot_rows = rows[rows[:, 0] == ids.audio_user_slot_token_id]
    assert slot_rows.shape == (4, 4)
    assert (slot_rows[:, 1:] == codes).all()
    # audio_end follows the audio rows (processor.rs:140-144)
    i = int(np.where(rows[:, 0] == ids.audio_user_slot_token_id)[0][-1])
    assert rows[i + 1, 0] == ids.audio_end_token_id


def test_processor_mode_validation():
    import numpy as np
    import pytest as _pytest

    proc, ids, enc = _toy_processor()
    with _pytest.raises(ValueError):          # voice_clone needs audio
        proc.build_inference_input_ids("some text here now ok",
                                       mode="voice_clone")
    with _pytest.raises(ValueError):          # continuation needs both
        proc.build_inference_input_ids(
            "some text here now ok", prompt_text="prompt words here ok now",
            mode="tts")
    # continuation with both: prompt_text tokens precede target tokens
    codes = np.zeros((2, 3), np.int32)
    rows = proc.build_inference_input_ids(
        "target words go here now", prompt_text="prompt words here ok now",
        prompt_audio_codes=codes, mode="tts")
    assert (rows[-2:, 0] == ids.audio_assistant_slot_token_id).all()
