"""GGUF: round-trip parse/dequant, tokenizer-from-metadata, dequant-matmul
kernel, and a quantized Qwen3 loaded end-to-end from a .gguf file."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.io.gguf import (
    GGML_F16,
    GGML_F32,
    GGML_IQ4_NL,
    GGML_Q4_0,
    GGML_Q8_0,
    GGUFFile,
    write_gguf,
)
from aha_tpu.ops.quant_matmul import (
    pack_q8_rows,
    quant_matmul,
    quant_matmul_xla,
)


def test_gguf_roundtrip_metadata_and_tensors(tmp_path):
    rng = np.random.default_rng(0)
    t_f32 = rng.standard_normal((8, 64)).astype(np.float32)
    t_f16 = rng.standard_normal((4, 32)).astype(np.float32)
    t_q8 = rng.standard_normal((16, 128)).astype(np.float32)
    t_q4 = rng.standard_normal((16, 64)).astype(np.float32)
    t_iq4 = rng.standard_normal((8, 64)).astype(np.float32)
    path = str(tmp_path / "test.gguf")
    write_gguf(path, {
        "general.architecture": "qwen3",
        "qwen3.block_count": 2,
        "some.float": 1.5,
        "some.bool": True,
        "some.list": ["a", "b"],
    }, {
        "a.f32": (t_f32, GGML_F32),
        "b.f16": (t_f16, GGML_F16),
        "c.q8": (t_q8, GGML_Q8_0),
        "d.q4": (t_q4, GGML_Q4_0),
        "e.iq4": (t_iq4, GGML_IQ4_NL),
    })
    g = GGUFFile(path)
    assert g.metadata["general.architecture"] == "qwen3"
    assert g.metadata["qwen3.block_count"] == 2
    assert g.metadata["some.float"] == 1.5
    assert g.metadata["some.bool"] is True
    assert g.metadata["some.list"] == ["a", "b"]

    np.testing.assert_array_equal(g.dequantize("a.f32"), t_f32)
    np.testing.assert_allclose(g.dequantize("b.f16"), t_f16, atol=2e-3)
    # Q8_0: 8-bit grid → ~0.8% of block max
    np.testing.assert_allclose(g.dequantize("c.q8"), t_q8, atol=0.05)
    # Q4_0 / IQ4_NL: 4-bit grids
    np.testing.assert_allclose(g.dequantize("d.q4"), t_q4, atol=0.5)
    np.testing.assert_allclose(g.dequantize("e.iq4"), t_iq4, atol=0.5)
    assert g.tensors["c.q8"].type_name == "Q8_0"


def test_gguf_tokenizer_reconstruction(tmp_path):
    # byte-level BPE vocab embedded in metadata (gguf.rs:117-206)
    tokens = ["<s>", "</s>", "h", "e", "l", "o", " ", "he", "ll", "hell"]
    merges = ["h e", "l l", "he ll"]
    token_type = [3, 3, 1, 1, 1, 1, 1, 1, 1, 1]  # first two CONTROL
    path = str(tmp_path / "tok.gguf")
    write_gguf(path, {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.token_type": token_type,
        "tokenizer.ggml.eos_token_id": 1,
        "tokenizer.chat_template": "{{ messages }}",
    }, {"x": (np.zeros((1, 32), np.float32), GGML_F32)})
    g = GGUFFile(path)
    tok = g.build_tokenizer()
    ids = tok.encode("hell", add_special_tokens=False).ids
    assert ids == [tokens.index("hell")]
    assert tok.decode([tokens.index("hell")]) == "hell"
    assert g.eos_token_id() == 1
    assert g.chat_template() == "{{ messages }}"


def _rel_fro(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


def test_quant_matmul_matches_xla_and_exact():
    rng = np.random.default_rng(1)
    M, K, N = 8, 1024, 512
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((N, K)).astype(np.float32) * 0.1
    p = pack_q8_rows(w)
    q, s = jnp.asarray(p["qt"]), jnp.asarray(p["st"])
    ref_exact = x @ w.T
    xla = np.asarray(quant_matmul_xla(jnp.asarray(x), q, s))
    pallas = np.asarray(quant_matmul(jnp.asarray(x), q, s, interpret=True))
    # XLA path is exact per-group dequant: only weight-quant noise
    assert _rel_fro(xla, ref_exact) < 0.01
    # kernel adds int8 activation-group quant (GGML Q8_1 analogue): still
    # within the quantized-inference noise class
    assert _rel_fro(pallas, ref_exact) < 0.02
    assert _rel_fro(pallas, xla) < 0.02


def test_quant_matmul_ragged_n():
    """N that does not divide block_n exercises the ceil-div edge tile
    (the production vocab head N=151936 with bn=2048 ALWAYS hits it —
    remainder 384).  The masked out-of-bounds region reads garbage qt/st;
    valid columns must still match the exact XLA path."""
    rng = np.random.default_rng(5)
    M, K, N = 8, 1024, 384          # N % block_n = 384 % 256 = 128
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((N, K)).astype(np.float32) * 0.1
    p = pack_q8_rows(w)
    q, s = jnp.asarray(p["qt"]), jnp.asarray(p["st"])
    got = np.asarray(quant_matmul(jnp.asarray(x), q, s, block_n=256,
                                  interpret=True))
    assert got.shape == (M, N)
    ref = np.asarray(quant_matmul_xla(jnp.asarray(x), q, s))
    assert _rel_fro(got, ref) < 0.02
    assert np.isfinite(got).all()


def test_quant_matmul_odd_m():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 1024)).astype(np.float32)
    w = rng.standard_normal((512, 1024)).astype(np.float32) * 0.1
    p = pack_q8_rows(w)
    out = np.asarray(quant_matmul(jnp.asarray(x), jnp.asarray(p["qt"]),
                                  jnp.asarray(p["st"]), interpret=True))
    assert out.shape == (3, 512)
    ref = np.asarray(quant_matmul_xla(jnp.asarray(x), jnp.asarray(p["qt"]),
                                      jnp.asarray(p["st"])))
    assert _rel_fro(out, ref) < 0.02


@pytest.fixture(scope="module")
def tiny_qwen3_gguf(tmp_path_factory):
    """Quantize a tiny float Qwen3 into a gguf file with llama.cpp naming."""
    from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=True, max_position_embeddings=256)
    model = Qwen3Model(cfg, max_rope_len=128)
    params = model.init_random(jax.random.PRNGKey(7))

    tensors = {
        "token_embd.weight": (np.asarray(params["embed"]["w"]), GGML_F32),
        "output_norm.weight": (np.asarray(params["norm"]["w"]), GGML_F32),
    }
    for i in range(2):
        lp = jax.tree.map(lambda x: np.asarray(x[i]), params["layers"])
        b = f"blk.{i}."
        tensors[b + "attn_norm.weight"] = (lp["ln1"]["w"], GGML_F32)
        tensors[b + "ffn_norm.weight"] = (lp["ln2"]["w"], GGML_F32)
        tensors[b + "attn_q_norm.weight"] = (lp["q_norm"]["w"], GGML_F32)
        tensors[b + "attn_k_norm.weight"] = (lp["k_norm"]["w"], GGML_F32)
        # gguf stores (out, in): transpose our (in, out)
        tensors[b + "attn_q.weight"] = (lp["q"]["w"].T, GGML_Q8_0)
        tensors[b + "attn_k.weight"] = (lp["k"]["w"].T, GGML_Q8_0)
        tensors[b + "attn_v.weight"] = (lp["v"]["w"].T, GGML_Q8_0)
        tensors[b + "attn_output.weight"] = (lp["o"]["w"].T, GGML_Q8_0)
        tensors[b + "ffn_gate.weight"] = (lp["mlp"]["gate"]["w"].T, GGML_Q8_0)
        tensors[b + "ffn_up.weight"] = (lp["mlp"]["up"]["w"].T, GGML_Q8_0)
        tensors[b + "ffn_down.weight"] = (lp["mlp"]["down"]["w"].T, GGML_Q8_0)

    path = str(tmp_path_factory.mktemp("gguf") / "tiny-qwen3.gguf")
    write_gguf(path, {
        "general.architecture": "qwen3",
        "qwen3.block_count": 2,
        "qwen3.embedding_length": 64,
        "qwen3.feed_forward_length": 128,
        "qwen3.attention.head_count": 4,
        "qwen3.attention.head_count_kv": 2,
        "qwen3.attention.key_length": 16,
        "qwen3.attention.layer_norm_rms_epsilon": 1e-6,
        "qwen3.rope.freq_base": 1000000.0,
        "qwen3.context_length": 256,
    }, tensors)
    return path, model, params


def test_qwen3_from_gguf_matches_float(tiny_qwen3_gguf):
    from aha_tpu.io.gguf_models import load_qwen3_gguf

    path, float_model, float_params = tiny_qwen3_gguf
    model, params, gguf = load_qwen3_gguf(path, dtype=jnp.float32)
    assert model.config.num_hidden_layers == 2
    assert model.config.tie_word_embeddings

    ids = [3, 17, 42, 9, 5]
    cache = model.init_cache(1, len(ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([ids]), cache)
    got = np.asarray(model.logits(params, hidden)[0, -1])

    cache = float_model.init_cache(1, len(ids), jnp.float32)
    hidden, _ = float_model.backbone(float_params, jnp.asarray([ids]), cache)
    ref = np.asarray(float_model.logits(float_params, hidden)[0, -1])
    # Q8 quantization noise only
    assert np.argmax(got) == np.argmax(ref)
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_gguf_head_format_follows_stored_type(tiny_qwen3_gguf, tmp_path):
    """Float-stored heads keep full precision as a dense `w` (requantizing
    would add error the checkpoint doesn't carry); quantized stored heads
    stay block-quantized for the int8 decode kernel."""
    from aha_tpu.io.gguf_models import load_qwen3_gguf

    # tied model, token_embd stored F32 → dense head, transposed embedding
    path, _, _ = tiny_qwen3_gguf
    _, params, _ = load_qwen3_gguf(path, dtype=jnp.float32)
    assert "w" in params["lm_head"] and "qt" not in params["lm_head"]
    np.testing.assert_array_equal(np.asarray(params["lm_head"]["w"]),
                                  np.asarray(params["embed"]["w"]).T)

    # untied model with a Q8_0 output.weight → quantized head
    gguf = GGUFFile(path)
    tensors = {}
    for name, info in gguf.tensors.items():
        w = np.ascontiguousarray(gguf.dequantize(name).reshape(info.shape))
        tensors[name] = (w, info.ggml_type)
    rng = np.random.default_rng(11)
    tensors["output.weight"] = (
        rng.standard_normal((128, 64)).astype(np.float32), GGML_Q8_0)
    p2 = str(tmp_path / "untied.gguf")
    write_gguf(p2, dict(gguf.metadata), tensors)
    _, params2, _ = load_qwen3_gguf(p2, dtype=jnp.float32)
    assert "qt" in params2["lm_head"] and "w" not in params2["lm_head"]

    # untied model with an F16 output.weight → dense head (no requant)
    tensors["output.weight"] = (
        rng.standard_normal((128, 64)).astype(np.float32), GGML_F16)
    p3 = str(tmp_path / "untied-f16.gguf")
    write_gguf(p3, dict(gguf.metadata), tensors)
    _, params3, _ = load_qwen3_gguf(p3, dtype=jnp.float32)
    assert "w" in params3["lm_head"] and "qt" not in params3["lm_head"]
    assert params3["lm_head"]["w"].shape == (64, 128)


def test_qwen3_gguf_generates(tiny_qwen3_gguf):
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.io.gguf_models import load_qwen3_gguf

    path, _, _ = tiny_qwen3_gguf
    model, params, _ = load_qwen3_gguf(path, dtype=jnp.float32)
    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=jnp.float32, max_seq_len=128)
    out = engine.generate_tokens([3, 17, 42], SamplingConfig(), max_tokens=6)
    assert len(out) == 6


@pytest.fixture(scope="module")
def tiny_qwen35_gguf(tmp_path_factory):
    """Quantize a tiny float Qwen3.5 hybrid into a qwen35-arch gguf
    (naming per reference qwen3_5/model.rs new_from_gguf)."""
    from aha_tpu.models.qwen3_5 import Qwen3_5Model, Qwen3_5TextConfig

    cfg = Qwen3_5TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.25, rope_theta=10000000.0,
        max_position_embeddings=256, full_attention_interval=4,
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4)
    model = Qwen3_5Model(cfg, max_rope_len=128)
    params = model.init_random(jax.random.PRNGKey(21))

    tokens = ["<s>", "</s>"] + [f"<t{i}>" for i in range(126)]
    tensors = {
        "token_embd.weight": (np.asarray(params["embed"]["w"]), GGML_F32),
        "output_norm.weight": (
            np.asarray(params["norm"]["w"]), GGML_F32),
    }
    for i, kind in enumerate(cfg.layer_types):
        lp = jax.tree.map(np.asarray, params["layers"][i])
        b = f"blk.{i}."
        tensors[b + "attn_norm.weight"] = (lp["ln1"]["w"], GGML_F32)
        tensors[b + "post_attention_norm.weight"] = (lp["ln2"]["w"],
                                                     GGML_F32)
        tensors[b + "ffn_gate.weight"] = (lp["mlp"]["gate"]["w"].T, GGML_Q8_0)
        tensors[b + "ffn_up.weight"] = (lp["mlp"]["up"]["w"].T, GGML_Q8_0)
        tensors[b + "ffn_down.weight"] = (lp["mlp"]["down"]["w"].T, GGML_Q8_0)
        if kind == "full_attention":
            tensors[b + "attn_q.weight"] = (lp["q"]["w"].T, GGML_Q8_0)
            tensors[b + "attn_k.weight"] = (lp["k"]["w"].T, GGML_Q8_0)
            tensors[b + "attn_v.weight"] = (lp["v"]["w"].T, GGML_Q8_0)
            tensors[b + "attn_output.weight"] = (lp["o"]["w"].T, GGML_Q8_0)
            tensors[b + "attn_q_norm.weight"] = (lp["q_norm"]["w"], GGML_F32)
            tensors[b + "attn_k_norm.weight"] = (lp["k_norm"]["w"], GGML_F32)
        else:
            tensors[b + "attn_qkv.weight"] = (lp["in_proj_qkv"]["w"].T,
                                              GGML_Q8_0)
            tensors[b + "attn_gate.weight"] = (lp["in_proj_z"]["w"].T,
                                               GGML_Q8_0)
            tensors[b + "ssm_beta.weight"] = (lp["in_proj_b"]["w"].T,
                                              GGML_Q8_0)
            tensors[b + "ssm_alpha.weight"] = (lp["in_proj_a"]["w"].T,
                                               GGML_Q8_0)
            tensors[b + "ssm_out.weight"] = (lp["out_proj"]["w"].T,
                                             GGML_Q8_0)
            tensors[b + "ssm_conv1d.weight"] = (
                lp["conv"]["w"].T[:, None, :], GGML_F32)
            tensors[b + "ssm_dt.bias"] = (lp["dt_bias"], GGML_F32)
            tensors[b + "ssm_a"] = (lp["a_log"], GGML_F32)
            tensors[b + "ssm_norm.weight"] = (lp["norm"]["w"], GGML_F32)

    path = str(tmp_path_factory.mktemp("gguf35") / "tiny-qwen35.gguf")
    write_gguf(path, {
        "general.architecture": "qwen35",
        "qwen35.block_count": 4,
        "qwen35.embedding_length": 64,
        "qwen35.feed_forward_length": 128,
        "qwen35.attention.head_count": 4,
        "qwen35.attention.head_count_kv": 2,
        "qwen35.attention.key_length": 16,
        "qwen35.attention.layer_norm_rms_epsilon": 1e-6,
        "qwen35.rope.freq_base": 10000000.0,
        "qwen35.rope.dimension_count": 4,
        "qwen35.full_attention_interval": 4,
        "qwen35.ssm.group_count": 2,
        "qwen35.ssm.time_step_rank": 4,
        "qwen35.ssm.conv_kernel": 4,
        "qwen35.ssm.state_size": 16,
        "qwen35.context_length": 256,
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.merges": [],
        "tokenizer.ggml.token_type": [3] * 128,  # all CONTROL → encodable
        "tokenizer.ggml.eos_token_id": 1,
        "tokenizer.chat_template":
            "{% for m in messages %}{{ m.content }}{% endfor %}",
    }, tensors)
    return path, model, params


def test_qwen3_5_from_gguf_matches_float(tiny_qwen35_gguf):
    from aha_tpu.io.gguf_models import load_qwen3_5_gguf

    path, float_model, float_params = tiny_qwen35_gguf
    model, params, gguf = load_qwen3_5_gguf(path, dtype=jnp.float32)
    assert model.config.layer_types == float_model.config.layer_types
    assert model.config.linear_num_key_heads == 2
    assert abs(model.rotary_dim - 4) < 1e-9

    ids = [3, 17, 42, 9, 5, 27, 31, 8]
    cache = model.init_cache(1, len(ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([ids]), cache,
                               prompt_len=jnp.int32(len(ids)))
    got = np.asarray(model.logits(params, hidden)[0, -1])
    cache = float_model.init_cache(1, len(ids), jnp.float32)
    hidden, _ = float_model.backbone(float_params, jnp.asarray([ids]), cache,
                                     prompt_len=jnp.int32(len(ids)))
    ref = np.asarray(float_model.logits(float_params, hidden)[0, -1])
    assert np.argmax(got) == np.argmax(ref)
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_qwen3_5_gguf_served(tiny_qwen35_gguf):
    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters

    path, _, _ = tiny_qwen35_gguf
    served = load_model("qwen3.5-gguf", path, gguf=path, max_seq_len=128)
    mes = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": "<t5><t9>"}],
        "model": "m", "max_tokens": 4, "temperature": 0.0})
    resp = served.generate(mes)
    assert resp.choices[0].message.role == "assistant"
    resp2 = served.generate(mes)
    assert resp.choices[0].message.content == resp2.choices[0].message.content


def test_q6k_dequant_matches_ggml_scalar_reference():
    """Vectorised Q6_K dequant vs a literal transcription of llama.cpp's
    dequantize_row_q6_K scalar loop, on random raw block bytes."""
    from aha_tpu.io.gguf import GGML_Q6_K, _dequant

    rng = np.random.default_rng(7)
    nb = 5
    raw = rng.integers(0, 256, size=(nb, 210), dtype=np.uint8)
    # keep d (f16 at bytes 208:210) finite/sane
    d16 = np.float16(rng.standard_normal(nb) * 0.1)
    raw[:, 208:210] = d16[:, None].view(np.uint8).reshape(nb, 2)

    got = _dequant(raw.reshape(-1), GGML_Q6_K).reshape(nb, 256)

    # scalar reference: llama.cpp ggml-quants.c dequantize_row_q6_K
    want = np.zeros((nb, 256), np.float32)
    for b in range(nb):
        ql = raw[b, :128].astype(np.int32)
        qh = raw[b, 128:192].astype(np.int32)
        sc = raw[b, 192:208].view(np.int8).astype(np.float32)
        d = np.float32(d16[b])
        y = np.zeros(256, np.float32)
        ql_o = qh_o = sc_o = y_o = 0
        for _half in range(2):
            for l in range(32):
                is_ = l // 16
                q1 = ((ql[ql_o + l] & 0xF) | (((qh[qh_o + l] >> 0) & 3) << 4)) - 32
                q2 = ((ql[ql_o + l + 32] & 0xF) | (((qh[qh_o + l] >> 2) & 3) << 4)) - 32
                q3 = ((ql[ql_o + l] >> 4) | (((qh[qh_o + l] >> 4) & 3) << 4)) - 32
                q4 = ((ql[ql_o + l + 32] >> 4) | (((qh[qh_o + l] >> 6) & 3) << 4)) - 32
                y[y_o + l + 0] = d * sc[sc_o + is_ + 0] * q1
                y[y_o + l + 32] = d * sc[sc_o + is_ + 2] * q2
                y[y_o + l + 64] = d * sc[sc_o + is_ + 4] * q3
                y[y_o + l + 96] = d * sc[sc_o + is_ + 6] * q4
            y_o += 128
            ql_o += 64
            qh_o += 32
            sc_o += 8
        want[b] = y

    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_k_quant_roundtrips():
    """quantize_*_k → _dequant error bounds per bit width (all K formats
    the reference's candle loader accepts)."""
    import numpy as np

    from aha_tpu.io import gguf as g

    rng = np.random.default_rng(7)
    x = rng.standard_normal(256 * 16).astype(np.float32) * 3.0
    cases = [
        (g.quantize_q2_k, g.GGML_Q2_K, 0.45),
        (g.quantize_q3_k, g.GGML_Q3_K, 0.25),
        (g.quantize_q4_k, g.GGML_Q4_K, 0.06),
        (g.quantize_q5_k, g.GGML_Q5_K, 0.03),
        (g.quantize_q6_k, g.GGML_Q6_K, 0.02),
    ]
    peak = np.abs(x).max()
    for qfn, t, tol in cases:
        raw = np.frombuffer(qfn(x).tobytes(), np.uint8)
        y = g._dequant(raw, t)
        assert np.abs(y - x).max() < tol * peak, (t, np.abs(y - x).max())


def test_q5_k_serving_roundtrip(tmp_path):
    """A Q5_K-quantized GGUF loads and serves through the quantized matmul
    path with outputs close to the float model (Q5_K_M is a common publish
    format for the reference's qwen3 GGUF builds)."""
    import numpy as np

    from aha_tpu.io import gguf as g

    rng = np.random.default_rng(3)
    w = rng.standard_normal((64, 512)).astype(np.float32) * 0.05
    x = rng.standard_normal((2, 512)).astype(np.float32)
    raw = np.frombuffer(g.quantize_q5_k(w).tobytes(), np.uint8)
    w_hat = g._dequant(raw, g.GGML_Q5_K).reshape(64, 512)
    ref = x @ w.T
    got = x @ w_hat.T
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_quant_matmul_kernel_odd_k():
    """K not a multiple of 1024 rides the kernel via chunk padding
    (scale-0 groups dequantize to zeros); numerics match the unpadded
    dequant reference within quant noise."""
    from aha_tpu.ops.quant_matmul import (pack_q8_rows, quant_matmul,
                                          quant_matmul_xla)

    rng = np.random.default_rng(11)
    M, K, N = 4, 352, 256          # K % 1024 != 0, K % 32 == 0
    w = rng.standard_normal((N, K)).astype(np.float32)
    x = rng.standard_normal((M, K)).astype(np.float32)
    p = pack_q8_rows(w)
    assert p["qt"].shape[0] == 1024         # chunk-padded
    assert p["st"].shape[0] == 8            # one scale row per 128 rows
    ref = x @ w.T
    got_k = np.asarray(quant_matmul(jnp.asarray(x), jnp.asarray(p["qt"]),
                                    jnp.asarray(p["st"]), interpret=True))
    got_x = np.asarray(quant_matmul_xla(jnp.asarray(x),
                                        jnp.asarray(p["qt"]),
                                        jnp.asarray(p["st"])))
    from tests.test_gguf import _rel_fro
    assert _rel_fro(got_x, ref) < 0.01      # weight quant noise only
    assert _rel_fro(got_k, ref) < 0.025     # + activation-group quant
    assert _rel_fro(got_k, got_x) < 0.02


def test_qwen3_5_gguf_served_batch_slots(tiny_qwen35_gguf):
    """GGUF text chat rides continuous batching: concurrent requests on a
    2-slot engine reproduce the single-stream outputs."""
    import threading

    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters

    path, _, _ = tiny_qwen35_gguf
    single = load_model("qwen3.5-gguf", path, gguf=path, max_seq_len=128)
    batched = load_model("qwen3.5-gguf", path, gguf=path, max_seq_len=128,
                         batch_slots=2)
    assert batched.concurrent_streams == 2

    def req(text):
        return ChatCompletionParameters.model_validate({
            "messages": [{"role": "user", "content": text}],
            "model": "m", "max_tokens": 6, "temperature": 0.0})

    want = [single.generate(req(t)).choices[0].message.content
            for t in ("<t5><t9>", "<t8><t3><t7>")]
    got = [None, None]

    def run(i, t):
        got[i] = batched.generate(req(t)).choices[0].message.content

    ts = [threading.Thread(target=run, args=(i, t))
          for i, t in enumerate(("<t5><t9>", "<t8><t3><t7>"))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert got == want


# ---------------------------------------------------------------------------
# 4-bit nibble-packed kernel grid (quant_matmul_q4)
# ---------------------------------------------------------------------------


def test_pack_q4_rows_affine_roundtrip():
    """4-bit affine pack: the folded s4/b4 rows reconstruct every weight
    within half a quantization step of (max-min)/15 per 128-group, and
    the kernel-facing unpack yields [0, 15] low halves and 16·[-8, 7]
    high halves (the AND/SUB extraction contract)."""
    from aha_tpu.ops.quant_matmul import _unpack_q4, pack_q4_rows

    rng = np.random.default_rng(3)
    N, K = 96, 1024
    w = rng.standard_normal((N, K)).astype(np.float32) * 0.1
    p = pack_q4_rows(w)
    assert p["q4"].shape == (K // 2, N) and p["q4"].dtype == np.int8
    assert p["s4"].shape == (K // 128, N)
    assert p["b4"].shape == (K // 128, N)
    q = np.asarray(_unpack_q4(jnp.asarray(p["q4"])))
    lo, hi = q[:K // 2], q[K // 2:]
    assert lo.min() >= 0 and lo.max() <= 15
    assert hi.min() >= -128 and hi.max() <= 112 and np.all(hi % 16 == 0)
    recon = (q.astype(np.float32) * np.repeat(p["s4"], 128, axis=0)
             + np.repeat(p["b4"], 128, axis=0)).T       # (N, K)
    xb = w.reshape(N, K // 128, 128)
    step = (xb.max(2, keepdims=True) - xb.min(2, keepdims=True)) / 15.0
    assert np.all(np.abs(recon - w) <= np.repeat(step, 128, 2).reshape(N, K)
                  * 0.5 + 1e-7)


def test_pack_q4_rows_preserves_mins():
    """A shifted weight distribution (all-positive, like Q4_1/Q4_K blocks
    with mins) reconstructs tightly — the affine grid spends all 16 codes
    on the occupied range instead of wasting half on the unused sign."""
    from aha_tpu.ops.quant_matmul import pack_q4_rows, quant_matmul_q4_xla

    rng = np.random.default_rng(4)
    N, K = 64, 1024
    w = (rng.standard_normal((N, K)) * 0.05 + 0.5).astype(np.float32)
    x = rng.standard_normal((4, K)).astype(np.float32)
    ref = x @ w.T
    p = pack_q4_rows(w)
    err = _rel_fro(np.asarray(quant_matmul_q4_xla(
        jnp.asarray(x), jnp.asarray(p["q4"]), jnp.asarray(p["s4"]),
        jnp.asarray(p["b4"]))), ref)
    assert err < 0.02


@pytest.mark.parametrize("shift", [0.0, 0.03])
def test_quant_matmul_q4_kernel_matches_xla(shift):
    from aha_tpu.ops.quant_matmul import (pack_q4_rows, quant_matmul_q4,
                                          quant_matmul_q4_xla)

    rng = np.random.default_rng(6)
    M, K, N = 8, 2048, 512
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((N, K)).astype(np.float32) * 0.1 + shift
    p = pack_q4_rows(w)
    b4 = jnp.asarray(p["b4"])
    ref_exact = x @ w.T
    xla = np.asarray(quant_matmul_q4_xla(
        jnp.asarray(x), jnp.asarray(p["q4"]), jnp.asarray(p["s4"]), b4))
    pallas = np.asarray(quant_matmul_q4(
        jnp.asarray(x), jnp.asarray(p["q4"]), jnp.asarray(p["s4"]), b4,
        interpret=True))
    # 4-bit weight grid noise: step = (max-min)/15 per 128-group ≈ 0.36σ
    # for Gaussian weights → ~0.10 relative — an order coarser than q8
    # (that is the bandwidth trade); kernel-vs-xla only adds activation
    # quant
    assert _rel_fro(xla, ref_exact) < 0.15
    assert _rel_fro(pallas, ref_exact) < 0.16
    assert _rel_fro(pallas, xla) < 0.03


def test_quant_matmul_q4_ragged_n_and_odd_m():
    """Ceil-div N grid (vocab heads) and M padding, 4-bit variant."""
    from aha_tpu.ops.quant_matmul import (pack_q4_rows, quant_matmul_q4,
                                          quant_matmul_q4_xla)

    rng = np.random.default_rng(7)
    M, K, N = 3, 1024, 384          # N % block_n = 384 % 256 = 128
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((N, K)).astype(np.float32) * 0.1
    p = pack_q4_rows(w)
    got = np.asarray(quant_matmul_q4(
        jnp.asarray(x), jnp.asarray(p["q4"]), jnp.asarray(p["s4"]),
        jnp.asarray(p["b4"]), block_n=256, interpret=True))
    assert got.shape == (M, N)
    ref = np.asarray(quant_matmul_q4_xla(
        jnp.asarray(x), jnp.asarray(p["q4"]), jnp.asarray(p["s4"]),
        jnp.asarray(p["b4"])))
    assert _rel_fro(got, ref) < 0.03
    assert np.isfinite(got).all()


def test_from_gguf_tensor_routes_formats(tmp_path):
    """Sub-5-bit GGUF formats land on the nibble grid (q4, always with the
    affine b4 row), 5-bit+ on the int8 grid (qt)."""
    from aha_tpu.io.gguf import GGML_Q4_K
    from aha_tpu.ops.quant_matmul import from_gguf_tensor

    rng = np.random.default_rng(8)
    w = rng.standard_normal((64, 256)).astype(np.float32) * 0.1
    path = str(tmp_path / "fmt.gguf")
    write_gguf(path, {"general.architecture": "qwen3"}, {
        "a_q4_0": (w, GGML_Q4_0),
        "b_iq4_nl": (w, GGML_IQ4_NL),
        "c_q4_k": (w + 0.05, GGML_Q4_K),
        "d_q8_0": (w, GGML_Q8_0),
    })
    g = GGUFFile(path)
    pa = from_gguf_tensor(g, "a_q4_0")
    assert "q4" in pa and "b4" in pa
    pb = from_gguf_tensor(g, "b_iq4_nl")
    assert "q4" in pb and "b4" in pb
    pc = from_gguf_tensor(g, "c_q4_k")
    assert "q4" in pc and "b4" in pc
    pd = from_gguf_tensor(g, "d_q8_0")
    assert "qt" in pd and "q4" not in pd


def test_qwen3_gguf_q4_generates(tmp_path):
    """A Q4_0-quantized qwen3 gguf loads onto the 4-bit grid and generates
    greedily, agreeing with the exact-dequant forward's argmax."""
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.io.gguf_models import load_qwen3_gguf
    from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=True, max_position_embeddings=256)
    model = Qwen3Model(cfg, max_rope_len=128)
    params = model.init_random(jax.random.PRNGKey(9))
    tensors = {
        "token_embd.weight": (np.asarray(params["embed"]["w"]), GGML_F32),
        "output_norm.weight": (np.asarray(params["norm"]["w"]), GGML_F32),
    }
    for i in range(2):
        lp = jax.tree.map(lambda x: np.asarray(x[i]), params["layers"])
        b = f"blk.{i}."
        tensors[b + "attn_norm.weight"] = (lp["ln1"]["w"], GGML_F32)
        tensors[b + "ffn_norm.weight"] = (lp["ln2"]["w"], GGML_F32)
        tensors[b + "attn_q_norm.weight"] = (lp["q_norm"]["w"], GGML_F32)
        tensors[b + "attn_k_norm.weight"] = (lp["k_norm"]["w"], GGML_F32)
        tensors[b + "attn_q.weight"] = (lp["q"]["w"].T, GGML_Q4_0)
        tensors[b + "attn_k.weight"] = (lp["k"]["w"].T, GGML_Q4_0)
        tensors[b + "attn_v.weight"] = (lp["v"]["w"].T, GGML_Q4_0)
        tensors[b + "attn_output.weight"] = (lp["o"]["w"].T, GGML_Q4_0)
        tensors[b + "ffn_gate.weight"] = (lp["mlp"]["gate"]["w"].T,
                                          GGML_Q4_0)
        tensors[b + "ffn_up.weight"] = (lp["mlp"]["up"]["w"].T, GGML_Q4_0)
        tensors[b + "ffn_down.weight"] = (lp["mlp"]["down"]["w"].T,
                                          GGML_Q4_0)
    path = str(tmp_path / "tiny-q4.gguf")
    write_gguf(path, {
        "general.architecture": "qwen3",
        "qwen3.block_count": 2,
        "qwen3.embedding_length": 64,
        "qwen3.feed_forward_length": 128,
        "qwen3.attention.head_count": 4,
        "qwen3.attention.head_count_kv": 2,
        "qwen3.attention.key_length": 16,
        "qwen3.attention.layer_norm_rms_epsilon": 1e-6,
        "qwen3.rope.freq_base": 1000000.0,
        "qwen3.context_length": 256,
    }, tensors)
    qmodel, qparams, _ = load_qwen3_gguf(path, dtype=jnp.float32)
    assert "q4" in qparams["layers"]["q"]
    engine = TextEngine(qmodel, qparams, eos_token_ids=[],
                        cache_dtype=jnp.float32, max_seq_len=128)
    toks = engine.generate_tokens([3, 17, 42, 9, 5],
                                  SamplingConfig(temperature=None),
                                  max_tokens=8)
    assert len(toks) == 8 and all(0 <= t < 128 for t in toks)


def test_fuse_decode_params_quantized_exact():
    """Fused quantized qkv/gateup matmuls are bit-identical to separate
    calls (column blocks are independent; the grids scale per column)."""
    from aha_tpu.models.qwen3 import fuse_decode_params
    from aha_tpu.ops.quant_matmul import (pack_q4_rows, pack_q8_rows,
                                          quant_linear)

    rng = np.random.default_rng(10)
    K = 1024
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.float32)

    for pack, asym in ((pack_q8_rows, None), (pack_q4_rows, False),
                       (pack_q4_rows, True)):
        def mk(n, shift=0.0):
            w = rng.standard_normal((n, K)).astype(np.float32) * 0.1 + shift
            p = (pack(w) if asym is None else pack(w, asym=asym))
            return {k: jnp.asarray(v) for k, v in p.items()}

        q, k_, v = mk(256), mk(128, 0.02), mk(128)
        g, u = mk(384), mk(384, 0.01)
        params = {"layers": {"q": q, "k": k_, "v": v,
                             "mlp": {"gate": g, "up": u, "down": mk(K)}},
                  "lm_head": {"w": jnp.zeros((K, 8))}}
        fused = fuse_decode_params(params)
        assert "qkv" in fused["layers"] and "gateup" in fused["layers"]["mlp"]
        sep = jnp.concatenate([quant_linear(q, x, use_pallas=False),
                               quant_linear(k_, x, use_pallas=False),
                               quant_linear(v, x, use_pallas=False)], -1)
        got = quant_linear(fused["layers"]["qkv"], x, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(sep))
        sep_gu = jnp.concatenate([quant_linear(g, x, use_pallas=False),
                                  quant_linear(u, x, use_pallas=False)], -1)
        got_gu = quant_linear(fused["layers"]["mlp"]["gateup"], x,
                              use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got_gu), np.asarray(sep_gu))


def test_fuse_decode_params_mixed_grids_stay_separate():
    """llama.cpp mixes formats per tensor (e.g. Q6_K ffn_down beside Q4_K):
    a q8-packed tensor next to q4-packed ones must not fuse."""
    from aha_tpu.models.qwen3 import fuse_decode_params
    from aha_tpu.ops.quant_matmul import pack_q4_rows, pack_q8_rows

    rng = np.random.default_rng(12)
    K = 1024

    def mk(pack, n):
        return {k: jnp.asarray(v)
                for k, v in pack(rng.standard_normal((n, K))
                                 .astype(np.float32)).items()}

    params = {"layers": {
        "q": mk(pack_q4_rows, 256), "k": mk(pack_q8_rows, 128),
        "v": mk(pack_q4_rows, 128),
        "mlp": {"gate": mk(pack_q4_rows, 384), "up": mk(pack_q4_rows, 384),
                "down": mk(pack_q8_rows, K)}}}
    fused = fuse_decode_params(params)
    assert "qkv" not in fused["layers"]          # mixed grids: untouched
    assert "q" in fused["layers"]
    assert "gateup" in fused["layers"]["mlp"]    # uniform grid: fused


# ---------------------------------------------------------------------------
# Fused quantized SwiGLU (quant_swiglu): one launch for gateup+silu+down
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("gu_fmt,dn_fmt", [("q8", "q8"), ("q4", "q4"),
                                           ("q4", "q8")])
def test_quant_swiglu_matches_two_call_path(gu_fmt, dn_fmt):
    """The fused MLP kernel agrees with exact-dequant XLA composition to
    activation-quant tolerance, for pure and mixed grids (llama.cpp's
    Q4_K_M quantizes ffn_down Q6_K → int8 grid next to q4 gate/up)."""
    from aha_tpu.ops.quant_matmul import (pack_q4_rows, pack_q8_rows,
                                          quant_matmul_q4_xla,
                                          quant_matmul_xla, quant_swiglu,
                                          swiglu_fusable)

    rng = np.random.default_rng(11)
    H, I = 1024, 2048
    wg = rng.standard_normal((I, H)).astype(np.float32) * 0.1
    wu = rng.standard_normal((I, H)).astype(np.float32) * 0.1
    wd = rng.standard_normal((H, I)).astype(np.float32) * 0.1

    def pack(w, fmt):
        p = pack_q8_rows(w) if fmt == "q8" else pack_q4_rows(w)
        return {k: jnp.asarray(v) for k, v in p.items()}

    # fused [gate|up] on the output axis, as fuse_decode_params builds it
    gu = {k: jnp.concatenate([pack(wg, gu_fmt)[k], pack(wu, gu_fmt)[k]],
                             axis=-1) for k in pack(wg, gu_fmt)}
    dn = pack(wd, dn_fmt)
    assert swiglu_fusable(gu, dn, 1)

    x = jnp.asarray(rng.standard_normal((1, 1, H)), jnp.float32)
    got = np.asarray(quant_swiglu(gu, dn, x, interpret=True), np.float32)

    def xla_lin(p, v):
        if "qt" in p:
            return quant_matmul_xla(v, p["qt"], p["st"])
        return quant_matmul_q4_xla(v, p["q4"], p["s4"], p["b4"])

    x2 = x.reshape(1, H)
    h = np.asarray(xla_lin(gu, x2), np.float32)
    g, u = h[:, :I], h[:, I:]
    a = jnp.asarray(g * (1.0 / (1.0 + np.exp(-g))) * u, jnp.float32)
    ref = np.asarray(xla_lin(dn, a), np.float32)
    assert got.shape == (1, 1, H)
    # tolerance: the XLA reference uses exact f32 activations, the kernel
    # int8-quantizes them before BOTH matmuls — two cascaded activation
    # quants on top of 4-bit weight noise measure ~0.046 relative
    assert _rel_fro(got.reshape(1, H), ref) < 0.06


def test_quant_swiglu_fusable_gates():
    """Non-chunk-aligned intermediates, dense weights, and big-M prefill
    fall back to the two-call path."""
    from aha_tpu.ops.quant_matmul import pack_q8_rows, swiglu_fusable

    rng = np.random.default_rng(12)
    H, I = 1024, 2048
    gu = {k: jnp.asarray(v) for k, v in pack_q8_rows(
        rng.standard_normal((2 * I, H)).astype(np.float32)).items()}
    dn = {k: jnp.asarray(v) for k, v in pack_q8_rows(
        rng.standard_normal((H, I)).astype(np.float32)).items()}
    assert swiglu_fusable(gu, dn, 8)
    assert not swiglu_fusable(gu, dn, 4096)          # prefill M
    assert not swiglu_fusable({"w": jnp.zeros((H, 2 * I))}, dn, 1)  # dense
    dn_misaligned = {k: jnp.asarray(v) for k, v in pack_q8_rows(
        rng.standard_normal((H, I + 512)).astype(np.float32)).items()}
    assert not swiglu_fusable(gu, dn_misaligned, 1)  # dKp != gN // 2


def test_engine_swiglu_fusion_numerics_cpu():
    """End-to-end: a quantized qwen3 with fused gateup/down generates the
    same tokens whether the fused MLP kernel path is reachable or not
    (on CPU both route to XLA, exercising the dispatch plumbing)."""
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model
    from aha_tpu.ops.quant_matmul import pack_q8_rows

    cfg = Qwen3Config(vocab_size=128, hidden_size=64, intermediate_size=1024,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=16,
                      tie_word_embeddings=True, max_position_embeddings=256)
    model = Qwen3Model(cfg, max_rope_len=128)
    params = model.init_random(jax.random.PRNGKey(5))

    def quantize(tree):
        out = {}
        for name, p in tree.items():
            if isinstance(p, dict) and "w" in p and p["w"].ndim == 3:
                ws = np.asarray(p["w"].astype(jnp.float32))
                packed = [pack_q8_rows(w.T) for w in ws]
                out[name] = {k: jnp.stack([jnp.asarray(q[k]) for q in packed])
                             for k in packed[0]}
            elif isinstance(p, dict):
                out[name] = quantize(p)
            else:
                out[name] = p
        return out

    qparams = dict(params)
    qparams["layers"] = quantize(params["layers"])
    eng = TextEngine(model, qparams, eos_token_ids=[],
                     cache_dtype=jnp.float32, max_seq_len=128)
    s = SamplingConfig(temperature=None)
    toks = eng.generate_tokens([1, 2, 3, 4], s, max_tokens=8)
    assert len(toks) == 8
    assert all(0 <= t < 128 for t in toks)
