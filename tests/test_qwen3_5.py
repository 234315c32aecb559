"""Qwen3.5 GatedDeltaNet: delta-rule parity vs HF qwen3_next reference
implementations, prefill/decode consistency, padded-prefill invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core import cache as kvmod
from aha_tpu.models.qwen3_5 import (
    Qwen3_5Model,
    Qwen3_5TextConfig,
    chunk_gated_delta_rule,
    recurrent_gated_delta_rule,
    _l2norm,
)

TINY = Qwen3_5TextConfig(
    vocab_size=120, hidden_size=64, intermediate_size=128,
    num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, rope_theta=10000000.0, partial_rotary_factor=0.25,
    max_position_embeddings=512, full_attention_interval=4,
    linear_num_value_heads=4, linear_num_key_heads=2,
    linear_key_head_dim=16, linear_value_head_dim=16,
    linear_conv_kernel_dim=4)


def _rand_inputs(B=1, S=100, H=4, Dk=16, Dv=16, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, S, H, Dk)).astype(np.float32)
    k = rng.standard_normal((B, S, H, Dk)).astype(np.float32)
    v = rng.standard_normal((B, S, H, Dv)).astype(np.float32)
    g = -np.abs(rng.standard_normal((B, S, H))).astype(np.float32) * 0.1
    beta = (1 / (1 + np.exp(-rng.standard_normal((B, S, H))))).astype(
        np.float32)
    return q, k, v, g, beta


def test_chunk_rule_matches_hf_reference():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen3_next.modeling_qwen3_next import (
        torch_chunk_gated_delta_rule,
    )

    q, k, v, g, beta = _rand_inputs(S=100)
    ref = torch_chunk_gated_delta_rule(
        torch.tensor(q), torch.tensor(k), torch.tensor(v), torch.tensor(g),
        torch.tensor(beta), chunk_size=64, use_qk_l2norm_in_kernel=True)
    if isinstance(ref, tuple):
        ref = ref[0]
    B, S, H, Dk = q.shape
    state0 = jnp.zeros((B, H, Dk, v.shape[-1]), jnp.float32)
    got, _ = chunk_gated_delta_rule(
        _l2norm(jnp.asarray(q)), _l2norm(jnp.asarray(k)), jnp.asarray(v),
        jnp.asarray(g), jnp.asarray(beta), state0)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_recurrent_rule_matches_hf_reference():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen3_next.modeling_qwen3_next import (
        torch_recurrent_gated_delta_rule,
    )

    q, k, v, g, beta = _rand_inputs(S=6, seed=3)
    B, S, H, Dk = q.shape
    ref = torch_recurrent_gated_delta_rule(
        torch.tensor(q), torch.tensor(k), torch.tensor(v), torch.tensor(g),
        torch.tensor(beta), initial_state=None, output_final_state=False,
        use_qk_l2norm_in_kernel=True)
    if isinstance(ref, tuple):
        ref = ref[0]
    state = jnp.zeros((B, H, Dk, v.shape[-1]), jnp.float32)
    outs = []
    for t in range(S):
        o, state = recurrent_gated_delta_rule(
            _l2norm(jnp.asarray(q[:, t:t + 1])),
            _l2norm(jnp.asarray(k[:, t:t + 1])),
            jnp.asarray(v[:, t:t + 1]), jnp.asarray(g[:, t:t + 1]),
            jnp.asarray(beta[:, t:t + 1]), state)
        outs.append(o)
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_chunk_then_recurrent_consistent():
    """Chunked prefill state must continue correctly into recurrent decode."""
    q, k, v, g, beta = _rand_inputs(S=80, seed=5)
    B, S, H, Dk = q.shape
    state0 = jnp.zeros((B, H, Dk, v.shape[-1]), jnp.float32)
    qn, kn = _l2norm(jnp.asarray(q)), _l2norm(jnp.asarray(k))
    full, _ = chunk_gated_delta_rule(qn, kn, jnp.asarray(v), jnp.asarray(g),
                                     jnp.asarray(beta), state0)

    split = 70
    head, state = chunk_gated_delta_rule(
        qn[:, :split], kn[:, :split], jnp.asarray(v[:, :split]),
        jnp.asarray(g[:, :split]), jnp.asarray(beta[:, :split]), state0)
    outs = [head]
    for t in range(split, S):
        o, state = recurrent_gated_delta_rule(
            qn[:, t:t + 1], kn[:, t:t + 1], jnp.asarray(v[:, t:t + 1]),
            jnp.asarray(g[:, t:t + 1]), jnp.asarray(beta[:, t:t + 1]), state)
        outs.append(o)
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=1e-3, atol=1e-3)


@pytest.fixture(scope="module")
def tiny_model():
    model = Qwen3_5Model(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(9))
    return model, params


def full_logits(model, params, ids):
    cache = model.init_cache(1, max(len(ids), 8), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([ids]), cache,
                               prompt_len=jnp.int32(len(ids)))
    return model.logits(params, hidden)[0]


def test_incremental_decode_matches_full(tiny_model):
    model, params = tiny_model
    ids = [3, 17, 42, 9, 5, 27, 31, 8, 11, 2]
    ref = full_logits(model, params, ids)

    split = 6
    cache = model.init_cache(1, 32, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids[:split]]), cache,
                                   prompt_len=jnp.int32(split))
    cache = kvmod.advance(cache, split)
    outs = [model.logits(params, hidden)[0, -1]]
    for tok in ids[split:-1]:
        hidden, cache = model.backbone(params, jnp.asarray([[tok]]), cache)
        cache = kvmod.advance(cache, 1)
        outs.append(model.logits(params, hidden)[0, 0])
    got = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[split - 1:-1]),
                               atol=5e-3)
    assert jnp.argmax(got, -1).tolist() == \
        jnp.argmax(ref[split - 1:-1], -1).tolist()


def test_padded_prefill_state_invariance(tiny_model):
    """Right-padded prefill must leave conv + recurrent state identical to
    exact-length prefill (padded positions are no-ops)."""
    model, params = tiny_model
    ids = [3, 17, 42, 9, 5, 27]
    cache_a = model.init_cache(1, 32, jnp.float32)
    _, cache_a = model.backbone(params, jnp.asarray([ids]), cache_a,
                                prompt_len=jnp.int32(len(ids)))
    padded = ids + [0] * 10
    cache_b = model.init_cache(1, 32, jnp.float32)
    hidden_b, cache_b = model.backbone(params, jnp.asarray([padded]), cache_b,
                                       prompt_len=jnp.int32(len(ids)))
    np.testing.assert_allclose(np.asarray(cache_a["rec"]),
                               np.asarray(cache_b["rec"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache_a["conv"]),
                               np.asarray(cache_b["conv"]),
                               rtol=1e-4, atol=1e-5)
    # and decoding from the padded cache matches the exact continuation
    ref = full_logits(model, params, ids + [31])
    cache_b = kvmod.advance(cache_b, len(ids))
    hidden, _ = model.backbone(params, jnp.asarray([[31]]), cache_b)
    got = model.logits(params, hidden)[0, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[len(ids)]),
                               atol=5e-3)


def test_engine_generates(tiny_model):
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig

    model, params = tiny_model
    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=jnp.float32, max_seq_len=256)
    out = engine.generate_tokens([3, 17, 42], SamplingConfig(), max_tokens=8)
    assert len(out) == 8
    out2 = engine.generate_tokens([3, 17, 42], SamplingConfig(), max_tokens=8)
    assert out == out2


# ---------------------------------------------------------------------------
# Qwen3.5-VL: deepstack vision on the hybrid decoder (model.rs:1039-1475)
# ---------------------------------------------------------------------------

IMG_TOK, VID_TOK, VSTART = 90, 91, 92


def _vl_config():
    from aha_tpu.models.qwen3_5 import Qwen3_5Config
    from aha_tpu.models.qwen3vl import Qwen3VLVisionConfig

    text = Qwen3_5TextConfig(
        vocab_size=120, hidden_size=48, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10000000.0, partial_rotary_factor=0.5,
        max_position_embeddings=512, full_attention_interval=4,
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4)
    vision = Qwen3VLVisionConfig(
        depth=3, hidden_size=32, intermediate_size=64, num_heads=2,
        in_channels=3, out_hidden_size=48, patch_size=16,
        spatial_merge_size=2, temporal_patch_size=2,
        num_position_embeddings=16, deepstack_visual_indexes=(0, 1))
    return Qwen3_5Config(text=text, vision=vision, mrope_section=(2, 1, 1),
                         image_token_id=IMG_TOK, video_token_id=VID_TOK,
                         vision_start_token_id=VSTART)


@pytest.fixture(scope="module")
def tiny_vl():
    cfg = _vl_config()
    model = Qwen3_5Model(cfg.text, max_rope_len=256, vl_config=cfg)
    params = model.init_random(jax.random.PRNGKey(11))
    return model, params, cfg


def _vl_mm(cfg, grid, ids, seed=0):
    from aha_tpu.models.qwen3vl import (
        get_rope_index_qwen3vl,
        vision_geometry_qwen3vl,
    )

    n_patches = grid[0] * grid[1] * grid[2]
    rng = np.random.default_rng(seed)
    patches = rng.standard_normal(
        (n_patches, 3 * 2 * 16 * 16)).astype(np.float32)
    geo = vision_geometry_qwen3vl([grid], cfg.vision)
    pos, delta = get_rope_index_qwen3vl(ids, [grid], cfg)
    return {"patches": jnp.asarray(patches),
            **{k: jnp.asarray(v) for k, v in geo.items()},
            "position_ids": jnp.asarray(pos), "rope_delta": jnp.int32(delta)}


def _vl_prompt(grid=(1, 4, 6)):
    n_units = grid[0] * (grid[1] // 2) * (grid[2] // 2)
    return [1, 2, VSTART] + [IMG_TOK] * n_units + [3, 4, 5], n_units


def test_vl_incremental_decode_with_image(tiny_vl):
    """Image prefill (M-RoPE + deepstack through the hybrid stack) must be
    consistent with rope_delta-shifted recurrent decode."""
    from aha_tpu.models.qwen3vl import get_rope_index_qwen3vl

    model, params, cfg = tiny_vl
    grid = (1, 4, 6)
    ids, _ = _vl_prompt(grid)
    full_ids = ids + [7, 8]
    mm = _vl_mm(cfg, grid, ids, seed=1)
    pos_full, _ = get_rope_index_qwen3vl(full_ids, [grid], cfg)
    mm_full = dict(mm, position_ids=jnp.asarray(pos_full))

    cache = model.init_cache(1, len(full_ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([full_ids]), cache,
                               mm=mm_full,
                               prompt_len=jnp.int32(len(full_ids)))
    ref = model.logits(params, hidden)[0]

    cache = model.init_cache(1, 32, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids]), cache, mm=mm,
                                   prompt_len=jnp.int32(len(ids)))
    cache = kvmod.advance(cache, len(ids))
    outs = [model.logits(params, hidden)[0, -1]]
    hidden, cache = model.backbone(params, jnp.asarray([[7]]), cache)
    cache = kvmod.advance(cache, 1)
    outs.append(model.logits(params, hidden)[0, 0])
    got = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref[len(ids) - 1:len(ids) + 1]),
                               atol=5e-3)


def test_vl_padded_prefill_invariance(tiny_vl):
    """Right-padding the image prompt must not change the next-token logits
    (conv/rec state placed at true prompt end, pads masked)."""
    model, params, cfg = tiny_vl
    grid = (1, 4, 6)
    ids, _ = _vl_prompt(grid)
    mm = _vl_mm(cfg, grid, ids, seed=2)

    cache = model.init_cache(1, 32, jnp.float32)
    h_a, cache_a = model.backbone(params, jnp.asarray([ids]), cache, mm=mm,
                                  prompt_len=jnp.int32(len(ids)))
    padded = ids + [0] * 6
    pos = np.asarray(mm["position_ids"])
    cont = pos.max() + 1 + np.arange(6)
    pos_pad = np.concatenate([pos, np.broadcast_to(cont, (3, 6))], axis=1)
    mm_pad = dict(mm, position_ids=jnp.asarray(pos_pad))
    cache = model.init_cache(1, 32, jnp.float32)
    h_b, cache_b = model.backbone(params, jnp.asarray([padded]), cache,
                                  mm=mm_pad, prompt_len=jnp.int32(len(ids)))
    np.testing.assert_allclose(np.asarray(h_a[0, len(ids) - 1]),
                               np.asarray(h_b[0, len(ids) - 1]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache_a["rec"]),
                               np.asarray(cache_b["rec"]),
                               rtol=1e-4, atol=1e-5)


def test_vl_deepstack_and_image_change_output(tiny_vl):
    model, params, cfg = tiny_vl
    grid = (1, 4, 6)
    ids, _ = _vl_prompt(grid)
    mm = _vl_mm(cfg, grid, ids, seed=3)
    cache = model.init_cache(1, len(ids), jnp.float32)
    h1, _ = model.backbone(params, jnp.asarray([ids]), cache, mm=mm,
                           prompt_len=jnp.int32(len(ids)))
    # different image → different logits at the text tail
    mm2 = _vl_mm(cfg, grid, ids, seed=4)
    cache = model.init_cache(1, len(ids), jnp.float32)
    h2, _ = model.backbone(params, jnp.asarray([ids]), cache, mm=mm2,
                           prompt_len=jnp.int32(len(ids)))
    assert not np.allclose(np.asarray(h1[0, -1]), np.asarray(h2[0, -1]))
    # zeroed deepstack mergers → different logits (injection is live)
    p2 = jax.tree.map(lambda x: x, params)
    for mp in p2["visual"]["ds_mergers"]:
        mp["fc2"]["w"] = jnp.zeros_like(mp["fc2"]["w"])
        mp["fc2"]["b"] = jnp.zeros_like(mp["fc2"]["b"])
    cache = model.init_cache(1, len(ids), jnp.float32)
    h3, _ = model.backbone(p2, jnp.asarray([ids]), cache, mm=mm,
                           prompt_len=jnp.int32(len(ids)))
    assert not np.allclose(np.asarray(h1), np.asarray(h3))


def test_vl_config_from_file(tmp_path):
    import json

    from aha_tpu.models.qwen3_5 import Qwen3_5Config

    cfg_d = {
        "architectures": ["Qwen3_5ForConditionalGeneration"],
        "image_token_id": 151655,
        "video_token_id": 151656,
        "vision_start_token_id": 151652,
        "text_config": {
            "vocab_size": 248, "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 8, "num_attention_heads": 4,
            "num_key_value_heads": 2, "head_dim": 16,
            "full_attention_interval": 4,
            "linear_num_value_heads": 4, "linear_num_key_heads": 2,
            "linear_key_head_dim": 16, "linear_value_head_dim": 16,
            "rope_parameters": {"rope_theta": 10000000.0,
                                "partial_rotary_factor": 0.25,
                                "mrope_section": [11, 3, 2],
                                "mrope_interleaved": True},
        },
        "vision_config": {"depth": 3, "hidden_size": 32,
                          "out_hidden_size": 64,
                          "deepstack_visual_indexes": [0, 1]},
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg_d))
    cfg = Qwen3_5Config.from_file(str(tmp_path))
    assert cfg.vision is not None and cfg.vision.depth == 3
    assert cfg.mrope_section == (11, 3, 2)
    assert cfg.text.layer_types[3] == "full_attention"
    assert cfg.text.layer_types[0] == "linear_attention"
    assert cfg.image_token_id == 151655
    # text-only config → no vision
    (tmp_path / "config.json").write_text(json.dumps(cfg_d["text_config"]))
    cfg2 = Qwen3_5Config.from_file(str(tmp_path))
    assert cfg2.vision is None


def test_fused_decode_params_bit_identical(tiny_model):
    """fuse_qwen3_5_decode_params ([q|k|v], [qkv|z|b|a], [gate|up]):
    column blocks of a matmul are independent, so fused outputs match the
    separate matmuls up to XLA's shape-dependent reduction tiling."""
    from aha_tpu.models.qwen3_5 import fuse_qwen3_5_decode_params

    model, params = tiny_model
    fused = fuse_qwen3_5_decode_params(params)
    kinds = {k for lp in fused["layers"] for k in lp}
    assert "qkv" in kinds and "in_proj" in kinds
    assert "q" not in kinds and "in_proj_qkv" not in kinds
    assert any("gateup" in lp.get("mlp", {}) for lp in fused["layers"])
    ids = [3, 17, 42, 9, 5, 8]
    ref = np.asarray(full_logits(model, params, ids))
    got = np.asarray(full_logits(model, fused, ids))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
