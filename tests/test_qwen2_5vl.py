"""Qwen2.5-VL: geometry vs HF, full-model parity vs HF, decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core import cache as kvmod
from aha_tpu.io.weights import DictSource
from aha_tpu.models.llama import LlamaConfig
from aha_tpu.models.qwen2_5vl import (
    Qwen2_5VLConfig,
    Qwen2_5VLModel,
    VisionConfig,
    get_rope_index,
    vision_geometry,
)

IMG_TOK, VID_TOK, VSTART = 90, 91, 92

TINY = Qwen2_5VLConfig(
    vision=VisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
        in_chans=3, out_hidden_size=48, patch_size=14, spatial_merge_size=2,
        temporal_patch_size=2, window_size=56, fullatt_block_indexes=(1,)),
    text=LlamaConfig(
        vocab_size=100, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=1000000.0, max_position_embeddings=512,
        tie_word_embeddings=True, qkv_bias=True),
    mrope_section=(2, 2, 2),
    image_token_id=IMG_TOK, video_token_id=VID_TOK,
    vision_start_token_id=VSTART)


def _hf_tiny(torch):
    from transformers import Qwen2_5_VLConfig as HFConfig
    from transformers.models.qwen2_5_vl import Qwen2_5_VLForConditionalGeneration

    cfg = HFConfig(
        vision_config=dict(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
            in_chans=3, out_hidden_size=48, patch_size=14,
            spatial_merge_size=2, temporal_patch_size=2, window_size=56,
            fullatt_block_indexes=[1], hidden_act="silu"),
        vocab_size=100, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=1000000.0, max_position_embeddings=512,
        tie_word_embeddings=True,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        image_token_id=IMG_TOK, video_token_id=VID_TOK,
        vision_start_token_id=VSTART, vision_end_token_id=93,
        attention_dropout=0.0)
    torch.manual_seed(0)
    return Qwen2_5_VLForConditionalGeneration(cfg).eval()


def _grid_prompt(grid=(1, 4, 6)):
    t, h, w = grid
    n_units = t * (h // 2) * (w // 2)
    ids = [1, 2, VSTART] + [IMG_TOK] * n_units + [3, 4, 5]
    return ids, n_units


def test_get_rope_index_matches_hf():
    torch = pytest.importorskip("torch")
    hf = _hf_tiny(torch)
    ids, _ = _grid_prompt((1, 4, 6))
    grid = torch.tensor([[1, 4, 6]])
    with torch.no_grad():
        ref_pos, ref_delta = hf.model.get_rope_index(
            torch.tensor([ids]), image_grid_thw=grid)
    pos, delta = get_rope_index(ids, [(1, 4, 6)], TINY)
    np.testing.assert_array_equal(pos, ref_pos[:, 0].numpy())
    assert delta == int(ref_delta[0, 0])


def test_full_model_parity_with_hf():
    torch = pytest.importorskip("torch")
    hf = _hf_tiny(torch)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    model = Qwen2_5VLModel(TINY, max_rope_len=256)
    params = model.load_params(DictSource(sd), dtype=jnp.float32)

    grid = (1, 4, 6)
    ids, n_units = _grid_prompt(grid)
    n_patches = grid[0] * grid[1] * grid[2]
    rng = np.random.default_rng(0)
    patches = rng.standard_normal((n_patches, 3 * 2 * 14 * 14)).astype(np.float32)

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor([grid])).logits.numpy()[0]

    geo = vision_geometry([grid], TINY.vision)
    pos, delta = get_rope_index(ids, [grid], TINY)
    mm = {
        "patches": jnp.asarray(patches),
        "window_index": jnp.asarray(geo["window_index"]),
        "inverse_index": jnp.asarray(geo["inverse_index"]),
        "window_seg": jnp.asarray(geo["window_seg"]),
        "full_seg": jnp.asarray(geo["full_seg"]),
        "pos_hw": jnp.asarray(geo["pos_hw"]),
        "position_ids": jnp.asarray(pos),
        "rope_delta": jnp.int32(delta),
    }
    cache = model.init_cache(1, len(ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([ids]), cache, mm=mm)
    got = np.asarray(model.logits(params, hidden)[0])
    np.testing.assert_allclose(got, ref, atol=2e-2)
    assert (np.argmax(got, -1) == np.argmax(ref, -1)).mean() > 0.9


def test_incremental_decode_with_image():
    model = Qwen2_5VLModel(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(3))
    grid = (1, 4, 6)
    ids, n_units = _grid_prompt(grid)
    n_patches = grid[0] * grid[1] * grid[2]
    rng = np.random.default_rng(1)
    patches = rng.standard_normal((n_patches, 3 * 2 * 14 * 14)).astype(np.float32)
    geo = vision_geometry([grid], TINY.vision)
    pos, delta = get_rope_index(ids, [grid], TINY)
    mm = {"patches": jnp.asarray(patches),
          **{k: jnp.asarray(v) for k, v in geo.items()},
          "position_ids": jnp.asarray(pos), "rope_delta": jnp.int32(delta)}

    # full forward over prompt + 2 forced tokens
    full_ids = ids + [7, 8]
    pos_full, _ = get_rope_index(full_ids, [grid], TINY)
    mm_full = dict(mm, position_ids=jnp.asarray(pos_full))
    cache = model.init_cache(1, len(full_ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([full_ids]), cache,
                               mm=mm_full)
    ref = model.logits(params, hidden)[0]

    # prefill prompt then decode the forced tokens
    cache = model.init_cache(1, 32, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids]), cache, mm=mm)
    cache = kvmod.advance(cache, len(ids))
    outs = [model.logits(params, hidden)[0, -1]]
    for tok in [7]:
        hidden, cache = model.backbone(params, jnp.asarray([[tok]]), cache)
        cache = kvmod.advance(cache, 1)
        outs.append(model.logits(params, hidden)[0, 0])
    got = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref[len(ids) - 1:len(ids) + 1]),
                               atol=5e-3)


def test_vision_padding_invariance():
    """Padded patch buffers must not change real vision features."""
    model = Qwen2_5VLModel(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(3))
    grid = (1, 4, 6)
    n_patches = 24
    rng = np.random.default_rng(2)
    patches = rng.standard_normal((n_patches, 3 * 2 * 14 * 14)).astype(np.float32)
    geo = vision_geometry([grid], TINY.vision)

    mm_exact = {"patches": jnp.asarray(patches),
                **{k: jnp.asarray(v) for k, v in geo.items()}}
    f_exact = model.encode_vision(params["visual"], mm_exact)

    bucket = 64
    unit = 4
    pat = np.zeros((bucket, patches.shape[1]), np.float32)
    pat[:n_patches] = patches

    def pad_idx(a, fill, size):
        out = np.full(size, fill, a.dtype)
        out[:len(a)] = a
        return out

    mm_pad = {
        "patches": jnp.asarray(pat),
        "window_index": jnp.asarray(pad_idx(geo["window_index"], 0, bucket // unit)),
        "inverse_index": jnp.asarray(pad_idx(geo["inverse_index"], 0, bucket // unit)),
        "window_seg": jnp.asarray(pad_idx(geo["window_seg"], -1, bucket)),
        "full_seg": jnp.asarray(pad_idx(geo["full_seg"], -1, bucket)),
        "pos_hw": jnp.asarray(np.concatenate(
            [geo["pos_hw"], np.zeros((bucket - n_patches, 2), np.int32)])),
    }
    f_pad = model.encode_vision(params["visual"], mm_pad)
    n_units = n_patches // unit
    np.testing.assert_allclose(np.asarray(f_exact[:n_units]),
                               np.asarray(f_pad[:n_units]),
                               rtol=1e-4, atol=1e-4)


def test_image_utils_smart_resize():
    from aha_tpu.utils.image import smart_resize

    h, w = smart_resize(300, 500)
    assert h % 28 == 0 and w % 28 == 0
    # preserves aspect approximately
    assert abs(h / w - 300 / 500) < 0.2
    with pytest.raises(ValueError):
        smart_resize(10, 500)


def test_patchify_shapes():
    from aha_tpu.utils.image import patchify_qwen_vl

    frames = np.random.default_rng(0).standard_normal(
        (1, 3, 56, 84)).astype(np.float32)
    patches, grid = patchify_qwen_vl(frames)
    assert grid == (1, 4, 6)
    assert patches.shape == (24, 3 * 2 * 14 * 14)


def test_multimodal_prefix_cache_stream_matches_cold():
    """Same-image prompt extension rides the prefix cache (mm digest key)
    and must match a cold engine exactly, with M-RoPE decode positions
    restored from the snapshotted rope_delta."""
    from aha_tpu.core.engine import TextEngine, bucket_for
    from aha_tpu.core.sampling import SamplingConfig

    model = Qwen2_5VLModel(TINY, max_rope_len=512)
    params = model.init_random(jax.random.PRNGKey(5))
    grid = (1, 8, 8)
    base_ids, _ = _grid_prompt(grid)
    base_ids = base_ids + [(i * 7) % 80 + 1 for i in range(20)]  # ≥ 32 toks
    ext_ids = base_ids + [11, 12, 13, 14]

    def mk_mm(ids):
        n_patches = grid[0] * grid[1] * grid[2]
        rng = np.random.default_rng(4)
        patches = rng.standard_normal(
            (n_patches, 3 * 2 * 14 * 14)).astype(np.float32)
        geo = vision_geometry([grid], TINY.vision)
        pos, delta = get_rope_index(ids, [grid], TINY)
        pos = np.asarray(pos)
        blen = bucket_for(len(ids))
        if blen > pos.shape[1]:
            extra = blen - pos.shape[1]
            cont = pos.max() + 1 + np.arange(extra)
            pos = np.concatenate([pos, np.broadcast_to(cont, (3, extra))], 1)
        return {"patches": jnp.asarray(patches),
                **{k: jnp.asarray(v) for k, v in geo.items()},
                "position_ids": jnp.asarray(pos),
                "rope_delta": jnp.int32(delta)}

    g = SamplingConfig(temperature=None)
    kw = dict(mm_key="img-digest", mm_token_ids=(IMG_TOK, VID_TOK))

    cold = TextEngine(model, params, eos_token_ids=[],
                      cache_dtype=jnp.float32, max_seq_len=256)
    warm = TextEngine(model, params, eos_token_ids=[],
                      cache_dtype=jnp.float32, max_seq_len=256,
                      prefix_cache_entries=4)

    first = warm.generate_tokens(base_ids, g, max_tokens=5,
                                 mm=mk_mm(base_ids), **kw)
    assert len(warm._prefix_entries) == 1
    assert first == cold.generate_tokens(base_ids, g, max_tokens=5,
                                         mm=mk_mm(base_ids))
    got = warm.generate_tokens(ext_ids, g, max_tokens=5,
                               mm=mk_mm(ext_ids), **kw)
    want = cold.generate_tokens(ext_ids, g, max_tokens=5, mm=mk_mm(ext_ids))
    assert got == want
