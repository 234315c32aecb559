"""Qwen3-VL: HF full-model parity (deepstack + interleaved M-RoPE) and
decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core import cache as kvmod
from aha_tpu.io.weights import DictSource
from aha_tpu.models.qwen3 import Qwen3Config
from aha_tpu.models.qwen3vl import (
    Qwen3VLConfig,
    Qwen3VLModel,
    Qwen3VLVisionConfig,
    get_rope_index_qwen3vl,
    vision_geometry_qwen3vl,
)

IMG_TOK, VID_TOK, VSTART = 90, 91, 92

TINY = Qwen3VLConfig(
    vision=Qwen3VLVisionConfig(
        depth=3, hidden_size=32, intermediate_size=64, num_heads=2,
        in_channels=3, out_hidden_size=48, patch_size=16,
        spatial_merge_size=2, temporal_patch_size=2,
        num_position_embeddings=16, deepstack_visual_indexes=(0, 1)),
    text=Qwen3Config(
        vocab_size=100, hidden_size=48, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, rope_theta=1000000.0, max_position_embeddings=512,
        tie_word_embeddings=True),
    mrope_section=(2, 2, 2),
    image_token_id=IMG_TOK, video_token_id=VID_TOK,
    vision_start_token_id=VSTART)


def _hf_tiny(torch):
    from transformers import Qwen3VLConfig as HFConfig
    from transformers.models.qwen3_vl import Qwen3VLForConditionalGeneration

    cfg = HFConfig(
        vision_config=dict(
            depth=3, hidden_size=32, intermediate_size=64, num_heads=2,
            in_channels=3, out_hidden_size=48, patch_size=16,
            spatial_merge_size=2, temporal_patch_size=2,
            num_position_embeddings=16, deepstack_visual_indexes=[0, 1],
            hidden_act="gelu"),
        text_config=dict(
            vocab_size=100, hidden_size=48, intermediate_size=96,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, head_dim=12, rope_theta=1000000.0,
            max_position_embeddings=512, tie_word_embeddings=True,
            rope_scaling={"rope_type": "default", "mrope_section": [2, 2, 2],
                          "mrope_interleaved": True},
            attention_dropout=0.0),
        image_token_id=IMG_TOK, video_token_id=VID_TOK,
        vision_start_token_id=VSTART, vision_end_token_id=93)
    torch.manual_seed(0)
    return Qwen3VLForConditionalGeneration(cfg).eval()


def _grid_prompt(grid=(1, 4, 6)):
    t, h, w = grid
    n_units = t * (h // 2) * (w // 2)
    return [1, 2, VSTART] + [IMG_TOK] * n_units + [3, 4, 5], n_units


def _mm(grid, ids, model, seed=0):
    n_patches = grid[0] * grid[1] * grid[2]
    rng = np.random.default_rng(seed)
    patches = rng.standard_normal(
        (n_patches, 3 * 2 * 16 * 16)).astype(np.float32)
    geo = vision_geometry_qwen3vl([grid], TINY.vision)
    pos, delta = get_rope_index_qwen3vl(ids, [grid], TINY)
    mm = {"patches": jnp.asarray(patches),
          **{k: jnp.asarray(v) for k, v in geo.items()},
          "position_ids": jnp.asarray(pos), "rope_delta": jnp.int32(delta)}
    return mm, patches


def test_full_model_parity_with_hf():
    torch = pytest.importorskip("torch")
    hf = _hf_tiny(torch)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    model = Qwen3VLModel(TINY, max_rope_len=256)
    params = model.load_params(DictSource(sd), dtype=jnp.float32)

    grid = (1, 4, 6)
    ids, _ = _grid_prompt(grid)
    mm, patches = _mm(grid, ids, model)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor([grid])).logits.numpy()[0]
    cache = model.init_cache(1, len(ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([ids]), cache, mm=mm)
    got = np.asarray(model.logits(params, hidden)[0])
    np.testing.assert_allclose(got, ref, atol=2e-2)
    assert (np.argmax(got, -1) == np.argmax(ref, -1)).mean() > 0.9


def test_incremental_decode_with_image():
    model = Qwen3VLModel(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(3))
    grid = (1, 4, 6)
    ids, _ = _grid_prompt(grid)
    full_ids = ids + [7, 8]
    mm, _ = _mm(grid, ids, model, seed=1)
    pos_full, _ = get_rope_index_qwen3vl(full_ids, [grid], TINY)
    mm_full = dict(mm, position_ids=jnp.asarray(pos_full))

    cache = model.init_cache(1, len(full_ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([full_ids]), cache,
                               mm=mm_full)
    ref = model.logits(params, hidden)[0]

    cache = model.init_cache(1, 32, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids]), cache, mm=mm)
    cache = kvmod.advance(cache, len(ids))
    outs = [model.logits(params, hidden)[0, -1]]
    hidden, cache = model.backbone(params, jnp.asarray([[7]]), cache)
    cache = kvmod.advance(cache, 1)
    outs.append(model.logits(params, hidden)[0, 0])
    got = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref[len(ids) - 1:len(ids) + 1]),
                               atol=5e-3)


def test_deepstack_changes_output():
    """Zeroing the deepstack merger weights must change logits (i.e. the
    injection path is live)."""
    model = Qwen3VLModel(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(3))
    grid = (1, 4, 6)
    ids, _ = _grid_prompt(grid)
    mm, _ = _mm(grid, ids, model, seed=2)
    cache = model.init_cache(1, len(ids), jnp.float32)
    h1, _ = model.backbone(params, jnp.asarray([ids]), cache, mm=mm)

    import copy

    p2 = jax.tree.map(lambda x: x, params)
    for mp in p2["visual"]["ds_mergers"]:
        mp["fc2"]["w"] = jnp.zeros_like(mp["fc2"]["w"])
        mp["fc2"]["b"] = jnp.zeros_like(mp["fc2"]["b"])
    cache = model.init_cache(1, len(ids), jnp.float32)
    h2, _ = model.backbone(p2, jnp.asarray([ids]), cache, mm=mm)
    assert not np.allclose(np.asarray(h1), np.asarray(h2))


def test_multimodal_prefix_cache_stream_matches_cold():
    """Same-image prompt extension hits the prefix cache (keyed on the mm
    digest) and must match a cold engine exactly — including M-RoPE decode
    positions restored via the snapshotted rope_delta."""
    from aha_tpu.core.engine import TextEngine, bucket_for
    from aha_tpu.core.sampling import SamplingConfig

    model = Qwen3VLModel(TINY, max_rope_len=512)
    params = model.init_random(jax.random.PRNGKey(5))
    grid = (1, 8, 8)
    base_ids, _ = _grid_prompt(grid)
    base_ids = base_ids + [(i * 7) % 80 + 1 for i in range(20)]  # ≥ 32 toks
    ext_ids = base_ids + [11, 12, 13, 14]

    def mk_mm(ids):
        mm, _ = _mm(grid, ids, model, seed=4)
        blen = bucket_for(len(ids))
        pos = np.asarray(mm["position_ids"])
        if blen > pos.shape[1]:
            extra = blen - pos.shape[1]
            cont = pos.max() + 1 + np.arange(extra)
            pos = np.concatenate([pos, np.broadcast_to(cont, (3, extra))], 1)
        mm["position_ids"] = jnp.asarray(pos)
        return mm

    g = SamplingConfig(temperature=None)
    kw = dict(mm_key="img-digest", mm_token_ids=(IMG_TOK, VID_TOK))

    cold = TextEngine(model, params, eos_token_ids=[],
                      cache_dtype=jnp.float32, max_seq_len=256)
    warm = TextEngine(model, params, eos_token_ids=[],
                      cache_dtype=jnp.float32, max_seq_len=256,
                      prefix_cache_entries=4)

    first = warm.generate_tokens(base_ids, g, max_tokens=5,
                                 mm=mk_mm(base_ids), **kw)
    assert len(warm._prefix_entries) == 1         # stored under the digest
    assert first == cold.generate_tokens(base_ids, g, max_tokens=5,
                                         mm=mk_mm(base_ids))
    # exact repeat: hits with p = n-1 (text-only suffix)
    again = warm.generate_tokens(base_ids, g, max_tokens=5,
                                 mm=mk_mm(base_ids), **kw)
    assert again == first
    # same-image conversation turn: hits with p = len(base_ids)
    got = warm.generate_tokens(ext_ids, g, max_tokens=5,
                               mm=mk_mm(ext_ids), **kw)
    want = cold.generate_tokens(ext_ids, g, max_tokens=5, mm=mk_mm(ext_ids))
    assert got == want
    # a different image digest must NOT hit those entries
    miss = warm.generate_tokens(ext_ids, g, max_tokens=5, mm=mk_mm(ext_ids),
                                mm_key="other-image",
                                mm_token_ids=(IMG_TOK, VID_TOK))
    assert miss == want


def test_multimodal_prefix_store_keys_on_digest():
    """Entries stored under one mm digest never match another digest."""
    from aha_tpu.core.engine import PrefixStore

    store = PrefixStore(4)
    base = list(range(1, 41))
    entry = {"k": jnp.zeros((1, 1, 40, 1, 1)), "v": jnp.zeros((1, 1, 40, 1, 1))}
    store.store(base, entry, mm_key="d")
    hit, p = store.match(base + [7, 8], mm_key="d")
    assert hit is not None and p == 40
    # wrong key: no hit
    hit2, _ = store.match(base + [7, 8], mm_key="other")
    assert hit2 is None
