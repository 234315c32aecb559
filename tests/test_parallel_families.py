"""Tensor-parallel partition rules for the VLM / OCR / ASR families:
sharded execution on the virtual 8-device CPU mesh must reproduce
single-device numerics for a multimodal prefill AND a decode step.

The reference has no TP at all (SURVEY §2.5); the rebuild's mandate is
"TP is config, not surgery" — every family carries partition_rules/
cache_rules as class attributes, validated here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.parallel.mesh import MeshConfig, make_mesh, shard_params


def _tp_parity(model, params, ids, mm, cache_len, atol=3e-4, tp=4,
               decode=True):
    """Run prefill(+mm) and one decode step on 1 device and on a tp mesh;
    compare final-position logits."""
    ids_a = jnp.asarray([ids])

    def run(p, cache):
        hidden, cache = model.backbone(p, ids_a, cache, mm=mm)
        lg = model.logits(p, hidden)[0, -1]
        out = [lg]
        if decode:
            cache = {**cache, "pos": jnp.int32(len(ids))}
            tok = jnp.argmax(lg)[None, None].astype(jnp.int32)
            h2, _ = model.backbone(p, tok, cache)
            out.append(model.logits(p, h2)[0, 0])
        return out

    ref = [np.asarray(x)
           for x in run(params, model.init_cache(1, cache_len, jnp.float32))]

    mesh = make_mesh(MeshConfig(tp=tp))
    sp = shard_params(params, mesh, model.partition_rules)
    scache = shard_params(model.init_cache(1, cache_len, jnp.float32), mesh,
                          model.cache_rules)
    got = [np.asarray(x) for x in jax.jit(run)(sp, scache)]
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, atol=atol, rtol=1e-4)


def test_tp_qwen3vl():
    from tests.test_qwen3vl import TINY, _grid_prompt, _mm
    from aha_tpu.models.qwen3vl import Qwen3VLModel

    model = Qwen3VLModel(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(0))
    ids, _ = _grid_prompt((1, 4, 6))
    mm, _ = _mm((1, 4, 6), ids, model)
    _tp_parity(model, params, ids, mm, 64)


def test_tp_qwen2_5vl():
    from tests.test_qwen2_5vl import TINY, _grid_prompt
    from aha_tpu.models.qwen2_5vl import (Qwen2_5VLModel, get_rope_index,
                                          vision_geometry)

    model = Qwen2_5VLModel(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(0))
    grid = (1, 4, 6)
    ids, _ = _grid_prompt(grid)
    n_patches = grid[0] * grid[1] * grid[2]
    rng = np.random.default_rng(0)
    v = TINY.vision
    patches = rng.standard_normal(
        (n_patches,
         3 * v.temporal_patch_size * v.patch_size ** 2)).astype(np.float32)
    geo = vision_geometry([grid], v)
    pos, delta = get_rope_index(ids, [grid], TINY)
    mm = {"patches": jnp.asarray(patches),
          **{k: jnp.asarray(x) for k, x in geo.items()},
          "position_ids": jnp.asarray(np.asarray(pos)),
          "rope_delta": jnp.int32(delta)}
    _tp_parity(model, params, ids, mm, 64)


def test_tp_qwen3_asr():
    from tests.test_asr import TINY
    from aha_tpu.models.qwen3_asr import (Qwen3ASRModel,
                                          get_feat_extract_output_lengths)

    model = Qwen3ASRModel(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(0))
    n_frames = 100
    n_out = get_feat_extract_output_lengths(n_frames)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, TINY.audio.num_mel_bins, n_frames)), jnp.float32)
    ids = [1, 2] + [TINY.audio_token_id] * n_out + [3]
    mm = {"mel": mel, "n_out": jnp.int32(n_out)}
    _tp_parity(model, params, ids, mm, 64)


def test_tp_glm_ocr(tmp_path):
    from tests.fixtures import build_tiny_glm_ocr_repo
    from tests.test_glm_hunyuan_ocr import _glm_mm
    from aha_tpu.io.weights import open_weights
    from aha_tpu.models.glm_ocr import GlmOcrConfig, GlmOcrModel

    repo = str(tmp_path / "glm")
    build_tiny_glm_ocr_repo(repo)
    cfg = GlmOcrConfig.from_file(repo)
    model = GlmOcrModel(cfg, max_rope_len=256)
    params = model.load_params(open_weights(repo), dtype=jnp.float32)
    grid = (1, 4, 4)
    n_units = 4  # (4//2)*(4//2)
    ids = [1, 2] + [cfg.image_token_id] * n_units + [3]
    mm, _ = _glm_mm(cfg, [grid], ids)
    _tp_parity(model, params, ids, mm, 64)


def test_tp_hunyuan_ocr():
    from tests.test_glm_hunyuan_ocr import (tiny_hunyuan_config, _hy_params,
                                            _hy_mm)
    from aha_tpu.models.hunyuan_ocr import HunyuanOCRModel

    cfg = tiny_hunyuan_config()
    model = HunyuanOCRModel(cfg, max_rope_len=256)
    params, _ = _hy_params(model)
    grids = [(1, 4, 4)]
    n_tok = 2 * (2 + 1) + 2   # rows×(units+newline) + begin/end
    ids = [3, 5] + [cfg.image_token_id] * n_tok + [9, 11]
    mm = _hy_mm(model, grids, ids)
    _tp_parity(model, params, ids, mm, 64)


def test_tp_paddleocr_vl():
    from tests.test_paddleocr_vl import TINY, _grid_prompt, _mm
    from aha_tpu.models.paddleocr_vl import PaddleOCRVLModel

    model = PaddleOCRVLModel(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(0))
    grid = (1, 4, 6)
    ids, _ = _grid_prompt(grid)
    mm = _mm(grid, ids)
    _tp_parity(model, params, ids, mm, 64)


def test_tp_deepseek_ocr_moe():
    from tests.test_deepseek_ocr import tiny_config, _mm_for
    from aha_tpu.models.deepseek_ocr import DeepseekOCRModel

    model = DeepseekOCRModel(tiny_config(), max_rope_len=512)
    params = model.init_random(jax.random.PRNGKey(0))
    mm, n_vis = _mm_for(model)
    ids = [0, 5, 7] + [model.config.image_token_id] * n_vis + [9, 11]
    _tp_parity(model, params, ids, mm, 64, atol=1e-3)


def test_tp_lfm2():
    """LFM2 hybrid: attention/MLP shard over tp, the short-conv mixer
    stays replicated; sharded prefill + decode match single-device."""
    from tests.test_llama_lfm2 import LFM2_TINY
    from aha_tpu.models.lfm2 import Lfm2Model

    model = Lfm2Model(LFM2_TINY, max_rope_len=64)
    params = model.init_random(jax.random.PRNGKey(4))
    ids = [(i * 13) % 100 + 1 for i in range(12)]
    _tp_parity(model, params, ids, None, cache_len=64, tp=2)


def test_dp_batch_lfm2():
    """dp×tp continuous batching on the conv/attention hybrid: rolling conv
    state and KV both shard their slot axis over dp."""
    import threading

    from aha_tpu.core.batch_engine import BatchEngine
    from aha_tpu.core.sampling import SamplingConfig
    from tests.test_llama_lfm2 import LFM2_TINY
    from aha_tpu.models.lfm2 import (LFM2_CACHE_RULES, LFM2_PARTITION_RULES,
                                     Lfm2Model)

    model = Lfm2Model(LFM2_TINY, max_rope_len=128)
    params = model.init_random(jax.random.PRNGKey(5))
    g = SamplingConfig(temperature=None)
    prompts = {i: [(i * 17 + j) % 100 + 1 for j in range(20 + i)]
               for i in range(2)}

    plain = BatchEngine(model, params, eos_token_ids=[], slots=2,
                        cache_dtype=jnp.float32, max_seq_len=128)
    want = {i: plain.generate_tokens(p, g, max_tokens=6)
            for i, p in prompts.items()}
    plain.shutdown()

    mesh = make_mesh(MeshConfig(dp=2, tp=2))
    sharded = shard_params(params, mesh, LFM2_PARTITION_RULES)
    be = BatchEngine(model, sharded, eos_token_ids=[], slots=2,
                     cache_dtype=jnp.float32, max_seq_len=128,
                     mesh=mesh, cache_rules=LFM2_CACHE_RULES)
    assert be._cache["conv"].sharding.spec[1] == "dp"
    got = {}

    def one(i):
        got[i] = be.generate_tokens(prompts[i], g, max_tokens=6)

    ts = [threading.Thread(target=one, args=(i,)) for i in prompts]
    [t.start() for t in ts]
    [t.join() for t in ts]
    be.shutdown()
    assert got == want
