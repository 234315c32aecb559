"""jax.profiler hooks (SURVEY §5.1): request traces + step annotations."""

import glob
import os

import jax
import jax.numpy as jnp

import aha_tpu.utils.profiling as prof


def test_noop_without_configure():
    with prof.request_trace("x"):
        pass  # must not require jax.profiler state


def test_request_trace_writes_profile(tmp_path, monkeypatch):
    monkeypatch.setattr(prof, "_profile_dir", None)
    prof.configure(profile_dir=str(tmp_path))
    assert prof.profile_dir() == str(tmp_path)
    with prof.request_trace("unit"):
        with prof.annotate("prefill"):
            jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
        with prof.step_annotation("decode", 0):
            (jnp.ones((8,)) * 2).block_until_ready()
    files = glob.glob(str(tmp_path / "**" / "*.xplane.pb"), recursive=True)
    assert files, f"no trace written under {tmp_path}"


def test_engine_generate_under_trace(tmp_path, monkeypatch):
    """The engine's annotated prefill/decode path runs inside a trace."""
    monkeypatch.setattr(prof, "_profile_dir", None)
    prof.configure(profile_dir=str(tmp_path))
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model

    cfg = Qwen3Config(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=2,
                      num_key_value_heads=2, head_dim=16)
    model = Qwen3Model(cfg)
    params = model.init_random(jax.random.PRNGKey(0))
    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=jnp.float32, max_seq_len=128)
    with prof.request_trace("generate"):
        ids = engine.generate_tokens([1, 2, 3], SamplingConfig(temperature=None),
                                     max_tokens=4)
    assert len(ids) >= 1
    files = glob.glob(str(tmp_path / "**" / "*.xplane.pb"), recursive=True)
    assert files
