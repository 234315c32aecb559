"""Mesh/sharding layer: tensor-parallel execution on the virtual 8-device
CPU mesh must produce the same numbers as single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.parallel.mesh import MeshConfig, make_mesh, shard_params, spec_for


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(dp=2, tp=4))
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh1 = make_mesh(MeshConfig())
    assert mesh1.shape == {"dp": 1, "tp": 1}


def test_spec_for_rules():
    from jax.sharding import PartitionSpec as P

    rules = ((r"attn\.q\.w", (None, "tp")), (r"norm", ()))
    assert spec_for("layers.0.attn.q.w", rules) == P(None, "tp")
    assert spec_for("final.norm.w", rules) == P()
    assert spec_for("something.else", rules) == P()


def test_tp_forward_matches_single_device():
    from aha_tpu.models.qwen3 import (
        QWEN3_PARTITION_RULES,
        Qwen3Config,
        Qwen3Model,
    )

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        head_dim=16)
    model = Qwen3Model(cfg, max_rope_len=128)
    params = model.init_random(jax.random.PRNGKey(0))
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])

    cache = model.init_cache(1, 8, jnp.float32)
    ref, _ = model.backbone(params, ids, cache)
    ref = model.logits(params, ref)

    mesh = make_mesh(MeshConfig(dp=2, tp=4))
    sharded = shard_params(params, mesh, QWEN3_PARTITION_RULES)

    @jax.jit
    def fwd(params, ids):
        cache = model.init_cache(1, 8, jnp.float32)
        hidden, _ = model.backbone(params, ids, cache)
        return model.logits(params, hidden)

    with jax.sharding.set_mesh(mesh):
        got = fwd(sharded, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    tok, cache = jax.jit(fn)(*args)
    assert tok.shape == (1,)
