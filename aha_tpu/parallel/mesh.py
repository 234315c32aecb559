"""Device mesh & sharding layer.

The reference runs every model on exactly one device
(src/utils/mod.rs:30-48: cuda0 / metal0 / cpu) and has no distributed
execution of any kind (SURVEY.md §2.5).  The TPU-native equivalent is a
first-class mesh module: we always build a `jax.sharding.Mesh` — 1×1 on a
single chip — and express parameter/cache placement as `NamedSharding`s, so
scaling to tensor-parallel over ICI is a `MeshConfig` change, not a rewrite.

Axis conventions (jax-ml.github.io/scaling-book style):
    "dp"  — data/batch axis (batch dim of activations, replicated params)
    "tp"  — tensor/model axis (attention heads, MLP hidden, vocab)

Models annotate their param pytrees with logical axis names via
`PartitionRule`s; `shard_params` maps logical names → mesh axes.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape. Defaults to everything on one chip."""

    dp: int = 1
    tp: int = 1

    @property
    def n_devices(self) -> int:
        return self.dp * self.tp


def make_mesh(cfg: MeshConfig | None = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a Mesh over the given (default: all) devices.

    Device order follows jax.devices(), which on TPU enumerates chips in a
    topology-aware order so the tp axis rides ICI neighbors.
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    if cfg.n_devices > len(devices):
        raise ValueError(
            f"mesh {cfg} needs {cfg.n_devices} devices, have {len(devices)}")
    grid = np.array(devices[: cfg.n_devices]).reshape(cfg.dp, cfg.tp)
    return Mesh(grid, axis_names=("dp", "tp"))


_DEFAULT_MESH: Mesh | None = None


def get_mesh() -> Mesh:
    """Process-wide default mesh (1×1 unless configured)."""
    global _DEFAULT_MESH
    if _DEFAULT_MESH is None:
        _DEFAULT_MESH = make_mesh()
    return _DEFAULT_MESH


def set_mesh(mesh: Mesh) -> None:
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh


class MeshContext:
    """Bundles a mesh with helpers; passed to model loaders."""

    def __init__(self, mesh: Mesh | None = None):
        self.mesh = mesh or get_mesh()

    @property
    def tp(self) -> int:
        return self.mesh.shape.get("tp", 1)

    @property
    def dp(self) -> int:
        return self.mesh.shape.get("dp", 1)

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


# ---------------------------------------------------------------------------
# Partition rules: regex on param path → PartitionSpec
# ---------------------------------------------------------------------------

PartitionRule = tuple[str, tuple[Any, ...]]


def spec_for(path: str, rules: Sequence[PartitionRule]) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            return P(*spec)
    return P()  # replicate by default


def shard_params(params: Any, mesh: Mesh,
                 rules: Sequence[PartitionRule] = ()) -> Any:
    """Place a param pytree on the mesh according to partition rules.

    Each leaf's dotted path (e.g. "layers.0.attn.q_proj.w") is matched against
    `rules`; the first hit gives its PartitionSpec, otherwise replicated.
    """

    def place(path_entries, leaf):
        path = ".".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path_entries)
        spec = spec_for(path, rules)
        # axes that don't divide the dim fall back to replication (e.g. an
        # odd vocab size on the tp axis); specs longer than the leaf rank
        # truncate (a rule written for 5-D caches applied to the flat 4-D
        # layout)
        fixed = []
        for i, axis in enumerate(spec[:np.ndim(leaf)]):
            if axis is not None and leaf.shape[i] % mesh.shape[axis]:
                fixed.append(None)
            else:
                fixed.append(axis)
        return jax.device_put(leaf, NamedSharding(mesh, P(*fixed)))

    return jax.tree_util.tree_map_with_path(place, params)


def replicate(tree: Any, mesh: Mesh | None = None) -> Any:
    mesh = mesh or get_mesh()
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_for_serving(model: Any, params: Any, tp: int = 1, dp: int = 1
                      ) -> tuple[Any, Mesh | None, tuple]:
    """Serve-time sharding: `(params, mesh, cache_rules)` for an engine.

    Identity at tp=dp=1 (mesh None, rules empty).  Otherwise builds a dp×tp
    mesh and places params by the model's `partition_rules`; params whose
    specs only name "tp" replicate across dp automatically.  Raises a clear
    error for models without rules so `--tp` is never a silent no-op —
    the single deployment the reference cannot do at all (SURVEY §2.5:
    one device, so Qwen3-VL-32B simply needs a bigger GPU; here it is a
    flag)."""
    if tp <= 1 and dp <= 1:
        return params, None, ()
    rules = getattr(model, "partition_rules", None)
    if rules is None:
        raise ValueError(
            f"{type(model).__name__} has no partition rules; "
            "serve it with --tp 1 --dp 1")
    mesh = make_mesh(MeshConfig(dp=dp, tp=tp))
    return (shard_params(params, mesh, rules), mesh,
            getattr(model, "cache_rules", ()))
