"""Tensor (model) parallelism: Megatron-style alternating kernel sharding.

The reference is single-GPU (SURVEY §2.8); its widest layers are the shared
1024-channel MLPs and the 1024->512->256 FC heads. Here those widths shard
over a ``model`` mesh axis the idiomatic JAX way: we only ANNOTATE parameter
shardings (GSPMD ``PartitionSpec``s) and let XLA insert the collectives —
no manual psum/all_gather in the model code.

Scheme (Megatron MLP): within every sequential stack (``dense_{i}`` /
``fc_{i}`` with their ``bn_{i}``), even layers are column-parallel (kernel
``P(None, 'model')``, bias/BN ``P('model')`` — activations come out
channel-sharded) and odd layers are row-parallel (kernel ``P('model', None)``
— XLA emits the psum over the contracted sharded axis). Elementwise BN/ReLU
between them runs on the channel-sharded activations shard-local. Layers
narrower than ``min_width`` (or not divisible by the axis size) stay
replicated; the max-pool over points and the small task outputs are where
activations return to replicated layout.

Because every leaf's spec is derived from its own path suffix and shape, the
same rule shards ``params``, ``batch_stats`` (per-channel BN stats), and the
optimizer moments inside the full train state with one tree walk —
optax's ``mu``/``nu`` mirror the param tree so their suffixes match.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_LAYER_RE = re.compile(r"^(dense|fc|bn)_(\d+)$")


def _path_names(path) -> list[str]:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return out


def _leaf_spec(names: list[str], shape, *, axis: str, size: int, min_width: int) -> P:
    """PartitionSpec for one leaf from its path suffix + shape."""
    if len(names) < 2 or not shape:
        return P()
    m = _LAYER_RE.match(names[-2])
    if not m:
        return P()
    idx = int(m.group(2))
    column = idx % 2 == 0
    leaf = names[-1]
    if leaf == "kernel" and len(shape) == 2:
        if column and shape[1] % size == 0 and shape[1] >= min_width:
            return P(None, axis)
        if not column and shape[0] % size == 0 and shape[0] >= min_width:
            return P(axis, None)
        return P()
    # per-channel vectors: Dense bias, BN scale/bias/mean/var — width equals
    # the owning layer's output width, so divisibility agrees with the kernel
    if len(shape) == 1 and column and shape[0] % size == 0 and shape[0] >= min_width:
        return P(axis)
    return P()


def tensor_parallel_specs(
    tree: Any, mesh: Mesh, *, axis: str = "model", min_width: int = 128
) -> Any:
    """Tree of ``PartitionSpec`` matching ``tree`` (params / batch_stats /
    full train state — anything whose leaf paths end in layer-name/leaf-name)."""
    size = mesh.shape[axis]

    def f(path, leaf):
        shape = getattr(leaf, "shape", ())
        return _leaf_spec(_path_names(path), tuple(shape), axis=axis, size=size,
                          min_width=min_width)

    return jax.tree_util.tree_map_with_path(f, tree)


def tensor_parallel_shardings(
    tree: Any, mesh: Mesh, *, axis: str = "model", min_width: int = 128
) -> Any:
    specs = tensor_parallel_specs(tree, mesh, axis=axis, min_width=min_width)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_state_tp(state, mesh: Mesh, *, axis: str = "model", min_width: int = 128):
    """Place a train state with TP param/optimizer/BN-stat shardings."""
    sh = tensor_parallel_shardings(state, mesh, axis=axis, min_width=min_width)
    return jax.device_put(state, sh)


def count_sharded(tree, mesh: Mesh, *, axis: str = "model", min_width: int = 128):
    """(sharded_params, total_params) under the TP rule — for logging/tests."""
    specs = tensor_parallel_specs(tree, mesh, axis=axis, min_width=min_width)
    leaves = jax.tree.leaves(tree)
    spec_leaves = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    sharded = sum(
        int(np.prod(l.shape))
        for l, s in zip(leaves, spec_leaves)
        if any(a is not None for a in s)
    )
    return sharded, sum(int(np.prod(l.shape)) for l in leaves)
