"""Device mesh + sharding helpers: the TPU-native replacement for DDP/NCCL.

The reference scales via PyTorch-Lightning DDP / pointcept ``mp.spawn`` + NCCL
(SURVEY.md §2.8). Here a single program spans all chips: one ``jax.jit`` over a
``Mesh``, with gradient all-reduce emitted by XLA from the sharding annotations
and riding ICI. Multi-host runs only need ``jax.distributed.initialize()`` —
there is no launcher.

Axes:
  dp    data parallel (batch dimension)
  fsdp  optional parameter sharding axis (ZeRO-style); folded into dp when
        unused, so a 1-axis mesh is the common case (the reference has no
        TP/PP — its models are ~100-400M params, DP(+FSDP) is the right design).
  sp    optional spatial/sequence parallel axis: shards the 1024-wide azimuth
        (W) dimension of the panoramic range image. GSPMD partitions the
        convolutions spatially and turns the circular wrap-pad into the 1-ring
        collective-permute SURVEY §5 calls out as the one context-parallel
        need — no manual halo code.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              fsdp: int = 1, sp: int = 1) -> Mesh:
    """Mesh over the given (default: all) devices: (dp, fsdp[, sp])."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % (fsdp * sp) == 0, \
        f"{n} devices not divisible by fsdp={fsdp} * sp={sp}"
    if sp > 1:
        arr = np.asarray(devices).reshape(n // (fsdp * sp), fsdp, sp)
        return Mesh(arr, ("dp", "fsdp", "sp"))
    arr = np.asarray(devices).reshape(n // fsdp, fsdp)
    return Mesh(arr, ("dp", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp (and fsdp if present)."""
    axes = ("dp", "fsdp") if "fsdp" in mesh.axis_names and mesh.shape["fsdp"] > 1 \
        else ("dp",)
    return NamedSharding(mesh, P(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree onto the mesh, sharded along dp."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def fsdp_param_sharding(mesh: Mesh, params: Any) -> Any:
    """ZeRO-3-style sharding spec: shard the largest axis of each big param
    over 'fsdp'; small params stay replicated. Returns a pytree of shardings."""
    if "fsdp" not in mesh.axis_names or mesh.shape["fsdp"] == 1:
        rep = replicated(mesh)
        return jax.tree.map(lambda _: rep, params)
    n_shard = mesh.shape["fsdp"]

    def spec(x):
        if x.ndim == 0 or x.size < 2**16:
            return NamedSharding(mesh, P())
        ax = int(np.argmax(x.shape))
        if x.shape[ax] % n_shard != 0:
            return NamedSharding(mesh, P())
        parts = [None] * x.ndim
        parts[ax] = "fsdp"
        return NamedSharding(mesh, P(*parts))

    return jax.tree.map(spec, params)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC images with the azimuth (W) axis sharded over 'sp' (+ batch over
    dp/fsdp). GSPMD emits the circular-conv halo exchange as ppermute."""
    batch_axes = ("dp", "fsdp") if "fsdp" in mesh.axis_names \
        and mesh.shape["fsdp"] > 1 else ("dp",)
    if "sp" not in mesh.axis_names or mesh.shape["sp"] == 1:
        return NamedSharding(mesh, P(batch_axes))
    return NamedSharding(mesh, P(batch_axes, None, "sp", None))


def local_batch_slice(global_batch: int) -> slice:
    """Per-process slice of the global batch for multi-host data loading
    (the jax.process_index() sharded-host-loading pattern)."""
    n_proc = jax.process_count()
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
