"""Device mesh + sharding rules — the framework's distributed backbone.

The reference has no in-repo distributed machinery (it delegates to an
accelerator wrapper, ``script/train.py:492,566-575``); here the mesh is
a first-class component:

- ``data``  axis: batch sharding for data-parallel training/eval.
  Gradient all-reduce is emitted by XLA from sharded in/out specs —
  there is no hand-written collective layer.
- ``model`` axis: tensor-parallel weight sharding rules for the wide
  matmuls (attention qkv/out, feed-forwards). At SAiD's scale (~120 M
  params) TP is never required, but the rules are wired so the same
  code scales to larger variants by reshaping the mesh.

Multi-host: ``jax.distributed.initialize()`` (call ``maybe_init_distributed``)
then the same mesh code spans hosts; XLA routes collectives over
ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape. ``data * model * seq`` must equal the device
    count. ``seq`` > 1 shards the frame (window) axis — sequence-parallel
    training/eval (the flash_sp attention rule + GSPMD spatial
    partitioning of convs/norms)."""

    data: int = -1  # -1 → all remaining devices
    model: int = 1
    seq: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        d = self.data
        per_data = self.model * self.seq
        if d == -1:
            if n_devices % per_data:
                raise ValueError(
                    f"{n_devices} devices not divisible by "
                    f"model*seq={per_data}"
                )
            d = n_devices // per_data
        if d * per_data != n_devices:
            raise ValueError(
                f"mesh {d}x{self.model}x{self.seq} != device count {n_devices}"
            )
        return MeshConfig(data=d, model=self.model, seq=self.seq)


def make_mesh(
    config: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None
) -> Mesh:
    """Build a ('data', 'model', 'seq') mesh over the given (or all)
    devices (unused axes have size 1)."""
    devices = list(devices if devices is not None else jax.devices())
    cfg = config.resolve(len(devices))
    arr = np.asarray(devices).reshape(cfg.data, cfg.model, cfg.seq)
    return Mesh(arr, axis_names=("data", "model", "seq"))


def fit_data_axis(
    batch_size: int, n_devices: int, model_axis: int = 1, seq_axis: int = 1
) -> int:
    """Largest data-axis size that divides both the batch and the devices.

    Keeps small-batch runs valid on large meshes (extra devices idle
    rather than erroring on an indivisible batch shard).
    """
    avail = n_devices // (model_axis * seq_axis)
    d = min(batch_size, avail)
    while d > 1 and (batch_size % d or avail % d):
        d -= 1
    return max(d, 1)


def maybe_init_distributed() -> None:
    """Initialize the multi-host runtime when launched under a cluster env."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _union_slice(slices: Sequence[slice], dim_size: int) -> slice:
    """Union of contiguous per-device row slices into one host-local block.

    Pure helper for ``put_global`` — the rows of a batch-sharded global
    array owned by this process are the union of its addressable
    devices' index slices, which XLA lays out contiguously for a
    leading-axis ('data') sharding.
    """
    # Distinct spans only: devices along non-batch mesh axes ('model',
    # 'seq') hold IDENTICAL row ranges — dedup before the contiguity
    # check, or any co-sharded batch would be rejected.
    spans = sorted(
        {
            (
                s.start if s.start is not None else 0,
                s.stop if s.stop is not None else dim_size,
            )
            for s in slices
        }
    )
    lo, hi = spans[0][0], spans[-1][1]
    if hi - lo != sum(st - sa for sa, st in spans):
        raise ValueError(f"non-contiguous device slices: {slices}")
    return slice(lo, hi)


def host_local_slice(global_shape: tuple, sharding: NamedSharding) -> slice:
    """Leading-axis rows of a global array that THIS process must supply."""
    idx_map = sharding.addressable_devices_indices_map(global_shape)
    return _union_slice([ix[0] for ix in idx_map.values()], global_shape[0])


def put_global(x, sharding: NamedSharding):
    """Place a host-global numpy batch on a (possibly multi-host) mesh.

    Single-process: plain ``device_put``. Multi-process: every host
    builds the same global batch (the loaders are seed-synchronized), and
    each contributes only its own rows via
    ``jax.make_array_from_process_local_data`` — ``device_put`` of a
    host-global array cannot address other hosts' devices, which is why
    the reference-style "move the whole batch" pattern breaks under
    ``jax.distributed.initialize()`` (SURVEY §2.9 DP row).
    """
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    local = x[host_local_slice(x.shape, sharding)]
    return jax.make_array_from_process_local_data(sharding, local, x.shape)


# Tensor-parallel partitioning rules: parameter-path regex → PartitionSpec.
# Kernels are (in, out) for Dense and (W, in, out) for Conv; we shard the
# output dim of "up" projections and the input dim of "down" projections,
# the standard Megatron split that keeps one all-reduce per block.
_TP_RULES = (
    # attention projections: qkv column-parallel, out row-parallel
    (re.compile(r".*(to_q|to_k|to_v|q_proj|k_proj|v_proj)/kernel$"), P(None, "model")),
    (re.compile(r".*(to_out|out_proj)/kernel$"), P("model", None)),
    # feed-forward: up column-parallel, down row-parallel
    (re.compile(r".*(ff/proj|ff_inter)/kernel$"), P(None, "model")),
    (re.compile(r".*(ff/out|ff_out)/kernel$"), P("model", None)),
    # time-embed MLP (wide 768-dim): split the hidden dim
    (re.compile(r".*time_embed_0/kernel$"), P(None, "model")),
    (re.compile(r".*time_embed_2/kernel$"), P("model", None)),
)


def param_sharding_rules(path: str) -> P:
    """PartitionSpec for a '/'-joined parameter path (default: replicate)."""
    for pat, spec in _TP_RULES:
        if pat.match(path):
            return spec
    return P()


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    """Place a parameter pytree on the mesh according to the TP rules.

    With ``model=1`` every spec degenerates to full replication, so this
    is also the correct placement for pure data parallelism.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)

    def place(path_entries, leaf):
        path = "/".join(
            str(getattr(e, "key", getattr(e, "idx", e))) for e in path_entries
        )
        spec = param_sharding_rules(path)
        # Guard: only shard when the named axis divides the dim.
        if spec != P():
            axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
            ok = True
            for dim, name in enumerate(spec):
                if name is None:
                    continue
                if dim >= leaf.ndim or leaf.shape[dim] % axis_sizes[name]:
                    ok = False
            if not ok:
                spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    leaves, treedef = flat
    placed = [place(path, leaf) for path, leaf in leaves]
    return jax.tree_util.tree_unflatten(treedef, placed)
