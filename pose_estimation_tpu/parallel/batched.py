"""Multi-sequence scale-out: vmap + pjit over a device mesh.

The reference is a single-process, single-sequence pipeline; its only
"distribution" is UDP sensor ingestion (SURVEY.md section 2.7). The TPU-native
scale story instead batches B independent sequences through one SPMD
program:

* the batch axis is sharded over the mesh's `data` axis (pure DP — no
  cross-sequence communication);
* the landmark-pool axis is sharded over the `model` axis: the Hamming
  match table [M, P] = cur-descriptors x pool-descriptors splits its pool
  columns across chips, and XLA inserts the argmin all-reduce over ICI —
  the VIO analog of tensor-parallel attention scoring.

All shardings are expressed with `jax.sharding.NamedSharding`; collectives
are compiler-inserted (scaling-book style), not hand-written.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pose_estimation_tpu.models import vio as vio_mod


def make_mesh(devices=None, data: int | None = None, model: int = 1) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, (data, model, n)
    return Mesh(np.asarray(devices).reshape(data, model), ("data", "model"))


def _state_sharding(mesh: Mesh, state: vio_mod.VIOState):
    """Sharding tree for a batched VIOState: batch -> data; the pool's slot
    axis -> model (descriptors, positions, observation tables)."""
    base = jax.tree.map(lambda _: NamedSharding(mesh, P("data")), state)
    pool_spec = base.pool._replace(
        desc_l=NamedSharding(mesh, P("data", "model")),
        desc_r=NamedSharding(mesh, P("data", "model")),
        pos=NamedSharding(mesh, P("data", "model")),
        pixel=NamedSharding(mesh, P("data", "model")),
        valid=NamedSharding(mesh, P("data", "model")),
        age=NamedSharding(mesh, P("data", "model")),
        fid=NamedSharding(mesh, P("data", "model")),
        obs_px=NamedSharding(mesh, P("data", "model")),
        obs_mask=NamedSharding(mesh, P("data", "model")),
    )
    return base._replace(pool=pool_spec)


def make_batched_step(consts, static, mesh: Mesh):
    """Batched, sharded VIO step: (state_B, imgs_B, imu_B, keys_B) ->
    (state_B, metrics_B). One SPMD program over the mesh."""
    step = functools.partial(vio_mod.ok_step, consts=consts, static=static)
    vstep = jax.vmap(step)

    dummy = vio_mod.init_vio_state(static)
    state_shard = _state_sharding(mesh, dummy)
    data = NamedSharding(mesh, P("data"))

    return jax.jit(
        vstep,
        in_shardings=(state_shard, data, data, data, data, data, data),
        out_shardings=(state_shard, None),
    )


def init_batched_state(static, batch: int, mesh: Mesh | None = None):
    """Replicated init state broadcast to a batch (optionally placed)."""
    one = vio_mod.init_vio_state(static)
    batched = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), one
    )
    if mesh is not None:
        batched = jax.device_put(batched, _state_sharding(mesh, one))
    return batched
