"""Multi-host scale-out: `jax.distributed` mesh spanning processes (DCN).

The reference's only cross-machine story is UDP sensor ingestion
(`cluon::OD4Session`, `src/cfsd-state-estimation.cpp:22`); compute never
leaves one process. The TPU-native scale story extends the single-host
dp x tp mesh of `parallel/batched.py` across HOSTS:

* the `data` (batch-of-sequences) axis spans processes — its collectives
  (none in steady state: pure DP) ride DCN;
* the `model` (landmark-pool) axis stays WITHIN a process — its argmin
  all-reduce rides ICI on real hardware.

Shardings are the same `NamedSharding`s as the single-host path; only the
mesh's device matrix changes (rows = processes). Global arrays are built
with `jax.make_array_from_callback` so each process materializes only its
addressable shards.

Dry-runnable without hardware: N CPU processes on localhost, each faking
`devices_per_process` host devices (`--xla_force_host_platform_device_count`),
coordinated over a local gRPC port — the same wire protocol real multi-host
TPU pods use for DCN coordination.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str, num_processes: int, process_id: int,
                     local_device_count: int | None = None) -> None:
    """Join the jax.distributed cluster. Must be called before any backend
    init (on CPU dry runs, also set the platform + host-device count first;
    see `_child_main`)."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=None if local_device_count is None
        else list(range(local_device_count)),
    )


def make_multihost_mesh(model: int = 1) -> Mesh:
    """(data, model) mesh over ALL processes' devices, with the model axis
    contained in one process (jax.devices() orders by process index, so a
    row-major reshape keeps each size-`model` group process-local when
    devices_per_process % model == 0)."""
    devices = jax.devices()
    per_proc = len(jax.local_devices())
    assert per_proc % model == 0, (per_proc, model)
    n = len(devices)
    return Mesh(np.asarray(devices).reshape(n // model, model),
                ("data", "model"))


def make_global(mesh: Mesh, spec: P, value: np.ndarray):
    """Global sharded array from a host-replicated numpy value: each process
    materializes only its addressable shards."""
    sharding = NamedSharding(mesh, spec)
    value = np.asarray(value)
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx]
    )


def global_batched_state(static, batch: int, mesh: Mesh, template=None):
    """Batched VIO state sharded over the multihost mesh (batch -> data,
    pool slots -> model), built shard-by-shard from a (host-replicated)
    single-sequence template state."""
    from pose_estimation_tpu.models import vio as vio_mod
    from pose_estimation_tpu.parallel import batched

    one = template if template is not None else vio_mod.init_vio_state(static)
    one_np = jax.tree.map(lambda a: np.asarray(a), one)
    shardings = batched._state_sharding(mesh, one)
    return jax.tree.map(
        lambda a, s: jax.make_array_from_callback(
            (batch,) + a.shape, s,
            lambda idx, a=a: np.broadcast_to(a, (batch,) + a.shape)[idx],
        ),
        one_np, shardings,
    )


def _child_main(process_id: int, num_processes: int, port: int,
                devices_per_process: int) -> None:
    """One process of the multi-host dry run. Protocol mirrors
    `__graft_entry__._dryrun_multichip_body`: consistent simulator world,
    2-frame unbatched warmup to seed the pool, then ONE sharded batched
    step over the (data-spans-hosts, model-within-host) mesh, asserting the
    tracker and solver actually ran on every lane."""
    import os
    import sys

    # platform + fake host devices BEFORE any backend/distributed init
    jax.config.update("jax_platforms", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count="
        f"{devices_per_process}".strip()
    )
    init_distributed(f"localhost:{port}", num_processes, process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert len(jax.local_devices()) == devices_per_process

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.join(repo, "tests"))
    from sim import seeded_state, sim_world

    from pose_estimation_tpu.camera import CameraModel
    from pose_estimation_tpu.models import vio as vio_mod
    from pose_estimation_tpu.parallel import batched
    from pose_estimation_tpu.testing import tiny_config

    model = 2 if devices_per_process % 2 == 0 else 1
    mesh = make_multihost_mesh(model=model)
    b = len(jax.devices()) // model

    cfg = tiny_config(camera_frequency=40)
    cm = CameraModel.from_config(cfg)
    consts, static = vio_mod.build_constants(cfg, cm)
    # identical on every process (same seed -> same world)
    frames, gyrs, accs, mask, state0 = sim_world(cfg, 3, n_landmarks=250,
                                                 seed=0)

    # unbatched warmup on each host (replicated compute, host-local devices)
    fn = functools.partial(vio_mod.ok_step, consts=consts, static=static)
    step1 = jax.jit(lambda s, il, ir, g, a, k: fn(s, il, ir, g, a, mask, k))
    st = seeded_state(static, state0)
    for i in range(2):
        st, _ = step1(st, frames[i][0], frames[i][1], gyrs[i], accs[i],
                      jax.random.PRNGKey(i))

    state = global_batched_state(static, b, mesh,
                                 template=jax.tree.map(np.asarray, st))
    step = batched.make_batched_step(consts, static, mesh)

    dspec = P("data")
    args = [
        make_global(mesh, dspec,
                    np.broadcast_to(np.asarray(x), (b,) + np.shape(x)))
        for x in (frames[2][0], frames[2][1], gyrs[2], accs[2], mask)
    ]
    keys = make_global(
        mesh, dspec, np.asarray(jax.random.split(jax.random.PRNGKey(2), b)))
    new_state, metrics = step(state, *args, keys)
    jax.block_until_ready(new_state)

    # every process asserts ITS addressable lanes (together they cover the
    # whole batch; no cross-host gather needed for the check)
    def local(x):
        return np.concatenate(
            [np.asarray(s.data).ravel() for s in x.addressable_shards]
        )

    tracked = local(metrics["n_tracked"])
    ba_iters = local(metrics["ba_iters"])
    assert tracked.size > 0
    assert (tracked > 0).all(), (
        f"p{process_id}: no tracking under multihost mesh: {tracked}"
    )
    assert (ba_iters > 0).all(), f"p{process_id}: BA did not run: {ba_iters}"
    print(
        f"dryrun_multihost p{process_id} OK: processes={num_processes} "
        f"mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
        f"batch={b} local_tracked={tracked.tolist()} "
        f"local_ba_iters={ba_iters.tolist()}",
        flush=True,
    )
