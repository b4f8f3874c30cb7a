"""Batched multi-sequence replay: N independent recordings as ONE TPU
workload.

The reference is strictly single-sequence; this is the scale-out mode from
BASELINE.md ("all EuRoC runs vmapped as one TPU workload"): each sequence is
bootstrapped through SYNCHRONIZING/SFM/INITIALIZING independently (host-paced
one-time work), then all sequences advance through the steady-state VIO step
together in one vmapped (optionally mesh-sharded) dispatch per frame index.

Sequences keep independent keyframe decisions, feature pools, and windows —
the batched step is just `vmap(ok_step)`; per-sequence divergence lives in
the state, not in control flow. Throughput measured at 278 frames/s/chip for
batch 64 (BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.models import vio as vio_mod
from pose_estimation_tpu.slam import State, VisualInertialSLAM
from pose_estimation_tpu.utils.config import VIOConfig


class BatchedReplay:
    """Drive N sequences in lock-step through the batched steady-state step.

    Usage:
        br = BatchedReplay(cfg, n_sequences)
        br.bootstrap(i, feed_fn_i)   # per-sequence init (any FSM path)
        br.run(frames_iter)          # frames_iter yields per-seq inputs
    """

    def __init__(self, cfg: VIOConfig, n: int, mesh=None, seed: int = 0):
        self.cfg = cfg
        self.n = n
        # per-sequence scalar FSMs for the bootstrap phase
        self.slams = [
            VisualInertialSLAM(cfg, seed=seed + i, verbose=False)
            for i in range(n)
        ]
        consts, static = self.slams[0].consts, self.slams[0].static
        self.consts, self.static = consts, static
        step = functools.partial(vio_mod.ok_step, consts=consts, static=static)
        vstep = jax.vmap(step)
        if mesh is not None:
            from pose_estimation_tpu.parallel.batched import _state_sharding
            from jax.sharding import NamedSharding, PartitionSpec as P

            dummy = vio_mod.init_vio_state(static)
            st_sh = _state_sharding(mesh, dummy)
            data = NamedSharding(mesh, P("data"))
            self._step = jax.jit(
                vstep,
                in_shardings=(st_sh, data, data, data, data, data, data),
                out_shardings=(st_sh, None),
            )
        else:
            self._step = jax.jit(vstep)
        self._key = jax.random.PRNGKey(seed + 977)
        self.batched_state = None
        self.trajectories: list[list] = [[] for _ in range(n)]

    def bootstrap(self, feed_fns) -> None:
        """feed_fns[i](slam) drives sequence i's FSM until it reaches OK
        (replaying its own prefix of frames through the scalar pipeline)."""
        for i, fn in enumerate(feed_fns):
            fn(self.slams[i])
            if self.slams[i].state != State.OK:
                raise RuntimeError(f"sequence {i} failed to initialize")
        self.batched_state = jax.tree.map(
            lambda *leaves: jnp.stack(leaves), *[s.vio for s in self.slams]
        )

    def step(self, imgs_l, imgs_r, gyrs, accs, masks, timestamps=None):
        """One lock-step frame for all sequences. Inputs have leading dim N."""
        assert self.batched_state is not None, "call bootstrap() first"
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, self.n)
        self.batched_state, metrics = self._step(
            self.batched_state,
            jnp.asarray(imgs_l), jnp.asarray(imgs_r),
            jnp.asarray(gyrs), jnp.asarray(accs), jnp.asarray(masks), keys,
        )
        if timestamps is not None:
            p = self.batched_state.win.p[:, -1]  # [N, 3], device
            for i, ts in enumerate(timestamps):
                self.trajectories[i].append((ts, p[i]))
        return metrics

    def trajectory(self, i: int) -> np.ndarray:
        """[T, 4] (ts, x, y, z) for sequence i (bootstrap part excluded)."""
        if not self.trajectories[i]:
            return np.zeros((0, 4))
        return np.array(
            [[ts, *np.asarray(p)] for ts, p in self.trajectories[i]]
        )
