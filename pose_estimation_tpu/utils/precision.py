"""Trace-time matmul-precision guard for accuracy-critical public ops.

TPU's platform default lowers f32 matmuls to ONE bf16 MXU pass, which
silently destroys the solver/geometry path (measured on chip: simulator ATE
2.3% of path -> 61-165% — see NOTES.md). Every framework entry point
funnels through `models.vio.build_constants`, which sets the process-global
`jax_default_matmul_precision`; this decorator closes the remaining trap
for callers composing `ops/` / `backend/` / `imu/` functions DIRECTLY: each
decorated function traces its body under a `jax.default_matmul_precision
("highest")` scope, so its matmuls are full-precision regardless of ambient
configuration.

Explicit `precision=` arguments at individual call sites (the int8 Hamming
dots and one-hot select/scatter matmuls that are provably safe at DEFAULT)
take priority over the ambient scope, so the throughput opt-outs survive.
The scope is trace-time only — zero runtime cost.
"""

from __future__ import annotations

import functools

import jax


def full_precision(fn):
    """Decorator: trace `fn` under full-f32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
