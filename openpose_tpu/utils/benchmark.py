"""Chained-iteration device timing that survives async dispatch tunnels.

Naive per-call timing is meaningless when the device is reached through an
async remote-execution tunnel: dispatch returns immediately,
``block_until_ready`` can resolve before the remote compute finishes, and a
host readback pays a full RPC round trip (~0.5 s) that dwarfs the kernel.

``chain_ms`` instead runs N data-dependent iterations of the workload inside
ONE jitted ``lax.fori_loop`` whose carry scalar perturbs the inputs and folds
the outputs (so iterations serialize and nothing is constant-folded or
deduplicated), reads back a single scalar, and reports
``(t(n_hi) - t(n_lo)) / (n_hi - n_lo)`` — constant RPC latency and dispatch
overhead cancel in the difference.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def bf16_peak_tflops(device_kind: str | None = None) -> float:
    """Published per-chip bf16 peak (TFLOP/s) by device_kind substring;
    0.0 when unknown (e.g. the virtual CPU mesh)."""
    if device_kind is None:
        device_kind = jax.devices()[0].device_kind
    kind = device_kind.lower()
    for key, peak in (("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0),
                      ("v6 lite", 918.0), ("v6e", 918.0), ("v4", 275.0),
                      ("v3", 123.0), ("v2", 45.0)):
        if key in kind:
            return peak
    return 0.0


def fold(carry: jax.Array, *outputs: jax.Array) -> jax.Array:
    """Fold a FULL reduction of every output into the chain carry.

    A single consumed output element is NOT enough to keep a chained stage
    alive: XLA can slice-propagate the one element backwards and
    dead-code-eliminate most of the stage (observed twice: round-3 post
    chains, and round-4's physically-impossible 4-scale number — 292
    implied TFLOP/s on a 197-peak chip).  ``jnp.sum`` over each output
    costs microseconds at these sizes and closes that hole for good: every
    element of every output feeds the carry, so nothing upstream is dead.
    """
    for out in outputs:
        carry = carry + jnp.sum(out, dtype=jnp.float32) * 1e-12
    return carry


def chain_ms(step_fn: Callable[[jax.Array], jax.Array],
             n_lo: int = 2, n_hi: int = 22, reps: int = 3) -> float:
    """Milliseconds per application of step_fn (carry f32 scalar -> carry).

    step_fn must thread its scalar argument into the workload inputs (e.g.
    ``inputs + carry * 1e-12``) and fold a FULL reduction of every output
    back into the returned carry (use ``fold``) — a single consumed element
    lets XLA slice-propagate and drop most of the body (see ``fold``).
    """
    @jax.jit
    def run(n):
        return jax.lax.fori_loop(
            0, n, lambda i, c: step_fn(c), jnp.float32(0.0))

    float(run(jnp.int32(n_hi)))           # compile + warm the whole chain

    def timed(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(jnp.int32(n)))      # scalar readback = true sync
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = timed(n_lo)
    t_hi = timed(n_hi)
    return max(t_hi - t_lo, 0.0) / (n_hi - n_lo) * 1000.0
