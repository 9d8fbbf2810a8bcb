"""ODE samplers for rectified point flow, as `lax.scan` loops.

Behavioral parity with /root/reference/rectified_point_flow/sampler.py:
  - t runs 1 -> 0 in ``num_steps`` uniform Euler steps (sampler.py:11-92):
      v      = model(x_t, t)
      x0_hat = x_t - v * t
      x_t    <- x_t - dt * v
  - optional rigidity forcing (sampler.py:55-60): per-part Procrustes-rigidify
    x0_hat, then re-interpolate x_t = x0_rigid * (1 - t + dt) + x_1 * (t - dt).
  - both trajectories are recorded: end-point (x0_hat) and x_t.

TPU-first divergence: the loop is a single compiled ``lax.scan`` with the
rigidity forcing fully on-device (batched Kabsch, core/procrustes.py), instead
of a Python loop with serial SVDs. The reference's sampling is anchor-free
(anchor-clamp lines commented out, sampler.py:44,91) — same here.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .procrustes import rigidify_prediction


class SampleResult(NamedTuple):
    x_final: jax.Array                 # (G, N, 3) final x_t (t=0)
    end_point_trajectory: jax.Array | None  # (steps, G, N, 3) x0_hat per step
    trajectory: jax.Array | None       # (steps, G, N, 3) x_t per step


def make_schedule(num_steps: int, schedule: str = "uniform") -> jnp.ndarray:
    """Timestep grid ts (num_steps+1,) from 1 to 0 for the ODE integrator.

    The reference integrates on a uniform grid only (sampler.py:30: t_span =
    linspace(1, 0)); a non-uniform grid re-allocates the same model-call
    budget to where the learned field actually curves — a free knob at
    inference time (no retraining). Schedules:

      uniform     equal dt (the reference protocol)
      cosine      ts = cos(pi/2 * (1-u)); fine near t=0 (endpoint polish)
      power:k     ts = u^k over u = linspace(1,0): k>1 concentrates steps
                  near t=0; k<1 near t=1 (where the measured velocity loss
                  is largest — docs/synthetic_training.md t-binned loss)
    """
    import numpy as np

    u = np.linspace(1.0, 0.0, num_steps + 1)
    if schedule == "uniform":
        ts = u
    elif schedule == "cosine":
        ts = np.cos(np.pi / 2 * (1.0 - u))
    elif schedule.startswith("power:"):
        k = float(schedule.split(":", 1)[1])
        if k <= 0:
            raise ValueError(f"power schedule needs k > 0, got {k}")
        ts = u**k
    else:
        raise ValueError(
            f"Unknown schedule: {schedule!r}. "
            "Available: uniform, cosine, power:<k>"
        )
    ts[0], ts[-1] = 1.0, 0.0
    return jnp.asarray(ts, jnp.float32)


def flow_sampler(
    velocity_fn: Callable[[jax.Array, jax.Array], jax.Array],
    x_1: jax.Array,
    condition: jax.Array,
    point_mask: jax.Array,
    num_steps: int = 20,
    rigidity_forcing: bool = False,
    return_trajectory: bool = True,
    method: str = "euler",
    schedule: str = "uniform",
    ts: jnp.ndarray | None = None,
    x_start: jax.Array | None = None,
) -> SampleResult:
    """Integrate the learned flow from noise ``x_1`` (t=1) to the scene (t=0).

    Args:
        velocity_fn: ``(x_t (G,N,3), t scalar) -> v (G,N,3)``; the model wrapper
            is responsible for broadcasting t to per-sample timesteps.
        x_1: (G, N, 3) Gaussian noise. Under rigidity forcing this is the
            noise the re-interpolation blends with, even when the
            integration starts elsewhere (``x_start``).
        condition: (G, N, 3) unposed input parts (used by rigidity forcing).
        point_mask: (G, N) validity mask.
        num_steps: static step count.
        method: 'euler' | 'rk2' | 'rk4'. The reference defines rk2/rk4 step
            fns but leaves them unregistered (sampler.py:94-167, factory
            registers euler only); here all three integrate. rk steps cost
            2x/4x model evaluations per step. Anchor-free like euler (the
            reference rk anchor clamps belong to its disabled anchored mode).
        ts: optional explicit timestep grid (overrides num_steps/schedule) —
            lets a caller split one ODE into segments (e.g. the pruned
            coarse-then-fine sampler in registration.sample) while keeping
            the exact same query points as the unsplit grid.
        x_start: optional integration start state at t = ts[0] (defaults to
            ``x_1`` — the standard from-noise case at t=1).
    """
    if method not in ("euler", "rk2", "rk4"):
        raise ValueError(
            f"Unknown sampler: {method}. Available: ['euler', 'rk2', 'rk4']"
        )
    if ts is None:
        ts = make_schedule(num_steps, schedule)

    def step(x_t, t_pair):
        t, t_next = t_pair
        dt = t - t_next
        v1 = velocity_fn(x_t, t)
        if method == "euler":
            v_eff = v1
        elif method == "rk2":  # midpoint (ref sampler.py:94-115)
            t_mid = 0.5 * (t + t_next)
            v2 = velocity_fn(x_t - 0.5 * dt * v1, t_mid)
            v_eff = 0.5 * (v1 + v2)
        else:  # rk4 (ref sampler.py:117-149)
            t_half = 0.5 * (t + t_next)
            v2 = velocity_fn(x_t - 0.5 * dt * v1, t_half)
            v3 = velocity_fn(x_t - 0.5 * dt * v2, t_half)
            v4 = velocity_fn(x_t - dt * v3, t_next)
            v_eff = (v1 + 2.0 * v2 + 2.0 * v3 + v4) / 6.0
        # x_0_hat from the integrator's effective slope (== v1 for euler, the
        # reference's x_0_hat = x_t - v*t); rk's higher-order slope must feed
        # the end-point estimate too, or rigidity forcing — which rebuilds
        # x_next FROM x_0_hat — would silently discard the extra evals
        x_0_hat = x_t - v_eff * t
        x_next = x_t - dt * v_eff
        if rigidity_forcing:
            # note: the recorded end-point trajectory keeps the *raw* x_0_hat,
            # matching reference sampler.py:58-66. 1 - t + dt == 1 - t_next.
            x_0_rigid = rigidify_prediction(x_0_hat, condition, point_mask)
            x_next = x_0_rigid * (1.0 - t_next) + x_1 * t_next
        out = (x_0_hat, x_next) if return_trajectory else None
        return x_next, out

    x0 = x_1 if x_start is None else x_start
    x_final, traj = jax.lax.scan(step, x0, (ts[:-1], ts[1:]))
    if return_trajectory:
        end_point_traj, xt_traj = traj
        return SampleResult(x_final, end_point_traj, xt_traj)
    return SampleResult(x_final, None, None)


def compute_linearity(trajectory: jax.Array, mask: jax.Array) -> jax.Array:
    """Ratio of straight-line to path length per point (ref modeling.py:31-47).

    trajectory: (steps, G, N, 3) -> (G, N); masked points get 0.
    """
    straight = jnp.linalg.norm(trajectory[0] - trajectory[-1], axis=-1)
    seglen = jnp.linalg.norm(jnp.diff(trajectory, axis=0), axis=-1)
    path = jnp.sum(seglen, axis=0)
    lin = straight / jnp.maximum(path, 1e-12)
    return jnp.where(mask, lin, 0.0)
