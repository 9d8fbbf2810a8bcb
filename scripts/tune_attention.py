"""Attention-kernel + bench tuning sweep (run on the real TPU).

Measures (1) kernel-only TFLOP/s at the bench shape over block-size grid and
(2) end-to-end generation throughput vs PAIRS. Prints a table; use the winner
to set bench.py / pallas_attention.py defaults.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def kernel_sweep():
    from rap_tpu.ops.pallas_attention import flash_attention

    B, T, H, d = 8, 8192, 8, 64
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, T, H, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, T, H, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, T, H, d), jnp.bfloat16)
    mask = jnp.ones((B, T), bool)
    flops = 4.0 * B * H * T * T * d  # QK^T + PV, 2 FLOP/MAC

    print(f"kernel sweep: B={B} T={T} H={H} d={d} ({flops/1e12:.2f} TFLOP)")
    results = []
    for bq in (256, 512, 1024, 2048):
        for bk in (512, 1024, 2048):
            try:
                f = jax.jit(
                    lambda q, k, v: flash_attention(
                        q, k, v, mask, block_q=bq, block_k=bk
                    )
                )
                f(q, k, v).block_until_ready()
                times = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    f(q, k, v).block_until_ready()
                    times.append(time.perf_counter() - t0)
                dt = float(np.median(times))
                tf = flops / dt / 1e12
                results.append((tf, bq, bk))
                print(f"  bq={bq:5d} bk={bk:5d}: {dt*1e3:7.2f} ms  {tf:6.1f} TFLOP/s")
            except Exception as e:
                print(f"  bq={bq:5d} bk={bk:5d}: FAIL {type(e).__name__}: {str(e)[:80]}")
    if results:
        best = max(results)
        print(f"BEST: bq={best[1]} bk={best[2]} -> {best[0]:.1f} TFLOP/s")


def bwd_sweep():
    """fwd+bwd sweep over (impl, bwd block caps). Timings amortized over a
    K-iteration lax.scan inside one jit (single calls carry ~25 ms tunnel
    RTT) with per-iteration input variation (identical inputs can hit the
    tunnel result cache and return instantly)."""
    from rap_tpu.ops import pallas_attention as pa

    B, T, H, d = 8, 8192, 8, 64
    K = 8
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, T, H, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, T, H, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, T, H, d), jnp.bfloat16)
    mask = jnp.ones((B, T), bool)
    flops = 10.0 * B * H * T * T * d  # fwd 4 + bwd ~6 (dv,dp,dk,dq + recompute)

    print(f"fwd+bwd sweep (scan x{K} amortized):")
    results = []
    for impl in ("fused", "split"):
        pa.BWD_IMPL = impl
        for bq in (256, 512, 1024):
            for bk in (512, 1024, 2048):
                def loss(q, k, v):
                    return jnp.sum(
                        pa.flash_attention(q, k, v, mask, block_q=1024,
                                           block_k=2048)
                        .astype(jnp.float32) ** 2
                    )

                grad = jax.grad(loss, argnums=(0, 1, 2))

                def body(c, i):
                    qq = q * (1.0 + i.astype(jnp.bfloat16) * 1e-6)
                    dq, dk, dv = grad(qq, k, v)
                    return c, dq[0, 0, 0, 0]

                def run(q, k, v):
                    _, ys = jax.lax.scan(body, 0, jnp.arange(K))
                    return ys

                try:
                    pa.BWD_BQ_CAP, pa.BWD_BK_CAP = bq, bk
                    f = jax.jit(run)
                    jax.block_until_ready(f(q, k, v))
                    times = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        jax.block_until_ready(f(q, k, v))
                        times.append((time.perf_counter() - t0) / K)
                    dt = float(np.median(times))
                    tf = flops / dt / 1e12
                    results.append((tf, impl, bq, bk))
                    print(f"  {impl:5s} bq={bq:5d} bk={bk:5d}: "
                          f"{dt*1e3:7.2f} ms  {tf:6.1f} TFLOP/s")
                except Exception as e:
                    print(f"  {impl:5s} bq={bq:5d} bk={bk:5d}: FAIL "
                          f"{type(e).__name__}: {str(e)[:80]}")
                finally:
                    pa.BWD_BQ_CAP, pa.BWD_BK_CAP = 512, 1024
        pa.BWD_IMPL = "fused"
    if results:
        best = max(results)
        print(f"BEST: {best[1]} bq={best[2]} bk={best[3]} -> {best[0]:.1f} TFLOP/s")


def pairs_sweep():
    from rap_tpu.core.batch import make_regular_synthetic_batch
    from rap_tpu.models import DiTConfig
    from rap_tpu.models.dit import init_dit_params
    from rap_tpu.registration import RPFConfig, predict_poses, sample

    N = 4096
    cfg = RPFConfig(model=DiTConfig(num_layers=12), inference_sampling_steps=10)
    params = init_dit_params(jax.random.key(1), cfg.model)
    print("pairs sweep (end-to-end generate):")
    for pairs in (2, 4, 8, 16):
        batch = make_regular_synthetic_batch(
            jax.random.key(0),
            points_per_part=[[N, N] for _ in range(pairs)],
            N=N, P=2, S=pairs, feat_dim=cfg.model.local_feat_dim,
        )

        @jax.jit
        def gen(params, batch, key):
            out = sample(params, cfg, batch, key, return_trajectory=False)
            R, t = predict_poses(batch, out["points"])
            return out["points"], R, t

        key = jax.random.key(2)
        try:
            jax.block_until_ready(gen(params, batch, key))
            times = []
            for r in range(3):
                t0 = time.perf_counter()
                for i in range(3):
                    res = gen(params, batch, jax.random.fold_in(key, i))
                jax.block_until_ready(res)
                times.append((time.perf_counter() - t0) / 3)
            dt = float(np.median(times))
            print(f"  PAIRS={pairs:3d}: {dt*1e3:8.1f} ms/batch  {pairs/dt:6.2f} pairs/s")
        except Exception as e:
            print(f"  PAIRS={pairs:3d}: FAIL {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    if which in ("all", "kernel"):
        kernel_sweep()
    if which in ("all", "bwd"):
        bwd_sweep()
    if which in ("all", "pairs"):
        pairs_sweep()
