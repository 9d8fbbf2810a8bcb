"""On-chip training validation (VERDICT #2 done-criteria):
  1. jax.grad parity pallas-vs-chunked attention at T=4096 on the real TPU.
  2. One real make_train_step at 8192 tokens per sample (2 parts x 4096
     points) on the chip (rap_12-sized model, bf16 compute, remat on).
Run: timeout 1800 python scripts/tpu_training_check.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def grad_parity_on_tpu():
    from rap_tpu.ops.attention import batched_attention

    ks = jax.random.split(jax.random.key(0), 5)
    B, T, H, d = 2, 4096, 8, 64
    q = jax.random.normal(ks[0], (B, T, H, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, T, H, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, T, H, d), jnp.bfloat16)
    mask = jax.random.uniform(ks[3], (B, T)) > 0.2
    w = jax.random.normal(ks[4], (B, T, H, d), jnp.bfloat16)

    def loss(impl):
        def f(q, k, v):
            o = batched_attention(q, k, v, mask, impl=impl)
            return jnp.sum(o.astype(jnp.float32) * w.astype(jnp.float32))
        return f

    gp = jax.jit(jax.grad(loss("pallas"), argnums=(0, 1, 2)))(q, k, v)
    gc = jax.jit(jax.grad(loss("chunked"), argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(gp, gc, "qkv"):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(float(np.abs(b).max()), 1e-6)
        rel = float(np.abs(a - b).max()) / denom
        print(f"  d{name}: max rel err {rel:.4f}")
        assert rel < 0.05, f"d{name} mismatch (bf16 tolerance exceeded)"
    print("grad parity pallas-vs-chunked @ T=4096 on TPU: OK")


def train_step_at_8k():
    from rap_tpu.core.batch import make_regular_synthetic_batch
    from rap_tpu.models import DiTConfig
    from rap_tpu.models.dit import init_dit_params
    from rap_tpu.registration import RPFConfig
    from rap_tpu.train import (
        OptimizerConfig, TrainState, build_optimizer, make_train_step,
    )

    model = DiTConfig(num_layers=12)   # rap_12, bf16 compute
    cfg = RPFConfig(model=model)
    N = 4096
    batch = make_regular_synthetic_batch(
        jax.random.key(0), [[N, N]], N=N, P=2, S=1,
        feat_dim=model.local_feat_dim,
    )  # 8192 tokens per sample
    tx = build_optimizer(OptimizerConfig(name="muon"), steps_per_epoch=1)
    params = init_dit_params(jax.random.key(1), model)
    state = TrainState.create(params, tx, jax.random.key(2))
    step = make_train_step(cfg, tx, remat=True)

    t0 = time.time()
    state, metrics = step(state, batch)
    loss0 = float(metrics["loss"])
    print(f"  compile+step: {time.time() - t0:.1f}s, loss={loss0:.4f}, "
          f"grad_norm={float(metrics['grad_norm']):.4f}")
    assert np.isfinite(loss0)
    ts = []
    for _ in range(5):
        t0 = time.time()
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics["loss"])
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    # rough train-step FLOPs: fwd 4.1 TFLOP + bwd ~2x + remat recompute ~1x
    tf = 4.1 * 4 / dt
    print(f"  steady train step @ 8192 tokens: {dt * 1e3:.0f} ms "
          f"(~{tf:.0f} TFLOP/s effective)")
    assert np.isfinite(float(metrics["loss"]))
    print("make_train_step rap_12 @ 8192 tokens/sample on TPU: OK")


if __name__ == "__main__":
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    assert dev.platform == "tpu", (
        "this validation must run on the real TPU — on CPU the pallas path "
        "falls back to interpret mode and proves nothing"
    )
    grad_parity_on_tpu()
    train_step_at_8k()
