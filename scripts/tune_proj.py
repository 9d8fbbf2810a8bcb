"""Fused-projection kernel microbench (run on the real TPU).

Times adaln_qkv / fused_ff / attn_out at the bench shapes (PAIRS=2: G=4,
N=4096, D=512, H=8, dh=64), amortized over a lax.scan of >=20 applications
(single-call timings through the tunnel carry ~25 ms RTT — CLAUDE.md).

The bench trace attributes 70 ms/batch to the QKV projection = 240 calls
(12 layers x 2 attentions x 10 steps) -> ~0.29 ms/call vs a 0.13 ms matmul
floor; this harness exists to close that gap kernel-side.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def amortized(f, args, n=40, reps=3):
    """Median per-application seconds of f over a scanned chain."""

    def chain(args):
        def body(c, _):
            out = f(*c[:-1], c[-1])
            # fold the output back into the carry to serialize applications
            x = c[0]
            upd = out[0] if isinstance(out, (tuple, list)) else out
            x = (x + 1e-6 * jnp.mean(upd.astype(jnp.float32))).astype(x.dtype)
            return (x, *c[1:]), ()

        (x, *_), _ = jax.lax.scan(body, args, None, length=n)
        return x

    g = jax.jit(chain)
    g(args).block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        g(args).block_until_ready()
        ts.append((time.perf_counter() - t0) / n)
    return float(np.median(ts))


def qkv_bench():
    from rap_tpu.ops import fused_proj

    G, N, D, H, dh = 4, 4096, 512, 8, 64
    P = 2
    ks = jax.random.split(jax.random.key(0), 8)
    x = jax.random.normal(ks[0], (G, N, D), jnp.bfloat16)
    ada = jax.random.normal(ks[1], (G, 2 * D), jnp.float32) * 0.1
    w = jax.random.normal(ks[2], (D, 3 * D), jnp.float32) * 0.02
    gq = jnp.ones((H, dh), jnp.float32)
    gk = jnp.ones((H, dh), jnp.float32)
    flop = 2.0 * G * N * D * 3 * D
    print(f"adaln_qkv G={G} N={N} D={D} ({flop/1e9:.1f} GFLOP/call)")
    for is_global in (False, True):
        for impl in ("pallas", "xla"):
            f = lambda x, ada, w, gq, gk: fused_proj.adaln_qkv(
                x, ada, w, gq, gk, P, is_global, impl=impl
            )
            try:
                dt = amortized(f, (x, ada, w, gq, gk))
                print(
                    f"  global={int(is_global)} {impl:6s}: {dt*1e3:6.3f} ms "
                    f"{flop/dt/1e12:6.1f} TFLOP/s"
                )
            except Exception as e:
                print(f"  global={int(is_global)} {impl}: FAIL {str(e)[:100]}")


def out_bench():
    from rap_tpu.ops import fused_proj

    G, N, D, H, dh = 4, 4096, 512, 8, 64
    P = 2
    ks = jax.random.split(jax.random.key(0), 4)
    res = jax.random.normal(ks[1], (G, N, D), jnp.bfloat16)
    w = jax.random.normal(ks[2], (H * dh, D), jnp.float32) * 0.02
    b = jnp.zeros((D,), jnp.float32)
    flop = 2.0 * G * N * H * dh * D
    print(f"attn_out ({flop/1e9:.1f} GFLOP/call)")
    for is_global in (False, True):
        a5 = jax.random.normal(
            ks[0],
            (2, H, P, N, dh) if is_global else (G, H, N, dh),
            jnp.bfloat16,
        )
        for impl in ("pallas", "xla"):
            f = lambda a5, res, w, b: fused_proj.attn_out(
                a5, res, w, b, P, is_global, impl=impl
            )
            try:
                dt = amortized(f, (a5, res, w, b))
                print(
                    f"  global={int(is_global)} {impl:6s}: {dt*1e3:6.3f} ms "
                    f"{flop/dt/1e12:6.1f} TFLOP/s"
                )
            except Exception as e:
                print(f"  global={int(is_global)} {impl}: FAIL {str(e)[:100]}")


def ff_bench():
    from rap_tpu.ops import fused_ff

    G, N, D = 4, 4096, 512
    inner = 2048
    ks = jax.random.split(jax.random.key(0), 6)
    x = jax.random.normal(ks[0], (G, N, D), jnp.bfloat16)
    ws = jnp.ones((D,), jnp.float32)
    wb = jnp.zeros((D,), jnp.float32)
    wi = jax.random.normal(ks[1], (D, 2 * inner), jnp.float32) * 0.02
    bi = jnp.zeros((2 * inner,), jnp.float32)
    wo = jax.random.normal(ks[2], (inner, D), jnp.float32) * 0.02
    bo = jnp.zeros((D,), jnp.float32)
    flop = 2.0 * G * N * (D * 2 * inner + inner * D)
    print(f"geglu_ff ({flop/1e9:.1f} GFLOP/call)")
    for impl in ("pallas", "xla"):
        f = lambda x, wi, bi, wo, bo: fused_ff.geglu_ff(
            x, ws, wb, wi, bi, wo, bo, impl=impl
        )
        try:
            dt = amortized(f, (x, wi, bi, wo, bo))
            print(
                f"  {impl:6s}: {dt*1e3:6.3f} ms {flop/dt/1e12:6.1f} TFLOP/s"
            )
        except Exception as e:
            print(f"  {impl}: FAIL {str(e)[:100]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    if which in ("all", "qkv"):
        qkv_bench()
    if which in ("all", "out"):
        out_bench()
    if which in ("all", "ff"):
        ff_bench()
