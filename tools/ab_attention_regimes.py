"""A/B the Pallas masked-attention kernel vs the XLA path across regimes.

VERDICT round-2 item 8: the kernel is wired and numerically neutral at
SCAE's tiny set sizes — measure regimes where it COULD win (large
inducing-point ISAB shapes, bigger dims) and decide: keep the config
knob or demote to a documented negative result.

Per regime, times fwd+bwd (value_and_grad wrt q/k/v) over K-step scans,
host-value sync (the axon timing contract, BASELINE.md).

Usage: python tools/ab_attention_regimes.py  (on the TPU)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from scae_tpu.ops.attention import qkv_attention

K = 30

# (label, B, N, M, d_k, d_v) — N queries attending over M masked keys
REGIMES = [
    ("scae-flagship", 128, 40, 40, 16, 16),
    ("scae-final-pool", 128, 32, 40, 256, 256),
    ("isab-i256-in", 128, 256, 40, 64, 64),     # MAB(inducing, x)
    ("isab-i256-out", 128, 40, 256, 64, 64),    # MAB(x, h)
    ("large-set", 32, 512, 512, 64, 64),
    ("xl-set", 8, 1024, 1024, 128, 128),
]


def bench(use_pallas, B, N, M, dk, dv):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, N, dk))
    k = jax.random.normal(ks[1], (B, M, dk))
    v = jax.random.normal(ks[2], (B, M, dv))
    p = jax.random.uniform(ks[3], (B, M))

    def loss(q, k, v):
        return jnp.sum(qkv_attention(q, k, v, p,
                                     use_pallas=use_pallas) ** 2)

    vg = jax.value_and_grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def scan_k(q, k, v):
        def body(c, _):
            q, k, v = c
            val, g = vg(q, k, v)
            return (q + 1e-12 * g[0], k + 1e-12 * g[1],
                    v + 1e-12 * g[2]), val
        return jax.lax.scan(body, (q, k, v), None, length=K)

    _, vs = scan_k(q, k, v)
    float(vs[-1])  # sync
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        _, vs = scan_k(q, k, v)
        float(vs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1e3


def main():
    print(f"{'regime':>16} {'B':>4} {'N':>5} {'M':>5} {'d':>4} "
          f"{'xla ms':>8} {'pallas ms':>10} {'ratio':>6}")
    for label, B, N, M, dk, dv in REGIMES:
        xla = bench(False, B, N, M, dk, dv)
        pal = bench(True, B, N, M, dk, dv)
        print(f"{label:>16} {B:>4} {N:>5} {M:>5} {dk:>4} "
              f"{xla:>8.3f} {pal:>10.3f} {xla / pal:>6.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
