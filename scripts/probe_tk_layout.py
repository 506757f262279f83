"""TPU probe: ys store layout variants for the TK rederive scan.

The rederive phase stores two (R, K) states per step; the production code
flattens to (R*K,) which may force a physical relayout of the tiled
layout every step.  Variants: flat, 2D (R, K), transposed-free 2D with a
dummy consumer.  Run: python scripts/probe_tk_layout.py [T_pad] [R]
"""

import math
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from dynamont_tpu.constants import NT_TRANSITIONS
from dynamont_tpu.ops import ntc_batch as nb

NEG_INF = -np.inf


def timed(label, fn, *args, n=2):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[:1]
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts) * 1e3:9.1f} ms", flush=True)
    return out


def main():
    T_pad = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    K, A, chunk = 4 ** 9, 4, 128
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    nt = NT_TRANSITIONS["rna004"]
    log_m1, log_e2 = math.log(nt["m1"]), math.log(nt["e2"])
    sig = jax.device_put(rng.normal(0, 1, (R, T_pad - 1)).astype(np.float32))
    T_r = jax.device_put(np.full((R,), T_pad, np.int32))
    mu = jax.device_put(rng.normal(0, 1, K).astype(np.float32))
    c1 = jax.device_put(np.full(K, -0.9, np.float32))
    c2 = jax.device_put((2.0 + rng.random(K)).astype(np.float32))
    nc = T_pad // chunk
    print(f"layouts: R={R} T_pad={T_pad} K={K} chunk={chunk}", flush=True)

    def bstep(carry, xs):
        M_next, E_next = carry
        sig_t, t = xs
        d = sig_t[:, None] - mu
        sc = c1 - c2 * d * d
        M_new = E_next + sc
        E_new = jnp.logaddexp(
            nb._suc_sum_b(M_next + sc + log_m1, A), E_next + sc + log_e2)
        is_term = (t == T_r - 1)[:, None]
        dead = (t > T_r - 1)[:, None]
        M_out = jnp.where(is_term | dead, NEG_INF, M_new)
        E_out = jnp.where(is_term, 0.0, jnp.where(dead, NEG_INF, E_new))
        return (M_out, E_out), None

    # plain scan, no stores at all (floor)
    @jax.jit
    def no_store(sig):
        negK = jnp.full((R, K), NEG_INF, dtype)
        sig_b = jnp.concatenate([sig, jnp.zeros((R, 1), dtype)], axis=1)
        ts = jnp.arange(T_pad, dtype=jnp.int32)
        out, _ = jax.lax.scan(bstep, (negK, negK), (sig_b.T, ts),
                              reverse=True)
        return out

    timed("scan no stores (floor)  ", no_store, sig)

    def variant(shape_fn, label):
        def bstep_store(carry, xs):
            new, _ = bstep(carry, xs)
            return new, (shape_fn(new[0]), shape_fn(new[1]))

        @jax.jit
        def run(sig):
            negK = jnp.full((R, K), NEG_INF, dtype)
            sig_b = jnp.concatenate([sig, jnp.zeros((R, 1), dtype)],
                                    axis=1)
            ts = jnp.arange(T_pad, dtype=jnp.int32)
            xsb = (sig_b.T.reshape(nc, chunk, R), ts.reshape(nc, chunk))

            def ch(carry, xs):
                new, ys = jax.lax.scan(bstep_store, carry, xs,
                                       reverse=True)
                # consume ys cheaply so the store isn't DCE'd
                red = sum(jnp.sum(y[..., :1]) for y in ys)
                return new, red

            out, reds = jax.lax.scan(ch, (negK, negK), xsb, reverse=True)
            return out[1][:1, :1], reds

        timed(label, run, sig)

    variant(lambda a: a.reshape(-1), "store flat (R*K,)       ")
    variant(lambda a: a, "store 2D (R, K)         ")
    variant(lambda a: a.reshape(R, 4, K // 4).transpose(1, 0, 2)
            .reshape(4 * R, K // 4),
            "store (4R, K/4) classmaj")


if __name__ == "__main__":
    main()
