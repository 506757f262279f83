"""TPU probe: decompose the big-K (9-mer) TK pre-pass cost.

Times pre_tk_batch_ckpt at production shape plus microbenchmarks of its
ingredients (backward-only scan, forward+selection scan, select_topk,
suc/prec sums, raw elementwise sweeps) so the Mosaic TK kernel design
targets the real cost centers.  Run on TPU:
    python scripts/probe_tk_micro.py [T_pad] [R]
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

import functools

import jax.numpy as jnp
import numpy as np

from dynamont_tpu.constants import NT_TRANSITIONS
from dynamont_tpu.ops import ntc_batch as nb


def timed(label, fn, *args, n=3):
    import numpy as _np

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        # belt and braces: block_until_ready alone under-measured some
        # multi-output programs on the axon backend (a 41 s pass read
        # 0.1 ms); touch one element of every leaf on host
        for leaf in jax.tree_util.tree_leaves(r):
            _np.asarray(leaf).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts) * 1e3:9.1f} ms", flush=True)
    return out


def main():
    T_pad = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    K = 4 ** 9
    A = 4
    CK0 = 112
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    nt = NT_TRANSITIONS["rna004"]
    log_m1, log_e2 = math.log(nt["m1"]), math.log(nt["e2"])

    sig = jax.device_put(rng.normal(0, 1, (R, T_pad - 1)).astype(np.float32))
    T_r = jax.device_put(np.full((R,), T_pad, np.int32))
    mu = jax.device_put(rng.normal(0, 1, K).astype(np.float32))
    c1 = jax.device_put(np.full(K, -0.9, np.float32))
    c2 = jax.device_put((2.0 + rng.random(K)).astype(np.float32))
    print(f"TK probe: R={R} T_pad={T_pad} K={K}", flush=True)

    full = jax.jit(functools.partial(
        nb.pre_tk_batch_ckpt, log_m1=log_m1, log_e2=log_e2,
        alphabet_size=A, cap=CK0, dtype=dtype, chunk=128))
    timed("pre_tk_batch_ckpt (full)", lambda: full(
        sig, T_r, mu, c1, c2), n=3)

    # backward-ckpt pass alone: reuse the internal structure by timing a
    # scan with the same body shape
    NEG_INF = -np.inf

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

    @jax.jit
    def bwd_only(sig):
        negK = jnp.full((R, K), NEG_INF, dtype)
        sig_b = jnp.concatenate([sig, jnp.zeros((R, 1), dtype)], axis=1)
        ts = jnp.arange(T_pad, dtype=jnp.int32)
        out, _ = jax.lax.scan(bstep, (negK, negK), (sig_b.T, ts),
                              reverse=True)
        return out

    timed("bwd scan only (no ckpt store)", bwd_only, sig)

    # one-step ingredient costs, amortized over 512 fused steps via scan
    x = jax.device_put(rng.normal(0, 1, (R, K)).astype(np.float32))

    def loop(body):
        @jax.jit
        def run(x0):
            def f(c, _):
                return body(c), None
            y, _ = jax.lax.scan(f, x0, None, length=256)
            return y
        return run

    timed("256x elementwise mul-add   ", loop(lambda v: v * 1.0001 + 0.1), x)
    timed("256x logaddexp(v, v*.99)   ", loop(
        lambda v: jnp.logaddexp(v, v * 0.99)), x)
    timed("256x suc_sum_b             ", loop(
        lambda v: nb._suc_sum_b(v, A)), x)
    timed("256x prec_sum_b            ", loop(
        lambda v: nb._prec_sum_b(v, A)), x)

    def sel(v):
        cand, cnt, ovf = nb.select_topk(
            v, CK0, ge_break=True,
            col_live=jnp.ones((R,), bool), sentinel=K)
        return v + cnt[:, None] * 1e-9

    timed("256x select_topk cap=112   ", loop(sel), x)


if __name__ == "__main__":
    main()
