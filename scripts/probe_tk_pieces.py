"""TPU probe: piecewise decomposition of pre_tk_batch_ckpt at big K.

Phases timed separately (T_pad=2048 by default; costs scale ~linearly in
T): (1) ckpt backward, (2) rederive-only scan, (3) forward scan without
selection, (4) forward scan with selection, (5) full pass.
Run:  python scripts/probe_tk_pieces.py [T_pad] [R]
"""

import functools
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
        # belt and braces: pull one leaf to host
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf).reshape(-1)[:1]
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts) * 1e3:9.1f} ms", flush=True)
    return out


def main():
    T_pad = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    K, A, CK0, chunk = 4 ** 9, 4, 112, 128
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
    print(f"TK pieces: R={R} T_pad={T_pad} K={K} chunk={chunk}", flush=True)

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
    def phase1_ckpt(sig):
        negK = jnp.full((R, K), NEG_INF, dtype)
        sig_b = jnp.concatenate([sig, jnp.zeros((R, 1), dtype)], axis=1)
        ts = jnp.arange(T_pad, dtype=jnp.int32)
        xsb = (sig_b.T.reshape(nc, chunk, R), ts.reshape(nc, chunk))

        def bchunk(carry, xs):
            new, _ = jax.lax.scan(bstep, carry, xs, reverse=True)
            return new, (carry[0].reshape(-1), carry[1].reshape(-1))

        (_, bE0), ckpts = jax.lax.scan(bchunk, (negK, negK), xsb,
                                       reverse=True)
        return bE0, ckpts

    bE0, ckpts = timed("phase1 ckpt backward        ", phase1_ckpt, sig)

    def bstep_store(carry, xs):
        new, _ = bstep(carry, xs)
        return new, (new[0].reshape(-1), new[1].reshape(-1))

    @jax.jit
    def phase2_rederive(sig, ckpts):
        """All-chunks rederive with stores, consuming via a trivial sum
        (isolates the rederive+store cost from fstep)."""
        sig_b = jnp.concatenate([sig, jnp.zeros((R, 1), dtype)], axis=1)
        ts = jnp.arange(T_pad, dtype=jnp.int32)
        xsb_c = sig_b.T.reshape(nc, chunk, R)
        ts_c = ts.reshape(nc, chunk)

        def fchunk(acc, xs):
            xsb_i, ts_i, ck_flat = xs
            ck = (ck_flat[0].reshape(R, K), ck_flat[1].reshape(R, K))
            _, (bMc, bEc) = jax.lax.scan(bstep_store, ck, (xsb_i, ts_i),
                                         reverse=True)
            return acc + bMc[0, :1] + bEc[0, :1], None

        acc, _ = jax.lax.scan(fchunk, jnp.zeros((1,), dtype),
                              (xsb_c, ts_c, ckpts))
        return acc

    timed("phase2 rederive(+store)     ", phase2_rederive, sig, ckpts)

    M0f = jnp.full((R, K), NEG_INF, dtype)

    def fstep(carry, xs, select: bool, read_b: bool):
        M_prev, E_prev = carry
        if read_b:
            sig_t, bM_f, bE_f, t = xs
        else:
            sig_t, t = xs
        d = sig_t[:, None] - mu
        sc = c1 - c2 * d * d
        M_new = nb._prec_sum_b(E_prev, A) + sc + log_m1
        E_new = jnp.logaddexp(M_prev + sc, E_prev + sc + log_e2)
        first = t == 0
        dead = (t > T_r - 1)[:, None]
        M_out = jnp.where(first, M0f, jnp.where(dead, NEG_INF, M_new))
        E_out = jnp.where(first, jnp.zeros((R, K), dtype),
                          jnp.where(dead, NEG_INF, E_new))
        ys = None
        if select:
            if read_b:
                U = jnp.logaddexp(bM_f.reshape(R, K) + M_out,
                                  bE_f.reshape(R, K) + E_out)
            else:
                U = jnp.logaddexp(M_out, E_out)
            cand, cnt, ovf = nb.select_topk(
                U, CK0, ge_break=True, col_live=t <= T_r - 1, sentinel=K)
            ys = (cand, cnt, ovf)
        return (M_out, E_out), ys

    @jax.jit
    def phase3_fwd_only(sig):
        sig_f = jnp.concatenate([jnp.zeros((R, 1), dtype), sig], axis=1)
        ts = jnp.arange(T_pad, dtype=jnp.int32)
        out, _ = jax.lax.scan(
            functools.partial(fstep, select=False, read_b=False),
            (M0f, jnp.zeros((R, K), dtype)), (sig_f.T, ts))
        return out

    timed("phase3 fwd scan (no select) ", phase3_fwd_only, sig)

    @jax.jit
    def phase4_fwd_select(sig):
        sig_f = jnp.concatenate([jnp.zeros((R, 1), dtype), sig], axis=1)
        ts = jnp.arange(T_pad, dtype=jnp.int32)
        (_, E), ys = jax.lax.scan(
            functools.partial(fstep, select=True, read_b=False),
            (M0f, jnp.zeros((R, K), dtype)), (sig_f.T, ts))
        return E[:1, :1], ys[1]

    timed("phase4 fwd scan + select    ", phase4_fwd_select, sig)

    full = jax.jit(functools.partial(
        nb.pre_tk_batch_ckpt, log_m1=log_m1, log_e2=log_e2,
        alphabet_size=A, cap=CK0, dtype=dtype, chunk=chunk))
    timed("phase5 FULL pre_tk_ckpt     ", full, sig, T_r, mu, c1, c2)


if __name__ == "__main__":
    main()
