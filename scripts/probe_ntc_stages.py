"""TPU probe: per-stage timings of the batched NTC pipeline.

Each stage runs in its own jit so stage boundaries are observable; the
production engine fuses them into one program. Timing forces completion via
np.asarray of a small slice (block_until_ready is unreliable on the axon
backend).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools
import math

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamont_tpu.constants import NT_TRANSITIONS, NTK_TRANSITIONS
from dynamont_tpu.models.ntc_batch import round_up
from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.ops import ntc_batch as nb
from dynamont_tpu.ops import ntc_walk as nw
from dynamont_tpu.utils.kmer import seq_to_kmer_ids
from dynamont_tpu.utils.synthetic import make_read


def force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(name, fn, *args, n=3):
    out = fn(*args)
    force(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:12s}: {min(ts)*1e3:8.1f} ms", flush=True)
    return out


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    CN = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    CK0 = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    n_bases = 1800
    dtype = jnp.float32
    model = load_model_for_pore("rna002")
    ntk = {k: math.log(v) for k, v in NTK_TRANSITIONS["rna002"].items()}
    nt = NT_TRANSITIONS["rna002"]
    lm, le = math.log(nt["m1"]), math.log(nt["e2"])
    means, c1, c2 = model.score_params()
    S = model.kmer_size
    K = model.num_kmers

    sigs, kids = [], []
    for s in range(R):
        sig, read = make_read(model, n_bases=n_bases, mean_dwell=9.0, seed=s)
        sigs.append(sig[:T])
        kids.append(np.asarray(seq_to_kmer_ids(read, S, 4), np.int32))
    T_arr = np.array([len(s) + 1 for s in sigs], np.int32)
    N_arr = np.array([len(k) + 1 for k in kids], np.int32)
    T_pad = round_up(int(T_arr.max()), 2048)
    N2 = round_up(int(N_arr.max()), 256)
    sig_a = np.zeros((R, T_pad - 1), np.float32)
    kid_a = np.zeros((R, N2 - 1), np.int32)
    for j in range(R):
        sig_a[j, : T_arr[j] - 1] = sigs[j]
        kid_a[j, : N_arr[j] - 1] = kids[j]
    sig_d = jax.device_put(jnp.asarray(sig_a))
    kid_d = jax.device_put(jnp.asarray(kid_a))
    T_r = jax.device_put(jnp.asarray(T_arr))
    N_r = jax.device_put(jnp.asarray(N_arr))
    mu_d = jax.device_put(jnp.asarray(means, dtype))
    sd_d = jax.device_put(jnp.asarray(model.stdevs, dtype))
    c1_d = jax.device_put(jnp.asarray(c1, dtype))
    c2_d = jax.device_put(jnp.asarray(c2, dtype))
    S_max = round_up(N2 + N2 // 4 + 64, 128)
    print(f"R={R} T_pad={T_pad} N2={N2} CN={CN} CK0={CK0} S_max={S_max}",
          flush=True)

    jit = functools.partial(jax.jit, static_argnames=())
    f_tn = jax.jit(lambda s, k: nb.pre_tn_batch(
        s, k, N_r, T_r, mu_d, sd_d, lm, le, CN, dtype))
    pn = timed("pre_tn", f_tn, sig_d, kid_d)
    f_tk = jax.jit(lambda s: nb.pre_tk_batch(
        s, T_r, mu_d, c1_d, c2_d, lm, le, 4, CK0, dtype))
    pk = timed("pre_tk", f_tk, sig_d)
    print("ovf_tn:", np.asarray(pn.overflow), "ovf_tk:", np.asarray(pk.overflow), flush=True)

    dims = nb.PlanDims(R, CN, CK0 + CN, 4)  # static; jit would trace ints
    f_plan = jax.jit(lambda a, b, c, d: nb.build_plan_batch(
        a, b, c, d, kid_d, N_r, mu_d, c1_d, c2_d, 4, S, dtype)[0])
    plan = timed("build_plan", f_plan, pn.cand, pn.cnt, pk.cand, pk.cnt)

    f_bwd = jax.jit(lambda p: nb.ntc_backward_batch(
        p, dims, sig_d.astype(dtype), ntk, N_r, T_r, S, dtype))
    bwd = timed("bwd", f_bwd, plan)
    Zb = jax.jit(lambda p, b: nb.ntc_zb_batch(p, dims, b))(plan, bwd[0])
    f_pv = jax.jit(lambda p, b, z: nb.ntc_posterior_viterbi_batch(
        p, dims, sig_d.astype(dtype), b, z, ntk, N_r, T_r, S, dtype))
    lp, choices, apE, _fE = timed("post_viterbi", f_pv, plan, bwd, Zb)

    f_walk = jax.jit(lambda p, l, c, a: nw.ntc_walk_batch(
        p, dims, l, c, N_r, T_r,
        *nw.start_slots(p, dims, a, N_r, T_r), K, S, S_max))
    res = timed("walk", f_walk, plan, lp, choices, apE)
    print("seg_cnt:", np.asarray(res[0]), flush=True)


if __name__ == "__main__":
    main()
