"""TPU probe: per-stage timings of the batched NTC pipeline.

Stage costs are measured as DIFFERENCES between jitted pipeline PREFIXES
that each return only tiny reductions (mirrors the production fused
program; standalone per-stage jits measure artifact costs on the axon
backend).
    python scripts/probe_ntc_stages.py [R] [T] [CN] [CK0]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
    print(f"{name:14s}: {min(ts)*1e3:8.1f} ms", flush=True)
    return min(ts)


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    CN = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    CK0 = int(sys.argv[4]) if len(sys.argv) > 4 else 112
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

    def tree_sum(x):
        return sum(
            jnp.sum(jnp.where(jnp.isfinite(l.astype(jnp.float32)),
                              l.astype(jnp.float32), 0.0))
            for l in jax.tree_util.tree_leaves(x)
        )

    def prefix(stage: str):
        @jax.jit
        def f(sig, kid, Tr, Nr, mu, sd, c1a, c2a):
            pn = nb.pre_tn_batch(sig, kid, Nr, Tr, mu, sd, lm, le, CN, dtype)
            if stage == "pre_tn":
                return tree_sum((pn.cand, pn.Zf))
            pk_ = nb.pre_tk_batch(sig, Tr, mu, c1a, c2a, lm, le, 4, CK0, dtype)
            if stage == "pre_tk":
                return tree_sum((pn.cand, pk_.cand, pk_.Zf))
            plan, dims = nb.build_plan_batch(
                pn.cand, pn.cnt, pk_.cand, pk_.cnt, kid, Nr,
                mu, c1a, c2a, 4, S, dtype,
            )
            if stage == "plan":
                return tree_sum((plan.ks, plan.allowed, plan.col_prec))
            sigd = sig.astype(dtype)
            bwd = nb.ntc_backward_batch(plan, dims, sigd, ntk, Nr, Tr, S, dtype)
            Zb3 = nb.ntc_zb_batch(plan, dims, bwd[0])
            if stage == "bwd":
                return tree_sum((bwd[0], Zb3))
            lp, choices, apE_final, fwdE_final = nb.ntc_posterior_viterbi_batch(
                plan, dims, sigd, bwd, Zb3, ntk, Nr, Tr, S, dtype
            )
            if stage == "viterbi":
                return tree_sum((lp[0], choices[0], apE_final))
            Zf3 = nb.ntc_zf_batch(plan, dims, fwdE_final, Nr, Tr)
            i0, j0, k0, valid = nw.start_slots(plan, dims, apE_final, Nr, Tr)
            seg_cnt, st_a, bp_a, start_a, k_a, med, seg_ovf = nw.ntc_walk_batch(
                plan, dims, lp, choices, Nr, Tr, i0, j0, k0, valid, K, S, S_max
            )
            return tree_sum((seg_cnt, st_a, med, Zf3))

        return f

    args = (sig_d, kid_d, T_r, N_r, mu_d, sd_d, c1_d, c2_d)
    stages = ["pre_tn", "pre_tk", "plan", "bwd", "viterbi", "walk"]
    acc = {}
    for stage in stages:
        t0 = time.perf_counter()
        acc[stage] = timed(f"<= {stage}", prefix(stage), *args)
        print(f"   (compile+3 runs took {time.perf_counter()-t0:.1f}s)",
              flush=True)
    prev = 0.0
    print("--- per-stage (differences) ---", flush=True)
    for stage in stages:
        print(f"{stage:14s}: {(acc[stage]-prev)*1e3:8.1f} ms", flush=True)
        prev = acc[stage]


if __name__ == "__main__":
    main()
