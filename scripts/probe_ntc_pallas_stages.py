"""TPU probe: per-stage timings of the batched NTC pipeline, Pallas path.

Stage costs are differences between jitted pipeline PREFIXES that return
tiny reductions. Runs the kernel geometry (R=16, CN=8, CK=128):
    python scripts/probe_ntc_pallas_stages.py [T] [N_BASES]
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
from dynamont_tpu.ops import ntc_pallas as npk
from dynamont_tpu.ops import ntc_walk as nw
from dynamont_tpu.utils.kmer import seq_to_kmer_ids
from dynamont_tpu.utils.synthetic import make_read


def force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed(name, fn, *args, n=3):
    t0 = time.perf_counter()
    out = fn(*args)
    force(out)
    print(f"{name:14s}: first {time.perf_counter()-t0:7.1f} s", flush=True)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:14s}: {min(ts)*1e3:9.1f} ms", flush=True)
    return min(ts)


def main():
    R = 16
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    n_bases = int(sys.argv[2]) if len(sys.argv) > 2 else 1800
    CN, CK0 = 8, 120
    dtype = jnp.float32
    model = load_model_for_pore("rna002")
    pore = "rna002"
    ntk = NTK_TRANSITIONS[pore]
    trans_log = {k: math.log(v) for k, v in ntk.items()}
    nt = NT_TRANSITIONS[pore]
    log_ppm, log_ppe = math.log(nt["m1"]), math.log(nt["e2"])
    means, c1, c2 = model.score_params()
    A, S, K = model.alphabet_size, model.kmer_size, model.num_kmers

    sigs, kids = [], []
    for s in range(R):
        sig, read = make_read(model, n_bases=n_bases, mean_dwell=9.0, seed=s)
        sigs.append(sig[:T])
        kids.append(np.asarray(seq_to_kmer_ids(read, S, A), np.int32))
    T_arr = np.array([len(s) + 1 for s in sigs], np.int32)
    N_arr = np.array([len(k) + 1 for k in kids], np.int32)
    T_pad = round_up(int(T_arr.max()), 2048)
    N2 = round_up(int(N_arr.max()), 256)
    S_max = round_up(N2 + N2 // 4 + 64, 128)
    sigp = np.zeros((R, T_pad - 1), np.float32)
    kidp = np.zeros((R, N2 - 1), np.int32)
    for j in range(R):
        sigp[j, : T_arr[j] - 1] = sigs[j]
        kidp[j, : N_arr[j] - 1] = kids[j]
    print(f"R={R} T_pad={T_pad} N2={N2} CN={CN} CK0={CK0} S_max={S_max}",
          flush=True)

    means_t = jax.device_put(jnp.asarray(means, dtype))
    sd_t = jax.device_put(jnp.asarray(model.stdevs, dtype))
    c1_t = jax.device_put(jnp.asarray(c1, dtype))
    c2_t = jax.device_put(jnp.asarray(c2, dtype))

    def prefix(stage: str):
        @jax.jit
        def f(sig, kmer_ids, T_r, N_r, mu, sd, c1a, c2a):
            from dynamont_tpu.ops import ntc_pre_pallas as npp
            pn = npp.pre_tn_pallas(sig, kmer_ids, N_r, T_r, mu, sd,
                                   log_ppm, log_ppe, CN)
            if stage == "pre_tn":
                return pn.Zf.sum() + pn.cnt.sum()
            pk = npp.pre_tk_pallas(sig, T_r, mu, c1a, c2a, log_ppm,
                                   log_ppe, A, CK0)
            if stage == "pre_tk":
                return pn.Zf.sum() + pk.Zf.sum() + pk.cnt.sum()
            plan, dims = nb.build_plan_batch(
                pn.cand, pn.cnt, pk.cand, pk.cnt, kmer_ids, N_r,
                mu, c1a, c2a, A, S, dtype, lite=True,
            )
            if stage == "plan":
                return (plan.allowed.sum() + plan.mu_k.sum()
                        + pn.Zf.sum() + pk.Zf.sum())
            sigd = sig.astype(dtype)
            packs = npk.build_kernel_packs(plan, dims, sigd, N_r, T_r, K,
                                           tables=(mu, c1a, c2a))
            if stage == "packs":
                return (packs.nrow.sum() + packs.kcol.sum()
                        + packs.alw.sum().astype(jnp.float32))
            bwd = npk.ntc_backward_pallas(packs, trans_log)
            if stage == "bwd":
                return bwd[0].sum()
            bwd0 = (bwd[0].reshape(5, R, npk.CN, npk.CK)
                    .transpose(1, 0, 2, 3).reshape(R, -1))
            Zb3 = nb.ntc_zb_batch(plan, dims, bwd0)
            if stage == "zb":
                return Zb3.sum()
            lp, choices, slots, apEf, fwdEf = \
                npk.ntc_posterior_viterbi_pallas(packs, bwd, Zb3, trans_log)
            if stage == "post_vit":
                return Zb3.sum() + fwdEf.sum() + choices[0].sum()
            apE_final = apEf.reshape(R, npk.CN, npk.CK)
            fwdE_final = fwdEf.reshape(R, npk.CN, npk.CK)
            Zf3 = nb.ntc_zf_batch(plan, dims, fwdE_final, N_r, T_r)
            i0, j0, k0, valid = nw.start_slots(plan, dims, apE_final,
                                               N_r, T_r)
            seg_cnt, st_a, bp_a, start_a, k_a, med, seg_ovf = \
                npk.ntc_walk_pallas(packs, lp, choices, slots, i0, j0,
                                    k0, valid, N_r, T_r, K, S, S_max)
            return seg_cnt.sum() + med.sum() + Zf3.sum()

        return f

    args = (jnp.asarray(sigp), jnp.asarray(kidp), jnp.asarray(T_arr),
            jnp.asarray(N_arr), means_t, sd_t, c1_t, c2_t)
    acc = {}
    stages = ["pre_tn", "pre_tk", "plan", "packs", "bwd", "zb",
              "post_vit", "walk"]
    for stage in stages:
        acc[stage] = timed(f"<= {stage}", prefix(stage), *args)
    prev = 0.0
    print("--- per-stage (differences) ---", flush=True)
    for stage in stages:
        print(f"{stage:14s}: {(acc[stage]-prev)*1e3:9.1f} ms", flush=True)
        prev = acc[stage]


if __name__ == "__main__":
    main()
