"""TPU probe: decompose the NTC packs stage (build_kernel_packs).

Prefix-jit differences over real pre-pass outputs at bench shape
(T=16k, R=16, 5-mer): (a) plan only, (b) plan + stream/nrow build,
(c) plan + table-gather kernel, (d) full packs.
    python scripts/probe_ntc_packs_micro.py [T] [N_BASES]
"""

import math
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamont_tpu.constants import NT_TRANSITIONS, NTK_TRANSITIONS
from dynamont_tpu.models.ntc_batch import round_up
from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.ops import ntc_batch as nb
from dynamont_tpu.ops import ntc_pallas as npk
from dynamont_tpu.ops import ntc_pre_pallas as npp
from dynamont_tpu.utils.kmer import seq_to_kmer_ids
from dynamont_tpu.utils.synthetic import make_read


def timed(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s}: {min(ts)*1e3:8.1f} ms", flush=True)
    return min(ts)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    n_bases = int(sys.argv[2]) if len(sys.argv) > 2 else 1800
    R = 16
    model = load_model_for_pore("rna002")
    nt = NT_TRANSITIONS["rna002"]
    log_ppm, log_ppe = math.log(nt["m1"]), math.log(nt["e2"])
    A, S, K = model.alphabet_size, model.kmer_size, model.num_kmers
    means, c1, c2 = model.score_params()
    mu = jax.device_put(jnp.asarray(means, jnp.float32))
    sd = jax.device_put(jnp.asarray(model.stdevs, jnp.float32))
    c1a = jax.device_put(jnp.asarray(c1, jnp.float32))
    c2a = jax.device_put(jnp.asarray(c2, jnp.float32))

    sigs, kids = [], []
    for s in range(R):
        sig, read = make_read(model, n_bases=n_bases, mean_dwell=9.0, seed=s)
        sigs.append(sig[: T - 1])
        kids.append(np.asarray(seq_to_kmer_ids(read, S, A), np.int32))
    T_arr = np.array([len(s) + 1 for s in sigs], np.int32)
    N_arr = np.array([len(k) + 1 for k in kids], np.int32)
    T_pad = round_up(int(T_arr.max()), 2048)
    N2 = round_up(int(N_arr.max()), 128)
    sigp = np.zeros((R, T_pad - 1), np.float32)
    kidp = np.zeros((R, N2 - 1), np.int32)
    for j in range(R):
        sigp[j, : T_arr[j] - 1] = sigs[j]
        kidp[j, : N_arr[j] - 1] = kids[j]
    sig = jax.device_put(jnp.asarray(sigp))
    kid = jax.device_put(jnp.asarray(kidp))
    T_r = jax.device_put(jnp.asarray(T_arr))
    N_r = jax.device_put(jnp.asarray(N_arr))
    CN, CK0 = 8, 120
    print(f"packs micro: T_pad={T_pad} N2={N2}", flush=True)

    def pre(sig, kid, T_r, N_r):
        pn = npp.pre_tn_pallas(sig, kid, N_r, T_r, mu, sd, log_ppm,
                               log_ppe, CN)
        pk = npp.pre_tk_pallas(sig, T_r, mu, c1a, c2a, log_ppm, log_ppe,
                               A, CK0)
        return pn, pk

    pn, pk = jax.jit(pre)(sig, kid, T_r, N_r)
    jax.block_until_ready(pk.cand)

    def plan_only(cand_n, cnt_n, cand_k, cnt_k):
        plan, dims = nb.build_plan_batch(cand_n, cnt_n, cand_k, cnt_k,
                                         kid, N_r, mu, c1a, c2a, A, S,
                                         jnp.float32, lite=True)
        return [x.sum() for x in (plan.ks, plan.kN, plan.hd1, plan.live)]

    timed("plan only", jax.jit(plan_only), pn.cand, pn.cnt, pk.cand, pk.cnt)

    def packs_full(cand_n, cnt_n, cand_k, cnt_k):
        plan, dims = nb.build_plan_batch(cand_n, cnt_n, cand_k, cnt_k,
                                         kid, N_r, mu, c1a, c2a, A, S,
                                         jnp.float32, lite=True)
        packs = npk.build_kernel_packs(plan, dims, sig, N_r, T_r, K,
                                       tables=(mu, c1a, c2a))
        return [packs.nrow.sum(), packs.kcol.sum(), packs.suc.sum(),
                packs.hd.astype(jnp.int32).sum()]

    timed("plan + FULL packs", jax.jit(packs_full),
          pn.cand, pn.cnt, pk.cand, pk.cnt)

    # pieces: table gather alone / nrow streams alone
    def plan_gather(cand_n, cnt_n, cand_k, cnt_k):
        plan, dims = nb.build_plan_batch(cand_n, cnt_n, cand_k, cnt_k,
                                         kid, N_r, mu, c1a, c2a, A, S,
                                         jnp.float32, lite=True)
        T_p = plan.cand_n.shape[0]
        tabT = npk.combined_tablesT(mu, c1a, c2a, A, K)
        ks_i = plan.ks.reshape(T_p, npk.R * npk.CK).astype(jnp.int32)
        RC = npk.RC
        j_pad = (-(npk.R * npk.CK + 2 * RC)) % npk.JC_TG
        ks_all = jnp.concatenate(
            [ks_i, plan.kN.astype(jnp.int32), plan.kN2.astype(jnp.int32),
             jnp.zeros((T_p, j_pad), jnp.int32)], axis=1)
        TC = T_p
        while TC > 1024 and TC % 2 == 0:
            TC //= 2
        out = jax.lax.map(
            lambda ks_c: npk.table_gather_pallas(ks_c, tabT).sum(),
            ks_all.reshape(-1, TC, ks_all.shape[1]))
        return out.sum()

    timed("plan + table gather", jax.jit(plan_gather),
          pn.cand, pn.cnt, pk.cand, pk.cnt)


if __name__ == "__main__":
    main()
