"""TPU probe: attribute NTC pipeline device time with FULL materialization.

probe_ntc_pallas_stages.py's prefix reductions let XLA dead-code-eliminate
unbuilt pack/plan fields, over-attributing their cost to the next stage
(the bwd kernel alone is ~110 us/grid-step on synthetic packs, 14x less
than the prefix-diff estimate). Here every prefix reduces EVERY field it
claims to have built, so stage differences are honest.

    python scripts/probe_ntc_attrib.py [T] [N_BASES] [stage ...]
stages (cumulative prefixes): pre plan packs full
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
from dynamont_tpu.models.ntc_batch import make_ntc_batch_fn, round_up
from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.ops import ntc_batch as nb
from dynamont_tpu.ops import ntc_pallas as npk
from dynamont_tpu.utils.kmer import seq_to_kmer_ids
from dynamont_tpu.utils.synthetic import make_read


def drain(out):
    """Force a D2H of one scalar: on the axon tunnel block_until_ready
    returns before execution drains, so only a transfer is a real wait."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf).ravel()[:1]


def timed(name, fn, *args, n=3):
    t0 = time.perf_counter()
    drain(fn(*args))
    print(f"{name:10s}: first {time.perf_counter()-t0:7.1f} s", flush=True)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        drain(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:10s}: {min(ts)*1e3:9.1f} ms", flush=True)
    return min(ts)


def tree_sum(x):
    tot = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "dtype"):
            tot = tot + leaf.astype(jnp.float32).sum()
    return tot


def main():
    R = 16
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    n_bases = int(sys.argv[2]) if len(sys.argv) > 2 else 1800
    which = sys.argv[3:] or ["pre", "plan", "packs", "full"]
    CN, CK0 = 8, 120
    dtype = jnp.float32
    model = load_model_for_pore("rna002")
    pore = "rna002"
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
    print(f"R={R} T_pad={T_pad} N2={N2} S_max={S_max}", flush=True)

    means_t = jax.device_put(jnp.asarray(means, dtype))
    sd_t = jax.device_put(jnp.asarray(model.stdevs, dtype))
    c1_t = jax.device_put(jnp.asarray(c1, dtype))
    c2_t = jax.device_put(jnp.asarray(c2, dtype))
    args = (jnp.asarray(sigp), jnp.asarray(kidp), jnp.asarray(T_arr),
            jnp.asarray(N_arr), means_t, sd_t, c1_t, c2_t)

    def prefix(stage: str):
        @jax.jit
        def f(sig, kmer_ids, T_r, N_r, mu, sd, c1a, c2a):
            from dynamont_tpu.ops import ntc_pre_pallas as npp
            pn = npp.pre_tn_pallas(sig, kmer_ids, N_r, T_r, mu, sd,
                                   log_ppm, log_ppe, CN)
            pk = npp.pre_tk_pallas(sig, T_r, mu, c1a, c2a, log_ppm,
                                   log_ppe, A, CK0)
            if stage == "pre":
                return tree_sum(pn) + tree_sum(pk)
            plan, dims = nb.build_plan_batch(
                pn.cand, pn.cnt, pk.cand, pk.cnt, kmer_ids, N_r,
                mu, c1a, c2a, A, S, dtype, lite=True)
            if stage == "plan":
                return tree_sum(plan)
            packs = npk.build_kernel_packs(plan, dims, sig.astype(dtype),
                                           N_r, T_r, K,
                                           tables=(mu, c1a, c2a))
            return tree_sum(packs)

        return f

    acc = {}
    for stage in which:
        if stage == "full":
            fn = make_ntc_batch_fn(model, pore, None, dtype)
            full = lambda sig, kid, T_r, N_r: fn(
                sig, kid, T_r, N_r, CN=CN, CK0=CK0, S_max=S_max,
                use_pallas=True)
            acc["full"] = timed("full", full, *args[:4])
        else:
            acc[stage] = timed(stage, prefix(stage), *args)
    print("--- stage diffs ---", flush=True)
    prev = 0.0
    for stage in ("pre", "plan", "packs"):
        if stage in acc:
            print(f"{stage:10s}: {(acc[stage]-prev)*1e3:9.1f} ms", flush=True)
            prev = acc[stage]
    if "full" in acc:
        print(f"{'kern+walk':10s}: {(acc['full']-prev)*1e3:9.1f} ms "
              f"(full {acc['full']*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
