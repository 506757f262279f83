"""TPU probe: isolate why ntc_backward_pallas costs 1565 us/grid-step.

Times the production bwd kernel against variants: forward grid order
(timing-only, results wrong), smaller C, no-output, dimension_semantics.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamont_tpu.constants import NT_TRANSITIONS, NTK_TRANSITIONS
from dynamont_tpu.models.ntc_batch import round_up
from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.ops import ntc_batch as nb
from dynamont_tpu.ops import ntc_pallas as npk
from dynamont_tpu.ops import ntc_pre_pallas as npp
from dynamont_tpu.utils.kmer import seq_to_kmer_ids
from dynamont_tpu.utils.synthetic import make_read

R, CN, CK, RC, NS, NKS, NSS, ACK = (npk.R, npk.CN, npk.CK, npk.RC, npk.NS,
                                    npk.NKS, npk.NSS, npk.ACK)


def timed(name, fn, *args, n=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    print(f"{name:32s}: {min(ts)*1e3:9.1f} ms", flush=True)
    return min(ts)


def variant_bwd(packs, trans_log, *, C, reverse, write_out=True,
                arbitrary=False):
    T_pad = packs.T_pad
    nc = T_pad // C
    tl = {k: np.float32(v) for k, v in trans_log.items()}
    kernel = functools.partial(npk._bwd_kernel, C=C, nc=nc, tl=tl,
                               K=packs.K)
    if reverse:
        ix = lambda c: nc - 1 - c
    else:
        ix = lambda c: c
    kwargs = {}
    if arbitrary:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    out = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((C, NS, RC), lambda c: (ix(c), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, NKS, R, CK), lambda c: (ix(c), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, NSS, R, ACK), lambda c: (ix(c), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, CK, R), lambda c: (ix(c), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), lambda c: (ix(c), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), lambda c: (ix(c), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, 5 * RC, CK), lambda c: (ix(c), 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, 5 * RC, CK), jnp.float32),
        scratch_shapes=[pltpu.VMEM((RC, CK), jnp.float32) for _ in range(5)],
        **kwargs,
    )(packs.nrow, packs.kcol, packs.suc, packs.ksTn, packs.alw, packs.hd)
    return out


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    n_bases = 1800
    CN0, CK0 = 8, 120
    dtype = jnp.float32
    model = load_model_for_pore("rna002")
    ntk = NTK_TRANSITIONS["rna002"]
    trans_log = {k: math.log(v) for k, v in ntk.items()}
    nt = NT_TRANSITIONS["rna002"]
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
    sigp = np.zeros((R, T_pad - 1), np.float32)
    kidp = np.zeros((R, N2 - 1), np.int32)
    for j in range(R):
        sigp[j, : T_arr[j] - 1] = sigs[j]
        kidp[j, : N_arr[j] - 1] = kids[j]

    means_t = jnp.asarray(means, dtype)
    sd_t = jnp.asarray(model.stdevs, dtype)
    c1_t = jnp.asarray(c1, dtype)
    c2_t = jnp.asarray(c2, dtype)

    @jax.jit
    def mk_packs(sig, kmer_ids, T_r, N_r, mu, sd, c1a, c2a):
        pn = npp.pre_tn_pallas(sig, kmer_ids, N_r, T_r, mu, sd,
                               log_ppm, log_ppe, CN0)
        pk = npp.pre_tk_pallas(sig, T_r, mu, c1a, c2a, log_ppm,
                               log_ppe, A, CK0)
        plan, dims = nb.build_plan_batch(
            pn.cand, pn.cnt, pk.cand, pk.cnt, kmer_ids, N_r,
            mu, c1a, c2a, A, S, dtype, lite=True)
        return npk.build_kernel_packs(plan, dims, sig.astype(dtype),
                                      N_r, T_r, K, tables=(mu, c1a, c2a))

    packs = mk_packs(jnp.asarray(sigp), jnp.asarray(kidp),
                     jnp.asarray(T_arr), jnp.asarray(N_arr),
                     means_t, sd_t, c1_t, c2_t)
    packs = jax.tree_util.tree_map(
        lambda x: jax.device_put(x) if hasattr(x, "shape") else x, packs)
    print(f"T_pad={packs.T_pad}", flush=True)

    T_pad_s, K_s = int(packs.T_pad), int(packs.K)

    def wrap(C, reverse, arbitrary=False):
        def f(nrow, kcol, suc, ksTn, alw, hd):
            p = npk.NTCPacks(nrow, kcol, suc, packs.ksT, packs.ksTp, ksTn,
                             alw, hd, T_pad_s, K_s)
            return variant_bwd(p, trans_log, C=C, reverse=reverse,
                               arbitrary=arbitrary)
        return jax.jit(f)

    args = (packs.nrow, packs.kcol, packs.suc, packs.ksTn, packs.alw,
            packs.hd)
    for C in (8, 4, 16):
        for reverse in (True, False):
            timed(f"bwd C={C} reverse={reverse}", wrap(C, reverse), *args)
    timed("bwd C=8 rev arbitrary-sem", wrap(8, True, True), *args)


if __name__ == "__main__":
    main()
