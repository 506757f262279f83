"""TPU probe: which piece of build_plan_batch costs 3.6 s/bucket.

Times isolated jits of each plan component over real pre-pass outputs
(T=16k, R=16). Pieces overlap slightly (shared ks construction) but the
ranking is what matters.

    python scripts/probe_ntc_plan_micro.py [T] [N_BASES]
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

from dynamont_tpu.constants import NT_TRANSITIONS
from dynamont_tpu.models.ntc_batch import round_up
from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.ops import ntc_pre_pallas as npp
from dynamont_tpu.utils.kmer import seq_to_kmer_ids
from dynamont_tpu.utils.synthetic import make_read


def drain(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf).ravel()[:1]


def timed(name, fn, *args, n=3):
    t0 = time.perf_counter()
    drain(fn(*args))
    first = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        drain(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s}: {min(ts)*1e3:9.1f} ms  (first {first:5.1f} s)",
          flush=True)
    return min(ts)


def main():
    R = 16
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    n_bases = int(sys.argv[2]) if len(sys.argv) > 2 else 1800
    CN, CK0 = 8, 120
    model = load_model_for_pore("rna002")
    nt = NT_TRANSITIONS["rna002"]
    log_ppm, log_ppe = math.log(nt["m1"]), math.log(nt["e2"])
    means, c1, c2 = model.score_params()
    A, S, K = model.alphabet_size, model.kmer_size, model.num_kmers
    step = K // A

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

    dtype = jnp.float32
    means_t = jnp.asarray(means, dtype)
    sd_t = jnp.asarray(model.stdevs, dtype)
    c1_t = jnp.asarray(c1, dtype)
    c2_t = jnp.asarray(c2, dtype)
    sig_j = jnp.asarray(sigp)
    kid_j = jnp.asarray(kidp)
    T_j = jnp.asarray(T_arr)
    N_j = jnp.asarray(N_arr)

    @jax.jit
    def pre(sig, kmer_ids, T_r, N_r, mu, sd, c1a, c2a):
        pn = npp.pre_tn_pallas(sig, kmer_ids, N_r, T_r, mu, sd,
                               log_ppm, log_ppe, CN)
        pk = npp.pre_tk_pallas(sig, T_r, mu, c1a, c2a, log_ppm,
                               log_ppe, A, CK0)
        return pn.cand, pn.cnt, pk.cand, pk.cnt

    cand_n, cnt_n, cand_k0, cnt_k = jax.tree_util.tree_map(
        jax.device_put, jax.tree_util.tree_map(np.asarray,
                                               pre(sig_j, kid_j, T_j, N_j,
                                                   means_t, sd_t, c1_t,
                                                   c2_t)))
    print(f"T_pad={T_pad} cand_n{cand_n.shape} cand_k0{cand_k0.shape}",
          flush=True)

    N_max = kidp.shape[1] + 1

    def mk_ks(cand_n_r, cnt_n_r, cand_k0_r, kid_r, N_read):
        """Per-read ks (T, CKm) + kN/kN2 (T, CN) — shared prologue."""
        n_valid = ((jnp.arange(CN)[None, :] < cnt_n_r[:, None])
                   & (cand_n_r < N_read[None]))
        n_safe = jnp.clip(cand_n_r, 0, N_max - 1)
        kN = jnp.where(n_valid & (cand_n_r >= 1),
                       kid_r[jnp.clip(n_safe - 1, 0, N_max - 2)], 0)
        base_k = jnp.where(n_valid & (cand_n_r >= 1), kN, K)
        ks = jnp.concatenate([cand_k0_r, base_k], axis=1).astype(jnp.int32)
        kN2 = jnp.where(n_valid & (cand_n_r < N_read[None] - 1),
                        kid_r[jnp.clip(n_safe, 0, N_max - 2)], 0)
        return ks, kN, kN2, n_valid

    vm = lambda f: jax.vmap(f, in_axes=(1, 1, 1, 0, 0), out_axes=1)
    vs = lambda f: jax.vmap(f, in_axes=(1, 1, 1, 0, 0), out_axes=0)

    @jax.jit
    def piece_ks(cn, ct, ck0, kid, Nr):
        ks, kN, kN2, nv = vm(mk_ks)(cn, ct, ck0, kid, Nr)
        return ks.sum() + kN.sum() + kN2.sum()

    @jax.jit
    def piece_dedup(cn, ct, ck0, kid, Nr):
        def one(cand_n_r, cnt_n_r, cand_k0_r, kid_r, N_read):
            ks, kN, kN2, nv = mk_ks(cand_n_r, cnt_n_r, cand_k0_r, kid_r,
                                    N_read)
            sl = jnp.arange(ks.shape[1], dtype=jnp.int32)
            eq = ks[:, :, None] == ks[:, None, :]
            live = (ks < K) & ~(eq & (sl[:, None] < sl[None, :])).any(axis=1)
            from_tk = (ks < K) & eq[:, :CK0, :].any(axis=1)
            return live.sum() + from_tk.sum()
        return vs(one)(cn, ct, ck0, kid, Nr).sum()

    @jax.jit
    def piece_hd(cn, ct, ck0, kid, Nr):
        def one(cand_n_r, cnt_n_r, cand_k0_r, kid_r, N_read):
            ks, kN, kN2, nv = mk_ks(cand_n_r, cnt_n_r, cand_k0_r, kid_r,
                                    N_read)
            ks_safe = jnp.clip(ks, 0, K - 1)

            def hd_count(a, b, nd):
                acc = jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape),
                                jnp.int32)
                x, y = a, b
                for _ in range(nd):
                    acc = acc + ((x % A) != (y % A)).astype(jnp.int32)
                    x = x // A
                    y = y // A
                return acc.astype(jnp.int8)

            kNc, kN2c = kN[:, :, None], kN2[:, :, None]
            ksc = ks_safe[:, None, :]
            return (hd_count(kNc, ksc, S).sum()
                    + hd_count(kN2c, ksc, S).sum()
                    + hd_count(kNc // A, ksc, S - 1).sum()
                    + hd_count(kN2c // A, ksc, S - 1).sum())
        return vs(one)(cn, ct, ck0, kid, Nr).sum()

    @jax.jit
    def piece_gather_k(cn, ct, ck0, kid, Nr):
        def one(cand_n_r, cnt_n_r, cand_k0_r, kid_r, N_read):
            ks, kN, kN2, nv = mk_ks(cand_n_r, cnt_n_r, cand_k0_r, kid_r,
                                    N_read)
            ks_safe = jnp.clip(ks, 0, K - 1)
            return (means_t[ks_safe].sum() + c1_t[ks_safe].sum()
                    + c2_t[ks_safe].sum()
                    + means_t[kN].sum() + c1_t[kN].sum() + c2_t[kN].sum()
                    + means_t[kN2].sum() + c1_t[kN2].sum()
                    + c2_t[kN2].sum())
        return vs(one)(cn, ct, ck0, kid, Nr).sum()

    @jax.jit
    def piece_gather_suc(cn, ct, ck0, kid, Nr):
        def one(cand_n_r, cnt_n_r, cand_k0_r, kid_r, N_read):
            ks, kN, kN2, nv = mk_ks(cand_n_r, cnt_n_r, cand_k0_r, kid_r,
                                    N_read)
            ks_safe = jnp.clip(ks, 0, K - 1)
            ar = jnp.arange(A, dtype=ks.dtype)
            suc_flat = ((ks_safe % step) * A)[:, None, :] + ar[None, :, None]
            suc_flat = suc_flat.reshape(ks.shape[0], -1)
            return (means_t[suc_flat].sum() + c1_t[suc_flat].sum()
                    + c2_t[suc_flat].sum())
        return vs(one)(cn, ct, ck0, kid, Nr).sum()

    @jax.jit
    def piece_rows_allowed(cn, ct, ck0, kid, Nr):
        def one(cand_n_r, cnt_n_r, cand_k0_r, kid_r, N_read):
            ks, kN, kN2, nv = mk_ks(cand_n_r, cnt_n_r, cand_k0_r, kid_r,
                                    N_read)
            sl = jnp.arange(ks.shape[1], dtype=jnp.int32)
            eq = ks[:, :, None] == ks[:, None, :]
            live = (ks < K) & ~(eq & (sl[:, None] < sl[None, :])).any(axis=1)
            from_tk = (ks < K) & eq[:, :CK0, :].any(axis=1)
            allowed = (live[:, None, :] & nv[:, :, None]
                       & (from_tk[:, None, :]
                          | ((ks[:, None, :] == kN[:, :, None])
                             & (cand_n_r >= 1)[:, :, None])))
            prev_n = jnp.concatenate(
                [jnp.full((1, CN), N_max, cand_n_r.dtype), cand_n_r[:-1]], 0)
            next_n = jnp.concatenate(
                [cand_n_r[1:], jnp.full((1, CN), N_max, cand_n_r.dtype)], 0)

            def slot2(values, table):
                eq2 = values[:, :, None] == table[:, None, :]
                found = eq2.any(-1)
                return jnp.where(found, jnp.argmax(eq2, -1).astype(jnp.int32),
                                 -1)
            return (allowed.sum()
                    + slot2(cand_n_r, prev_n).sum()
                    + slot2(cand_n_r - 1, prev_n).sum()
                    + slot2(cand_n_r, next_n).sum()
                    + slot2(cand_n_r + 1, next_n).sum())
        return vs(one)(cn, ct, ck0, kid, Nr).sum()

    args = (cand_n, cnt_n, cand_k0, kid_j, N_j)
    timed("ks prologue", piece_ks, *args)
    timed("dedup eq (live/from_tk)", piece_dedup, *args)
    timed("hamming tables", piece_hd, *args)
    timed("model gathers (T,CK)+(T,CN)", piece_gather_k, *args)
    timed("suc gathers (T,A*CK)", piece_gather_suc, *args)
    timed("rows/allowed/slot2", piece_rows_allowed, *args)


if __name__ == "__main__":
    main()
