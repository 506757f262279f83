"""TPU probe: native 9-mer NTC stage attribution at production length.

Times the big-K bucket program's stages (ckpt TK pre-pass, TN pre-pass,
plan build, backward, posterior/viterbi, walk) separately on
device-resident inputs, so the <=2 s/read optimization targets the real
bottleneck. Run:  python scripts/probe_9mer_stages.py [T] [R]
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

from dynamont_tpu.constants import NT_TRANSITIONS, NTK_TRANSITIONS
from dynamont_tpu.models.ntc_batch import round_up
from dynamont_tpu.ops import ntc_batch as nb
from dynamont_tpu.utils.kmer import seq_to_kmer_ids
from dynamont_tpu.utils.pore_model import PoreModel
from dynamont_tpu.utils.synthetic import make_read


def force(x):
    jax.block_until_ready(x)


def timed(label, fn, *args, n=3):
    out = fn(*args)
    force(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        force(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts) * 1e3:8.1f} ms", flush=True)
    return out


def synth_9mer_model(seed=0):
    """Synthetic 9-mer table (the real rna004_9mer blob is git-LFS
    missing); statistics match the 5-mer test tables."""
    rng = np.random.default_rng(seed)
    K = 4 ** 9
    means = rng.normal(0.0, 1.0, K).astype(np.float64)
    stdevs = (0.3 + 0.2 * rng.random(K)).astype(np.float64)
    return PoreModel(means=means, stdevs=stdevs, kmer_size=9,
                     alphabet_size=4, rna=True)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    model = synth_9mer_model()
    pore = "rna004"
    ntk = NTK_TRANSITIONS[pore]
    trans_log = {k: math.log(v) for k, v in ntk.items()}
    nt = NT_TRANSITIONS[pore]
    log_ppm, log_ppe = math.log(nt["m1"]), math.log(nt["e2"])
    A, S, K = model.alphabet_size, model.kmer_size, model.num_kmers
    dtype = jnp.float32

    n_bases = max(40, T // 9)
    sigs, kids = [], []
    for s in range(R):
        sig, read = make_read(model, n_bases=n_bases, mean_dwell=9.0,
                              seed=s)
        sigs.append(sig[: T - 1])
        kids.append(np.asarray(seq_to_kmer_ids(read, S, A), np.int32))
    T_arr = np.array([len(s) + 1 for s in sigs], np.int32)
    N_arr = np.array([len(k) + 1 for k in kids], np.int32)
    T_pad = round_up(int(T_arr.max()), 128)
    N2 = round_up(int(N_arr.max()), 128)
    sigp = np.zeros((R, T_pad - 1), np.float32)
    kidp = np.zeros((R, N2 - 1), np.int32)
    for j in range(R):
        sigp[j, : T_arr[j] - 1] = sigs[j]
        kidp[j, : N_arr[j] - 1] = kids[j]

    means, c1, c2 = model.score_params()
    mu = jax.device_put(jnp.asarray(means, dtype))
    sd = jax.device_put(jnp.asarray(model.stdevs, dtype))
    c1a = jax.device_put(jnp.asarray(c1, dtype))
    c2a = jax.device_put(jnp.asarray(c2, dtype))
    sig = jax.device_put(jnp.asarray(sigp))
    kid = jax.device_put(jnp.asarray(kidp))
    T_r = jax.device_put(jnp.asarray(T_arr))
    N_r = jax.device_put(jnp.asarray(N_arr))
    print(f"9-mer probe: R={R} T_pad={T_pad} N2={N2} K={K}", flush=True)

    CN, CK0 = 8, 112   # engine defaults (NTCBatchEngine cap_n/cap_k)
    import functools

    jj = lambda fn, **kw: jax.jit(functools.partial(fn, **kw))

    pre_tn = jj(lambda *a: nb.pre_tn_batch(*a, log_ppm, log_ppe, CN, dtype))
    pn = timed("pre_tn (scan)", pre_tn, sig, kid, N_r, T_r, mu, sd)

    pre_tk = jj(lambda *a: nb.pre_tk_batch_ckpt(
        *a, log_ppm, log_ppe, A, CK0, dtype))
    pk = timed("pre_tk_ckpt (scan)", pre_tk, sig, T_r, mu, c1a, c2a)

    planf = jj(lambda *a: nb.build_plan_batch(
        *a, mu, c1a, c2a, A, S, dtype, lite=False, bigk=True))
    plan, dims = timed("plan (bigk)", planf, pn.cand, pn.cnt, pk.cand,
                       pk.cnt, kid, N_r)

    sigd = sig.astype(dtype)
    bwdf = jj(lambda p, s: nb.ntc_backward_batch(
        p, dims, s, trans_log, N_r, T_r, S, dtype))
    bwd = timed("backward (scan)", bwdf, plan, sigd)

    zbf = jj(lambda p, b: nb.ntc_zb_batch(p, dims, b[0]))
    Zb3 = timed("zb", zbf, plan, bwd)

    pvf = jj(lambda p, s, b, z: nb.ntc_posterior_viterbi_batch(
        p, dims, s, b, z, trans_log, N_r, T_r, S, dtype))
    lp, ch, apE, fwdE = timed("posterior+viterbi (scan)", pvf, plan, sigd,
                              bwd, Zb3)

    from dynamont_tpu.ops import ntc_walk as nw

    S_max = round_up(N2 + N2 // 4 + 64, 128)
    stf = jj(lambda p, a: nw.start_slots(p, dims, a, N_r, T_r))
    i0, j0, k0, valid = timed("start_slots", stf, plan, apE)
    wf = jj(lambda p, l, c: nw.ntc_walk_batch(
        p, dims, l, c, N_r, T_r, i0, j0, k0, valid, K, S, S_max))
    timed("walk (scan)", wf, plan, lp, ch)


if __name__ == "__main__":
    main()
