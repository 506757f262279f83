"""Micro-attribution inside the banded train stats pass on the live device."""

import math
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamont_tpu.constants import NT_TRANSITIONS
from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.ops import nt_banded_batch as bb
from dynamont_tpu.utils.kmer import seq_to_kmer_ids
from dynamont_tpu.utils.synthetic import make_read

R = int(os.environ.get("PROBE_R", 24))
T = int(os.environ.get("PROBE_T", 16000))

model = load_model_for_pore("rna002")
sigs, kids = [], []
for s in range(R):
    sig, read = make_read(model, n_bases=1800, mean_dwell=9.0, seed=s)
    sigs.append(sig[:T])
    kids.append(seq_to_kmer_ids(read, model.kmer_size, model.alphabet_size))

batch = bb.prepare_batch(sigs, kids, model.means, model.stdevs,
                         dtype=jnp.float32, t_pad_to=2048)
N_max = max(len(k) for k in kids) + 1
trans = NT_TRANSITIONS["rna002"]
log_m1, log_e2 = math.log(trans["m1"]), math.log(trans["e2"])

B = batch.B
T_pad = batch.sig.shape[1] + 1
NEG_INF = bb.NEG_INF if hasattr(bb, "NEG_INF") else -jnp.inf


def _drain(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))


def timeit(name, fn, *args):
    out = fn(*args)
    _drain(out)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        _drain(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.0f} ms", flush=True)
    return out


# fake posterior weights with the right shape: (R, T_pad-1, B) rows 1..T_pad-1
key = jax.random.PRNGKey(0)
w_host = jax.random.uniform(key, (R, T_pad - 1, B), jnp.float32)


@jax.jit
def score_rows2(sig, mu_pad, c1_pad, c2_pad, bstart):
    def one(sig_r, mu_r, c1_r, c2_r, bs_r):
        def rows(offset):
            starts = bs_r[: T_pad - 1] + offset + batch.pad

            def row(sig_t, st):
                return bb._band_scores(mu_r, c1_r, c2_r, sig_t, st, B)

            return jax.vmap(row)(sig_r, starts)

        return rows(-1), rows(-2)

    return jax.vmap(one)(sig, mu_pad, c1_pad, c2_pad, bstart)


@jax.jit
def lse_terms(sc_a, sc_b):
    m1_terms = sc_a + sc_b
    s = jnp.max(m1_terms, axis=(1, 2))
    return jnp.log(jnp.sum(jnp.exp(m1_terms - s[:, None, None]), axis=(1, 2))) + s


@jax.jit
def scatters(w, sig, bstart):
    def one(w_r, sig_r, bs_r):
        j_iota = jnp.arange(B)
        n_idx = bs_r[1:][:, None] + j_iota[None, :] - 1
        n_safe = jnp.clip(n_idx, 0, N_max - 1)
        flat_idx = n_safe.reshape(-1)
        wsum_sig = jnp.zeros(N_max, jnp.float32).at[flat_idx].add(
            (w_r * sig_r[:, None]).reshape(-1))
        norm = jnp.zeros(N_max, jnp.float32).at[flat_idx].add(w_r.reshape(-1))
        return wsum_sig, norm

    return jax.vmap(one)(w, sig, bstart)


print(f"R={R} T_pad={T_pad} B={B} N_max={N_max} device={jax.devices()[0].platform}",
      flush=True)
sc_a, sc_b = timeit("score_rows x2 (gathers)", score_rows2, batch.sig,
                    batch.mu_pad, batch.c1_pad, batch.c2_pad, batch.bstart)
timeit("logsumexp terms", lse_terms, sc_a, sc_b)
timeit("position scatters x2", scatters, w_host, batch.sig, batch.bstart)

# band-start increments sanity: how far can bstart move per row?
bs = np.asarray(batch.bstart)
inc = np.diff(bs, axis=1)
print(f"bstart increments: min={inc.min()} max={inc.max()}", flush=True)
