"""Stage attribution for the banded training step on the live device.

Times, with forced D2H drains between stages:
  (a) XLA-scan forward+backward alone
  (b) Pallas forward+backward alone
  (c) the full banded_batch_train (scan fwd/bwd + stats)
to find where the ~14 s/24-read step goes.
"""

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
from dynamont_tpu.ops import nt_banded_pallas as bp
from dynamont_tpu.utils.kmer import seq_to_kmer_ids
from dynamont_tpu.utils.synthetic import make_read

R = int(os.environ.get("PROBE_R", 24))
T = int(os.environ.get("PROBE_T", 16000))
import math

model = load_model_for_pore("rna002")
sigs, kids = [], []
for s in range(R):
    sig, read = make_read(model, n_bases=1800, mean_dwell=9.0, seed=s)
    sigs.append(sig[:T])
    kids.append(seq_to_kmer_ids(read, model.kmer_size, model.alphabet_size))

batch = bb.prepare_batch(sigs, kids, model.means, model.stdevs,
                         dtype=jnp.float32, t_pad_to=2048)
N_max = max(len(k) for k in kids) + 1
kid_pad = np.zeros((R, N_max - 1), np.int32)
for i, k in enumerate(kids):
    kid_pad[i, : len(k)] = k
kid_pad = jnp.asarray(kid_pad)

trans = NT_TRANSITIONS["rna002"]
log_m1, log_e2 = math.log(trans["m1"]), math.log(trans["e2"])
K = model.num_kmers


def _drain(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[:1]))


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


@jax.jit
def scan_fwd_bwd(sig, mu_pad, c1_pad, c2_pad, bstart, bw, N, T_):
    b = bb.BandedBatch(sig, mu_pad, c1_pad, c2_pad, bstart, T_, N, bw,
                       batch.pad, batch.B)
    fM, fE = jax.vmap(bb._forward_single(b, log_m1, log_e2))(
        sig, mu_pad, c1_pad, c2_pad, bstart, bw, N)
    bM, bE = jax.vmap(bb._backward_single(b, log_m1, log_e2))(
        sig, mu_pad, c1_pad, c2_pad, bstart, bw, N, T_)
    return fM[:, -1, 0], bM[:, 0, 0], fE, bE


@jax.jit
def pallas_fwd_bwd(sig, mu_pad, c1_pad, c2_pad, bstart, bw, N, T_):
    b = bb.BandedBatch(sig, mu_pad, c1_pad, c2_pad, bstart, T_, N, bw,
                       batch.pad, batch.B)
    fM, fE = bp.forward_pallas(b, log_m1, log_e2)
    bM, bE = bp.backward_pallas(b, log_m1, log_e2)
    return fM[:, -1, 0], bM[:, 0, 0], fE, bE


@jax.jit
def full_train(sig, mu_pad, c1_pad, c2_pad, bstart, bw, N, T_, kp):
    b = bb.BandedBatch(sig, mu_pad, c1_pad, c2_pad, bstart, T_, N, bw,
                       batch.pad, batch.B)
    return bb.banded_batch_train(b, log_m1, log_e2, kp, K)


args = (batch.sig, batch.mu_pad, batch.c1_pad, batch.c2_pad, batch.bstart,
        batch.bw, batch.N, batch.T)
print(f"R={R} T_pad={batch.sig.shape[1]+1} B={batch.B} "
      f"device={jax.devices()[0].platform}", flush=True)
timeit("scan fwd+bwd", scan_fwd_bwd, *args)
timeit("pallas fwd+bwd", pallas_fwd_bwd, *args)
timeit("full train (scan+stats)", full_train, *args, kid_pad)


from dynamont_tpu.ops.nt_banded_train import banded_batch_train_fast


@jax.jit
def fast_train(sig, mu_pad, c1_pad, c2_pad, bstart, bw, N, T_, kp):
    b = bb.BandedBatch(sig, mu_pad, c1_pad, c2_pad, bstart, T_, N, bw,
                       batch.pad, batch.B)
    return banded_batch_train_fast(b, log_m1, log_e2, kp, K)


res_fast = timeit("fast train (pallas+mxu)", fast_train, *args, kid_pad)
if os.environ.get("PROBE_CHECK") == "1":
    res_ref = full_train(*args, kid_pad)
    import numpy as _np
    for name in ("Zf", "Zb", "m1", "e2"):
        a = _np.asarray(getattr(res_fast, name))
        b_ = _np.asarray(getattr(res_ref, name))
        rel = _np.max(_np.abs(a - b_) / _np.maximum(_np.abs(b_), 1e-12))
        print(f"  {name}: max rel diff {rel:.2e}")
    mask = _np.asarray(res_ref.kmer_mask)
    print("  mask equal:", bool((_np.asarray(res_fast.kmer_mask) == mask).all()))
    for name in ("means", "stdevs"):
        a = _np.asarray(getattr(res_fast, name))[mask]
        b_ = _np.asarray(getattr(res_ref, name))[mask]
        rel = _np.max(_np.abs(a - b_) / _np.maximum(_np.abs(b_), 1e-9))
        print(f"  {name}: max rel diff {rel:.2e}")
