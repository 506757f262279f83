"""TPU probe: banded kernel row-group geometry sweep (G, CHUNK, UNROLL).

Times the standalone fwd / bwd / viterbi / walk Mosaic kernels on
device-resident inputs at the bench shape for each geometry, to pick the
per-row overhead-minimizing configuration (relative comparisons only;
the production number is the fused-pipeline bench).

    python scripts/probe_banded_kernel_geom.py [R] [T]
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
from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.ops import nt_banded_batch as bb
from dynamont_tpu.ops import nt_banded_pallas as pk
from dynamont_tpu.utils.kmer import seq_to_kmer_ids
from dynamont_tpu.utils.synthetic import make_read


def force(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf).ravel()[:1]


def timed(fn, *args, n=5):
    out = fn(*args)
    force(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    model = load_model_for_pore("rna002")
    nt = NT_TRANSITIONS["rna002"]
    log_m1, log_e2 = math.log(nt["m1"]), math.log(nt["e2"])

    sigs, kids = [], []
    for s in range(R):
        sig, read = make_read(model, n_bases=1800, mean_dwell=9.0, seed=s)
        sigs.append(sig[:T])
        kids.append(np.asarray(seq_to_kmer_ids(read, model.kmer_size, 4),
                               np.int32))
    batch = bb.prepare_batch(
        sigs, kids, model.means, model.stdevs, dtype=jnp.float32,
        t_pad_to=2048,
    )
    batch = jax.device_put(batch)
    force(batch.sig)
    T_pad = batch.sig.shape[1] + 1
    print(f"R={R} T_pad={T_pad} B={batch.B}", flush=True)

    import functools

    # device_put above turned the static fields into arrays; the kernels
    # need them as python ints (they are jit-static shapes)
    pad_s, B_s = int(batch.pad), int(batch.B)
    arrs = (batch.sig, batch.mu_pad, batch.c1_pad, batch.c2_pad,
            batch.bstart, batch.T, batch.N, batch.bw)

    def rebuild(a):
        return bb.BandedBatch(sig=a[0], mu_pad=a[1], c1_pad=a[2],
                              c2_pad=a[3], bstart=a[4], T=a[5], N=a[6],
                              bw=a[7], pad=pad_s, B=B_s)

    # fwd/bwd produce the full (Tc, Rp, B) DP tensors — reduce INSIDE the
    # jit (materializing them is a 512 MB D2H over the tunnel, which
    # swamps the kernel time being measured)
    @functools.partial(jax.jit, static_argnames=("geom",))
    def fwd(a, geom):
        M, E = pk._forward_t(rebuild(a), log_m1, log_e2)
        return M[-1].sum() + E[-1].sum()

    @functools.partial(jax.jit, static_argnames=("geom",))
    def bwd(a, geom):
        M, E = pk._backward_t(rebuild(a), log_m1, log_e2)
        return M[0].sum() + E[0].sum()

    @functools.partial(jax.jit, static_argnames=("geom",))
    def full(a, geom):
        return pk.banded_segment_pallas(rebuild(a), 1920, log_m1, log_e2)

    batch = arrs

    base = {}
    for G in (8, 16, 32):
        for C in (128, 64, 32):
            # Mosaic fori_loop supports only unroll=1 or full unroll
            for U in (1,):
                if G * C > 2048:  # VMEM: 2 out bufs x (C,G,512)x4B x 2
                    continue
                pk.G_BLOCK, pk.CHUNK, pk.UNROLL = G, C, U
                pk.CHUNK_VIT = min(32, C)
                pk.CHUNK_WALK = min(64, C)
                geom = (G, C, U)
                try:
                    tf = timed(fwd, batch, geom)
                    tb = timed(bwd, batch, geom)
                    tt = timed(full, batch, geom)
                except Exception as e:
                    print(f"G={G} C={C} U={U}: FAIL {type(e).__name__} "
                          f"{str(e)[:120]}", flush=True)
                    continue
                rows = (pk._round_up(R, G) // G) * T_pad
                print(
                    f"G={G:2d} C={C:3d} U={U}: fwd {tf*1e3:6.1f} ms "
                    f"({tf/rows*1e9:6.0f} ns/row)  bwd {tb*1e3:6.1f} ms  "
                    f"full {tt*1e3:6.1f} ms", flush=True)
                base[geom] = tt


if __name__ == "__main__":
    main()
