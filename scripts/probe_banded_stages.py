"""TPU probe: per-stage timings of the banded device pipeline.

Stage costs are measured as DIFFERENCES between jitted pipeline PREFIXES
that each return only tiny reductions (standalone per-stage jits measure
artifact costs on the axon backend; prefixes mirror the production fused
program). Run at bench shapes by default:
    python scripts/probe_banded_stages.py [R] [T] [N_BASES]
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
from dynamont_tpu.ops import nt_banded_device as dv
from dynamont_tpu.ops import nt_banded_pallas as pk
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
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    n_bases = int(sys.argv[3]) if len(sys.argv) > 3 else 1800
    model = load_model_for_pore("rna002")
    nt = NT_TRANSITIONS["rna002"]
    log_m1, log_e2 = math.log(nt["m1"]), math.log(nt["e2"])
    means, c1, c2 = model.score_params()

    sigs, kids = [], []
    for s in range(R):
        sig, read = make_read(model, n_bases=n_bases, mean_dwell=9.0, seed=s)
        sigs.append(sig[:T])
        kids.append(np.asarray(seq_to_kmer_ids(read, model.kmer_size, 4),
                               np.int32))
    wire = dv.prepare_wire(sigs, kids, band=400, t_pad_to=2048)
    print(f"R={R} T_pad={wire.T_pad} B={wire.B} N_max={wire.N_max}",
          flush=True)

    means_t = jax.device_put(jnp.asarray(means, jnp.float32))
    c1_t = jax.device_put(jnp.asarray(c1, jnp.float32))
    c2_t = jax.device_put(jnp.asarray(c2, jnp.float32))
    r_iota = jnp.arange(R)

    def prefix(stage: str):
        @jax.jit
        def f(dacs, aff_a, aff_b, kmer_ids, shift_bits, Tr, Nr, bwr,
              mt, c1a, c2a):
            dec = jax.vmap(
                dv._decode_single(wire, mt, c1a, c2a, jnp.float32, False)
            )(dacs, aff_a, aff_b, kmer_ids, shift_bits, Tr, Nr, bwr)
            sig, mu_pad, c1_pad, c2_pad, bstart = dec
            batch = bb.BandedBatch(
                sig=sig, mu_pad=mu_pad, c1_pad=c1_pad, c2_pad=c2_pad,
                bstart=bstart, T=Tr, N=Nr, bw=bwr, pad=wire.pad, B=wire.B,
            )
            if stage == "decode":
                return sig.sum() + mu_pad.sum() + bstart.sum()
            fM, fE = pk.forward_pallas(batch, log_m1, log_e2)
            if stage == "fwd":
                return fE[:, -1].sum()
            bM, bE = pk.backward_pallas(batch, log_m1, log_e2)
            if stage == "bwd":
                return bE[:, 0].sum() + fE[:, -1].sum()
            Zb = bE[r_iota, 0, batch.bw + 1]
            Zf = fE[r_iota, Tr - 1, bwr + 1]
            choices, PM, PE = pk.viterbi_post_pallas(
                fM, fE, bM, bE, Zb, batch
            )
            if stage == "viterbi":
                return PM[:, 0].sum() + Zf.sum()
            starts, medians = pk.walk_pallas(PM, PE, choices, batch,
                                             wire.N_max)
            return starts.sum() + medians.sum() + Zf.sum() + Zb.sum()

        return f

    args = (wire.dacs, wire.aff_a, wire.aff_b, wire.kmer_ids,
            wire.shift_bits, wire.T, wire.N, wire.bw, means_t, c1_t, c2_t)
    acc = {}
    for stage in ["decode", "fwd", "bwd", "viterbi", "walk"]:
        acc[stage] = timed(f"<= {stage}", prefix(stage), *args)
    prev = 0.0
    print("--- per-stage (differences) ---", flush=True)
    for stage in ["decode", "fwd", "bwd", "viterbi", "walk"]:
        print(f"{stage:14s}: {(acc[stage]-prev)*1e3:8.1f} ms", flush=True)
        prev = acc[stage]

    run = dv.make_device_fn(nt["m1"], nt["e2"], means, c1, c2,
                            dtype=jnp.float32)
    timed("full_fused", run, wire)

    # host wire-prep cost (not device)
    t0 = time.perf_counter()
    for _ in range(3):
        dv.prepare_wire(sigs, kids, band=400, t_pad_to=2048)
    print(f"{'prepare_wire':14s}: {(time.perf_counter()-t0)/3*1e3:8.1f} ms "
          "(host)", flush=True)


if __name__ == "__main__":
    main()
