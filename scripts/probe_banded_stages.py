"""TPU probe: per-stage timings of the banded device pipeline.

Stages run in separate jits for attribution; the production engine fuses
decode+DP+walk into one program. Run at bench shapes by default:
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
    return out


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

    decode_fn = jax.jit(lambda dacs, a, b, kid, bits, Tr, Nr, bw: jax.vmap(
        dv._decode_single(wire, means_t, c1_t, c2_t, jnp.float32, False)
    )(dacs, a, b, kid, bits, Tr, Nr, bw))
    dec = timed("decode", decode_fn, wire.dacs, wire.aff_a, wire.aff_b,
                wire.kmer_ids, wire.shift_bits, wire.T, wire.N, wire.bw)
    sig, mu_pad, c1_pad, c2_pad, bstart = dec
    batch = bb.BandedBatch(
        sig=sig, mu_pad=mu_pad, c1_pad=c1_pad, c2_pad=c2_pad, bstart=bstart,
        T=wire.T, N=wire.N, bw=wire.bw, pad=wire.pad, B=wire.B,
    )
    arrs = batch[:8]  # pad/B are static — rebuild the batch inside jit

    def rebuild(*a):
        return bb.BandedBatch(*a, pad=wire.pad, B=wire.B)

    fwd_fn = jax.jit(lambda *a: pk.forward_pallas(rebuild(*a), log_m1, log_e2))
    fM, fE = timed("fwd_pallas", fwd_fn, *arrs)
    bwd_fn = jax.jit(lambda *a: pk.backward_pallas(rebuild(*a), log_m1, log_e2))
    bM, bE = timed("bwd_pallas", bwd_fn, *arrs)

    r_iota = jnp.arange(R)
    Zb = bE[r_iota, 0, batch.bw + 1]
    vit_fn = jax.jit(lambda a, b, c, d, z, *bt: pk.viterbi_post_pallas(
        a, b, c, d, z, rebuild(*bt), log_m1, log_e2))
    PM, PE, choices, Zf = timed("viterbi", vit_fn, fM, fE, bM, bE, Zb, *arrs)

    walk_fn = jax.jit(lambda pm, pe, ch, *bt: pk.walk_pallas(
        pm, pe, ch, rebuild(*bt), wire.N_max))
    timed("walk", walk_fn, PM, PE, choices, *arrs)

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
