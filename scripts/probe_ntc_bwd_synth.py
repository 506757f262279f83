"""TPU probe: time ntc_backward_pallas variants on SYNTHETIC packs.

The kernel's cost is value-independent (dense compute, no data-dependent
control flow), so random packs with the production shapes give the same
per-grid-step timing without compiling the heavy plan/pack pipeline.

Usage: python scripts/probe_ntc_bwd_synth.py [T_pad] [variant ...]
variants: prod rev fwd arb c4 c16 pv
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

from dynamont_tpu.constants import NTK_TRANSITIONS
from dynamont_tpu.ops import ntc_pallas as npk

R, CN, CK, RC, NS, NKS, NSS, ACK = (npk.R, npk.CN, npk.CK, npk.RC, npk.NS,
                                    npk.NKS, npk.NSS, npk.ACK)
A = npk.A


def drain(out):
    """Force a D2H of one scalar: on the axon tunnel block_until_ready
    returns before execution drains; only a transfer is a real wait."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf).ravel()[:1]


def timed(name, fn, *args, n=3):
    t0 = time.perf_counter()
    drain(fn(*args))
    t_first = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        drain(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:32s}: {min(ts)*1e3:9.1f} ms   (first {t_first:6.1f} s)",
          flush=True)
    return min(ts)


def synth_packs(T_pad, K, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    ks = rng.integers(0, K, size=(T_pad, CK, R)).astype(np.float32)
    nrow = f(T_pad, NS, RC)
    kcol = f(T_pad, NKS, R, CK)
    suc = f(T_pad, NSS, R, ACK)
    ksT = jnp.asarray(ks)
    ksTp = jnp.asarray(np.roll(ks, 1, axis=0))
    ksTn = jnp.asarray(np.roll(ks, -1, axis=0))
    alw = jnp.asarray(
        rng.integers(0, 2, size=(T_pad, RC, CK)).astype(np.int8))
    hd = jnp.asarray(
        rng.integers(0, 4, size=(T_pad, RC, CK)).astype(np.int16))
    return npk.NTCPacks(nrow, kcol, suc, ksT, ksTp, ksTn, alw, hd, T_pad, K)


def variant_bwd(packs, trans_log, *, C, reverse, arbitrary=False):
    T_pad = packs.T_pad
    nc = T_pad // C
    tl = {k: np.float32(v) for k, v in trans_log.items()}
    kernel = functools.partial(npk._bwd_kernel, C=C, nc=nc, tl=tl,
                               K=packs.K)
    ix = (lambda c: nc - 1 - c) if reverse else (lambda c: c)
    kwargs = {}
    if arbitrary:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    return pl.pallas_call(
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


def main():
    T_pad = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    variants = sys.argv[2:] or ["prod", "fwd"]
    K = 1024
    ntk = NTK_TRANSITIONS["rna002"]
    trans_log = {k: math.log(v) for k, v in ntk.items()}
    packs = synth_packs(T_pad, K)
    jax.block_until_ready(packs.nrow)
    print(f"T_pad={T_pad} nc@C8={T_pad // 8}", flush=True)

    runs = {
        "prod": ("bwd C=8 reversed (prod)", dict(C=8, reverse=True)),
        "rev": ("bwd C=8 reversed", dict(C=8, reverse=True)),
        "fwd": ("bwd C=8 forward", dict(C=8, reverse=False)),
        "arb": ("bwd C=8 rev arbitrary", dict(C=8, reverse=True,
                                              arbitrary=True)),
        "c4": ("bwd C=4 reversed", dict(C=4, reverse=True)),
        "c16": ("bwd C=16 reversed", dict(C=16, reverse=True)),
    }
    for v in variants:
        if v == "pv":
            bwd = variant_bwd(packs, trans_log, C=8, reverse=True)
            jax.block_until_ready(bwd)
            Zn = jnp.zeros((R,), jnp.float32)
            fn = jax.jit(functools.partial(
                npk.ntc_posterior_viterbi_pallas, trans_log=trans_log))
            timed("pv (posterior+viterbi)", fn, packs, bwd, Zn)
            continue
        name, kw = runs[v]

        def f(nrow, kcol, suc, ksTn, alw, hd, _kw=kw):
            p = npk.NTCPacks(nrow, kcol, suc, packs.ksT, packs.ksTp, ksTn,
                             alw, hd, T_pad, K)
            return variant_bwd(p, trans_log, **_kw)

        fn = jax.jit(f)
        dt = timed(name, fn, packs.nrow, packs.kcol, packs.suc,
                   packs.ksTn, packs.alw, packs.hd)
        nsteps = T_pad // kw["C"]
        print(f"  -> {dt / nsteps * 1e6:8.1f} us/grid-step, "
              f"{dt / T_pad * 1e6:6.1f} us/t-row", flush=True)


if __name__ == "__main__":
    main()
