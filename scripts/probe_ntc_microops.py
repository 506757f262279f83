"""TPU micro-probe: per-op cost of the NTC kernel building blocks.

Times tiny standalone Pallas kernels that run ONE building block N times in
a fori_loop (data-dependent across iterations so nothing folds away), and
divides by N.  Targets the bwd-vs-pv per-row cost gap (196 us vs 18 us).
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

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamont_tpu.ops import ntc_pallas as npk

RC, CK, ACK, R, CN, A = npk.RC, npk.CK, npk.ACK, npk.R, npk.CN, npk.A
ITERS = int(os.environ.get("MICRO_ITERS", 16384))


def run_block(name, body_fn, n_in=1):
    """body_fn(x, aux) -> y with y.shape == x.shape == (RC, CK)."""

    def kernel(x_ref, aux_ref, o_ref):
        def body(i, v):
            return body_fn(v, aux_ref[...]) * 0.999
        o_ref[...] = jax.lax.fori_loop(0, ITERS, body, x_ref[...])

    x = jnp.asarray(np.random.randn(RC, CK), jnp.float32)
    aux = jnp.asarray(np.random.randn(RC, CK), jnp.float32)
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RC, CK), jnp.float32),
    )
    g = jax.jit(lambda a, b: f(a, b))
    np.asarray(g(x, aux))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(g(x, aux))
        ts.append(time.perf_counter() - t0)
    us = min(ts) / ITERS * 1e6
    print(f"{name:28s}: {us:8.2f} us/iter", flush=True)
    return us


def main():
    print(f"device={jax.devices()[0]}", flush=True)

    run_block("noop (mul only)", lambda v, a: v)
    run_block("roll_up_1", lambda v, a: pltpu.roll(v, 1, axis=0))
    run_block("roll_up_4", lambda v, a: pltpu.roll(v, 4, axis=0))
    run_block("roll_down_127", lambda v, a: pltpu.roll(v, 127, axis=0))
    run_block("roll_down_124", lambda v, a: pltpu.roll(v, 124, axis=0))
    run_block("roll_lane_1", lambda v, a: pltpu.roll(v, 1, axis=1))

    run_block("affine_chain_up",
              lambda v, a: npk._affine_chain(v, a, True, False))
    run_block("affine_chain_down",
              lambda v, a: npk._affine_chain(v, a, False, False))

    def rg2(v, a):
        g = npk._row_gather(a[:, 0:1], [v, v * 0.5])
        return g[0] + g[1]
    run_block("row_gather_x2", rg2)

    def rg5(v, a):
        g = npk._row_gather(a[:, 0:1], [v, v, v, v, v])
        return sum(g)
    run_block("row_gather_x5", rg5)

    def mk_ks(a):
        # plausible masked slot values in [0, 1024), some dead
        return jnp.where(a[:CK, :R] > -1.0,
                         jnp.abs(a[:CK, :R] * 100.0) % 1024.0, -1.0)

    def cg4(v, a):
        ksT = mk_ks(a)
        ks_cur = a[:R, :CK] % 1024.0
        same, suc = npk._col_gather(
            [v, v * 0.5, v * 0.25, v * 2.0], ksT,
            npk._dst_vals(ks_cur, 1024, "same"),
            npk._dst_vals(ks_cur, 1024, "suc"))
        return same[0] + suc[3][:, :CK]
    run_block("col_gather_L4", cg4)

    def cg16(v, a):
        ksT = mk_ks(a)
        ks_cur = a[:R, :CK] % 1024.0
        blocks = [v * (0.9 + 0.01 * i) for i in range(16)]
        same, suc, cs, cpa = npk._col_gather(
            blocks, ksT, npk._dst_vals(ks_cur, 1024, "same"),
            npk._dst_vals(ks_cur, 1024, "prec"), want_slots=True)
        return same[0] + suc[15][:, :CK] + npk._exp16(npk._expand16(), cs)
    run_block("col_gather_L16+slots", cg16)

    def lse13(v, a):
        return npk._lse([v + 0.01 * i for i in range(13)])
    run_block("lse_13_terms", lse13)

    def unp(v, a):
        h1, h2, h3, h4 = npk._unpack_hd(a.astype(jnp.int16))
        return v + h1 + h2 + h3 + h4
    run_block("unpack_hd", unp)

    def transp(v, a):
        return v + jnp.transpose(a[:24, :]).sum(axis=1, keepdims=True)
    # transpose of (24, 128) like nT
    run_block("transpose_24x128", transp)


if __name__ == "__main__":
    main()
