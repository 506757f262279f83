"""Pallas TPU kernels for the banded NT DP.

Same math as ops/nt_banded_batch (forward/backward/Viterbi over the band)
but as Mosaic kernels: per-step work runs inside an on-core fori_loop at
<1us/row instead of ~10us/row for an XLA while-loop step, and compile time
stays low because the loop body is compiled once.

Layout: grid = (reads, T-chunks). The T axis is blocked; BlockSpec machinery
streams (1, C, B) row-chunks HBM<->VMEM with automatic double buffering.
The DP carry (M/E rows + the sliding emission-parameter window) lives in
scratch, which persists across the sequential chunk axis of the grid and is
re-initialized when a new read starts (standard accumulator pattern).

The recurrences are identical to the scan kernels (ref: src/cpp/
NT_banded.cpp:23-123,139-189); entering band-window elements and shift flags
are precomputed outside (one bulk gather), exactly as in the scan path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamont_tpu.ops import nt_banded_batch as bb

NEG_INF = float(np.float32(-np.inf))
CHUNK = 512


def _iota_b(B):
    return jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)


def _valid(j_iota, bs, bw, N, lower_one: bool):
    ns = jnp.maximum(bs, 1 if lower_one else 0)
    ne = jnp.minimum(bs + 2 * bw + 1, N)
    return (j_iota >= ns - bs + 1) & (j_iota < ne - bs + 1)


def _shift_left(row, fill):
    out = pltpu.roll(row, row.shape[1] - 1, axis=1)  # roll by -1 (non-negative form)
    j = _iota_b(row.shape[1])
    return jnp.where(j == row.shape[1] - 1, fill, out)


def _shift_right(row, fill):
    out = pltpu.roll(row, 1, axis=1)
    j = _iota_b(row.shape[1])
    return jnp.where(j == 0, fill, out)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(bw_ref, n_ref, sig_ref, s1_ref, emu_ref, ec1_ref, ec2_ref,
                bs_ref, w0mu_ref, w0c1_ref, w0c2_ref, M_out, E_out,
                cM, cE, wmu, wc1, wc2, *, B, C, log_m1, log_e2):
    r = pl.program_id(0)
    c = pl.program_id(1)
    bw = bw_ref[r]
    N = n_ref[r]
    j_iota = _iota_b(B)

    @pl.when(c == 0)
    def _():
        init = jnp.full((1, B), NEG_INF, jnp.float32)
        cM[...] = init
        cE[...] = jnp.where(j_iota == bw + 1, 0.0, NEG_INF)
        wmu[...] = w0mu_ref[0]
        wc1[...] = w0c1_ref[0]
        wc2[...] = w0c2_ref[0]

    def body(i, _):
        t = c * C + i

        @pl.when(t == 0)
        def _():
            M_out[0, i, :] = cM[0, :]
            E_out[0, i, :] = cE[0, :]

        @pl.when(t > 0)
        def _():
            s1 = s1_ref[0, i, 0] == 1
            w_mu = jnp.where(s1, _shift_left(wmu[...], emu_ref[0, i, 0]), wmu[...])
            w_c1 = jnp.where(s1, _shift_left(wc1[...], ec1_ref[0, i, 0]), wc1[...])
            w_c2 = jnp.where(s1, _shift_left(wc2[...], ec2_ref[0, i, 0]), wc2[...])
            wmu[...] = w_mu
            wc1[...] = w_c1
            wc2[...] = w_c2
            d = sig_ref[0, i, 0] - w_mu
            sc_b = w_c1 - w_c2 * d * d
            M_prev = cM[...]
            E_prev = cE[...]
            E_m = jnp.where(s1, E_prev, _shift_right(E_prev, NEG_INF))
            M_e = jnp.where(s1, _shift_left(M_prev, NEG_INF), M_prev)
            E_e = jnp.where(s1, _shift_left(E_prev, NEG_INF), E_prev)
            M_new = E_m + sc_b + log_m1
            E_new = jnp.logaddexp(M_e + sc_b, E_e + sc_b + log_e2)
            bs = bs_ref[0, i, 0]
            valid = _valid(j_iota, bs, bw, N, lower_one=True)
            M_new = jnp.where(valid, M_new, NEG_INF)
            E_new = jnp.where(valid, E_new, NEG_INF)
            cM[...] = M_new
            cE[...] = E_new
            M_out[0, i, :] = M_new[0, :]
            E_out[0, i, :] = E_new[0, :]

        return 0

    jax.lax.fori_loop(0, C, body, 0)


def forward_pallas(batch: bb.BandedBatch, log_m1: float, log_e2: float,
                   interpret: bool = False):
    R, Tm1 = batch.sig.shape
    T_pad = Tm1 + 1
    B = batch.B
    C = CHUNK
    nc = (T_pad + C - 1) // C
    Tc = nc * C

    # row t uses sig[t-1]: align by prepending one pad entry
    sig = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.float32), batch.sig.astype(jnp.float32),
         jnp.zeros((R, Tc - T_pad), jnp.float32)], axis=1)
    bs_all = batch.bstart.astype(jnp.int32)
    s1 = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.int32),
         (bs_all[:, 1:] != bs_all[:, :-1]).astype(jnp.int32)], axis=1)
    enter_idx = bs_all + (B - 2 + batch.pad - 1)
    gather = lambda tbl: jnp.take_along_axis(tbl.astype(jnp.float32), enter_idx, axis=1)
    e_mu, e_c1, e_c2 = gather(batch.mu_pad), gather(batch.c1_pad), gather(batch.c2_pad)
    w0 = lambda tbl: jax.vmap(
        lambda arr, st: jax.lax.dynamic_slice(arr, (st,), (B,))
    )(tbl.astype(jnp.float32), bs_all[:, 0] - 2 + batch.pad)
    w0mu, w0c1, w0c2 = w0(batch.mu_pad), w0(batch.c1_pad), w0(batch.c2_pad)

    pad_t = lambda a: jnp.pad(a, ((0, 0), (0, Tc - T_pad)))
    bs_p = pad_t(bs_all)
    s1_p = pad_t(s1)
    e_mu, e_c1, e_c2 = pad_t(e_mu), pad_t(e_c1), pad_t(e_c2)

    row_spec = lambda: pl.BlockSpec((1, C, 1), lambda r, c, *_: (r, c, 0), memory_space=pltpu.VMEM)
    winit_spec = lambda w: pl.BlockSpec((1, 1, w), lambda r, c, *_: (r, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, C, B), lambda r, c, *_: (r, c, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _fwd_kernel, B=B, C=C, log_m1=np.float32(log_m1), log_e2=np.float32(log_e2)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(R, nc),
        in_specs=[row_spec(), row_spec(), row_spec(), row_spec(), row_spec(),
                  row_spec(), winit_spec(B), winit_spec(B), winit_spec(B)],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((1, B), jnp.float32) for _ in range(5)],
    )
    M, E = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, Tc, B), jnp.float32),
            jax.ShapeDtypeStruct((R, Tc, B), jnp.float32),
        ),
        interpret=interpret,
    )(
        batch.bw.astype(jnp.int32), batch.N.astype(jnp.int32),
        sig[:, :Tc, None], s1_p[..., None], e_mu[..., None], e_c1[..., None],
        e_c2[..., None], bs_p[..., None],
        w0mu[:, None, :], w0c1[:, None, :], w0c2[:, None, :],
    )
    return M[:, :T_pad], E[:, :T_pad]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(bw_ref, n_ref, t_ref, sig_ref, sb_ref, emu_ref, ec1_ref,
                ec2_ref, bs_ref, w0mu_ref, w0c1_ref, w0c2_ref, M_out, E_out,
                cM, cE, wmu, wc1, wc2, *, B, C, nc, log_m1, log_e2):
    r = pl.program_id(0)
    c = pl.program_id(1)  # chunk counter; chunk c covers rows from the END
    bw = bw_ref[r]
    N = n_ref[r]
    T = t_ref[r]
    j_iota = _iota_b(B)

    @pl.when(c == 0)
    def _():
        init = jnp.full((1, B), NEG_INF, jnp.float32)
        cM[...] = init
        cE[...] = init
        wmu[...] = w0mu_ref[0]
        wc1[...] = w0c1_ref[0]
        wc2[...] = w0c2_ref[0]

    def body(k, _):
        i = C - 1 - k  # in-chunk row, descending
        t = (nc - 1 - c) * C + i

        @pl.when(t < T - 1)
        def _():
            sb = sb_ref[0, i, 0] == 1  # shift between t and t+1
            w_mu = jnp.where(sb, _shift_right(wmu[...], emu_ref[0, i, 0]), wmu[...])
            w_c1 = jnp.where(sb, _shift_right(wc1[...], ec1_ref[0, i, 0]), wc1[...])
            w_c2 = jnp.where(sb, _shift_right(wc2[...], ec2_ref[0, i, 0]), wc2[...])
            wmu[...] = w_mu
            wc1[...] = w_c1
            wc2[...] = w_c2
            sig_t = sig_ref[0, i, 0]
            d_b = sig_t - w_mu
            full_b = w_c1 - w_c2 * d_b * d_b  # window is (1, B+1): sc_b/sc_a
            sc_b = full_b[:, :B]
            sc_a = full_b[:, 1:]
            bs = bs_ref[0, i, 0]
            n = bs + j_iota - 1
            M_next = cM[...]
            E_next = cE[...]
            E_n = jnp.where(sb, _shift_right(E_next, NEG_INF), E_next)
            M_n = jnp.where(sb, M_next, _shift_left(M_next, NEG_INF))
            ext = jnp.where(n + 1 < N, M_n + sc_a + log_m1, NEG_INF)
            has_prev = n > 0
            M_new = jnp.where(has_prev, E_n + sc_b, NEG_INF)
            ext = jnp.where(
                has_prev, jnp.logaddexp(ext, E_n + sc_b + log_e2), ext
            )
            valid = _valid(j_iota, bs, bw, N, lower_one=False)
            M_new = jnp.where(valid, M_new, NEG_INF)
            E_new = jnp.where(valid, ext, NEG_INF)
            cM[...] = M_new
            cE[...] = E_new
            M_out[0, i, :] = M_new[0, :]
            E_out[0, i, :] = E_new[0, :]

        @pl.when(t == T - 1)
        def _():
            term = jnp.where(j_iota == bw + 1, 0.0, NEG_INF)
            neg = jnp.full((1, B), NEG_INF, jnp.float32)
            cM[...] = neg
            cE[...] = term
            M_out[0, i, :] = neg[0, :]
            E_out[0, i, :] = term[0, :]

        @pl.when(t > T - 1)
        def _():
            neg = jnp.full((1, B), NEG_INF, jnp.float32)
            M_out[0, i, :] = neg[0, :]
            E_out[0, i, :] = neg[0, :]

        return 0

    jax.lax.fori_loop(0, C, body, 0)


def backward_pallas(batch: bb.BandedBatch, log_m1: float, log_e2: float,
                    interpret: bool = False):
    R, Tm1 = batch.sig.shape
    T_pad = Tm1 + 1
    B = batch.B
    C = CHUNK
    nc = (T_pad + C - 1) // C
    Tc = nc * C

    # row t uses sig[t] (zero-based signal); pad tail
    sig = jnp.concatenate(
        [batch.sig.astype(jnp.float32), jnp.zeros((R, Tc - T_pad + 1), jnp.float32)],
        axis=1)[:, :Tc]
    bs_all = batch.bstart.astype(jnp.int32)
    sb = jnp.concatenate(
        [(bs_all[:, 1:] != bs_all[:, :-1]).astype(jnp.int32),
         jnp.zeros((R, 1), jnp.int32)], axis=1)  # shift between t and t+1
    enter_idx = bs_all + (batch.pad - 2)
    gather = lambda tbl: jnp.take_along_axis(tbl.astype(jnp.float32), enter_idx, axis=1)
    e_mu, e_c1, e_c2 = gather(batch.mu_pad), gather(batch.c1_pad), gather(batch.c2_pad)
    w0 = lambda tbl: jax.vmap(
        lambda arr, st: jax.lax.dynamic_slice(arr, (st,), (B + 1,))
    )(tbl.astype(jnp.float32), bs_all[:, T_pad - 1] - 2 + batch.pad)
    w0mu, w0c1, w0c2 = w0(batch.mu_pad), w0(batch.c1_pad), w0(batch.c2_pad)

    pad_t = lambda a: jnp.pad(a, ((0, 0), (0, Tc - T_pad)))
    bs_p = pad_t(bs_all)
    sb_p = pad_t(sb)
    e_mu, e_c1, e_c2 = pad_t(e_mu), pad_t(e_c1), pad_t(e_c2)

    rev3 = lambda r, c, *_: (r, nc - 1 - c, 0)
    row_spec = lambda: pl.BlockSpec((1, C, 1), rev3, memory_space=pltpu.VMEM)
    winit_spec = lambda: pl.BlockSpec((1, 1, B + 1), lambda r, c, *_: (r, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, C, B), lambda r, c, *_: (r, nc - 1 - c, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _bwd_kernel, B=B, C=C, nc=nc,
        log_m1=np.float32(log_m1), log_e2=np.float32(log_e2),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(R, nc),
        in_specs=[row_spec(), row_spec(), row_spec(), row_spec(), row_spec(),
                  row_spec(), winit_spec(), winit_spec(), winit_spec()],
        out_specs=(out_spec, out_spec),
        scratch_shapes=(
            [pltpu.VMEM((1, B), jnp.float32) for _ in range(2)]
            + [pltpu.VMEM((1, B + 1), jnp.float32) for _ in range(3)]
        ),
    )
    M, E = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, Tc, B), jnp.float32),
            jax.ShapeDtypeStruct((R, Tc, B), jnp.float32),
        ),
        interpret=interpret,
    )(
        batch.bw.astype(jnp.int32), batch.N.astype(jnp.int32),
        batch.T.astype(jnp.int32),
        sig[..., None], sb_p[..., None], e_mu[..., None], e_c1[..., None],
        e_c2[..., None], bs_p[..., None],
        w0mu[:, None, :], w0c1[:, None, :], w0c2[:, None, :],
    )
    return M[:, :T_pad], E[:, :T_pad]


# ---------------------------------------------------------------------------
# viterbi
# ---------------------------------------------------------------------------

def _vit_kernel(bw_ref, n_ref, lpm_ref, lpe_ref, s1_ref, bs_ref, ch_out,
                cM, cE, *, B, C):
    r = pl.program_id(0)
    c = pl.program_id(1)
    bw = bw_ref[r]
    N = n_ref[r]
    j_iota = _iota_b(B)

    @pl.when(c == 0)
    def _():
        cM[...] = jnp.full((1, B), NEG_INF, jnp.float32)
        cE[...] = jnp.where(j_iota == bw + 1, 0.0, NEG_INF)

    def body(i, _):
        t = c * C + i

        @pl.when(t == 0)
        def _():
            ch_out[0, i, :] = jnp.zeros((B,), jnp.int32)

        @pl.when(t > 0)
        def _():
            s1 = s1_ref[0, i, 0] == 1
            lpm = lpm_ref[0, i, :][None, :]
            lpe = lpe_ref[0, i, :][None, :]
            M_prev = cM[...]
            E_prev = cE[...]
            E_m = jnp.where(s1, E_prev, _shift_right(E_prev, NEG_INF))
            M_e = jnp.where(s1, _shift_left(M_prev, NEG_INF), M_prev)
            E_e = jnp.where(s1, _shift_left(E_prev, NEG_INF), E_prev)
            M_new = E_m + lpm
            E_new = jnp.maximum(M_e, E_e) + lpe
            bs = bs_ref[0, i, 0]
            valid = _valid(j_iota, bs, bw, N, lower_one=True)
            M_new = jnp.where(valid, M_new, NEG_INF)
            E_new = jnp.where(valid, E_new, NEG_INF)
            choice = (E_new == (M_e + lpe)).astype(jnp.int32)
            cM[...] = M_new
            cE[...] = E_new
            ch_out[0, i, :] = choice[0, :]

        return 0

    jax.lax.fori_loop(0, C, body, 0)


def viterbi_pallas(LPM, LPE, batch: bb.BandedBatch, interpret: bool = False):
    R, T_pad, B = LPM.shape
    C = CHUNK
    nc = (T_pad + C - 1) // C
    Tc = nc * C
    bs_all = batch.bstart.astype(jnp.int32)
    s1 = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.int32),
         (bs_all[:, 1:] != bs_all[:, :-1]).astype(jnp.int32)], axis=1)
    pad_t3 = lambda a: jnp.pad(
        a.astype(jnp.float32), ((0, 0), (0, Tc - T_pad), (0, 0)),
        constant_values=NEG_INF,
    )
    pad_t = lambda a: jnp.pad(a, ((0, 0), (0, Tc - T_pad)))

    row_spec = lambda: pl.BlockSpec((1, C, 1), lambda r, c, *_: (r, c, 0), memory_space=pltpu.VMEM)
    mat_spec = lambda: pl.BlockSpec((1, C, B), lambda r, c, *_: (r, c, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_vit_kernel, B=B, C=C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(R, nc),
        in_specs=[mat_spec(), mat_spec(), row_spec(), row_spec()],
        out_specs=mat_spec(),
        scratch_shapes=[pltpu.VMEM((1, B), jnp.float32) for _ in range(2)],
    )
    ch = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, Tc, B), jnp.int32),
        interpret=interpret,
    )(
        batch.bw.astype(jnp.int32), batch.N.astype(jnp.int32),
        pad_t3(LPM), pad_t3(LPE), pad_t(s1)[..., None], pad_t(bs_all)[..., None],
    )
    return ch[:, :T_pad].astype(bool)


# ---------------------------------------------------------------------------
# assembled run
# ---------------------------------------------------------------------------

def banded_batch_run_pallas(batch: bb.BandedBatch, log_m1, log_e2,
                            interpret: bool = False) -> bb.BandedBatchResult:
    """Drop-in fp32 replacement for bb.banded_batch_run using the Mosaic
    kernels for the three wavefront passes."""
    forM, forE = forward_pallas(batch, log_m1, log_e2, interpret)
    backM, backE = backward_pallas(batch, log_m1, log_e2, interpret)
    R = batch.sig.shape[0]
    r_iota = jnp.arange(R)
    Zf = forE[r_iota, batch.T - 1, batch.bw + 1]
    Zb = backE[r_iota, 0, batch.bw + 1]
    LPM = forM + backM - Zb[:, None, None]
    LPE = forE + backE - Zb[:, None, None]
    choices = viterbi_pallas(LPM, LPE, batch, interpret)
    PM = jnp.clip(jnp.nan_to_num(jnp.exp(LPM), nan=0.0, posinf=0.0), 0.0, 1.0)
    PE = jnp.clip(jnp.nan_to_num(jnp.exp(LPE), nan=0.0, posinf=0.0), 0.0, 1.0)
    return bb.BandedBatchResult(Zf=Zf, Zb=Zb, PM=PM, PE=PE, choices=choices)
