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

def _vit_kernel(bw_ref, n_ref, zb_ref, fm_ref, fe_ref, bm_ref, be_ref,
                s1_ref, bs_ref, ch_out, pm_out, pe_out, cM, cE, *, B, C):
    """Fused posterior + Viterbi pass: computes LPM/LPE = for+back-Zb on the
    fly, emits the traceback choice bits and the clipped posterior
    probabilities PM/PE in one streaming read of the four DP tensors."""
    r = pl.program_id(0)
    c = pl.program_id(1)
    bw = bw_ref[r]
    N = n_ref[r]
    zb = zb_ref[r]
    j_iota = _iota_b(B)

    @pl.when(c == 0)
    def _():
        cM[...] = jnp.full((1, B), NEG_INF, jnp.float32)
        cE[...] = jnp.where(j_iota == bw + 1, 0.0, NEG_INF)

    def clip_prob(lp):
        p = jnp.exp(lp)
        p = jnp.where(jnp.isnan(p), 0.0, p)
        return jnp.clip(p, 0.0, 1.0)

    def body(i, _):
        t = c * C + i
        lpm = (fm_ref[0, i, :] + bm_ref[0, i, :] - zb)[None, :]
        lpe = (fe_ref[0, i, :] + be_ref[0, i, :] - zb)[None, :]
        pm_out[0, i, :] = clip_prob(lpm)[0, :]
        pe_out[0, i, :] = clip_prob(lpe)[0, :]

        @pl.when(t == 0)
        def _():
            ch_out[0, i, :] = jnp.zeros((B,), jnp.int32)

        @pl.when(t > 0)
        def _():
            s1 = s1_ref[0, i, 0] == 1
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


def viterbi_post_pallas(forM, forE, backM, backE, Zb, batch: bb.BandedBatch,
                        interpret: bool = False):
    """choices + PM + PE from the raw DP tensors in one fused pass."""
    R, T_pad, B = forM.shape
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
        num_scalar_prefetch=3,
        grid=(R, nc),
        in_specs=[mat_spec(), mat_spec(), mat_spec(), mat_spec(), row_spec(),
                  row_spec()],
        out_specs=(mat_spec(), mat_spec(), mat_spec()),
        scratch_shapes=[pltpu.VMEM((1, B), jnp.float32) for _ in range(2)],
    )
    ch, PM, PE = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, Tc, B), jnp.int32),
            jax.ShapeDtypeStruct((R, Tc, B), jnp.float32),
            jax.ShapeDtypeStruct((R, Tc, B), jnp.float32),
        ),
        interpret=interpret,
    )(
        batch.bw.astype(jnp.int32), batch.N.astype(jnp.int32),
        Zb.astype(jnp.float32),
        pad_t3(forM), pad_t3(forE), pad_t3(backM), pad_t3(backE),
        pad_t(s1)[..., None], pad_t(bs_all)[..., None],
    )
    return (ch[:, :T_pad].astype(bool), PM[:, :T_pad], PE[:, :T_pad])


# ---------------------------------------------------------------------------
# assembled run
# ---------------------------------------------------------------------------

def banded_batch_run_pallas(batch: bb.BandedBatch, log_m1, log_e2,
                            interpret: bool = False) -> bb.BandedBatchResult:
    """Drop-in fp32 replacement for bb.banded_batch_run using the Mosaic
    kernels for the three wavefront passes (posterior computation fused
    into the Viterbi pass)."""
    forM, forE = forward_pallas(batch, log_m1, log_e2, interpret)
    backM, backE = backward_pallas(batch, log_m1, log_e2, interpret)
    R = batch.sig.shape[0]
    r_iota = jnp.arange(R)
    Zf = forE[r_iota, batch.T - 1, batch.bw + 1]
    Zb = backE[r_iota, 0, batch.bw + 1]
    choices, PM, PE = viterbi_post_pallas(
        forM, forE, backM, backE, Zb, batch, interpret
    )
    return bb.BandedBatchResult(Zf=Zf, Zb=Zb, PM=PM, PE=PE, choices=choices)

# ---------------------------------------------------------------------------
# traceback walk
# ---------------------------------------------------------------------------

def _walk_kernel(t_ref, n_ref, bw_ref, pm_ref, pe_ref, ch_ref, s1_ref,
                 out_n, out_prob, out_close, state, *, B, C, nc, n_sentinel):
    """Sequential MAP walk (ref: NT_banded.cpp:204-250) as a reverse chunk
    stream. Carry (n, j, is_m) lives in SMEM scratch; per-row outputs are
    lane-broadcast for aligned vector stores (column 0 read back outside)."""
    r = pl.program_id(0)
    c = pl.program_id(1)
    T = t_ref[r]
    N = n_ref[r]
    bw = bw_ref[r]
    lane = _iota_b(B)

    @pl.when(c == 0)
    def _():
        state[0] = N - 1      # n
        state[1] = bw + 1     # j
        state[2] = 0          # is_m

    def body(k, _):
        i = C - 1 - k
        t = (nc - 1 - c) * C + i
        n = state[0]
        j = state[1]
        is_m = state[2] == 1
        active = (t <= T - 1) & (t >= 1) & (n >= 1)
        s = s1_ref[0, i, 0]

        def lane_pick(row):
            return jnp.sum(jnp.where(lane == j, row[None, :], 0.0))

        pm = lane_pick(pm_ref[0, i, :])
        pe = lane_pick(pe_ref[0, i, :])
        ch = jnp.sum(jnp.where(lane == j, ch_ref[0, i, :][None, :], 0))
        prob = jnp.where(is_m, pm, pe)
        close = active & is_m
        out_val = jnp.where(active, n, n_sentinel)
        out_n[0, i, :] = jnp.full((128,), 0, jnp.int32) + out_val
        out_prob[0, i, :] = jnp.full((128,), 0.0, jnp.float32) + prob
        out_close[0, i, :] = jnp.full((128,), 0, jnp.int32) + close.astype(jnp.int32)

        state[0] = jnp.where(close, n - 1, n)
        state[1] = jnp.where(close, j - 1 + s, jnp.where(active, j + s, j))
        state[2] = jnp.where(close, 0, jnp.where(active, ch, state[2]))
        return 0

    jax.lax.fori_loop(0, C, body, 0)


def walk_pallas(PM, PE, choices, batch: bb.BandedBatch, N_max: int,
                interpret: bool = False):
    """Device walk + grouped medians; same outputs as
    nt_banded_device._walk_single but with the sequential pass in Mosaic."""
    R, T_pad, B = PM.shape
    C = CHUNK
    nc = (T_pad + C - 1) // C
    Tc = nc * C
    bs_all = batch.bstart.astype(jnp.int32)
    s1 = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.int32),
         (bs_all[:, 1:] != bs_all[:, :-1]).astype(jnp.int32)], axis=1)

    pad_t3 = lambda a, v: jnp.pad(
        a, ((0, 0), (0, Tc - T_pad), (0, 0)), constant_values=v)
    pad_t = lambda a: jnp.pad(a, ((0, 0), (0, Tc - T_pad)))

    rev3 = lambda r, c, *_: (r, nc - 1 - c, 0)
    mat_spec = lambda: pl.BlockSpec((1, C, B), rev3, memory_space=pltpu.VMEM)
    row_spec = lambda: pl.BlockSpec((1, C, 1), rev3, memory_space=pltpu.VMEM)
    lane_spec = lambda: pl.BlockSpec((1, C, 128), rev3, memory_space=pltpu.VMEM)

    kernel = functools.partial(_walk_kernel, B=B, C=C, nc=nc, n_sentinel=N_max)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(R, nc),
        in_specs=[mat_spec(), mat_spec(), mat_spec(), row_spec()],
        out_specs=(lane_spec(), lane_spec(), lane_spec()),
        scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
    )
    path_n, path_prob, closes = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, Tc, 128), jnp.int32),
            jax.ShapeDtypeStruct((R, Tc, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, Tc, 128), jnp.int32),
        ),
        interpret=interpret,
    )(
        batch.T.astype(jnp.int32), batch.N.astype(jnp.int32),
        batch.bw.astype(jnp.int32),
        pad_t3(PM.astype(jnp.float32), 0.0),
        pad_t3(PE.astype(jnp.float32), 0.0),
        pad_t3(choices.astype(jnp.int32), 0),
        pad_t(s1)[..., None],
    )
    path_n = path_n[:, 1:T_pad, 0]
    path_prob = path_prob[:, 1:T_pad, 0]
    closes = closes[:, 1:T_pad, 0].astype(bool)
    t_idx = jnp.arange(1, T_pad, dtype=jnp.int32)

    def finish(pn, pp, cl):
        starts = jnp.full((N_max + 1,), -1, jnp.int32)
        idx = jnp.where(cl, pn, N_max)
        starts = starts.at[idx].set(t_idx - 1)[:N_max]
        keys = pn
        probs = jnp.where(keys < N_max, pp, jnp.inf)
        sk, sp = jax.lax.sort((keys, probs), num_keys=2)
        counts = jnp.zeros((N_max + 1,), jnp.int32).at[keys].add(1)[:N_max]
        offsets = jnp.cumsum(counts) - counts
        lo = jnp.clip(offsets + (counts - 1) // 2, 0, pn.shape[0] - 1)
        hi = jnp.clip(offsets + counts // 2, 0, pn.shape[0] - 1)
        med = 0.5 * (sp[lo] + sp[hi])
        med = jnp.where(counts > 0, med, 0.0)
        return starts, med

    return jax.vmap(finish)(path_n, path_prob, closes)
