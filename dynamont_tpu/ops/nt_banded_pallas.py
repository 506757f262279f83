"""Pallas TPU kernels for the banded NT DP.

Same math as ops/nt_banded_batch (forward/backward/Viterbi over the band)
but as Mosaic kernels: per-step work runs inside an on-core fori_loop at
<1us/row instead of ~10us/row for an XLA while-loop step, and compile time
stays low because the loop body is compiled once.

Layout: a GROUP of G reads is processed together per band row — the row
state is a (G, B) block (reads on sublanes, band on lanes), so every
vector instruction runs at full sublane utilization instead of the 1/8
a (1, B) row uses. The big tensors are kept T-major (Tc, Rp, B) on HBM:
(Rp, B) minor dims tile perfectly and the kernels index rows with a
dynamic LEADING index (the well-supported Mosaic case). The grid is
(Rp/G, T-chunks); BlockSpec machinery streams (C, G, B) row-chunks
HBM<->VMEM with automatic double buffering. The DP carry (M/E rows + the
sliding emission-parameter window) lives in scratch, which persists across
the sequential chunk axis and is re-initialized when a new read group
starts (standard accumulator pattern).

Per-row scalar streams (signal, shift flag, entering window values, band
start) are packed into one (Tc, Rp, 8) tensor so a single dynamic-index
load yields all of them as (G, lane) slices; per-read scalars (bw, N, T,
Zb) are packed into a (Rp, 8) block.

The recurrences are identical to the scan kernels (ref: src/cpp/
NT_banded.cpp:23-123,139-189); entering band-window elements and shift
flags are precomputed outside (one bulk gather), exactly as in the scan
path. Public wrappers keep the (R, T_pad, B) read-major interface for the
tests; the fused production entry `banded_segment_pallas` stays T-major
end-to-end (no transposes materialize on device).
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
# Row-group geometry (TPU sweep, scripts/probe_banded_kernel_geom.py,
# R=64 T=16k: G=8/C=128 full 339 ms, G=16/C=64 298 ms, G=32/C=32 283 ms).
# G=16 is the production point: ~12% faster than G=8 while keeping the
# engine's 16-read buckets padding-free (G=32 would pad them 2x); larger
# G*C fails Mosaic compile (VMEM) at G*C > 1024.
G_BLOCK = 16      # reads per group (sublane dimension of the row state)
CHUNK = 64        # fwd/bwd rows per grid step
UNROLL = 1        # fori_loop row unroll inside the kernels
CHUNK_VIT = 32    # viterbi streams 4 in + 3 out (C, G, B) mats: keep small
CHUNK_WALK = 64


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _iota_f(shape, dim):
    # Mosaic's tpu.iota is integer-only; convert after
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _validf(jf, bs, bw, N, lower_one: bool):
    """Valid band-cell mask; (1, B) fp32 iota vs (G, 1) scalars -> (G, B).
    All quantities are small integers, exact in fp32."""
    ns = jnp.maximum(bs, 1.0 if lower_one else 0.0)
    ne = jnp.minimum(bs + 2.0 * bw + 1.0, N)
    return (jf >= ns - bs + 1.0) & (jf < ne - bs + 1.0)


def _shift_left(row, fill):
    out = pltpu.roll(row, row.shape[1] - 1, axis=1)  # roll by -1
    j = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.where(j == row.shape[1] - 1, fill, out)


def _shift_right(row, fill):
    out = pltpu.roll(row, 1, axis=1)
    j = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.where(j == 0, fill, out)


def _pad_reads(a, Rp: int):
    """Edge-pad the read axis to Rp (replicated reads compute finite
    results that are simply discarded on slice-back)."""
    R = a.shape[0]
    if R == Rp:
        return a
    return jnp.concatenate(
        [a, jnp.repeat(a[-1:], Rp - R, axis=0)], axis=0
    )


def _pack_rows(*streams):
    """(Rp, Tc) fp32 streams -> (Tc, Rp, len) row-packed tensor."""
    return jnp.stack([s.astype(jnp.float32) for s in streams], axis=-1
                     ).transpose(1, 0, 2)


def _pack_scal(*cols):
    return jnp.stack([jnp.asarray(c, jnp.float32) for c in cols], axis=-1)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(scal_ref, rows_ref, w0mu_ref, w0c1_ref, w0c2_ref,
                M_out, E_out, cM, cE, wmu, wc1, wc2, *, B, C, G):
    c = pl.program_id(1)
    bw = scal_ref[:, 0:1]
    N = scal_ref[:, 1:2]
    # transitions ride in scal lanes (runtime values, not compile-time
    # constants) so training param updates never recompile the kernel
    log_m1 = scal_ref[:, 2:3]
    log_e2 = scal_ref[:, 3:4]
    jf = _iota_f((1, B), 1)

    @pl.when(c == 0)
    def _():
        cM[...] = jnp.full((G, B), NEG_INF, jnp.float32)
        cE[...] = jnp.where(jf == bw + 1.0, 0.0, NEG_INF)
        wmu[...] = w0mu_ref[...]
        wc1[...] = w0c1_ref[...]
        wc2[...] = w0c2_ref[...]

    def body(i, _):
        t = c * C + i

        @pl.when(t == 0)
        def _():
            M_out[i] = cM[...]
            E_out[i] = cE[...]

        @pl.when(t > 0)
        def _():
            row = rows_ref[i]                      # (G, 8)
            sig = row[:, 0:1]
            s1 = row[:, 1:2] == 1.0
            emu = row[:, 2:3]
            ec1 = row[:, 3:4]
            ec2 = row[:, 4:5]
            bs = row[:, 5:6]
            w_mu = jnp.where(s1, _shift_left(wmu[...], emu), wmu[...])
            w_c1 = jnp.where(s1, _shift_left(wc1[...], ec1), wc1[...])
            w_c2 = jnp.where(s1, _shift_left(wc2[...], ec2), wc2[...])
            wmu[...] = w_mu
            wc1[...] = w_c1
            wc2[...] = w_c2
            d = sig - w_mu
            sc_b = w_c1 - w_c2 * d * d
            M_prev = cM[...]
            E_prev = cE[...]
            E_m = jnp.where(s1, E_prev, _shift_right(E_prev, NEG_INF))
            M_e = jnp.where(s1, _shift_left(M_prev, NEG_INF), M_prev)
            E_e = jnp.where(s1, _shift_left(E_prev, NEG_INF), E_prev)
            M_new = E_m + sc_b + log_m1
            E_new = jnp.logaddexp(M_e + sc_b, E_e + sc_b + log_e2)
            valid = _validf(jf, bs, bw, N, lower_one=True)
            M_new = jnp.where(valid, M_new, NEG_INF)
            E_new = jnp.where(valid, E_new, NEG_INF)
            cM[...] = M_new
            cE[...] = E_new
            M_out[i] = M_new
            E_out[i] = E_new

        return 0

    jax.lax.fori_loop(0, C, body, 0, unroll=UNROLL)


def _trans_lanes(log_m1, log_e2, Rp: int):
    """Per-read transition lanes for the scal pack (runtime inputs)."""
    full = lambda v: jnp.broadcast_to(
        jnp.asarray(v, jnp.float32), (Rp,))
    return full(log_m1), full(log_e2)


def _fwd_wire(batch: bb.BandedBatch, Rp: int, Tc: int, log_m1, log_e2):
    """Packed row stream + window inits for the forward kernel."""
    R, Tm1 = batch.sig.shape
    T_pad = Tm1 + 1
    B = batch.B
    sig = _pad_reads(batch.sig.astype(jnp.float32), Rp)
    mu_pad = _pad_reads(batch.mu_pad.astype(jnp.float32), Rp)
    c1_pad = _pad_reads(batch.c1_pad.astype(jnp.float32), Rp)
    c2_pad = _pad_reads(batch.c2_pad.astype(jnp.float32), Rp)
    bs_all = _pad_reads(batch.bstart.astype(jnp.int32), Rp)

    # row t uses sig[t-1]: align by prepending one pad entry
    sig_r = jnp.concatenate(
        [jnp.zeros((Rp, 1), jnp.float32), sig,
         jnp.zeros((Rp, Tc - T_pad), jnp.float32)], axis=1)
    s1 = jnp.concatenate(
        [jnp.zeros((Rp, 1), jnp.int32),
         (bs_all[:, 1:] != bs_all[:, :-1]).astype(jnp.int32)], axis=1)
    enter_idx = bs_all + (B - 2 + batch.pad - 1)
    gather = lambda tbl: jnp.take_along_axis(tbl, enter_idx, axis=1)
    e_mu, e_c1, e_c2 = gather(mu_pad), gather(c1_pad), gather(c2_pad)
    w0 = lambda tbl: jax.vmap(
        lambda arr, st: jax.lax.dynamic_slice(arr, (st,), (B,))
    )(tbl, bs_all[:, 0] - 2 + batch.pad)
    w0mu, w0c1, w0c2 = w0(mu_pad), w0(c1_pad), w0(c2_pad)

    pad_t = lambda a: jnp.pad(a, ((0, 0), (0, Tc - T_pad)))
    rows = _pack_rows(sig_r, pad_t(s1), pad_t(e_mu), pad_t(e_c1),
                      pad_t(e_c2), pad_t(bs_all))
    lm, le = _trans_lanes(log_m1, log_e2, Rp)
    scal = _pack_scal(_pad_reads(batch.bw, Rp), _pad_reads(batch.N, Rp),
                      lm, le)
    return rows, scal, w0mu, w0c1, w0c2


def _forward_t(batch: bb.BandedBatch, log_m1: float, log_e2: float,
               interpret: bool = False, return_rows: bool = False):
    """T-major forward: returns (M, E) as (Tc, Rp, B) [+ the packed row
    stream when return_rows — the viterbi/walk passes reuse its s1/bstart
    lanes instead of building their own packs]."""
    R, Tm1 = batch.sig.shape
    T_pad = Tm1 + 1
    B = batch.B
    G = G_BLOCK
    Rp = _round_up(R, G)
    C = CHUNK
    nc = (T_pad + C - 1) // C
    Tc = nc * C
    rows, scal, w0mu, w0c1, w0c2 = _fwd_wire(batch, Rp, Tc, log_m1, log_e2)

    kernel = functools.partial(_fwd_kernel, B=B, C=C, G=G)
    scal_spec = pl.BlockSpec((G, scal.shape[1]), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((C, G, rows.shape[2]), lambda r, c: (c, r, 0),
                             memory_space=pltpu.VMEM)
    w0_spec = pl.BlockSpec((G, B), lambda r, c: (r, 0),
                           memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((C, G, B), lambda r, c: (c, r, 0),
                            memory_space=pltpu.VMEM)
    M, E = pl.pallas_call(
        kernel,
        grid=(Rp // G, nc),
        in_specs=[scal_spec, rows_spec, w0_spec, w0_spec, w0_spec],
        out_specs=(mat_spec, mat_spec),
        out_shape=(
            jax.ShapeDtypeStruct((Tc, Rp, B), jnp.float32),
            jax.ShapeDtypeStruct((Tc, Rp, B), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((G, B), jnp.float32) for _ in range(5)],
        interpret=interpret,
    )(scal, rows, w0mu, w0c1, w0c2)
    if return_rows:
        return M, E, rows
    return M, E


def forward_pallas(batch: bb.BandedBatch, log_m1: float, log_e2: float,
                   interpret: bool = False):
    """(R, T_pad, B) read-major compatibility wrapper."""
    R, Tm1 = batch.sig.shape
    M, E = _forward_t(batch, log_m1, log_e2, interpret)
    return (M.transpose(1, 0, 2)[:R, : Tm1 + 1],
            E.transpose(1, 0, 2)[:R, : Tm1 + 1])


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(scal_ref, rows_ref, w0mu_ref, w0c1_ref, w0c2_ref,
                M_out, E_out, cM, cE, wmu, wc1, wc2, *, B, C, G, nc):
    c = pl.program_id(1)  # chunk counter; chunk c covers rows from the END
    bw = scal_ref[:, 0:1]
    N = scal_ref[:, 1:2]
    T = scal_ref[:, 2:3]
    log_m1 = scal_ref[:, 3:4]    # runtime transitions, as in _fwd_kernel
    log_e2 = scal_ref[:, 4:5]
    jf = _iota_f((1, B), 1)

    @pl.when(c == 0)
    def _():
        cM[...] = jnp.full((G, B), NEG_INF, jnp.float32)
        cE[...] = jnp.full((G, B), NEG_INF, jnp.float32)
        wmu[...] = w0mu_ref[...]
        wc1[...] = w0c1_ref[...]
        wc2[...] = w0c2_ref[...]

    def body(k, _):
        i = C - 1 - k  # in-chunk row, descending
        t = (nc - 1 - c) * C + i
        tf = jnp.float32(1.0) * t
        row = rows_ref[i]
        sig = row[:, 0:1]
        sb = row[:, 1:2] == 1.0
        emu = row[:, 2:3]
        ec1 = row[:, 3:4]
        ec2 = row[:, 4:5]
        bs = row[:, 5:6]
        live = tf < T - 1.0   # (G, 1); per-read T differs within a group
        term = tf == T - 1.0
        upd = sb & live
        w_mu = jnp.where(upd, _shift_right(wmu[...], emu), wmu[...])
        w_c1 = jnp.where(upd, _shift_right(wc1[...], ec1), wc1[...])
        w_c2 = jnp.where(upd, _shift_right(wc2[...], ec2), wc2[...])
        wmu[...] = w_mu
        wc1[...] = w_c1
        wc2[...] = w_c2
        d_b = sig - w_mu
        full_b = w_c1 - w_c2 * d_b * d_b  # window is (G, B+1): sc_b/sc_a
        sc_b = full_b[:, :B]
        sc_a = full_b[:, 1:]
        n = bs + jf - 1.0
        M_next = cM[...]
        E_next = cE[...]
        E_n = jnp.where(sb, _shift_right(E_next, NEG_INF), E_next)
        M_n = jnp.where(sb, M_next, _shift_left(M_next, NEG_INF))
        ext = jnp.where(n + 1.0 < N, M_n + sc_a + log_m1, NEG_INF)
        has_prev = n > 0.0
        M_cmp = jnp.where(has_prev, E_n + sc_b, NEG_INF)
        ext = jnp.where(
            has_prev, jnp.logaddexp(ext, E_n + sc_b + log_e2), ext
        )
        valid = _validf(jf, bs, bw, N, lower_one=False)
        M_cmp = jnp.where(valid, M_cmp, NEG_INF)
        E_cmp = jnp.where(valid, ext, NEG_INF)
        termE = jnp.where(jf == bw + 1.0, 0.0, NEG_INF)
        neg = jnp.full((G, B), NEG_INF, jnp.float32)
        # dead rows (t > T-1) leave the carry untouched
        cM[...] = jnp.where(live, M_cmp, jnp.where(term, neg, cM[...]))
        cE[...] = jnp.where(live, E_cmp, jnp.where(term, termE, cE[...]))
        M_out[i] = jnp.where(live, M_cmp, neg)
        E_out[i] = jnp.where(live, E_cmp, jnp.where(term, termE, neg))
        return 0

    jax.lax.fori_loop(0, C, body, 0, unroll=UNROLL)


def _bwd_wire(batch: bb.BandedBatch, Rp: int, Tc: int, log_m1, log_e2):
    R, Tm1 = batch.sig.shape
    T_pad = Tm1 + 1
    B = batch.B
    sig = _pad_reads(batch.sig.astype(jnp.float32), Rp)
    mu_pad = _pad_reads(batch.mu_pad.astype(jnp.float32), Rp)
    c1_pad = _pad_reads(batch.c1_pad.astype(jnp.float32), Rp)
    c2_pad = _pad_reads(batch.c2_pad.astype(jnp.float32), Rp)
    bs_all = _pad_reads(batch.bstart.astype(jnp.int32), Rp)

    # row t uses sig[t] (zero-based signal); pad tail
    sig_r = jnp.concatenate(
        [sig, jnp.zeros((Rp, Tc - T_pad + 1), jnp.float32)], axis=1)[:, :Tc]
    sb = jnp.concatenate(
        [(bs_all[:, 1:] != bs_all[:, :-1]).astype(jnp.int32),
         jnp.zeros((Rp, 1), jnp.int32)], axis=1)  # shift between t and t+1
    enter_idx = bs_all + (batch.pad - 2)
    gather = lambda tbl: jnp.take_along_axis(tbl, enter_idx, axis=1)
    e_mu, e_c1, e_c2 = gather(mu_pad), gather(c1_pad), gather(c2_pad)
    w0 = lambda tbl: jax.vmap(
        lambda arr, st: jax.lax.dynamic_slice(arr, (st,), (B + 1,))
    )(tbl, bs_all[:, T_pad - 1] - 2 + batch.pad)
    w0mu, w0c1, w0c2 = w0(mu_pad), w0(c1_pad), w0(c2_pad)

    pad_t = lambda a: jnp.pad(a, ((0, 0), (0, Tc - T_pad)))
    rows = _pack_rows(sig_r, pad_t(sb), pad_t(e_mu), pad_t(e_c1),
                      pad_t(e_c2), pad_t(bs_all))
    lm, le = _trans_lanes(log_m1, log_e2, Rp)
    scal = _pack_scal(_pad_reads(batch.bw, Rp), _pad_reads(batch.N, Rp),
                      _pad_reads(batch.T, Rp), lm, le)
    return rows, scal, w0mu, w0c1, w0c2


def _backward_t(batch: bb.BandedBatch, log_m1: float, log_e2: float,
                interpret: bool = False):
    R, Tm1 = batch.sig.shape
    T_pad = Tm1 + 1
    B = batch.B
    G = G_BLOCK
    Rp = _round_up(R, G)
    C = CHUNK
    nc = (T_pad + C - 1) // C
    Tc = nc * C
    rows, scal, w0mu, w0c1, w0c2 = _bwd_wire(batch, Rp, Tc, log_m1, log_e2)

    kernel = functools.partial(_bwd_kernel, B=B, C=C, G=G, nc=nc)
    rev3 = lambda r, c: (nc - 1 - c, r, 0)
    scal_spec = pl.BlockSpec((G, scal.shape[1]), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((C, G, rows.shape[2]), rev3,
                             memory_space=pltpu.VMEM)
    w0_spec = pl.BlockSpec((G, B + 1), lambda r, c: (r, 0),
                           memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((C, G, B), rev3, memory_space=pltpu.VMEM)
    M, E = pl.pallas_call(
        kernel,
        grid=(Rp // G, nc),
        in_specs=[scal_spec, rows_spec, w0_spec, w0_spec, w0_spec],
        out_specs=(mat_spec, mat_spec),
        out_shape=(
            jax.ShapeDtypeStruct((Tc, Rp, B), jnp.float32),
            jax.ShapeDtypeStruct((Tc, Rp, B), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((G, B), jnp.float32) for _ in range(2)]
            + [pltpu.VMEM((G, B + 1), jnp.float32) for _ in range(3)]
        ),
        interpret=interpret,
    )(scal, rows, w0mu, w0c1, w0c2)
    return M, E


def backward_pallas(batch: bb.BandedBatch, log_m1: float, log_e2: float,
                    interpret: bool = False):
    """(R, T_pad, B) read-major compatibility wrapper."""
    R, Tm1 = batch.sig.shape
    M, E = _backward_t(batch, log_m1, log_e2, interpret)
    return (M.transpose(1, 0, 2)[:R, : Tm1 + 1],
            E.transpose(1, 0, 2)[:R, : Tm1 + 1])


# ---------------------------------------------------------------------------
# viterbi
# ---------------------------------------------------------------------------

def _vit_kernel(scal_ref, rows_ref, fm_ref, fe_ref, bm_ref, be_ref,
                ch_out, pm_out, pe_out, cM, cE, *, B, C, G,
                s1_lane=0, bs_lane=1):
    """Fused posterior + Viterbi pass: computes LPM/LPE = for+back-Zb on the
    fly, emits the traceback choice bits and the clipped posterior
    probabilities PM/PE in one streaming read of the four DP tensors."""
    c = pl.program_id(1)
    bw = scal_ref[:, 0:1]
    N = scal_ref[:, 1:2]
    zb = scal_ref[:, 2:3]
    jf = _iota_f((1, B), 1)

    @pl.when(c == 0)
    def _():
        cM[...] = jnp.full((G, B), NEG_INF, jnp.float32)
        cE[...] = jnp.where(jf == bw + 1.0, 0.0, NEG_INF)

    def body(i, _):
        t = c * C + i
        lpm = fm_ref[i] + bm_ref[i] - zb
        lpe = fe_ref[i] + be_ref[i] - zb
        # LOG posteriors are stored; the walk exps the ONE cell per row
        # it visits (2 exps per band cell saved from this pass)
        pm_out[i] = lpm
        pe_out[i] = lpe

        @pl.when(t == 0)
        def _():
            ch_out[i] = jnp.zeros((G, B), jnp.int32)

        @pl.when(t > 0)
        def _():
            row = rows_ref[i]
            s1 = row[:, s1_lane:s1_lane + 1] == 1.0
            bs = row[:, bs_lane:bs_lane + 1]
            M_prev = cM[...]
            E_prev = cE[...]
            E_m = jnp.where(s1, E_prev, _shift_right(E_prev, NEG_INF))
            M_e = jnp.where(s1, _shift_left(M_prev, NEG_INF), M_prev)
            E_e = jnp.where(s1, _shift_left(E_prev, NEG_INF), E_prev)
            M_new = E_m + lpm
            E_new = jnp.maximum(M_e, E_e) + lpe
            valid = _validf(jf, bs, bw, N, lower_one=True)
            M_new = jnp.where(valid, M_new, NEG_INF)
            E_new = jnp.where(valid, E_new, NEG_INF)
            choice = (E_new == (M_e + lpe)).astype(jnp.int32)
            cM[...] = M_new
            cE[...] = E_new
            ch_out[i] = choice

        return 0

    jax.lax.fori_loop(0, C, body, 0, unroll=UNROLL)


def _viterbi_t(fM, fE, bM, bE, Zb, batch: bb.BandedBatch,
               interpret: bool = False, rows=None):
    """T-major viterbi: all mats (Tc, Rp, B); Zb (Rp,). `rows` reuses the
    forward pass's packed row stream (s1 in lane 1, bstart in lane 5)."""
    Tc, Rp, B = fM.shape
    G = G_BLOCK
    C = CHUNK_VIT
    nc = Tc // C
    T_pad = batch.sig.shape[1] + 1
    if rows is None:
        bs_all = _pad_reads(batch.bstart.astype(jnp.int32), Rp)
        s1 = jnp.concatenate(
            [jnp.zeros((Rp, 1), jnp.int32),
             (bs_all[:, 1:] != bs_all[:, :-1]).astype(jnp.int32)], axis=1)
        pad_t = lambda a: jnp.pad(a, ((0, 0), (0, Tc - T_pad)))
        rows = _pack_rows(pad_t(s1), pad_t(bs_all))
        s1_lane, bs_lane = 0, 1
    else:
        s1_lane, bs_lane = 1, 5
    scal = _pack_scal(_pad_reads(batch.bw, Rp), _pad_reads(batch.N, Rp), Zb)

    kernel = functools.partial(_vit_kernel, B=B, C=C, G=G,
                               s1_lane=s1_lane, bs_lane=bs_lane)
    idx3 = lambda r, c: (c, r, 0)
    scal_spec = pl.BlockSpec((G, scal.shape[1]), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((C, G, rows.shape[2]), idx3,
                             memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((C, G, B), idx3, memory_space=pltpu.VMEM)
    ch, PM, PE = pl.pallas_call(
        kernel,
        grid=(Rp // G, nc),
        in_specs=[scal_spec, rows_spec, mat_spec, mat_spec, mat_spec,
                  mat_spec],
        out_specs=(mat_spec, mat_spec, mat_spec),
        out_shape=(
            jax.ShapeDtypeStruct((Tc, Rp, B), jnp.int32),
            jax.ShapeDtypeStruct((Tc, Rp, B), jnp.float32),
            jax.ShapeDtypeStruct((Tc, Rp, B), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((G, B), jnp.float32) for _ in range(2)],
        interpret=interpret,
    )(scal, rows, fM, fE, bM, bE)
    return ch, PM, PE


def viterbi_post_pallas(forM, forE, backM, backE, Zb, batch: bb.BandedBatch,
                        interpret: bool = False):
    """choices + PM + PE from read-major (R, T_pad, B) DP tensors."""
    R, T_pad, B = forM.shape
    G = G_BLOCK
    Rp = _round_up(R, G)
    C = CHUNK_VIT
    Tc = _round_up(T_pad, C)
    tomaj = lambda a: jnp.pad(
        _pad_reads(a.astype(jnp.float32), Rp),
        ((0, 0), (0, Tc - T_pad), (0, 0)), constant_values=NEG_INF,
    ).transpose(1, 0, 2)
    ch, PM, PE = _viterbi_t(
        tomaj(forM), tomaj(forE), tomaj(backM), tomaj(backE),
        _pad_reads(Zb.astype(jnp.float32), Rp), batch, interpret,
    )
    back = lambda a: a.transpose(1, 0, 2)[:R, :T_pad]
    return back(ch).astype(bool), back(PM), back(PE)


# ---------------------------------------------------------------------------
# assembled run
# ---------------------------------------------------------------------------

def banded_batch_run_pallas(batch: bb.BandedBatch, log_m1, log_e2,
                            interpret: bool = False) -> bb.BandedBatchResult:
    """Drop-in fp32 replacement for bb.banded_batch_run using the Mosaic
    kernels for the three wavefront passes (posterior computation fused
    into the Viterbi pass). Read-major result for API compatibility; the
    fused production path is banded_segment_pallas."""
    R, Tm1 = batch.sig.shape
    T_pad = Tm1 + 1
    fM, fE = _forward_t(batch, log_m1, log_e2, interpret)
    bM, bE = _backward_t(batch, log_m1, log_e2, interpret)
    Rp = fM.shape[1]
    rp_iota = jnp.arange(Rp)
    T_p = _pad_reads(batch.T.astype(jnp.int32), Rp)
    bw_p = _pad_reads(batch.bw.astype(jnp.int32), Rp)
    Zf = fE[T_p - 1, rp_iota, bw_p + 1]
    Zb = bE[0, rp_iota, bw_p + 1]
    ch, LPM, LPE = _viterbi_t(fM, fE, bM, bE, Zb, batch, interpret)
    back = lambda a: a.transpose(1, 0, 2)[:R, :T_pad]

    def prob(lp):  # the kernels store LOG posteriors (walk exps 1/row)
        p = jnp.exp(jnp.minimum(lp, 0.0))
        return jnp.where(jnp.isnan(p), 0.0, p)

    return bb.BandedBatchResult(
        Zf=Zf[:R], Zb=Zb[:R], PM=prob(back(LPM)), PE=prob(back(LPE)),
        choices=back(ch).astype(bool),
    )


# ---------------------------------------------------------------------------
# fused forward + posterior + viterbi
# ---------------------------------------------------------------------------

def _fwd_vit_kernel(scal_ref, rows_ref, w0mu_ref, w0c1_ref, w0c2_ref,
                    bm_ref, be_ref, ch_out, pm_out, pe_out, zf_out,
                    cM, cE, vM, vE, wmu, wc1, wc2, zfa, *, B, C, G):
    """Forward recurrence + posterior + Viterbi in ONE streaming pass.

    The backward pass runs first (its t=0 row yields Zb), so the forward
    rows never need to hit HBM at all: each row's fresh M/E feeds the
    posterior (LPM/LPE = fwd+bwd-Zb) and the Viterbi max-recurrence
    immediately (ref: NT_banded.cpp:23-62 fwd + 139-189 Viterbi). This
    drops one full wavefront pass and the fM/fE HBM round-trip (write 2 +
    read 2 tensors) from the production pipeline. Zf is captured in-kernel
    at each read's t = T-1 row (lane bw+1 of E), replacing the XLA gather
    from the materialized fE."""
    c = pl.program_id(1)
    bw = scal_ref[:, 0:1]
    N = scal_ref[:, 1:2]
    T = scal_ref[:, 2:3]
    log_m1 = scal_ref[:, 3:4]
    log_e2 = scal_ref[:, 4:5]
    zb = scal_ref[:, 5:6]
    jf = _iota_f((1, B), 1)
    lane128 = _iota_f((1, 128), 1)

    @pl.when(c == 0)
    def _():
        cM[...] = jnp.full((G, B), NEG_INF, jnp.float32)
        cE[...] = jnp.where(jf == bw + 1.0, 0.0, NEG_INF)
        vM[...] = jnp.full((G, B), NEG_INF, jnp.float32)
        vE[...] = jnp.where(jf == bw + 1.0, 0.0, NEG_INF)
        wmu[...] = w0mu_ref[...]
        wc1[...] = w0c1_ref[...]
        wc2[...] = w0c2_ref[...]
        zfa[...] = jnp.full((G, 128), NEG_INF, jnp.float32)

    def body(i, _):
        t = c * C + i
        tf = jnp.float32(1.0) * t

        @pl.when(t == 0)
        def _():
            pm_out[i] = cM[...] + bm_ref[i] - zb
            pe_out[i] = cE[...] + be_ref[i] - zb
            ch_out[i] = jnp.zeros((G, B), jnp.int32)

        @pl.when(t > 0)
        def _():
            row = rows_ref[i]
            sig = row[:, 0:1]
            s1 = row[:, 1:2] == 1.0
            emu = row[:, 2:3]
            ec1 = row[:, 3:4]
            ec2 = row[:, 4:5]
            bs = row[:, 5:6]
            # forward row (identical to _fwd_kernel)
            w_mu = jnp.where(s1, _shift_left(wmu[...], emu), wmu[...])
            w_c1 = jnp.where(s1, _shift_left(wc1[...], ec1), wc1[...])
            w_c2 = jnp.where(s1, _shift_left(wc2[...], ec2), wc2[...])
            wmu[...] = w_mu
            wc1[...] = w_c1
            wc2[...] = w_c2
            d = sig - w_mu
            sc_b = w_c1 - w_c2 * d * d
            M_prev = cM[...]
            E_prev = cE[...]
            E_m = jnp.where(s1, E_prev, _shift_right(E_prev, NEG_INF))
            M_e = jnp.where(s1, _shift_left(M_prev, NEG_INF), M_prev)
            E_e = jnp.where(s1, _shift_left(E_prev, NEG_INF), E_prev)
            valid = _validf(jf, bs, bw, N, lower_one=True)
            M_new = jnp.where(valid, E_m + sc_b + log_m1, NEG_INF)
            E_new = jnp.where(
                valid, jnp.logaddexp(M_e + sc_b, E_e + sc_b + log_e2),
                NEG_INF)
            cM[...] = M_new
            cE[...] = E_new
            # Zf capture at this read's terminal row
            hit = tf == T - 1.0
            e_term = jnp.sum(jnp.where(jf == bw + 1.0, E_new, 0.0),
                             axis=1, keepdims=True)
            zfa[...] = jnp.where(hit & (lane128 == 0.0), e_term, zfa[...])
            # posterior + viterbi row (identical to _vit_kernel)
            lpm = M_new + bm_ref[i] - zb
            lpe = E_new + be_ref[i] - zb
            # LOG stores (see _vit_kernel): the walk exps at consumption
            pm_out[i] = lpm
            pe_out[i] = lpe
            vM_prev = vM[...]
            vE_prev = vE[...]
            vE_m = jnp.where(s1, vE_prev, _shift_right(vE_prev, NEG_INF))
            vM_e = jnp.where(s1, _shift_left(vM_prev, NEG_INF), vM_prev)
            vE_e = jnp.where(s1, _shift_left(vE_prev, NEG_INF), vE_prev)
            vM_new = vE_m + lpm
            vE_new = jnp.maximum(vM_e, vE_e) + lpe
            vM_new = jnp.where(valid, vM_new, NEG_INF)
            vE_new = jnp.where(valid, vE_new, NEG_INF)
            ch_out[i] = (vE_new == (vM_e + lpe)).astype(jnp.int32)
            vM[...] = vM_new
            vE[...] = vE_new

        return 0

    jax.lax.fori_loop(0, C, body, 0, unroll=UNROLL)
    zf_out[...] = zfa[...]


def _fwd_vit_t(batch: bb.BandedBatch, bM, bE, Zb, log_m1: float,
               log_e2: float, interpret: bool = False):
    """T-major fused fwd+posterior+viterbi: returns (Zf, ch, PM, PE, rows)
    with the packed forward row stream for walk reuse (s1 in lane 1)."""
    R, Tm1 = batch.sig.shape
    T_pad = Tm1 + 1
    B = batch.B
    G = G_BLOCK
    Rp = _round_up(R, G)
    # 5 streamed (C, G, B) tensors (bm, be in; ch, pm, pe out), double
    # buffered: keep them ~10 MB of VMEM
    C = max(8, min(CHUNK, 512 // G))
    Tc_f = bM.shape[0]
    assert Tc_f % C == 0, (Tc_f, C)
    nc = Tc_f // C
    rows, scal0, w0mu, w0c1, w0c2 = _fwd_wire(batch, Rp, Tc_f, log_m1,
                                              log_e2)
    # scal lanes: bw, N, T, m1, e2, zb
    lm, le = _trans_lanes(log_m1, log_e2, Rp)
    scal = _pack_scal(_pad_reads(batch.bw, Rp), _pad_reads(batch.N, Rp),
                      _pad_reads(batch.T, Rp), lm, le,
                      Zb.astype(jnp.float32))

    kernel = functools.partial(_fwd_vit_kernel, B=B, C=C, G=G)
    idx3 = lambda r, c: (c, r, 0)
    scal_spec = pl.BlockSpec((G, scal.shape[1]), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((C, G, rows.shape[2]), idx3,
                             memory_space=pltpu.VMEM)
    w0_spec = pl.BlockSpec((G, B), lambda r, c: (r, 0),
                           memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((C, G, B), idx3, memory_space=pltpu.VMEM)
    zf_spec = pl.BlockSpec((G, 128), lambda r, c: (r, 0),
                           memory_space=pltpu.VMEM)
    ch, PM, PE, zf = pl.pallas_call(
        kernel,
        grid=(Rp // G, nc),
        in_specs=[scal_spec, rows_spec, w0_spec, w0_spec, w0_spec,
                  mat_spec, mat_spec],
        out_specs=(mat_spec, mat_spec, mat_spec, zf_spec),
        out_shape=(
            jax.ShapeDtypeStruct((Tc_f, Rp, B), jnp.int32),
            jax.ShapeDtypeStruct((Tc_f, Rp, B), jnp.float32),
            jax.ShapeDtypeStruct((Tc_f, Rp, B), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 128), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((G, B), jnp.float32) for _ in range(7)]
            + [pltpu.VMEM((G, 128), jnp.float32)]
        ),
        interpret=interpret,
    )(scal, rows, w0mu, w0c1, w0c2, bM, bE)
    return zf[:, 0], ch, PM, PE, rows


# ---------------------------------------------------------------------------
# traceback walk
# ---------------------------------------------------------------------------

def _walk_kernel(scal_ref, rows_ref, pm_ref, pe_ref, ch_ref,
                 out, st, *, B, C, G, nc, n_sentinel, s1_lane=0):
    """Sequential MAP walk (ref: NT_banded.cpp:204-250) as a reverse chunk
    stream over a read group. Carry (n, j, is_m) lives per read in lanes
    0/1/2 of a (G, 128) scratch; the three per-row output streams (visited
    base, path prob, segment-close flag) are packed into lanes 0/1/2 of ONE
    (C, G, 128) block so only a single lane-padded tensor hits HBM."""
    c = pl.program_id(1)
    T = scal_ref[:, 0:1]
    N = scal_ref[:, 1:2]
    bw = scal_ref[:, 2:3]
    jf = _iota_f((1, B), 1)
    lane128 = _iota_f((1, 128), 1)

    @pl.when(c == 0)
    def _():
        st[...] = jnp.where(
            lane128 == 0.0, N - 1.0,
            jnp.where(lane128 == 1.0, bw + 1.0, 0.0),
        )

    def body(k, _):
        i = C - 1 - k
        t = (nc - 1 - c) * C + i
        tf = jnp.float32(1.0) * t
        n = st[:, 0:1]
        j = st[:, 1:2]
        is_m = st[:, 2:3] == 1.0
        active = (tf <= T - 1.0) & (tf >= 1.0) & (n >= 1.0)
        row = rows_ref[i]
        s = row[:, s1_lane:s1_lane + 1]

        mask = jf == j                                  # (G, B)
        pm = jnp.sum(jnp.where(mask, pm_ref[i], 0.0), axis=1, keepdims=True)
        pe = jnp.sum(jnp.where(mask, pe_ref[i], 0.0), axis=1, keepdims=True)
        ch = jnp.sum(jnp.where(mask, ch_ref[i].astype(jnp.float32), 0.0),
                     axis=1, keepdims=True)
        prob_l = jnp.where(is_m, pm, pe)
        prob = jnp.exp(jnp.minimum(prob_l, 0.0))   # clip to <= 1
        prob = jnp.where(jnp.isnan(prob), 0.0, prob)
        close = active & is_m
        out_val = jnp.where(active, n, jnp.float32(n_sentinel))
        out[i] = jnp.where(
            lane128 == 0.0, out_val,
            jnp.where(lane128 == 1.0, prob,
                      jnp.where(lane128 == 2.0, close.astype(jnp.float32),
                                0.0)),
        )

        n_new = jnp.where(close, n - 1.0, n)
        j_new = jnp.where(close, j - 1.0 + s, jnp.where(active, j + s, j))
        m_new = jnp.where(close, 0.0, jnp.where(active, ch, st[:, 2:3]))
        st[...] = jnp.where(
            lane128 == 0.0, n_new,
            jnp.where(lane128 == 1.0, j_new,
                      jnp.where(lane128 == 2.0, m_new, 0.0)),
        )
        return 0

    jax.lax.fori_loop(0, C, body, 0, unroll=UNROLL)


def _walk_t(PM, PE, choices, batch: bb.BandedBatch, N_max: int,
            interpret: bool = False, rows=None):
    """T-major walk over (Tc, Rp, B) tensors; returns per-read (N_max+1,)
    starts and (N_max,) medians, padded-reads included. `rows` reuses the
    forward pass's packed row stream (s1 in lane 1)."""
    Tc, Rp, B = PM.shape
    G = G_BLOCK
    C = CHUNK_WALK
    nc = Tc // C
    T_pad = batch.sig.shape[1] + 1
    if rows is None:
        bs_all = _pad_reads(batch.bstart.astype(jnp.int32), Rp)
        s1 = jnp.concatenate(
            [jnp.zeros((Rp, 1), jnp.int32),
             (bs_all[:, 1:] != bs_all[:, :-1]).astype(jnp.int32)], axis=1)
        rows = _pack_rows(jnp.pad(s1, ((0, 0), (0, Tc - T_pad))))
        s1_lane = 0
    else:
        s1_lane = 1
    scal = _pack_scal(_pad_reads(batch.T, Rp), _pad_reads(batch.N, Rp),
                      _pad_reads(batch.bw, Rp))

    kernel = functools.partial(
        _walk_kernel, B=B, C=C, G=G, nc=nc, n_sentinel=N_max,
        s1_lane=s1_lane,
    )
    rev3 = lambda r, c: (nc - 1 - c, r, 0)
    scal_spec = pl.BlockSpec((G, scal.shape[1]), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((C, G, rows.shape[2]), rev3,
                             memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((C, G, B), rev3, memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((C, G, 128), rev3, memory_space=pltpu.VMEM)
    packed = pl.pallas_call(
        kernel,
        grid=(Rp // G, nc),
        in_specs=[scal_spec, rows_spec, mat_spec, mat_spec, mat_spec],
        out_specs=lane_spec,
        out_shape=jax.ShapeDtypeStruct((Tc, Rp, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G, 128), jnp.float32)],
        interpret=interpret,
    )(scal, rows, PM, PE, choices.astype(jnp.int32))

    path_n = packed[1:T_pad, :, 0].T.astype(jnp.int32)
    path_prob = packed[1:T_pad, :, 1].T
    closes = packed[1:T_pad, :, 2].T != 0.0
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


def walk_pallas(PM, PE, choices, batch: bb.BandedBatch, N_max: int,
                interpret: bool = False):
    """Device walk + grouped medians from read-major (R, T_pad, B) inputs;
    same outputs as nt_banded_device._walk_single."""
    R, T_pad, B = PM.shape
    G = G_BLOCK
    Rp = _round_up(R, G)
    C = CHUNK_WALK
    Tc = _round_up(T_pad, C)
    tomaj = lambda a, v: jnp.pad(
        _pad_reads(a, Rp), ((0, 0), (0, Tc - T_pad), (0, 0)),
        constant_values=v,
    ).transpose(1, 0, 2)
    starts, med = _walk_t(
        tomaj(PM.astype(jnp.float32), 0.0), tomaj(PE.astype(jnp.float32), 0.0),
        tomaj(choices.astype(jnp.int32), 0), batch, N_max, interpret,
    )
    return starts[:R], med[:R]


def banded_segment_pallas(batch: bb.BandedBatch, N_max: int, log_m1, log_e2,
                          interpret: bool = False):
    """Fused production entry: THREE wavefront passes (bwd -> fused
    fwd+posterior+viterbi -> walk), T-major end to end. The backward pass
    runs first so Zb is available to normalize posteriors inside the
    fused pass; the forward DP tensors never materialize in HBM.
    Returns (Zf, Zb, starts, medians)."""
    R = batch.sig.shape[0]
    bM, bE = _backward_t(batch, log_m1, log_e2, interpret)
    Tc, Rp, B = bM.shape
    rp_iota = jnp.arange(Rp)
    bw_p = _pad_reads(batch.bw.astype(jnp.int32), Rp)
    Zb = bE[0, rp_iota, bw_p + 1]
    Zf, ch, PM, PE, rows = _fwd_vit_t(batch, bM, bE, Zb, log_m1, log_e2,
                                      interpret)
    starts, medians = _walk_t(PM, PE, ch, batch, N_max, interpret, rows=rows)
    return Zf[:R], Zb[:R], starts[:R], medians[:R]
