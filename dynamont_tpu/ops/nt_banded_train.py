"""Fast banded Baum-Welch training: Pallas transitions + MXU emission stats.

The exact-parity path (`ops/nt_banded_batch.banded_batch_train`, ref:
src/cpp/NT_banded.cpp:303-451) is scan-based and spends almost all of its
device time in two places that map terribly onto the TPU:

  * re-gathering the banded emission-score windows for the m1/e2
    transition terms (two (T, B) dynamic-slice sweeps -> ~6 s/24 reads),
  * scatter-adding (T, B) posterior weights into per-position sums
    (~160 M scattered elements -> ~4 s/24 reads).

This module replaces both with TPU-native formulations while keeping the
scan path byte-compatible as the fallback/parity oracle:

  1. `transitions_pallas` — a Mosaic kernel in the style of
     `nt_banded_pallas._fwd_kernel`: it re-derives the banded emission
     scores from a sliding (G, B) model window held in scratch (band
     start moves by at most one position per row, so the window advances
     with a lane shift + one entering element from the row pack), reads
     the forward-E / shifted backward rows chunk-by-chunk, and folds the
     m1/e2 numerator terms into running (G, B) logaddexp accumulators.
     No (T, B) score tensor ever exists.

  2. `emission_position_sums` — the posterior-weight -> per-position
     reduction recast as matmuls: for one read, sum_t w[t, j] * [bstart
     [t] == v] is a (B, T) x (T, V) product against the one-hot of the
     band-start sequence, computed on the MXU at full fp32 precision.
     The (B, V) result is then collapsed along anti-diagonals
     (n = v + j - 1) with the pad/flatten/reshape shear trick — a pure
     reshape, no gather/scatter.  Three channels (w, w*y, w*y^2 with y
     the per-read-centred signal) yield the weighted moment sums, and
     the per-k-mer reduction is a one-hot matmul over k-mer ids.

Numerics: all matmuls run at `Precision.HIGHEST`; the squared channel is
centred on the per-read signal mean so fp32 cancellation stays ~1e-5
relative.  Parity vs the scan path is covered by tests/test_train_fast.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamont_tpu.ops import nt_banded_batch as bb
from dynamont_tpu.ops.nt_banded_pallas import (
    G_BLOCK,
    NEG_INF,
    _forward_t,
    _iota_f,
    _pack_rows,
    _pack_scal,
    _pad_reads,
    _round_up,
    _shift_left,
    _shift_right,
    _trans_lanes,
    _validf,
)

CHUNK_TRAIN = 128
SUB_TRAIN = 8    # rows per sub-accumulator (see _train_trans_kernel)
PREC = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# fused backward + transition-parameter kernel (newM1 / newE2 numerators)
# ---------------------------------------------------------------------------

def _fold_online(max_ref, sum_ref, chunk_log):
    """Fold a log-space chunk accumulator into a running ONLINE
    logsumexp (per-lane max + exp-sum): rescale by exp(old_max -
    new_max) — ~1 ulp of relative error per fold instead of a log-space
    logaddexp chain."""
    m_old = max_ref[...]
    m_new = jnp.maximum(m_old, chunk_log)
    live = m_new > -1e30
    scale = jnp.where(live, jnp.exp(m_old - jnp.where(live, m_new, 0.0)),
                      0.0)
    add = jnp.where(chunk_log > -1e30,
                    jnp.exp(chunk_log - jnp.where(live, m_new, 0.0)), 0.0)
    max_ref[...] = m_new
    sum_ref[...] = sum_ref[...] * scale + add


def _bwd_train_kernel(scal_ref, rows_ref, w0mu_ref, w0c1_ref, w0c2_ref,
                      fe_ref, M_out, E_out, accM1_ref, accE2_ref,
                      accM1e_ref, accE2e_ref, cM, cE, wmu, wc1, wc2,
                      cm1, ce2, sm1, se2, *, B, C, G, nc):
    """nt_banded_pallas._bwd_kernel + fused m1/e2 accumulation.

    The m1/e2 numerator terms (ref: NT_banded.cpp:303-371) at row t are
    forE[t] + log_a + score + shifted-backward[t+1] — and this kernel
    HOLDS backward row t+1 in scratch (cM/cE before the update) and has
    just computed the very sc_a/sc_b scores the terms need, so the
    accumulation rides the backward pass for one streamed fe input
    instead of a separate full pass re-deriving the window. Row lane 6
    carries the QUIRKED next-shift flag (the reference's t = T-2
    tracker bug compares against row 0, NT_banded.cpp:309), used only
    by the accumulation; the recurrence keeps the true shift.

    Accumulation: 8-row sub-accs -> per-chunk log acc -> online
    exp-space fold (see _fold_online); error scales with SUB + C/SUB.
    """
    c = pl.program_id(1)  # chunk counter; chunk c covers rows from the END
    bw = scal_ref[:, 0:1]
    N = scal_ref[:, 1:2]
    T = scal_ref[:, 2:3]
    log_m1 = scal_ref[:, 3:4]
    log_e2 = scal_ref[:, 4:5]
    jf = _iota_f((1, B), 1)

    @pl.when(c == 0)
    def _():
        cM[...] = jnp.full((G, B), NEG_INF, jnp.float32)
        cE[...] = jnp.full((G, B), NEG_INF, jnp.float32)
        wmu[...] = w0mu_ref[...]
        wc1[...] = w0c1_ref[...]
        wc2[...] = w0c2_ref[...]
        accM1_ref[...] = jnp.full((G, B), NEG_INF, jnp.float32)
        accE2_ref[...] = jnp.full((G, B), NEG_INF, jnp.float32)
        accM1e_ref[...] = jnp.zeros((G, B), jnp.float32)
        accE2e_ref[...] = jnp.zeros((G, B), jnp.float32)

    cm1[...] = jnp.full((G, B), NEG_INF, jnp.float32)
    ce2[...] = jnp.full((G, B), NEG_INF, jnp.float32)
    sm1[...] = jnp.full((G, B), NEG_INF, jnp.float32)
    se2[...] = jnp.full((G, B), NEG_INF, jnp.float32)

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
        snq = row[:, 6:7] == 1.0
        live = tf < T - 1.0
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

        # ---- fused m1/e2 terms (backward rows t+1 = M_next/E_next) ----
        fE = fe_ref[i]
        bMq = jnp.where(snq, M_next, _shift_left(M_next, NEG_INF))
        bEq = jnp.where(snq, _shift_right(E_next, NEG_INF), E_next)
        m1_t = jnp.where(live & (n + 1.0 < N),
                         fE + log_m1 + sc_a + bMq, NEG_INF)
        e2_t = jnp.where(live & (n > 0.0),
                         fE + log_e2 + sc_b + bEq, NEG_INF)
        sm1[...] = jnp.logaddexp(sm1[...], m1_t)
        se2[...] = jnp.logaddexp(se2[...], e2_t)

        @pl.when(k % SUB_TRAIN == SUB_TRAIN - 1)
        def _():
            cm1[...] = jnp.logaddexp(cm1[...], sm1[...])
            ce2[...] = jnp.logaddexp(ce2[...], se2[...])
            sm1[...] = jnp.full((G, B), NEG_INF, jnp.float32)
            se2[...] = jnp.full((G, B), NEG_INF, jnp.float32)

        # ---- backward recurrence (identical to _bwd_kernel) ----
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
        cM[...] = jnp.where(live, M_cmp, jnp.where(term, neg, cM[...]))
        cE[...] = jnp.where(live, E_cmp, jnp.where(term, termE, cE[...]))
        M_out[i] = jnp.where(live, M_cmp, neg)
        E_out[i] = jnp.where(live, E_cmp, jnp.where(term, termE, neg))
        return 0

    jax.lax.fori_loop(0, C, body, 0)
    _fold_online(accM1_ref, accM1e_ref, cm1[...])
    _fold_online(accE2_ref, accE2e_ref, ce2[...])


def _bwd_train_wire(batch: bb.BandedBatch, Rp: int, Tc: int, log_m1,
                    log_e2):
    """_bwd_wire + the quirked next-shift lane (see _bwd_train_kernel)."""
    R, Tm1 = batch.sig.shape
    T_pad = Tm1 + 1
    B = batch.B
    sig = _pad_reads(batch.sig.astype(jnp.float32), Rp)
    mu_pad = _pad_reads(batch.mu_pad.astype(jnp.float32), Rp)
    c1_pad = _pad_reads(batch.c1_pad.astype(jnp.float32), Rp)
    c2_pad = _pad_reads(batch.c2_pad.astype(jnp.float32), Rp)
    bs_all = _pad_reads(batch.bstart.astype(jnp.int32), Rp)
    T_r = _pad_reads(batch.T.astype(jnp.int32), Rp)

    sig_r = jnp.concatenate(
        [sig, jnp.zeros((Rp, Tc - T_pad + 1), jnp.float32)], axis=1)[:, :Tc]
    sb = jnp.concatenate(
        [(bs_all[:, 1:] != bs_all[:, :-1]).astype(jnp.int32),
         jnp.zeros((Rp, 1), jnp.int32)], axis=1)  # shift between t and t+1
    # reference tracker bug: at t = T-2 the shift compares against row 0
    idx_last = jnp.clip(T_r - 2, 0, T_pad - 1)[:, None]
    s_last = (jnp.take_along_axis(bs_all, idx_last, axis=1)
              != bs_all[:, :1]).astype(jnp.int32)
    t_ar = jnp.arange(T_pad)[None, :]
    snq = jnp.where(t_ar == (T_r[:, None] - 2), s_last, sb)

    enter_idx = bs_all + (batch.pad - 2)
    gather = lambda tbl: jnp.take_along_axis(tbl, enter_idx, axis=1)
    e_mu, e_c1, e_c2 = gather(mu_pad), gather(c1_pad), gather(c2_pad)
    w0 = lambda tbl: jax.vmap(
        lambda arr, st: jax.lax.dynamic_slice(arr, (st,), (B + 1,))
    )(tbl, bs_all[:, T_pad - 1] - 2 + batch.pad)
    w0mu, w0c1, w0c2 = w0(mu_pad), w0(c1_pad), w0(c2_pad)

    pad_t = lambda a: jnp.pad(a, ((0, 0), (0, Tc - T_pad)))
    rows = _pack_rows(sig_r, pad_t(sb), pad_t(e_mu), pad_t(e_c1),
                      pad_t(e_c2), pad_t(bs_all), pad_t(snq))
    lm, le = _trans_lanes(log_m1, log_e2, Rp)
    scal = _pack_scal(_pad_reads(batch.bw, Rp), _pad_reads(batch.N, Rp),
                      _pad_reads(batch.T, Rp), lm, le)
    return rows, scal, w0mu, w0c1, w0c2


def backward_transitions_pallas(batch: bb.BandedBatch, forE, log_m1,
                                log_e2, interpret: bool = False):
    """Fused backward + m1/e2 accumulation: returns (backM, backE,
    rawM1, rawE2) with the raw per-read log numerators normalized like
    the scan path outside."""
    R, Tm1 = batch.sig.shape
    T_pad = Tm1 + 1
    B = batch.B
    G = G_BLOCK
    Rp = _round_up(R, G)
    C = CHUNK_TRAIN
    nc = (T_pad + C - 1) // C
    Tc = nc * C
    if forE.shape != (Tc, Rp, B):
        raise ValueError(f"forE shape {forE.shape} != {(Tc, Rp, B)}")
    rows, scal, w0mu, w0c1, w0c2 = _bwd_train_wire(batch, Rp, Tc, log_m1,
                                                   log_e2)

    kernel = functools.partial(_bwd_train_kernel, B=B, C=C, G=G, nc=nc)
    rev3 = lambda r, c: (nc - 1 - c, r, 0)
    scal_spec = pl.BlockSpec((G, scal.shape[1]), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((C, G, rows.shape[2]), rev3,
                             memory_space=pltpu.VMEM)
    w0_spec = pl.BlockSpec((G, B + 1), lambda r, c: (r, 0),
                           memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((C, G, B), rev3, memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((G, B), lambda r, c: (r, 0),
                            memory_space=pltpu.VMEM)
    M, E, accM1, accE2, accM1e, accE2e = pl.pallas_call(
        kernel,
        grid=(Rp // G, nc),
        in_specs=[scal_spec, rows_spec, w0_spec, w0_spec, w0_spec,
                  mat_spec],
        out_specs=(mat_spec, mat_spec, acc_spec, acc_spec, acc_spec,
                   acc_spec),
        out_shape=(
            jax.ShapeDtypeStruct((Tc, Rp, B), jnp.float32),
            jax.ShapeDtypeStruct((Tc, Rp, B), jnp.float32),
            jax.ShapeDtypeStruct((Rp, B), jnp.float32),
            jax.ShapeDtypeStruct((Rp, B), jnp.float32),
            jax.ShapeDtypeStruct((Rp, B), jnp.float32),
            jax.ShapeDtypeStruct((Rp, B), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((G, B), jnp.float32) for _ in range(2)]
            + [pltpu.VMEM((G, B + 1), jnp.float32) for _ in range(3)]
            + [pltpu.VMEM((G, B), jnp.float32) for _ in range(4)]
        ),
        # streamed fe + M/E blocks at C=128, G=16 exceed the 16 MB
        # default scoped-vmem limit (v5e has 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(scal, rows, w0mu, w0c1, w0c2, forE)

    def _lse(mx, es):
        # per-lane log value from the online (max, exp-sum) pair, then
        # one exact exp-space reduce over the band per read
        acc = jnp.where(es > 0.0, mx + jnp.log(jnp.where(es > 0.0, es, 1.0)),
                        NEG_INF)
        m = jnp.max(acc, axis=1)
        safe = jnp.where(jnp.isfinite(m), m, 0.0)
        ssum = jnp.log(jnp.sum(jnp.exp(acc - safe[:, None]), axis=1))
        return jnp.where(jnp.isfinite(m), ssum + safe, m)

    return M, E, _lse(accM1, accM1e)[:R], _lse(accE2, accE2e)[:R]


# ---------------------------------------------------------------------------
# emission statistics on the MXU
# ---------------------------------------------------------------------------

def emission_position_sums(batch: bb.BandedBatch, forM, forE, backM, backE,
                           Zb, N_stat: int):
    """Per-position posterior-weight moment sums (norm, w*y, w*y^2).

    Returns (norm, wy, wy2, s0): each (R, N_stat), s0 (R,) the per-read
    signal mean the y channel is centred on.  Equivalent to the scan
    path's scatter-adds (ref trainEmission gather, NT_banded.cpp:374-451)
    but as one-hot matmuls + an anti-diagonal shear per read.
    """
    R, Tm1 = batch.sig.shape
    T_pad = Tm1 + 1
    B = batch.B
    Tc = forM.shape[0]
    # band starts can be negative (the band hangs below position 0 near
    # t=0); shift them by B so the one-hot axis covers [-B, N_stat+1]
    V = N_stat + B + 2

    T_f = batch.T.astype(jnp.float32)
    denom = jnp.maximum(T_f - 1.0, 1.0)
    s0 = jnp.sum(batch.sig.astype(jnp.float32), axis=1) / denom

    bs_pad = jnp.pad(batch.bstart, ((0, 0), (0, Tc - T_pad)))
    sig_rows = jnp.pad(batch.sig.astype(jnp.float32),
                       ((0, 0), (1, Tc - T_pad)))  # row t holds sig[t-1]

    t_ar = jnp.arange(Tc)
    jf = jnp.arange(B, dtype=jnp.float32)[None, :]

    def per_read(r):
        sl = lambda a: jax.lax.dynamic_slice(
            a, (0, r, 0), (Tc, 1, B))[:, 0, :]
        fM_r, fE_r, bM_r, bE_r = sl(forM), sl(forE), sl(backM), sl(backE)
        Zb_r = Zb[r]
        bs_r = bs_pad[r]
        w = jnp.exp(fM_r + bM_r - Zb_r) + jnp.exp(fE_r + bE_r - Zb_r)
        n_f = bs_r[:, None].astype(jnp.float32) - 1.0 + jf
        N_f = batch.N[r].astype(jnp.float32)
        valid = ((t_ar[:, None] >= 1) & (t_ar[:, None] < batch.T[r])
                 & (n_f >= 0.0) & (n_f < N_f))
        w = jnp.where(valid, w, 0.0)
        w = jnp.nan_to_num(w, nan=0.0, posinf=0.0)
        y = (sig_rows[r] - s0[r])[:, None]
        ch = jnp.stack([w, w * y, w * y * y], axis=0)      # (3, Tc, B)
        S = jax.nn.one_hot(bs_r + B, V, dtype=jnp.float32)  # (Tc, V)
        M = jnp.einsum("ktb,tv->kbv", ch, S, precision=PREC)
        # anti-diagonal shear: q[p] = sum_j M[j, p-j]; n = (v-B) - 1 + j
        # = p - B - 1, so position n lives at q[n + B + 1]
        Mp = jnp.pad(M, ((0, 0), (0, 0), (0, B)))           # (3, B, V+B)
        flat = Mp.reshape(3, B * (V + B))[:, : B * (V + B - 1)]
        q = flat.reshape(3, B, V + B - 1).sum(axis=1)       # (3, V+B-1)
        return q[:, B + 1 : B + 1 + N_stat]

    sums = jax.lax.map(per_read, jnp.arange(R))             # (R, 3, N_stat)
    return sums[:, 0], sums[:, 1], sums[:, 2], s0


def _kmer_reduce(vals, kid_pad, pos_live, num_kmers):
    """sum over positions of vals grouped by k-mer id, via one-hot matmul.
    vals: (R, N_stat-1) aligned with kid_pad; returns (R, K)."""
    oh = jax.nn.one_hot(kid_pad, num_kmers, dtype=vals.dtype)
    oh = oh * pos_live[..., None].astype(vals.dtype)
    return jnp.einsum("rn,rnk->rk", vals, oh, precision=PREC)


def banded_batch_train_fast(batch: bb.BandedBatch, log_m1, log_e2,
                            kmer_ids_pad, num_kmers,
                            interpret: bool | None = None
                            ) -> bb.BandedTrainResult:
    """TPU-native equivalent of `banded_batch_train` (fp32).

    Pallas forward/backward DP, the transitions kernel for m1/e2, and
    MXU emission stats.  Matches the scan path to ~1e-4 relative
    (fp32 reassociation); the scan path remains the parity oracle.

    Jitted with the transitions as traced arguments: successive training
    batches with updated m1/e2 (and bucketed shapes) reuse the compile.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
        if interpret:
            import warnings

            warnings.warn(
                "banded_batch_train_fast: no TPU backend — the Mosaic "
                "kernels run in (slow) interpret mode. Use the fp64 scan "
                "path (Trainer precision='fp64'/'auto') off-TPU.",
                RuntimeWarning, stacklevel=2,
            )
    return _train_fast_jit(
        batch.sig, batch.mu_pad, batch.c1_pad, batch.c2_pad, batch.bstart,
        batch.T, batch.N, batch.bw, kmer_ids_pad,
        jnp.asarray(log_m1, jnp.float32), jnp.asarray(log_e2, jnp.float32),
        pad=batch.pad, B=batch.B, num_kmers=int(num_kmers),
        interpret=bool(interpret),
    )


@functools.partial(jax.jit,
                   static_argnames=("pad", "B", "num_kmers", "interpret"))
def _train_fast_jit(sig, mu_pad, c1_pad, c2_pad, bstart, T, N, bw,
                    kmer_ids_pad, log_m1, log_e2, *, pad, B, num_kmers,
                    interpret):
    batch = bb.BandedBatch(sig, mu_pad, c1_pad, c2_pad, bstart, T, N, bw,
                           pad, B)
    return _banded_batch_train_fast_impl(batch, log_m1, log_e2,
                                         kmer_ids_pad, num_kmers, interpret)


def _banded_batch_train_fast_impl(batch, log_m1, log_e2, kmer_ids_pad,
                                  num_kmers, interpret):
    R, Tm1 = batch.sig.shape
    B = batch.B
    forM, forE = _forward_t(batch, log_m1, log_e2, interpret=interpret)
    backM, backE, rawM1, rawE2 = backward_transitions_pallas(
        batch, forE, log_m1, log_e2, interpret=interpret)

    r_ar = jnp.arange(R)
    ctr = batch.bw + 1
    Zf = forE[batch.T - 1, r_ar, ctr]
    Zb = backE[jnp.zeros_like(r_ar), r_ar, ctr]
    # the fused kernel already adds log_m1/log_e2 to every term (they
    # ride the scal lanes its recurrence itself consumes)
    newM1 = rawM1
    newE2 = rawE2
    Ae = jnp.logaddexp(newE2, newM1)
    fin = jnp.isfinite(Ae)
    newM1 = jnp.where(fin, newM1 - Ae, newM1)
    newE2 = jnp.where(fin, newE2 - Ae, newE2)

    N_stat = kmer_ids_pad.shape[1] + 1
    Zb_pad = jnp.concatenate(
        [Zb, jnp.zeros(forM.shape[1] - R, Zb.dtype)]) if forM.shape[1] > R \
        else Zb
    norm, wy, wy2, s0 = emission_position_sums(
        batch, forM, forE, backM, backE, Zb_pad, N_stat)

    has = norm > 0
    safe_norm = jnp.where(has, norm, 1.0)
    pos_mean = jnp.where(has, s0[:, None] + wy / safe_norm, 0.0)

    pos_live = jnp.arange(N_stat - 1)[None, :] < (batch.N[:, None] - 1)
    counts = _kmer_reduce(jnp.ones_like(kmer_ids_pad, jnp.float32),
                          kmer_ids_pad, pos_live, num_kmers)
    safe_counts = jnp.where(counts > 0, counts, 1.0)
    means = _kmer_reduce(pos_mean[:, 1:], kmer_ids_pad, pos_live,
                         num_kmers) / safe_counts

    # variance about the NEW k-mer means, recombined per position:
    # sum w*(sig-mb)^2 = wy2 - 2*mbc*wy + mbc^2*norm with mbc = mb - s0
    mb_rest = jnp.take_along_axis(means, kmer_ids_pad, axis=1)
    mean_by_pos = jnp.concatenate(
        [jnp.zeros((R, 1), means.dtype), mb_rest], axis=1)
    mbc = mean_by_pos - s0[:, None]
    var_sum = jnp.maximum(wy2 - 2.0 * mbc * wy + mbc * mbc * norm, 0.0)
    pos_var = jnp.where(has, var_sum / safe_norm, 0.0)
    stdevs = jnp.sqrt(
        _kmer_reduce(pos_var[:, 1:], kmer_ids_pad, pos_live, num_kmers)
        / safe_counts)
    kmer_mask = (counts > 0) & (stdevs > 0)

    return bb.BandedTrainResult(
        Zf=Zf, Zb=Zb, m1=jnp.exp(newM1), e2=jnp.exp(newE2),
        means=means, stdevs=stdevs, kmer_mask=kmer_mask,
    )
