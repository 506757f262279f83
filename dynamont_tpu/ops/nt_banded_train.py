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
    _backward_t,
    _forward_t,
    _iota_f,
    _pack_rows,
    _pack_scal,
    _pad_reads,
    _round_up,
    _shift_left,
    _shift_right,
)

CHUNK_TRAIN = 128
SUB_TRAIN = 8    # rows per sub-accumulator (see _train_trans_kernel)
PREC = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# transition-parameter kernel (newM1 / newE2 numerators)
# ---------------------------------------------------------------------------

def _train_trans_kernel(scal_ref, rows_ref, fe_ref, bm_ref, be_ref,
                        w0mu_ref, w0c1_ref, w0c2_ref,
                        accM1_ref, accE2_ref, accM1e_ref, accE2e_ref,
                        wmu, wc1, wc2, cm1, ce2,
                        sm1, se2, *, B, C, G, log_m1, log_e2):
    """Accumulate the m1/e2 logsumexp terms (ref: NT_banded.cpp:303-371).

    Row t contributes forE[t] + log_a + score + shifted-backward[t+1];
    scores at position n (sc_a) and n-1 (sc_b) come from the sliding
    model window (offset -2, exactly the forward kernel's window; sc_a
    is its left-shift with one entering element from the row pack).
    """
    c = pl.program_id(1)
    bw = scal_ref[:, 0:1]
    N = scal_ref[:, 1:2]
    Tr = scal_ref[:, 2:3]
    jf = _iota_f((1, B), 1)

    @pl.when(c == 0)
    def _():
        # running ONLINE logsumexp per lane: max in accM1/accE2, exp-sum
        # (relative to that max) in accM1e/accE2e
        accM1_ref[...] = jnp.full((G, B), NEG_INF, jnp.float32)
        accE2_ref[...] = jnp.full((G, B), NEG_INF, jnp.float32)
        accM1e_ref[...] = jnp.zeros((G, B), jnp.float32)
        accE2e_ref[...] = jnp.zeros((G, B), jnp.float32)
        wmu[...] = w0mu_ref[...]
        wc1[...] = w0c1_ref[...]
        wc2[...] = w0c2_ref[...]

    # three-level accumulation: rows fold into an 8-row SUB-accumulator
    # (log space), sub-accs fold into the chunk accumulator (log space),
    # chunks fold into the running total ONLINE in exp space (rescale by
    # exp(old_max - new_max): ~1 ulp of relative error per chunk instead
    # of a log-space logaddexp chain). Sequential log-space error scales
    # with SUB + C/SUB instead of C + nc (fp32 m1/e2 drift at 24x16k:
    # ~4e-3 two-level -> ~2e-4).
    cm1[...] = jnp.full((G, B), NEG_INF, jnp.float32)
    ce2[...] = jnp.full((G, B), NEG_INF, jnp.float32)
    sm1[...] = jnp.full((G, B), NEG_INF, jnp.float32)
    se2[...] = jnp.full((G, B), NEG_INF, jnp.float32)

    def body(i, _):
        t = c * C + i
        row = rows_ref[i]                      # (G, 10)
        sig = row[:, 0:1]
        s1 = row[:, 1:2] == 1.0                # window shift at row t
        s_next = row[:, 2:3] == 1.0            # band shift between t, t+1
        emu = row[:, 3:4]
        ec1 = row[:, 4:5]
        ec2 = row[:, 5:6]
        eamu = row[:, 6:7]
        eac1 = row[:, 7:8]
        eac2 = row[:, 8:9]
        bs = row[:, 9:10]
        w_mu = jnp.where(s1, _shift_left(wmu[...], emu), wmu[...])
        w_c1 = jnp.where(s1, _shift_left(wc1[...], ec1), wc1[...])
        w_c2 = jnp.where(s1, _shift_left(wc2[...], ec2), wc2[...])
        wmu[...] = w_mu
        wc1[...] = w_c1
        wc2[...] = w_c2
        d = sig - w_mu
        sc_b = w_c1 - w_c2 * d * d             # score at position n-1
        da = sig - eamu
        fill_a = eac1 - eac2 * da * da
        sc_a = _shift_left(sc_b, fill_a)       # score at position n
        fE = fe_ref[i]
        bM_next = bm_ref[i]                    # backM[t+1] (pre-shifted wire)
        bE_next = be_ref[i]
        bM_sh = jnp.where(s_next, bM_next, _shift_left(bM_next, NEG_INF))
        bE_sh = jnp.where(s_next, _shift_right(bE_next, NEG_INF), bE_next)
        nf = bs - 1.0 + jf                     # (G, B) absolute position
        live = t.astype(jnp.float32) < Tr - 1.0  # (G, 1)
        m1_t = jnp.where(live & (nf + 1.0 < N),
                         fE + log_m1 + sc_a + bM_sh, NEG_INF)
        e2_t = jnp.where(live & (nf > 0.0),
                         fE + log_e2 + sc_b + bE_sh, NEG_INF)
        sm1[...] = jnp.logaddexp(sm1[...], m1_t)
        se2[...] = jnp.logaddexp(se2[...], e2_t)

        @pl.when(i % SUB_TRAIN == SUB_TRAIN - 1)
        def _():
            cm1[...] = jnp.logaddexp(cm1[...], sm1[...])
            ce2[...] = jnp.logaddexp(ce2[...], se2[...])
            sm1[...] = jnp.full((G, B), NEG_INF, jnp.float32)
            se2[...] = jnp.full((G, B), NEG_INF, jnp.float32)

        return 0

    jax.lax.fori_loop(0, C, body, 0)

    def fold_online(max_ref, sum_ref, chunk_log):
        m_old = max_ref[...]
        m_new = jnp.maximum(m_old, chunk_log)
        live = m_new > -1e30
        scale = jnp.where(live, jnp.exp(m_old - jnp.where(live, m_new, 0.0)),
                          0.0)
        add = jnp.where(chunk_log > -1e30,
                        jnp.exp(chunk_log - jnp.where(live, m_new, 0.0)), 0.0)
        max_ref[...] = m_new
        sum_ref[...] = sum_ref[...] * scale + add

    fold_online(accM1_ref, accM1e_ref, cm1[...])
    fold_online(accE2_ref, accE2e_ref, ce2[...])
    del bw  # band validity is already encoded in the NEG_INF rows


def _train_trans_wire(batch: bb.BandedBatch, Rp: int, Tc: int):
    """Row pack for the transitions kernel: signal aligned so row t holds
    sig[t] (the sample emitted on the t -> t+1 transition), window-shift
    and next-row band-shift flags (incl. the reference's t = T-2 tracker
    quirk, ref NT_banded.cpp:309), window-entering model values for
    offsets -2 (window advance) and -1+B-1 (sc_a fill), and bstart."""
    R, Tm1 = batch.sig.shape
    T_pad = Tm1 + 1
    B = batch.B
    sig = _pad_reads(batch.sig.astype(jnp.float32), Rp)
    mu_pad = _pad_reads(batch.mu_pad.astype(jnp.float32), Rp)
    c1_pad = _pad_reads(batch.c1_pad.astype(jnp.float32), Rp)
    c2_pad = _pad_reads(batch.c2_pad.astype(jnp.float32), Rp)
    bs_all = _pad_reads(batch.bstart.astype(jnp.int32), Rp)
    T_r = _pad_reads(batch.T.astype(jnp.int32), Rp)

    # row t uses sig[t] directly (train terms index signal by source row)
    sig_r = jnp.concatenate(
        [sig, jnp.zeros((Rp, Tc - T_pad + 1), jnp.float32)], axis=1)[:, :Tc]
    s1 = jnp.concatenate(
        [jnp.zeros((Rp, 1), jnp.int32),
         (bs_all[:, 1:] != bs_all[:, :-1]).astype(jnp.int32)], axis=1)
    sn = jnp.concatenate(
        [(bs_all[:, 1:] != bs_all[:, :-1]).astype(jnp.int32),
         jnp.zeros((Rp, 1), jnp.int32)], axis=1)
    # reference tracker bug: at t = T-2 the shift compares against row 0
    idx_last = jnp.clip(T_r - 2, 0, T_pad - 1)[:, None]
    s_last = (jnp.take_along_axis(bs_all, idx_last, axis=1)
              != bs_all[:, :1]).astype(jnp.int32)
    t_ar = jnp.arange(T_pad)[None, :]
    sn = jnp.where(t_ar == (T_r[:, None] - 2), s_last, sn)

    enter_b = bs_all + (B + batch.pad - 3)     # window-advance element
    enter_a = bs_all + (B + batch.pad - 2)     # sc_a fill element
    gat = lambda tbl, idx: jnp.take_along_axis(tbl, idx, axis=1)
    e_mu, e_c1, e_c2 = (gat(mu_pad, enter_b), gat(c1_pad, enter_b),
                        gat(c2_pad, enter_b))
    ea_mu, ea_c1, ea_c2 = (gat(mu_pad, enter_a), gat(c1_pad, enter_a),
                           gat(c2_pad, enter_a))
    w0 = lambda tbl: jax.vmap(
        lambda arr, st: jax.lax.dynamic_slice(arr, (st,), (B,))
    )(tbl, bs_all[:, 0] - 2 + batch.pad)
    w0mu, w0c1, w0c2 = w0(mu_pad), w0(c1_pad), w0(c2_pad)

    pad_t = lambda a: jnp.pad(a, ((0, 0), (0, Tc - T_pad)))
    rows = _pack_rows(sig_r, pad_t(s1), pad_t(sn), pad_t(e_mu), pad_t(e_c1),
                      pad_t(e_c2), pad_t(ea_mu), pad_t(ea_c1), pad_t(ea_c2),
                      pad_t(bs_all))
    scal = _pack_scal(_pad_reads(batch.bw, Rp), _pad_reads(batch.N, Rp),
                      _pad_reads(batch.T, Rp))
    return rows, scal, w0mu, w0c1, w0c2


def transitions_pallas(batch: bb.BandedBatch, forE, backM, backE,
                       interpret: bool = False):
    """Per-read (newM1, newE2) in log space, normalized like the scan path.

    forE/backM/backE are the T-major (Tc, Rp, B) Pallas DP outputs.
    """
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
    rows, scal, w0mu, w0c1, w0c2 = _train_trans_wire(batch, Rp, Tc)

    neg_row = jnp.full((1, Rp, B), NEG_INF, jnp.float32)
    bm_next = jnp.concatenate([backM[1:], neg_row], axis=0)
    be_next = jnp.concatenate([backE[1:], neg_row], axis=0)

    kernel = functools.partial(
        _train_trans_kernel, B=B, C=C, G=G,
        log_m1=np.float32(0.0), log_e2=np.float32(0.0),
    )
    # log_m1/log_e2 enter every term once; fold them in afterwards instead
    # of re-specializing the kernel per transition value
    scal_spec = pl.BlockSpec((G, scal.shape[1]), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((C, G, rows.shape[2]), lambda r, c: (c, r, 0),
                             memory_space=pltpu.VMEM)
    w0_spec = pl.BlockSpec((G, B), lambda r, c: (r, 0),
                           memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((C, G, B), lambda r, c: (c, r, 0),
                            memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((G, B), lambda r, c: (r, 0),
                            memory_space=pltpu.VMEM)
    accM1, accE2, accM1e, accE2e = pl.pallas_call(
        kernel,
        grid=(Rp // G, nc),
        in_specs=[scal_spec, rows_spec, mat_spec, mat_spec, mat_spec,
                  w0_spec, w0_spec, w0_spec],
        out_specs=(acc_spec, acc_spec, acc_spec, acc_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((Rp, B), jnp.float32) for _ in range(4)),
        scratch_shapes=[pltpu.VMEM((G, B), jnp.float32) for _ in range(7)],
        interpret=interpret,
    )(scal, rows, forE, bm_next, be_next, w0mu, w0c1, w0c2)

    def _lse(mx, es):
        # per-lane log value from the online (max, exp-sum) pair, then
        # one exact exp-space reduce over the band per read
        acc = jnp.where(es > 0.0, mx + jnp.log(jnp.where(es > 0.0, es, 1.0)),
                        NEG_INF)
        m = jnp.max(acc, axis=1)
        safe = jnp.where(jnp.isfinite(m), m, 0.0)
        s = jnp.log(jnp.sum(jnp.exp(acc - safe[:, None]), axis=1))
        return jnp.where(jnp.isfinite(m), s + safe, m)

    return _lse(accM1, accM1e)[:R], _lse(accE2, accE2e)[:R]


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
    backM, backE = _backward_t(batch, log_m1, log_e2, interpret=interpret)

    r_ar = jnp.arange(R)
    ctr = batch.bw + 1
    Zf = forE[batch.T - 1, r_ar, ctr]
    Zb = backE[jnp.zeros_like(r_ar), r_ar, ctr]

    rawM1, rawE2 = transitions_pallas(batch, forE, backM, backE,
                                      interpret=interpret)
    newM1 = rawM1 + jnp.asarray(log_m1, jnp.float32)
    newE2 = rawE2 + jnp.asarray(log_e2, jnp.float32)
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
