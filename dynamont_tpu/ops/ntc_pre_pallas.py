"""Mosaic (Pallas TPU) kernels for the NTC 2D pre-passes.

The XLA scan versions (ops/ntc_batch.pre_tn_batch / pre_tk_batch) pay the
backend's fixed per-HLO-op dispatch cost at every one of the ~16k scan
steps (~1.6 s per bucket). These kernels run the identical recurrences
(ref: src/cpp/NTC.cpp:80-217,229-349) as on-core fori loops. Candidate
selection (the reference-exact 95%-mass rule): the TN backward kernel
extracts the per-column top-cap IN-KERNEL (the (T, R, N2) posterior
tensor never reaches HBM) and only the tiny crossing
(ops/ntc_batch.crossing_from_topk) runs outside; the TK pass
materializes U = fwd + bwd and selects with ONE bulk XLA top_k over
(T*R, K) instead of 16k per-step top_k's.

Layouts: reads are the 16 SUBLANES of (16, W) vectors, lattice positions
(n for TN, k for TK) the lanes (W = N2 resp. K, multiples of 128). Per-t
scalars stream as (T, ns, 16) packs transposed in-kernel. TN per-cell
math is op-for-op identical to the scan path (bit-identical results);
TK's grouped predecessor/successor logsumexps use rotate-trees whose
rounding differs from the (R, step, A)-reshape reductions by ~1 ulp.

The k//A / (k%step)*A regathers of the TK pass are fixed lane
permutations, applied on the MXU against one-hot matrices passed in as
inputs (building them in-kernel would cost per-step vector ops; as
closure constants XLA would fold them, memory: constant-gather trap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamont_tpu.ops.ntc_batch import (
    LOG_2PI, PreBatchResult, crossing_from_topk, select_topk,
)

R = 16  # reads per bucket (sublane axis); see geometry()
NEG_INF = float(np.float32(-np.inf))
# raised scoped-VMEM limit (see ops/ntc_pallas._CPAR)
_CPAR = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
PREC = jax.lax.Precision.HIGHEST
C_TN = 8            # t rows per grid step (TN kernels)
C_TK = 8            # t rows per grid step (TK kernels)
SIG_F, SIG_B = 0, 1  # sig pack rows


def _f32(x):
    return x.astype(jnp.float32)


def _lane_iota(W):
    # Mosaic requires integer iota results; cast after (tpu.iota verifier)
    return jax.lax.broadcasted_iota(jnp.int32, (R, W), 1).astype(jnp.float32)


def _rot(x, sh):
    """Lane rotation: out[..., i] = x[..., (i - sh) % W]."""
    W = x.shape[-1]
    return pltpu.roll(x, sh % W, axis=1)


# ---------------------------------------------------------------------------
# TN pre-pass (ref: NTC.cpp:80-132,229-280; XLA: pre_tn_batch)
# ---------------------------------------------------------------------------

def _tn_scores_k(sig_col, mu, sinv, l2s, live):
    """(16, N2) emission row aligned at KMER index n (lane n scores kmer
    n; the recurrences consume it shifted). Op order matches
    ops/ntc_batch._tn_scores for bit-identical values."""
    d = (sig_col - mu) * sinv
    return jnp.where(live, -0.5 * (LOG_2PI + l2s + d * d), NEG_INF)


def _tn_fwd_kernel(sigp_ref, tab_ref, rd_ref, out_ref, stM, stE,
                   *, C, N2, m1, e2):
    ci = pl.program_id(0)
    lane = _lane_iota(N2)
    mu = tab_ref[0]
    sinv = tab_ref[1]
    l2s = tab_ref[2]
    nm1 = jnp.transpose(rd_ref[...])[:, 0:1]             # N_r - 1, (16, 1)
    live = lane < nm1
    e0col = jnp.where(lane == 0.0, 0.0, NEG_INF)

    @pl.when(ci == 0)
    def _():
        stM[...] = jnp.full((R, N2), NEG_INF, jnp.float32)
        stE[...] = e0col

    def body(i, _):
        t = ci * C + i
        sig_col = jnp.transpose(sigp_ref[i])[:, SIG_F:SIG_F + 1]
        sc = _tn_scores_k(sig_col, mu, sinv, l2s, live)
        sc_sh = jnp.where(lane == 0.0, NEG_INF, _rot(sc, 1))
        M_prev, E_prev = stM[...], stE[...]
        M_new = _rot(E_prev, 1) + sc_sh + m1
        E_new = jnp.logaddexp(M_prev + sc_sh, E_prev + sc_sh + e2)
        first = t == 0
        M_out = jnp.where(first, NEG_INF, M_new)
        E_out = jnp.where(first, e0col, E_new)
        stM[...], stE[...] = M_out, E_out
        out_ref[i, 0] = M_out
        out_ref[i, 1] = E_out
        return 0

    jax.lax.fori_loop(0, C, body, 0)


def _tn_bwd_kernel(sigp_ref, tab_ref, rd_ref, fwd_ref, kseq_ref, sel_ref,
                   e0_ref, stM, stE, *, C, nc, N2, cap, m1, e2):
    ci = pl.program_id(0)
    chunk = nc - 1 - ci
    lane = _lane_iota(N2)
    mu = tab_ref[0]
    sinv = tab_ref[1]
    l2s = tab_ref[2]
    rdT = jnp.transpose(rd_ref[...])
    nm1 = rdT[:, 0:1]
    tm1 = rdT[:, 1:2]
    live = lane < nm1
    termE = jnp.where(lane == nm1, 0.0, NEG_INF)

    @pl.when(ci == 0)
    def _():
        stM[...] = jnp.full((R, N2), NEG_INF, jnp.float32)
        stE[...] = jnp.full((R, N2), NEG_INF, jnp.float32)

    def body(i2, _):
        i = C - 1 - i2
        t = (chunk * C + i).astype(jnp.float32)
        sig_col = jnp.transpose(sigp_ref[i])[:, SIG_B:SIG_B + 1]
        sc = _tn_scores_k(sig_col, mu, sinv, l2s, live)
        sc_sh = jnp.where(lane == 0.0, NEG_INF, _rot(sc, 1))
        M_next, E_next = stM[...], stE[...]
        # ext[n] = M_next[n+1] + sc[n] + m1, then lse E-term for n >= 1
        ext = jnp.where(lane == N2 - 1.0, NEG_INF, _rot(M_next, N2 - 1))
        ext = ext + sc + m1
        ext = jnp.logaddexp(ext, E_next + sc_sh + e2)
        M_new = E_next + sc_sh
        is_term = t == tm1
        dead = t > tm1
        M_out = jnp.where(is_term | dead, NEG_INF, M_new)
        E_out = jnp.where(is_term, termE,
                          jnp.where(dead, NEG_INF, ext))
        stM[...], stE[...] = M_out, E_out
        # fused top-cap extraction (== ops/ntc_batch._topk_maxmask: min
        # index of the running max = argmax's first occurrence) — the
        # (T, R, N2) posterior tensor never leaves the kernel; the 95%
        # crossing runs outside on the (T, R, cap) extract
        u = jnp.logaddexp(fwd_ref[i, 0] + M_out, fwd_ref[i, 1] + E_out)
        m0 = jnp.max(u, axis=1, keepdims=True)
        m0s = jnp.where(m0 > -1e30, m0, 0.0)
        tot = jnp.sum(jnp.exp(u - m0s), axis=1, keepdims=True)
        # vals then idx then the kmer_seq values at (cand-1, cand), all
        # CONTIGUOUS lane groups — the k-mer value extraction here
        # replaces two (T, R, CN) XLA take gathers in the plan (~21 ms
        # each per 16-read T=16k bucket); values ride the same lane==ij
        # masked reduces as the extraction itself
        kq1 = kseq_ref[0]
        kq2 = kseq_ref[1]
        vcols, icols, k1cols, k2cols = [], [], [], []
        uu = u
        for _j in range(cap):
            mj = jnp.max(uu, axis=1, keepdims=True)
            ij = jnp.min(jnp.where(uu == mj, lane, 3e9), axis=1,
                         keepdims=True)
            hit = lane == ij
            uu = jnp.where(hit, NEG_INF, uu)
            vcols.append(mj)
            icols.append(ij)
            k1cols.append(jnp.sum(jnp.where(hit, kq1, 0.0), axis=1,
                                  keepdims=True))
            k2cols.append(jnp.sum(jnp.where(hit, kq2, 0.0), axis=1,
                                  keepdims=True))
        pad = jnp.zeros((R, 128 - 4 * cap - 2), jnp.float32)
        sel_ref[i] = jnp.concatenate(
            vcols + icols + k1cols + k2cols + [m0, tot, pad], axis=1)
        return 0

    jax.lax.fori_loop(0, C, body, 0)
    e0_ref[...] = stE[...]


def pre_tn_pallas(sig, kmer_ids, N_r, T_r, means, stdevs, log_m1, log_e2,
                  cap: int, interpret: bool = False) -> PreBatchResult:
    """Kernel TN pre-pass; same contract as ops/ntc_batch.pre_tn_batch
    (fp32 only, R=16)."""
    Rr, Tm1 = sig.shape
    assert Rr == R, Rr
    T_pad = Tm1 + 1
    N2 = kmer_ids.shape[1] + 1
    C = C_TN
    assert T_pad % C == 0 and N2 % 128 == 0

    mu = jnp.asarray(means, jnp.float32)
    sd = jnp.asarray(stdevs, jnp.float32)
    pad1 = jnp.zeros((R, 1), jnp.int32)
    kid2 = jnp.concatenate([kmer_ids, pad1], axis=1)     # (R, N2)
    tab = jnp.stack([mu[kid2], (1.0 / sd)[kid2],
                     (2.0 * jnp.log(sd))[kid2]], axis=0)
    sigf = _f32(sig)
    zero1 = jnp.zeros((R, 1), jnp.float32)
    sig_f = jnp.concatenate([zero1, sigf], axis=1)       # sig[t-1]
    sig_b = jnp.concatenate([sigf, zero1], axis=1)       # sig[t]
    sigp = jnp.stack([sig_f.T, sig_b.T], axis=1)         # (T, 2, 16)
    rd = jnp.stack([_f32(N_r - 1), _f32(T_r - 1)], axis=0)  # (2, 16)

    fwd = pl.pallas_call(
        functools.partial(_tn_fwd_kernel, C=C, N2=N2,
                          m1=np.float32(log_m1), e2=np.float32(log_e2)),
        grid=(T_pad // C,),
        in_specs=[
            pl.BlockSpec((C, 2, R), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R, N2), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, R), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, 2, R, N2), lambda c: (c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, 2, R, N2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, N2), jnp.float32)] * 2,
        compiler_params=_CPAR,
        interpret=interpret,
    )(sigp, tab, rd)

    nc = T_pad // C
    rev = lambda c: (nc - 1 - c, 0, 0)
    assert 4 * cap + 2 <= 128, cap
    # kmer_seq value tables for the in-kernel kN/kN2 extraction, with
    # the plan's clip semantics baked in: kq1[l] = seq[clip(l-1, 0,
    # N2-2)], kq2[l] = seq[clip(l, 0, N2-2)] (exact ints in f32)
    kq2 = jnp.concatenate([kmer_ids, kmer_ids[:, -1:]], axis=1)
    kq1 = jnp.concatenate([kmer_ids[:, :1], kmer_ids], axis=1)
    kseqp = jnp.stack([_f32(kq1), _f32(kq2)], axis=0)    # (2, R, N2)
    sel, E0 = pl.pallas_call(
        functools.partial(_tn_bwd_kernel, C=C, nc=nc, N2=N2, cap=cap,
                          m1=np.float32(log_m1), e2=np.float32(log_e2)),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((C, 2, R), lambda c: (nc - 1 - c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R, N2), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, R), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2, R, N2), lambda c: (nc - 1 - c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, R, N2), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, R, 128), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, N2), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, R, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, N2), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((R, N2), jnp.float32)] * 2,
        compiler_params=_CPAR,
        interpret=interpret,
    )(sigp, tab, rd, fwd, kseqp)

    r_iota = jnp.arange(R)
    Zf = fwd[T_r - 1, 1, r_iota, N_r - 1]
    Zb = E0[:, 0]
    t_io = jnp.arange(T_pad, dtype=jnp.int32)[:, None]
    col_live = (t_io <= (T_r - 1)[None, :]).reshape(-1)
    # the backward kernel fused the top-cap extraction; only the tiny
    # 95%-mass crossing over (T*R, cap) runs here
    sel2 = sel.reshape(T_pad * R, 128)
    vals = sel2[:, 0:cap]
    idx = sel2[:, cap:2 * cap].astype(jnp.int32)
    kn1 = sel2[:, 2 * cap:3 * cap].astype(jnp.int32)
    kn2 = sel2[:, 3 * cap:4 * cap].astype(jnp.int32)
    tot = sel2[:, 4 * cap + 1:4 * cap + 2]
    cand, cnt, ovf = crossing_from_topk(
        vals, idx, tot, ge_break=False, col_live=col_live, sentinel=N2,
    )
    # co-sort the kernel-extracted kmer values with cand (stable, same
    # permutation jnp.sort would apply; sentinel slots carry garbage kn
    # that the plan masks by n_valid)
    cand, kn1, kn2 = jax.lax.sort(
        (cand.reshape(T_pad, R, cap), kn1.reshape(T_pad, R, cap),
         kn2.reshape(T_pad, R, cap)),
        dimension=2, num_keys=1, is_stable=True)
    return PreBatchResult(cand, cnt.reshape(T_pad, R), Zf, Zb,
                          ovf.reshape(T_pad, R).any(axis=0),
                          kn1=kn1, kn2=kn2)


# ---------------------------------------------------------------------------
# TK pre-pass (ref: NTC.cpp:145-217,291-349; XLA: pre_tk_batch)
# ---------------------------------------------------------------------------

def _grp4_lse(v):
    """Group-logsumexp over adjacent lane groups of 4 (broadcast back):
    max via exact pairwise rotates, then a rotate-tree exp sum (matches
    ops/ntc_batch._suc_sum_b to reduction-order rounding)."""
    W = v.shape[-1]
    lane = _lane_iota(W)
    p1 = jnp.where((lane % 2.0) == 0.0, _rot(v, W - 1), _rot(v, 1))
    m1v = jnp.maximum(v, p1)
    p2 = jnp.where((lane % 4.0) < 2.0, _rot(m1v, W - 2), _rot(m1v, 2))
    m = jnp.maximum(m1v, p2)
    finite = m > -1e30
    m_safe = jnp.where(finite, m, 0.0)
    e = jnp.exp(v - m_safe)
    e1 = jnp.where((lane % 2.0) == 0.0, _rot(e, W - 1), _rot(e, 1))
    s1 = e + e1
    s2 = jnp.where((lane % 4.0) < 2.0, _rot(s1, W - 2), _rot(s1, 2))
    s = s1 + s2
    return jnp.where(finite, m_safe + jnp.log(s), NEG_INF)


def _class_lse(v, step):
    """Group-logsumexp over the stride-`step` rotation classes
    {k, k+step, k+2*step, k+3*step} (mod W): pure rotations, no masks."""
    m1v = jnp.maximum(v, _rot(v, step))
    m = jnp.maximum(m1v, _rot(m1v, 2 * step))
    finite = m > -1e30
    m_safe = jnp.where(finite, m, 0.0)
    e = jnp.exp(v - m_safe)
    s1 = e + _rot(e, step)
    s = s1 + _rot(s1, 2 * step)
    return jnp.where(finite, m_safe + jnp.log(s), NEG_INF)


def _tk_bwd_kernel(sigp_ref, tab_ref, rd_ref, p4_ref, out_ref, stM, stE,
                   *, C, nc, K, m1, e2):
    ci = pl.program_id(0)
    chunk = nc - 1 - ci
    step = K // 4
    mu = tab_ref[0]
    c1 = tab_ref[1]
    c2 = tab_ref[2]
    tm1 = jnp.transpose(rd_ref[...])[:, 1:2]

    @pl.when(ci == 0)
    def _():
        stM[...] = jnp.full((R, K), NEG_INF, jnp.float32)
        stE[...] = jnp.full((R, K), NEG_INF, jnp.float32)

    def body(i2, _):
        i = C - 1 - i2
        t = (chunk * C + i).astype(jnp.float32)
        sig_col = jnp.transpose(sigp_ref[i])[:, SIG_B:SIG_B + 1]
        d = sig_col - mu
        sc = c1 - c2 * d * d
        M_next, E_next = stM[...], stE[...]
        M_new = E_next + sc
        # suc_sum: y[k] = lse_j v[(k%step)*4 + j]; adjacent-4 group lse,
        # compressed to the step lanes on the MXU (inputs clamped: a -inf
        # times a one-hot zero is NaN), tiled back by concat
        y_adj = _grp4_lse(M_next + sc + m1)
        y_c = jnp.dot(jnp.maximum(y_adj, -1e30), p4_ref[...],
                      preferred_element_type=jnp.float32,
                      precision=PREC)                     # (16, step)
        y_c = jnp.where(y_c <= -5e29, NEG_INF, y_c)
        suc = jnp.concatenate([y_c, y_c, y_c, y_c], axis=1)
        E_new = jnp.logaddexp(suc, E_next + sc + e2)
        is_term = t == tm1
        dead = t > tm1
        M_out = jnp.where(is_term | dead, NEG_INF, M_new)
        E_out = jnp.where(is_term, 0.0, jnp.where(dead, NEG_INF, E_new))
        stM[...], stE[...] = M_out, E_out
        out_ref[i, 0] = M_out
        out_ref[i, 1] = E_out
        return 0

    jax.lax.fori_loop(0, C, body, 0)


def _tk_fwd_kernel(sigp_ref, tab_ref, rd_ref, p2_ref, bwd_ref, u_ref,
                   fe_ref, stM, stE, stF, *, C, K, m1, e2):
    ci = pl.program_id(0)
    step = K // 4
    mu = tab_ref[0]
    c1 = tab_ref[1]
    c2 = tab_ref[2]
    tm1 = jnp.transpose(rd_ref[...])[:, 1:2]

    @pl.when(ci == 0)
    def _():
        stM[...] = jnp.full((R, K), NEG_INF, jnp.float32)
        stE[...] = jnp.zeros((R, K), jnp.float32)
        stF[...] = jnp.full((R, K), NEG_INF, jnp.float32)

    def body(i, _):
        t = (ci * C + i).astype(jnp.float32)
        sig_col = jnp.transpose(sigp_ref[i])[:, SIG_F:SIG_F + 1]
        d = sig_col - mu
        sc = c1 - c2 * d * d
        M_prev, E_prev = stM[...], stE[...]
        # prec_sum: X[k] = lse_j E[k//4 + j*step]: rotation-class lse,
        # regathered as X[k] = G[k//4] on the MXU (clamp: see suc_sum)
        G = _class_lse(E_prev, step)
        X = jnp.dot(jnp.maximum(G[:, :step], -1e30), p2_ref[...],
                    preferred_element_type=jnp.float32, precision=PREC)
        X = jnp.where(X <= -5e29, NEG_INF, X)
        M_new = X + sc + m1
        E_new = jnp.logaddexp(M_prev + sc, E_prev + sc + e2)
        first = t == 0.0
        dead = t > tm1
        M_out = jnp.where(first | dead, NEG_INF, M_new)
        E_out = jnp.where(first, 0.0, jnp.where(dead, NEG_INF, E_new))
        stM[...], stE[...] = M_out, E_out
        stF[...] = jnp.where(t == tm1, E_out, stF[...])
        u_ref[i] = jnp.logaddexp(bwd_ref[i, 0] + M_out,
                                 bwd_ref[i, 1] + E_out)
        return 0

    jax.lax.fori_loop(0, C, body, 0)
    fe_ref[...] = stF[...]


def pre_tk_pallas(sig, T_r, means, c1, c2, log_m1, log_e2,
                  alphabet_size: int, cap: int,
                  interpret: bool = False) -> PreBatchResult:
    """Kernel TK pre-pass; same contract as ops/ntc_batch.pre_tk_batch
    (fp32 only, R=16, A=4)."""
    from dynamont_tpu.utils.logmath import logsumexp

    Rr, Tm1 = sig.shape
    assert Rr == R and alphabet_size == 4
    T_pad = Tm1 + 1
    C = C_TK
    assert T_pad % C == 0
    muk = jnp.asarray(means, jnp.float32)
    K = muk.shape[0]
    step = K // 4
    tab = jnp.stack([
        jnp.broadcast_to(muk, (R, K)),
        jnp.broadcast_to(jnp.asarray(c1, jnp.float32), (R, K)),
        jnp.broadcast_to(jnp.asarray(c2, jnp.float32), (R, K)),
    ], axis=0)
    sigf = _f32(sig)
    zero1 = jnp.zeros((R, 1), jnp.float32)
    sigp = jnp.stack([
        jnp.concatenate([zero1, sigf], axis=1).T,
        jnp.concatenate([sigf, zero1], axis=1).T,
    ], axis=1)                                           # (T, 2, 16)
    rd = jnp.stack([jnp.zeros((R,), jnp.float32), _f32(T_r - 1)], axis=0)
    src = jnp.arange(K)[:, None]
    p4 = (src == 4 * jnp.arange(step)[None, :]).astype(jnp.float32)
    p2 = (jnp.arange(step)[:, None]
          == jnp.arange(K)[None, :] // 4).astype(jnp.float32)

    nc = T_pad // C
    bwd = pl.pallas_call(
        functools.partial(_tk_bwd_kernel, C=C, nc=nc, K=K,
                          m1=np.float32(log_m1), e2=np.float32(log_e2)),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((C, 2, R), lambda c: (nc - 1 - c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R, K), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, R), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, step), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, 2, R, K), lambda c: (nc - 1 - c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, 2, R, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, K), jnp.float32)] * 2,
        compiler_params=_CPAR,
        interpret=interpret,
    )(sigp, tab, rd, p4)

    U, finalE = pl.pallas_call(
        functools.partial(_tk_fwd_kernel, C=C, K=K,
                          m1=np.float32(log_m1), e2=np.float32(log_e2)),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((C, 2, R), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R, K), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, R), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((step, K), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2, R, K), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, R, K), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, K), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, R, K), jnp.float32),
            jax.ShapeDtypeStruct((R, K), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((R, K), jnp.float32)] * 3,
        compiler_params=_CPAR,
        interpret=interpret,
    )(sigp, tab, rd, p2, bwd)

    Zb = logsumexp(bwd[0, 1], axis=1)
    Zf = logsumexp(finalE, axis=1)
    t_io = jnp.arange(T_pad, dtype=jnp.int32)[:, None]
    col_live = (t_io <= (T_r - 1)[None, :]).reshape(-1)
    cand, cnt, ovf = select_topk(
        U.reshape(T_pad * R, K), cap, ge_break=True, col_live=col_live,
        sentinel=K,
    )
    return PreBatchResult(cand.reshape(T_pad, R, cap),
                          cnt.reshape(T_pad, R), Zf, Zb,
                          ovf.reshape(T_pad, R).any(axis=0))


# ---------------------------------------------------------------------------
# geometry instantiation (see ops/ntc_pallas.geometry)
# ---------------------------------------------------------------------------

_GEOM_CACHE: dict = {}


def geometry(r: int):
    """Module instance of the pre-pass kernels at r reads per bucket.

    The default r=16 IS this module; other read counts (the overflow
    retry rung runs r=8) are separate module objects executed from the
    same source so each instance's kernels close over their own R."""
    import sys

    if r == R:
        return sys.modules[__name__]
    mod = _GEOM_CACHE.get(r)
    if mod is None:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            f"{__name__}__r{r}", __file__)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.R = r
        _GEOM_CACHE[r] = mod
    return mod
