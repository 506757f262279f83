"""Mosaic (Pallas TPU) kernels for the batched NTC 3D DP scans.

The XLA lax.scan bodies in ops/ntc_batch.py are correct but latency-bound:
each of the ~300 HLO ops in a step costs ~1-2 us of fixed overhead on this
backend, so a 16-read T=16k bucket spends ~11 s in the two scans. These
kernels run the identical recurrences (ref: src/cpp/NTC.cpp:417-669 via the
candidate-slot layout of ops/ntc_dp.py) as on-core fori loops, one fused
kernel invocation per T-chunk.

Layout (all tensors T-major):
* the 16 reads x CN=8 n-slots of a bucket form the 128-sublane axis
  (m = r*8 + i), the CK=128 k-slots the lane axis — every vector op runs
  at full (8, 128)-tile utilization and a DP state is one (128, 128)
  block; the five APSEI states stack to (640, 128) rows in the stores;
* slot gathers are one-hot matmuls on the MXU in THREE bf16 passes
  (_oh_dot: exact — the one-hot side is exactly bf16 and each output
  receives at most one source term, so the three bf16 components
  reconstruct fp32 bit-identically to a Precision.HIGHEST gather at half
  the passes): row (n-slot) gathers use a 128x128 block-diagonal
  one-hot; column (k-slot) gathers run one small matmul per read against
  a (CK, 128+512) one-hot of that read's [same | successor] target
  indices;
* per-(t, n-slot) scalars stream as a (T, NS, 128) pack transposed
  in-kernel to (128, NS) columns; per-(t, read) k-row streams as
  (T, *, 16, CK/ACK) packs expanded to 128 sublanes by a one-hot matmul;
* the in-column I chains (ref: NTC.cpp:474-477,565-572) run as 3
  sublane-roll doubling steps of the log-affine/max-plus composition —
  read groups are 8-aligned so rolls cross no read boundary once the
  first slot of each group carries the identity map;
* the posterior kernel writes lp OVER the backward store
  (input_output_aliases): row t of bwd is consumed in the same grid step
  that writes row t of lp, saving a 5.4 GB HBM allocation.

The default module geometry is R=16, CN=8, CK=128 (cap_k=120), A=4; the
engine pads read counts up and falls back to the XLA scan path for other
shapes. geometry(r, cn, ck) instantiates the same kernels at another
bucket geometry with R*CN=128 — the overflow retry rung runs (8, 16,
256), i.e. doubled candidate caps at half the reads per bucket.
"""

from __future__ import annotations

import functools
import sys
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A = 4
NS = 24              # nrow streams (padded)


def _set_geometry(r: int, cn: int, ck: int) -> None:
    """Install a bucket geometry (reads x n-slots x k-slots) as this
    module instance's constants. R * CN must stay 128 (the sublane axis
    of every state block) and CN a power of two (the I-chain doubling
    and the per-read roll trees); CK is a multiple of 128 lanes. The
    per-grid-step row chunks scale inversely with CK so the streamed
    VMEM footprint stays at the default geometry's level. Call ONLY at
    module instantiation (see geometry()) — the kernels read these
    globals at trace time."""
    global R, CN, CK, RC, ACK, C_BWD, C_PV, C_WK, SLB, SLM
    assert r * cn == 128, (r, cn)
    assert cn & (cn - 1) == 0, cn
    assert ck % 128 == 0, ck
    R, CN, CK = r, cn, ck
    RC = r * cn          # 128 sublanes
    ACK = A * ck
    C_BWD = max(2, 8 * 128 // ck)   # rows per grid step, backward kernel
    C_PV = max(2, 4 * 128 // ck)    # rows per grid step, pv kernel
    C_WK = max(2, 8 * 128 // ck)    # rows per grid step, walk kernel
    global BWD_CKPT
    # Wide geometries (CK > 128) run the backward pass CHECKPOINTED: the
    # full (T, 5*RC, CK) f32 store is ~10.7 GB at CK=256 T=16k and the
    # bucket would not fit HBM; instead the backward kernel stores one
    # (5*RC, CK) state per C_PV rows (~0.7 GB) plus row 0 (for Zb), and
    # the pv kernel re-derives its chunk's backward rows in-kernel from
    # the checkpoint (bit-equal: same _bwd_step op order). Viterbi and
    # posteriors therefore stay exact f32; only the post-normalization
    # lp STORE is bf16 (reported probabilities ~2^-8 relative, on
    # overflow-repaired reads only).
    BWD_CKPT = ck > 128
    if BWD_CKPT:
        C_BWD = C_PV = 8
    SLB = ck.bit_length()           # slot-word field width: +1-coded slot
    SLM = (1 << SLB) - 1            # indices reach CK, so ceil(log2(CK+1))
    global LP_DT, CH_DT
    # the packed choice word is <= 13 bits -> i16 store (exact, halves
    # that stream's HBM footprint and bandwidth at every geometry); the
    # backward store stays f32 everywhere (bf16 backward flips ~1% of
    # Viterbi fields — measured), and the posterior STORE is bf16 only
    # on the checkpointed wide path (see BWD_CKPT above)
    LP_DT = jnp.bfloat16 if BWD_CKPT else jnp.float32
    CH_DT = jnp.int16


_set_geometry(16, 8, 128)  # default: 16 reads x 8 n-slots x 128 k-slots

NEG_INF = float(np.float32(-np.inf))
NEG_BIG = -1e30      # finite -inf proxy inside one-hot matmuls
# raised scoped-VMEM limit for every kernel (v5e has 128 MB VMEM; the
# 16 MB default rejects e.g. the train kernel's fwd-store block + 18
# scratch accumulators at 18.4 MB, and the wide (8, 16, 256) geometry's
# posterior/viterbi kernel at 16.14 MB)
_CPAR = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
NEG_THR = -5e29
PREC = jax.lax.Precision.HIGHEST

# nrow stream indices (lane = r*8 + i)
MU_N, C1_N, C2_N = 0, 1, 2
MU_N2, C1_N2, C2_N2 = 3, 4, 5
NPOS, NLT, CHAINUP, CHAINF = 6, 7, 8, 9
BROW_SAME, BROW_NEXT, ROW_SAME, ROW_PREV = 10, 11, 12, 13
D01, D02 = 14, 15
ISTERM, DEAD, ROWN, N0 = 16, 17, 18, 19
SIG_T, SIG_TM1 = 20, 21

# kcol stream indices ((R, CK) rows per stream); K_KS carries the
# first-slot-wins masked k-mer VALUES (dead slots -1) — the kernels build
# every k-slot gather one-hot from value equality against slot-major
# columns derived IN-KERNEL by one MXU identity matmul (_ksT_of) from the
# K_KSP/K_KSN streams (the prev/next column's values). Host-side (T, CK,
# R) transposes are deliberately absent: that layout tiles R=8-16 values
# onto 128 lanes, i.e. 8-16x padded HBM and stream bandwidth.
K_MU, K_C1, K_C2, K_KS, K_SIG, K_SIGM1, K_KSP, K_KSN = range(8)
NKS = 8
# suc stream indices ((16, ACK) rows per stream)
S_MU, S_C1, S_C2 = 0, 1, 2
NSS = 3

A_ST, P_ST, S_ST, E_ST, I_ST = 0, 1, 2, 3, 4  # ref: NTC.cpp:699-703


class NTCPacks(NamedTuple):
    nrow: jax.Array   # (T, NS, 128) f32
    kcol: jax.Array   # (T, NKS, R, CK) f32 (incl. K_KSP/K_KSN ks values)
    suc: jax.Array    # (T, NSS, R, ACK) f32
    alw: jax.Array    # (T, 128, CK) int8
    hd: jax.Array     # (T, 128, CK) int16 packed hd1|hd2<<4|hd1s<<8|hd2s<<12
    T_pad: int
    K: int            # k-mer count (successor/predecessor value arithmetic)


def _f32(x):
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# model-table gather kernel (MXU one-hot gathers)
# ---------------------------------------------------------------------------

JC_TG = 512    # lane chunk per one-hot matmul
NTAB = 16      # table rows (15 used + zero pad)


def combined_tablesT(means, c1, c2, A_: int, K: int):
    """(NTAB, K) f32 stacked model tables for table_gather_pallas.

    Row 0..2: mu/c1/c2 at k. Row 3 + tab*A + a: tab[(k % step)*A + a] —
    the per-digit successor permutation, so successor-parameter gathers
    (ops/ntc_batch._build_plan_one suc_flat) become plain gathers at ks.
    Last row zero-pads to 16 sublanes."""
    step = K // A_
    idx = (jnp.arange(K, dtype=jnp.int32) % step) * A_
    rows = [means, c1, c2]
    for tab in (means, c1, c2):
        for a in range(A_):
            rows.append(tab[idx + a])
    rows.append(jnp.zeros((K,), jnp.float32))
    return jnp.stack([_f32(r) for r in rows], axis=0)


def _tab_gather_kernel(ks_ref, tab_ref, out_ref, *, K, NJ):
    # Exact f32 gather via ONE bf16 MXU matmul: split the f32 table into
    # 3 bf16 terms (8+8+8 significand bits = f32's 24), stack to (3*NTAB,
    # K), multiply by the exact 0/1 one-hot, recombine. 2x faster than an
    # f32 Precision.HIGHEST dot (3.05 vs 5.9 ns/elt measured) because the
    # M dim grows 16->48 inside one 128-row MXU pass instead of 6 passes.
    # The split MUST happen in-kernel: an XLA-computed bf16 (48, K) fed
    # through a BlockSpec arrives with sublanes >= 16 zeroed on this
    # platform (in-graph bf16 temp layout bug, probed 2026-08-18); f32
    # inputs are unaffected.
    t = tab_ref[...]                                     # (NTAB, K) f32
    hi = t.astype(jnp.bfloat16)
    r1 = t - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    t3 = jnp.concatenate([hi, mid, lo], axis=0)          # (3*NTAB, K)

    ks_col = ks_ref[0]                                   # (J, 1)
    for jc in range(NJ):
        ks_c = ks_col[jc * JC_TG:(jc + 1) * JC_TG]       # (JC, 1)
        kio = jax.lax.broadcasted_iota(jnp.int32, (JC_TG, K), 1)
        # j on SUBLANES, k on LANES: lane-broadcasting a column
        # vector is the layout Mosaic supports (a (1, JC) -> (K, JC)
        # sublane broadcast is rejected: "Invalid input layout")
        ohT = (kio == ks_c).astype(jnp.bfloat16)         # (JC, K)
        y = jax.lax.dot_general(
            t3, ohT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, :, jc * JC_TG:(jc + 1) * JC_TG] = (
            y[:NTAB] + y[NTAB:2 * NTAB] + y[2 * NTAB:])


def table_gather_pallas(ks, tabT, interpret: bool = False):
    """out (T, NTAB, J) f32 with out[t, :, j] = tabT[:, ks[t, j]]
    (0.0 where ks is out of range, e.g. the dead-slot sentinel K).

    ks (T, J) int32, tabT (NTAB, K) f32 VMEM-resident. XLA lowers take
    gathers at these shapes to ~5 ns/element (3.6 s per 16-read T=16k
    bucket, scripts/probe_ntc_plan_micro.py); here each (512, K) one-hot
    lives only in VMEM and the contraction is an MXU matmul at
    Precision.HIGHEST (exact: 0/1 weights on f32 table values)."""
    T_pad, J = ks.shape
    NT, K = tabT.shape
    assert NT == NTAB and J % JC_TG == 0, (ks.shape,)
    kernel = functools.partial(_tab_gather_kernel, K=K, NJ=J // JC_TG)
    return pl.pallas_call(
        kernel,
        grid=(T_pad,),
        in_specs=[
            # (1, J, 1): the trailing 1 puts j on SUBLANES so each
            # (JC, 1) chunk lane-broadcasts against the k iota.
            pl.BlockSpec((1, J, 1), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NTAB, K), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NTAB, J), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, NTAB, J), jnp.float32),
        compiler_params=_CPAR,
        interpret=interpret,
    )(ks[:, :, None], tabT)


CT_TG = 8      # t rows per grid step (final-layout gather kernel)


def _tab_gather_packs_kernel(ks_ref, tab_ref, muk_ref, c1k_ref, c2k_ref,
                             suc_ref, nsl_ref, *, K, NJ, NJK):
    """_tab_gather_kernel emitting the FINAL pack layouts directly:
    mu/c1/c2 (R, CK) rows, suc (NSS, R, ACK) A-major blocks, and the
    kN/kN2 n-side lane pack — instead of one (NTAB, J) row per t that a
    host-graph lax.map then re-slices (a 16-iteration while + ~80 MB of
    relayout copies, together ~95 ms of the 16-read T=16k bucket).
    ks arrives as (CT, J) row blocks (J full-lane); per t the chunk
    values are STATIC lane slices, and the one-hot puts k on SUBLANES
    against a sublane-broadcast of the ks lane vector — no dynamic lane
    slicing, no column-extraction matvec."""
    t = tab_ref[...]
    hi = t.astype(jnp.bfloat16)
    r1 = t - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    t3 = jnp.concatenate([hi, mid, lo], axis=0)          # (3*NTAB, K)
    RPC = JC_TG // CK                                    # R rows per chunk
    kio = jax.lax.broadcasted_iota(jnp.int32, (JC_TG, K), 1)
    # one small lane->sublane transpose per grid step: the one-hot
    # compare wants ks on SUBLANES ((1, JC) -> (K, JC) sublane broadcast
    # is rejected by Mosaic, and dynamic LANE slicing of a (J, CT)
    # layout is unsupported — while a python-static lane slice of the
    # transposed (J, CT) block is free)
    ksT = ks_ref[...].T                                  # (J, CT)

    for ti in range(CT_TG):
        ks_col = ksT[:, ti:ti + 1]                       # (J, 1) sublanes
        for jc in range(NJ):
            ks_c = ks_col[jc * JC_TG:(jc + 1) * JC_TG]   # (JC, 1)
            oh = (kio == ks_c).astype(jnp.bfloat16)      # (JC, K)
            y3 = jax.lax.dot_general(
                t3, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = y3[:NTAB] + y3[NTAB:2 * NTAB] + y3[2 * NTAB:]
            if jc < NJK:
                r0 = jc * RPC
                # per-row (1, CK) lane-slice writes: Mosaic rejects the
                # (1, JC) -> (RPC, CK) in-kernel reshape
                for rr in range(RPC):
                    cs = rr * CK
                    rw = r0 + rr
                    muk_ref[ti, rw, :] = y[0, cs:cs + CK]
                    c1k_ref[ti, rw, :] = y[1, cs:cs + CK]
                    c2k_ref[ti, rw, :] = y[2, cs:cs + CK]
                    for tabi in range(NSS):
                        for a in range(A):
                            row = 3 + tabi * A + a
                            suc_ref[ti, tabi, rw,
                                    a * CK:(a + 1) * CK] = y[row,
                                                             cs:cs + CK]
            else:
                nsl_ref[ti, :, :] = y[:3, :2 * RC]


def table_gather_packs(ks_all, tabT, interpret: bool = False):
    """One-call final-layout table gather: ks_all (T, J) int32 laid out
    as [R*CK slot kmers ++ kN (RC) ++ kN2 (RC) ++ zero pad] per row;
    returns (mu_k, c1_k, c2_k) (T, R, CK), suc (T, NSS, R, ACK), nsl
    (T, 3, 2*RC)."""
    T_pad, J = ks_all.shape
    NT, K = tabT.shape
    assert NT == NTAB and J % JC_TG == 0, (ks_all.shape,)
    assert R * CK % JC_TG == 0 and 2 * RC <= JC_TG
    T_k = (T_pad + CT_TG - 1) // CT_TG * CT_TG
    if T_k != T_pad:
        # small buckets: pad the t axis with sentinel rows (K never
        # matches the one-hot iota -> zero outputs) and slice them off
        ks_all = jnp.concatenate(
            [ks_all, jnp.full((T_k - T_pad, J), K, ks_all.dtype)],
            axis=0)
    NJK = R * CK // JC_TG
    kernel = functools.partial(_tab_gather_packs_kernel, K=K,
                               NJ=J // JC_TG, NJK=NJK)
    row3 = lambda c: (c, 0, 0)
    outs = pl.pallas_call(
        kernel,
        grid=(T_k // CT_TG,),
        in_specs=[
            pl.BlockSpec((CT_TG, J), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NTAB, K), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((CT_TG, R, CK), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((CT_TG, R, CK), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((CT_TG, R, CK), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((CT_TG, NSS, R, ACK), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT_TG, 3, 2 * RC), row3,
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T_k, R, CK), jnp.float32),
            jax.ShapeDtypeStruct((T_k, R, CK), jnp.float32),
            jax.ShapeDtypeStruct((T_k, R, CK), jnp.float32),
            jax.ShapeDtypeStruct((T_k, NSS, R, ACK), jnp.float32),
            jax.ShapeDtypeStruct((T_k, 3, 2 * RC), jnp.float32),
        ),
        compiler_params=_CPAR,
        interpret=interpret,
    )(ks_all, tabT)
    if T_k != T_pad:
        outs = tuple(o[:T_pad] for o in outs)
    return outs


def build_kernel_packs(plan, dims, sig, N_r, T_r, K: int, tables=None,
                       interpret: bool = False) -> NTCPacks:
    """Re-lay the flat (T, X) NTCPlan streams into the kernel layouts.

    sig: (R, T_pad-1) f32; N_r/T_r: (R,) int32; K: k-mer count (static).
    All jit-traceable. Works from a lite plan (build_plan_batch
    lite=True) — no slot maps are consumed.

    tables=(means, c1, c2): gather the per-slot model parameters here via
    the MXU one-hot gather kernel instead of reading plan.mu_k/...: the
    XLA take gathers behind those plan fields cost ~5 ns/element — 3.6 s
    of a 4.8 s bucket at T=16k (scripts/probe_ntc_plan_micro.py) — while
    the kernel gathers the same values in ~0.2 s. Requires a lite plan
    (its gather fields are 1-wide dummies). Dead slots (ks == K) read
    0.0 instead of a clipped table value; every kernel masks dead slots
    to -inf before they reach any output, so results are identical."""
    Rr, CNp, CKp, Ap = dims
    assert (Rr, CNp, CKp, Ap) == (R, CN, CK, A), (dims,)
    T_pad = plan.cand_n.shape[0]

    cn3 = plan.cand_n.reshape(T_pad, R, CN)
    rep = lambda x: jnp.repeat(x, CN, axis=1)          # (T, R) -> (T, 128)
    Nb = N_r[None, :].astype(jnp.int32)
    n_pos = (cn3 >= 1).reshape(T_pad, RC)
    n_lt = (cn3 < (N_r - 1)[None, :, None]).reshape(T_pad, RC)
    rowN = (cn3 == (N_r - 1)[None, :, None]).reshape(T_pad, RC)
    n0 = (cn3 == 0).reshape(T_pad, RC)
    chup3 = jnp.concatenate(
        [cn3[:, :, 1:] == cn3[:, :, :-1] + 1,
         jnp.zeros((T_pad, R, 1), bool)], axis=2)
    chf3 = jnp.concatenate(
        [jnp.zeros((T_pad, R, 1), bool), chup3[:, :, :-1]], axis=2)
    t_io = jnp.arange(T_pad, dtype=jnp.int32)[:, None]
    is_term = rep(t_io == (T_r - 1)[None, :])
    dead = rep(t_io > (T_r - 1)[None, :])
    sig_pad = jnp.concatenate([_f32(sig), jnp.zeros((R, 1), jnp.float32)], 1)
    sig_prev = jnp.concatenate([jnp.zeros((R, 1), jnp.float32),
                                sig_pad[:, :-1]], 1)
    sig_t = rep(sig_pad.T)
    sig_tm1 = rep(sig_prev.T)

    streams = [None] * NS
    streams[NPOS] = _f32(n_pos)
    streams[NLT] = _f32(n_lt)
    streams[CHAINUP] = _f32(chup3.reshape(T_pad, RC))
    streams[CHAINF] = _f32(chf3.reshape(T_pad, RC))
    streams[BROW_SAME] = _f32(plan.brow_same)
    streams[BROW_NEXT] = _f32(plan.brow_next)
    streams[ROW_SAME] = _f32(plan.row_same)
    streams[ROW_PREV] = _f32(plan.row_prev)
    streams[D01] = _f32(plan.d01)
    streams[D02] = _f32(plan.d02)
    streams[ISTERM] = _f32(is_term)
    streams[DEAD] = _f32(dead)
    streams[ROWN] = _f32(rowN)
    streams[N0] = _f32(n0)
    streams[SIG_T] = sig_t
    streams[SIG_TM1] = sig_tm1

    k16 = lambda a: _f32(a).reshape(T_pad, R, CK)
    sigk = jnp.broadcast_to(sig_pad.T[:, :, None], (T_pad, R, CK))
    sigkm = jnp.broadcast_to(sig_prev.T[:, :, None], (T_pad, R, CK))
    ks_live = jnp.where(plan.live.reshape(T_pad, R, CK) > 0,
                        _f32(plan.ks.reshape(T_pad, R, CK)), -1.0)
    if tables is not None and K > 4096:
        # native big-K (9-mer): the MXU one-hot gather scales with K
        # (48*K*J MACs per row — ~475T MACs per bucket at K=4^9); plain
        # XLA take gathers (~5 ns/element) win by ~50x here. Successor
        # params exploit that suc_flat = (ks%step)*A + a indexes A
        # CONSECUTIVE table rows: one 4-wide-slice gather from the
        # (step, A) view instead of A scalar gathers.
        t_mu, t_c1, t_c2 = (jnp.asarray(t, jnp.float32) for t in tables)
        ks_i = plan.ks.reshape(T_pad, R, CK).astype(jnp.int32)
        dead = ks_i >= K
        ks_sf = jnp.clip(ks_i, 0, K - 1)
        gk = lambda tab: jnp.where(dead, 0.0, tab[ks_sf])
        mu_k, c1_k, c2_k = gk(t_mu), gk(t_c1), gk(t_c2)
        step = K // A
        ks_mod = ks_sf % step

        def gsuc(tab):
            # A separate single-element gathers: ANY gather whose slices
            # span the A=4 dim canonicalizes to a (..., 4)-trailing
            # intermediate, which tile-pads 4 -> 128 lanes (~16 GB here)
            t2 = tab.reshape(step, A)
            parts = [jnp.where(dead, 0.0, t2[:, a][ks_mod])
                     for a in range(A)]
            return jnp.concatenate(parts, axis=2)        # A-major ACK

        suc = jnp.stack([gsuc(t_mu), gsuc(t_c1), gsuc(t_c2)], axis=1)
        gn = lambda tab, idx: tab[idx]
        n_gathered = (gn(t_mu, plan.kN), gn(t_c1, plan.kN),
                      gn(t_c2, plan.kN), gn(t_mu, plan.kN2),
                      gn(t_c1, plan.kN2), gn(t_c2, plan.kN2))
    elif tables is not None:
        tabT = combined_tablesT(*tables, A, K)
        ks_i = plan.ks.reshape(T_pad, R * CK).astype(jnp.int32)
        # n-side params ride the same gather: append the kN/kN2 value
        # columns (their XLA take gathers alone cost 160 ms of the plan
        # stage at T=16k) + zero lanes padding J to a JC_TG multiple
        n_j = plan.kN.shape[1]
        assert n_j == RC, (plan.kN.shape,)  # lite plan keeps full kN/kN2
        j_pad = (-(R * CK + 2 * RC)) % JC_TG
        ks_all = jnp.concatenate(
            [ks_i, plan.kN.astype(jnp.int32), plan.kN2.astype(jnp.int32),
             jnp.zeros((T_pad, j_pad), jnp.int32)], axis=1)
        J_all = ks_all.shape[1]
        # final-layout gather kernel: one pallas call writing the pack
        # tensors directly (the former (T, NTAB, J) row output re-sliced
        # under a lax.map cost a 16-iteration while + ~80 MB of relayout
        # copies — ~95 ms of the 637 ms bucket, profiled 2026-08-20)
        mu_k, c1_k, c2_k, suc, nsl = table_gather_packs(
            ks_all, tabT, interpret=interpret)
        n_gathered = (nsl[:, 0, :RC], nsl[:, 1, :RC], nsl[:, 2, :RC],
                      nsl[:, 0, RC:], nsl[:, 1, RC:], nsl[:, 2, RC:])
    else:
        mu_k, c1_k, c2_k = k16(plan.mu_k), k16(plan.c1_k), k16(plan.c2_k)
        s16 = lambda a: _f32(a).reshape(T_pad, R, ACK)
        suc = jnp.stack(
            [s16(plan.mu_suc), s16(plan.c1_suc), s16(plan.c2_suc)], axis=1)
        n_gathered = None
    if n_gathered is not None:
        (streams[MU_N], streams[C1_N], streams[C2_N],
         streams[MU_N2], streams[C1_N2], streams[C2_N2]) = n_gathered
    else:
        streams[MU_N] = _f32(plan.mu_n)
        streams[C1_N] = _f32(plan.c1_n)
        streams[C2_N] = _f32(plan.c2_n)
        streams[MU_N2] = _f32(plan.mu_n2)
        streams[C1_N2] = _f32(plan.c1_n2)
        streams[C2_N2] = _f32(plan.c2_n2)
    zero = jnp.zeros((T_pad, RC), jnp.float32)
    streams = [zero if s is None else s for s in streams]
    nrow = jnp.stack(streams, axis=1)                   # (T, NS, 128)
    # prev/next column k-mer values stay in the natural (R, CK) lane
    # layout; the kernels derive slot-major columns on the MXU (_ksT_of)
    no_row = jnp.full((1, R, CK), -1.0, jnp.float32)
    ksp = jnp.concatenate([no_row, ks_live[:-1]], axis=0)
    ksn = jnp.concatenate([ks_live[1:], no_row], axis=0)
    kcol = jnp.stack([mu_k, c1_k, c2_k, ks_live, sigk, sigkm, ksp, ksn],
                     axis=1)

    alw = plan.allowed.reshape(T_pad, RC, CK).astype(jnp.int8)
    if plan.hd1.dtype == jnp.int16:
        # lite plan: hd1 already carries the packed int16 nibble layout
        hd = plan.hd1.reshape(T_pad, RC, CK)
    else:
        hd = (plan.hd1.astype(jnp.int32)
              | (plan.hd2.astype(jnp.int32) << 4)
              | (plan.hd1s.astype(jnp.int32) << 8)
              | (plan.hd2s.astype(jnp.int32) << 12)
              ).astype(jnp.int16).reshape(T_pad, RC, CK)
    return NTCPacks(nrow, kcol, suc, alw, hd, T_pad, K)


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------

def _ksT_of(ks_rows):
    """(R, CK) k-mer value rows -> (CK, R) slot-major columns.

    One MXU identity matmul (exact: integer values < 2^24 times a 0/1
    matrix). Replaces the former precomputed (T, CK, R) HBM streams,
    whose layout tiled the R=8-16 reads onto 128 lanes — 8-16x padded
    memory and bandwidth (2 GB per stream at the wide geometry; the
    round-4 HBM OOM)."""
    i_s = jax.lax.broadcasted_iota(jnp.int32, (CK, CK), 0)
    i_l = jax.lax.broadcasted_iota(jnp.int32, (CK, CK), 1)
    ident = (i_s == i_l).astype(jnp.float32)
    return jax.lax.dot_general(
        ident, ks_rows, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=PREC)


def _expand16():
    """(128, 16) one-hot: row m -> read m // 8 (exact in any precision)."""
    m_io = jax.lax.broadcasted_iota(jnp.int32, (RC, R), 0)
    r_io = jax.lax.broadcasted_iota(jnp.int32, (RC, R), 1)
    return ((m_io // CN) == r_io).astype(jnp.float32)


def _b3_parts(x):
    """Split fp32 into three bf16 components that sum back EXACTLY:
    p1 = top 8 mantissa bits, p2/p3 the next 8+8 (the residual
    subtractions are exact by Sterbenz; 8+8+8 >= fp32's 24)."""
    p1 = x.astype(jnp.bfloat16)
    r1 = x - p1.astype(jnp.float32)
    p2 = r1.astype(jnp.bfloat16)
    p3 = (r1 - p2.astype(jnp.float32)).astype(jnp.bfloat16)
    return p1, p2, p3


def _oh_dot(a, b, onehot_left: bool):
    """Gather matmul against a 0/1 one-hot in THREE bf16 MXU passes
    instead of Precision.HIGHEST's six (~2x): the one-hot side is
    exactly bf16-representable, every output receives at most one source
    term (the dedup invariants of _row_gather/_col_gather), so each
    pass's single product is the exact bf16 component and the fp32 sum
    of the three components reconstructs the fp32 source EXACTLY —
    bit-identical to a HIGHEST gather. Inputs must be finite (values are
    clamped to NEG_BIG before every gather)."""
    if onehot_left:
        oh = a.astype(jnp.bfloat16)
        outs = [jnp.dot(oh, p, preferred_element_type=jnp.float32)
                for p in _b3_parts(b)]
    else:
        oh = b.astype(jnp.bfloat16)
        outs = [jnp.dot(p, oh, preferred_element_type=jnp.float32)
                for p in _b3_parts(a)]
    return (outs[0] + outs[1]) + outs[2]


def _exp16(E, x16):
    """(16, W) per-read rows -> (128, W) replicated over the CN sublanes."""
    return _oh_dot(E, x16, onehot_left=True)


def _exp16_small(E, x16):
    """_exp16 for values already exact in bf16 (small integers <= 256,
    e.g. slot indices): ONE MXU pass instead of three."""
    return jnp.dot(E.astype(jnp.bfloat16), x16.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _row_gather(idx_col, blocks):
    """Gather n-slot rows: idx_col (128, 1) target slot per row m (or -1);
    blocks: list of (128, CK) states sharing idx. One one-hot matmul over
    the lane-concatenated states; -inf in, -inf out (clamp + restore)."""
    n_io = jax.lax.broadcasted_iota(jnp.int32, (RC, RC), 1).astype(jnp.float32)
    base = ((jax.lax.broadcasted_iota(jnp.int32, (RC, RC), 0) // CN)
            * CN).astype(jnp.float32)
    oh = (n_io == base + idx_col).astype(jnp.float32)
    xc = jnp.concatenate([jnp.maximum(b, NEG_BIG) for b in blocks], axis=1)
    g = _oh_dot(oh, xc, onehot_left=True)
    g = jnp.where(g <= NEG_THR, NEG_INF, g)
    g = jnp.where(idx_col >= 0.0, g, NEG_INF)
    return [g[:, k * CK:(k + 1) * CK] for k in range(len(blocks))]


def _col_gather(srcs, ksT_col, dst_same16, dst_suc16, want_slots=False):
    """k-slot gathers for all reads, by K-MER VALUE equality.

    srcs: list of (128, CK) state blocks of the SOURCE column; ksT_col
    (CK, 16): that column's first-slot-wins masked k-mer values (dead
    slots -1), slot-major; dst_same16 (16, CK) / dst_suc16 (16, ACK):
    target VALUES per destination slot (invalid -2, so -1 never
    matches). Dedup guarantees at most one live source slot per value,
    so the one-hot matmul needs no first-match logic; two constant rows
    appended to the source stack recover the matched mask and (for the
    walk) the matched source slot index. Returns (same-gathers,
    suc-gathers[, cs (16, CK), cpa (16, ACK)] source slot indices, -1
    where absent)."""
    L = len(srcs)
    slot_iota = jax.lax.broadcasted_iota(
        jnp.int32, (1, CK), 1).astype(jnp.float32)
    ones_row = jnp.ones((1, CK), jnp.float32)
    parts_same = [[] for _ in range(L)]
    parts_suc = [[] for _ in range(L)]
    cs_rows, cpa_rows = [], []
    for r in range(R):
        src_vals = ksT_col[:, r:r + 1]                  # (CK, 1)
        oh = jnp.concatenate(
            [(src_vals == dst_same16[r:r + 1, :]).astype(jnp.float32),
             (src_vals == dst_suc16[r:r + 1, :]).astype(jnp.float32)],
            axis=1)                                      # (CK, CK+ACK)
        x_r = jnp.concatenate(
            [jnp.maximum(s[r * CN:(r + 1) * CN], NEG_BIG) for s in srcs]
            + [ones_row, slot_iota], axis=0)             # (8L+2, CK)
        y = _oh_dot(x_r, oh, onehot_left=False)
        matched = y[L * CN:L * CN + 1] > 0.5             # (1, CK+ACK)
        for k in range(L):
            gs = y[k * CN:(k + 1) * CN, :CK]
            gu = y[k * CN:(k + 1) * CN, CK:]
            gs = jnp.where(gs <= NEG_THR, NEG_INF, gs)
            gu = jnp.where(gu <= NEG_THR, NEG_INF, gu)
            parts_same[k].append(jnp.where(matched[:, :CK], gs, NEG_INF))
            parts_suc[k].append(jnp.where(matched[:, CK:], gu, NEG_INF))
        if want_slots:
            idx = jnp.where(matched, y[L * CN + 1:L * CN + 2], -1.0)
            cs_rows.append(idx[:, :CK])
            cpa_rows.append(idx[:, CK:])
    same = [jnp.concatenate(p, axis=0) for p in parts_same]
    suc = [jnp.concatenate(p, axis=0) for p in parts_suc]
    if want_slots:
        return same, suc, jnp.concatenate(cs_rows, 0), jnp.concatenate(
            cpa_rows, 0)
    return same, suc


def _dst_vals(ks_row, K, mode):
    """Target values per destination slot from the column's own masked
    k-mer values ks_row (16, CK): 'same' passes them through; 'suc' /
    'prec' build the A-major successor (ks%step)*A+a resp. predecessor
    ks//A+a*step value lists (16, ACK). Invalid slots map to -2."""
    ok = ks_row >= 0.0
    if mode == "same":
        return jnp.where(ok, ks_row, -2.0)
    step = float(K // A)
    if mode == "suc":
        base = (ks_row - step * jnp.floor(ks_row / step)) * A
        offs = [base + a for a in range(A)]
    else:
        base = jnp.floor(ks_row / A)
        offs = [base + a * step for a in range(A)]
    return jnp.concatenate(
        [jnp.where(ok, o, -2.0) for o in offs], axis=1)


def _lse(terms):
    """logsumexp over a list of (128, W) blocks (utils.logmath semantics)."""
    m = terms[0]
    for t in terms[1:]:
        m = jnp.maximum(m, t)
    finite = m > NEG_THR
    m_safe = jnp.where(finite, m, 0.0)
    s = jnp.exp(terms[0] - m_safe)
    for t in terms[1:]:
        s = s + jnp.exp(t - m_safe)
    return jnp.where(finite, m_safe + jnp.log(s), m)


def _first_match(cands):
    """Running (max, first-index-attaining-max) over an ordered list."""
    m = cands[0]
    code = jnp.zeros(m.shape, jnp.int32)
    for idx, c in enumerate(cands[1:], 1):
        upd = c > m
        m = jnp.maximum(m, c)
        code = jnp.where(upd, idx, code)
    return m, code


def _roll_grp(x, sh, fill, up: bool):
    """Shift by sh WITHIN each 8-row read group (up: row m gets m - sh)."""
    if up:
        out = pltpu.roll(x, sh, axis=0)
        ok = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % CN) >= sh
    else:
        out = pltpu.roll(x, RC - sh, axis=0)
        ok = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % CN) < CN - sh
    return jnp.where(ok, out, fill)


def _affine_chain(a, b, up: bool, maxplus: bool):
    """Inclusive composition scan of log-affine maps v -> op(a, v + b)
    within 8-row groups (up: low->high slot order, else high->low). The
    doubling identity element is (a=-inf, b=0)."""
    op = jnp.maximum if maxplus else jnp.logaddexp
    for s in range(CN.bit_length() - 1):    # log2(CN) doubling steps
        sh = 1 << s
        a_in = _roll_grp(a, sh, NEG_INF, up)
        b_in = _roll_grp(b, sh, 0.0, up)
        a = op(a, a_in + b)
        b = b + b_in
    return a


def _unpack_hd(hd_i16):
    hd = hd_i16.astype(jnp.int32)
    f = lambda x: x.astype(jnp.float32)
    return (f(hd & 0xF), f((hd >> 4) & 0xF),
            f((hd >> 8) & 0xF), f((hd >> 12) & 0xF))


# ---------------------------------------------------------------------------
# backward kernel (ref: NTC.cpp:500-578; XLA: ops/ntc_batch.ntc_backward_batch)
# ---------------------------------------------------------------------------

def _bwd_step(i, t, nrow_ref, kcol_ref, suc_ref, alw_ref, hd_ref,
              states, E, tl, K):
    """One backward row: updates the 5 state scratches and returns the
    masked per-state outputs (exactly the values the full store holds).
    Shared by _bwd_kernel and the checkpointed pv re-derivation."""
    stA, stP, stS, stE, stI = states
    if True:
        nT = jnp.transpose(nrow_ref[i])                 # (128, NS)
        col = lambda s: nT[:, s:s + 1]
        mu_n, c1_n, c2_n = col(MU_N), col(C1_N), col(C2_N)
        mu_n2, c1_n2, c2_n2 = col(MU_N2), col(C1_N2), col(C2_N2)
        n_pos = col(NPOS) > 0.5
        n_lt = col(NLT) > 0.5
        chup = col(CHAINUP) > 0.5
        d01, d02 = col(D01), col(D02)
        is_term = col(ISTERM) > 0.5
        dead_r = col(DEAD) > 0.5
        sig_t, sig_tm1 = col(SIG_T), col(SIG_TM1)

        # boolean combines of broadcast (128,1) masks with full (128,128)
        # masks hit Mosaic i1-relayout limits: combine as f32 products and
        # compare once
        alwf = alw_ref[i].astype(jnp.float32)
        alw = alwf > 0.5
        rowNalw = (col(ROWN) * alwf) > 0.5
        hd1, hd2, hd1s, hd2s = _unpack_hd(hd_ref[i])

        mu_k16 = kcol_ref[i, K_MU]
        c1_k16 = kcol_ref[i, K_C1]
        c2_k16 = kcol_ref[i, K_C2]
        sg16 = kcol_ref[i, K_SIG][:, 0:1]
        sg16m = kcol_ref[i, K_SIGM1][:, 0:1]
        dk = sg16 - mu_k16
        sck = _exp16(E, c1_k16 - c2_k16 * dk * dk)       # (128, CK)
        dkm = sg16m - mu_k16
        sck_m1 = _exp16(E, c1_k16 - c2_k16 * dkm * dkm)

        d_n = sig_t - mu_n
        scn = c1_n - c2_n * d_n * d_n
        d_n2 = sig_t - mu_n2
        scn2 = c1_n2 - c2_n2 * d_n2 * d_n2
        sc1 = scn + sck - 2.0 * hd1
        sc2 = scn2 + sck - 2.0 * hd2

        gnsE, gnsP = _row_gather(col(BROW_SAME), [stE[...], stP[...]])
        gnnS, gnnA = _row_gather(col(BROW_NEXT), [stS[...], stA[...]])

        ks_cur = kcol_ref[i, K_KS]
        gk_same, gk_suc = _col_gather(
            [gnsE, gnnS, gnsP, gnnA], _ksT_of(kcol_ref[i, K_KSN]),
            _dst_vals(ks_cur, K, "same"), _dst_vals(ks_cur, K, "suc"))
        gskE, gnkS = gk_same[0], gk_same[1]
        gspP, gnaA = gk_suc[2], gk_suc[3]

        a_new = jnp.where(n_pos, gskE + sc1, NEG_INF)
        p_new = jnp.logaddexp(
            jnp.where(n_pos, gskE + tl["e2"] + sc1, NEG_INF),
            jnp.where(n_lt, gnkS + tl["s1"] + sc2, NEG_INF),
        )

        mu_s16 = suc_ref[i, S_MU]
        c1_s16 = suc_ref[i, S_C1]
        c2_s16 = suc_ref[i, S_C2]
        dsu = sg16 - mu_s16
        scs = _exp16(E, c1_s16 - c2_s16 * dsu * dsu)     # (128, ACK)

        base_s = jnp.where(n_pos, gskE + tl["e3"] + sc1, NEG_INF)
        base_e = jnp.where(n_pos, gskE + tl["e4"] + sc1, NEG_INF)
        gnkS2 = gnkS + sc2
        s_terms = [base_s]
        e_terms = [base_e]
        i_terms = []
        for ai in range(A):
            scs_ai = scs[:, ai * CK:(ai + 1) * CK]
            m1 = jnp.where(d01 != float(ai), 1.0, 0.0)
            m2 = jnp.where(d02 != float(ai), 1.0, 0.0)
            sc1s = scn + scs_ai - 2.0 * (hd1s + m1)
            sc2s = scn2 + scs_ai - 2.0 * (hd2s + m2)
            gspP_ai = jnp.where(
                n_pos, gspP[:, ai * CK:(ai + 1) * CK] + sc1s, NEG_INF)
            gnaA_ai = jnp.where(
                n_lt, gnaA[:, ai * CK:(ai + 1) * CK] + sc2s, NEG_INF)
            s_terms.append(gspP_ai + tl["p1"])
            e_terms.append(gspP_ai + tl["p2"])
            e_terms.append(gnaA_ai + tl["a1"])
            i_terms.append(gspP_ai + tl["p3"])
            i_terms.append(gnaA_ai + tl["a2"])
        e_terms.append(jnp.where(n_lt, gnkS2 + tl["s2"], NEG_INF))
        i_terms.append(jnp.where(n_lt, gnkS2 + tl["s3"], NEG_INF))
        s_new = _lse(s_terms)
        e_new = _lse(e_terms)
        i_new = _lse(i_terms)

        # same-t I chain (ref: NTC.cpp:565-572): high -> low slot order
        d_nm1 = sig_tm1 - mu_n2
        scn2_m1 = c1_n2 - c2_n2 * d_nm1 * d_nm1
        sc_i = scn2_m1 + sck_m1 - 2.0 * hd2
        ok_i = chup & (t > 0) & n_lt
        iB = jnp.where(ok_i, tl["i2"] + sc_i, NEG_INF)
        i_full = _affine_chain(i_new, iB, up=False, maxplus=False)
        # e uses the UPDATED i of the slot above: i_below[m] = i_full[m+1]
        i_below = _roll_grp(i_full, 1, NEG_INF, up=False)
        e_new = jnp.logaddexp(
            e_new, jnp.where(ok_i, i_below + tl["i1"] + sc_i, NEG_INF))
        i_new = i_full

        outs = []
        termE = jnp.where(rowNalw, 0.0, NEG_INF)
        for st_idx, v in ((A_ST, a_new), (P_ST, p_new), (S_ST, s_new),
                          (E_ST, e_new), (I_ST, i_new)):
            v = jnp.where(alw, v, NEG_INF)
            term = termE if st_idx == E_ST else jnp.full_like(v, NEG_INF)
            v = jnp.where(is_term, term, jnp.where(dead_r, NEG_INF, v))
            outs.append(v)
        stA[...], stP[...], stS[...], stE[...], stI[...] = outs
        return outs


def _bwd_kernel(nrow_ref, kcol_ref, suc_ref, alw_ref, hd_ref,
                out_ref, stA, stP, stS, stE, stI, *, C, nc, tl, K):
    ci = pl.program_id(0)
    chunk = nc - 1 - ci

    @pl.when(ci == 0)
    def _():
        for st in (stA, stP, stS, stE, stI):
            st[...] = jnp.full((RC, CK), NEG_INF, jnp.float32)

    E = _expand16()

    def body(i2, _):
        i = C - 1 - i2
        t = chunk * C + i
        outs = _bwd_step(i, t, nrow_ref, kcol_ref, suc_ref, alw_ref,
                         hd_ref, (stA, stP, stS, stE, stI), E, tl, K)
        for st_idx, v in enumerate(outs):
            out_ref[i, st_idx * RC:(st_idx + 1) * RC] = v.astype(
                out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, C, body, 0)


def _bwd_ckpt_kernel(nrow_ref, kcol_ref, suc_ref, alw_ref, hd_ref,
                     ck_ref, row0_ref, stA, stP, stS, stE, stI,
                     *, C, nc, tl, K):
    """Checkpointed backward: per chunk, store only the 5-state carry
    ENTERING the chunk (plus row 0's outputs at the end, for Zb); the pv
    kernel re-derives the in-chunk rows from these via _bwd_step."""
    ci = pl.program_id(0)
    chunk = nc - 1 - ci
    states = (stA, stP, stS, stE, stI)

    @pl.when(ci == 0)
    def _():
        for st in states:
            st[...] = jnp.full((RC, CK), NEG_INF, jnp.float32)

    # carry entering this chunk (the value the re-derivation starts from)
    for st_idx, st in enumerate(states):
        ck_ref[0, st_idx * RC:(st_idx + 1) * RC] = st[...]

    E = _expand16()

    def body(i2, _):
        i = C - 1 - i2
        t = chunk * C + i
        _bwd_step(i, t, nrow_ref, kcol_ref, suc_ref, alw_ref, hd_ref,
                  states, E, tl, K)
        return 0

    jax.lax.fori_loop(0, C, body, 0)

    @pl.when(ci == nc - 1)
    def _():
        for st_idx, st in enumerate(states):
            row0_ref[st_idx * RC:(st_idx + 1) * RC] = st[...]


def ntc_backward_ckpt_pallas(packs: NTCPacks, trans_log,
                             interpret: bool = False):
    """Checkpointed backward pass: returns (ckpts (T/C_PV, 5*RC, CK) f32
    chunk-entry states, row0 (5*RC, CK) f32 — the t=0 backward outputs,
    i.e. the full store's row 0)."""
    T_pad = packs.T_pad
    C = C_PV                      # checkpoint stride == pv chunk
    assert T_pad % C == 0
    nc = T_pad // C
    tl = {k: np.float32(v) for k, v in trans_log.items()}
    kernel = functools.partial(_bwd_ckpt_kernel, C=C, nc=nc, tl=tl,
                               K=packs.K)
    rev = lambda c: nc - 1 - c
    ckpts, row0 = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((C, NS, RC), lambda c: (rev(c), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, NKS, R, CK), lambda c: (rev(c), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, NSS, R, ACK), lambda c: (rev(c), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), lambda c: (rev(c), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), lambda c: (rev(c), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 5 * RC, CK), lambda c: (rev(c), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * RC, CK), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nc, 5 * RC, CK), jnp.float32),
            jax.ShapeDtypeStruct((5 * RC, CK), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((RC, CK), jnp.float32) for _ in range(5)],
        compiler_params=_CPAR,
        interpret=interpret,
    )(packs.nrow, packs.kcol, packs.suc, packs.alw, packs.hd)
    return ckpts, row0


def ntc_backward_pallas(packs: NTCPacks, trans_log, interpret: bool = False):
    """(T_pad, 5*RC, CK) backward store (LP_DT: f32 default, bf16 wide)."""
    T_pad = packs.T_pad
    C = C_BWD
    assert T_pad % C == 0
    nc = T_pad // C
    tl = {k: np.float32(v) for k, v in trans_log.items()}
    kernel = functools.partial(_bwd_kernel, C=C, nc=nc, tl=tl, K=packs.K)
    rev = lambda c: nc - 1 - c
    out = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((C, NS, RC), lambda c: (rev(c), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, NKS, R, CK), lambda c: (rev(c), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, NSS, R, ACK), lambda c: (rev(c), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), lambda c: (rev(c), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), lambda c: (rev(c), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, 5 * RC, CK), lambda c: (rev(c), 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, 5 * RC, CK), jnp.float32),
        scratch_shapes=[pltpu.VMEM((RC, CK), jnp.float32) for _ in range(5)],
        compiler_params=_CPAR,
        interpret=interpret,
    )(packs.nrow, packs.kcol, packs.suc, packs.alw, packs.hd)
    return out


# ---------------------------------------------------------------------------
# posterior + viterbi forward kernel
# (ref getBorders: NTC.cpp:595-669; XLA: ntc_posterior_viterbi_batch)
# ---------------------------------------------------------------------------

def _pv_kernel(nrow_ref, kcol_ref, suc_ref, alw_ref, hd_ref,
               bwd_ref, z_ref, lp_ref, ch_ref, sl_ref, apEf_ref, fwdEf_ref,
               fA, fP, fS, fE, fI, vA, vP, vS, vE, vI, apEf, fwdEf,
               *scr, C, nc, tl, K, ckpt):
    ci = pl.program_id(0)

    @pl.when(ci == 0)
    def _():
        for st in (fA, fP, fS, fE, fI, vA, vP, vS, vE, vI, apEf, fwdEf):
            st[...] = jnp.full((RC, CK), NEG_INF, jnp.float32)

    E = _expand16()
    zcol = z_ref[...]                                    # (128, 1)

    if ckpt:
        # re-derive this chunk's backward rows from its entry checkpoint
        # (bwd_ref is the (1, 5*RC, CK) checkpoint block): identical
        # _bwd_step op order -> bit-equal to the full store, f32 all the
        # way into the Viterbi below
        bstates = scr[:5]
        bwd_buf = scr[5]
        for st_idx, st in enumerate(bstates):
            st[...] = bwd_ref[0, st_idx * RC:(st_idx + 1) * RC]

        def bbody(i2, _):
            i = C - 1 - i2
            t = ci * C + i
            outs = _bwd_step(i, t, nrow_ref, kcol_ref, suc_ref, alw_ref,
                             hd_ref, bstates, E, tl, K)
            for st_idx, v in enumerate(outs):
                bwd_buf[i, st_idx * RC:(st_idx + 1) * RC] = v
            return 0

        jax.lax.fori_loop(0, C, bbody, 0)
        bwd_row = lambda i, st: bwd_buf[i, st * RC:(st + 1) * RC]
    else:
        bwd_row = lambda i, st: bwd_ref[
            i, st * RC:(st + 1) * RC].astype(jnp.float32)

    def body(i, _):
        t = ci * C + i
        nT = jnp.transpose(nrow_ref[i])
        col = lambda s: nT[:, s:s + 1]
        mu_n, c1_n, c2_n = col(MU_N), col(C1_N), col(C2_N)
        is_term = col(ISTERM) > 0.5
        sig_tm1 = col(SIG_TM1)

        alwf = alw_ref[i].astype(jnp.float32)
        ok = (col(NPOS) * alwf) > 0.5
        cond = (col(CHAINF) * col(NPOS) * alwf) > 0.5
        n0alw = (col(N0) * alwf) > 0.5
        hd1, _, _, _ = _unpack_hd(hd_ref[i])

        mu_k16 = kcol_ref[i, K_MU]
        c1_k16 = kcol_ref[i, K_C1]
        c2_k16 = kcol_ref[i, K_C2]
        sg16m = kcol_ref[i, K_SIGM1][:, 0:1]
        dkm = sg16m - mu_k16
        sck = _exp16(E, c1_k16 - c2_k16 * dkm * dkm)

        d_n = sig_tm1 - mu_n
        scn = c1_n - c2_n * d_n * d_n
        sc = scn + sck - 2.0 * hd1

        init_col = jnp.where(n0alw, 0.0, NEG_INF)

        # ---- row + column gathers for BOTH the forward recurrence and
        # the Viterbi pass: the two share one value-equality one-hot per
        # read (the viterbi scratches are not written until the end of
        # the step, so gathering them up front is safe) ----
        geP_E, geP_I, geP_P = _row_gather(
            col(ROW_PREV), [fE[...], fI[...], fP[...]])
        geS_A, geS_P, geS_S, geS_E, geS_I = _row_gather(
            col(ROW_SAME), [fA[...], fP[...], fS[...], fE[...], fI[...]])
        aP_E, aP_I, aP_P = _row_gather(
            col(ROW_PREV), [vE[...], vI[...], vP[...]])
        aS_A, aS_P, aS_S, aS_E, aS_I = _row_gather(
            col(ROW_SAME), [vA[...], vP[...], vS[...], vE[...], vI[...]])
        ks_cur = kcol_ref[i, K_KS]
        g_same, g_suc, cs16, cpa16 = _col_gather(
            [geP_E, geP_I, geP_P, geS_A, geS_P, geS_S, geS_E, geS_I,
             aP_E, aP_I, aP_P, aS_A, aS_P, aS_S, aS_E, aS_I],
            _ksT_of(kcol_ref[i, K_KSP]), _dst_vals(ks_cur, K, "same"),
            _dst_vals(ks_cur, K, "prec"), want_slots=True)
        f_same, f_suc = g_same[:8], g_suc[:8]
        v_same, v_suc = g_same[8:], g_suc[8:]

        a_terms = []
        p_terms = []
        for ai in range(A):
            sl = lambda g: g[:, ai * CK:(ai + 1) * CK]
            a_terms += [sl(f_suc[0]) + tl["a1"], sl(f_suc[1]) + tl["a2"]]
            p_terms += [sl(f_suc[5]) + tl["p1"], sl(f_suc[6]) + tl["p2"],
                        sl(f_suc[7]) + tl["p3"]]
        a_new = jnp.where(ok, _lse(a_terms) + sc, NEG_INF)
        p_new = jnp.where(ok, _lse(p_terms) + sc, NEG_INF)
        s_new = jnp.where(ok, _lse(
            [f_same[2] + tl["s1"], f_same[0] + tl["s2"],
             f_same[1] + tl["s3"]]) + sc, NEG_INF)
        e_new = jnp.where(ok, _lse(
            [f_same[3], f_same[4] + tl["e2"], f_same[5] + tl["e3"],
             f_same[6] + tl["e4"]]) + sc, NEG_INF)

        e_above = _roll_grp(e_new, 1, NEG_INF, up=True)
        iA = jnp.where(cond, e_above + tl["i1"] + sc, NEG_INF)
        iB = jnp.where(cond, tl["i2"] + sc, NEG_INF)
        i_new = _affine_chain(iA, iB, up=True, maxplus=False)

        fwd_cols = [a_new, p_new, s_new, e_new, i_new]
        t0 = t == 0
        fwd_cols = [
            jnp.where(t0, init_col if st == E_ST else NEG_INF, v)
            for st, v in enumerate(fwd_cols)
        ]
        fA[...], fP[...], fS[...], fE[...], fI[...] = fwd_cols

        # ---- posteriors: the Viterbi below accumulates the global-Zb
        # form `lps` (per-t constants cancel in its argmax; keeps ap
        # values comparable with the scan path), while the STORED lp the
        # walk reads for the reported probabilities is normalized by the
        # COLUMN's own mass — equal to Z by the forward-backward
        # identity but immune to the ~0.2-nat fp32 drift of Zb over 16k
        # steps (matches the fp32 scan path's max-shifted lse form) ----
        lps = []
        mx = jnp.full((RC, 1), NEG_INF, jnp.float32)
        for st in range(5):
            bwd_st = bwd_row(i, st)
            lp_st = fwd_cols[st] + bwd_st - zcol
            lps.append(lp_st)
            mx = jnp.maximum(mx, jnp.max(lp_st, axis=1, keepdims=True))
        # per-read max across the CN n-slot sublanes: suffix roll-tree up
        # then prefix tree down broadcasts the group max to every row
        for up in (True, False):
            for s in range(CN.bit_length() - 1):
                mx = jnp.maximum(mx, _roll_grp(mx, 1 << s, NEG_INF, up))
        live_col = mx > NEG_THR
        mx_safe = jnp.where(live_col, mx, 0.0)
        tot = jnp.zeros((RC, 1), jnp.float32)
        for lp_st in lps:
            tot = tot + jnp.sum(jnp.exp(lp_st - mx_safe), axis=1,
                                keepdims=True)
        # sum the 8 sublanes of each read on the MXU, broadcast back
        tot16 = jnp.dot(jnp.transpose(E), tot,
                        preferred_element_type=jnp.float32, precision=PREC)
        tot_rd = _exp16(E, tot16)                        # (128, 1)
        col_rel = mx_safe + jnp.log(jnp.where(live_col, tot_rd, 1.0))
        for st in range(5):
            lp_ref[i, st * RC:(st + 1) * RC] = jnp.where(
                live_col, lps[st] - col_rel, NEG_INF).astype(lp_ref.dtype)

        # ---- viterbi over posteriors + first-match choices ----
        a_cands = []
        p_cands = []
        for ai in range(A):
            sl = lambda g: g[:, ai * CK:(ai + 1) * CK]
            a_cands += [sl(v_suc[0]), sl(v_suc[1])]
            p_cands += [sl(v_suc[6]), sl(v_suc[5]), sl(v_suc[7])]
        a_max, ch_a = _first_match(a_cands)
        p_max, ch_p = _first_match(p_cands)
        s_max, ch_s = _first_match([v_same[0], v_same[2], v_same[1]])
        e_max, ch_e = _first_match(
            [v_same[6], v_same[3], v_same[5], v_same[4]])

        va = jnp.where(ok, a_max + lps[A_ST], NEG_INF)
        vp = jnp.where(ok, p_max + lps[P_ST], NEG_INF)
        vs = jnp.where(ok, s_max + lps[S_ST], NEG_INF)
        ve = jnp.where(ok, e_max + lps[E_ST], NEG_INF)

        e_above_v = _roll_grp(ve, 1, NEG_INF, up=True)
        lpI = lps[I_ST]
        viA = jnp.where(cond, e_above_v + lpI, NEG_INF)
        viB = jnp.where(cond, lpI, NEG_INF)
        vi = _affine_chain(viA, viB, up=True, maxplus=True)
        i_prev = _roll_grp(vi, 1, NEG_INF, up=True)
        ch_i = jnp.where(e_above_v >= i_prev, 0, 1)

        ap_cols = [va, vp, vs, ve, vi]
        ap_cols = [
            jnp.where(t0, init_col if st == E_ST else NEG_INF, v)
            for st, v in enumerate(ap_cols)
        ]
        vA[...], vP[...], vS[...], vE[...], vI[...] = ap_cols

        packed = (ch_e | (ch_a << 2) | (ch_p << 5) | (ch_s << 9)
                  | (ch_i << 11))
        packed = jnp.where(t0, 0, packed)
        ch_ref[i] = packed.astype(ch_ref.dtype)   # <= 13 bits, i16-safe

        # walk slot word: the chosen predecessor slots (+1; 0 = absent).
        # cs is per (read, k-slot); the A/P predecessor slot depends on
        # the cell's chosen alphabet digit, selected from the A-major
        # cpa lanes per cell
        cs_E = _exp16_small(E, cs16 + 1.0)   # slot idx + 1 in [0, 128]
        cpa_E = _exp16_small(E, cpa16 + 1.0)
        ai_a = ch_a >> 1
        ai_p = ch_p // 3
        cpaA = jnp.zeros((RC, CK), jnp.float32)
        cpaP = jnp.zeros((RC, CK), jnp.float32)
        for a in range(A):
            sl_a = cpa_E[:, a * CK:(a + 1) * CK]
            cpaA = jnp.where(ai_a == a, sl_a, cpaA)
            cpaP = jnp.where(ai_p == a, sl_a, cpaP)
        sl_ref[i] = (cs_E.astype(jnp.int32)
                     | (cpaA.astype(jnp.int32) << SLB)
                     | (cpaP.astype(jnp.int32) << (2 * SLB)))

        apEf[...] = jnp.where(is_term, ap_cols[E_ST], apEf[...])
        fwdEf[...] = jnp.where(is_term, fwd_cols[E_ST], fwdEf[...])
        return 0

    jax.lax.fori_loop(0, C, body, 0)
    apEf_ref[...] = apEf[...]
    fwdEf_ref[...] = fwdEf[...]


def ntc_posterior_viterbi_pallas(packs: NTCPacks, bwd, Z_norm, trans_log,
                                 interpret: bool = False):
    """Returns (lp (T, 5*RC, CK) LP_DT — written over `bwd`'s buffer on
    the full-store path, choices (T, RC, CK) CH_DT, slots (T, RC, CK)
    int32 walk predecessor slots, apE_final, fwdE_final (RC, CK) f32).
    `bwd`: the (T, 5*RC, CK) full store, or on BWD_CKPT geometries the
    (ckpts, row0) pair from ntc_backward_ckpt_pallas (row0 unused
    here)."""
    T_pad = packs.T_pad
    C = C_PV
    assert T_pad % C == 0
    nc = T_pad // C
    tl = {k: np.float32(v) for k, v in trans_log.items()}
    kernel = functools.partial(_pv_kernel, C=C, nc=nc, tl=tl, K=packs.K,
                               ckpt=BWD_CKPT)
    zcol = jnp.repeat(Z_norm.astype(jnp.float32), CN)[:, None]  # (128, 1)
    if BWD_CKPT:
        bwd_in = bwd[0]           # (nc, 5*RC, CK) chunk-entry states
        bwd_spec = pl.BlockSpec((1, 5 * RC, CK), lambda c: (c, 0, 0),
                                memory_space=pltpu.VMEM)
        scratches = (
            [pltpu.VMEM((RC, CK), jnp.float32) for _ in range(17)]
            + [pltpu.VMEM((C, 5 * RC, CK), jnp.float32)]
        )
        aliases = {}
    else:
        bwd_in = bwd
        bwd_spec = pl.BlockSpec((C, 5 * RC, CK), lambda c: (c, 0, 0),
                                memory_space=pltpu.VMEM)
        scratches = [pltpu.VMEM((RC, CK), jnp.float32) for _ in range(12)]
        aliases = {5: 0}
    lp, ch, sl, apEf, fwdEf = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((C, NS, RC), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, NKS, R, CK), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, NSS, R, ACK), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            bwd_spec,
            pl.BlockSpec((RC, 1), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, 5 * RC, CK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RC, CK), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RC, CK), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, 5 * RC, CK), LP_DT),
            jax.ShapeDtypeStruct((T_pad, RC, CK), CH_DT),
            jax.ShapeDtypeStruct((T_pad, RC, CK), jnp.int32),
            jax.ShapeDtypeStruct((RC, CK), jnp.float32),
            jax.ShapeDtypeStruct((RC, CK), jnp.float32),
        ),
        scratch_shapes=scratches,
        input_output_aliases=aliases,
        compiler_params=_CPAR,
        interpret=interpret,
    )(packs.nrow, packs.kcol, packs.suc, packs.alw, packs.hd,
      bwd_in, zcol)
    return lp, ch, sl, apEf, fwdEf


# ---------------------------------------------------------------------------
# traceback walk kernel (ref: NTC.cpp:691-904; XLA: ops/ntc_walk)
# ---------------------------------------------------------------------------
#
# The XLA walk scan replays ~300 HLO ops per t step (3 unrolled micro-ops
# of gather + choice decode), i.e. seconds per bucket of pure dispatch
# overhead. Here each read is one SUBLANE of (16, 1) state vectors; the
# per-cell loads become one-hot row selections against the streamed lp /
# choice rows (value * one-hot matmul / mask-reduce, exact for 0/1
# weights), and the whole column's micro-ops run on-core. Records are
# written as (T, n_micro, 16, 8) f32 lanes [prob, p_seg, emit, state,
# basepos, start, k, e_seg] — every value is a small int or a probability,
# exact in f32 — and reduced by ops/ntc_walk.finish_records outside.

N_MICRO = 3          # 1 t-step + up to 2 in-column I-steps (ntc_walk)
NREC = 8             # record fields per micro-op
# start-pack rows
SP_I0, SP_J0, SP_K0, SP_VALID, SP_NM1, SP_TM1 = 0, 1, 2, 3, 4, 5
# walk-state scratch columns
W_ACT, W_STATE, W_I, W_J, W_K, W_N, W_SEG, W_STUCK = 0, 1, 2, 3, 4, 5, 6, 7


def _walk_kernel(nrow_ref, sl_ref, lp_ref, ch_ref, sp_ref,
                 rec_ref, fin_ref, st, *, C, nc, Kdiv, half, S_max):
    ci = pl.program_id(0)
    chunk = nc - 1 - ci

    @pl.when(ci == 0)
    def _():
        st[...] = jnp.zeros((R, 16), jnp.float32)

    r_col = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).astype(jnp.float32)
    lane_ck = jax.lax.broadcasted_iota(jnp.int32, (R, CK), 1).astype(jnp.float32)
    lane_rc = jax.lax.broadcasted_iota(jnp.int32, (R, RC), 1).astype(jnp.float32)
    lane_st = jax.lax.broadcasted_iota(jnp.int32, (R, 5 * RC), 1).astype(jnp.float32)
    i0c = sp_ref[SP_I0][:, None]
    j0c = sp_ref[SP_J0][:, None]
    k0c = sp_ref[SP_K0][:, None]
    valid0 = sp_ref[SP_VALID][:, None] > 0.5
    nm1 = sp_ref[SP_NM1][:, None]
    tm1 = sp_ref[SP_TM1][:, None]
    sel = lambda w, oh: jnp.sum(w * oh, axis=1, keepdims=True)

    def body(i2, _):
        i = C - 1 - i2
        t = (chunk * C + i).astype(jnp.float32)
        lp_t = jnp.maximum(lp_ref[i].astype(jnp.float32), NEG_BIG)
        ch_t = ch_ref[i].astype(jnp.float32)            # (RC, CK) < 2^13
        # the slot word spans 3*SLB bits (27 at CK=256) — beyond f32's
        # exact-integer range (2^24), so the one-hot row select runs as
        # TWO dots on 12-bit/15-bit halves and recombines in int32
        sl_lo_t = (sl_ref[i] & 0xFFF).astype(jnp.float32)
        sl_hi_t = (sl_ref[i] >> 12).astype(jnp.float32)
        nr = nrow_ref[i]                                # (NS, 128)
        rs_row = nr[ROW_SAME][None, :]
        rp_row = nr[ROW_PREV][None, :]

        active = st[:, W_ACT:W_ACT + 1] > 0.5
        state = st[:, W_STATE:W_STATE + 1]
        si = st[:, W_I:W_I + 1]
        sj = st[:, W_J:W_J + 1]
        sk = st[:, W_K:W_K + 1]
        sn = st[:, W_N:W_N + 1]
        seg = st[:, W_SEG:W_SEG + 1]
        stuck = st[:, W_STUCK:W_STUCK + 1] > 0.5

        act_now = (t == tm1) & valid0
        active = active | act_now
        state = jnp.where(act_now, float(E_ST), state)
        si = jnp.where(act_now, i0c, si)
        sj = jnp.where(act_now, j0c, sj)
        sk = jnp.where(act_now, k0c, sk)
        sn = jnp.where(act_now, nm1, sn)
        seg = jnp.where(act_now, 0.0, seg)
        t1 = t == 1.0
        t_pos = t >= 1.0

        did_t = jnp.zeros((R, 1), bool)
        for m in range(N_MICRO):
            # cell loads: one-hot row select per read, lane select via mask
            Vj = (lane_ck == sj).astype(jnp.float32)
            U1 = (lane_st == state * RC + CN * r_col + si).astype(
                jnp.float32)
            P = jnp.dot(U1, lp_t, preferred_element_type=jnp.float32,
                        precision=PREC)
            lp_state = sel(P, Vj)
            lp_state = jnp.where(lp_state <= NEG_THR, NEG_INF, lp_state)
            U2 = (lane_rc == CN * r_col + si).astype(jnp.float32)
            Pc = jnp.dot(U2, ch_t, preferred_element_type=jnp.float32,
                         precision=PREC)
            ch = sel(Pc, Vj).astype(jnp.int32)
            Ps_lo = jnp.dot(U2, sl_lo_t, preferred_element_type=jnp.float32,
                            precision=PREC)
            Ps_hi = jnp.dot(U2, sl_hi_t, preferred_element_type=jnp.float32,
                            precision=PREC)
            slv = (sel(Ps_lo, Vj).astype(jnp.int32)
                   | (sel(Ps_hi, Vj).astype(jnp.int32) << 12))

            is_I = active & (state == float(I_ST)) & t_pos
            i_break = is_I & (sn == 1.0)
            i_go = is_I & ~i_break
            tstep = active & (state != float(I_ST)) & (~did_t) & t_pos
            is_A = state == float(A_ST)
            is_P = state == float(P_ST)
            is_S = state == float(S_ST)
            is_E = state == float(E_ST)
            brk = tstep & t1 & (
                is_E | is_P | ((is_A | is_S) & (sn == 1.0))
            )
            go = tstep & ~brk
            emit_break = brk & (is_E | is_A | is_P)   # S break: no emit
            emit_go = go & (is_A | is_P)
            emit = emit_break | emit_go

            prob = jnp.where(i_go | go, jnp.exp(lp_state), 0.0)
            p_seg = jnp.where(i_go | go, seg, float(S_max))
            e_state = jnp.where(is_P, 1.0, 0.0)
            e_bp = jnp.where(emit_break, float(half), sn - 1.0 + half)
            e_start = jnp.where(emit_break, 0.0, t - 1.0)
            e_seg = jnp.where(emit, seg, float(S_max))
            rec_ref[i, m] = jnp.concatenate(
                [prob, p_seg, emit.astype(jnp.float32), e_state, e_bp,
                 e_start, sk, e_seg], axis=1)

            # choice decode (packing: ntc_posterior_viterbi kernels)
            chE = (ch & 3).astype(jnp.float32)
            chA = (ch >> 2) & 7
            chP = ((ch >> 5) & 15).astype(jnp.float32)
            chS = ((ch >> 9) & 3).astype(jnp.float32)
            chI = ((ch >> 11) & 1).astype(jnp.float32)
            rs = sel(rs_row * U2, jnp.ones((R, 1), jnp.float32))
            rp = sel(rp_row * U2, jnp.ones((R, 1), jnp.float32))
            # predecessor slots from the pv kernel's slot word (+1 coded)
            cs = ((slv & SLM) - 1).astype(jnp.float32)
            cpaA = (((slv >> SLB) & SLM) - 1).astype(jnp.float32)
            cpaP = (((slv >> (2 * SLB)) & SLM) - 1).astype(jnp.float32)
            cpa = jnp.where(is_A, cpaA, cpaP)
            chAf = chA.astype(jnp.float32)
            ai = jnp.where(is_A, jnp.floor(chAf / 2.0),
                           jnp.floor(chP / 3.0))
            stE = jnp.where(
                chE == 0.0, float(E_ST),
                jnp.where(chE == 1.0, float(A_ST),
                          jnp.where(chE == 2.0, float(S_ST), float(P_ST))),
            )
            odd_A = chAf - 2.0 * jnp.floor(chAf / 2.0)
            stA = jnp.where(odd_A == 0.0, float(E_ST), float(I_ST))
            m3 = chP - ai * 3.0
            stP = jnp.where(m3 == 0.0, float(E_ST),
                            jnp.where(m3 == 1.0, float(S_ST), float(I_ST)))
            stS = jnp.where(chS == 0.0, float(E_ST),
                            jnp.where(chS == 1.0, float(P_ST), float(I_ST)))
            stI = jnp.where(chI == 0.0, float(E_ST), float(I_ST))
            k_prec = jnp.floor(sk / A) + ai * Kdiv

            st_go = jnp.where(
                is_E, stE, jnp.where(is_A, stA, jnp.where(is_P, stP, stS))
            )
            i_go_slot = jnp.where(is_E | is_P, rs, rp)
            j_go_slot = jnp.where(is_E | is_S, cs, cpa)
            k_go = jnp.where(is_A | is_P, k_prec, sk)
            n_go = jnp.where(is_A | is_S, sn - 1.0, sn)

            state = jnp.where(i_go, stI, jnp.where(go, st_go, state))
            si = jnp.clip(
                jnp.where(i_go, si - 1.0, jnp.where(go, i_go_slot, si)),
                0.0, CN - 1.0)
            sj = jnp.clip(jnp.where(go, j_go_slot, sj), 0.0, CK - 1.0)
            sk = jnp.where(go, k_go, sk)
            sn = jnp.where(i_go, sn - 1.0, jnp.where(go, n_go, sn))
            seg = seg + jnp.where(emit, 1.0, 0.0)
            active = active & ~(i_break | brk)
            did_t = did_t | go | brk

        stuck = stuck | (active & ~did_t & t_pos)
        cols = [active, state, si, sj, sk, sn, seg, stuck]
        out = jnp.concatenate(
            [c.astype(jnp.float32) for c in cols]
            + [jnp.zeros((R, 16 - len(cols)), jnp.float32)], axis=1)
        st[...] = out
        return 0

    jax.lax.fori_loop(0, C, body, 0)
    fin_ref[...] = st[...]


def ntc_walk_pallas(packs: NTCPacks, lp, choices, slots, i0, j0, k0,
                    valid_start, N_r, T_r, K: int, kmer_size: int,
                    S_max: int, interpret: bool = False):
    """Mosaic traceback walk + XLA finish. Same contract as
    ops/ntc_walk.ntc_walk_batch with kernel_layout=True; `slots` is the
    pv kernel's predecessor-slot word."""
    from dynamont_tpu.ops.ntc_walk import finish_records

    T_pad = packs.T_pad
    C = C_WK
    assert T_pad % C == 0
    nc = T_pad // C
    sp = jnp.stack([
        _f32(i0), _f32(j0), _f32(k0), _f32(valid_start),
        _f32(N_r - 1), _f32(T_r - 1),
        jnp.zeros((R,), jnp.float32), jnp.zeros((R,), jnp.float32),
    ], axis=0)                                           # (8, 16)
    kernel = functools.partial(
        _walk_kernel, C=C, nc=nc, Kdiv=K // A, half=kmer_size // 2,
        S_max=S_max)
    rev = lambda c: (nc - 1 - c, 0, 0, 0)
    rec, fin = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((C, NS, RC), lambda c: (nc - 1 - c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), lambda c: (nc - 1 - c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 5 * RC, CK), lambda c: (nc - 1 - c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), lambda c: (nc - 1 - c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, R), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, N_MICRO, R, NREC), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 16), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, N_MICRO, R, NREC), jnp.float32),
            jax.ShapeDtypeStruct((R, 16), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((R, 16), jnp.float32)],
        compiler_params=_CPAR,
        interpret=interpret,
    )(packs.nrow, slots, lp, choices, sp)

    fld = lambda f, dt: (rec[..., f].transpose(2, 0, 1)
                         .reshape(R, T_pad * N_MICRO).astype(dt))
    probs = fld(0, jnp.float32)
    p_seg = fld(1, jnp.int32)
    e_state = fld(3, jnp.int32)
    e_bp = fld(4, jnp.int32)
    e_start = fld(5, jnp.int32)
    e_k = fld(6, jnp.int32)
    e_seg = fld(7, jnp.int32)
    st_a, bp_a, start_a, k_a, med = jax.vmap(
        lambda *r: finish_records(*r, S_max=S_max)
    )(probs, p_seg, e_state, e_bp, e_start, e_k, e_seg)
    seg_cnt = fin[:, W_SEG].astype(jnp.int32)
    stuck = fin[:, W_STUCK] > 0.5
    return seg_cnt, st_a, bp_a, start_a, k_a, med, (seg_cnt > S_max) | stuck


# ---------------------------------------------------------------------------
# Baum-Welch training kernels (ref trainParams: NTC.cpp:923-1130; per-read
# XLA path: ops/ntc_train.py)
# ---------------------------------------------------------------------------
#
# Training needs expectation sums E[fwd(t) + trans + score + bwd(t+1)] over
# every transition class, plus posterior-weighted per-k-mer signal moments.
# Two kernels:
#   * a forward-store kernel (the pv kernel's forward half) writes the full
#     (T, 640, 128) forward lattice;
#   * a train kernel re-runs the BACKWARD recurrence (its carries naturally
#     hold column t+1 while processing column t — exactly the pairing the
#     transition terms need), reads the forward store, and keeps 13 running
#     per-cell logaddexp accumulators + centered per-k-mer moment sums
#     (accumulated about the model mean mu_k to avoid cancellation; fp32 —
#     the per-read fp64 path remains the parity baseline).

TERMS = ("e2", "e3", "e4", "s1", "s2", "s3", "p1", "p2", "p3",
         "a1", "a2", "i1", "i2")
N_TERMS = 13
# the 13 trained NTK transitions, as an SMEM input so that training's
# per-batch parameter updates do NOT recompile the kernels
TL_KEYS = ("a1", "a2", "p1", "p2", "p3", "s1", "s2", "s3",
           "e2", "e3", "e4", "i1", "i2")


def _tl_from_ref(tl_ref):
    return {k: tl_ref[i] for i, k in enumerate(TL_KEYS)}


def _tl_array(trans_log):
    return jnp.asarray([trans_log[k] for k in TL_KEYS], jnp.float32)


def _fwd_kernel(tl_ref, nrow_ref, kcol_ref, suc_ref, alw_ref,
                hd_ref, fwd_ref, fA, fP, fS, fE, fI, *, C, K):
    tl = _tl_from_ref(tl_ref)
    ci = pl.program_id(0)

    @pl.when(ci == 0)
    def _():
        for st in (fA, fP, fS, fE, fI):
            st[...] = jnp.full((RC, CK), NEG_INF, jnp.float32)

    E = _expand16()

    def body(i, _):
        t = ci * C + i
        nT = jnp.transpose(nrow_ref[i])
        col = lambda s: nT[:, s:s + 1]
        mu_n, c1_n, c2_n = col(MU_N), col(C1_N), col(C2_N)
        sig_tm1 = col(SIG_TM1)

        alwf = alw_ref[i].astype(jnp.float32)
        ok = (col(NPOS) * alwf) > 0.5
        cond = (col(CHAINF) * col(NPOS) * alwf) > 0.5
        n0alw = (col(N0) * alwf) > 0.5
        hd1, _, _, _ = _unpack_hd(hd_ref[i])

        mu_k16 = kcol_ref[i, K_MU]
        c1_k16 = kcol_ref[i, K_C1]
        c2_k16 = kcol_ref[i, K_C2]
        sg16m = kcol_ref[i, K_SIGM1][:, 0:1]
        dkm = sg16m - mu_k16
        sck = _exp16(E, c1_k16 - c2_k16 * dkm * dkm)

        d_n = sig_tm1 - mu_n
        scn = c1_n - c2_n * d_n * d_n
        sc = scn + sck - 2.0 * hd1
        init_col = jnp.where(n0alw, 0.0, NEG_INF)

        geP_E, geP_I, geP_P = _row_gather(
            col(ROW_PREV), [fE[...], fI[...], fP[...]])
        geS_A, geS_P, geS_S, geS_E, geS_I = _row_gather(
            col(ROW_SAME), [fA[...], fP[...], fS[...], fE[...], fI[...]])
        ks_cur = kcol_ref[i, K_KS]
        f_same, f_suc = _col_gather(
            [geP_E, geP_I, geP_P, geS_A, geS_P, geS_S, geS_E, geS_I],
            _ksT_of(kcol_ref[i, K_KSP]), _dst_vals(ks_cur, K, "same"),
            _dst_vals(ks_cur, K, "prec"))

        a_terms = []
        p_terms = []
        for ai in range(A):
            sl = lambda g: g[:, ai * CK:(ai + 1) * CK]
            a_terms += [sl(f_suc[0]) + tl["a1"], sl(f_suc[1]) + tl["a2"]]
            p_terms += [sl(f_suc[5]) + tl["p1"], sl(f_suc[6]) + tl["p2"],
                        sl(f_suc[7]) + tl["p3"]]
        a_new = jnp.where(ok, _lse(a_terms) + sc, NEG_INF)
        p_new = jnp.where(ok, _lse(p_terms) + sc, NEG_INF)
        s_new = jnp.where(ok, _lse(
            [f_same[2] + tl["s1"], f_same[0] + tl["s2"],
             f_same[1] + tl["s3"]]) + sc, NEG_INF)
        e_new = jnp.where(ok, _lse(
            [f_same[3], f_same[4] + tl["e2"], f_same[5] + tl["e3"],
             f_same[6] + tl["e4"]]) + sc, NEG_INF)

        e_above = _roll_grp(e_new, 1, NEG_INF, up=True)
        iA = jnp.where(cond, e_above + tl["i1"] + sc, NEG_INF)
        iB = jnp.where(cond, tl["i2"] + sc, NEG_INF)
        i_new = _affine_chain(iA, iB, up=True, maxplus=False)

        fwd_cols = [a_new, p_new, s_new, e_new, i_new]
        t0 = t == 0
        fwd_cols = [
            jnp.where(t0, init_col if st == E_ST else NEG_INF, v)
            for st, v in enumerate(fwd_cols)
        ]
        fA[...], fP[...], fS[...], fE[...], fI[...] = fwd_cols
        for st, v in enumerate(fwd_cols):
            fwd_ref[i, st * RC:(st + 1) * RC] = v
        return 0

    jax.lax.fori_loop(0, C, body, 0)


def ntc_fwd_store_pallas(packs: NTCPacks, trans_log,
                         interpret: bool = False):
    """(T_pad, 640, 128) f32 forward store (pv kernel's forward half)."""
    T_pad = packs.T_pad
    C = C_PV
    assert T_pad % C == 0
    nc = T_pad // C
    kernel = functools.partial(_fwd_kernel, C=C, K=packs.K)
    out = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((C, NS, RC), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, NKS, R, CK), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, NSS, R, ACK), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, 5 * RC, CK), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, 5 * RC, CK), jnp.float32),
        scratch_shapes=[pltpu.VMEM((RC, CK), jnp.float32) for _ in range(5)],
        compiler_params=_CPAR,
        interpret=interpret,
    )(_tl_array(trans_log), packs.nrow, packs.kcol, packs.suc,
      packs.alw, packs.hd)
    return out


def _train_kernel(tl_ref, nrow_ref, kcol_ref, suc_ref,
                  alw_ref, hd_ref, fwd_ref, z_ref, tacc_ref, em_ref,
                  b0_ref, *scr, C, nc, K):
    tl = _tl_from_ref(tl_ref)
    stA, stP, stS, stE, stI = scr[:5]
    accs = scr[5:5 + N_TERMS]
    em = scr[5 + N_TERMS]
    ci = pl.program_id(0)
    chunk = nc - 1 - ci

    @pl.when(ci == 0)
    def _():
        for st in (stA, stP, stS, stE, stI):
            st[...] = jnp.full((RC, CK), NEG_INF, jnp.float32)
        for a in accs:
            a[...] = jnp.full((RC, CK), NEG_INF, jnp.float32)
        em[...] = jnp.zeros((3 * R, K), jnp.float32)

    E = _expand16()
    zcol = z_ref[...]
    kiota = jax.lax.broadcasted_iota(jnp.int32, (CK, K), 1).astype(jnp.float32)
    r3 = (jax.lax.broadcasted_iota(jnp.int32, (3, 3 * CN), 1) // CN
          == jax.lax.broadcasted_iota(jnp.int32, (3, 3 * CN), 0)
          ).astype(jnp.float32)

    def body(i2, _):
        i = C - 1 - i2
        t = chunk * C + i
        nT = jnp.transpose(nrow_ref[i])
        col = lambda s: nT[:, s:s + 1]
        mu_n, c1_n, c2_n = col(MU_N), col(C1_N), col(C2_N)
        mu_n2, c1_n2, c2_n2 = col(MU_N2), col(C1_N2), col(C2_N2)
        n_pos = col(NPOS) > 0.5
        n_lt = col(NLT) > 0.5
        chup = col(CHAINUP) > 0.5
        d01, d02 = col(D01), col(D02)
        is_term = col(ISTERM) > 0.5
        dead_r = col(DEAD) > 0.5
        sig_t, sig_tm1 = col(SIG_T), col(SIG_TM1)

        alwf = alw_ref[i].astype(jnp.float32)
        alw = alwf > 0.5
        rowNalw = (col(ROWN) * alwf) > 0.5
        hd1, hd2, hd1s, hd2s = _unpack_hd(hd_ref[i])

        mu_k16 = kcol_ref[i, K_MU]
        c1_k16 = kcol_ref[i, K_C1]
        c2_k16 = kcol_ref[i, K_C2]
        sg16 = kcol_ref[i, K_SIG][:, 0:1]
        sg16m = kcol_ref[i, K_SIGM1][:, 0:1]
        dk = sg16 - mu_k16
        sck = _exp16(E, c1_k16 - c2_k16 * dk * dk)
        dkm = sg16m - mu_k16
        sck_m1 = _exp16(E, c1_k16 - c2_k16 * dkm * dkm)

        d_n = sig_t - mu_n
        scn = c1_n - c2_n * d_n * d_n
        d_n2 = sig_t - mu_n2
        scn2 = c1_n2 - c2_n2 * d_n2 * d_n2
        sc1 = scn + sck - 2.0 * hd1
        sc2 = scn2 + sck - 2.0 * hd2

        gnsE, gnsP = _row_gather(col(BROW_SAME), [stE[...], stP[...]])
        gnnS, gnnA = _row_gather(col(BROW_NEXT), [stS[...], stA[...]])

        ks_cur = kcol_ref[i, K_KS]
        gk_same, gk_suc = _col_gather(
            [gnsE, gnnS, gnsP, gnnA], _ksT_of(kcol_ref[i, K_KSN]),
            _dst_vals(ks_cur, K, "same"), _dst_vals(ks_cur, K, "suc"))
        gskE, gnkS = gk_same[0], gk_same[1]
        gspP, gnaA = gk_suc[2], gk_suc[3]

        a_new = jnp.where(n_pos, gskE + sc1, NEG_INF)
        p_new = jnp.logaddexp(
            jnp.where(n_pos, gskE + tl["e2"] + sc1, NEG_INF),
            jnp.where(n_lt, gnkS + tl["s1"] + sc2, NEG_INF),
        )

        mu_s16 = suc_ref[i, S_MU]
        c1_s16 = suc_ref[i, S_C1]
        c2_s16 = suc_ref[i, S_C2]
        dsu = sg16 - mu_s16
        scs = _exp16(E, c1_s16 - c2_s16 * dsu * dsu)

        # forward columns of THIS t (terms pair fwd[t] with bwd[t+1])
        f_t = [fwd_ref[i, st * RC:(st + 1) * RC] for st in range(5)]
        fAt, fPt, fSt, fEt, fIt = f_t

        base_s = jnp.where(n_pos, gskE + tl["e3"] + sc1, NEG_INF)
        base_e = jnp.where(n_pos, gskE + tl["e4"] + sc1, NEG_INF)
        gnkS2 = gnkS + sc2
        s_terms = [base_s]
        e_terms = [base_e]
        i_terms = []
        tacc = {}
        # transition expectations sharing the bwd pass's gathered terms
        # (ref: NTC.cpp:935-989; XLA: ntc_train.train_transitions)
        tacc["e2"] = jnp.where(n_pos, fPt + tl["e2"] + sc1 + gskE, NEG_INF)
        tacc["e3"] = jnp.where(n_pos, fSt + tl["e3"] + sc1 + gskE, NEG_INF)
        tacc["e4"] = jnp.where(n_pos, fEt + tl["e4"] + sc1 + gskE, NEG_INF)
        tacc["s1"] = jnp.where(n_lt, fPt + tl["s1"] + sc2 + gnkS, NEG_INF)
        tacc["s2"] = jnp.where(n_lt, fEt + tl["s2"] + sc2 + gnkS, NEG_INF)
        tacc["s3"] = jnp.where(n_lt, fIt + tl["s3"] + sc2 + gnkS, NEG_INF)
        for nm in ("p1", "p2", "p3", "a1", "a2"):
            tacc[nm] = jnp.full((RC, CK), NEG_INF, jnp.float32)
        for ai in range(A):
            scs_ai = scs[:, ai * CK:(ai + 1) * CK]
            m1 = jnp.where(d01 != float(ai), 1.0, 0.0)
            m2 = jnp.where(d02 != float(ai), 1.0, 0.0)
            sc1s = scn + scs_ai - 2.0 * (hd1s + m1)
            sc2s = scn2 + scs_ai - 2.0 * (hd2s + m2)
            gspP_ai = jnp.where(
                n_pos, gspP[:, ai * CK:(ai + 1) * CK] + sc1s, NEG_INF)
            gnaA_ai = jnp.where(
                n_lt, gnaA[:, ai * CK:(ai + 1) * CK] + sc2s, NEG_INF)
            s_terms.append(gspP_ai + tl["p1"])
            e_terms.append(gspP_ai + tl["p2"])
            e_terms.append(gnaA_ai + tl["a1"])
            i_terms.append(gspP_ai + tl["p3"])
            i_terms.append(gnaA_ai + tl["a2"])
            tacc["p1"] = jnp.logaddexp(tacc["p1"],
                                       fSt + tl["p1"] + gspP_ai)
            tacc["p2"] = jnp.logaddexp(tacc["p2"],
                                       fEt + tl["p2"] + gspP_ai)
            tacc["p3"] = jnp.logaddexp(tacc["p3"],
                                       fIt + tl["p3"] + gspP_ai)
            tacc["a1"] = jnp.logaddexp(tacc["a1"],
                                       fEt + tl["a1"] + gnaA_ai)
            tacc["a2"] = jnp.logaddexp(tacc["a2"],
                                       fIt + tl["a2"] + gnaA_ai)
        e_terms.append(jnp.where(n_lt, gnkS2 + tl["s2"], NEG_INF))
        i_terms.append(jnp.where(n_lt, gnkS2 + tl["s3"], NEG_INF))
        s_new = _lse(s_terms)
        e_new = _lse(e_terms)
        i_new = _lse(i_terms)

        d_nm1 = sig_tm1 - mu_n2
        scn2_m1 = c1_n2 - c2_n2 * d_nm1 * d_nm1
        sc_i = scn2_m1 + sck_m1 - 2.0 * hd2
        ok_i = chup & (t > 0) & n_lt
        iB = jnp.where(ok_i, tl["i2"] + sc_i, NEG_INF)
        i_full = _affine_chain(i_new, iB, up=False, maxplus=False)
        i_below = _roll_grp(i_full, 1, NEG_INF, up=False)
        e_new = jnp.logaddexp(
            e_new, jnp.where(ok_i, i_below + tl["i1"] + sc_i, NEG_INF))
        i_new = i_full

        outs = []
        termE = jnp.where(rowNalw, 0.0, NEG_INF)
        for st_idx, v in ((A_ST, a_new), (P_ST, p_new), (S_ST, s_new),
                          (E_ST, e_new), (I_ST, i_new)):
            v = jnp.where(alw, v, NEG_INF)
            term = termE if st_idx == E_ST else jnp.full_like(v, NEG_INF)
            v = jnp.where(is_term, term, jnp.where(dead_r, NEG_INF, v))
            outs.append(v)
        stA[...], stP[...], stS[...], stE[...], stI[...] = outs

        # i1/i2 within-column terms (ref: NTC.cpp:990-999): the stored
        # (masked) I of the slot above, same column
        bI_up = _roll_grp(outs[I_ST], 1, NEG_INF, up=False)
        tacc["i1"] = jnp.where(ok_i, fEt + tl["i1"] + sc_i + bI_up,
                               NEG_INF)
        tacc["i2"] = jnp.where(ok_i, fIt + tl["i2"] + sc_i + bI_up,
                               NEG_INF)
        for a_ref, nm in zip(accs, TERMS):
            a_ref[...] = jnp.logaddexp(a_ref[...], tacc[nm])

        # posterior-weighted k-mer moments about mu_k (trainEmission,
        # ref: NTC.cpp:1059-1130): w = exp(lse_states(fwd + bwd - Z)),
        # binned by k-mer VALUE on the MXU
        lw = f_t[0] + outs[0] - zcol
        for st in range(1, 5):
            lw = jnp.logaddexp(lw, f_t[st] + outs[st] - zcol)
        w = jnp.where(alw & (t >= 1), jnp.exp(lw), 0.0)
        mu_ck = _exp16(E, mu_k16)
        dmu = sig_tm1 - mu_ck
        wd = w * dmu
        wdd = wd * dmu
        ksT_col = _ksT_of(kcol_ref[i, K_KS])
        for r in range(R):
            oh = (ksT_col[:, r:r + 1] == kiota).astype(jnp.float32)
            x_r = jnp.concatenate(
                [w[r * CN:(r + 1) * CN], wd[r * CN:(r + 1) * CN],
                 wdd[r * CN:(r + 1) * CN]], axis=0)        # (24, CK)
            # inner: value-binning is a <=1-match gather (dedup) -> the
            # exact 3-pass bf16 form; outer (3, 24) row-sum stays HIGHEST
            y = jnp.dot(r3, _oh_dot(x_r, oh, onehot_left=False),
                        preferred_element_type=jnp.float32,
                        precision=PREC)                    # (3, K)
            em[r * 3:(r + 1) * 3] = em[r * 3:(r + 1) * 3] + y
        return 0

    jax.lax.fori_loop(0, C, body, 0)
    off = 0
    for a_ref in accs:
        tacc_ref[off:off + RC] = a_ref[...]
        off += RC
    em_ref[...] = em[...]
    for st_idx, st in enumerate((stA, stP, stS, stE, stI)):
        b0_ref[st_idx * RC:(st_idx + 1) * RC] = st[...]


def ntc_train_pallas(packs: NTCPacks, fwd, Z_norm, trans_log,
                     interpret: bool = False):
    """Batched Baum-Welch accumulators. fwd: (T, 640, 128) forward store
    (ntc_fwd_store_pallas); the column's masked k-mer values
    slot-major (column t itself). Returns (tacc (13*128, 128) per-cell
    term accumulators in TERMS order, em (3*16, K) centered moment sums
    [w, w*(s-mu_k), w*(s-mu_k)^2] per read, b0 (5*128, 128) backward
    column 0 for the Zb gate)."""
    T_pad = packs.T_pad
    C = C_BWD
    assert T_pad % C == 0
    nc = T_pad // C
    K = packs.K
    kernel = functools.partial(_train_kernel, C=C, nc=nc, K=K)
    rev3 = lambda c: (nc - 1 - c, 0, 0)
    rev4 = lambda c: (nc - 1 - c, 0, 0, 0)
    zcol = jnp.repeat(Z_norm.astype(jnp.float32), CN)[:, None]
    tacc, em, b0 = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((C, NS, RC), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, NKS, R, CK), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, NSS, R, ACK), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, RC, CK), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 5 * RC, CK), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((RC, 1), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N_TERMS * RC, CK), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * R, K), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * RC, CK), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N_TERMS * RC, CK), jnp.float32),
            jax.ShapeDtypeStruct((3 * R, K), jnp.float32),
            jax.ShapeDtypeStruct((5 * RC, CK), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((RC, CK), jnp.float32)] * (5 + N_TERMS)
            + [pltpu.VMEM((3 * R, K), jnp.float32)]
        ),
        compiler_params=_CPAR,
        interpret=interpret,
    )(_tl_array(trans_log), packs.nrow, packs.kcol, packs.suc,
      packs.alw, packs.hd, fwd, zcol)
    return tacc, em, b0


# ---------------------------------------------------------------------------
# geometry instantiation
# ---------------------------------------------------------------------------

_GEOM_CACHE: dict = {}


def geometry(r: int, cn: int, ck: int):
    """Module instance of these kernels at bucket geometry (r, cn, ck).

    The default (16, 8, 128) geometry IS this module; other geometries —
    e.g. the overflow retry rung's (8, 16, 256), double the candidate
    caps of (16, 8, 128) at half the reads — are separate module objects
    executed from the same source file, so each instance's kernels close
    over their own trace-time constants (no shared mutable state).
    Instances are cached; jit caches key on the kernel functions'
    identity, so repeated calls reuse compiles.
    """
    if (r, cn, ck) == (R, CN, CK):
        return sys.modules[__name__]
    key = (r, cn, ck)
    mod = _GEOM_CACHE.get(key)
    if mod is None:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            f"{__name__}__g{r}x{cn}x{ck}", __file__)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod._set_geometry(r, cn, ck)
        _GEOM_CACHE[key] = mod
    return mod
