"""Mosaic NTC kernels vs the XLA scan path (interpret mode on CPU).

The kernels (ops/ntc_pallas) are the production TPU path for the NTC
scans; on TPU they were validated bit-for-bit on choices/finals and to
fp32 reduction noise (~2e-4) on the stores. This suite runs the same
comparison in Pallas interpret mode so CI covers the kernel bodies.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamont_tpu.constants import NT_TRANSITIONS, NTK_TRANSITIONS
from dynamont_tpu.models.ntc_batch import round_up
from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.ops import ntc_batch as nb
from dynamont_tpu.ops import ntc_pallas as npk
from dynamont_tpu.utils.kmer import seq_to_kmer_ids

from tests.synthetic import make_read


@pytest.fixture(scope="module")
def setup():
    model = load_model_for_pore("rna002")
    pore = "rna002"
    trans_log = {k: math.log(v) for k, v in NTK_TRANSITIONS[pore].items()}
    nt = NT_TRANSITIONS[pore]
    log_ppm, log_ppe = math.log(nt["m1"]), math.log(nt["e2"])
    means, c1, c2 = model.score_params()
    A, S = model.alphabet_size, model.kmer_size
    dtype = jnp.float32
    CN, CK0 = npk.CN, npk.CK - npk.CN

    sigs, kids = [], []
    for s in range(npk.R):
        sig, read = make_read(model, n_bases=20 + (s % 3) * 5, seed=s)
        sigs.append(sig)
        kids.append(np.asarray(seq_to_kmer_ids(read, S, A), np.int32))
    T_arr = np.array([len(s) + 1 for s in sigs], np.int32)
    N_arr = np.array([len(k) + 1 for k in kids], np.int32)
    T_pad = round_up(int(T_arr.max()), npk.C_BWD * npk.C_PV)
    N2 = round_up(int(N_arr.max()), 16)
    sigp = np.zeros((npk.R, T_pad - 1), np.float32)
    kidp = np.zeros((npk.R, N2 - 1), np.int32)
    for j in range(npk.R):
        sigp[j, : T_arr[j] - 1] = sigs[j]
        kidp[j, : N_arr[j] - 1] = kids[j]

    mt = jnp.asarray(means, dtype)
    sdt = jnp.asarray(model.stdevs, dtype)
    c1t = jnp.asarray(c1, dtype)
    c2t = jnp.asarray(c2, dtype)
    sigj, kidj = jnp.asarray(sigp), jnp.asarray(kidp)
    T_r, N_r = jnp.asarray(T_arr), jnp.asarray(N_arr)

    pn = nb.pre_tn_batch(sigj, kidj, N_r, T_r, mt, sdt, log_ppm, log_ppe,
                         CN, dtype)
    pk = nb.pre_tk_batch(sigj, T_r, mt, c1t, c2t, log_ppm, log_ppe, A,
                         CK0, dtype)
    plan, dims = nb.build_plan_batch(pn.cand, pn.cnt, pk.cand, pk.cnt,
                                     kidj, N_r, mt, c1t, c2t, A, S, dtype)
    sigd = sigj.astype(dtype)
    bwd_x = nb.ntc_backward_batch(plan, dims, sigd, trans_log, N_r, T_r,
                                  S, dtype)
    Zb_x = nb.ntc_zb_batch(plan, dims, bwd_x[0])
    lp_x, ch_x, apE_x, fwdE_x = nb.ntc_posterior_viterbi_batch(
        plan, dims, sigd, bwd_x, Zb_x, trans_log, N_r, T_r, S, dtype)
    packs = npk.build_kernel_packs(plan, dims, sigd, N_r, T_r,
                                   model.num_kmers)
    return dict(plan=plan, dims=dims, packs=packs, trans_log=trans_log,
                sigd=sigd, tables=(mt, c1t, c2t),
                bwd_x=np.asarray(bwd_x), Zb_x=np.asarray(Zb_x),
                lp_x=np.asarray(lp_x), ch_x=np.asarray(ch_x),
                apE_x=np.asarray(apE_x), fwdE_x=np.asarray(fwdE_x),
                N_r=N_r, T_r=T_r, N2=N2,
                K=model.num_kmers, S=S)


def _to_kernel_layout(x, nst):
    """(T, R, nst*CN*CKm) flat XLA store -> (T, nst*128, 128) + -inf pads."""
    T_ = x.shape[0]
    CKm = npk.CK
    x = x.reshape(T_, npk.R, nst, npk.CN, CKm).transpose(0, 2, 1, 3, 4)
    return x.reshape(T_, nst * npk.RC, CKm)


def _cmp(a, b, tol=5e-4):
    both_inf = np.isneginf(a) & np.isneginf(b)
    d = np.abs(np.where(both_inf, 0.0, a - b))
    assert np.isfinite(d).all(), "inf/finite mismatch"
    assert d.max() < tol, d.max()


@pytest.mark.slow
def test_table_gather_packs_match(setup):
    """MXU one-hot table gathers (production path) == XLA plan gathers at
    every LIVE slot; dead slots read 0.0 and are masked by the kernels."""
    s = setup
    packs_g = npk.build_kernel_packs(
        s["plan"], s["dims"], s["sigd"], s["N_r"], s["T_r"], s["K"],
        tables=s["tables"], interpret=True)
    live = np.asarray(s["packs"].kcol[:, npk.K_KS]) >= 0  # (T, 16, CK)
    for st in (npk.K_MU, npk.K_C1, npk.K_C2):
        a = np.asarray(s["packs"].kcol[:, st])
        b = np.asarray(packs_g.kcol[:, st])
        assert (a == b)[live].all(), st
    live_a = np.concatenate([live] * npk.A, axis=2)       # (T, 16, ACK)
    for st in (npk.S_MU, npk.S_C1, npk.S_C2):
        a = np.asarray(s["packs"].suc[:, st])
        b = np.asarray(packs_g.suc[:, st])
        assert (a == b)[live_a].all(), st
    # n-side params ride the same gather; kN/kN2 are always in range
    # (0 fallback at invalid slots) -> exact equality everywhere
    for st in (npk.MU_N, npk.C1_N, npk.C2_N,
               npk.MU_N2, npk.C1_N2, npk.C2_N2):
        np.testing.assert_array_equal(
            np.asarray(packs_g.nrow[:, st]),
            np.asarray(s["packs"].nrow[:, st]), err_msg=str(st))


@pytest.mark.slow
def test_backward_kernel_matches_scan(setup):
    s = setup
    bwd_p = np.asarray(
        npk.ntc_backward_pallas(s["packs"], s["trans_log"], interpret=True))
    bx = _to_kernel_layout(s["bwd_x"], 5)
    _cmp(bx, bwd_p)
    bwd0 = (bwd_p[0].reshape(5, npk.R, npk.CN, npk.CK)
            .transpose(1, 0, 2, 3).reshape(npk.R, -1))
    Zb_p = np.asarray(nb.ntc_zb_batch(s["plan"], s["dims"], jnp.asarray(bwd0)))
    assert np.abs(Zb_p - s["Zb_x"]).max() < 1e-4


@pytest.mark.slow
def test_posterior_viterbi_kernel_matches_scan(setup):
    s = setup
    bwd_p = npk.ntc_backward_pallas(s["packs"], s["trans_log"],
                                    interpret=True)
    lp_p, ch_p, sl_p, apE_p, fwdE_p = jax.tree_util.tree_map(
        np.asarray,
        npk.ntc_posterior_viterbi_pallas(
            s["packs"], bwd_p, jnp.asarray(s["Zb_x"]), s["trans_log"],
            interpret=True))
    _cmp(_to_kernel_layout(s["lp_x"], 5), lp_p)
    _cmp(_to_kernel_layout(s["apE_x"].reshape(1, npk.R, -1), 1)[0],
         apE_p)
    _cmp(_to_kernel_layout(s["fwdE_x"].reshape(1, npk.R, -1), 1)[0],
         fwdE_p)
    # choices must agree wherever any state is live (walk-visited cells)
    chx = _to_kernel_layout(
        s["ch_x"].reshape(s["ch_x"].shape[0], npk.R, -1).astype(np.int32), 1)
    lx = _to_kernel_layout(s["lp_x"], 5)
    live = (np.isfinite(lx) & (lx > -1e30)).reshape(
        lx.shape[0], 5, npk.RC, npk.CK).any(axis=1)
    assert ((chx != ch_p) & live).sum() == 0


@pytest.mark.slow
def test_walk_kernel_matches_scan(setup):
    from dynamont_tpu.ops import ntc_walk as nw

    s = setup
    i0, j0, k0, valid = nw.start_slots(
        s["plan"], s["dims"], jnp.asarray(s["apE_x"]), s["N_r"], s["T_r"])
    S_max = s["N2"] + 64
    ref = nw.ntc_walk_batch(
        s["plan"], s["dims"],
        jnp.asarray(s["lp_x"]).reshape(s["lp_x"].shape[0], npk.R, -1),
        jnp.asarray(s["ch_x"]).reshape(s["ch_x"].shape[0], npk.R, -1),
        s["N_r"], s["T_r"], i0, j0, k0, valid, s["K"], s["S"], S_max)
    lp_k = jnp.asarray(_to_kernel_layout(s["lp_x"], 5))
    ch_k = jnp.asarray(_to_kernel_layout(
        s["ch_x"].reshape(s["ch_x"].shape[0], npk.R, -1).astype(np.int32),
        1)).astype(jnp.int32)
    bwd_p = npk.ntc_backward_pallas(s["packs"], s["trans_log"],
                                    interpret=True)
    _, _, sl_k, _, _ = npk.ntc_posterior_viterbi_pallas(
        s["packs"], bwd_p, jnp.asarray(s["Zb_x"]), s["trans_log"],
        interpret=True)
    out = npk.ntc_walk_pallas(
        s["packs"], lp_k, ch_k, sl_k, i0, j0, k0, valid, s["N_r"],
        s["T_r"], s["K"], s["S"], S_max, interpret=True)
    names = ["seg_cnt", "state", "basepos", "start", "polish_k", "median",
             "overflow"]
    for name, a, b in zip(names, ref, out):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(b, a, atol=1e-6, err_msg=name)
        else:
            np.testing.assert_array_equal(b, a, err_msg=name)


@pytest.mark.slow
def test_lite_plan_matches_full_plan(setup):
    """build_plan_batch lite=True: every retained field equals the full
    plan's (the kernels recompute the dropped slot maps from values)."""
    model = load_model_for_pore("rna002")
    pore = "rna002"
    means, c1, c2 = model.score_params()
    A, S = model.alphabet_size, model.kmer_size
    nt = NT_TRANSITIONS[pore]
    log_m1, log_e2 = math.log(nt["m1"]), math.log(nt["e2"])
    dtype = jnp.float32
    s = setup
    full = s["plan"]

    sigs, kids = [], []
    for j in range(npk.R):
        sig, read = make_read(model, n_bases=20 + (j % 3) * 5, seed=j)
        sigs.append(sig)
        kids.append(np.asarray(seq_to_kmer_ids(read, S, A), np.int32))
    T_arr = np.array([len(x) + 1 for x in sigs], np.int32)
    N_arr = np.array([len(k) + 1 for k in kids], np.int32)
    T_pad = round_up(int(T_arr.max()), npk.C_BWD * npk.C_PV)
    N2 = round_up(int(N_arr.max()), 16)
    sigp = np.zeros((npk.R, T_pad - 1), np.float32)
    kidp = np.zeros((npk.R, N2 - 1), np.int32)
    for j in range(npk.R):
        sigp[j, : T_arr[j] - 1] = sigs[j]
        kidp[j, : N_arr[j] - 1] = kids[j]
    mt = jnp.asarray(means, dtype)
    sdt = jnp.asarray(model.stdevs, dtype)
    c1t, c2t = jnp.asarray(c1, dtype), jnp.asarray(c2, dtype)
    sigj, kidj = jnp.asarray(sigp), jnp.asarray(kidp)
    T_r, N_r = jnp.asarray(T_arr), jnp.asarray(N_arr)
    CN, CK0 = npk.CN, npk.CK - npk.CN
    pn = nb.pre_tn_batch(sigj, kidj, N_r, T_r, mt, sdt, log_m1, log_e2,
                         CN, dtype)
    pk = nb.pre_tk_batch(sigj, T_r, mt, c1t, c2t, log_m1, log_e2, A,
                         CK0, dtype)
    lite, _ = nb.build_plan_batch(pn.cand, pn.cnt, pk.cand, pk.cnt,
                                  kidj, N_r, mt, c1t, c2t, A, S, dtype,
                                  lite=True)
    # slot maps are recomputed by value-equality in the kernels; the model
    # parameter gathers are done on-device by table_gather_pallas (covered
    # by test_table_gather_packs_match) — lite plans carry 1-wide dummies
    dropped = {"col_same", "col_prec", "bcol_same", "bcol_suc",
               "mu_k", "c1_k", "c2_k", "mu_suc", "c1_suc", "c2_suc",
               "mu_n", "c1_n", "c2_n", "mu_n2", "c1_n2", "c2_n2",
               "suc_vals", "hd1", "hd2", "hd1s", "hd2s", "allowed",
               "from_tk"}
    for name in full._fields:
        if name in dropped:
            continue
        np.testing.assert_array_equal(
            np.asarray(getattr(lite, name)),
            np.asarray(getattr(full, name)), err_msg=name)
    # from_tk is only consumed via `allowed` (live-gated): the lite build
    # skips membership tests for dead duplicate slots, so compare on live
    live = np.asarray(full.live)
    np.testing.assert_array_equal(
        np.asarray(lite.from_tk) & live, np.asarray(full.from_tk) & live)
    # lite hd1 carries the packed nibble layout; allowed is int8
    packed = (np.asarray(full.hd1).astype(np.int32)
              | (np.asarray(full.hd2).astype(np.int32) << 4)
              | (np.asarray(full.hd1s).astype(np.int32) << 8)
              | (np.asarray(full.hd2s).astype(np.int32) << 12)
              ).astype(np.int16)
    np.testing.assert_array_equal(np.asarray(lite.hd1), packed)
    assert np.asarray(lite.allowed).dtype == np.int8
    np.testing.assert_array_equal(
        np.asarray(lite.allowed).astype(bool), np.asarray(full.allowed))


@pytest.mark.slow
def test_pre_pass_kernels_match_scan(setup):
    """TN/TK pre-pass kernels + bulk selection vs the XLA scan path."""
    import math as _math

    from dynamont_tpu.ops import ntc_pre_pallas as npp

    model = load_model_for_pore("rna002")
    pore = "rna002"
    nt = NT_TRANSITIONS[pore]
    log_m1, log_e2 = _math.log(nt["m1"]), _math.log(nt["e2"])
    means, c1, c2 = model.score_params()
    A, S = model.alphabet_size, model.kmer_size
    dtype = jnp.float32
    CN, CK0 = npk.CN, npk.CK - npk.CN

    sigs, kids = [], []
    for s in range(npk.R):
        sig, read = make_read(model, n_bases=20 + (s % 3) * 5, seed=200 + s)
        sigs.append(sig)
        kids.append(np.asarray(seq_to_kmer_ids(read, S, A), np.int32))
    T_arr = np.array([len(s) + 1 for s in sigs], np.int32)
    N_arr = np.array([len(k) + 1 for k in kids], np.int32)
    T_pad = round_up(int(T_arr.max()), 32)
    N2 = round_up(int(N_arr.max()), 128)
    sigp = np.zeros((npk.R, T_pad - 1), np.float32)
    kidp = np.zeros((npk.R, N2 - 1), np.int32)
    for j in range(npk.R):
        sigp[j, : T_arr[j] - 1] = sigs[j]
        kidp[j, : N_arr[j] - 1] = kids[j]
    mt = jnp.asarray(means, dtype)
    sdt = jnp.asarray(model.stdevs, dtype)
    c1t = jnp.asarray(c1, dtype)
    c2t = jnp.asarray(c2, dtype)
    sigj, kidj = jnp.asarray(sigp), jnp.asarray(kidp)
    T_r, N_r = jnp.asarray(T_arr), jnp.asarray(N_arr)

    ref_tn = nb.pre_tn_batch(sigj, kidj, N_r, T_r, mt, sdt, log_m1,
                             log_e2, CN, dtype)
    got_tn = npp.pre_tn_pallas(sigj, kidj, N_r, T_r, mt, sdt, log_m1,
                               log_e2, CN, interpret=True)
    # TN per-cell math is op-identical: selection must agree exactly
    np.testing.assert_array_equal(np.asarray(got_tn.cand),
                                  np.asarray(ref_tn.cand))
    np.testing.assert_array_equal(np.asarray(got_tn.cnt),
                                  np.asarray(ref_tn.cnt))
    np.testing.assert_allclose(np.asarray(got_tn.Zf),
                               np.asarray(ref_tn.Zf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_tn.Zb),
                               np.asarray(ref_tn.Zb), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_tn.overflow),
                                  np.asarray(ref_tn.overflow))

    ref_tk = nb.pre_tk_batch(sigj, T_r, mt, c1t, c2t, log_m1, log_e2,
                             A, CK0, dtype)
    got_tk = npp.pre_tk_pallas(sigj, T_r, mt, c1t, c2t, log_m1, log_e2,
                               A, CK0, interpret=True)
    np.testing.assert_allclose(np.asarray(got_tk.Zf),
                               np.asarray(ref_tk.Zf), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_tk.Zb),
                               np.asarray(ref_tk.Zb), atol=1e-4)
    # TK grouped-lse rounding differs by ~1 ulp: compare selected SETS
    # allowing boundary flips only in degenerate near-tie columns
    cand_r = np.sort(np.asarray(ref_tk.cand), axis=2)
    cand_g = np.sort(np.asarray(got_tk.cand), axis=2)
    mism = (cand_r != cand_g).any(axis=2)
    assert mism.mean() < 1e-3, mism.mean()
    np.testing.assert_array_equal(np.asarray(got_tk.overflow),
                                  np.asarray(ref_tk.overflow))


@pytest.mark.slow
def test_train_kernels_match_per_read(setup):
    """Batched Baum-Welch kernels (fwd store + train accumulators) vs the
    exact per-read fp64 path (models/ntc.run_ntc mode=train)."""
    from dynamont_tpu.models.ntc import run_ntc
    from dynamont_tpu.models.ntc_batch import (
        emissions_from_moments, make_ntc_train_fn, trans_from_terms,
    )

    model = load_model_for_pore("rna002")
    sigs, reads = [], []
    for s in range(npk.R):
        sig, read = make_read(model, n_bases=20 + (s % 3) * 5, seed=s)
        sigs.append(sig)
        reads.append(read)
    A, S = model.alphabet_size, model.kmer_size
    kids = [np.asarray(seq_to_kmer_ids(r, S, A), np.int32) for r in reads]
    T_arr = np.array([len(s) + 1 for s in sigs], np.int32)
    N_arr = np.array([len(k) + 1 for k in kids], np.int32)
    T_pad = round_up(int(T_arr.max()), npk.C_BWD * npk.C_PV)
    N2 = round_up(int(N_arr.max()), 128)
    sigp = np.zeros((npk.R, T_pad - 1), np.float32)
    kidp = np.zeros((npk.R, N2 - 1), np.int32)
    for j in range(npk.R):
        sigp[j, : T_arr[j] - 1] = sigs[j]
        kidp[j, : N_arr[j] - 1] = kids[j]

    fn = make_ntc_train_fn(model, "rna002")
    res = fn(jnp.asarray(sigp), jnp.asarray(kidp), jnp.asarray(T_arr),
             jnp.asarray(N_arr), CN=npk.CN, CK0=npk.CK - npk.CN,
             interpret=True)
    term_lse = np.asarray(res["term_lse"])
    em = np.asarray(res["em"])
    Zf = np.asarray(res["Zf"])

    for r in range(0, 3):
        ref = run_ntc(sigs[r], reads[r], model, "rna002", mode="train")
        assert abs(Zf[r] - ref.Z) < 2e-2, (Zf[r], ref.Z)
        trans = trans_from_terms(term_lse[:, r])
        for k, v in ref.trained_transitions.items():
            assert trans[k] == pytest.approx(v, rel=2e-3, abs=1e-6), k
        emis = emissions_from_moments(em[r], model)
        ref_e = ref.trained_emissions
        common = set(emis) & set(ref_e)
        # threshold-boundary k-mers (norm ~ 1e-7) may flip in fp32
        assert len(common) >= 0.95 * max(len(emis), len(ref_e))
        for kmer in common:
            assert emis[kmer][0] == pytest.approx(
                ref_e[kmer][0], rel=1e-4, abs=1e-3), kmer
            assert emis[kmer][1] == pytest.approx(
                ref_e[kmer][1], rel=5e-3, abs=1e-3), kmer


@pytest.mark.slow
def test_engine_train_kernel_path_matches_exact(setup):
    """NTCBatchEngine.train: kernel path (interpret) vs exact per-read."""
    from dynamont_tpu.models.batch import BatchItem
    from dynamont_tpu.models.ntc_batch import NTCBatchEngine

    model = load_model_for_pore("rna002")
    items = []
    for s in range(2):
        sig, read = make_read(model, n_bases=22, seed=300 + s)
        items.append(BatchItem(sig, read))
    kw = dict(t_pad_to=32, n_pad_to=16)
    eng_p = NTCBatchEngine(model, "rna002", pallas=True,
                           pallas_interpret=True, **kw)
    eng_x = NTCBatchEngine(model, "rna002", pallas=False, **kw)
    outs_p = eng_p.train(items)
    outs_x = eng_x.train(items)
    for op, ox in zip(outs_p, outs_x):
        assert not isinstance(op, Exception), op
        assert not isinstance(ox, Exception), ox
        tp, ep, zp = op
        tx, ex, zx = ox
        assert abs(zp - zx) < 2e-2
        for k, v in tx.items():
            assert tp[k] == pytest.approx(v, rel=2e-3, abs=1e-6), k
        common = set(ep) & set(ex)
        assert len(common) >= 0.95 * max(len(ep), len(ex))
        for kmer in common:
            assert ep[kmer][0] == pytest.approx(ex[kmer][0], abs=1e-3)
            assert ep[kmer][1] == pytest.approx(ex[kmer][1], rel=5e-3,
                                               abs=1e-3)


@pytest.mark.slow
def test_wide_geometry_program_matches_scan(setup):
    """The SECOND Mosaic geometry — (8 reads, CN=16, CK=256), the
    overflow retry rung's doubled-cap kernel instance
    (ops/ntc_pallas.geometry) — through the full bucket program vs the
    scan path at the same caps."""
    from dynamont_tpu.models.ntc_batch import make_ntc_batch_fn, round_up

    model = load_model_for_pore("rna002")
    A, S = model.alphabet_size, model.kmer_size
    R8 = 8
    sigs, kids = [], []
    for s in range(R8):
        sig, read = make_read(model, n_bases=20 + (s % 3) * 5, seed=s)
        sigs.append(sig)
        kids.append(np.asarray(seq_to_kmer_ids(read, S, A), np.int32))
    T_arr = np.array([len(s) + 1 for s in sigs], np.int32)
    N_arr = np.array([len(k) + 1 for k in kids], np.int32)
    T_pad = round_up(int(T_arr.max()), 64)
    N2 = round_up(int(N_arr.max()), 128)
    sigp = np.zeros((R8, T_pad - 1), np.float32)
    kidp = np.zeros((R8, N2 - 1), np.int32)
    for j in range(R8):
        sigp[j, : T_arr[j] - 1] = sigs[j]
        kidp[j, : N_arr[j] - 1] = kids[j]
    fn = make_ntc_batch_fn(model, "rna002", None, jnp.float32)
    kw = dict(CN=16, CK0=240, S_max=round_up(N2 + N2 // 4 + 64, 128))
    args = (jnp.asarray(sigp), jnp.asarray(kidp), jnp.asarray(T_arr),
            jnp.asarray(N_arr))
    res_p = {k: np.asarray(v) for k, v in
             fn(*args, use_pallas=True, interpret=True, **kw).items()}
    res_s = {k: np.asarray(v) for k, v in
             fn(*args, use_pallas=False, **kw).items()}
    # the wide geometry stores the backward/posterior streams in bf16
    # (HBM budget, ops/ntc_pallas LP_DT) -> Z to ~|Z|*2^-8, stored
    # probabilities to ~4e-3; borders/paths come from the same
    # bf16-noised posteriors and stay equal on non-tied reads
    np.testing.assert_allclose(res_p["Zf"], res_s["Zf"], atol=5e-4)
    np.testing.assert_allclose(res_p["Zb"], res_s["Zb"], rtol=5e-3)
    for key in ("Zf_tn", "Zb_tn", "Zf_tk", "Zb_tk"):
        np.testing.assert_allclose(res_p[key], res_s[key], atol=5e-4)
    for key in ("seg_cnt", "seg_state", "seg_bp", "seg_start", "seg_k"):
        np.testing.assert_array_equal(res_p[key], res_s[key])
    np.testing.assert_allclose(res_p["seg_med"], res_s["seg_med"],
                               atol=5e-3)


@pytest.mark.slow
def test_engine_wide_rung_runs_kernel_geometry(setup):
    """On a pallas engine the overflow retry rung stays on the kernel
    path at the (8, 16, 256) geometry (VERDICT r3 item 3: repair used to
    drop to the per-step XLA scan). Reads fed straight into _run_wide
    must come back repaired and match a scan engine at the wide caps."""
    from dynamont_tpu.models.batch import BatchItem
    from dynamont_tpu.models.ntc_batch import NTCBatchEngine

    model = load_model_for_pore("rna002")
    items = []
    for s in range(5):
        sig, read = make_read(model, n_bases=18 + s * 3, seed=200 + s)
        items.append(BatchItem(sig, read))
    kw = dict(t_pad_to=32, n_pad_to=16)
    eng_p = NTCBatchEngine(model, "rna002", pallas=True,
                           pallas_interpret=True, **kw)
    outputs = [None] * len(items)
    still = eng_p._run_wide(list(range(len(items))), items, outputs)
    assert still == []
    eng_s = NTCBatchEngine(model, "rna002", pallas=False, cap_n=16,
                           cap_k=240, **kw)
    outs_s = eng_s.run(items)
    for op, os_ in zip(outputs, outs_s):
        assert op is not None and op.error is None, op
        assert os_.error is None, os_.error
        assert abs(op.Z - os_.Z) < 5e-3 * max(1.0, abs(os_.Z))
        assert len(op.segments) == len(os_.segments)
        for gp, gs in zip(op.segments, os_.segments):
            assert (gp[0], gp[1], gp[2], gp[4]) == \
                   (gs[0], gs[1], gs[2], gs[4])
            # wide rung stores posteriors bf16 (see LP_DT): probs ~4e-3
            assert abs(gp[3] - gs[3]) < 5e-3


@pytest.mark.slow
def test_engine_pallas_path_matches_scan_path(setup):
    """Full NTCBatchEngine wiring (packs + 3 kernels + finish) vs scan."""
    from dynamont_tpu.models.batch import BatchItem
    from dynamont_tpu.models.ntc_batch import NTCBatchEngine

    model = load_model_for_pore("rna002")
    items = []
    for s in range(3):
        sig, read = make_read(model, n_bases=20 + s * 5, seed=100 + s)
        items.append(BatchItem(sig, read))
    kw = dict(t_pad_to=32, n_pad_to=16, fallback=False)
    eng_p = NTCBatchEngine(model, "rna002", pallas=True,
                           pallas_interpret=True, **kw)
    eng_s = NTCBatchEngine(model, "rna002", pallas=False, **kw)
    outs_p = eng_p.run(items)
    outs_s = eng_s.run(items)
    for op, os_ in zip(outs_p, outs_s):
        assert op.error == os_.error
        if op.error is None:
            assert abs(op.Z - os_.Z) < 1e-3
            assert len(op.segments) == len(os_.segments)
            for gp, gs in zip(op.segments, os_.segments):
                # borders/states/polish are exact between the two paths;
                # medians carry ~1e-6 noise from the per-column posterior
                # normalizer (kernel roll-tree/MXU lse vs the scan's
                # jnp reductions round differently)
                assert (gp[0], gp[1], gp[2], gp[4]) == \
                       (gs[0], gs[1], gs[2], gs[4])
                assert abs(gp[3] - gs[3]) < 1e-5
