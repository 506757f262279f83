"""Pallas banded kernels vs the scan implementation (interpret mode on CPU)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.ops import nt_banded_batch as bb
from dynamont_tpu.ops import nt_banded_pallas as pk
from dynamont_tpu.utils.kmer import seq_to_kmer_ids

from tests.synthetic import make_read

M1, E2 = 0.019889650396799997, 0.9801103496029998


@pytest.fixture(scope="module")
def setup():
    model = load_model_for_pore("rna002")
    items = [make_read(model, n_bases=40 + 10 * s, seed=s) for s in range(3)]
    kids = [
        seq_to_kmer_ids(r, model.kmer_size, model.alphabet_size) for _, r in items
    ]
    batch = bb.prepare_batch(
        [s for s, _ in items], kids, model.means, model.stdevs,
        dtype=jnp.float32, t_pad_to=256,
    )
    return batch


def _allclose_band(a, b, T, atol=1e-5):
    a, b = np.asarray(a), np.asarray(b)
    for i in range(a.shape[0]):
        x, y = a[i, : int(T[i])], b[i, : int(T[i])]
        both_inf = np.isneginf(x) & np.isneginf(y)
        d = np.abs(np.where(both_inf, 0.0, x - y))
        assert np.nanmax(d) < atol, f"read {i}: max diff {np.nanmax(d)}"


def test_forward_matches_scan(setup):
    batch = setup
    lm, le = math.log(M1), math.log(E2)
    M, E = pk.forward_pallas(batch, lm, le, interpret=True)
    import jax

    Ms, Es = jax.vmap(bb._forward_single(batch, lm, le))(
        batch.sig, batch.mu_pad, batch.c1_pad, batch.c2_pad, batch.bstart,
        batch.bw, batch.N,
    )
    T = np.asarray(batch.T)
    _allclose_band(M, Ms, T)
    _allclose_band(E, Es, T)


def test_backward_matches_scan(setup):
    batch = setup
    lm, le = math.log(M1), math.log(E2)
    M, E = pk.backward_pallas(batch, lm, le, interpret=True)
    import jax

    Ms, Es = jax.vmap(bb._backward_single(batch, lm, le))(
        batch.sig, batch.mu_pad, batch.c1_pad, batch.c2_pad, batch.bstart,
        batch.bw, batch.N, batch.T,
    )
    T = np.asarray(batch.T)
    _allclose_band(M, Ms, T)
    _allclose_band(E, Es, T)


def test_full_run_matches_scan(setup):
    batch = setup
    lm, le = math.log(M1), math.log(E2)
    res_p = pk.banded_batch_run_pallas(batch, lm, le, interpret=True)
    res_s = bb.banded_batch_run(batch, lm, le)
    np.testing.assert_allclose(
        np.asarray(res_p.Zf), np.asarray(res_s.Zf), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res_p.Zb), np.asarray(res_s.Zb), rtol=1e-6
    )
    T = np.asarray(batch.T)
    ch_p, ch_s = np.asarray(res_p.choices), np.asarray(res_s.choices)
    for i in range(ch_p.shape[0]):
        assert (ch_p[i, : int(T[i])] == ch_s[i, : int(T[i])]).mean() > 0.999
    _allclose_band(
        np.log(np.asarray(res_p.PM) + 1e-30),
        np.log(np.asarray(res_s.PM) + 1e-30), T, atol=1e-3,
    )


def test_fused_segment_entry_matches_scan_pipeline(setup):
    """The PRODUCTION fused path (bwd -> fused fwd+posterior+viterbi ->
    walk; forward DP never hits HBM, Zf captured in-kernel) must yield
    the same Z values, segment starts, and medians as the scan pipeline."""
    import jax

    from dynamont_tpu.ops import nt_banded_device as dv

    batch = setup
    lm, le = math.log(M1), math.log(E2)
    N_max = int(np.asarray(batch.N).max())
    Zf_p, Zb_p, starts_p, med_p = pk.banded_segment_pallas(
        batch, N_max, lm, le, interpret=True
    )
    res = bb.banded_batch_run(batch, lm, le)
    walk = jax.vmap(dv._walk_single(batch.B, N_max))
    starts_s, med_s = walk(res.PM, res.PE, res.choices, batch.bstart,
                           batch.T, batch.N, batch.bw)
    np.testing.assert_allclose(np.asarray(Zf_p), np.asarray(res.Zf),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(Zb_p), np.asarray(res.Zb),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(starts_p),
                                  np.asarray(starts_s))
    np.testing.assert_allclose(np.asarray(med_p), np.asarray(med_s),
                               atol=1e-6)


def test_walk_matches_device_walk(setup):
    import jax

    from dynamont_tpu.ops import nt_banded_device as dv

    batch = setup
    lm, le = math.log(M1), math.log(E2)
    res = bb.banded_batch_run(batch, lm, le)
    N_max = int(np.asarray(batch.N).max())
    walk = jax.vmap(dv._walk_single(batch.B, N_max))
    starts_s, med_s = walk(res.PM, res.PE, res.choices, batch.bstart,
                           batch.T, batch.N, batch.bw)
    # the pallas walk consumes LOG posteriors (the kernels store logs)
    starts_p, med_p = pk.walk_pallas(
        jnp.log(res.PM), jnp.log(res.PE), res.choices, batch, N_max,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(starts_p), np.asarray(starts_s))
    np.testing.assert_allclose(
        np.asarray(med_p), np.asarray(med_s), atol=1e-7
    )
