"""Sharded NTC Baum-Welch step (parallel/ntc_step): per-read estimates
match the single-device kernel program, pooled statistics are the psum of
the per-read contributions (BASELINE config 4; ref: NTC.cpp:923-1130)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.parallel import make_mesh
from dynamont_tpu.parallel.ntc_step import (
    NTCPooled, make_ntc_sharded_train_step, pool_ntc_params,
    prepare_ntc_shard,
)

from tests.synthetic import make_read


@pytest.fixture(scope="module")
def model():
    return load_model_for_pore("rna002")


def test_pool_ntc_params_means():
    K = 4
    pooled = NTCPooled(
        trans_sum=jnp.full((13,), 1.0), n_valid=jnp.asarray(2.0),
        mean_sum=jnp.asarray([4.0, 0.0, 2.0, 0.0]),
        stdev_sum=jnp.asarray([2.0, 0.0, 1.0, 0.0]),
        kmer_count=jnp.asarray([2.0, 0.0, 1.0, 0.0]),
        z_sum=jnp.asarray(-10.0),
    )
    out = pool_ntc_params(pooled)
    assert out["e1"] == 1.0
    assert out["Z"] == -5.0
    np.testing.assert_allclose(out["kmer_means"], [2.0, 0.0, 2.0, 0.0])
    assert list(out["kmer_seen"]) == [True, False, True, False]
    assert pool_ntc_params(pooled._replace(n_valid=jnp.asarray(0.0))) is None


@pytest.mark.slow
def test_sharded_ntc_train_matches_single_device(model):
    """2-device mesh vs 1-device mesh: per-read term_lse/em agree for the
    reads they share, and pooled stats equal hand-summed contributions."""
    from dynamont_tpu.models.ntc_batch import (
        emissions_from_moments, trans_from_terms,
    )

    items = []
    for s in range(3):  # 3 real reads on 2x16 slots
        sig, read = make_read(model, n_bases=12, seed=40 + s)
        items.append((sig[:100], read))

    mesh2 = make_mesh(2)
    shard2 = prepare_ntc_shard(items, model, mesh2, t_pad_to=128)
    step2 = make_ntc_sharded_train_step(mesh2, model, "rna002",
                                        interpret=True)
    out2 = step2(shard2)

    mesh1 = make_mesh(1)
    shard1 = prepare_ntc_shard(items, model, mesh1, t_pad_to=128)
    step1 = make_ntc_sharded_train_step(mesh1, model, "rna002",
                                        interpret=True)
    out1 = step1(shard1)

    t2 = np.asarray(out2["term_lse"])[:, :3]
    t1 = np.asarray(out1["term_lse"])[:, :3]
    np.testing.assert_allclose(t2, t1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out2["em"])[:3], np.asarray(out1["em"])[:3],
        rtol=1e-4, atol=1e-6,
    )
    ok = np.asarray(out2["ok"])
    assert ok[:3].all() and not ok[3:].any()  # replicas masked out

    # pooled = sum over ok reads of per-read normalized estimates
    pooled = out2["pooled"]
    assert float(pooled.n_valid) == 3.0
    want_trans = np.zeros(13)
    want_means = np.zeros(model.num_kmers)
    want_count = np.zeros(model.num_kmers)
    from dynamont_tpu.ops.ntc_pallas import TERMS

    for i in range(3):
        tr = trans_from_terms(t2[:, i])
        want_trans += np.asarray([tr[k] for k in TERMS])
        emis = emissions_from_moments(np.asarray(out2["em"])[i], model)
        from dynamont_tpu.utils.kmer import kmer2int

        for kmer, (m, _s) in emis.items():
            # invert int2kmer: RNA kmers print LSB-first (no reversal)
            k = kmer2int(kmer[::-1] if model.rna else kmer,
                         model.alphabet_size)
            want_means[k] += m
            want_count[k] += 1
    np.testing.assert_allclose(
        np.asarray(pooled.trans_sum), want_trans, rtol=1e-5, atol=1e-6)
    # the stdev>0 inclusion threshold is evaluated in fp32 on device and
    # float64 in the host helper: borderline kmers may flip either way
    count = np.asarray(pooled.kmer_count)
    same = count == want_count
    assert (~same).sum() <= 2, f"{(~same).sum()} kmer counts differ"
    np.testing.assert_allclose(
        np.asarray(pooled.mean_sum)[same], want_means[same],
        rtol=1e-5, atol=1e-5)
    params = pool_ntc_params(pooled)
    assert math.isclose(params["e1"], 1.0)
