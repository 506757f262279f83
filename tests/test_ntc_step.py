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


@pytest.fixture(autouse=True)
def _no_persistent_cache_writes():
    """Serializing this module's shard_map executables (the largest CPU
    programs in the suite: 8 virtual devices x interpret-mode Mosaic
    kernels) SEGFAULTS inside jax's compilation-cache writer
    (put_executable_and_time) when it runs late in a long single-process
    session — reproduced twice at the same test with a fresh cache dir,
    while the identical compile+write passes standalone. Skip the cache
    WRITE for these compiles (reads still hit); costs a recompile per
    cold run, instead of a flaky suite-wide crash."""
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old)


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


@pytest.mark.slow
def test_sharded_ntc_step_uses_current_tables(model):
    """step(model_now=...) must compute with the PASSED emission tables:
    the trainer updates k-mer models every batch, and a step that baked
    the build-time tables into its closure would silently train every
    later batch against the first batch's parameters."""
    items = [(make_read(model, n_bases=12, seed=77)[0][:100],
              make_read(model, n_bases=12, seed=77)[1])]
    mesh = make_mesh(1)
    shard = prepare_ntc_shard(items, model, mesh, t_pad_to=128)
    step = make_ntc_sharded_train_step(mesh, model, "rna002",
                                       interpret=True)
    base = step(shard)
    from dynamont_tpu.utils.pore_model import PoreModel

    shifted = PoreModel(
        means=np.asarray(model.means) + 0.25,
        stdevs=np.asarray(model.stdevs).copy(),
        alphabet_size=model.alphabet_size, kmer_size=model.kmer_size,
        rna=model.rna,
    )
    moved = step(shard, model_now=shifted)
    assert not np.allclose(np.asarray(base["Zf"])[0],
                           np.asarray(moved["Zf"])[0])
    # and passing the ORIGINAL model reproduces the default exactly
    same = step(shard, model_now=model)
    np.testing.assert_array_equal(np.asarray(base["Zf"]),
                                  np.asarray(same["Zf"]))
