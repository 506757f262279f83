"""Fast (Pallas/MXU) banded training path vs the exact scan oracle."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.ops import nt_banded_batch as bb
from dynamont_tpu.ops.nt_banded_train import banded_batch_train_fast
from dynamont_tpu.utils.kmer import seq_to_kmer_ids

from tests.synthetic import make_read

M1, E2 = 0.019889650396799997, 0.9801103496029998


@pytest.fixture(scope="module")
def model():
    return load_model_for_pore("rna002")


def _prep(model, n_reads=3):
    items = [make_read(model, n_bases=40 + 11 * s, seed=s)
             for s in range(n_reads)]
    sigs = [s for s, _ in items]
    kids = [seq_to_kmer_ids(r, model.kmer_size, model.alphabet_size)
            for _, r in items]
    batch = bb.prepare_batch(sigs, kids, model.means, model.stdevs,
                             dtype=jnp.float32)
    N_max = max(len(k) for k in kids) + 1
    kid_pad = np.zeros((n_reads, N_max - 1), dtype=np.int32)
    for i, k in enumerate(kids):
        kid_pad[i, : len(k)] = k
    return batch, jnp.asarray(kid_pad)


def test_fast_train_matches_scan(model):
    batch, kid_pad = _prep(model)
    args = (batch, math.log(M1), math.log(E2), kid_pad, model.num_kmers)
    ref = bb.banded_batch_train(*args)
    got = banded_batch_train_fast(*args, interpret=True)

    # tolerances re-measured after the round-4 online exp-space
    # accumulator folds (ops/nt_banded_train): observed max drift vs the
    # scan oracle at these shapes is m1/e2 <= 2e-5 rel, means <= 1e-5,
    # stdevs <= 8e-5 — the bounds below carry ~5x headroom
    np.testing.assert_allclose(np.asarray(got.Zf), np.asarray(ref.Zf),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.Zb), np.asarray(ref.Zb),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.m1), np.asarray(ref.m1),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.e2), np.asarray(ref.e2),
                               rtol=1e-4)
    ref_mask = np.asarray(ref.kmer_mask)
    got_mask = np.asarray(got.kmer_mask)
    np.testing.assert_array_equal(got_mask, ref_mask)
    np.testing.assert_allclose(np.asarray(got.means)[ref_mask],
                               np.asarray(ref.means)[ref_mask],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.stdevs)[ref_mask],
                               np.asarray(ref.stdevs)[ref_mask],
                               rtol=5e-4, atol=1e-4)


def test_fast_train_padded_reads_are_benign(model):
    """Degenerate padding rows (T=N=1) must not poison the fast path."""
    batch, kid_pad = _prep(model, n_reads=2)
    pad1 = lambda a: jnp.concatenate([a, jnp.zeros_like(a[:1])], axis=0)
    padded = bb.BandedBatch(
        sig=pad1(batch.sig), mu_pad=pad1(batch.mu_pad),
        c1_pad=pad1(batch.c1_pad), c2_pad=pad1(batch.c2_pad),
        bstart=pad1(batch.bstart),
        T=jnp.concatenate([batch.T, jnp.ones((1,), batch.T.dtype)]),
        N=jnp.concatenate([batch.N, jnp.ones((1,), batch.N.dtype)]),
        bw=jnp.concatenate([batch.bw, jnp.ones((1,), batch.bw.dtype)]),
        pad=batch.pad, B=batch.B,
    )
    kid3 = jnp.concatenate([kid_pad, jnp.zeros_like(kid_pad[:1])], axis=0)
    got = banded_batch_train_fast(padded, math.log(M1), math.log(E2),
                                  kid3, model.num_kmers, interpret=True)
    # the padding row yields no NaNs anywhere (pooled psum safety)
    for leaf in (got.m1, got.e2, got.means, got.stdevs):
        assert not np.isnan(np.asarray(leaf)).any()
    assert not np.asarray(got.kmer_mask)[2].any()


def test_trainer_fp32_precision(model, tmp_path):
    """Trainer(precision='fp32') routes through the fast path and produces
    parameters close to the fp64 run on the same batch."""
    from dynamont_tpu.io import readers
    from dynamont_tpu.training.trainer import Trainer
    from dynamont_tpu.utils.kmer import int2kmer
    from dynamont_tpu.utils.pore_model import write_kmer_models

    items = []
    for s in range(4):
        sig, read_proc = make_read(model, n_bases=30, seed=80 + s)
        items.append((f"tr{s}", sig, read_proc[9:][::-1]))
    tsv = tmp_path / "train.tsv"
    with open(tsv, "w") as f:
        for rid, sig, read in items:
            f.write(f"{rid}\t{rid}\t"
                    f"{','.join(repr(float(x)) for x in sig)}\t{read}\n")
    model_tsv = tmp_path / "init.model"
    models = {}
    for k in range(model.num_kmers):
        kmer = int2kmer(k, model.alphabet_size, model.kmer_size, model.rna)
        models[kmer] = (float(model.means[k]), float(model.stdevs[k]))
    write_kmer_models(model_tsv, models)

    params = {}
    for prec in ("fp64", "fp32"):
        trainer = Trainer("basic", "rna002", str(tmp_path / prec),
                          str(model_tsv), batch_size=4, precision=prec)
        jobs = list(readers.generate_tsv_jobs(str(tsv), rna=True))
        dz = trainer.process_batch(jobs, epoch=0)
        trainer.close()
        assert dz is not None
        params[prec] = dict(trainer.transition_params)
    assert params["fp32"]["m1"] == pytest.approx(params["fp64"]["m1"],
                                                 rel=1e-3)
    assert params["fp32"]["e2"] == pytest.approx(params["fp64"]["e2"],
                                                 rel=1e-3)
