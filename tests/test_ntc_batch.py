"""Batched NTC pipeline vs the exact per-read fp64 path.

The per-read path (models/ntc.run_ntc) is itself parity-tested against the
reference dynamont-NTC binary (test_ntc_segment.py), so agreement here
transitively establishes reference parity for the production batched
engine.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dynamont_tpu.models.batch import BatchItem
from dynamont_tpu.models.ntc import run_ntc
from dynamont_tpu.models.ntc_batch import NTCBatchEngine
from dynamont_tpu.models.registry import load_model_for_pore

from tests.synthetic import make_read


@pytest.fixture(scope="module")
def model():
    return load_model_for_pore("rna002")


@pytest.fixture(scope="module")
def reads(model):
    # ragged lengths: exercises per-read (T, N) masking inside one bucket
    out = []
    for seed, n_bases in [(0, 25), (1, 31), (2, 18), (3, 25)]:
        sig, read = make_read(model, n_bases=n_bases, seed=seed)
        out.append((sig, read))
    return out


@pytest.fixture(scope="module")
def exact(model, reads):
    return [run_ntc(sig, read, model, "rna002") for sig, read in reads]


def _engine(model, dtype, **kw):
    kw.setdefault("t_pad_to", 64)
    kw.setdefault("n_pad_to", 16)
    return NTCBatchEngine(model, "rna002", dtype=dtype, **kw)


@pytest.mark.slow
def test_batched_fp64_matches_per_read(model, reads, exact):
    eng = _engine(model, jnp.float64)
    outs = eng.run([BatchItem(sig, read) for sig, read in reads])
    for out, res in zip(outs, exact):
        assert out.error is None, out.error
        assert abs(out.Z - res.Z) < 1e-6 * max(1.0, abs(res.Z))
        assert len(out.segments) == len(res.segments)
        for g, r in zip(out.segments, res.segments):
            assert g[0] == r[0] and g[1] == r[1] and g[2] == r[2]
            # fp64 logsumexp reduction orders differ between the batched and
            # per-read paths -> ~1e-8 relative drift in posteriors
            assert abs(g[3] - r[3]) < 1e-6
            assert g[4] == r[4]


@pytest.mark.slow
def test_batched_fp32_borders_match(model, reads, exact):
    eng = _engine(model, jnp.float32)
    outs = eng.run([BatchItem(sig, read) for sig, read in reads])
    n_mismatch = total = 0
    for out, res in zip(outs, exact):
        assert out.error is None, out.error
        assert abs(out.Z - res.Z) < 1e-3 * max(1.0, abs(res.Z))
        assert len(out.segments) == len(res.segments)
        for g, r in zip(out.segments, res.segments):
            total += 1
            same = (
                g[0] == r[0] and g[1] == r[1] and g[2] == r[2]
                and abs(g[3] - r[3]) < 5e-3 and g[4] == r[4]
            )
            n_mismatch += 0 if same else 1
    # fp32 near-ties may flip an occasional segment; demand ~full agreement
    assert n_mismatch <= max(1, total // 50), f"{n_mismatch}/{total}"


@pytest.mark.slow
def test_batched_single_read_bucket(model, reads, exact):
    """A one-read bucket (R=1) must behave identically."""
    sig, read = reads[0]
    eng = _engine(model, jnp.float64)
    outs = eng.run([BatchItem(sig, read)])
    assert outs[0].error is None
    _assert_segments_close(outs[0].segments, exact[0].segments)


def _assert_segments_close(got, want, tol=1e-6):
    assert len(got) == len(want)
    for g, r in zip(got, want):
        assert g[0] == r[0] and g[1] == r[1] and g[2] == r[2] and g[4] == r[4]
        assert abs(g[3] - r[3]) < tol


@pytest.mark.slow
def test_overflow_falls_back_to_exact(model, reads, exact):
    """Tiny caps force candidate overflow -> per-read fp64 fallback."""
    eng = _engine(model, jnp.float64, cap_n=2, cap_k=2)
    sig, read = reads[0]
    outs = eng.run([BatchItem(sig, read)])
    assert outs[0].error is None
    # the fallback IS the per-read path -> exact equality
    assert outs[0].segments == exact[0].segments
