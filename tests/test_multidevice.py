"""Single-process multi-chip inference: buckets round-robin across all local
devices and outputs stay byte-identical to a single-device run (SURVEY.md
§2.4; replaces the reference's mp.Pool read-parallelism, ref:
segment.py:292-317, with device-level parallelism in one process)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamont_tpu.models.batch import BandedBatchEngine, BatchItem
from dynamont_tpu.models.ntc_batch import NTCBatchEngine
from dynamont_tpu.models.registry import load_model_for_pore

from tests.synthetic import make_read


@pytest.fixture(scope="module")
def model():
    return load_model_for_pore("rna002")


def _items(model, n_reads, base_len=40):
    items = []
    for s in range(n_reads):
        sig, read = make_read(model, n_bases=base_len + 3 * (s % 5),
                              seed=500 + s)
        items.append(BatchItem(sig, read))
    return items


def _out_key(out):
    return (out.error, None if out.segments is None else tuple(
        tuple(seg) for seg in out.segments), out.Z)


def test_banded_round_robin_all_devices(model):
    devs = jax.local_devices()
    assert len(devs) >= 8  # conftest forces the 8-device CPU host platform
    items = _items(model, 24)
    eng = BandedBatchEngine(model, "rna002", dtype=jnp.float32, batch_size=2)
    outs = eng.run(items)
    used = eng.profile["device_buckets"]
    assert len(used) == len(devs), f"only devices {sorted(used)} used"
    assert sum(used.values()) == eng.profile["buckets"]

    single = BandedBatchEngine(model, "rna002", dtype=jnp.float32,
                               batch_size=2, devices=[devs[0]])
    souts = single.run(items)
    assert list(single.profile["device_buckets"]) == [str(devs[0].id)]
    for got, want in zip(outs, souts):
        assert _out_key(got) == _out_key(want)


def test_banded_device_arg_respected(model):
    devs = jax.local_devices()
    pick = [devs[3], devs[5]]
    eng = BandedBatchEngine(model, "rna002", dtype=jnp.float32, batch_size=2,
                            devices=pick)
    eng.run(_items(model, 8))
    assert sorted(eng.profile["device_buckets"]) == sorted(
        str(d.id) for d in pick)


def test_ntc_round_robin_matches_single_device(model):
    devs = jax.local_devices()
    items = _items(model, 6, base_len=25)
    eng = NTCBatchEngine(model, "rna002", dtype=jnp.float32, batch_size=2,
                         fallback=False, pallas=False)
    outs = eng.run(items)
    used = eng.profile["device_buckets"]
    assert len(used) >= 3  # 3 buckets -> 3 distinct devices
    single = NTCBatchEngine(model, "rna002", dtype=jnp.float32, batch_size=2,
                            fallback=False, pallas=False, devices=[devs[0]])
    souts = single.run(items)
    for got, want in zip(outs, souts):
        assert _out_key(got) == _out_key(want)


def test_ntc_train_round_robin_matches_single_device(model):
    # the scan train path routes through _train_exact off-TPU; exercise the
    # dispatch bookkeeping via the batched segmentation engine instead and
    # the train device plumbing in interpret mode only when cheap. Here:
    # verify the round-robin counter advances across run() calls.
    eng = NTCBatchEngine(model, "rna002", dtype=jnp.float32, batch_size=2,
                         fallback=False, pallas=False)
    eng.run(_items(model, 2, base_len=25))
    first = dict(eng.profile["device_buckets"])
    eng.run(_items(model, 2, base_len=25))
    second = eng.profile["device_buckets"]
    assert sum(second.values()) == sum(first.values()) + 1
    assert len(second) == 2  # second bucket landed on the next device
