"""TPU probe: wall-clock anatomy of BandedBatchEngine.run at bench shapes.

Separates host prep (prepare_wire + kmer ids), async dispatch, and collect
(device wait + D2H + Z check) across buckets, plus a serial-vs-pipelined
comparison. Usage: python scripts/probe_banded_engine.py [N_READS] [T] [BASES]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamont_tpu.models.batch import BandedBatchEngine, BatchItem
from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.utils.synthetic import make_read


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    n_bases = int(sys.argv[3]) if len(sys.argv) > 3 else 1800
    model = load_model_for_pore("rna002")
    items = []
    for s in range(n_reads):
        sig, read = make_read(model, n_bases=n_bases, mean_dwell=9.0, seed=s)
        items.append(BatchItem(sig[:T], read))

    eng = BandedBatchEngine(model, "rna002", dtype=jnp.float32,
                            batch_size=16, max_batch_samples=2**22,
                            t_pad_to=2048)
    eng.run(items[:16])  # warm/compile
    for trial in range(3):
        eng.profile = {"buckets": 0, "reads": 0, "dispatch_s": 0.0,
                       "collect_s": 0.0}
        t0 = time.perf_counter()
        outs = eng.run(items)
        dt = time.perf_counter() - t0
        n_ok = sum(1 for o in outs if o.error is None)
        p = eng.profile
        print(f"run {trial}: {n_ok}/{len(outs)} in {dt*1e3:7.1f} ms | "
              f"dispatch {p['dispatch_s']*1e3:7.1f} ms  "
              f"collect {p['collect_s']*1e3:7.1f} ms  "
              f"({p['buckets']} buckets)", flush=True)

    # serial per-bucket (dispatch+collect interleaved) for comparison
    t0 = time.perf_counter()
    for lo in range(0, n_reads, 16):
        b = eng._dispatch_bucket(items[lo:lo + 16], list(range(16)))
        out = [None] * 16
        eng._collect_bucket(b, out)
    print(f"serial    : {(time.perf_counter()-t0)*1e3:7.1f} ms", flush=True)

    # dispatch-cost anatomy for one bucket
    from dynamont_tpu.ops import nt_banded_device as dv
    from dynamont_tpu.utils.kmer import seq_to_kmer_ids

    its = items[:16]
    t0 = time.perf_counter()
    for _ in range(5):
        kids = [seq_to_kmer_ids(it.read, model.kmer_size,
                                model.alphabet_size) for it in its]
    t_kid = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(5):
        wire = dv.prepare_wire([it.signal for it in its], kids,
                               t_pad_to=2048)
    t_wire = (time.perf_counter() - t0) / 5
    res = eng._dev_run(wire)
    np.asarray(res.Zf)
    t0 = time.perf_counter()
    for _ in range(5):
        res = eng._dev_run(wire)
        np.asarray(res.Zf)[0]
    t_dev = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(res.starts); np.asarray(res.medians)
        np.asarray(res.Zf); np.asarray(res.Zb)
    t_d2h = (time.perf_counter() - t0) / 5
    print(f"per bucket: kmer_ids {t_kid*1e3:6.1f} ms  wire {t_wire*1e3:6.1f} "
          f"ms  device(run+Zf) {t_dev*1e3:6.1f} ms  D2H(rest) "
          f"{t_d2h*1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
