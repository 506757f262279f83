"""TPU probe: native 9-mer NTC engine at production length.

Runs NTCBatchEngine(native_kmer=True) on 16 synthetic reads (T=16000,
K=4^9) — the configuration behind BASELINE.md's s/read numbers — and
reports s/read + per-stage profile.  Run: python scripts/probe_9mer_engine.py [n_reads] [T]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from dynamont_tpu.models.batch import BatchItem
from dynamont_tpu.models.ntc_batch import NTCBatchEngine
from dynamont_tpu.utils.pore_model import PoreModel
from dynamont_tpu.utils.synthetic import make_read


def synth_9mer_model(seed=0):
    """Synthetic 9-mer table with REALISTIC per-kmer noise (normalized
    real pore tables have sd/range ~0.03-0.08; wider synthetic sds like
    0.3-0.5 make the TK posterior columns genuinely fat — thousands of
    95%-mass candidates — which no static cap can hold and which real
    tables do not exhibit)."""
    rng = np.random.default_rng(seed)
    K = 4 ** 9
    means = rng.normal(0.0, 1.0, K).astype(np.float64)
    stdevs = (0.08 + 0.08 * rng.random(K)).astype(np.float64)
    return PoreModel(means=means, stdevs=stdevs, kmer_size=9,
                     alphabet_size=4, rna=True)


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    model = synth_9mer_model()
    items = []
    for s in range(n_reads):
        sig, read = make_read(model, n_bases=max(40, T // 9),
                              mean_dwell=9.0, seed=s)
        items.append(BatchItem(sig[: T - 1], read))
    eng = NTCBatchEngine(model, "rna004", dtype=jnp.float32,
                         native_kmer=True, fallback=False)
    print(f"9-mer engine: pallas={eng.pallas} R={n_reads} T={T}",
          flush=True)
    t0 = time.perf_counter()
    outs = eng.run(items)
    warm = time.perf_counter() - t0
    ok = sum(1 for o in outs if o.error is None)
    print(f"warm run: {warm:.1f}s  ok={ok}/{n_reads}", flush=True)
    for o in outs:
        if o.error is not None:
            print("  err:", o.error)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = eng.run(items)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    ok = sum(1 for o in outs if o.error is None)
    print(f"9-mer: {dt:.1f}s for {n_reads} reads = "
          f"{dt / n_reads:.2f} s/read (ok={ok})", flush=True)
    print("profile:", {k: (round(v, 3) if isinstance(v, float) else v)
                       for k, v in eng.profile.items()
                       if k != "device_buckets"}, flush=True)


if __name__ == "__main__":
    main()
