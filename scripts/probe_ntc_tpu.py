"""TPU probe: batched NTC throughput at production shapes.

Usage: python scripts/probe_ntc_tpu.py [R] [T] [N_BASES]
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

from dynamont_tpu.models.batch import BatchItem
from dynamont_tpu.models.ntc_batch import NTCBatchEngine
from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.utils.synthetic import make_read


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    n_bases = int(sys.argv[3]) if len(sys.argv) > 3 else 1800
    print(f"devices: {jax.devices()}", flush=True)
    model = load_model_for_pore("rna002")
    items = []
    for s in range(2 * R):
        sig, read = make_read(model, n_bases=n_bases, mean_dwell=9.0, seed=s)
        items.append(BatchItem(sig[:T], read))
    eng = NTCBatchEngine(
        model, "rna002", dtype=jnp.float32, batch_size=R,
        max_batch_samples=50_000_000, fallback=False,
    )
    t0 = time.time()
    outs = eng.run(items[:R])
    print(f"warmup (compile+run): {time.time()-t0:.1f}s", flush=True)
    errs = [o.error for o in outs if o.error]
    print(f"errors: {len(errs)} {errs[:2]}", flush=True)
    ok = [o for o in outs if o.error is None]
    if ok:
        print(f"nseg[0]: {len(ok[0].segments)}, Z[0]: {ok[0].Z:.2f}", flush=True)

    for trial in range(3):
        t0 = time.time()
        outs = eng.run(items[R:2 * R])
        dt = time.time() - t0
        n_ok = sum(1 for o in outs if o.error is None)
        print(f"trial {trial}: {dt:.2f}s for {R} reads -> "
              f"{n_ok / dt:.2f} reads/s (ok={n_ok})", flush=True)


if __name__ == "__main__":
    main()
