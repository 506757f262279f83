"""Headline benchmark: banded-mode resquiggling throughput (reads/s).

Workload: a stream of 64 synthetic RNA002 reads shaped like production data
(~1.8k bases, mean dwell 9, T = 16k samples), segmented end-to-end through
the batched banded engine (host prep + wire H2D + Mosaic DP kernels + device
traceback walk + D2H summaries), fp32; buckets of 16 pipeline against each
other via async dispatch.

Baseline: the reference C++ `dynamont-NT-banded -t 1` measured on identical
synthetic reads on this machine's host CPU: 1.35 s/read median => 0.74
reads/s (3 reads, T~=16.2k, N=1810, band 403; see BASELINE.md measurement
protocol). vs_baseline = our reads/s / 0.74.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

REF_READS_PER_S = 0.75  # single-core reference C++, same workload scaled to
                        # the trimmed T=16000 (1.35 s/read at T=16.3k median)

N_READS = 64
N_BASES = 1800
MEAN_DWELL = 9.0


def main() -> None:
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dynamont_tpu.models.batch import BandedBatchEngine, BatchItem
    from dynamont_tpu.models.registry import load_model_for_pore
    from dynamont_tpu.utils.synthetic import make_read

    model = load_model_for_pore("rna002")
    items = []
    for s in range(N_READS):
        sig, read = make_read(model, n_bases=N_BASES, mean_dwell=MEAN_DWELL, seed=s)
        # uniform signal length -> one padded bucket shape -> one XLA/Mosaic
        # compile during warmup (cold compiles cost minutes per shape)
        items.append(BatchItem(sig[:16000], read))
    total_samples = sum(len(it.signal) for it in items)
    eng = BandedBatchEngine(
        model, "rna002", dtype=jnp.float32, batch_size=16,
        max_batch_samples=2**22, t_pad_to=2048,
    )

    # warmup: one bucket covers the single padded shape
    warm = eng.run(items[:16])
    n_err = sum(1 for o in warm if o.error is not None)
    if n_err:
        print(f"warmup errors: {n_err}/{len(warm)}", file=sys.stderr)

    t0 = time.perf_counter()
    outs = eng.run(items)
    dt = time.perf_counter() - t0
    n_ok = sum(1 for o in outs if o.error is None)
    reads_per_s = n_ok / dt
    print(
        f"segmented {n_ok}/{len(outs)} reads in {dt:.2f}s "
        f"({total_samples/dt/1e6:.1f}M samples/s, device={jax.devices()[0].platform})",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "banded_resquiggle_throughput",
        "value": round(reads_per_s, 3),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / REF_READS_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
