"""Benchmarks: banded (basic) segmentation, NTC resquiggle, sharded training.

Workloads are synthetic RNA002 reads shaped like production data (~1.8k
bases, mean dwell 9, T = 16k samples). Baselines are the reference C++
binaries measured single-core on this machine (see BASELINE.md):

    dynamont-NT-banded -t 1 : 0.75 reads/s   (T~16k, N=1810, band 403)
    dynamont-NTC       -t 1 : 0.072 reads/s  (13.9 s/read, same shape)

Prints one JSON metric line per benchmark, headline (banded) first, and
writes all of them to BENCH_EXTRA.json. DYNAMONT_BENCH_FAST=1 runs only the
headline metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

# reference single-core denominators, RE-MEASURED 2026-08-19 on this host
# (8 runs of dynamont-NT-banded -t 1 at the bench workload, median 0.88
# s/read; the round-1 recording of 1.35 s/read / 0.75 reads/s was slower
# than the current Release build reproduces — using the faster, fresher
# number keeps every vs_baseline honest). NTC re-measured 13.6-13.9 s/read.
REF_BANDED_READS_PER_S = 1.14   # reference single-core basic mode
REF_NTC_READS_PER_S = 0.0727    # reference single-core NTC

N_READS = int(os.environ.get("DYNAMONT_BENCH_READS", 64))
N_BASES = int(os.environ.get("DYNAMONT_BENCH_BASES", 1800))
MEAN_DWELL = 9.0
T_TRIM = int(os.environ.get("DYNAMONT_BENCH_T", 16000))
BAND_B = 403  # reference band width at -b 400


def _force(x):
    import numpy as np

    return np.asarray(x).ravel()[:1]


class MetricList(list):
    """Prints (and flushes) each metric line the moment it lands, so a
    timed-out run still leaves the completed metrics on stdout, and keeps
    BENCH_EXTRA.json current."""

    def append(self, m):  # noqa: A003
        super().append(m)
        print(json.dumps(m), flush=True)
        try:
            path = os.path.join(os.path.dirname(__file__) or ".",
                                "BENCH_EXTRA.json")
            with open(path, "w") as f:
                json.dump(list(self), f, indent=1)
        except OSError:
            pass


def bench_banded(model, items, metrics):
    import jax
    import jax.numpy as jnp

    from dynamont_tpu.models.batch import BandedBatchEngine

    def make_engine():
        # batch_size 32: fewer per-bucket launch/collect round-trips than
        # 16 (394 -> 320 ms on the 64-read pool, measured) while keeping
        # two buckets in flight for H2D/compute/D2H overlap (64 in one
        # bucket loses the overlap: 343 ms)
        return BandedBatchEngine(
            model, "rna002", dtype=jnp.float32, batch_size=32,
            max_batch_samples=2**22, t_pad_to=2048,
        )

    eng = make_engine()
    try:
        warm = eng.run(items[:16])
    except Exception as e:
        if os.environ.get("DYNAMONT_USE_PALLAS") == "0":
            raise
        # Mosaic path failed to compile/run: report the scan path rather
        # than no headline metric at all
        print(f"banded pallas path failed ({e}); scan fallback",
              file=sys.stderr)
        os.environ["DYNAMONT_USE_PALLAS"] = "0"
        eng = make_engine()
        warm = eng.run(items[:16])
    n_err = sum(1 for o in warm if o.error is not None)
    if n_err:
        print(f"banded warmup errors: {n_err}/{len(warm)}", file=sys.stderr)

    # best of 3 timed runs (median reported alongside): the host<->device
    # tunnel link is shared and noisy (observed 71-86 reads/s on identical
    # work); the best run is the honest measure of the pipeline itself,
    # the median shows the run-to-run spread (methodology in BASELINE.md)
    times, dt, n_ok = [], 1e18, 0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = eng.run(items)
        d = time.perf_counter() - t0
        times.append(d)
        if d < dt:
            dt = d
            n_ok = sum(1 for o in outs if o.error is None)
    dt_med = sorted(times)[len(times) // 2]
    reads_per_s = n_ok / dt

    # device-time attribution: replay each bucket's device program with
    # its inputs already resident (the wire was device_put at dispatch),
    # draining per launch — no H2D in the loop, so this isolates device
    # compute + the small summary D2H from the tunnel-dominated wall time
    buckets = [
        eng._dispatch_bucket([items[i] for i in g], g)
        for g in eng._buckets(items)
    ]
    for b in buckets:
        _force(b[3].Zf)  # drain warm-up round
    # min of 3 replays, completion via jax.block_until_ready: np.asarray
    # would pull the result tensors back through the host<->device tunnel
    # (~0.9 MB of summaries per pool at ~8 MB/s — ~60 ms/bucket of D2H
    # billed as "device time"; the round-4 >100% utilization came from
    # exactly this plus replay-side tunnel stalls). block_until_ready
    # waits for the device programs without transferring, so device_s is
    # device COMPUTE; the dispatch wall `dt` additionally carries the
    # (partially overlapped) H2D/D2H traffic, and their ratio is a true
    # compute-utilization of the wall.
    import jax as _jax

    dev_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        ress = []
        for _, _, wire, _ in buckets:
            # match the dispatch call's committed device: device=None
            # builds UNcommitted table arrays, a different jit cache entry
            # (a fresh ~35 s compile) — not the program the engine runs
            dev = next(iter(wire.dacs.devices()))
            ress.append(eng._dev_run(wire, device=dev))
        for res in ress:
            _jax.block_until_ready(res.Zf)
            _jax.block_until_ready(res.starts)
        dev_times.append(time.perf_counter() - t0)
    device_s = min(dev_times)
    util = device_s / dt
    total_samples = sum(len(it.signal) for it in items)
    # DP cells: T x B band cells per wavefront pass; fwd + bwd + fused
    # posterior/Viterbi = 3 passes (the walk revisits 1 cell/row)
    cells = 3 * total_samples * BAND_B
    print(
        f"banded: {n_ok}/{len(outs)} reads in {dt:.2f}s "
        f"({total_samples / dt / 1e6:.1f}M samples/s, "
        f"{cells / dt / 1e9:.1f}G cells/s, device={jax.devices()[0].platform})",
        file=sys.stderr,
    )
    metrics.append({
        "metric": "banded_segmentation_throughput",
        "value": round(reads_per_s, 3),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / REF_BANDED_READS_PER_S, 1),
    })
    metrics.append({
        "metric": "banded_dp_cells_per_s",
        "value": round(cells / dt / 1e9, 2),
        "unit": "Gcells/s",
        "vs_baseline": round(
            (cells / dt) / (REF_BANDED_READS_PER_S * 3 * T_TRIM * BAND_B), 1
        ),
    })
    metrics.append({
        "metric": "banded_throughput_median_of_3",
        "value": round(n_ok / dt_med, 3),
        "unit": "reads/s",
        "vs_baseline": round(n_ok / dt_med / REF_BANDED_READS_PER_S, 1),
    })
    print(
        f"banded device time: {device_s:.3f}s (replays "
        f"{'/'.join(f'{x:.3f}' for x in sorted(dev_times))}) of {dt:.3f}s "
        f"wall ({100 * util:.0f}% utilization, "
        f"{cells / device_s / 1e9:.1f}G device cells/s)", file=sys.stderr,
    )
    # the two raw times side-by-side so the ratio below is auditable
    metrics.append({
        "metric": "banded_device_time",
        "value": round(device_s, 3),
        "unit": "s (min of 3 replays)",
        "vs_baseline": round(dt, 3),  # best-of-3 dispatch wall, same pool
    })
    metrics.append({
        "metric": "banded_device_cells_per_s",
        "value": round(cells / device_s / 1e9, 2),
        "unit": "Gcells/s",
        "vs_baseline": round(
            (cells / device_s)
            / (REF_BANDED_READS_PER_S * 3 * T_TRIM * BAND_B), 1),
    })
    metrics.append({
        "metric": "banded_device_utilization",
        "value": round(100 * util, 1),
        "unit": "%",
        "vs_baseline": round(util, 3),
    })

    # single-process multi-device scaling: reads/s at each device count
    # (one point on a 1-chip host; the full curve on multi-chip hosts)
    devs = jax.local_devices()
    if len(devs) > 1:
        rates = []
        for nd in range(1, len(devs) + 1):
            e = make_engine()
            e.devices = devs[:nd]
            # warm with the FULL pool: round-robin places buckets on
            # every device, and each device's first dispatch is a fresh
            # per-device jit cache entry (~35 s compile) that must not
            # land in the timed run
            e.run(items)
            t0 = time.perf_counter()
            outs = e.run(items)
            d = time.perf_counter() - t0
            rates.append(sum(1 for o in outs if o.error is None) / d)
        print("banded scaling reads/s vs n_devices: "
              + ", ".join(f"{i + 1}:{r:.1f}" for i, r in enumerate(rates)),
              file=sys.stderr)
        metrics.append({
            "metric": "banded_multidevice_throughput",
            "value": round(rates[-1], 3),
            "unit": f"reads/s@{len(devs)}dev",
            "vs_baseline": round(rates[-1] / REF_BANDED_READS_PER_S, 1),
        })


def bench_banded_ragged(model, metrics):
    """Mixed-length pool (8k-32k samples, ragged base counts): exercises
    the bucketing/padding logic under timing, incl. a tail bucket.
    vs_baseline is in SAMPLES/s against the reference single-core rate
    (0.75 reads/s x 16k samples) since reference cost scales with T."""
    import jax.numpy as jnp

    from dynamont_tpu.models.batch import BandedBatchEngine, BatchItem
    from dynamont_tpu.utils.synthetic import make_read

    lengths = [8000, 12000, 16000, 24000, 32000]
    items = []
    for s in range(36):  # 36 reads -> uneven buckets incl. a tail
        L = lengths[s % len(lengths)]
        nb = max(200, int(N_BASES * L / 16000))
        sig, read = make_read(model, n_bases=nb, mean_dwell=MEAN_DWELL,
                              seed=1000 + s)
        items.append(BatchItem(sig[:L], read))
    eng = BandedBatchEngine(
        model, "rna002", dtype=jnp.float32, batch_size=16,
        max_batch_samples=2**22, t_pad_to=2048,
    )
    eng.run(items)  # warm every bucket shape
    # best of 3 like the headline metric: the tunnel link's run-to-run
    # noise (±15%+) otherwise dominates round-over-round comparisons
    dt = 1e18
    for _ in range(3):
        t0 = time.perf_counter()
        outs = eng.run(items)
        dt = min(dt, time.perf_counter() - t0)
    n_ok = sum(1 for o in outs if o.error is None)
    total = sum(len(it.signal) for it in items)
    print(f"banded ragged: {n_ok}/{len(outs)} reads, {len(list(eng._buckets(items)))} "
          f"buckets in {dt:.2f}s ({total / dt / 1e6:.1f}M samples/s)",
          file=sys.stderr)
    metrics.append({
        "metric": "banded_ragged_samples_per_s",
        "value": round(total / dt / 1e6, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(
            (total / dt) / (REF_BANDED_READS_PER_S * 16000), 1),
    })


def bench_ntc(model, items, metrics):
    import jax.numpy as jnp

    from dynamont_tpu.models.ntc_batch import NTCBatchEngine

    eng = NTCBatchEngine(
        model, "rna002", dtype=jnp.float32, batch_size=16,
        max_batch_samples=2**22, fallback=False,
    )
    # time 2 buckets when enough distinct reads exist; small smoke runs
    # re-time the warmup bucket instead of an empty slice
    pool = items[16:] or items[:16]
    try:
        warm = eng.run(items[:16])
    except Exception as e:
        if not eng.pallas:
            raise
        # Mosaic path failed to compile/run: report the scan path rather
        # than no NTC number at all
        print(f"ntc pallas path failed ({e}); scan fallback",
              file=sys.stderr)
        eng = NTCBatchEngine(
            model, "rna002", dtype=jnp.float32, batch_size=16,
            max_batch_samples=2**22, fallback=False, pallas=False,
        )
        warm = eng.run(items[:16])
    t0 = time.perf_counter()
    outs = eng.run(pool[:48])
    dt = time.perf_counter() - t0
    n_ok = sum(1 for o in outs if o.error is None)
    n_ovf = sum(
        1 for o in outs if o.error is not None and "overflow" in o.error
    )
    # throughput counts every completed read; overflow reads re-run on the
    # exact path in production (fallback disabled here to keep the metric a
    # pure device number) — report the overflow share alongside
    reads_per_s = len(outs) / dt * (n_ok / max(1, len(outs)))
    print(
        f"ntc: {n_ok}/{len(outs)} reads ok ({n_ovf} cap-overflow) in "
        f"{dt:.2f}s", file=sys.stderr,
    )
    metrics.append({
        "metric": "ntc_resquiggle_throughput",
        "value": round(reads_per_s, 3),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / REF_NTC_READS_PER_S, 1),
    })

    if not eng.pallas:
        return
    # batched NTC Baum-Welch (resquiggle-mode training); the reference
    # --train pass costs about the same as its segmentation pass
    try:
        warm = eng.train(items[:16])
        t0 = time.perf_counter()
        outs = eng.train(pool[:48])
        dt = time.perf_counter() - t0
        n_ok = sum(1 for o in outs if not isinstance(o, Exception))
        tr_per_s = len(outs) / dt * (n_ok / max(1, len(outs)))
        print(f"ntc train: {n_ok}/{len(outs)} reads in {dt:.2f}s",
              file=sys.stderr)
        metrics.append({
            "metric": "ntc_train_throughput",
            "value": round(tr_per_s, 3),
            "unit": "reads/s",
            "vs_baseline": round(tr_per_s / REF_NTC_READS_PER_S, 1),
        })
    except Exception as e:
        print(f"ntc train bench failed: {e}", file=sys.stderr)


def bench_ntc_noisy(model, metrics):
    """Overflow behavior on NOISY reads (the clean pool never overflows):
    scaled Gaussian noise, outlier spikes, and wrong bases widen the 95%-
    mass candidate sets (ref: NTC.hpp:29). Measures the overflow rate and
    the cost of the fp32 wide-cap retry rung that repairs those reads
    before the per-read fp64 cliff."""
    import jax.numpy as jnp
    import numpy as np

    from dynamont_tpu.models.batch import BatchItem
    from dynamont_tpu.models.ntc_batch import NTCBatchEngine
    from dynamont_tpu.utils.synthetic import make_read

    rng = np.random.default_rng(7)
    items = []
    for s in range(32):
        sig, read = make_read(model, n_bases=N_BASES, mean_dwell=MEAN_DWELL,
                              seed=500 + s, noise_scale=1.6)
        sig = sig[:T_TRIM].copy()
        # outlier spikes (~0.5% of samples) + a few wrong bases
        n_spk = len(sig) // 200
        sig[rng.integers(0, len(sig), n_spk)] += rng.normal(
            0, 12.0, n_spk)
        read = list(read)
        for p in rng.integers(9, len(read), 6):
            read[p] = "ACGT"[rng.integers(0, 4)]
        items.append(BatchItem(sig, "".join(read)))
    eng = NTCBatchEngine(
        model, "rna002", dtype=jnp.float32, batch_size=16,
        max_batch_samples=2**22,
    )
    eng.run(items[:16])  # warm the main bucket shape
    # warm the wide-cap rung program too (run one read through it
    # directly): its first compile is ~1-2 min, which is not the
    # per-read repair cost this metric reports
    eng._run_wide([0], items, [None] * len(items))
    # zero every retry counter: the warm run(items[:16]) itself may have
    # sent overflowing noisy reads through the rung, which would inflate
    # the measured overflow rate (and deflate the per-read repair cost)
    eng.profile["exact_s"] = 0.0
    eng.profile["wide_s"] = 0.0
    eng.profile["reads"] = 0
    eng.profile["wide_retries"] = 0
    eng.profile["exact_retries"] = 0
    t0 = time.perf_counter()
    outs = eng.run(items)
    dt = time.perf_counter() - t0
    n_ok = sum(1 for o in outs if o.error is None)
    n_wide = eng.profile.get("wide_retries", 0)
    n_exact = eng.profile["exact_retries"]
    ovf_rate = n_wide / max(1, eng.profile["reads"])
    print(
        f"ntc noisy: {n_ok}/{len(outs)} ok, {n_wide} cap-overflow "
        f"({100 * ovf_rate:.0f}%), {n_exact} reached fp64, "
        f"{dt:.2f}s total", file=sys.stderr,
    )
    metrics.append({
        "metric": "ntc_noisy_overflow_rate",
        "value": round(100 * ovf_rate, 1),
        "unit": "%",
        "vs_baseline": round(ovf_rate, 3),
    })
    if n_wide:
        # wide-rung cost per overflowing read (the whole point: < 1 s,
        # vs ~40 s/read on the old per-read fp64 cliff)
        wide_s = eng.profile.get("wide_s", 0.0)
        metrics.append({
            "metric": "ntc_overflow_retry_cost",
            "value": round(wide_s / n_wide, 3),
            "unit": "s/read",
            "vs_baseline": round((wide_s / n_wide) / 40.0, 3),
        })


def bench_train(model, items, metrics):
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynamont_tpu.constants import NT_TRANSITIONS
    from dynamont_tpu.ops import nt_banded_batch as bb
    from dynamont_tpu.parallel import make_mesh, make_sharded_train_step
    from dynamont_tpu.parallel.train_step import shard_batch_for_mesh
    from dynamont_tpu.utils.kmer import seq_to_kmer_ids

    # reference default batch_size=24 (train.py:61-64)
    reads = items[:24]
    kids = [
        seq_to_kmer_ids(it.read, model.kmer_size, model.alphabet_size)
        for it in reads
    ]
    batch = bb.prepare_batch(
        [it.signal for it in reads], kids, model.means, model.stdevs,
        dtype=jnp.float32, t_pad_to=2048,
    )
    N_max = max(len(k) for k in kids) + 1
    kid_pad = np.zeros((len(kids), N_max - 1), np.int32)
    for i, k in enumerate(kids):
        kid_pad[i, : len(k)] = k
    mesh = make_mesh(len(jax.devices()))
    sbatch, skid, n_real = shard_batch_for_mesh(batch, kid_pad, mesh)
    trans = NT_TRANSITIONS["rna002"]
    step = make_sharded_train_step(
        mesh, trans["m1"], trans["e2"], model.num_kmers,
        pad=sbatch.pad, B=sbatch.B, dtype=jnp.float32,
    )
    out = step(sbatch, skid)  # warmup/compile
    _force(out.pooled.n_valid)
    dt = 1e18
    for _ in range(3):  # best of 3 (tunnel noise; see bench_banded)
        t0 = time.perf_counter()
        out = step(sbatch, skid)
        _force(out.pooled.n_valid)
        dt = min(dt, time.perf_counter() - t0)
    reads_per_s = n_real / dt
    print(f"train: {n_real} reads/step in {dt:.2f}s", file=sys.stderr)
    metrics.append({
        "metric": "train_step_throughput",
        "value": round(reads_per_s, 3),
        "unit": "reads/s",
        # reference --train runs the same banded DP + estimate pass per
        # read; its single-core segmentation rate is the closest baseline
        "vs_baseline": round(reads_per_s / REF_BANDED_READS_PER_S, 1),
    })


def bench_9mer(metrics):
    """Native 9-mer NTC (K = 4^9) at production length — the config the
    reference cannot run at all (its four dense T x K double matrices are
    ~70 GB at T=16k, NTC.cpp:145-217). vs_baseline is measured s/read
    against the round-3 target of 2.0 s/read (no reference denominator
    exists)."""
    import jax.numpy as jnp
    import numpy as np

    from dynamont_tpu.models.batch import BatchItem
    from dynamont_tpu.models.ntc_batch import NTCBatchEngine
    from dynamont_tpu.utils.pore_model import PoreModel
    from dynamont_tpu.utils.synthetic import make_read

    # synthetic 9-mer table with realistic normalized per-kmer noise
    # (see scripts/probe_9mer_engine.py; the real rna004_9mer blob is
    # git-LFS-absent from this environment and the reference mount)
    rng = np.random.default_rng(0)
    K = 4 ** 9
    model9 = PoreModel(
        means=rng.normal(0.0, 1.0, K).astype(np.float64),
        stdevs=(0.08 + 0.08 * rng.random(K)).astype(np.float64),
        kmer_size=9, alphabet_size=4, rna=True,
    )
    items = []
    for s in range(16):
        sig, read = make_read(model9, n_bases=max(40, T_TRIM // 9),
                              mean_dwell=MEAN_DWELL, seed=s)
        items.append(BatchItem(sig[: T_TRIM - 1], read))
    eng = NTCBatchEngine(model9, "rna004", dtype=jnp.float32,
                         native_kmer=True, fallback=False)
    outs = eng.run(items)  # warmup/compile
    dt = 1e18
    for _ in range(2):  # best of 2 (the bucket is ~21 s of device time)
        t0 = time.perf_counter()
        outs = eng.run(items)
        dt = min(dt, time.perf_counter() - t0)
    ok = sum(1 for o in outs if o.error is None)
    s_per_read = dt / len(items)
    print(f"ntc 9-mer native: {ok}/{len(items)} reads in {dt:.1f}s "
          f"({s_per_read:.2f} s/read, K=4^9, T={T_TRIM})", file=sys.stderr)
    metrics.append({
        "metric": "ntc_9mer_seconds_per_read",
        "value": round(s_per_read, 3),
        "unit": "s/read",
        "vs_baseline": round(2.0 / s_per_read, 2),  # vs the 2 s/read target
    })


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dynamont_tpu.models.batch import BatchItem
    from dynamont_tpu.models.registry import load_model_for_pore
    from dynamont_tpu.utils.synthetic import make_read

    model = load_model_for_pore("rna002")
    items = []
    for s in range(N_READS):
        sig, read = make_read(model, n_bases=N_BASES, mean_dwell=MEAN_DWELL,
                              seed=s)
        # uniform signal length -> one padded bucket shape per engine
        items.append(BatchItem(sig[:T_TRIM], read))

    metrics = MetricList()
    bench_banded(model, items, metrics)
    if os.environ.get("DYNAMONT_BENCH_FAST") != "1":
        try:
            bench_banded_ragged(model, metrics)
        except Exception as e:
            print(f"ragged bench failed: {e}", file=sys.stderr)
        try:
            bench_ntc(model, items, metrics)
        except Exception as e:  # keep the headline metric alive
            print(f"ntc bench failed: {e}", file=sys.stderr)
        try:
            bench_ntc_noisy(model, metrics)
        except Exception as e:
            print(f"ntc noisy bench failed: {e}", file=sys.stderr)
        try:
            bench_train(model, items, metrics)
        except Exception as e:
            print(f"train bench failed: {e}", file=sys.stderr)
        try:
            bench_9mer(metrics)
        except Exception as e:
            print(f"9mer bench failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
