"""NTC (resquiggle-mode) Baum-Welch sharded over the reads mesh axis.

Each device runs the full NTC train bucket program — pre-passes, lite
plan, Mosaic forward-store + train kernels — on its local 16-read shard,
then the 13 transition-term statistics and the emission moment sums are
merged with psum over ICI (BASELINE config 4; ref semantics:
NTC.cpp:923-1130 + the driver-host pooling of train.py:236-247).

Kernel geometry fixes the per-device shard at 16 reads (ops/ntc_pallas),
so a step over an n-device mesh consumes n*16 read slots; short batches
are padded with replicas of read 0 that are masked out of every pooled
statistic via the `real` flags.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamont_tpu.constants import (
    NT_TRANSITIONS, NTK_TRANSITIONS, resolve_transitions,
)
from dynamont_tpu.models.ntc_batch import FP32_EPSILON, round_up
from dynamont_tpu.utils.pore_model import PoreModel

R_SHARD = 16  # reads per device: the Mosaic kernel geometry (ops/ntc_pallas)


class NTCShard(NamedTuple):
    """Read batch laid out for the mesh (reads axis sharded)."""

    sig: jax.Array    # (R_g, T_pad-1) float32
    kid: jax.Array    # (R_g, N2-1) int32
    T: jax.Array      # (R_g,) int32
    N: jax.Array      # (R_g,) int32
    real: jax.Array   # (R_g,) bool — False for padding replicas
    n_real: int


class NTCPooled(NamedTuple):
    """psum-merged batch statistics (replicated across devices)."""

    trans_sum: jax.Array   # (13,) sum over valid reads of per-read prob
    n_valid: jax.Array     # scalar
    mean_sum: jax.Array    # (K,) sum of per-read kmer mean estimates
    stdev_sum: jax.Array   # (K,)
    kmer_count: jax.Array  # (K,) contributing reads per kmer
    z_sum: jax.Array       # scalar sum of per-read Z over valid reads


def prepare_ntc_shard(items, model: PoreModel, mesh: Mesh,
                      t_pad_to: int = 2048, n_pad_to: int = 128) -> NTCShard:
    """Pad reads to n_devices * 16 slots and shard over the mesh.

    items: list of (signal, read) pairs or BatchItem-likes with .signal /
    .read attributes."""
    from dynamont_tpu.utils.kmer import seq_to_kmer_ids

    def _sig_read(it):
        if hasattr(it, "signal"):
            return it.signal, it.read
        return it

    n_dev = mesh.devices.size
    R_g = n_dev * R_SHARD
    pairs = [_sig_read(it) for it in items]
    if not pairs:
        raise ValueError("prepare_ntc_shard: empty batch")
    if len(pairs) > R_g:
        raise ValueError(
            f"{len(pairs)} reads > {R_g} slots on the {n_dev}-device mesh")
    n_real = len(pairs)
    sigs = [np.asarray(s, np.float32) for s, _ in pairs]
    kids = [
        np.asarray(seq_to_kmer_ids(r, model.kmer_size, model.alphabet_size),
                   np.int32)
        for _, r in pairs
    ]
    T_arr = np.array([len(s) + 1 for s in sigs], np.int32)
    N_arr = np.array([len(k) + 1 for k in kids], np.int32)
    pad = R_g - n_real
    if pad:
        T_arr = np.concatenate([T_arr, np.repeat(T_arr[:1], pad)])
        N_arr = np.concatenate([N_arr, np.repeat(N_arr[:1], pad)])
    T_pad = round_up(int(T_arr.max()), t_pad_to)
    N2 = round_up(int(N_arr.max()), n_pad_to)
    sig = np.zeros((R_g, T_pad - 1), np.float32)
    kid = np.zeros((R_g, N2 - 1), np.int32)
    for j in range(R_g):
        src = j if j < n_real else 0
        sig[j, : T_arr[j] - 1] = sigs[src]
        kid[j, : N_arr[j] - 1] = kids[src]
    real = np.arange(R_g) < n_real
    spec = NamedSharding(mesh, P(mesh.axis_names[0]))
    put = lambda a: jax.device_put(a, spec)
    return NTCShard(put(sig), put(kid), put(T_arr), put(N_arr), put(real),
                    n_real)


# TERMS-indexed normalization groups (ref: NTC.cpp:1003-1030)
_GROUPS = (("a1", "s2", "e4", "i1", "p2"), ("e3", "p1"),
           ("e2", "s1"), ("a2", "i2", "p3", "s3"))


def _trans_probs_device(term_lse):
    """(13, R) raw term logsumexps -> (13, R) normalized probabilities
    (vectorized trans_from_terms; groups per NTC.cpp:1003-1030)."""
    from dynamont_tpu.ops.ntc_pallas import TERMS

    idx = {k: i for i, k in enumerate(TERMS)}
    out = term_lse
    for group in _GROUPS:
        rows = jnp.asarray([idx[k] for k in group])
        vals = term_lse[rows]                       # (g, R)
        m = jnp.max(vals, axis=0)
        safe = jnp.where(jnp.isfinite(m), m, 0.0)
        g_lse = jnp.log(jnp.sum(jnp.exp(vals - safe), axis=0)) + safe
        g_lse = jnp.where(jnp.isfinite(m), g_lse, -jnp.inf)
        norm = jnp.where(jnp.isfinite(g_lse), vals - g_lse, vals)
        out = out.at[rows].set(norm)
    return jnp.exp(out)


def _emission_estimates_device(em, model_means):
    """(R, 3, K) centered moment sums -> per-read (means, stdevs, contrib)
    (vectorized emissions_from_moments; ref: NTC.cpp:1059-1130)."""
    from dynamont_tpu.ops.ntc_train import TRAIN_THRESHOLD

    norm, s1, s2 = em[:, 0], em[:, 1], em[:, 2]
    nz = norm != 0
    safe = jnp.where(nz, norm, 1.0)
    d = s1 / safe
    keep = norm >= TRAIN_THRESHOLD
    var = jnp.where(keep & nz, jnp.maximum(s2 / safe - d * d, 0.0), 0.0)
    means = jnp.where(nz, model_means[None, :] + d, 0.0)
    stdevs = jnp.sqrt(var)
    return means, stdevs, stdevs > 0.0


def make_ntc_sharded_train_step(mesh: Mesh, model: PoreModel, pore: str,
                                transition_overrides: dict | None = None,
                                cap_n: int = 8, cap_k: int = 120,
                                interpret: bool | None = None):
    """Build the jitted SPMD NTC training step for the mesh.

    cap defaults (8, 120) are the Mosaic kernel geometry (CK = cap_k +
    cap_n tile-pads to exactly 128 lanes, asserted in ops/ntc_pallas) —
    the same caps NTCBatchEngine forces on its own pallas path, so
    single- and multi-chip training run identical candidate geometry.
    (The engine's nominal cap_k=112 default applies only to the scan
    path, where CK is not lane-tiled.)

    interpret=None auto-selects: native Mosaic on TPU, interpret mode on
    CPU meshes (the multichip dryrun). Returns step(shard, tl_overrides=None)
    -> dict with per-read arrays (gathered) + NTCPooled (replicated);
    updated transitions enter as a traced (13,) log array, so per-batch
    parameter updates never recompile."""
    from dynamont_tpu.ops.ntc_pallas import TL_KEYS
    from dynamont_tpu.models.ntc_batch import ntc_train_bucket_program

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",) and \
            jax.devices()[0].platform not in ("tpu", "axon")
    axis = mesh.axis_names[0]
    ntk = resolve_transitions(NTK_TRANSITIONS[pore], transition_overrides)
    nt = NT_TRANSITIONS[pore]
    log_ppm, log_ppe = math.log(nt["m1"]), math.log(nt["e2"])
    dtype = jnp.float32
    A, S, K = model.alphabet_size, model.kmer_size, model.num_kmers
    tab0 = _model_tables(model)
    tl0 = jnp.asarray([math.log(ntk[k]) for k in TL_KEYS], dtype)

    def shard_fn(sig, kid, T_r, N_r, real, tl_arr, mu, sd, c1, c2):
        res = ntc_train_bucket_program(
            sig, kid, T_r, N_r, mu, sd, c1, c2, tl_arr,
            A=A, S=S, K=K, log_ppm=log_ppm, log_ppe=log_ppe,
            CN=cap_n, CK0=cap_k, interpret=interpret,
        )
        zdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        Tf = T_r.astype(zdt)
        Nf = N_r.astype(zdt)
        cells3 = Tf * 5 * cap_n * (cap_k + cap_n)

        def zok(zf, zb, cells):
            zf_w = zf.astype(zdt)
            zb_w = zb.astype(zdt)
            return (jnp.isfinite(zf_w) & jnp.isfinite(zb_w)
                    & (jnp.abs(zf_w - zb_w) / cells <= FP32_EPSILON))

        ok = (
            real
            & ~res["ovf_tn"] & ~res["ovf_tk"]
            & zok(res["Zf_tn"], res["Zb_tn"], Tf * Nf)
            & zok(res["Zf_tk"], res["Zb_tk"], Tf * K)
            & zok(res["Zf"], res["Zb"], cells3)
        )
        okf = ok.astype(dtype)
        probs = _trans_probs_device(res["term_lse"])          # (13, R)
        e_means, e_stdevs, contrib = _emission_estimates_device(
            res["em"], mu)
        cf = (contrib & ok[:, None]).astype(dtype)
        pooled = NTCPooled(
            trans_sum=jax.lax.psum(jnp.sum(probs * okf[None, :], axis=1),
                                   axis),
            n_valid=jax.lax.psum(jnp.sum(okf), axis),
            mean_sum=jax.lax.psum(jnp.sum(e_means * cf, axis=0), axis),
            stdev_sum=jax.lax.psum(jnp.sum(e_stdevs * cf, axis=0), axis),
            kmer_count=jax.lax.psum(jnp.sum(cf, axis=0), axis),
            z_sum=jax.lax.psum(
                jnp.sum(jnp.where(ok, res["Zf"].astype(dtype), 0.0)), axis),
        )
        return dict(
            ok=ok, Zf=res["Zf"], Zb=res["Zb"], term_lse=res["term_lse"],
            em=res["em"], pooled=pooled,
        )

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(),
                  P(), P(), P(), P()),
        out_specs=dict(
            ok=P(axis), Zf=P(axis), Zb=P(axis),
            term_lse=P(None, axis), em=P(axis),
            pooled=NTCPooled(*(P() for _ in NTCPooled._fields)),
        ),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def step(shard: NTCShard, tl_overrides: dict | None = None,
             model_now: PoreModel | None = None):
        """model_now: CURRENT emission tables (traced arguments, so the
        per-batch Baum-Welch updates reach the device program without
        recompiling — baking them into the closure would silently train
        every later batch against the FIRST batch's parameters)."""
        tl = tl0
        if tl_overrides is not None:
            tl = jnp.asarray(
                [math.log(tl_overrides[k]) for k in TL_KEYS], dtype)
        tabs = tab0 if model_now is None else _model_tables(model_now)
        # fp32 Mosaic program: trace with x64 OFF regardless of caller
        # config — dynamont-train sets jax_enable_x64 unconditionally
        # (cli/train.py) and tracing these kernels under x64 recurses
        # inside JAX's dtype conversion on TPU (see
        # models.ntc_batch.make_ntc_train_fn). The Z-gate zdt then
        # resolves to fp32, matching the single-device gate.
        with jax.enable_x64(False):
            return jitted(shard.sig, shard.kid, shard.T, shard.N,
                          shard.real, tl, *tabs)

    return step


def _model_tables(model: PoreModel):
    dtype = jnp.float32
    mu = jnp.asarray(model.means, dtype)
    sd = jnp.asarray(model.stdevs, dtype)
    _, c1_np, c2_np = model.score_params()
    return (mu, sd, jnp.asarray(c1_np, dtype), jnp.asarray(c2_np, dtype))


def pool_ntc_params(pooled: NTCPooled):
    """Batch-mean 14-param + emission update from pooled stats (host-side;
    the psum replaces per-read driver-host pooling, ref: train.py:236-247)."""
    from dynamont_tpu.ops.ntc_pallas import TERMS

    n = float(pooled.n_valid)
    if n == 0:
        return None
    trans = np.asarray(pooled.trans_sum, np.float64) / n
    out = {k: float(v) for k, v in zip(TERMS, trans)}
    out["e1"] = 1.0
    out["Z"] = float(pooled.z_sum) / n
    count = np.asarray(pooled.kmer_count, np.float64)
    safe = np.where(count > 0, count, 1.0)
    out["kmer_means"] = np.asarray(pooled.mean_sum, np.float64) / safe
    out["kmer_stdevs"] = np.asarray(pooled.stdev_sum, np.float64) / safe
    out["kmer_seen"] = count > 0
    return out
