"""TPU spot check: fused banded entry (bwd -> fused fwd+post+viterbi ->
walk) vs the XLA scan pipeline on REAL Mosaic lowering (interpret-mode CI
covers the kernel bodies; this covers the compiled path).

    python scripts/probe_fused_parity_tpu.py
"""
import math
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dynamont_tpu.constants import NT_TRANSITIONS
from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.ops import nt_banded_batch as bb
from dynamont_tpu.ops import nt_banded_device as dv
from dynamont_tpu.ops import nt_banded_pallas as pk
from dynamont_tpu.utils.kmer import seq_to_kmer_ids
from dynamont_tpu.utils.synthetic import make_read


def build_batch(model, n_reads=8, n_bases=420, t_trim=4096):
    sigs, kids = [], []
    for s in range(n_reads):
        sig, read = make_read(model, n_bases=n_bases, seed=s)
        sigs.append(sig[: t_trim - 1])
        kids.append(np.asarray(
            seq_to_kmer_ids(read, model.kmer_size, model.alphabet_size),
            np.int32))
    return bb.prepare_batch(sigs, kids, model.means, model.stdevs,
                            dtype=jnp.float32, t_pad_to=256)


model = load_model_for_pore("rna002")
nt = NT_TRANSITIONS["rna002"]
lm, le = math.log(nt["m1"]), math.log(nt["e2"])
batch = build_batch(model)
N_max = int(np.asarray(batch.N).max())

Zf_p, Zb_p, starts_p, med_p = jax.block_until_ready(
    pk.banded_segment_pallas(batch, N_max, lm, le))
res = bb.banded_batch_run(batch, lm, le)
walk = jax.vmap(dv._walk_single(batch.B, N_max))
starts_s, med_s = jax.block_until_ready(
    walk(res.PM, res.PE, res.choices, batch.bstart, batch.T, batch.N,
         batch.bw))

bad = 0
for name, a, b, tol in (
    ("Zf", Zf_p, res.Zf, 5e-4), ("Zb", Zb_p, res.Zb, 5e-4),
):
    d = np.abs(np.asarray(a) - np.asarray(b)).max()
    print(f"{name}: max|diff| = {d:.3e}")
    bad += d > tol
eq = (np.asarray(starts_p) == np.asarray(starts_s)).all()
print(f"starts equal: {eq}")
bad += not eq
md = np.abs(np.asarray(med_p) - np.asarray(med_s)).max()
print(f"medians: max|diff| = {md:.3e}")
bad += md > 1e-4
print("OVERALL:", "FAIL" if bad else "PASS")
sys.exit(1 if bad else 0)
