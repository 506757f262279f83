"""Probe: the second Mosaic geometry (R=8, CN=16, CK=256) vs the scan
path at the same caps, interpret mode on CPU. Run:
    JAX_PLATFORMS=cpu python scripts/probe_wide_geometry.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from dynamont_tpu.models.ntc_batch import make_ntc_batch_fn, round_up
from dynamont_tpu.models.registry import load_model_for_pore
from dynamont_tpu.utils.kmer import seq_to_kmer_ids
from dynamont_tpu.utils.synthetic import make_read

model = load_model_for_pore("rna002")
A, S = model.alphabet_size, model.kmer_size
R = 8
sigs, kids = [], []
for s in range(R):
    sig, read = make_read(model, n_bases=20 + (s % 3) * 5, seed=s)
    sigs.append(sig)
    kids.append(np.asarray(seq_to_kmer_ids(read, S, A), np.int32))
T_arr = np.array([len(s) + 1 for s in sigs], np.int32)
N_arr = np.array([len(k) + 1 for k in kids], np.int32)
T_pad = round_up(int(T_arr.max()), 64)
N2 = round_up(int(N_arr.max()), 128)
sigp = np.zeros((R, T_pad - 1), np.float32)
kidp = np.zeros((R, N2 - 1), np.int32)
for j in range(R):
    sigp[j, : T_arr[j] - 1] = sigs[j]
    kidp[j, : N_arr[j] - 1] = kids[j]

fn = make_ntc_batch_fn(model, "rna002", None, jnp.float32)
S_max = round_up(N2 + N2 // 4 + 64, 128)
kw = dict(CN=16, CK0=240, S_max=S_max)
args = (jnp.asarray(sigp), jnp.asarray(kidp), jnp.asarray(T_arr),
        jnp.asarray(N_arr))
res_p = {k: np.asarray(v) for k, v in
         fn(*args, use_pallas=True, interpret=True, **kw).items()}
res_s = {k: np.asarray(v) for k, v in
         fn(*args, use_pallas=False, **kw).items()}

bad = 0
for key in ("Zf", "Zb", "Zf_tn", "Zb_tn", "Zf_tk", "Zb_tk"):
    d = np.abs(res_p[key] - res_s[key]).max()
    print(f"{key}: max|diff| = {d:.3e}")
    bad += d > 5e-3
for key in ("seg_cnt", "seg_state", "seg_bp", "seg_start", "seg_k"):
    eq = (res_p[key] == res_s[key]).all()
    print(f"{key}: equal = {eq}")
    bad += not eq
md = np.abs(res_p["seg_med"] - res_s["seg_med"]).max()
print(f"seg_med: max|diff| = {md:.3e}")
bad += md > 5e-3
print("OVERALL:", "FAIL" if bad else "PASS")
