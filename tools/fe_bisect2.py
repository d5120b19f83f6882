"""Finer frontend bisect: conv cost, unfold-matmul correlation, approx topk, small NID."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import bench
bench._enable_compile_cache()
from dsdneo_tpu.engine.voicebatch import (BatchedP25VoicePipeline,
                                          correlate_syncs_device,
                                          _sync_kernel, _status_strip_map)
from dsdneo_tpu.engine.batched import frontend_step
from dsdneo_tpu.io import read_iq_capture
meta, samples = read_iq_capture(bench.FIXTURE)
iq1 = np.stack([samples.real, samples.imag], axis=-1).astype(np.float32)
C = 192
x = jax.device_put(np.broadcast_to(iq1[None], (C,) + iq1.shape).copy())
pipe = BatchedP25VoicePipeline(C)
B = x.shape[1]; n_sym = int(B // pipe.sps) - 2
taps = pipe.taps; names = pipe.SYNC_NAMES
defs, kern, norm, n_max = _sync_kernel(names)
k_cand = 512
nid_strip = _status_strip_map(len(defs[0].pattern), 32)
bch_pm = pipe.bch.pm.astype(np.float32)

def fe(x):
    return frontend_step(x, taps, pipe.sps, n_sym, True, use_pallas=True)

def corr_mm(soft):
    # unfold windows then ONE [.., 24]x[24, P] matmul
    T2 = soft.shape[1] - n_max + 1
    idx = jnp.arange(T2)[:, None] + jnp.arange(n_max)[None, :]
    win = soft[:, idx]                       # [C, T2, n]
    km = jnp.asarray(kern[:, 0, :].T * norm[:, None].T)   # [n, P]
    return jnp.einsum("ctn,np->cpt", win, km)

@jax.jit
def v_conv_only(x):
    d, s, p = fe(x)
    sc = correlate_syncs_device(s, names)
    return jnp.sum(sc)

@jax.jit
def v_mm_only(x):
    d, s, p = fe(x)
    sc = corr_mm(s)
    return jnp.sum(sc)

@jax.jit
def v_topk_only(x):
    d, s, p = fe(x)
    sc = correlate_syncs_device(s, names)
    bs = jnp.max(sc, axis=1)
    vals, idx = jax.lax.top_k(bs, k_cand)
    return jnp.sum(vals) + jnp.sum(idx)

@jax.jit
def v_approx_only(x):
    d, s, p = fe(x)
    sc = correlate_syncs_device(s, names)
    bs = jnp.max(sc, axis=1)
    vals, idx = jax.lax.approx_max_k(bs, k_cand, recall_target=0.99)
    return jnp.sum(vals) + jnp.sum(idx)

@jax.jit
def v_nid48(x):
    d, s, p = fe(x)
    sc = correlate_syncs_device(s, names)
    bs = jnp.max(sc, axis=1)
    vals, idx = jax.lax.top_k(bs, k_cand)
    idx_n = idx[:, :48]
    gpos = jnp.clip(idx_n[:, :, None] + jnp.asarray(nid_strip), 0, d.shape[1]-1)
    nd = d[jnp.arange(C)[:, None, None], gpos]
    b64 = jnp.stack([(nd >> 1) & 1, nd & 1], axis=-1).reshape(C, 48, 64)
    sgn = (1.0 - 2.0*b64[..., :63].astype(jnp.float32)).astype(jnp.bfloat16)
    msg = jnp.argmax(sgn.reshape(-1, 63) @ jnp.asarray(bch_pm).astype(jnp.bfloat16).T, axis=-1)
    return jnp.sum(vals) + jnp.sum(msg)

for name, fn in (("conv(sum)", v_conv_only), ("unfold-mm(sum)", v_mm_only),
                 ("conv+topk512(sum)", v_topk_only),
                 ("conv+approx512(sum)", v_approx_only),
                 ("conv+topk+nid48(sum)", v_nid48)):
    call = lambda: float(jnp.sum(jnp.asarray([jnp.sum(o) for o in jax.tree.leaves(fn(x))])))
    call()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); call(); ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.0f} ms (all {[int(t*1e3) for t in ts]})", flush=True)
