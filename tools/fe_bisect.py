"""Bisect frontend_sync cost: pallas / +conv / +topk / +nid, C=192."""
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
defs, _, _, n_max_pat = _sync_kernel(names)
k_cand = min(512, n_sym - n_max_pat + 1)
nid_strip = _status_strip_map(len(defs[0].pattern), 32)
bch_pm = pipe.bch.pm.astype(np.float32)

def pack(dibits):
    pad = (-dibits.shape[1]) % 4
    dp = jnp.pad(dibits, ((0, 0), (0, pad)))
    return (dp[:, 0::4] << 6) | (dp[:, 1::4] << 4) | (dp[:, 2::4] << 2) | dp[:, 3::4]

@jax.jit
def v_pallas(x):
    d, s, p = frontend_step(x, taps, pipe.sps, n_sym, True, use_pallas=True)
    return pack(d)

@jax.jit
def v_conv(x):
    d, s, p = frontend_step(x, taps, pipe.sps, n_sym, True, use_pallas=True)
    sc = correlate_syncs_device(s, names)
    bd = jnp.argmax(sc, axis=1).astype(jnp.uint8)
    bs = jnp.max(sc, axis=1)
    return pack(d), bd[:, ::8], jnp.clip(bs[:, ::8]*127, 0, 255).astype(jnp.uint8)

@jax.jit
def v_topk(x):
    d, s, p = frontend_step(x, taps, pipe.sps, n_sym, True, use_pallas=True)
    sc = correlate_syncs_device(s, names)
    bd = jnp.argmax(sc, axis=1).astype(jnp.uint8)
    bs = jnp.max(sc, axis=1)
    vals, idx = jax.lax.top_k(bs, k_cand)
    vq = jnp.clip(vals*127, 0, 255).astype(jnp.uint8)
    dq = jnp.take_along_axis(bd, idx, axis=1)
    return pack(d), idx.astype(jnp.int32), vq, dq

for name, fn in (("pallas+pack", v_pallas), ("(+conv)", v_conv),
                 ("(+topk512)", v_topk), ("full(+nid)", None)):
    if fn is None:
        call = lambda: pipe.frontend_sync(x)
    else:
        call = lambda: [np.asarray(o) for o in jax.tree.leaves(fn(x))]
    call()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); call(); ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.0f} ms (all {[int(t*1e3) for t in ts]})", flush=True)
