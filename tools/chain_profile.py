"""Warm per-stage profile of the batched voice chain (C=128)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import bench
bench._enable_compile_cache()
from dsdneo_tpu.engine.voicebatch import BatchedP25VoicePipeline
from dsdneo_tpu.io import read_iq_capture
meta, samples = read_iq_capture(bench.FIXTURE)
iq1 = np.stack([samples.real, samples.imag], axis=-1).astype(np.float32)
C = 128
x = jax.device_put(np.broadcast_to(iq1[None], (C,) + iq1.shape).copy())
pipe = BatchedP25VoicePipeline(C, fs=float(meta.sample_rate_hz))
pipe.decode_block(x)
t = {}
t0=time.perf_counter(); d, bd, bs = pipe.frontend_sync(x); t['frontend_sync+fetch']=time.perf_counter()-t0
t0=time.perf_counter(); f144, fch, forder = pipe.find_voice_frames_best(d, bd, bs, d.shape[1]); t['hunt']=time.perf_counter()-t0
from dsdneo_tpu.fec import device as fdev
t0=time.perf_counter(); b88 = np.asarray(fdev.imbe_ecc_batch(f144)[0]); t['ecc']=time.perf_counter()-t0
from dsdneo_tpu.vocoder.batch import MAX_L
import dsdneo_tpu.engine.voicebatch as vb
n_steps = int(forder.max()) + 1
w0s = np.zeros((C, n_steps), np.float32); amps = np.zeros((C, n_steps, MAX_L), np.float32); voiced = np.zeros((C, n_steps, MAX_L), np.float32)
t0=time.perf_counter()
for tt in range(n_steps):
    sel = forder == tt
    S = np.zeros((C, 88), np.uint8); act = np.zeros(C, bool)
    S[fch[sel]] = b88[sel]; act[fch[sel]] = True
    w0_t, L_t, v_t, a_t = pipe.imbe_dec.step(S, act)
    w0s[:, tt] = w0_t; voiced[:, tt] = v_t; amps[:, tt] = a_t
t['dequant']=time.perf_counter()-t0
t0=time.perf_counter(); pcm = np.asarray(vb._synth_multichannel(jnp.asarray(w0s), jnp.asarray(amps), jnp.asarray(voiced))); t['synth']=time.perf_counter()-t0
for k, v in t.items(): print(f"{k}: {v*1e3:.0f} ms", flush=True)
t0=time.perf_counter(); pipe.decode_block(x); print(f"decode_block: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
