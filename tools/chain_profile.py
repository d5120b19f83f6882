"""Warm per-stage profile of the batched voice chain (C from argv, default 192)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import bench
bench._enable_compile_cache()
from dsdneo_tpu.engine.voicebatch import BatchedP25VoicePipeline, _synth_multichannel, MAX_L
from dsdneo_tpu.fec import device as fdev
from dsdneo_tpu.io import read_iq_capture
meta, samples = read_iq_capture(bench.FIXTURE)
iq1 = np.stack([samples.real, samples.imag], axis=-1).astype(np.float32)
C = int(sys.argv[1]) if len(sys.argv) > 1 else 192
x = jax.device_put(np.broadcast_to(iq1[None], (C,) + iq1.shape).copy())
pipe = BatchedP25VoicePipeline(C, fs=float(meta.sample_rate_hz))
pipe.decode_block(x)
t = {}
def mark(k):
    global _t0
    now = time.perf_counter()
    if k: t[k] = t.get(k, 0) + now - _t0
    _t0 = now

_t0 = time.perf_counter()
# frontend_sync split: device dispatch+fetch vs host unpack
mark(None)
B = x.shape[1]
n_sym = int(B // pipe.sps) - 2
fn = pipe._frontend_jits[("fs", B, n_sym, True)]
dp_d, bd_d, bs_d = fn(x)
dp = np.asarray(dp_d); bd = np.asarray(bd_d); bs_q = np.asarray(bs_d)
mark("frontend: device+fetch")
dib = np.zeros((dp.shape[0], dp.shape[1] * 4), dtype=np.uint8)
dib[:, 0::4] = (dp >> 6) & 3; dib[:, 1::4] = (dp >> 4) & 3
dib[:, 2::4] = (dp >> 2) & 3; dib[:, 3::4] = dp & 3
dibits = dib[:, :n_sym]; bs = bs_q.astype(np.float32) / 127.0
mark("frontend: host unpack")
frames144, fch, forder = pipe.find_voice_frames_best(dibits, bd, bs, n_sym)
mark("hunt")
bits88 = np.asarray(fdev.imbe_ecc_batch(frames144)[0])
mark("ecc")
from dsdneo_tpu.vocoder.batch import decode_transforms, run_prediction
T_all, w0_all, L_all, K_all = decode_transforms(bits88)
mark("dequant: transforms")
n_steps = int(forder.max()) + 1
w0s = np.zeros((C, n_steps), np.float32)
amps = np.zeros((C, n_steps, MAX_L), np.float32)
voiced = np.zeros((C, n_steps, MAX_L), np.float32)
for tt in range(n_steps):
    sel = forder == tt; ch = fch[sel]
    T = np.zeros((C, MAX_L)); w0c = np.zeros(C)
    Lc = np.ones(C, np.int64); Kc = np.ones(C, np.int64) * 3
    S = np.zeros((C, 88), np.uint8); act = np.zeros(C, bool)
    T[ch] = T_all[sel]; w0c[ch] = w0_all[sel]; Lc[ch] = L_all[sel]
    Kc[ch] = K_all[sel]; S[ch] = bits88[sel]; act[ch] = True
    w0_t, L_t, v_t, a_t = run_prediction(pipe.imbe_dec, T, w0c, Lc, Kc, S, act)
    w0s[:, tt] = w0_t; voiced[:, tt] = v_t; amps[:, tt] = a_t
mark("dequant: prediction")
pcm_d = _synth_multichannel(jnp.asarray(w0s), jnp.asarray(amps.astype(np.float16)),
                            jnp.asarray(voiced.astype(np.float16)))
pcm = np.asarray(pcm_d)
mark("synth: device+fetch")
pcm = pcm.astype(np.float32).reshape(C, -1)
mark("synth: host cast")
for k, v in t.items(): print(f"{k}: {v*1e3:.0f} ms", flush=True)
for _ in range(2):
    t0 = time.perf_counter(); pipe.decode_block(x)
    print(f"decode_block: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
