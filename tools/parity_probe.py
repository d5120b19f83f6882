"""One-off probe: time the Pallas vs XLA front-end compiles on the TPU
and report their max soft-symbol divergence (feeds bench parity)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from dsdneo_tpu.dsp import firdes
from dsdneo_tpu.engine.batched import frontend_step
from dsdneo_tpu.engine.modes import MODES
FS, B, C = 48000, 48000, 8
mode = MODES["p25p1"]
sps = FS / mode.symbol_rate
n_sym = int(B // sps) - 2
taps = firdes.channel_lpf(float(FS), mode.lpf_profile)
rng = np.random.default_rng(1)
x = jax.device_put(rng.normal(size=(C, B, 2)).astype(np.float32))
t0 = time.time()
sp = np.asarray(jax.jit(lambda q: frontend_step(q, taps, sps, n_sym, True, use_pallas=True)[1])(x))
print(f"pallas {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
sx = np.asarray(jax.jit(lambda q: frontend_step(q, taps, sps, n_sym, True, use_pallas=False)[1])(x))
print(f"xla {time.time()-t0:.0f}s maxerr {np.max(np.abs(sp-sx)):.2e}", flush=True)
