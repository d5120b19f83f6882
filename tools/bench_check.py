import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from dsdneo_tpu.dsp import firdes
from dsdneo_tpu.engine.batched import frontend_step
from dsdneo_tpu.engine.modes import MODES

C, B = 256, 48000
mode = MODES["p25p1"]
sps = 48000.0 / mode.symbol_rate
n_sym = int(B // sps) - 2
taps = firdes.channel_lpf(48000.0, mode.lpf_profile)

K = 20

@jax.jit
def chained(iq):
    def body(carry, _):
        d, s, p = frontend_step(iq + carry * 1e-9, taps, sps, n_sym, True)
        acc = jnp.sum(s) + jnp.sum(p)
        return acc, None
    acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
    return acc

rng = np.random.default_rng(0)
x = jax.device_put(rng.normal(size=(C, B, 2)).astype(np.float32))
v = float(chained(x))
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    v = float(chained(x))
    ts.append(time.perf_counter() - t0)
med = np.median(ts)
print("chained %d steps: %.1f ms total, %.3f ms/step -> %.0fx realtime (C=%d)"
      % (K, med * 1e3, med * 1e3 / K, C * 1.0 / (med / K), C))
