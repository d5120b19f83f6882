"""Compile + time the fused pallas FIR/discriminator on the real TPU.

Uses the chained-scan methodology: K dependent iterations inside one
jitted lax.scan, scalar fetched at the end (axon's block_until_ready
does not synchronize, and per-call dispatch rides a slow tunnel).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dsdneo_tpu.dsp import firdes, frontend
from dsdneo_tpu.ops.pallas_frontend import fir_discriminate

print("devices:", jax.devices(), flush=True)
taps = firdes.channel_lpf(48000.0, "p25_c4fm")
C, B = 256, 24064
K = 16
rng = np.random.default_rng(0)
phase = np.cumsum(rng.normal(scale=0.3, size=(C, B)), axis=-1).astype(np.float32)
xr = np.cos(phase).astype(np.float32)
xi = np.sin(phase).astype(np.float32)

tj = jnp.asarray(taps)

def xla_chain(xr, xi):
    x = jax.lax.complex(xr, xi)
    y = frontend.fir_complex(x, tj)
    return frontend.fm_discriminate(y)

def pallas_chain(xr, xi):
    return fir_discriminate(xr, xi, taps)

def bench(f, name):
    @jax.jit
    def many(xr, xi):
        def body(carry, _):
            out = f(xr + carry, xi)
            return carry + jnp.sum(out) * 1e-24, None
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    t0 = time.time(); s = float(many(xr, xi))
    print(f"{name}: compile+1st {time.time()-t0:.1f}s val={s:.6g}", flush=True)
    t0 = time.time(); s = float(many(xr, xi))
    dt = (time.time() - t0) / K
    print(f"{name}: {dt*1e3:.2f} ms/iter (chained x{K})", flush=True)

bench(xla_chain, "xla   ")
bench(pallas_chain, "pallas")
a = xla_chain(jnp.asarray(xr), jnp.asarray(xi))
b = pallas_chain(jnp.asarray(xr), jnp.asarray(xi))
print("max abs diff (cols 1:):",
      float(jnp.max(jnp.abs(a[:, 1:] - b[:, 1:]))), flush=True)
