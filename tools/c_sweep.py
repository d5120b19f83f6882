"""Sweep channel count C for the full-chain decode_block on the TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from bench import _enable_compile_cache
_enable_compile_cache()
import jax
from dsdneo_tpu.engine.voicebatch import BatchedP25VoicePipeline
from dsdneo_tpu.io import read_iq_capture

meta, samples = read_iq_capture(
    "/root/reference/tests/fixtures/iq/p25p1_c4fm_vc.iq.json")
iq1 = np.stack([samples.real, samples.imag], axis=-1).astype(np.float32)
nblk = int(3.0 * 48000)
reps = int(np.ceil(nblk / iq1.shape[0]))
iq1 = np.tile(iq1, (reps, 1))[:nblk]

for C in (128, 192, 256):
    pipe = BatchedP25VoicePipeline(C)
    iq = np.broadcast_to(iq1[None], (C,) + iq1.shape).copy()
    dev = jax.device_put(iq)
    pipe.decode_block(dev)  # warm/compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        pipe.decode_block(dev)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"C={C}: {best*1000:.0f} ms -> {C*3.0/best:.0f}x realtime", flush=True)
