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
for C in [int(a) for a in sys.argv[1:]] or (192,):
    pipe = BatchedP25VoicePipeline(C)
    iq = np.broadcast_to(iq1[None], (C,) + iq1.shape).copy()
    dev = jax.device_put(iq)
    t0 = time.perf_counter(); pipe.decode_block(dev)
    print(f"C={C} warmup/compile: {time.perf_counter()-t0:.1f} s", flush=True)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); pipe.decode_block(dev)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    blk = iq1.shape[0] / 48000.0
    print(f"C={C}: {best*1000:.0f} ms -> {C*blk/best:.0f}x realtime "
          f"(all: {[int(x*1000) for x in ts]})", flush=True)
