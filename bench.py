#!/usr/bin/env python3
"""Headline benchmark: aggregate many-channel I/Q→symbols decode
throughput per chip, as a multiple of realtime.

Runs the batched device front-end (channel LPF → FM discriminator →
feed-forward timing recovery → 4-level slicing — the per-channel chain
of the reference's demod thread, src/dsp/demod_pipeline.cpp) on a
``[C, B]`` block of C channels × 1 s of 48 kHz I/Q, on the default JAX
device (the TPU when present).

The reference's contract is 1× realtime for ONE channel on a desktop
CPU (BASELINE.md); `vs_baseline` is therefore the realtime multiple
itself.  Prints exactly one JSON line.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    FS = 48000
    B = FS  # one second per channel per step

    from dsdneo_tpu.engine.batched import make_frontend_step

    step = make_frontend_step("p25p1", B, float(FS))

    rng = np.random.default_rng(0)
    # float32 I/Q planes: the axon TPU runtime cannot transfer complex64
    iq = rng.normal(size=(C, B, 2)).astype(np.float32)
    x = jax.device_put(iq)

    # compile + warmup
    out = step(x)
    jax.block_until_ready(out)

    # per-step blocking: async dispatch through the tunneled runtime makes
    # batched timing unreliable, so take the median of synchronized steps
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        out = step(x)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    step_s = float(np.median(times))
    x_realtime = C * (B / FS) / step_s

    print(json.dumps({
        "metric": "aggregate_iq_to_symbols_x_realtime_per_chip",
        "value": round(x_realtime, 1),
        "unit": "x_realtime",
        "vs_baseline": round(x_realtime, 1),
        "detail": {
            "channels": C,
            "block_s": B / FS,
            "step_ms": round(step_s * 1e3, 3),
            "device": str(jax.devices()[0]),
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
