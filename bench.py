#!/usr/bin/env python3
"""Headline benchmark: aggregate many-channel I/Q→symbols decode
throughput per chip, as a multiple of realtime.

Runs the batched device front-end (channel LPF → FM discriminator →
feed-forward timing recovery → 4-level slicing — the per-channel chain
of the reference's demod thread, src/dsp/demod_pipeline.cpp) on
``[C, B]`` blocks of C channels × 1 s of 48 kHz I/Q on the default JAX
device (the TPU when present).

Methodology: K steps are chained inside one jitted lax.scan and the
result is fetched to host, so the measurement reflects real device
execution (the tunneled TPU runtime's block_until_ready does not
actually synchronize, and per-call timing would instead measure the
host↔device round trip).

The reference's contract is 1× realtime for ONE channel on a desktop
CPU (BASELINE.md), so `vs_baseline` is the realtime multiple itself.
Prints exactly one JSON line.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    FS = 48000
    B = FS  # one second per channel per step

    from dsdneo_tpu.dsp import firdes
    from dsdneo_tpu.engine.batched import frontend_step
    from dsdneo_tpu.engine.modes import MODES

    mode = MODES["p25p1"]
    sps = FS / mode.symbol_rate
    n_sym = int(B // sps) - 2
    taps = firdes.channel_lpf(float(FS), mode.lpf_profile)

    use_pallas = jax.default_backend() not in ("cpu",)

    @jax.jit
    def chained(iq):
        def body(carry, _):
            d, s, p = frontend_step(iq + carry * 1e-9, taps, sps, n_sym, True,
                                    use_pallas=use_pallas)
            return jnp.sum(s) + jnp.sum(p), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return acc

    rng = np.random.default_rng(0)
    # float32 I/Q planes: the axon TPU runtime cannot transfer complex64
    iq = rng.normal(size=(C, B, 2)).astype(np.float32)
    x = jax.device_put(iq)

    float(chained(x))          # compile + warmup (forces a real fetch)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(x))      # scalar fetch = true synchronization
        times.append(time.perf_counter() - t0)
    step_s = float(np.median(times)) / K
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
            "chained_steps": K,
            "device": str(jax.devices()[0]),
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
