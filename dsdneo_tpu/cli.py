"""Command-line interface, flag-compatible with the reference decoder's
test harness usage: ``dsd-neo-tpu --frontend none -f1 --iq-replay f.iq.json
-o null`` (reference contract: tests/iq_decode_check.cmake:17-22; flag
names from src/runtime/cli/args.c).

Decoded payload lines go to stderr, as the reference does, so the e2e
harness can regex the combined output.
"""

from __future__ import annotations

import argparse
import sys

from dsdneo_tpu.engine.modes import FLAG_TO_MODE


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dsd-neo-tpu", add_help=True,
                                description="TPU-native digital speech decoder")
    p.add_argument("--iq-replay", metavar="FILE",
                   help="replay an I/Q capture (.iq or .iq.json sidecar)")
    p.add_argument("--frontend", default="none", choices=["none", "terminal"],
                   help="UI frontend")
    p.add_argument("-o", dest="audio_out", default="null",
                   help="audio output (null | wav:PATH | pcm:PATH)")
    p.add_argument("-v", dest="verbose", action="count", default=0)
    p.add_argument("--sync-threshold", type=float, default=0.62)
    p.add_argument("--cqpsk", action="store_true",
                   help="use the CQPSK/LSM carrier+timing chain instead of "
                        "the FM discriminator path")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "default"],
                   help="JAX platform for the DSP pipeline (single-channel "
                        "offline decode defaults to host CPU; the batched "
                        "many-channel serving path targets TPU)")
    # decode mode flags (reference-compatible: -f1 -fs -fi ...)
    for flag, mode in FLAG_TO_MODE.items():
        p.add_argument(flag, dest="mode", action="store_const", const=mode,
                       help=f"decode mode: {mode}")
    p.set_defaults(mode="auto")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.iq_replay:
        print("dsd-neo-tpu: no input source (use --iq-replay)", file=sys.stderr)
        return 2

    if args.platform != "default":
        import jax
        jax.config.update("jax_platforms", args.platform)

    from dsdneo_tpu.engine import decode_capture
    try:
        ctx = decode_capture(args.iq_replay, args.mode,
                             sync_threshold=args.sync_threshold,
                             verbose=args.verbose, cqpsk=args.cqpsk)
    except (OSError, ValueError) as e:
        print(f"dsd-neo-tpu: cannot replay {args.iq_replay}: {e}", file=sys.stderr)
        return 1
    if args.frontend == "terminal":
        import numpy as np
        from dsdneo_tpu.ui.terminal import UiModel, run
        audio_s = sum(len(c) for chunks in ctx.audio.values()
                      for c in chunks) / 8000.0
        run(UiModel(mode=args.mode, source=args.iq_replay,
                    n_events=len(ctx.events),
                    n_syncs=getattr(ctx, "n_syncs", 0),
                    audio_s=audio_s,
                    lines=[e.line for e in ctx.events],
                    soft=getattr(ctx, "debug_soft", None)))
    for ev in ctx.events:
        print(ev.line, file=sys.stderr)

    if args.audio_out.startswith("wav:"):
        from dsdneo_tpu.io.audio_files import write_wav
        import numpy as np
        for slot, chunks in ctx.audio.items():
            if chunks:
                path = args.audio_out[4:]
                if len(ctx.audio) > 1:
                    path = path.replace(".wav", f".s{slot}.wav")
                write_wav(path, np.concatenate(chunks), 8000)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
