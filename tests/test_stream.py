"""Streaming decode: chunked push must reproduce the one-shot decode."""

import os

import numpy as np
import pytest

FIXDIR = "/root/reference/tests/fixtures/iq"


@pytest.mark.parametrize("fixture,mode,chunk_s", [
    ("p25p1_c4fm_cc", "p25p1", 0.25),
    ("dmr_voice", "dmr", 0.2),
    ("m17", "m17", 0.33),
])
def test_stream_matches_oneshot(fixture, mode, chunk_s):
    path = os.path.join(FIXDIR, f"{fixture}.iq.json")
    if not os.path.exists(path):
        pytest.skip("reference fixtures unavailable")
    from dsdneo_tpu.engine import decode_capture
    from dsdneo_tpu.engine.stream import StreamDecoder
    from dsdneo_tpu.io import read_iq_capture

    meta, samples = read_iq_capture(path)
    ref = decode_capture(path, mode)
    ref_lines = [e.line for e in ref.events]

    sd = StreamDecoder(mode, fs=float(meta.sample_rate_hz))
    chunk = int(meta.sample_rate_hz * chunk_s)
    for i in range(0, len(samples), chunk):
        sd.push(samples[i:i + chunk])
    sd.flush()
    got_lines = [e.line for e in sd.ctx.events]

    # the streamed decode must recover at least 90% of the one-shot
    # event lines (block-boundary timing estimates may differ slightly)
    ref_set = {}
    for ln in ref_lines:
        ref_set[ln] = ref_set.get(ln, 0) + 1
    matched = 0
    for ln in got_lines:
        if ref_set.get(ln, 0) > 0:
            ref_set[ln] -= 1
            matched += 1
    assert len(ref_lines) > 0
    assert matched >= 0.9 * len(ref_lines), (
        f"streamed {len(got_lines)} lines matched {matched} of "
        f"{len(ref_lines)} one-shot lines")
