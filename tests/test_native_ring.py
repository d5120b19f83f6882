"""Native ingest ring tests: threading, framing, purge, drop accounting."""

import threading
import time

import numpy as np
import pytest

pytest.importorskip("ctypes")


def _ring():
    from dsdneo_tpu.runtime.native import IngestRing
    return IngestRing(1 << 16)


def test_ring_roundtrip_widen():
    r = _ring()
    raw = np.arange(512, dtype=np.uint8)
    r.write(raw.tobytes())
    blk = r.read_block_cu8(256, timeout_ms=200)
    assert blk is not None and blk.shape == (256, 2)
    expect_i = (raw[0::2].astype(np.float32) / 127.5) - 1.0
    np.testing.assert_allclose(blk[:, 0], expect_i, atol=1e-6)
    r.close()


def test_ring_producer_consumer_threads():
    r = _ring()
    n_blocks = 8
    block = 1024

    def producer():
        rng = np.random.default_rng(0)
        for _ in range(n_blocks):
            r.write(rng.integers(0, 256, 2 * block, dtype=np.uint8).tobytes())
            time.sleep(0.001)

    t = threading.Thread(target=producer)
    t.start()
    got = 0
    for _ in range(n_blocks):
        blk = r.read_block_cu8(block, timeout_ms=1000)
        if blk is not None:
            got += 1
    t.join()
    assert got == n_blocks
    assert r.drops == 0
    r.close()


def test_ring_drop_accounting():
    from dsdneo_tpu.runtime.native import IngestRing
    r = IngestRing(1 << 10)  # 1 KiB
    r.write(bytes(2048))
    assert r.drops >= 1024
    r.close()


def test_ring_purge_generation():
    r = _ring()
    r.write(bytes(4096))
    gen0 = r.generation
    r.purge()
    assert r.generation == gen0 + 1
    assert r.fill == 0
    # read after purge times out cleanly (no stale data)
    blk = r.read_block_cu8(128, timeout_ms=50)
    assert blk is None
    r.close()


def test_ring_fs4_rotation():
    r = _ring()
    # constant I=+1, Q=0 input → rotation cycles through (1, ±j, -1, ∓j)
    raw = np.zeros(16, dtype=np.uint8)
    raw[0::2] = 255
    raw[1::2] = 128
    r.write(raw.tobytes())
    blk = r.read_block_cu8(8, rotate=1, timeout_ms=200)
    assert blk is not None
    i = blk[:, 0]
    assert i[0] > 0.9 and abs(i[1]) < 0.02 and i[2] < -0.9
    r.close()
