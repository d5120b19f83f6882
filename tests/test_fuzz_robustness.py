"""Fuzz-style robustness: random/malformed inputs must never crash the
parsers (the pytest equivalent of the reference's four libFuzzer
harnesses — CSV import, IQ metadata JSON, DMR block, M17 LSF;
tests/fuzz/fuzz_*.c)."""

import json

import numpy as np
import pytest


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_csv_import(tmp_path, seed):
    from dsdneo_tpu.core.talkgroup import TalkgroupPolicy
    from dsdneo_tpu.crypto.keyring import KeyRing
    rng = np.random.default_rng(seed)
    blob = bytes(rng.integers(0, 256, rng.integers(0, 4096),
                              dtype=np.uint8))
    p = tmp_path / f"fuzz{seed}.csv"
    p.write_bytes(blob)
    pol = TalkgroupPolicy()
    try:
        pol.import_group_csv(str(p))
    except (ValueError, UnicodeDecodeError):
        pass
    kr = KeyRing()
    for importer in (kr.import_dec_csv, kr.import_hex_csv,
                     kr.import_aes_csv):
        try:
            importer(str(p))
        except (ValueError, UnicodeDecodeError):
            pass


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_iq_metadata_json(tmp_path, seed):
    from dsdneo_tpu.io import read_iq_capture
    rng = np.random.default_rng(100 + seed)
    p = tmp_path / "fuzz.iq.json"
    if seed % 2 == 0:
        p.write_bytes(bytes(rng.integers(0, 256, 512, dtype=np.uint8)))
    else:
        # structurally-valid JSON with hostile values
        doc = {"format": "dsd-neo-iq", "sample_format": "cu8",
               "sample_rate_hz": int(rng.integers(-5, 5)) * 10 ** 9,
               "data_file": "../" * seed + "nope.iq",
               "data_bytes": -1, "junk": "x" * 1000}
        p.write_text(json.dumps(doc))
    with pytest.raises((OSError, ValueError, KeyError)):
        read_iq_capture(str(p))


@pytest.mark.parametrize("seed", range(16))
def test_fuzz_dmr_burst(seed):
    """Random dibit streams through the DMR burst decoder: no crash,
    bounded output."""
    from dsdneo_tpu.protocol.base import DecoderContext, DibitReader, registry
    import dsdneo_tpu.protocol.dmr  # noqa: F401
    from dsdneo_tpu.symbols.framesync import SYNC_DEFS

    rng = np.random.default_rng(200 + seed)
    dibits = rng.integers(0, 4, 4000).astype(np.uint8)
    soft = rng.normal(0, 3, 4000).astype(np.float32)
    ctx = DecoderContext()
    dec = registry()["dmr"]()
    dmr_defs = [d for d in SYNC_DEFS if d.protocol == "dmr"]
    for pos in (100, 700, 1500, 2500):
        hit_def = dmr_defs[int(rng.integers(0, len(dmr_defs)))]
        from dsdneo_tpu.symbols.framesync import SyncHit
        hit = SyncHit(pos=pos, score=0.9, sync=hit_def)
        reader = DibitReader(dibits, soft, pos=hit.end, frame_start=hit.pos,
                             invert=hit_def.inverted)
        dec.handle(reader, hit, ctx)
    assert len(ctx.events) < 1000


@pytest.mark.parametrize("seed", range(16))
def test_fuzz_m17_lsf(seed):
    """Random/bit-flipped M17 frames: decoder survives, CRC gates."""
    from dsdneo_tpu.protocol.base import DecoderContext, DibitReader, registry
    import dsdneo_tpu.protocol.m17  # noqa: F401
    from dsdneo_tpu.symbols.framesync import SYNC_DEFS, SyncHit

    rng = np.random.default_rng(300 + seed)
    dibits = rng.integers(0, 4, 2000).astype(np.uint8)
    soft = rng.normal(0, 3, 2000).astype(np.float32)
    ctx = DecoderContext()
    dec = registry()["m17"]()
    m17_defs = [d for d in SYNC_DEFS if d.protocol == "m17"]
    for pos in (50, 400, 900, 1400):
        hit_def = m17_defs[int(rng.integers(0, len(m17_defs)))]
        hit = SyncHit(pos=pos, score=0.9, sync=hit_def)
        reader = DibitReader(dibits, soft, pos=hit.end, frame_start=hit.pos,
                             invert=hit_def.inverted)
        dec.handle(reader, hit, ctx)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_m17_ip_frames(seed):
    from dsdneo_tpu.protocol.m17.ip import parse_ip_frame
    rng = np.random.default_rng(400 + seed)
    for n in (0, 3, 4, 35, 54, 55, 200):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        parse_ip_frame(data)                        # no crash
        parse_ip_frame(b"M17 " + data)
        parse_ip_frame(b"MPKT" + data)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_mbe_files(tmp_path, seed):
    from dsdneo_tpu.io.mbe_files import read_mbe_file
    rng = np.random.default_rng(500 + seed)
    p = tmp_path / "fuzz.imb"
    p.write_bytes(b".imb" + bytes(rng.integers(0, 256, seed * 7,
                                               dtype=np.uint8)))
    kind, frames = read_mbe_file(str(p))        # truncated tail ignored
    assert kind == "imb"
    p2 = tmp_path / "junk.bin"
    p2.write_bytes(bytes(rng.integers(0, 256, 64, dtype=np.uint8)))
    with pytest.raises(ValueError):
        read_mbe_file(str(p2))


def test_fuzz_p2_mac_walker():
    """Random MAC PDU octets never crash the native P2 catalog."""
    from types import SimpleNamespace
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.p25.p2_mac import P2MacWalker
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder
    rng = np.random.default_rng(7)
    w = P2MacWalker(P25P1Decoder)
    for _ in range(200):
        mac = rng.integers(0, 256, 24).astype(np.int64)
        w.walk(mac, int(rng.integers(2, 23)), int(rng.integers(0, 2)),
               DecoderContext(), SimpleNamespace(pos=0))


def test_fuzz_dmr_csbk():
    from types import SimpleNamespace
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.dmr.csbk import decode_csbk
    rng = np.random.default_rng(8)
    for _ in range(300):
        bits = rng.integers(0, 2, 96).astype(np.uint8)
        decode_csbk(bits, DecoderContext(), hit=SimpleNamespace(pos=0),
                    ms_sync=bool(rng.integers(0, 2)))


def test_fuzz_p25_lcw():
    from types import SimpleNamespace
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.p25.lcw import decode_lcw
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder
    rng = np.random.default_rng(9)
    dec = P25P1Decoder()
    for _ in range(300):
        bits = rng.integers(0, 2, 72).astype(np.uint8)
        decode_lcw(bits, SimpleNamespace(pos=0), DecoderContext(), dec)


def test_fuzz_p25_mbt():
    from types import SimpleNamespace
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.p25.mbt import decode_mbt
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder
    rng = np.random.default_rng(10)
    dec = P25P1Decoder()
    for _ in range(200):
        n_blocks = int(rng.integers(1, 4))
        mpdu = rng.integers(0, 256, 12 * (1 + n_blocks)).astype(np.int64)
        decode_mbt(mpdu, DecoderContext(), SimpleNamespace(pos=0), dec)


def test_fuzz_edacs_ea():
    from types import SimpleNamespace
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.edacs.decoder import EdacsDecoder
    rng = np.random.default_rng(11)
    d = EdacsDecoder()
    for _ in range(300):
        ctx = DecoderContext()
        ctx.state.edacs_ea = True
        d._extended(int(rng.integers(0, 1 << 28)),
                    int(rng.integers(0, 1 << 28)), ctx,
                    SimpleNamespace(pos=0))


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_data_payload_decoders(seed):
    """Random bytes through the short-data/IP/GPS decoders must never
    raise — they gate on CRCs and length checks, not trust."""
    from dsdneo_tpu.protocol.dmr.gps import (decode_lip, decode_locn,
                                             decode_nmea_iec)
    from dsdneo_tpu.protocol.dmr.ip_pdu import (decode_ip_pdu,
                                                decode_udp_comp_pdu)
    from dsdneo_tpu.protocol.dmr.udt import decode_udt
    from dsdneo_tpu.protocol.nmea import nmea_sentence_check
    from dsdneo_tpu.protocol.p25.harris import decode_harris_gps
    rng = np.random.default_rng(900 + seed)
    for _ in range(40):
        n = int(rng.integers(0, 80))
        data = rng.integers(0, 256, n).astype(np.uint8)
        bits = rng.integers(0, 2, max(8 * n, 200)).astype(np.uint8)
        decode_ip_pdu(data)
        decode_udp_comp_pdu(data)
        decode_locn(data)
        nmea_sentence_check(data) if n else None
        decode_lip(bits)
        decode_nmea_iec(bits, 1 + int(rng.integers(0, 2)))
        decode_harris_gps(bits)
        decode_udt(bits[:96 * 5], app_blocks=int(rng.integers(0, 6)))


@pytest.mark.parametrize("seed", range(2))
def test_fuzz_nxdn_dcall_and_assembler(seed):
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.nxdn.decoder import NxdnDecoder
    rng = np.random.default_rng(950 + seed)
    dec = NxdnDecoder()
    ctx = DecoderContext()
    for _ in range(60):
        n = int(rng.integers(8, 200))
        msg = rng.integers(0, 2, n).astype(np.uint8)
        try:
            dec._message(msg, ctx)
        except IndexError:
            pass     # short messages may underrun fixed-layout fields


def test_fuzz_ccbatch_pickers_random_blobs():
    """The round-3 host pickers must survive arbitrary candidate blobs
    (random positions/scores/fields) without crashing or accepting
    out-of-range frames."""
    import numpy as np
    from dsdneo_tpu.engine.ccbatch import (BatchedDmrControlPipeline,
                                           BatchedEdacsControlPipeline,
                                           BatchedP25ControlPipeline)
    from dsdneo_tpu.engine.p2batch import BatchedP2VoicePipeline
    from dsdneo_tpu.engine.ysfbatch import BatchedYsfVoicePipeline
    rng = np.random.default_rng(0)
    n_sym = 9000
    K = 64
    idx = rng.integers(0, n_sym, (2, K)).astype(np.int64)
    vq = rng.integers(0, 256, (2, K)).astype(np.uint8)
    dq = rng.integers(0, 2, (2, K)).astype(np.uint8)
    msg = rng.integers(0, 1 << 16, (2, K)).astype(np.uint16)

    p1 = BatchedP25ControlPipeline(2)
    ac, at, am = p1.pick_tsdus(idx, vq, dq, msg, n_sym)
    assert ((at + 24 < n_sym) | (ac < 0)).all()

    dmr = BatchedDmrControlPipeline(2)
    st = rng.integers(0, 256, (2, K)).astype(np.uint8)
    se = rng.integers(0, 8, (2, K)).astype(np.uint8)
    dmr.pick_csbks(idx, vq, dq, st, se, n_sym)

    ed = BatchedEdacsControlPipeline(2)
    ed.pick_frames(idx, vq, n_sym)

    ysf = BatchedYsfVoicePipeline(2)
    ysf.pick_frames(idx, vq, n_sym)

    p2 = BatchedP2VoicePipeline(2)
    duid = rng.integers(0, 256, (2, K, 4)).astype(np.uint8)
    isch = rng.integers(0, 256, (2, K, 4, 5)).astype(np.uint8)
    arrs, jobs = p2.walk_frames(idx, vq, duid, isch, n_sym)
    if arrs[0].size:
        assert (arrs[1] + 180 < n_sym + 800).all()


def test_fuzz_nxdn_cac_parse_random_payloads():
    """Random 'CRC-valid-shaped' CAC payloads through the NXDN message
    catalog must not crash the batched parse loop."""
    import numpy as np
    from dsdneo_tpu.engine.ccbatch import BatchedNxdnControlPipeline
    rng = np.random.default_rng(1)
    pipe = BatchedNxdnControlPipeline(1)
    ctx = pipe.ctxs[0]
    for _ in range(64):
        dec = rng.integers(0, 2, 171).astype(np.uint8)
        pipe.decs[0]._message(dec[8:155], ctx)
    assert True
