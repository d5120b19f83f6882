"""X2-TDMA voice superframe: embedded LC / encryption-sync collection
across bursts 1-4 (reference x2tdma_voice.c signal maps) and AMBE voice
through the 6-burst walk.  No reference fixture exists (docs/testing.md
lists X2-TDMA among the fixture gaps), so the stream is synthesized
with the same burst geometry the reference consumes."""

import numpy as np

from dsdneo_tpu.protocol.base import DecoderContext, DibitReader
from dsdneo_tpu.protocol.x2tdma.decoder import (SLOT_PERIOD, X2TdmaDecoder,
                                                _emb_bits, _emb_signal_map)
from dsdneo_tpu.symbols import framesync


def _bits_of(v, n):
    return np.array([(v >> (n - 1 - i)) & 1 for i in range(n)],
                    dtype=np.uint8)


def _encode_ambe72(rng):
    from dsdneo_tpu.protocol.dmr.ambe_frame import AMBE_MAP
    from dsdneo_tpu.protocol.p25.imbe_frame import _pn_bits, golay_23_12
    g23 = golay_23_12()
    c0 = int(rng.integers(0, 4096))
    fr = np.zeros((4, 24), dtype=np.uint8)
    cw0 = g23.codebook[c0]
    fr[0][0:23] = cw0
    fr[0][23] = int(cw0.sum()) & 1
    pn = _pn_bits(c0, 23)[::-1]
    fr[1][0:23] = g23.codebook[int(rng.integers(0, 4096))] ^ pn
    fr[2][:11] = _bits_of(int(rng.integers(0, 2048)), 11)
    fr[3][:14] = _bits_of(int(rng.integers(0, 16384)), 14)
    bits = np.zeros(72, dtype=np.uint8)
    for j, (hr, hc, lr, lc) in enumerate(AMBE_MAP):
        bits[2 * j] = fr[hr][hc]
        bits[2 * j + 1] = fr[lr][lc]
    return bits


def _bits_to_dibits(bits):
    return ((bits[0::2] << 1) | bits[1::2]).astype(np.uint8)


def _fill_emb(emb, targets, fields):
    """Inverse of the decoder's _emb_bits/_emb_signal_map extraction."""
    n = len(targets)
    bits = []
    for t in targets:
        bits.append(0 if t is None else int(fields[t[0]][t[1]]))
    g = 0
    i = 0
    while i < n:
        chunk = bits[i:i + 7] + [0] * (7 - len(bits[i:i + 7]))
        base = 4 + 4 * g
        emb[base] = (chunk[0] << 1) | chunk[1]
        emb[base + 1] = (chunk[2] << 1) | chunk[3]
        emb[base + 2] = (chunk[4] << 1) | chunk[5]
        emb[base + 3] = chunk[6] << 1
        g += 1
        i += 7


def _build_superframe(es: bool):
    rng = np.random.default_rng(11)
    sync_def = next(d for d in framesync.SYNC_DEFS
                    if d.kind == "bs_voice" and d.protocol == "x2tdma")
    sync_d = np.array([int(c) for c in sync_def.pattern], dtype=np.uint8)
    voice_def = sync_d.copy()

    lcf, mfid = 0x00, 0x90
    tg, src = 1234, 567890
    lci = np.zeros(56, np.uint8)
    lci[16:32] = _bits_of(tg, 16)
    lci[32:56] = _bits_of(src, 24)
    fields = {"lcf": _bits_of(lcf, 8), "mfid": _bits_of(mfid, 8),
              "lci": lci, "mi": _bits_of(0xABCDEF0123456789 << 8, 72)}
    alg, kid = 0xAA, 0x1234

    n = 90 + SLOT_PERIOD * 6 + 120
    dib = rng.integers(0, 4, n).astype(np.uint8)
    s0 = 90
    for j in range(6):
        s = s0 + SLOT_PERIOD * j
        v = np.concatenate([_encode_ambe72(rng) for _ in range(3)])
        dib[s - 54:s - 18] = _bits_to_dibits(v[:72])
        dib[s - 18:s] = _bits_to_dibits(v[72:108])
        dib[s + 24:s + 42] = _bits_to_dibits(v[108:144])
        dib[s + 42:s + 78] = _bits_to_dibits(v[144:216])
        if j == 0:
            dib[s:s + 24] = sync_d
        elif j == 5:
            dib[s:s + 24] = voice_def
        else:
            emb = np.zeros(24, np.uint8)
            if j == 1:
                emb[1] = 1 if es else 0          # eeei at bit 0
            if j == 3:
                emb[1] = 0                        # burstd
                bits11 = np.zeros(11, np.uint8)
                bits11[0:4] = _bits_of(alg, 8)[0:4]
                bits11[7:11] = _bits_of(alg, 8)[4:8]
                chunk = list(bits11) + [0] * 3
                emb[4] = (chunk[0] << 1) | chunk[1]
                emb[5] = (chunk[2] << 1) | chunk[3]
                emb[6] = (chunk[4] << 1) | chunk[5]
                emb[7] = chunk[6] << 1
                emb[8] = (chunk[7] << 1) | chunk[8]
                emb[9] = (chunk[9] << 1) | chunk[10]
                kb = _bits_of(kid, 16)
                for i in range(16):
                    if i % 2 == 0:
                        emb[10 + i // 2] |= kb[i] << 1
                    else:
                        emb[10 + i // 2] |= kb[i]
            else:
                _fill_emb(emb, _emb_signal_map(j, es), fields)
            dib[s:s + 24] = emb
    return dib, s0, sync_def


def _run(dib, s0, sync_def):
    lv = np.array([1.0, 3.0, -1.0, -3.0], dtype=np.float32)
    soft = lv[dib]
    hits = framesync.find_syncs(soft, [sync_def], threshold=0.95)
    hits = [h for h in hits if h.pos == s0]
    assert hits, "voice sync not found at expected position"
    ctx = DecoderContext()
    dec = X2TdmaDecoder()
    r = DibitReader(dib, soft, pos=hits[0].end, frame_start=hits[0].pos,
                    invert=False)
    consumed = dec.handle(r, hits[0], ctx)
    assert consumed >= s0 + SLOT_PERIOD * 5 + 78
    return ctx


def test_x2tdma_voice_superframe_lc():
    dib, s0, sd = _build_superframe(es=False)
    ctx = _run(dib, s0, sd)
    text = "\n".join(e.line for e in ctx.events)
    assert "LC - LCF: 00 MFID: 90" in text
    assert "Group 1234 Source 567890" in text
    assert 0 in ctx.audio
    total = sum(len(c) for c in ctx.audio[0])
    assert total == 6 * 3 * 160      # 18 AMBE frames of 160 samples


def test_x2tdma_voice_superframe_encryption_sync():
    dib, s0, sd = _build_superframe(es=True)
    ctx = _run(dib, s0, sd)
    text = "\n".join(e.line for e in ctx.events)
    assert "ES - MI:" in text
    assert "ALGID: AA KID: 1234" in text


def test_x2tdma_emb_map_roundtrip():
    """_fill_emb and _emb_bits are inverses for every mapped burst."""
    rng = np.random.default_rng(3)
    for j in (1, 2, 4):
        for es in (False, True):
            fields = {"lcf": rng.integers(0, 2, 8).astype(np.uint8),
                      "mfid": rng.integers(0, 2, 8).astype(np.uint8),
                      "lci": rng.integers(0, 2, 56).astype(np.uint8),
                      "mi": rng.integers(0, 2, 72).astype(np.uint8)}
            targets = _emb_signal_map(j, es)
            emb = np.zeros(24, np.uint8)
            _fill_emb(emb, targets, fields)
            got = _emb_bits(emb, len(targets))
            want = [int(fields[t[0]][t[1]]) for t in targets]
            assert got == want, (j, es)
