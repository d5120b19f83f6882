"""DMR data path: rate-3/4 trellis, data header, PDU assembly — driven
through the real burst decoder on synthesized bursts."""

import numpy as np
import pytest


def test_trellis34_roundtrip():
    from dsdneo_tpu.fec.trellis34 import decode_r34, encode_r34
    rng = np.random.default_rng(0)
    for data in (np.zeros(18, np.uint8), np.full(18, 0xFF, np.uint8),
                 rng.integers(0, 256, 18).astype(np.uint8)):
        out, metric = decode_r34(encode_r34(data))
        assert metric == 0
        assert np.array_equal(out, data)


def test_data_header_parse_confirmed():
    from dsdneo_tpu.fec import crc
    from dsdneo_tpu.protocol.dmr.data import parse_data_header
    bits = np.zeros(96, dtype=np.uint8)
    bits[0] = 1                       # group
    bits[4:8] = [0, 0, 1, 1]          # DPF 3 = confirmed
    bits[8:12] = [0, 1, 0, 0]         # SAP 4 = IP based

    def put(val, lo, n):
        for i in range(n):
            bits[lo + i] = (val >> (n - 1 - i)) & 1
    put(1234, 16, 24)                 # target
    put(5678, 40, 24)                 # source
    put(2, 65, 7)                     # blocks to follow
    c = crc.crc16_bits(bits[:80], init=0, xorout=0xFFFF) ^ 0xCCCC
    put(c, 80, 16)
    h = parse_data_header(bits)
    assert h is not None
    assert h.dpf == 3 and h.confirmed
    assert h.target == 1234 and h.source == 5678
    assert h.blocks == 2 and h.sap == 4
    assert "Confirmed Delivery" in h.describe()
    assert "Source: 5678 Target: 1234" in h.describe()
    # corrupt CRC → reject
    bits[95] ^= 1
    assert parse_data_header(bits) is None


def _golay_slot_type(cc: int, dtype: int) -> np.ndarray:
    from dsdneo_tpu.fec.blockcodes import golay_20_8
    return golay_20_8().codebook[(cc << 4) | dtype]


def _bits_of(v, n):
    return np.array([(v >> (n - 1 - i)) & 1 for i in range(n)], dtype=np.uint8)


def _make_burst(payload196: np.ndarray, cc: int, dtype: int) -> np.ndarray:
    """CACH(24) + [49][5] SYNC(48) [5][49] bit image → dibit array."""
    from dsdneo_tpu.protocol.dmr.bs import CACH_INTERLEAVE
    from dsdneo_tpu.fec.blockcodes import hamming_7_4
    st = _golay_slot_type(cc, dtype)
    sync_bits = np.zeros(48, dtype=np.uint8)
    sync = "313333111331131131331131"      # +DMR BS data
    sync_d = np.array([1 if ch == "1" else 3 for ch in sync], dtype=np.uint8)
    sync_bits[0::2] = (sync_d >> 1) & 1
    sync_bits[1::2] = sync_d & 1
    # CACH: TACT word (AT=0 TC=0 LCSS=0) → Hamming(7,4) + payload zeros
    cach = np.zeros(24, dtype=np.uint8)
    cach[:7] = hamming_7_4().codebook[0]
    cach_tx = cach[CACH_INTERLEAVE]
    bits = np.concatenate([cach_tx, payload196[:98], st[:10], sync_bits,
                           st[10:], payload196[98:]])
    return ((bits[0::2] << 1) | bits[1::2]).astype(np.uint8)


def _decode_stream(dibits):
    from dsdneo_tpu.protocol.base import DecoderContext, DibitReader, registry
    import dsdneo_tpu.protocol.dmr  # noqa: F401
    from dsdneo_tpu.symbols import framesync
    lv = np.array([1.0, 3.0, -1.0, -3.0], dtype=np.float32)
    soft = lv[dibits]
    hits = framesync.find_syncs(soft, framesync.patterns_for({"dmr"}),
                                threshold=0.9)
    ctx = DecoderContext()
    dec = registry()["dmr"]()
    for h in hits:
        r = DibitReader(dibits, soft, pos=h.end, frame_start=h.pos,
                        invert=h.sync.inverted)
        dec.handle(r, h, ctx)
    return ctx


def test_dmr_data_call_r34_end_to_end():
    """Header burst + two rate-3/4 blocks through the real decoder."""
    from dsdneo_tpu.fec import crc
    from dsdneo_tpu.fec.bptc import bptc_196_96_encode
    from dsdneo_tpu.fec.trellis34 import encode_r34
    from dsdneo_tpu.protocol.dmr.data import crc32_bits

    # data header: unconfirmed delivery, 2 blocks follow
    hb = np.zeros(96, dtype=np.uint8)
    hb[0] = 1
    hb[4:8] = [0, 0, 1, 0]           # DPF 2 unconfirmed
    hb[8:12] = [0, 0, 0, 0]          # SAP 0 user data (text payload)
    hb[16:40] = _bits_of(100, 24)
    hb[40:64] = _bits_of(200, 24)
    hb[65:72] = _bits_of(2, 7)
    c = crc.crc16_bits(hb[:80], init=0, xorout=0xFFFF) ^ 0xCCCC
    hb[80:96] = _bits_of(c, 16)

    # 2 x 18-byte rate 3/4 blocks; last 4 bytes = CRC32 over swapped rest
    msg = b"Hello DMR data world over trellis 34" [:32]
    payload = np.frombuffer(msg, dtype=np.uint8).copy()
    swapped = payload.copy()
    for i in range(0, len(swapped) - 1, 2):
        swapped[i], swapped[i + 1] = swapped[i + 1], swapped[i]
    cv = crc32_bits(np.unpackbits(swapped))
    full = np.concatenate([payload, _bits_of(cv, 32).reshape(4, 8)
                           .dot(1 << np.arange(7, -1, -1)).astype(np.uint8)])
    assert len(full) == 36

    gap = np.zeros(80, dtype=np.uint8)
    stream = [gap, _make_burst(bptc_196_96_encode(hb), 7, 6)]
    for blk in (full[:18], full[18:]):
        bits = np.unpackbits(blk)
        dib = encode_r34(blk)
        p = np.zeros(196, dtype=np.uint8)
        p[0::2] = (dib >> 1) & 1
        p[1::2] = dib & 1
        stream.append(_make_burst(p, 7, 8))
    stream.append(gap)
    ctx = _decode_stream(np.concatenate(stream))
    text = "\n".join(e.line for e in ctx.events)
    assert "Data Header" in text
    assert "Unconfirmed Delivery" in text
    assert "Source: 200 Target: 100" in text
    assert "R34 block 1" in text
    assert "CRC32 OK" in text
    assert "Hello DMR data world" in text


def test_lrrp_parse():
    """LRRP response with timestamp + position/radius + speed/heading."""
    import numpy as np
    from dsdneo_tpu.protocol.dmr.lrrp import looks_like_lrrp, parse_lrrp

    def tok_time(y, mo, d, h, mi, s):
        b = [0x34,
             (y >> 6) & 0xFF,
             ((y & 0x3F) << 2) | (mo >> 2),
             ((mo & 3) << 6) | (d << 1) | (h >> 4),
             ((h & 0xF) << 4) | (mi >> 2),
             ((mi & 3) << 6) | s]
        return b

    lat_raw = int(37.25 * 2147483648.0 / 90.0) & 0xFFFFFFFF
    lon_raw = int(-121.5 * 2147483648.0 / 180.0) & 0xFFFFFFFF
    pos = [0x51] + list(lat_raw.to_bytes(4, "big")) \
        + list(lon_raw.to_bytes(4, "big")) + [0x00, 0x64]   # radius 1.0m
    spd = [0x6C, 0x0B, 0xB8]                                 # 30.00 mph
    hdg = [0x56, 45]                                         # 90 deg
    tokens = tok_time(2026, 8, 16, 12, 34, 56) + pos + spd + hdg
    pdu = np.array([0x07, len(tokens)] + tokens, dtype=np.uint8)
    assert looks_like_lrrp(pdu)
    fix = parse_lrrp(pdu)
    assert fix is not None and fix.have_pos
    assert abs(fix.lat - 37.25) < 1e-4
    assert abs(fix.lon + 121.5) < 1e-4
    assert fix.time == (2026, 8, 16, 12, 34, 56)
    assert abs(fix.speed_mph - 30.0) < 0.01
    assert fix.heading_deg == 90
    assert abs(fix.radius_m - 1.0) < 0.01
    assert "Lat: 37.25000 Lon: -121.50000" in fix.describe()


def _bptc_128x77_encode(data77):
    """Inverse of the decoder's BPTC 128x77 extraction (test helper)."""
    from dsdneo_tpu.fec.blockcodes import hamming_16_11_4
    ham = hamming_16_11_4()
    mat = np.zeros((8, 16), dtype=np.uint8)
    k = 0
    for r in range(2):
        mat[r][:11] = data77[k:k + 11]; k += 11
    for r in range(2, 7):
        mat[r][:10] = data77[k:k + 10]; k += 10
    for r in range(2, 7):
        mat[r][10] = data77[k]; k += 1
    for r in range(7):
        msg = 0
        for b in mat[r][:11]:
            msg = (msg << 1) | int(b)
        mat[r] = ham.codebook[msg]
    for i in range(16):
        mat[7][i] = int(mat[:7, i].sum()) & 1
    out = np.zeros(128, dtype=np.uint8)
    k = 0
    for i in range(16):
        for j in range(8):
            out[k] = mat[j][i]; k += 1
    return out


def test_dmr_embedded_lc_superframe():
    """Voice superframe with embedded LC: VC1 sync burst + VC2-6 EMB
    bursts through the real decoder -> Group LC decoded."""
    from dsdneo_tpu.fec.blockcodes import qr_16_7_6

    lc = np.zeros(72, dtype=np.uint8)
    lc[2:8] = _bits_of(0x00, 6)          # FLCO group voice
    lc[24:48] = _bits_of(4321, 24)       # target
    lc[48:72] = _bits_of(8765, 24)       # source
    data77 = np.zeros(77, dtype=np.uint8)
    data77[:72] = lc
    ssum = 0
    for i in range(9):
        v = 0
        for b in lc[8 * i:8 * i + 8]:
            v = (v << 1) | int(b)
        ssum += v
    data77[72:77] = _bits_of(ssum % 31, 5)
    frags = _bptc_128x77_encode(data77)

    sync = "131111333113313313113313"     # +DMR BS voice
    sync_d = np.array([1 if ch == "1" else 3 for ch in sync], dtype=np.uint8)
    qr = qr_16_7_6()
    cc = 7

    def burst(center_dibits):
        b = np.zeros(144, dtype=np.uint8)
        b[66:90] = center_dibits
        return b

    # TDMA stream: same-slot bursts 288 dibits apart (other slot between)
    tdma = [np.zeros(80, dtype=np.uint8)]
    tdma.append(burst(sync_d))
    for k in range(5):
        tdma.append(np.zeros(144, dtype=np.uint8))    # other slot
        lcss = 1 if k == 0 else (2 if k < 3 else 3)
        emb16 = qr.codebook[(cc << 3) | (0 << 2) | lcss]
        center = np.zeros(48, dtype=np.uint8)
        center[0:8] = emb16[:8]
        center[40:48] = emb16[8:]
        if k < 4:
            center[8:40] = frags[32 * k:32 * (k + 1)]
        cd = ((center[0::2] << 1) | center[1::2]).astype(np.uint8)
        tdma.append(burst(cd))
    tdma.append(np.zeros(200, dtype=np.uint8))
    ctx = _decode_stream(np.concatenate(tdma))
    text = "\n".join(e.line for e in ctx.events)
    assert "VC1" in text and "VC6" in text
    assert "Embedded LC Group TGT=4321 SRC=8765" in text


def _sync_dibits(pattern: str) -> np.ndarray:
    return np.array([1 if ch == "1" else 3 for ch in pattern], dtype=np.uint8)


def test_dmr_rc_burst_decode():
    """Standalone Reverse Channel burst: command + CRC7(^0x7A) through
    Hamming(16,11,4)+odd-parity BPTC and the RC interleave, decoded via
    the real sync hunt (reference dmr_rc.c dmrRC)."""
    from dsdneo_tpu.fec.blockcodes import hamming_16_11_4, qr_16_7_6
    from dsdneo_tpu.protocol.dmr.bs import DmrBsDecoder
    from dsdneo_tpu.symbols import framesync

    dec_cls = DmrBsDecoder
    cmd = 4                                  # Cease Transmission Command
    crc = dec_cls._crc7_rc(_bits_of(cmd, 4))
    data11 = (cmd << 7) | (crc ^ 0x7A)
    row1 = hamming_16_11_4().codebook[data11]
    mat = np.concatenate([row1, 1 - row1])   # odd column parity
    inter = np.zeros(32, dtype=np.uint8)
    place = dec_cls._RC_PLACE[dec_cls._RC_DEINT]
    for i in range(32):
        inter[i] = mat[place[i]]
    # EMB: CC=9, PI=0, LCSS=0
    emb = qr_16_7_6().codebook[(9 << 3)]

    def bits_to_dibits(bits):
        return ((bits[0::2] << 1) | bits[1::2]).astype(np.uint8)

    rc_a = bits_to_dibits(inter[:16])
    emb_a = bits_to_dibits(emb[:8])
    emb_b = bits_to_dibits(emb[8:])
    rc_b = bits_to_dibits(inter[16:])
    sync_d = _sync_dibits("131331111133133133311313")   # +DMR MS RC
    gap = np.zeros(40, dtype=np.uint8)
    dibits = np.concatenate([gap, rc_a, emb_a, sync_d, emb_b, rc_b, gap])

    ctx = _decode_stream(dibits)
    lines = [e.line for e in ctx.events]
    assert any("DMR RC" in ln and "Cease Transmission Command" in ln
               for ln in lines), lines
    assert any("Color Code=09" in ln for ln in lines)


def test_dmr_ms_data_burst_decode():
    """MS/DM data burst (mono, no CACH) decodes CSBK content with the
    MS/DM MODE/MONO label (reference dmr_ms.c dmrMSData)."""
    from dsdneo_tpu.fec import crc
    from dsdneo_tpu.fec.bptc import bptc_196_96_encode

    # CSBK: BS Outbound Activation (BS_Dwn_Act, CSBKO 56 on MS sync)
    bits = np.zeros(96, dtype=np.uint8)
    bits[0] = 1                              # LB
    bits[2:8] = _bits_of(56, 6)
    c = crc.crc16_bits(bits[:80], init=0, xorout=0xFFFF) ^ 0xA5A5
    bits[80:96] = _bits_of(c, 16)
    payload = bptc_196_96_encode(bits)

    st = _golay_slot_type(11, 3)             # CC=11, CSBK
    sync = _sync_dibits("311131133313133331131113")     # +DMR MS data
    sync_bits = np.zeros(48, dtype=np.uint8)
    sync_bits[0::2] = (sync >> 1) & 1
    sync_bits[1::2] = sync & 1
    burst_bits = np.concatenate([np.zeros(24, dtype=np.uint8),
                                 payload[:98], st[:10], sync_bits,
                                 st[10:], payload[98:]])
    dd = ((burst_bits[0::2] << 1) | burst_bits[1::2]).astype(np.uint8)
    gap = np.zeros(40, dtype=np.uint8)
    ctx = _decode_stream(np.concatenate([gap, dd, gap]))
    lines = [e.line for e in ctx.events]
    assert any("MS/DM MODE/MONO" in ln and "CSBK" in ln
               and "Color Code=11" in ln for ln in lines), lines
    assert any("BS Outbound Activation (BS_Dwn_Act)" in ln
               for ln in lines), lines
