"""P25 AMBTC/UMBTC multi-block trunking layouts (constructed MPDUs;
byte offsets per reference p25p1_pdu_trunking.c)."""

from types import SimpleNamespace

import numpy as np

from dsdneo_tpu.protocol.base import DecoderContext
from dsdneo_tpu.protocol.p25.mbt import decode_mbt


def _mpdu(op, blocks=1, fmt=0x17, mfid=0, outbound=True, setb=()):
    b = np.zeros(12 * (1 + blocks), dtype=np.int64)
    b[0] = (0x20 if outbound else 0) | fmt
    b[1] = 61        # trunking-control SAP (decimal)
    b[2] = mfid
    b[6] = blocks
    if fmt == 0x17:
        b[7] = op
    else:
        b[12] = op
    for i, v in setb:
        b[i] = v
    return b


def _run(mpdu):
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder
    ctx = DecoderContext()
    handled = decode_mbt(mpdu, ctx, SimpleNamespace(pos=0), P25P1Decoder())
    return handled, ctx, "\n".join(e.line for e in ctx.events)


def test_net_status_extended():
    wacn, sysid = 0x92065, 0x0D5
    m = _mpdu(0x3B, setb=[(3, 0x55), (4, sysid >> 8), (5, sysid & 0xFF),
                          (12, (wacn >> 12) & 0xFF), (13, (wacn >> 4) & 0xFF),
                          (14, (wacn & 0xF) << 4), (15, 0x21), (16, 0x14),
                          (17, 0x21), (18, 0x15), (19, 0x70)])
    handled, ctx, text = _run(m)
    assert handled
    assert "Network Status Broadcast MBT - Extended" in text
    assert "WACN [92065] SYSID [0D5]" in text
    assert "CHAN-T [2114] CHAN-R [2115]" in text
    assert ctx.state.p2_wacn == wacn and ctx.state.p2_sysid == sysid


def test_group_voice_grant_extended_feeds_trunk():
    m = _mpdu(0x00, setb=[(8, 0x40), (3, 0), (4, 0x30), (5, 0x39),
                          (14, 0x10), (15, 0x0A), (16, 0x10), (17, 0x0B),
                          (18, 0x04), (19, 0xD2)])
    handled, ctx, text = _run(m)
    assert handled
    assert "Group Voice Channel Grant MBT - Extended" in text
    assert "CHAN-T [100A] CHAN-R [100B] Group [1234]" in text
    ev = [e for e in ctx.events if e.fields.get("grant")]
    assert ev and ev[0].fields["tg"] == 1234 and ev[0].fields["channel"] == 0x100A
    assert ev[0].fields["encrypted"]


def test_uu_grant_extended_suid():
    wacn, sysid = 0xBEE00, 0x14C
    m = _mpdu(0x04, blocks=2,
              setb=[(8, 0x00), (3, 0), (4, 0x01), (5, 0x02),
                    (12, (wacn >> 12) & 0xFF), (13, (wacn >> 4) & 0xFF),
                    (14, ((wacn & 0xF) << 4) | (sysid >> 8)),
                    (15, sysid & 0xFF), (19, 0), (20, 0), (21, 9),
                    (22, 0x10), (23, 0x0C), (24, 0x10), (25, 0x0D)])
    handled, ctx, text = _run(m)
    assert handled
    assert "Unit to Unit Voice Channel Grant MBT - Extended" in text
    assert "CHAN-T [100C] CHAN-R [100D]" in text
    assert "BEE00:14C." in text and "Target [9]" in text


def test_unit_registration_response():
    m = _mpdu(0x2C, setb=[(3, 0), (4, 0x30), (5, 0x39),
                          (8, 0x92), (9, 0x06), (12, 0x50), (13, 0xD5),
                          (14, 0x01), (15, 0x02), (16, 0x03), (17, 0x00)])
    handled, _, text = _run(m)
    assert handled
    assert "Unit Registration Response MBT - Extended" in text
    assert "REG_ACCEPT" in text


def test_umbtc_opcode_from_block():
    """UMBTC (fmt 0x15) carries the opcode at block byte 12."""
    m = _mpdu(0x3C, fmt=0x15,
              setb=[(3, 0x55), (4, 0x30), (5, 0xD5), (8, 3), (9, 7),
                    (12, 0x3C)])
    # opcode byte doubles as rfss in the AMBTC layout; 0x3C adjacent
    handled, _, text = _run(m)
    assert handled
    assert "Adjacent Status Broadcast MBT - Extended" in text


def test_inbound_uu_voice_request():
    m = _mpdu(0x04, outbound=False,
              setb=[(8, 0x00), (3, 0), (4, 0), (5, 7),
                    (14, 0), (15, 0x30), (16, 0x39)])
    handled, _, text = _run(m)
    assert handled
    assert "Unit-to-Unit Voice Service Request MBT - Inbound" in text
    assert "FM [12345] TO [7]" in text


def test_mfid90_regroup_grant():
    m = _mpdu(0x00, mfid=0x90,
              setb=[(8, 0x00), (3, 0), (4, 0), (5, 42),
                    (12, 0x10), (13, 0x0A), (14, 0x10), (15, 0x0B),
                    (16, 0x05), (17, 0xDC)])
    handled, ctx, text = _run(m)
    assert handled
    assert "MFID90 Group Regroup Channel Grant - Explicit MBT" in text
    assert "SG [1500]" in text
    assert [e for e in ctx.events if e.fields.get("grant")]


def test_call_alert_extended():
    wacn, sysid = 0x92065, 0x0D5
    m = _mpdu(0x1F, setb=[(3, 0), (4, 0), (5, 9),
                          (8, (wacn >> 12) & 0xFF), (9, (wacn >> 4) & 0xFF),
                          (12, ((wacn & 0xF) << 4) | (sysid >> 8)),
                          (13, sysid & 0xFF), (14, 0), (15, 0x30),
                          (16, 0x39)])
    handled, _, text = _run(m)
    assert handled
    assert "Call Alert MBT - Extended" in text
    assert "FM [92065:0D5.12345] TO [9]" in text


def test_unhandled_falls_back():
    m = _mpdu(0x21)        # not in the native catalog → TSBK bridge
    handled, _, _ = _run(m)
    assert not handled


def test_mpdu_data_sap_routing():
    """Data-SAP routing on completed clear PDUs (reference
    p25_decode_clear_pdu_payload): SAP 0/4 IPv4, 6 SNDCP, 48 NMEA."""
    import numpy as np
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder
    dec = P25P1Decoder()
    hdr = np.zeros(12, np.int64)         # offset 0, pad 0
    ctx = DecoderContext()
    hit = SimpleNamespace(pos=0, sync=SimpleNamespace(name="x"))

    # SAP 0: IPv4/UDP telemetry packet + CRC32 tail
    ip = np.zeros(20, np.uint8)
    ip[0] = 0x45
    ip[2], ip[3] = 0, 28
    ip[9] = 0x11
    udp = np.array([0x0F, 0xA7, 0x0F, 0xA8, 0, 8, 0, 0], np.uint8)  # ->4008
    payload = np.concatenate([ip, udp, np.zeros(4, np.uint8)])
    out = dec._mpdu_data_sap(0, payload, hdr, 1, 0, ctx, hit)
    assert out is not None and "Telemetry;" in out

    # SAP 6: SNDCP control, outbound activate accept
    body = np.concatenate([np.array([0x05], np.uint8), np.zeros(4, np.uint8)])
    out = dec._mpdu_data_sap(6, body, hdr, 1, 0, ctx, hit)
    assert out == " SNDCP Activate TDS Context Accept NSAPI:5"

    # SAP 48: valid NMEA ASCII sentence (checksum of GPGLL body)
    sent = b"$GPGLL,4530.00,N,11215.00,W*"
    csum = 0
    for c in sent[1:-1]:
        csum ^= c
    full = sent + f"{csum:02X}".encode() + b"\x00\x00\x00\x00"
    out = dec._mpdu_data_sap(48, np.frombuffer(full, np.uint8), hdr,
                             1, 0, ctx, hit)
    assert out.startswith(" NMEA: $GPGLL,4530.00,N,11215.00,W*")

    # SAP 48 with a broken checksum flags invalid
    bad = bytearray(full)
    bad[2] ^= 1
    out = dec._mpdu_data_sap(48, np.frombuffer(bytes(bad), np.uint8),
                             hdr, 1, 0, ctx, hit)
    assert "NMEA Checksum Error" in out
