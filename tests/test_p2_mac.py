"""P25 Phase 2 native MAC catalog: explicit/extended grants, vendor
partitions (Motorola/Harris/Tait), multi-fragment LCCH reassembly, and
the TSBK bridge, with constructed MAC PDU octets (layouts per reference
p25p2_vpdu.c / p25p2_mac_parse.c)."""

from types import SimpleNamespace

import numpy as np
import pytest

from dsdneo_tpu.protocol.base import DecoderContext
from dsdneo_tpu.protocol.p25.p2_mac import P2MacWalker


def _walker():
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder
    return P2MacWalker(P25P1Decoder)


def _run(msgs, n_oct=22, slot=0, ctx=None, w=None):
    mac = np.zeros(24, dtype=np.int64)
    i = 1
    for m in msgs:
        mac[i:i + len(m)] = m
        i += len(m)
    ctx = ctx or DecoderContext()
    w = w or _walker()
    hit = SimpleNamespace(pos=0)
    text = w.walk(mac, n_oct, slot, ctx, hit)
    return text, ctx, w


def test_explicit_group_grant_c0():
    # svc 0x00, CHAN-T 0x100A, CHAN-R 0x100B, group 1234, src 567890
    msg = [0xC0, 0x00, 0x10, 0x0A, 0x10, 0x0B,
           1234 >> 8, 1234 & 0xFF, 0x08, 0xAA, 0x52]
    text, ctx, _ = _run([msg])
    assert "Group Voice Channel Grant - Explicit" in text
    assert "CHAN-T [100A]" in text and "CHAN-R [100B]" in text
    assert "Group [1234]" in text
    ev = [e for e in ctx.events if e.fields.get("grant")]
    assert ev and ev[0].fields["tg"] == 1234 and ev[0].fields["channel"] == 0x100A


def test_uu_grant_extended_suid():
    wacn, sysid = 0xBEE00, 0x14C
    suid_octets = [(wacn >> 12) & 0xFF, (wacn >> 4) & 0xFF,
                   ((wacn & 0xF) << 4) | (sysid >> 8), sysid & 0xFF]
    msg = ([0xC4, 0x10, 0x0A, 0x10, 0x0B] + suid_octets
           + [0x01, 0x02, 0x03, 0x0A, 0x0B, 0x0C])
    text, ctx, _ = _run([msg])
    assert "Unit to Unit Channel Grant Service Extended" in text
    assert "SRC: BEE00:14C." in text
    assert "CHAN-T: 100A" in text


def test_mfid90_regroup_grant_implicit():
    msg = [0xA3, 0x90, 0x0B, 0x00, 0x21, 0x14,
           0x00, 0x38, 0x00, 0x12, 0x34]
    text, ctx, _ = _run([msg])
    assert "MFID90 Group Regroup Channel Grant - Implicit" in text
    assert "CHAN [2114]" in text
    ev = [e for e in ctx.events if e.fields.get("grant")]
    assert ev and ev[0].fields["tg"] == 0x38 and ev[0].fields["channel"] == 0x2114


def test_motorola_deny_response_releases():
    # deny 0xA7: flags(addl)=0x80|svc, reason 0x60 Site Access Denial
    msg = [0xA7, 0x90, 0x0B, 0x80, 0x60, 0x00, 0x00, 0x01,
           0x00, 0x30, 0x39]
    text, ctx, _ = _run([msg])
    assert "Motorola Deny Response" in text
    assert "Site Access Denial" in text
    assert "Target [12345]" in text
    assert any(e.fields.get("release") and e.fields.get("deny")
               for e in ctx.events)


def test_motorola_bsi_callsign():
    # pack "WA7DSD" as 6-bit chars (chr(v+43)) into 6 octets
    text_in = "WA7DSD"
    packed = 0
    vals = [ord(c) - 43 for c in text_in] + [0, 0]
    for v in vals:
        packed = (packed << 6) | v
    octs = [(packed >> (8 * (5 - i))) & 0xFF for i in range(6)]
    msg = [0x85, 0x90, 0x09] + octs
    text, _, _ = _run([msg])
    assert "System Broadcast (BSI)" in text
    assert f"BSI [{text_in}]" in text


def test_harris_uu_data_grant():
    msg = [0xAC, 0xA4, 0x0C, 0x00, 0x10, 0x0A,
           0x00, 0x00, 0x07, 0x00, 0x00, 0x09]
    text, ctx, _ = _run([msg])
    assert "L3Harris Unit-to-Unit Data Channel Grant" in text
    assert "CHAN [100A]" in text and "Target [7]" in text and "Source [9]" in text
    assert any(e.fields.get("data") and e.fields.get("grant")
               for e in ctx.events)


def test_tait_micro_slot_counter():
    msg = [0xB5, 0xD8, 0x05, 0xAB, 0xCD]
    text, _, _ = _run([msg])
    assert "Tait" in text and "Micro Slot Counter [ABCD]" in text


def test_multifrag_call_alert_across_pdus():
    """0xCB base (data_len 20 > 16 in-PDU octets) + 0x10 continuation
    completes to the extended call alert (vpdu consume_multifragment_*)."""
    wacn, sysid = 0x92065, 0x0D5
    suid = [(wacn >> 12) & 0xFF, (wacn >> 4) & 0xFF,
            ((wacn & 0xF) << 4) | (sysid >> 8), sysid & 0xFF]
    # frag data layout (data[0]=len octet): src u24@1, SUID@4, id u24@8,
    # tgt u24@11
    data = [20, 0x00, 0x22, 0x33] + suid + [0x00, 0x22, 0x33,
                                            0x00, 0x44, 0x55, 0x00]
    base = [0xCB, 0x00] + data[:16]          # 18-octet base PDU segment
    w = _walker()
    ctx = DecoderContext()
    text1, _, _ = _run([base], ctx=ctx, w=w)
    assert "Multi-Fragment Base" in text1
    assert "Complete" not in text1
    cont = [0x10, 0x06] + data[16:20]
    text2, ctx2, _ = _run([cont], ctx=ctx, w=w)
    assert "Call Alert - Extended LCCH Complete" in text2
    assert "Target [17493]" in text2          # 0x004455
    assert f"Source [{wacn:05X}:{sysid:03X}." in text2


def test_multifrag_cleared_by_other_opcode():
    base = [0xCB, 0x00, 30] + [0] * 15
    w = _walker()
    ctx = DecoderContext()
    _run([base], ctx=ctx, w=w)
    assert w.frag[0].active
    _run([[0x40, 0, 0x10, 0x0A, 0, 5, 0, 0, 1]], ctx=ctx, w=w)
    assert not w.frag[0].active
    text, _, _ = _run([[0x10, 0x06, 1, 2, 3, 4]], ctx=ctx, w=w)
    assert "ignored: no active base" in text


def test_walk_multiple_messages_one_pdu():
    grant = [0x40, 0x00, 0x10, 0x0A, 0x00, 0x38, 0x00, 0x12, 0x34]
    alert = [0x5F, 0x00, 0x00, 0x07, 0x00, 0x00, 0x09]
    text, ctx, _ = _run([grant, alert])
    assert "Group Voice Channel Grant" in text
    assert "Call Alert - Abbreviated" in text
    assert "Target [7] Source [9]" in text


def test_tsbk_bridge_network_status():
    wacn, sysid = 0x92065, 0x0D5
    msg = [0x7B, 0x00,
           (wacn >> 12) & 0xFF, (wacn >> 4) & 0xFF,
           ((wacn & 0xF) << 4) | (sysid >> 8), sysid & 0xFF,
           0x21, 0x14, 0, 0, 0]
    text, ctx, _ = _run([msg])
    ev_text = "\n".join(e.line for e in ctx.events)
    assert "Network Status Broadcast" in ev_text
    assert "WACN [92065]" in ev_text and "SYSID [0D5]" in ev_text
    assert ctx.state.p2_wacn == wacn and ctx.state.p2_sysid == sysid


def test_status_update_extended_vch():
    wacn, sysid = 0xBEE00, 0x14C
    suid = [(wacn >> 12) & 0xFF, (wacn >> 4) & 0xFF,
            ((wacn & 0xF) << 4) | (sysid >> 8), sysid & 0xFF]
    msg = ([0xD8, 0x00, 0x11, 0x22, 0x00, 0x00, 0x05]
           + suid + [0x00, 0x00, 0x09])
    text, _, _ = _run([msg])
    assert "Status Update - Extended VCH" in text
    assert "Unit [11] User [22]" in text
    assert "Target [5]" in text and "BEE00:14C.9" in text


def test_extended_function_radio_inhibit():
    msg = ([0xE5, 0x00, 0x00, 0x7D, 0x00, 0x00, 0x00,
            0x00, 0x00, 0x07, 0x01, 0x02, 0x03, 0x04])
    text, _, _ = _run([msg])
    assert "Extended Function Command - Extended LCCH" in text
    assert "Radio Inhibit" in text
    assert "Target [7]" in text


def test_segment_len_resolution():
    from dsdneo_tpu.protocol.p25.p2_mac import P2MacWalker as W
    mac = np.zeros(24, dtype=np.int64)
    mac[1] = 0xC0
    assert W.segment_len(mac, 1, 22) == 11
    mac[1], mac[2] = 0xA3, 0x90                  # Motorola table
    assert W.segment_len(mac, 1, 22) == 11
    mac[1], mac[2], mac[3] = 0x8B, 0x90, 0x10    # unknown vendor: len octet
    assert W.segment_len(mac, 1, 22) == 0x10
    mac[1], mac[2] = 0x10, 0x26                  # continuation: len in octet 2
    assert W.segment_len(mac, 1, 22) == 0x26 & 0x3F


def test_nxdn_vcall_assgn_grant():
    """NXDN VCALL_ASSGN decodes channel + emits a trunk grant event
    (reference nxdn_element.c nxdn_vcall_assgn_parse: chan @62:10)."""
    import numpy as np
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.nxdn.decoder import NxdnDecoder

    msg = np.zeros(72, dtype=np.uint8)

    def put(v, a, n):
        for i in range(n):
            msg[a + i] = (v >> (n - 1 - i)) & 1

    put(0x04, 2, 6)          # VCALL_ASSGN
    put(0x80, 8, 8)          # emergency
    put(1, 16, 3)            # group call
    put(0x02, 19, 5)
    put(1234, 24, 16)        # src
    put(300, 40, 16)         # dst
    put(0x0AA, 62, 10)       # channel 170
    ctx = DecoderContext()
    dec = NxdnDecoder()
    out = dec._message(msg, ctx)
    assert "VCALL_ASSGN" in out
    assert "Channel [0AA][0170]" in out and "Emergency" in out
    ev = [e for e in ctx.events if e.fields.get("grant")]
    assert ev and ev[0].fields["lpcn"] == 170 and ev[0].fields["tg"] == 300


def test_nxdn_cch_info_neighbors():
    import numpy as np
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.nxdn.decoder import NxdnDecoder

    msg = np.zeros(64, dtype=np.uint8)

    def put(v, a, n):
        for i in range(n):
            msg[a + i] = (v >> (n - 1 - i)) & 1

    put(0x1A, 2, 6)
    put(0x123456, 8, 24)
    put(5, 38, 10)
    put(9, 54, 10)
    ctx = DecoderContext()
    out = NxdnDecoder()._message(msg, ctx)
    assert "Control Channel Information" in out
    assert "[123456]" in out and "CH1 [5] CH2 [9]" in out
    assert [e for e in ctx.events if e.fields.get("neighbors") == [5, 9]]


def test_ysf_vd1_voice_roundtrip():
    """V/D1 VCH blocks carry standard 72-bit AMBE codewords; a frame
    built with encode path dequantizes through the V/D1 handler."""
    import numpy as np
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.dmr.ambe_frame import encode_ambe_ecc
    from dsdneo_tpu.protocol.ysf.decoder import YsfDecoder

    rng = np.random.default_rng(3)
    payload = np.zeros(360, dtype=np.uint8)
    for blk in range(5):
        bits49 = rng.integers(0, 2, 49).astype(np.uint8)
        bits72 = encode_ambe_ecc(bits49)
        dd = (bits72[0::2] << 1) | bits72[1::2]
        payload[blk * 72 + 36: blk * 72 + 72] = dd
    ctx = DecoderContext()
    YsfDecoder()._voice_vd1(payload, ctx)
    # the reference synthesizes 4 frames per V/D1 payload (ysf_ehr 0..4)
    assert 0 in ctx.audio and len(ctx.audio[0][0]) == 4 * 160


def test_nxdn_sdcall_header_and_data():
    """NXDN short-data call header fields + data payload dump
    (reference nxdn_element.c nxdn_sdcall_header)."""
    import numpy as np
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.nxdn.decoder import NxdnDecoder

    msg = np.zeros(80, dtype=np.uint8)

    def put(v, a, n):
        for i in range(n):
            msg[a + i] = (v >> (n - 1 - i)) & 1

    put(0x38, 2, 6)
    put(1, 16, 3)
    put(1234, 24, 16)
    put(300, 40, 16)
    put(3, 56, 2)
    put(0x11, 58, 6)
    put(4, 68, 4)
    ctx = DecoderContext()
    out = NxdnDecoder()._message(msg, ctx)
    assert "SDCALL_REQ_HEADER" in out
    assert "Src=1234 - Dst/TG=300" in out
    assert "AES Key [11]" in out and "Blocks [4]" in out
    assert ctx.state.last_tg == 300

    data = np.zeros(80, dtype=np.uint8)

    def put2(v, a, n):
        for i in range(n):
            data[a + i] = (v >> (n - 1 - i)) & 1

    put2(0x39, 2, 6)
    put2(0x12, 8, 8)                    # PF/BLK counters
    for i, ch in enumerate(b"HELLO NX"):
        put2(ch, 16 + 8 * i, 8)
    out = NxdnDecoder()._message(data, ctx)
    assert "PF [1] BLK [2]" in out and "HELLO NX" in out


def test_harris_mac_gps_location():
    """Vendor 0xAA carries the talker GPS at bit 40 (reference
    p25p2_vpdu_handle_harris_gps_location -> nmea_harris)."""
    # fixed MAC length 17; payload from octet 3 re-bases to bit 40
    msg = [0xAA, 0xA4, 0x11,
           0, 0,                 # lat frac
           30, 33,               # lat min / deg (33.5 N)
           0, 0,                 # lon frac
           0x8F, 112,            # west, 15 min / 112 deg
           0xB0, 0xF0,           # 45296 s = 12:34:56
           0, 0, 90]             # heading 90
    text, _, _ = _run([msg])
    assert "Harris GPS: 33.500000, -112.250000;" in text
    assert "HEADING: 090;" in text and "TIME: 12:34:56 UTC;" in text


def test_harris_mac_talker_alias():
    """Vendor 0xA8: self-contained alias, text from octet 3 through
    the length octet (reference p25p2_vpdu.c :2350-2361)."""
    name = b"LADDER 7"
    msg = [0xA8, 0xA4, 3 + len(name)] + list(name)
    text, _, _ = _run([msg])
    assert "MFID A4 (Harris) Talker Alias: LADDER 7" in text
