"""P25 LCW catalog: broadcast formats, iden updates, source-ID
extension, protection parameters, MFID90/A4/D8 vendor opcodes
(constructed 72-bit LCWs; layouts per reference p25_lcw.c)."""

from types import SimpleNamespace

import numpy as np

from dsdneo_tpu.protocol.base import DecoderContext
from dsdneo_tpu.protocol.p25.lcw import decode_lcw


def _bits(*fields):
    """Build a 72-bit LCW from (value, nbits) fields, MSB-first."""
    out = []
    for v, n in fields:
        out.extend((v >> (n - 1 - i)) & 1 for i in range(n))
    out.extend([0] * (72 - len(out)))
    return np.array(out[:72], dtype=np.uint8)


def _decode(bits, ctx=None):
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder
    ctx = ctx or DecoderContext()
    decode_lcw(bits, SimpleNamespace(pos=0), ctx, P25P1Decoder())
    return ctx, "\n".join(e.line for e in ctx.events)


def test_group_voice_user_with_service_options():
    bits = _bits((0x00, 8), (0x00, 8), (0xC1, 8), (0, 8),
                 (1234, 16), (567890, 24))
    ctx, text = _decode(bits)
    assert "Group Voice Channel User - Group 1234 Source 567890" in text
    assert "Emergency" in text and "Encrypted" in text and "Priority 1" in text
    assert ctx.state.last_tg == 1234


def test_network_status_broadcast_updates_state():
    bits = _bits((0x64, 8), (0, 8), (0xBEE00, 20), (0x14C, 12),
                 (0x2114, 16), (0x70, 8))
    ctx, text = _decode(bits)
    assert "Network Status Broadcast - WACN BEE00 SYS 14C CH 2114" in text
    assert ctx.state.p2_wacn == 0xBEE00 and ctx.state.p2_sysid == 0x14C


def test_network_status_explicit_lcnsbx():
    bits = _bits((0x69, 8), (0x92065, 20), (0x0D5, 12),
                 (0x100A, 16), (0x100B, 16))
    ctx, text = _decode(bits)
    assert "LCNSBX" in text and "WACN 92065" in text
    assert "CH-T 100A CH-R 100B" in text
    assert ctx.state.p2_wacn == 0x92065


def test_adjacent_and_rfss_status():
    bits = _bits((0x62, 8), (0x55, 8), (0xF, 4), (0x0D5, 12),
                 (3, 8), (7, 8), (0x2114, 16), (0x70, 8))
    _, text = _decode(bits)
    assert "Adjacent Site Status Broadcast" in text
    assert "LRA 55 SYS 0D5 RFSS 3 Site 7 CH 2114" in text
    bits = _bits((0x63, 8), (0x55, 8), (0xF, 4), (0x0D5, 12),
                 (3, 8), (7, 8), (0x2114, 16), (0x70, 8))
    ctx, text = _decode(bits)
    assert "RFSS Status Broadcast" in text
    assert ctx.state.p2_rfssid == 3 and ctx.state.p2_siteid == 7


def test_channel_identifier_update_feeds_iden_table():
    # iden 1, bw 0x64, +offset sign, raw 0x19, spacing 0x64, base 851 MHz/5
    base = 851_000_000 // 5
    bits = _bits((0x58, 8), (1, 4), (0x64, 9), (1, 1), (0x19, 8),
                 (0x64, 10), (base, 32))
    ctx, text = _decode(bits)
    assert "Channel Identifier Update; Iden: 1" in text
    assert f"Base: {851_000_000}" in text
    ev = ctx.events[-1]
    assert ev.fields.get("iden") == 1


def test_source_id_extension():
    bits = _bits((0x49, 8), (0, 8), (0x92065, 20), (0x0D5, 12),
                 (41183, 24))
    _, text = _decode(bits)
    assert "Source ID Extension" in text
    assert "WACN 92065 SYSID 0D5 SRC 41183" in text


def test_protection_parameter_broadcast():
    bits = _bits((0x65, 8), (0, 8), (0, 8), (0xAA, 8), (0x1234, 16),
                 (777, 24))
    _, text = _decode(bits)
    assert "Protection Parameter Broadcast" in text
    assert "ALGID [AA]" in text and "KID [1234]" in text and "Target [777]" in text


def test_call_termination_release():
    bits = _bits((0x4F, 8), (0, 40), (0xFFFFFF, 24))
    ctx, text = _decode(bits)
    assert "Call Termination" in text
    assert ctx.events[-1].fields.get("release")


def test_mfid90_group_regroup_user():
    # SF=0, format 0x00 with MFID 0x90 routes to the vendor catalog
    bits = _bits((0x00, 8), (0x90, 8), (0, 16), (1500, 16), (99, 24))
    ctx, text = _decode(bits)
    assert "MFID90 (Moto) Group Regroup Channel User (LCGRGR)" in text
    assert "SG: 1500; SRC: 99;" in text
    assert ctx.state.last_tg == 1500


def test_mfid90_emergency_alarm():
    bits = _bits((0x0A, 8), (0x90, 8), (0, 16), (42, 16), (1000, 24))
    ctx, text = _decode(bits)
    assert "Emergency Alarm Activation" in text
    assert "** EMERGENCY **" in text
    assert ctx.events[-1].fields.get("emergency")


def test_mfid90_talker_eot():
    bits = _bits((0x0F, 8), (0x90, 8), (0, 32), (4242, 24))
    ctx, text = _decode(bits)
    assert "Talker EOT; SRC: 4242;" in text
    assert ctx.events[-1].fields.get("release")


def test_tait_fq_suid():
    bits = _bits((0x01, 8), (0xD8, 8), (0x92065, 20), (0x0D5, 12),
                 (31337, 24))
    _, text = _decode(bits)
    assert "MFIDD8 (Tait) Subscriber FQ-SUID: 92065.0D5.31337" in text


def test_protected_lcw_not_parsed():
    bits = _bits((0xC0, 8), (0, 8), (0, 8))   # PF bit set
    _, text = _decode(bits)
    assert "LCW Protected" in text


def test_conventional_fallback_and_secondary_cc():
    bits = _bits((0x6A, 8),)
    _, text = _decode(bits)
    assert "Conventional Fallback" in text
    bits = _bits((0x61, 8), (3, 8), (7, 8), (0x100A, 16), (0x70, 8),
                 (0x100B, 16), (0x71, 8))
    _, text = _decode(bits)
    assert "Secondary Control Channel Broadcast" in text
    assert "CH A 100A SSC 70 CH B 100B SSC 71" in text


def test_affiliation_and_patch_tracking():
    """Affiliation registry fed from TSBK/MAC/MBT/LCW handlers
    (reference p25_aff.c / p25_patch.c)."""
    from dsdneo_tpu.core.affiliation import AffiliationTable, table_for
    ctx = DecoderContext()
    t = table_for(ctx)
    assert table_for(ctx) is t                  # lazily cached
    t.register(101)
    t.affiliate(101, 2000)
    t.affiliate(102, 2000)
    assert t.affiliated_units(2000) == [101, 102]
    t.patch_update(900)
    t.patch_add_wgid(900, 2000)
    t.patch_add_wuid(900, 101)
    assert "P:900[2000,u101]" in t.patch_summary()
    t.patch_clear(900)
    assert t.patch_summary() == ""
    # MFID90 LCW regroup add feeds the patch table
    bits = _bits((0x03, 8), (0x90, 8), (1500, 16), (2001, 16), (2002, 16))
    decode_lcw(bits, SimpleNamespace(pos=0), ctx, None)
    assert ctx.state.affiliations.patches[1500]["wgids"] == {2001, 2002}
    # delete removes only the named WGIDs (reference p25_patch_remove_wgid)
    bits = _bits((0x04, 8), (0x90, 8), (1500, 16), (2001, 16))
    decode_lcw(bits, SimpleNamespace(pos=0), ctx, None)
    assert ctx.state.affiliations.patches[1500]["wgids"] == {2002}


def test_tsbk_catalog_breadth():
    """The TSBK opcodes added in round 2 decode with reference layouts
    (message update, deny/queued, extended function, telephone grant,
    explicit grant update)."""
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder

    def run(op, body):
        bits = np.zeros(96, np.uint8)
        byts = [op, 0] + body
        for i, v in enumerate(byts[:12]):
            for j in range(8):
                bits[8 * i + j] = (v >> (7 - j)) & 1
        ctx = DecoderContext()
        P25P1Decoder()._tsbk(
            bits, SimpleNamespace(pos=0, sync=SimpleNamespace(name="x")),
            ctx)
        return ctx, "\n".join(e.line for e in ctx.events)

    _, out = run(0x1C, [0x12, 0x34, 0, 0, 7, 0, 0, 9])
    assert "Message Update" in out and "Message [1234]" in out
    ctx, out = run(0x27, [0x84, 0x60, 0, 0, 1, 0, 0x30, 0x39])
    assert "Deny Response" in out and "Site Access Denial" in out
    assert "Addl [000001]" in out      # gated on svc bit 7
    assert any(e.fields.get("deny") for e in ctx.events)
    _, out = run(0x27, [0x04, 0x60, 0, 0, 1, 0, 0x30, 0x39])
    assert "Addl" not in out
    ctx, out = run(0x03, [0x40, 0, 0x10, 0x0A, 0x10, 0x0B, 0x04, 0xD2])
    assert "Grant Update - Explicit" in out and "Group [1234]" in out
    assert any(e.fields.get("grant") for e in ctx.events)
    _, out = run(0x24, [0x00, 0x7D, 0, 0, 1, 0, 0, 5])
    assert "Radio Inhibit" in out
    ctx, out = run(0x08, [0x00, 0x10, 0x0A, 0, 50, 0, 0, 7])
    assert "Telephone Interconnect Voice Channel Grant" in out
    assert "CHAN [100A]" in out and "Timer [5.0s]" in out and "Target [7]" in out


def test_mfid90_tsbk_catalog():
    """Motorola TSBK set: corrected grant offsets, regroup add feeds
    the patch registry, deny reasons (reference p25p1_tsbk.c
    tsbk_handle_mfid90_*)."""
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder

    shared = DecoderContext()

    def run(op, body, ctx=None):
        bits = np.zeros(96, np.uint8)
        byts = [op, 0x90] + body
        for i, v in enumerate(byts[:12]):
            for j in range(8):
                bits[8 * i + j] = (v >> (7 - j)) & 1
        ctx = ctx or DecoderContext()
        P25P1Decoder()._tsbk(
            bits, SimpleNamespace(pos=0, sync=SimpleNamespace(name="x")),
            ctx)
        return ctx, "\n".join(e.line for e in ctx.events)

    ctx, out = run(0x02, [0x40, 0x10, 0x0A, 0x05, 0xDC, 0, 0x30, 0x39])
    assert "CHAN [100A] SG [1500] Source [12345]" in out
    assert any(e.fields.get("grant") for e in ctx.events)
    ctx, out = run(0x00, [0x05, 0xDC, 0x07, 0xD1, 0x07, 0xD2, 0, 0],
                   ctx=shared)
    assert ctx.state.affiliations.patches[1500]["wgids"] == {2001, 2002}
    ctx, out = run(0x01, [0x05, 0xDC, 0x07, 0xD1, 0, 0, 0, 0], ctx=shared)
    assert ctx.state.affiliations.patches[1500]["wgids"] == {2002}
    _, out = run(0x07, [0x84, 0x60, 0, 0, 1, 0, 0x30, 0x39])
    assert "Deny Response" in out and "Site Access Denial" in out
    _, out = run(0x16, [0, 0, 0x10, 0x0A, 0xFF, 0xFF, 0, 0])
    assert "TDMA Data Channel DL [100A]" in out


def test_tsbk_isp_catalog():
    """Protected TSBKs decode as inbound subscriber requests
    (reference tsbk_handle_isp_messages)."""
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder

    def run(op, body, mfid=0):
        bits = np.zeros(96, np.uint8)
        byts = [op | 0x40, mfid] + body    # protect flag set
        for i, v in enumerate(byts[:12]):
            for j in range(8):
                bits[8 * i + j] = (v >> (7 - j)) & 1
        ctx = DecoderContext()
        P25P1Decoder()._tsbk(
            bits, SimpleNamespace(pos=0, sync=SimpleNamespace(name="x")),
            ctx)
        return "\n".join(e.line for e in ctx.events)

    out = run(0x00, [0x40, 0, 0, 0x04, 0xD2, 0, 0x30, 0x39])
    assert ("Group Voice Service Request (ISP protected/inbound)"
            " FM [12345] Group [1234][04D2] SVC [40]") in out
    out = run(0x1F, [0, 0, 0, 0, 7, 0, 0x30, 0x39])
    assert "Call Alert Request (ISP protected/inbound) FM [12345] TO [7]" in out
    # WACN=b3<<12|b4<<4|b5>>4, SYSID=(b5&0xF)<<8|b6 (tsbk_wacn_from_24)
    out = run(0x2C, [0x92, 0x92, 0x06, 0x5A, 0xBC, 0, 0x30, 0x39])
    assert "Unit Registration Request" in out and "WACN [92065]" in out
    assert "SYSID [ABC]" in out
    assert "EMERGENCY [1] CAPABILITY [12]" in out
    out = run(0x37, [0x85, 0x92, 0x06, 0x5A, 0xBC, 0, 0x30, 0x39])
    assert "Roaming Address Response" in out and "WACN [92065]" in out
    assert "MSN [5] FINAL [1]" in out
    out = run(0x18, [0x11, 0x22, 0, 0, 7, 0, 0x30, 0x39])
    assert "Status Update Request" in out
    assert "UNIT STATUS [11] USER STATUS [22]" in out
    out = run(0x1C, [0xBE, 0xEF, 0, 0, 7, 0, 0x30, 0x39])
    assert ("Message Update Request (ISP protected/inbound) FM [12345]"
            " TO [7] SHORT DATA [BEEF]") in out
    out = run(0x27, [0, 0, 0, 0x04, 0xD2, 0, 0x30, 0x39])
    assert "Emergency Alarm Request" in out and "** EMERGENCY **" in out
    out = run(0x3F, [0] * 8)               # unknown protected op
    assert "Unsupported ISP opcode (protected/inbound) OP [3F]" in out
    # protected MFID90 routes to the Moto ISP set, not the OSP catalog
    out = run(0x00, [0x40, 0, 0, 0x04, 0xD2, 0, 0x30, 0x39], mfid=0x90)
    assert ("MFID90 (Moto) Group Regroup Voice Request"
            " (ISP protected/inbound) FM [12345] SG [1234][04D2]"
            " SVC [40]") in out


def test_harris_grg_explicit_encryption_tsbk():
    """Harris A4 regroup command feeds the patch registry with KAS and
    patch/simulselect state (reference tsbk_handle_mfid_a4)."""
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder

    def run(body):
        bits = np.zeros(96, np.uint8)
        byts = [0x30, 0xA4] + body
        for i, v in enumerate(byts[:12]):
            for j in range(8):
                bits[8 * i + j] = (v >> (7 - j)) & 1
        ctx = DecoderContext()
        P25P1Decoder()._tsbk(
            bits, SimpleNamespace(pos=0, sync=SimpleNamespace(name="x")),
            ctx)
        return ctx, "\n".join(e.line for e in ctx.events)

    # TGA=0b011 (patch, WGID form, active), SSN 5
    ctx, out = run([(0b011 << 5) | 5, 0x05, 0xDC, 0x12, 0x34, 0xAA,
                    0x07, 0xD1])
    assert "MFID A4 (Harris) Group Regroup Explicit Encryption" in out
    assert "SG: 1500; KEY ID: 1234;" in out
    assert "ALG: AA; WGID: 2001;" in out and "Patch Active;" in out
    p = ctx.state.affiliations.patches[1500]
    assert p["is_patch"] and p["active"] and 2001 in p["wgids"]
    # KAS stored (reference p25_patch_set_kas)
    assert p["key"] == 0x1234 and p["alg"] == 0xAA and p["ssn"] == 5
    # TGA=0b100 (simulselect, WUID form, inactive)
    ctx, out = run([(0b100 << 5) | 1, 0x05, 0xDC, 0x12, 0x34, 0x00,
                    0x30, 0x39])
    assert "WUID: 12345;" in out and "Simulselect Inactive;" in out
    p = ctx.state.affiliations.patches[1500]
    assert not p["is_patch"] and not p["active"]


def _harris_gps_buf():
    """192-bit Harris GPS buffer: 33.5N 112.25W, 12:34:56 UTC, hdg 90."""
    buf = np.zeros(192, np.uint8)

    def setb(off, width, val):
        for i in range(width):
            buf[off + i] = (val >> (width - 1 - i)) & 1

    setb(0, 16, 0x2AA4)
    setb(57, 7, 30)        # lat min
    setb(64, 8, 33)        # lat deg
    setb(88, 1, 1)         # lon west
    setb(89, 7, 15)        # lon min
    setb(96, 8, 112)       # lon deg
    setb(104, 16, 45296)   # 12:34:56
    setb(135, 9, 90)       # heading
    return buf


def test_harris_gps_two_block_lcw():
    """GPS split across LCW opcodes 0x2A/0x2B (reference
    p25_lcw_dispatch_mfid_a4 + nmea_harris)."""
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder
    buf = _harris_gps_buf()
    dec = P25P1Decoder()
    lcw1 = np.concatenate([buf[0:16], buf[40:96]]).astype(np.uint8)
    lcw2 = np.zeros(72, np.uint8)
    lcw2[0:8] = _bits((0x2B, 8))[:8]
    lcw2[8:16] = _bits((0xA4, 8))[:8]
    lcw2[16:72] = buf[96:152]
    ctx = DecoderContext()
    decode_lcw(lcw1, SimpleNamespace(pos=0), ctx, dec)
    assert "GPS Block 1" in ctx.events[-1].line
    decode_lcw(lcw2, SimpleNamespace(pos=0), ctx, dec)
    out = ctx.events[-1].line
    assert "Harris GPS: 33.500000, -112.250000;" in out
    assert "HEADING: 090;" in out and "TIME: 12:34:56 UTC;" in out
    # block 2 without block 1 on a fresh decoder
    ctx2 = DecoderContext()
    decode_lcw(lcw2, SimpleNamespace(pos=0), ctx2, P25P1Decoder())
    assert "Missing GPS Block 1" in ctx2.events[-1].line


def test_harris_alias_fragments_lcw():
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder
    dec = P25P1Decoder()
    ctx = DecoderContext()

    def frag(op, chunk):
        b = np.zeros(72, np.uint8)
        b[0:8] = _bits((op, 8))[:8]
        b[8:16] = _bits((0xA4, 8))[:8]
        for i, ch in enumerate(chunk):
            for j in range(8):
                b[16 + 8 * i + j] = (ch >> (7 - j)) & 1
        decode_lcw(b, SimpleNamespace(pos=0), ctx, dec)
        return ctx.events[-1].line

    out = frag(0x32, b"ENGINE5")
    assert "Talker Alias Blocks" in out and "ENGINE5" not in out
    out = frag(0x33, b"1\x00\x00\x00\x00\x00\x00")
    assert "Talker Alias: ENGINE51" in out
    # continuation without a fresh block 0 after completion is dropped
    out2 = frag(0x35, b"XXXXXXX")
    assert "Talker Alias:" in out2 or "Alias Blocks" in out2


def test_tait_iso7_alias_lcw():
    # 8 ISO7 chars from bit 16: "TAIT 123"
    vals = [ord(c) for c in "TAIT 123"]
    fields = [(0x00, 8), (0xD8, 8)] + [(v, 7) for v in vals]
    bits = _bits(*fields)
    _, text = _decode(bits)
    assert "MFIDD8 (Tait) Talker Alias: TAIT 123" in text


def test_mfid90_apx_embedded_gps():
    """MFID90 LCW opcode 0x06: APX GPS, lon west as -180 offset
    (reference apx_embedded_gps)."""
    lat_units = round(33.5 / (90.0 / 0x7FFFFF))
    lon_units = round((112.25 - 180.0 + 180.0) / (180.0 / 0x7FFFFF))
    # encode 67.75 raw so west offset yields -112.25
    lon_units = round(67.75 / (180.0 / 0x7FFFFF))
    bits = _bits((0x06, 8), (0x90, 8), (0, 8),
                 (0, 1),              # lat sign north... bit 24
                 (lat_units, 23),
                 (1, 1),              # lon west
                 (lon_units, 23))
    _, text = _decode(bits)
    assert "MFID90 (Moto) GPS: Lat: 33.50000N" in text
    assert "Lon: -112.2500" in text and "W (" in text
    assert "Current Fix;" in text
