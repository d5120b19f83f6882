"""DMR Tier III CSBK catalog: grants, C_MOVE, C_ALOHA syscode models,
C_AHOY, acks, C_BCAST announcement types, Cap+/Con+ vendor CSBKs
(constructed 96-bit CSBKs; layouts per reference dmr_csbk.c)."""

from types import SimpleNamespace

import numpy as np

from dsdneo_tpu.protocol.base import DecoderContext
from dsdneo_tpu.protocol.dmr.csbk import decode_csbk


def _csbk(op, fid=0, fields=(), bytes_=None):
    bits = np.zeros(96, dtype=np.uint8)
    bits[0] = 1                                   # LB
    for i in range(6):
        bits[2 + i] = (op >> (5 - i)) & 1
    for i in range(8):
        bits[8 + i] = (fid >> (7 - i)) & 1
    for at, v, n in fields:
        for i in range(n):
            bits[at + i] = (v >> (n - 1 - i)) & 1
    if bytes_ is not None:
        for bi, v in bytes_:
            for i in range(8):
                bits[8 * bi + i] = (v >> (7 - i)) & 1
    return bits


def _run(bits, ms_sync=False, ctx=None):
    ctx = ctx or DecoderContext()
    text = decode_csbk(bits, ctx, hit=SimpleNamespace(pos=0), ms_sync=ms_sync)
    return text, ctx


def test_tv_grant_emits_trunk_event():
    bits = _csbk(49, fields=[(16, 0x00A, 12), (28, 1, 1), (30, 1, 1),
                             (32, 123, 24), (56, 456, 24)])
    text, ctx = _run(bits)
    assert "Talkgroup Voice Channel Grant (TV_GRANT)" in text
    assert "LPCN: 0010; TS: 2;" in text
    assert "Emergency;" in text
    ev = [e for e in ctx.events if e.fields.get("grant")]
    assert ev and ev[0].fields["tg"] == 123 and ev[0].fields["lpcn"] == 0x00A
    assert ev[0].fields["slot_sel"] == 1 and not ev[0].fields["data"]
    assert ctx.state.last_tg == 123


def test_td_grant_is_data_call():
    bits = _csbk(52, fields=[(16, 5, 12), (32, 9, 24), (56, 7, 24)])
    text, ctx = _run(bits)
    assert "Talkgroup Data Channel Grant" in text
    assert [e for e in ctx.events if e.fields.get("data")]


def test_bs_dwn_act_on_ms_sync():
    bits = _csbk(56, fields=[(32, 11, 24), (56, 22, 24)])
    text, _ = _run(bits, ms_sync=True)
    assert "BS Outbound Activation (BS_Dwn_Act)" in text
    assert "Target [11] - Source [22]" in text


def test_c_move():
    bits = _csbk(57, fields=[(16, 0x123, 12), (28, 0, 1),
                             (32, 99, 24), (56, 88, 24)])
    text, ctx = _run(bits)
    assert "Move (C_MOVE) LPCN: 0291; TS: 1;" in text
    assert [e for e in ctx.events if e.fields.get("grant")]


def test_aloha_syscode_models():
    # Large model (2): net 4 bits, site 8 bits
    sys14 = (2 << 12) | (0x5 << 8) | 0x27      # model 2, net 5, site 0x27
    bits = _csbk(25, fields=[(19, 3, 3), (36, 0x9, 4), (40, sys14, 14),
                             (35, 1, 1)])
    text, ctx = _run(bits)
    assert "C_ALOHA_SYS_PARMS: Large; Net ID: 5; Site ID: 39;" in text
    assert f"SYS: {sys14:04X};" in text
    assert "Ver: 3;" in text and "Reg Required;" in text and "Backoff: 9;" in text
    assert ctx.state.dmr_t3_syscode == sys14
    # Tiny model (0): net 9 bits, site 3 bits
    sys14 = (0 << 12) | (17 << 3) | 5
    bits = _csbk(25, fields=[(40, sys14, 14)])
    text, _ = _run(bits)
    assert "Tiny; Net ID: 17; Site ID: 5;" in text


def test_aloha_capmax_branding():
    bits = _csbk(25, fid=0x10, fields=[(40, 0x1234, 14)])
    text, _ = _run(bits)
    assert "Capacity Max" in text


def test_c_ahoy_service_kind():
    bits = _csbk(28, fields=[(16, 0x22, 7), (25, 1, 1), (28, 14, 4),
                             (32, 3100, 24), (56, 0xFFFEC6, 24)])
    text, _ = _run(bits)
    assert "C_AHOY - Group" in text
    assert "Registration/Authentication" in text
    assert "REGI;" in text                     # gateway identifier label


def test_ack_family():
    bits = _csbk(32, fields=[(16, 0x11, 7), (23, 0x60, 8),
                             (32, 5, 24), (56, 6, 24)])
    text, _ = _run(bits)
    assert "C_ACKD Outbound TSCC" in text
    assert "Response: 11; Reason: 60;" in text


def test_p_clear_releases():
    text, ctx = _run(_csbk(46))
    assert "Clear (P_CLEAR)" in text
    assert [e for e in ctx.events if e.fields.get("release")]


def test_c_bcast_ann_wd():
    bits = _csbk(40, fields=[(16, 0, 5), (21, (0x3 << 6) | (0x1 << 2), 14),
                             (40, 0x2AAA, 14), (56, (100 << 12) | 200, 24)])
    text, ctx = _run(bits)
    assert "Announce/Withdraw TSCC (Ann_WD_TSCC)" in text
    assert "LPCN CH1: 100;" in text and "LPCN CH2: 200;" in text
    nb = [e for e in ctx.events if e.fields.get("neighbors")]
    assert nb and nb[0].fields["neighbors"] == [100, 200]


def test_c_bcast_local_time():
    # day 14, month 7; 13:37:42 UTC, Thursday
    bp1 = (14 << 9) | (7 << 5) | (15 << 1)
    bp2 = (13 << 19) | (37 << 13) | (42 << 7) | (5 << 4)
    bits = _csbk(40, fields=[(16, 3, 5), (21, bp1, 14), (56, bp2, 24)])
    text, _ = _run(bits)
    assert "Broadcast Local Time (Local_Time)" in text
    assert "Date: 7.14;" in text and "Thursday;" in text
    assert "UTC Time: 13:37:42;" in text


def test_c_bcast_call_timers():
    bp1 = (120 << 5) | 9
    bp2 = (300 << 12) | 500
    bits = _csbk(40, fields=[(16, 1, 5), (21, bp1, 14), (56, bp2, 24)])
    text, _ = _run(bits)
    assert "Timers - Emergency: 120; Packet: 9; MS-MS: 300; Line: 500;" in text


def test_c_bcast_adjacent_site():
    sys14 = (1 << 12) | (0x11 << 5) | 7        # Small: net 17, site 7
    bp2 = (1 << 23) | (1 << 22) | (2 << 19) | (3 << 16) | 160
    bits = _csbk(40, fields=[(16, 6, 5), (21, sys14, 14), (56, bp2, 24)])
    text, ctx = _run(bits)
    assert "Adjacent Site Information" in text
    assert "Small; Net ID: 17; Site ID: 7;" in text
    assert "Online; CC Pri: 2; AC Pri: 3; LPCN: 160;" in text
    assert [e for e in ctx.events if e.fields.get("neighbors") == [160]]


def test_cap_plus_adjacent_and_status():
    bits = _csbk(0x3B, fid=0x10,
                 bytes_=[(4, (2 << 4) | 7), (5, (3 << 4) | 9)])
    text, ctx = _run(bits)
    assert "Capacity Plus Adjacent Sites" in text
    assert "Site: 2 Rest: 7;" in text and "Site: 3 Rest: 9;" in text
    bits = _csbk(0x3E, fid=0x10, fields=[(16, 3, 2), (20, 5, 4),
                                         (24, 0b10100000, 8)])
    text, ctx = _run(bits)
    assert "Capacity Plus Channel Status" in text
    assert "Rest LSN: 5" in text and "Single Block" in text
    assert "Active LSNs: 1 3" in text
    assert ctx.state.dmr_rest_channel == 5


def test_con_plus_voice_grant():
    bits = _csbk(0x03, fid=0x06,
                 bytes_=[(2, 0), (3, 0x30), (4, 0x39),       # src 12345
                         (5, 0), (6, 0x01), (7, 0x2C),       # grp 300
                         (8, (7 << 4) | (1 << 3)), (9, 2)])  # lcn 7 ts 2
    text, ctx = _run(bits)
    assert "Connect Plus Group Voice Channel Grant" in text
    assert "Target: 300; Source: 12345; LCN: 7; TS: 2;" in text
    ev = [e for e in ctx.events if e.fields.get("grant")]
    assert ev and ev[0].fields["lpcn"] == 7 and ev[0].fields["slot_sel"] == 1
    assert ctx.state.dmr_branding == "Motorola Con+"


def test_con_plus_termination_release():
    text, ctx = _run(_csbk(0x0C, fid=0x06))
    assert "Connect Plus Call Termination" in text
    assert [e for e in ctx.events if e.fields.get("release")]


def test_preamble():
    bits = _csbk(61, fields=[(16, 1, 1), (17, 1, 1), (24, 4, 8),
                             (32, 777, 24), (56, 888, 24)])
    text, _ = _run(bits)
    assert "Preamble CSBK - Data - Group - Blocks: 4;" in text


def test_vlc_header_flco_service_options():
    """VLC header dispatches through the FLCO catalog: vendor branding
    + service options (reference dmr_flco.c print_service_options)."""
    from dsdneo_tpu.fec import rs as rsmod
    from dsdneo_tpu.protocol.dmr.bs import DmrBsDecoder

    dec = DmrBsDecoder()
    ctx = DecoderContext()
    code = rsmod.rs_12_9()
    # FLCO 0 group, FID 0x10 (Cap+), SO = emergency | priority 2
    data = np.array([0x00, 0x10, 0x82, 0, 0x01, 0x2C, 0, 0x30, 0x39],
                    dtype=np.int64)
    full = code.encode(data)
    full[9:12] ^= 0x96
    bits96 = np.zeros(96, np.uint8)
    for i in range(12):
        for j in range(8):
            bits96[8 * i + j] = (int(full[i]) >> (7 - j)) & 1
    out = dec._vlc_header(bits96, ctx, SimpleNamespace(pos=0), 0)
    assert "VLC Group TGT=300 SRC=12345" in out
    line = ctx.events[-1].line
    assert "Cap+" in line and "Emergency" in line and "Priority 2" in line
    assert ctx.events[-1].fields.get("emergency")


def test_tlc_emits_release():
    from dsdneo_tpu.fec import rs as rsmod
    from dsdneo_tpu.protocol.dmr.bs import DmrBsDecoder

    dec = DmrBsDecoder()
    ctx = DecoderContext()
    code = rsmod.rs_12_9()
    data = np.array([0x00, 0, 0, 0, 0, 5, 0, 0, 9], dtype=np.int64)
    full = code.encode(data)
    full[9:12] ^= 0x96
    bits96 = np.zeros(96, np.uint8)
    for i in range(12):
        for j in range(8):
            bits96[8 * i + j] = (int(full[i]) >> (7 - j)) & 1
    out = dec._tlc(bits96, ctx, SimpleNamespace(pos=0), 1)
    assert "TLC Group" in out
    assert any(e.fields.get("release") for e in ctx.events)


def test_hytera_xpt_site_status():
    bits = _csbk(0x0A, fid=0x68, fields=[(0, 1, 2), (16, 5, 4),
                                         (20, 3, 2), (22, 2, 2),
                                         (32, 101, 8), (40, 55, 8)])
    text, ctx = _run(bits)
    assert "Hytera XPT Site Status - Free LCN: 5 SN: 1" in text
    assert "LSN 07: ST-3 101 Group;" in text
    assert "LSN 08: ST-2 055 Private;" in text
    assert ctx.state.dmr_branding == "Hytera XPT"
    ev = [e for e in ctx.events if e.fields.get("grant")]
    assert len(ev) == 2 and ev[0].fields["tg"] == 101


def test_hytera_xpt_adjacent():
    bits = _csbk(0x0B, fid=0x68, fields=[(16, 3, 5), (24, 7, 4),
                                         (32, 4, 5), (40, 2, 4)])
    text, _ = _run(bits)
    assert "XPT Adjacent" in text
    assert "Site:3 Free:7;" in text and "Site:4 Free:2;" in text


def _mbc_decode(header96, cont96, ctx=None):
    """Drive the per-slot MBC assembly: `cont96` is the continuation
    block verbatim (LB at bit 0, CRC filled over the first 80 bits)."""
    from dsdneo_tpu.fec import crc as crcmod
    from dsdneo_tpu.protocol.dmr.bs import DmrBsDecoder

    dec = DmrBsDecoder()
    ctx = ctx or DecoderContext()
    dec.mbc[0] = [header96]
    cont = np.asarray(cont96, dtype=np.uint8).copy()
    cont[0] = 1                               # LB
    c = crcmod.crc16_bits(cont[:80], init=0x0000, xorout=0xFFFF)
    for i in range(16):
        cont[80 + i] = (c >> (15 - i)) & 1
    out = dec._mbc_continuation(cont, ctx, SimpleNamespace(pos=0), 0, False)
    return out, ctx


def test_mbc_c_bcast_chan_freq_absolute():
    """Aggregated MBC C_BCAST Chan_Freq resolves the absolute RX/TX
    frequencies from the CDEF appendix and learns the channel map
    (a_channel in bparms2 low 12 bits selects the LPCN)."""
    hdr = _csbk(40, fields=[(16, 5, 5), (56, 160 << 12 | 160, 24)])
    # CDEF bits live at aggregate offsets 112+: header contributes
    # bits 0-95, continuation payload starts at 96
    agg = np.zeros(176, dtype=np.uint8)

    def put(v, a, n):
        for i in range(n):
            agg[a + i] = (v >> (n - 1 - i)) & 1

    put(0, 112, 4)                   # CDEFTYPE 0
    put(160, 118, 12)                # LPCN
    put(451, 130, 10)                # TX 451 MHz
    put(2500, 140, 13)               # + 312500 Hz
    put(456, 153, 10)                # RX 456 MHz
    put(2550, 163, 13)               # + 318750 Hz
    cont = np.zeros(96, dtype=np.uint8)
    cont[:80] = agg[96:176]
    out, ctx = _mbc_decode(hdr, cont)
    assert "MBC" in out
    assert "RX Freq: 456318750" in out and "TX Freq: 451312500" in out


def test_mbc_c_move_absolute_freq_learns_map():
    from dsdneo_tpu.engine.trunk import ChannelMap
    hdr = _csbk(57, fields=[(16, 0xFFF, 12), (32, 99, 24), (56, 88, 24)])
    agg = np.zeros(176, dtype=np.uint8)

    def put(v, a, n):
        for i in range(n):
            agg[a + i] = (v >> (n - 1 - i)) & 1

    put(0, 112, 4)
    put(21, 118, 12)
    put(456, 153, 10)
    put(2550, 163, 13)
    ctx = DecoderContext()
    cm = ChannelMap()
    ctx.state.chan_map = cm
    cont = np.zeros(96, dtype=np.uint8)
    cont[:80] = agg[96:176]
    out, ctx = _mbc_decode(hdr, cont, ctx=ctx)
    assert "Move (C_MOVE) LPCN: 0021" in out
    assert "RX Freq: 456318750" in out
    assert cm.freq(21) == 456318750.0


def test_mbc_crc_gate():
    hdr = _csbk(40, fields=[(16, 5, 5)])
    from dsdneo_tpu.protocol.dmr.bs import DmrBsDecoder
    dec = DmrBsDecoder()
    ctx = DecoderContext()
    dec.mbc[0] = [hdr]
    cont = np.zeros(96, dtype=np.uint8)
    cont[0] = 1
    cont[40] = 1                     # payload bit with a wrong CRC
    out = dec._mbc_continuation(cont, ctx, SimpleNamespace(pos=0), 0, False)
    assert "MBC CRC ERR" in out
