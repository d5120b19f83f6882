"""EDACS Extended Addressing (EA) mode + ESK scramble (constructed
28-bit message pairs; layouts per reference edacs-fme.c
edacs_handle_extended_mt1/mt2)."""

import numpy as np

from dsdneo_tpu.protocol.base import DecoderContext, DibitReader
from dsdneo_tpu.protocol.edacs.decoder import EdacsDecoder, edacs_bch_encode
from dsdneo_tpu.symbols import framesync


def _frame_dibits(msg1_28, msg2_28, esk=0):
    """Build the 240-dibit EDACS frame: each 40-bit word 3x with the
    middle copy inverted (decoder majority-votes them back)."""
    if esk:
        msg1_28 ^= (esk & 0xFF) << 20
        msg2_28 ^= (esk & 0xFF) << 20
    w1 = edacs_bch_encode(msg1_28)
    w2 = edacs_bch_encode(msg2_28)
    bits = []
    for w in (w1, (~w1) & 0xFFFFFFFFFF, w1, w2, (~w2) & 0xFFFFFFFFFF, w2):
        bits.extend((w >> (39 - i)) & 1 for i in range(40))
    # 2-level mapping used by the decoder: dibit>>1 = bit
    return np.array([3 if b else 1 for b in bits], dtype=np.uint8)


def _decode(msg1, msg2, ea=True, esk=0):
    sync_def = next(d for d in framesync.SYNC_DEFS
                    if d.protocol == "edacs" and not d.inverted)
    sync_d = np.array([1 if c == "1" else 3 for c in sync_def.pattern],
                      dtype=np.uint8)
    stream = np.concatenate([sync_d, _frame_dibits(msg1, msg2, esk)])
    lv = np.array([0.0, 3.0, 0.0, -3.0], dtype=np.float32)
    hits = framesync.find_syncs(lv[stream], [sync_def], threshold=0.85)
    assert hits, "no sync"
    ctx = DecoderContext()
    ctx.state.edacs_ea = ea
    ctx.state.edacs_esk = esk
    r = DibitReader(stream, lv[stream], pos=hits[0].end,
                    frame_start=hits[0].pos, invert=False)
    EdacsDecoder().handle(r, hits[0], ctx)
    return ctx, "\n".join(e.line for e in ctx.events)


def test_ea_digital_group_call_grant():
    # MT1 0x03 digital group call: LCN 7, group 1234, src 54321, emergency
    msg1 = (0x03 << 23) | (7 << 17) | 1234
    msg2 = (1 << 20) | 54321
    ctx, text = _decode(msg1, msg2)
    assert "Digital Group Call Assignment" in text
    assert "Group [01234] Source [00054321] LCN [07]" in text
    assert "[EMERGENCY]" in text and "[Message Trunking]" in text
    ev = [e for e in ctx.events if e.fields.get("grant")]
    assert ev and ev[0].fields["tg"] == 1234 and ev[0].fields["lpcn"] == 7


def test_ea_site_id():
    # MT1 0x1F / MT2 0xA: site 0x62 (via split field), area 5
    site = 0x62
    msg1 = (0x1F << 23) | (0xA << 19) | (((site >> 5) & 0x7) << 12) \
        | (5 << 5) | (site & 0x1F)
    ctx, text = _decode(msg1, 0)
    assert "Extended Addressing :: Site ID [62][098]" in text
    assert "Area [05]" in text
    assert ctx.state.p2_siteid == site


def test_ea_adjacent_and_system_info():
    msg1 = (0x1F << 23) | (0x1 << 19) | (9 << 12) | (2 << 8) | 0x14
    _, text = _decode(msg1, 0)
    assert "Adjacent Site :: Site ID [14][020] Index [2] on CC LCN [09]" in text
    msg1 = (0x1F << 23) | (0x8 << 19) | 0xBEEF
    ctx, text = _decode(msg1, 0x11)
    assert "System Information :: System ID [BEEF] CC LCN [17]" in text
    assert ctx.state.edacs_sysid == 0xBEEF


def test_esk_mask_applied():
    """The same OTA words decode only with the right ESK mask."""
    msg1 = (0x03 << 23) | (3 << 17) | 42
    msg2 = 777
    _, text = _decode(msg1, msg2, esk=0xA5)
    assert "Group [00042]" in text
    # wrong mask scrambles the command type
    sync_def = next(d for d in framesync.SYNC_DEFS
                    if d.protocol == "edacs" and not d.inverted)
    sync_d = np.array([1 if c == "1" else 3 for c in sync_def.pattern],
                      dtype=np.uint8)
    stream = np.concatenate([sync_d, _frame_dibits(msg1, msg2, esk=0xA5)])
    lv = np.array([0.0, 3.0, 0.0, -3.0], dtype=np.float32)
    hits = framesync.find_syncs(lv[stream], [sync_def], threshold=0.85)
    ctx = DecoderContext()
    ctx.state.edacs_ea = True
    ctx.state.edacs_esk = 0      # mask not applied
    r = DibitReader(stream, lv[stream], pos=hits[0].end,
                    frame_start=hits[0].pos, invert=False)
    EdacsDecoder().handle(r, hits[0], ctx)
    wrong = "\n".join(e.line for e in ctx.events)
    assert "Group [00042]" not in wrong


def test_standard_mode_regression():
    """ea flag off → the standard-mode catalog still runs."""
    msg1 = (0x7 << 25) | (0x7 << 22) | (0x08 << 17) | (9 << 12) | (1 << 9) | 2
    ctx, text = _decode(msg1, 0, ea=False)
    assert "Standard/Networked :: Site ID [02][002]" in text


def test_standard_voice_grant_emits_trunk_event():
    # MT-A 1 (analog, emergency): LCN 9 @ msg1[16:12], LID split across
    # msg1[24:18] | msg2[23:17] (reference field extraction)
    lid = 0x1234
    msg1 = (0x1 << 25) | ((lid >> 7) << 18) | (9 << 12) | 123
    msg2 = (lid & 0x7F) << 17
    ctx, text = _decode(msg1, msg2, ea=False)
    assert ("Voice Group Channel Assignment :: Analog Group [0123]"
            f" LID [{lid:05d}] LCN [09]") in text
    assert "[EMERGENCY]" in text
    # group 123 = 0b00011111011: fleet+subfleet bits nonzero, subfleet
    # nonzero -> neither Agency nor Fleet scope (edacs-fme.c:141-152)
    assert "[Agency]" not in text and "[Fleet]" not in text
    # tx-trunk bit (msg1[11]) clear -> Message Trunking tag
    assert "[Message Trunking]" in text
    ev = [e for e in ctx.events if e.fields.get("grant")]
    assert ev and ev[0].fields["tg"] == 123 and ev[0].fields["lpcn"] == 9
    assert ev[0].fields["src"] == lid and ev[0].fields["emergency"]
