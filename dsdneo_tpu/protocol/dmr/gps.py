"""DMR embedded GPS (FLCO 0x08) decode.

Bit layout + scaling per reference src/core/gps/dsd_gps.c
dmr_embedded_gps: pos_err at bits 20-22, lon sign+24 bits at 23-47
(unit 360/2^25), lat sign+23 bits at 48-71 (unit 180/2^24), two's
complement signs.
"""

from __future__ import annotations

import numpy as np


def _bti(bits) -> int:
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def decode_embedded_gps(lc_bits: np.ndarray) -> str:
    b = np.asarray(lc_bits, dtype=np.uint8)
    pos_err = _bti(b[20:23])
    lon_sign = int(b[23])
    lon = _bti(b[24:48])
    lat_sign = int(b[48])
    lat = _bti(b[49:72])
    latstr, lonstr = "N", "E"
    lat_sf = lon_sf = 1.0
    if lat_sign:
        lat = 0x800000 - lat
        latstr, lat_sf = "S", -1.0
    if lon_sign:
        lon = 0x1000000 - lon
        lonstr, lon_sf = "W", -1.0
    latitude = lat * (180.0 / 16777216.0)
    longitude = lon * (360.0 / 33554432.0)
    if pos_err <= 0x5:
        err = f" Err: {2 * 10 ** pos_err}m"
    elif pos_err == 0x6:
        err = " Err: >200km"
    else:
        err = " Unknown Pos Err"
    return (f"Embedded GPS: {latitude:.5f}{latstr}"
            f" {longitude:.5f}{lonstr}{err}")
