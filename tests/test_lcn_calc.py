"""DMR Tier III one-shot LCN calculator (reference oneshot_dmr_t3.c)."""

import io
import subprocess
import sys

from dsdneo_tpu.engine.lcn_calc import (calc_dmr_t3_lcn, infer_step_125,
                                        parse_frequency_hz)


def test_parse_frequency_variants():
    assert parse_frequency_hz("451.2375\n") == 451237500   # MHz
    # first numeric token wins (reference strtod-from-first-digit):
    assert parse_frequency_hz("chan 3, 460012500, site A") == 3000000
    assert parse_frequency_hz("460012500, site A") == 460012500
    assert parse_frequency_hz("# comment only") is None
    assert parse_frequency_hz("no digits here") is None
    assert parse_frequency_hz("-4.5") is None              # hz <= 0


def test_infer_step_snaps_to_125():
    # 12.5 kHz spacing with a little jitter on one row
    assert infer_step_125([451000000, 451012400, 451025000]) == 12375
    assert infer_step_125([451000000, 451012500, 451037500]) == 12500
    assert infer_step_125([451000000]) == 0


def _run(tmp_path, rows, **kw):
    p = tmp_path / "freqs.csv"
    p.write_text("\n".join(rows) + "\n")
    out = io.StringIO()
    rc = calc_dmr_t3_lcn(str(p), out=out, **kw)
    return rc, out.getvalue().strip().splitlines()


def test_basic_mapping(tmp_path):
    rc, lines = _run(tmp_path, ["451.0125", "451.0000", "451.0250",
                                "451.0000"])  # dup + unsorted
    assert rc == 0
    assert lines[0] == "lcn,freq"
    assert lines[1:] == ["1,451000000", "2,451012500", "3,451025000"]


def test_start_lcn_and_gap(tmp_path):
    # missing middle channel -> LCN skips with it (step stays 12.5 kHz)
    rc, lines = _run(tmp_path, ["460.000", "460.0125", "460.0375"],
                     start_lcn=5)
    assert rc == 0
    assert lines[1:] == ["5,460000000", "6,460012500", "8,460037500"]


def test_cc_anchor_alignment(tmp_path):
    # anchor: 451.025 MHz is LCN 10 -> 451.000 becomes LCN 8
    rc, lines = _run(tmp_path, ["451.000", "451.0125", "451.025"],
                     cc_freq_hz=451025000, cc_lcn=10)
    assert rc == 0
    assert lines[1:] == ["8,451000000", "9,451012500", "10,451025000"]


def test_explicit_step_overrides(tmp_path):
    rc, lines = _run(tmp_path, ["451.000", "451.050"], step_hz=25000)
    assert rc == 0
    assert lines[1:] == ["1,451000000", "3,451050000"]


def test_single_frequency(tmp_path):
    rc, lines = _run(tmp_path, ["146.52"])
    assert rc == 0
    assert lines == ["lcn,freq", "1,146520000"]


def test_error_codes(tmp_path):
    rc = calc_dmr_t3_lcn(str(tmp_path / "missing.csv"), out=io.StringIO())
    assert rc == 1
    rc, _ = _run(tmp_path, ["# nothing numeric"])
    assert rc == 2


def test_cli_one_shot(tmp_path):
    p = tmp_path / "f.csv"
    p.write_text("451.000\n451.0125\n")
    r = subprocess.run(
        [sys.executable, "-m", "dsdneo_tpu", "--calc-lcn", str(p),
         "--calc-cc-freq", "451.0125", "--calc-cc-lcn", "2"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0
    assert r.stdout.strip().splitlines() == [
        "lcn,freq", "1,451000000", "2,451012500"]
