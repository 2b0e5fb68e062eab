"""Status-doc truth gate.

BASELINE.md's "Measured" table must agree with the driver-captured
BENCH_r{N}.json files — the docs drifted from the measurements in
rounds 1-3, so the agreement is now enforced structurally: every
numeric cell in the measured table whose row maps to a BENCH json key
must equal that json's value for the corresponding round.
"""

import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

# row-label substring -> BENCH json key
ROW_KEYS = {
    "fused audio-s/s/chip": "value",
    "forward-only bf16": "forward_bf16_audio_s_per_s",
    "forward-only f32": "forward_f32_audio_s_per_s",
    "decode-only": "decode_audio_s_per_s",
    "forward TFLOP/s (bf16)": "forward_tflops_bf16",
    "train lstm step ms bf16 pallas": "train_lstm_step_ms_bf16_pallas",
    "train lstm MFU bf16 pallas": "train_lstm_mfu_bf16_pallas",
    "train ff step ms bf16": "train_ff_step_ms_bf16",
    "vs reference-style": "vs_baseline",
}


def _bench_values():
    out = {}
    for f in sorted(REPO.glob("BENCH_r*.json")):
        n = int(re.search(r"BENCH_r(\d+)", f.name).group(1))
        d = json.loads(f.read_text())
        out[n] = d.get("parsed", d)
    return out


def _measured_table():
    """-> {row_label: {round: cell_text}} from the Measured section."""
    text = (REPO / "BASELINE.md").read_text()
    m = re.search(r"## Measured.*?(?=\n## |\Z)", text, re.S)
    assert m, "BASELINE.md lost its '## Measured' section"
    lines = [l for l in m.group(0).splitlines() if l.startswith("|")]
    header = [c.strip() for c in lines[0].strip("|").split("|")]
    rounds = {}
    for i, col in enumerate(header):
        cm = re.fullmatch(r"r0?(\d+)", col.strip())
        if cm:
            rounds[i] = int(cm.group(1))
    assert rounds, "measured table has no rNN columns"
    rows = {}
    for line in lines[2:]:
        cells = [c.strip() for c in line.strip("|").split("|")]
        rows[cells[0]] = {rounds[i]: cells[i] for i in rounds if
                          i < len(cells)}
    return rows


def _cell_number(cell):
    """Numeric value of a table cell, or None if non-numeric."""
    cleaned = cell.replace("**", "").replace("~", "").rstrip("x").strip()
    try:
        return float(cleaned)
    except ValueError:
        return None


def test_measured_table_matches_bench_json():
    bench = _bench_values()
    if not bench:
        pytest.skip("no BENCH_r*.json captured yet")
    rows = _measured_table()
    checked = 0
    errors = []
    for label, cells in rows.items():
        key = next((v for k, v in ROW_KEYS.items() if k in label), None)
        if key is None:
            continue
        for rnd, cell in cells.items():
            doc = _cell_number(cell)
            got = bench.get(rnd, {}).get(key)
            if doc is None or got is None:
                continue
            checked += 1
            if abs(doc - float(got)) > max(0.05, abs(float(got)) * 1e-3):
                errors.append(
                    f"row '{label}' r{rnd:02d}: BASELINE.md says {doc}, "
                    f"BENCH_r{rnd:02d}.json says {got}")
    assert checked >= 6, "truth gate matched too few cells — table reshaped?"
    assert not errors, "\n".join(errors)


def test_measured_table_has_column_per_captured_round():
    """A BENCH_r{N}.json without a matching rNN table column let r04's
    numbers live only in prose — the gate now REQUIRES one column per
    captured round so a missing round fails instead of passing
    silently."""
    bench = _bench_values()
    if not bench:
        pytest.skip("no BENCH_r*.json captured yet")
    rows = _measured_table()
    table_rounds = set()
    for cells in rows.values():
        table_rounds.update(cells.keys())
    missing = sorted(set(bench) - table_rounds)
    assert not missing, (
        f"BENCH_r*.json captured for rounds {missing} but BASELINE.md's "
        f"measured table has no matching rNN column")
    # and each captured round must have at least a few checkable cells
    for rnd in bench:
        n = sum(1 for label, cells in rows.items()
                if any(k in label for k in ROW_KEYS)
                and _cell_number(cells.get(rnd, "")) is not None)
        assert n >= 3, f"round r{rnd:02d} column has only {n} numeric cells"


def test_no_dangling_roofline_citation():
    """ops/rnn_pallas.py cites 'BASELINE.md roofline'; the section must
    exist."""
    src = (REPO / "nnacousticmodeling_tpu" / "ops" / "rnn_pallas.py")
    if "BASELINE.md roofline" in src.read_text():
        assert "## Roofline" in (REPO / "BASELINE.md").read_text()
