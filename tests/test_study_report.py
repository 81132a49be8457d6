"""Unit tests for tools/study_report.py (paired seed-study reporting).

Pure-python: no JAX, no device. Guards the pairing rules the QUALITY.md
verdicts depend on — seed-keyed pairing (not positional), unpaired-seed
exclusion with a visible note, last-record-wins on re-runs, and the
direction convention for lower-is-better metrics.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import study_report  # noqa: E402


def _write(tmp_path, rows):
    p = tmp_path / "results.jsonl"
    p.write_text("".join(json.dumps(r) + "\n" for r in rows))
    return str(p)


def _row(tag, seed, variant="final", **m):
    base = {"edge_f1": 0.8, "wed": 0.4, "corner_f1": 0.5, "aco": 0.2}
    base.update(m)
    return {"tag": tag, "seed": seed, "variant": variant, **base}


def test_by_seed_last_record_wins(tmp_path):
    rows = study_report.load_rows(_write(tmp_path, [
        _row("a", 0, edge_f1=0.1),
        _row("a", 0, edge_f1=0.9),
    ]))
    recs = study_report.by_seed(rows, "a", "final")
    assert recs[0]["edge_f1"] == 0.9


def test_selector_defaults_to_final():
    assert study_report.parse_selector("tag") == ("tag", "final")
    assert study_report.parse_selector("tag:ema") == ("tag", "ema")


def test_paired_deltas_keyed_by_seed_not_position(tmp_path):
    # Control has seeds 0,1; treatment has seeds 1,0 recorded in the
    # opposite order plus an unpaired seed 2.
    rows = study_report.load_rows(_write(tmp_path, [
        _row("ctl", 0, edge_f1=0.5),
        _row("ctl", 1, edge_f1=0.7),
        _row("trt", 1, edge_f1=0.8),
        _row("trt", 0, edge_f1=0.4),
        _row("trt", 2, edge_f1=0.99),
    ]))
    out = "\n".join(study_report.paired_table(
        rows, ("ctl", "final"), [("trt", "final")]))
    # seed 0: 0.4-0.5=-0.1, seed 1: 0.8-0.7=+0.1 -> mean 0, 1/2 better.
    assert "-0.100/+0.100" in out
    assert "| 1/2 |" in out
    assert "seeds [2] unpaired" in out


def test_lower_is_better_direction(tmp_path):
    # WED down on both seeds => 2/2 better even though deltas are negative.
    rows = study_report.load_rows(_write(tmp_path, [
        _row("ctl", 0, wed=0.5), _row("ctl", 1, wed=0.5),
        _row("trt", 0, wed=0.3), _row("trt", 1, wed=0.4),
    ]))
    out = "\n".join(study_report.paired_table(
        rows, ("ctl", "final"), [("trt", "final")]))
    wed_line = [l for l in out.splitlines() if "| WED |" in l][0]
    assert "| 2/2 |" in wed_line
    assert "-0.200/-0.100" in wed_line


def test_summary_single_seed_no_std(tmp_path):
    rows = study_report.load_rows(_write(tmp_path, [_row("a", 0)]))
    out = "\n".join(study_report.summary_table(rows, [("a", "final")]))
    assert "0.800" in out and "±" not in out.split("\n")[-1]


def test_main_end_to_end(tmp_path, capsys):
    path = _write(tmp_path, [
        _row("ctl", 0), _row("ctl", 1),
        _row("trt", 0, edge_f1=0.9, variant="ema"),
        _row("trt", 1, edge_f1=0.9, variant="ema"),
    ])
    rc = study_report.main([
        "--results", path, "--control", "ctl", "--tags", "trt:ema"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "| ctl (final) | 2 |" in out
    assert "| trt (ema) | 2 |" in out
    assert "+0.100/+0.100" in out
