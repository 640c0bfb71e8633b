"""DSB15 DICOM→NIfTI CLI (component #14): the walk / ``sax*`` series
discovery / 'validate'→'valid' split mapping / per-series output layout
around the ``dcm2niix`` subprocess, exercised with a FAKE ``dcm2niix`` on
PATH (the real binary is an external dependency absent here — pinned the
same way in the reference's env.yml).

Reference contract: ``/root/reference/src/dsb15_dicom2nifty.py:14-32`` —
splits train/validate/test, ``dir.glob("*/sax*")`` per patient, output
``<out>/<split>/<patient>/<series>``, and the dcm2niix invocation
``-t y -s n -m y -b y -ba n -z y -f %d``.
"""
import os
import stat
import sys
from pathlib import Path

import pytest

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
    dsb15_dicom2nifty,
)


def _make_dsb15_dicom_tree(root: Path) -> Path:
    """train/validate/test patients with study/sax_* series (plus decoys:
    a non-sax series, a loose file in the split dir, a loose file at the
    study level that matches */sax* only if glob were wrong)."""
    data = root / "dsb15"
    for split, patients in {
        "train": ["1", "2"],
        "validate": ["501"],
        "test": ["701"],
    }.items():
        for pid in patients:
            study = data / split / pid / "study"
            for series in ("sax_5", "sax_20"):
                d = study / series
                d.mkdir(parents=True)
                (d / "IM-0001-0001.dcm").write_bytes(b"\x00" * 16)
            (study / "2ch_10").mkdir()  # non-sax series: must be skipped
            (study / "2ch_10" / "IM-0001-0001.dcm").write_bytes(b"\x00" * 16)
        (data / split / "README.txt").write_text("not a patient dir")
    return data


@pytest.fixture
def fake_dcm2niix(tmp_path, monkeypatch):
    """An echo-args shim on PATH: records every invocation's argv to a
    capture file and fakes the conversion by writing a .nii.gz into -o."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    capture = tmp_path / "calls.txt"
    script = bin_dir / "dcm2niix"
    script.write_text(
        "#!/bin/sh\n"
        f'echo "$@" >> "{capture}"\n'
        # find the -o argument and drop a fake converted volume there
        'out=""; prev=""\n'
        'for a in "$@"; do if [ "$prev" = "-o" ]; then out="$a"; fi; prev="$a"; done\n'
        '[ -n "$out" ] && touch "$out/sax.nii.gz"\n'
    )
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bin_dir}{os.pathsep}{os.environ['PATH']}")
    return capture


def test_walk_series_selection_and_split_mapping(tmp_path, fake_dcm2niix):
    data = _make_dsb15_dicom_tree(tmp_path)
    out = tmp_path / "out"
    dsb15_dicom2nifty.main(data, out)

    calls = fake_dcm2niix.read_text().strip().splitlines()
    # 4 patients x 2 sax series; the 2ch series and loose files never convert
    assert len(calls) == 8
    assert not any("2ch" in c for c in calls)
    assert not any("README" in c for c in calls)

    # 'validate' maps to 'valid' in the output tree; others keep their name
    assert (out / "valid" / "501" / "sax_5" / "sax.nii.gz").exists()
    assert (out / "train" / "1" / "sax_20" / "sax.nii.gz").exists()
    assert (out / "test" / "701" / "sax_5" / "sax.nii.gz").exists()
    assert not (out / "validate").exists()

    # the reference's exact dcm2niix flag contract, series dir last
    for c in calls:
        assert "-t y -s n -m y -b y -ba n -z y -f %d" in c
        assert c.split()[-1].split("/")[-1].startswith("sax_")

    # every series converted exactly once, into its own output dir
    out_dirs = {c.split()[1] for c in calls}
    assert len(out_dirs) == 8


def test_missing_split_dirs_are_skipped(tmp_path, fake_dcm2niix):
    data = tmp_path / "dsb15_partial"
    d = data / "train" / "9" / "study" / "sax_7"
    d.mkdir(parents=True)
    (d / "IM-0001-0001.dcm").write_bytes(b"\x00")
    out = tmp_path / "out"
    dsb15_dicom2nifty.main(data, out)  # no validate/test dirs: no crash
    assert len(fake_dcm2niix.read_text().strip().splitlines()) == 1
    assert (out / "train" / "9" / "sax_7").is_dir()


def test_missing_binary_is_a_clear_error(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path / "empty"))
    with pytest.raises(RuntimeError, match="dcm2niix not found"):
        dsb15_dicom2nifty.main(tmp_path, tmp_path / "out")


def test_cli_entry(tmp_path, fake_dcm2niix, monkeypatch):
    """__main__ path: argparse wiring delivers (data_dir, output_dir)."""
    data = _make_dsb15_dicom_tree(tmp_path)
    out = tmp_path / "cli_out"
    monkeypatch.setattr(
        sys, "argv", ["dsb15_dicom2nifty", str(data), str(out)]
    )
    args = dsb15_dicom2nifty._parse_args()
    dsb15_dicom2nifty.main(args.data_dir, args.output_dir)
    assert (out / "valid" / "501" / "sax_20" / "sax.nii.gz").exists()
