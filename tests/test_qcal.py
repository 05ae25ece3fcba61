"""Quality-score calibration: per-base alignment status, table/fit
math, the post-hoc remap, and the CLI flag.

The reference's qualities are uncalibrated by its own documentation
(reference README.md:231-234); flappie_tpu.qcal adds the measurement
and the remap while the default path stays byte-identical.
"""

import numpy as np

from flappie_tpu.accuracy import align_call_status, align_identity
from flappie_tpu.qcal import (
    apply_calibration,
    calibration_error,
    calibration_table,
    fit_calibration,
    parse_qcal,
    phred_from_qstring,
)

FIX = "/root/reference/src/test"


def test_align_call_status_hand_cases():
    # identical: every called base correct
    assert align_call_status("ACGT", "ACGT").all()
    # one substitution
    s = align_call_status("ACGT", "AGGT")
    assert s.tolist() == [True, False, True, True]
    # insertion in the call: the inserted base is wrong, rest right
    s = align_call_status("ACGGT", "ACGT")
    assert s.sum() == 4 and s.size == 5
    # deletion: all called bases still correct
    assert align_call_status("AGT", "ACGT").all()
    # empty call
    assert align_call_status("", "ACGT").size == 0


def test_align_call_status_consistent_with_identity():
    rng = np.random.default_rng(0)
    bases = np.array(list("ACGT"))
    for _ in range(10):
        truth = "".join(rng.choice(bases, size=80))
        call = list(truth)
        # random mutations
        for i in rng.choice(80, size=8, replace=False):
            call[i] = rng.choice(bases)
        call = "".join(call)
        a = align_identity(call, truth)
        s = align_call_status(call, truth)
        assert s.size == len(call)
        assert s.sum() == a.matches


def test_calibration_table_and_fit_recovers_line():
    """Synthetic data generated from a known q_emp = 0.5*q + 2 line is
    recovered by the weighted fit."""
    rng = np.random.default_rng(1)
    qs = rng.integers(5, 35, size=200_000)
    p_err = 10 ** (-(0.5 * qs + 2.0) / 10.0)
    correct = rng.random(qs.size) >= p_err
    table = calibration_table(qs, correct)
    a, b = fit_calibration(table)
    assert abs(a - 0.5) < 0.05
    assert abs(b - 2.0) < 1.0
    # the fitted line explains the table better than the identity map
    assert calibration_error(table, a, b) < calibration_error(table)


def test_calibration_table_degenerate():
    t = calibration_table(np.array([7, 7, 7]), np.array([True, True, False]))
    assert fit_calibration(t) == (1.0, 0.0)


def test_apply_calibration():
    q = "".join(chr(33 + v) for v in [0, 10, 20, 40])
    assert apply_calibration(q, 1.0, 0.0) == q  # identity is a no-op
    out = phred_from_qstring(apply_calibration(q, 1.0, 2.0))
    assert out.tolist() == [2, 12, 22, 42]
    # clipping at both ends: q'=a*q+b stays within [0, 93]
    out = phred_from_qstring(apply_calibration(q, 3.0, -5.0))
    assert out.min() >= 0 and out.max() <= 93
    assert parse_qcal("1.5:-0.25") == (1.5, -0.25)


def test_cli_qcal_shifts_only_quality(tmp_path):
    from flappie_tpu.cli.flappie import main
    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.signal.fast5 import write_single_read_fast5

    raw = read_crp(f"{FIX}/raw_signal.crp").reshape(-1)
    f5 = tmp_path / "a.fast5"
    write_single_read_fast5(str(f5), raw[:9000], "read-a")
    base, cal = tmp_path / "base.fastq", tmp_path / "cal.fastq"
    assert main([str(f5), "-o", str(base)]) == 0
    assert main([str(f5), "-o", str(cal), "--qcal", "1:3"]) == 0
    b, c = base.read_text().splitlines(), cal.read_text().splitlines()
    assert b[0] == c[0] and b[1] == c[1] and b[2] == c[2]  # header/seq/+
    qb, qc = phred_from_qstring(b[3]), phred_from_qstring(c[3])
    assert np.all(qc == np.clip(qb + 3, 0, 93))


def test_parse_qcal_rejects_garbage_with_usage_message():
    """Non-numeric and non-finite pairs raise ValueError naming the
    expected slope:offset form (ADVICE r3)."""
    import math

    import pytest

    for bad in ("a:b", "1.0:x", "nan:0", "1:inf", "1.0", "1:2:3"):
        with pytest.raises(ValueError, match="slope"):
            parse_qcal(bad)
    assert parse_qcal("0.9:0.5") == (0.9, 0.5)


def test_fit_isotonic_pava_and_lut():
    """PAVA pools violators (count-weighted) and the LUT is monotone,
    clamped, and interpolates between observed bins."""
    import numpy as np

    from flappie_tpu.qcal import CalibrationTable, fit_isotonic

    # bins at q=10,20,30 with an inversion at 20 (low-count outlier)
    t = CalibrationTable(
        q=np.array([10, 20, 30]),
        n=np.array([100, 10, 100]),
        n_err=np.array([0, 0, 0]),
        q_emp=np.array([12.0, 8.0, 25.0]),
    )
    lut = fit_isotonic(t)
    assert lut.shape == (94,)
    assert np.all(np.diff(lut) >= 0)
    # the q=20 violator pools with q=10 (weighted mean ~11.6)
    assert lut[10] == lut[20] == round((12.0 * 100 + 8.0 * 10) / 110)
    assert lut[30] == 25
    # flat extension beyond the observed range; clamped to char range
    assert lut[0] == lut[10] and lut[93] == 25
    assert lut.min() >= 0 and lut.max() <= 93


def test_apply_calibration_lut_roundtrip():
    import numpy as np

    from flappie_tpu.qcal import apply_calibration_lut, phred_from_qstring

    lut = np.arange(94) * 2  # doubling map, clamped at 93 on apply
    qual = "".join(chr(q + 33) for q in (0, 10, 40, 60))
    got = phred_from_qstring(apply_calibration_lut(qual, lut))
    assert got.tolist() == [0, 20, 80, 93]


def test_parse_qcal_file_selects_model(tmp_path):
    import json

    import numpy as np
    import pytest

    from flappie_tpu.qcal import apply_qcal, parse_qcal

    doc = {"models": {
        "r941_native": {"lut": list(range(94)), "fit": {"slope": 1, "offset": 0}},
        "r103_native": {"fit": {"slope": 0.9, "offset": 2.0}},
    }}
    p = tmp_path / "qcal.json"
    p.write_text(json.dumps(doc))
    lut = parse_qcal(str(p), model="r941_native")
    assert isinstance(lut, np.ndarray) and lut[5] == 5
    pair = parse_qcal(str(p), model="r103_native")
    assert pair == (0.9, 2.0)
    with pytest.raises(ValueError, match="no calibration"):
        parse_qcal(str(p), model="r941_5mC")

    # apply_qcal handles both forms
    import dataclasses

    @dataclasses.dataclass
    class R:
        quality: str

    assert apply_qcal(R("IIII"), lut).quality == "IIII"
    assert apply_qcal(R("IIII"), (1.0, 0.0)).quality == "IIII"
