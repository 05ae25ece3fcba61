"""Alignment-identity metric (flappie_tpu/accuracy.py).

The reference's headline metric is alignment identity
(/root/reference/RELEASES.md:5-12); these tests pin the aligner on
hand-checkable cases and against a brute-force O(nm) reference DP.
"""

from __future__ import annotations

import numpy as np
import pytest

from flappie_tpu.accuracy import GAP, MATCH, MISMATCH, Alignment, align_identity


def brute_force_score(a: str, b: str) -> int:
    n, m = len(a), len(b)
    H = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        H[i][0] = GAP * i
    for j in range(m + 1):
        H[0][j] = GAP * j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = MATCH if a[i - 1] == b[j - 1] else MISMATCH
            H[i][j] = max(H[i - 1][j - 1] + s, H[i - 1][j] + GAP, H[i][j - 1] + GAP)
    return H[n][m]


def test_identical():
    a = align_identity("ACGTACGT", "ACGTACGT")
    assert a.identity == 1.0
    assert (a.matches, a.mismatches, a.insertions, a.deletions) == (8, 0, 0, 0)


def test_single_mismatch():
    a = align_identity("ACGTACGT", "ACGAACGT")
    assert (a.matches, a.mismatches) == (7, 1)
    assert a.columns == 8


def test_insertion_and_deletion():
    a = align_identity("ACGGT", "ACGT")  # one extra G in the call
    assert (a.matches, a.insertions, a.deletions) == (4, 1, 0)
    b = align_identity("ACGT", "ACGGT")
    assert (b.matches, b.insertions, b.deletions) == (4, 0, 1)


def test_empty_inputs():
    assert align_identity("", "ACGT").identity == 0.0
    assert align_identity("ACGT", "").deletions == 0
    assert align_identity("ACGT", "").insertions == 4
    assert align_identity("", "").columns == 0


def test_disjoint_alphabets():
    a = align_identity("AAAA", "CCCC")
    assert a.matches == 0
    assert a.identity == 0.0


def test_matches_brute_force_on_random_pairs():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n, m = rng.integers(1, 40, size=2)
        a = "".join(rng.choice(list("ACGT"), n))
        b = "".join(rng.choice(list("ACGT"), m))
        aln = align_identity(a, b)
        score = (MATCH * aln.matches + MISMATCH * aln.mismatches
                 + GAP * (aln.insertions + aln.deletions))
        assert score == brute_force_score(a, b), (a, b)


def test_identity_tracks_error_rate():
    """Mutating k% of bases must drop identity by about k%."""
    rng = np.random.default_rng(1)
    truth = rng.choice(list("ACGT"), 2000)
    call = truth.copy()
    idx = rng.choice(2000, 100, replace=False)  # 5% mismatches
    for i in idx:
        call[i] = "ACGT"[("ACGT".index(call[i]) + 1) % 4]
    a = align_identity("".join(call), "".join(truth))
    assert 0.93 <= a.identity <= 0.96
