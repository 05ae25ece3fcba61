"""Numpy oracle: literal re-implementation of the reference C semantics.

Used only by tests, mirroring the reference's own test strategy of
comparing the optimised implementation against a naive one
(src/test/test_flappie_convolution.c:51-106).  Everything here follows
the C loops element-by-element in float64 for clarity; tolerances in
tests account for float32 vs float64.

Matrices are [T, C] (time-major) to match the package layout; the
reference's column-major [C_padded, T] is equivalent.
"""

from __future__ import annotations

import numpy as np


def logistic(x):
    return 1.0 / (1.0 + np.exp(-x))


def swish(x):
    return x * logistic(x)


def softplus(x):
    return np.log1p(np.exp(x))


def logsumexp2(x, y):
    # reference util.h:276-281
    return np.maximum(x, y) + np.log1p(np.exp(-np.abs(x - y)))


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------


def conv_same_math(x, W, b, stride):
    """x: [T, Cin]; W: [winlen, Cin, Cout]; naive same-pad strided conv.

    Mirrors simple_convolution/simple_stride in the reference tests:
    output t reads window [t*stride - padL, t*stride + padR], zeros
    outside.  This is the *mathematical* same-conv; the reference's
    production conv deviates from it at the right edge when
    winlen % stride != 0 — see conv_tapmap/conv_same below.
    """
    T, Cin = x.shape
    winlen, _, Cout = W.shape
    padL = (winlen - 1) // 2
    ncol = -(-T // stride)
    out = np.tile(np.asarray(b, np.float64), (ncol, 1))
    for t in range(ncol):
        base = t * stride - padL
        for w in range(winlen):
            pos = base + w
            if 0 <= pos < T:
                out[t] += x[pos] @ W[w]
    return out


def conv_tapmap(n, winlen, stride):
    """Which filter taps the reference conv actually applies per output
    column, transcribed from src/layers.c:189-276.

    Returns (ncol, contribs) where contribs[c] is a list of
    (window_start, tap_lo, tap_hi): taps j in [tap_lo, tap_hi) applied
    to x[window_start + j] (positions outside [0, n) contribute zero by
    construction).  Columns with no entry receive only the bias.

    The quirk this encodes: the body sgemm loop only emits windows that
    fit in a full stride*ceil(winlen/stride) block, so when
    winlen % stride != 0 the last window(s) that mathematically fit are
    left to the right-edge loop, which starts them at n - winlen with
    the leading taps dropped — and the final column(s) may get no
    contribution at all.  Exact for stride 1 / winlen % stride == 0.
    """
    s, w = stride, winlen
    padL = (w - 1) // 2
    padR = w // 2
    ncol = -(-n // s)
    contribs = {}
    # left edge loop (layers.c:220-227)
    for wo in range(0, padL, s):
        contribs.setdefault(wo // s, []).append((wo - padL, padL - wo, w))
    ncolsL = -(-padL // s)
    shift = ncolsL * s - padL
    nstepC = -(-w // s)
    nstepX = s * nstepC
    # body sgemm loop (layers.c:239-254): complete nstepX blocks only
    for wo in range(0, nstepX, s):
        for k in range((n - shift - wo) // nstepX):
            c = ncolsL + wo // s + nstepC * k
            contribs.setdefault(c, []).append((shift + wo + nstepX * k, 0, w))
    # right edge loop (layers.c:256-271): sgemv over the *leading*
    # W->nr - ldFeature*(wo+1) rows of W (the pointer is not offset),
    # i.e. taps [0, w-1-wo) applied to x starting at n - w + 1 + wo.
    # For stride 1 this equals the mathematical right-clipped window;
    # for winlen % stride != 0 it silently anchors the window at the
    # wrong position with the wrong taps.
    maxcol = (n - shift) // nstepX
    rem = (n - shift) % nstepX
    colR0 = ncolsL + nstepC * (maxcol - 1) + rem // s + 1
    startR = s - (padL + n - w) % s - 1
    for wo in range(startR, padR, s):
        contribs.setdefault(colR0 + wo // s, []).append(
            (n - w + 1 + wo, 0, w - 1 - wo)
        )
    return ncol, contribs


def conv_same(x, W, b, stride):
    """The reference convolution (layers.c:189-276) including its
    right-edge tap-dropping behaviour — the parity oracle."""
    T, Cin = x.shape
    winlen, _, Cout = W.shape
    ncol, contribs = conv_tapmap(T, winlen, stride)
    out = np.tile(np.asarray(b, np.float64), (ncol, 1))
    for c, entries in contribs.items():
        for start, lo, hi in entries:
            for j in range(lo, hi):
                pos = start + j
                if 0 <= pos < T:
                    out[c] += x[pos] @ W[j]
    return out


def affine(x, W, b):
    return x @ W + np.asarray(b)


def lstm(xaffine, sW):
    """xaffine: [T, 4H]; gate order [update, forget, candidate, output]
    (src/layers.c:979-1026)."""
    T, H4 = xaffine.shape
    H = H4 // 4
    h = np.zeros(H)
    c = np.zeros(H)
    out = np.zeros((T, H))
    for t in range(T):
        xF = xaffine[t] + h @ sW
        u = logistic(xF[:H])
        f = logistic(xF[H : 2 * H])
        g = np.tanh(xF[2 * H : 3 * H])
        o = logistic(xF[3 * H :])
        c = f * c + u * g
        h = o * np.tanh(c)
        out[t] = h
    return out


def grumod(xaffine, sW):
    """src/layers.c:664-715; x contribution to candidate NOT through sW sum."""
    T, H3 = xaffine.shape
    H = H3 // 3
    h = np.zeros(H)
    out = np.zeros((T, H))
    for t in range(T):
        v = h @ sW
        z = logistic(xaffine[t][:H] + v[:H])
        r = logistic(xaffine[t][H : 2 * H] + v[H : 2 * H])
        hbar = np.tanh(r * v[2 * H :] + xaffine[t][2 * H :])
        h = z * h + (1 - z) * hbar
        out[t] = h
    return out


def run_rnn(xaffine, sW, kind, backward):
    fn = {"lstm": lstm, "grumod": grumod}[kind]
    if backward:
        return fn(xaffine[::-1], sW)[::-1]
    return fn(xaffine, sW)


# ---------------------------------------------------------------------------
# Flip-flop CRF
# ---------------------------------------------------------------------------


def ff_layout(nbase):
    nstate = 2 * nbase
    off = nbase * nstate
    return nstate, off


def ff_forward_step(prev, p, nbase):
    """One forward block update (src/layers.c:1050-1068)."""
    nstate, off = ff_layout(nbase)
    curr = np.empty(nstate)
    for stay in range(nbase, nstate):
        fb = stay - nbase
        curr[stay] = logsumexp2(prev[stay] + p[off + stay], prev[fb] + p[off + fb])
    for to in range(nbase):
        o = to * nstate
        acc = p[o + 0] + prev[0]
        for frm in range(1, nstate):
            acc = logsumexp2(acc, p[o + frm] + prev[frm])
        curr[to] = acc
    return curr


def ff_partition(trans, nbase):
    """trans: [T, nparam] -> logZ (src/layers.c:1035-1079)."""
    nstate, _ = ff_layout(nbase)
    a = np.zeros(nstate)
    for t in range(trans.shape[0]):
        a = ff_forward_step(a, trans[t], nbase)
    acc = a[0]
    for s in range(1, nstate):
        acc = logsumexp2(acc, a[s])
    return acc


def globalnorm_flipflop(x, W, b, temperature, nbase):
    C = np.tanh(affine(x, W, b)) * 5.0 / temperature
    logZ = ff_partition(C, nbase) / C.shape[0]
    return C - logZ


def ff_viterbi(trans, nbase):
    """Viterbi decode (src/decode.c:119-204): returns
    (score, path [T+1], qpath [T+1])."""
    T = trans.shape[0]
    nstate, off = ff_layout(nbase)
    prev = np.zeros(nstate)
    tb = np.zeros((T, nstate), dtype=np.int64)
    for t in range(T):
        p = trans[t]
        curr = np.empty(nstate)
        for stay in range(nbase, nstate):
            fb = stay - nbase
            curr[stay] = prev[stay] + p[off + stay]
            tb[t, stay] = stay
            alt = prev[fb] + p[off + fb]
            if alt > curr[stay]:
                curr[stay] = alt
                tb[t, stay] = fb
        for to in range(nbase):
            o = to * nstate
            curr[to] = p[o] + prev[0]
            tb[t, to] = 0
            for frm in range(1, nstate):
                sc = p[o + frm] + prev[frm]
                if sc > curr[to]:
                    curr[to] = sc
                    tb[t, to] = frm
        prev = curr
    score = prev.max()
    path = np.zeros(T + 1, dtype=np.int64)
    qpath = np.zeros(T + 1)
    path[T] = prev.argmax()
    for t in range(T, 0, -1):
        path[t - 1] = tb[t - 1, path[t]]
        qpath[t] = trans[t - 1][trans_lookup(path[t - 1], path[t], nbase)]
    qpath[0] = np.nan
    return score, path, qpath


def trans_lookup(frm, to, nbase):
    nstate = 2 * nbase
    off = nbase * nstate
    return to * nstate + frm if to < nbase else off + frm


def ff_transpost(trans, nbase, return_log=True):
    """Forward-backward transition posterior (src/decode.c:377-498)."""
    T = trans.shape[0]
    nstate, off = ff_layout(nbase)
    nparam = trans.shape[1]
    fwd = np.zeros((T + 1, nstate))
    for t in range(T):
        fwd[t + 1] = ff_forward_step(fwd[t], trans[t], nbase)

    tpost = np.zeros((T, nparam))
    prev = np.zeros(nstate)
    for t in range(T, 0, -1):
        p = trans[t - 1]
        # tpost
        for to in range(nbase):
            o = to * nstate
            for st in range(nstate):
                tpost[t - 1, o + st] = fwd[t - 1, st] + prev[to] + p[o + st]
        for b in range(nbase, nstate):
            fb = b - nbase
            tpost[t - 1, off + b] = fwd[t - 1, b] + prev[b] + p[off + b]
            tpost[t - 1, off + fb] = fwd[t - 1, fb] + prev[b] + p[off + fb]
        # backward vector update
        curr = np.empty(nstate)
        for b in range(nbase, nstate):
            fb = b - nbase
            curr[b] = prev[b] + p[off + b]
            curr[fb] = prev[b] + p[off + fb]
        for to in range(nbase):
            o = to * nstate
            for frm in range(nstate):
                curr[frm] = logsumexp2(curr[frm], p[o + frm] + prev[to])
        prev = curr

    # log_row_normalise per block
    for t in range(T):
        acc = tpost[t, 0]
        for r in range(1, nparam):
            acc = logsumexp2(acc, tpost[t, r])
        tpost[t] -= acc
    if not return_log:
        tpost = np.exp(tpost)
    return tpost


def ff_trace(tpost_exp, nbase):
    """src/decode.c:499-543."""
    T, nparam = tpost_exp.shape
    nstate, off = ff_layout(nbase)
    trace = np.zeros((T + 1, nstate))
    for frm in range(nstate):
        s = sum(tpost_exp[0, to * nstate + frm] for to in range(nbase))
        s += tpost_exp[0, off + frm]
        trace[0, frm] = np.round(255.0 * s)
    for t in range(T):
        for to in range(nbase):
            trace[t + 1, to] = np.round(
                255.0 * tpost_exp[t, to * nstate : (to + 1) * nstate].sum()
            )
        for to in range(nbase, nstate):
            trace[t + 1, to] = np.round(
                255.0 * (tpost_exp[t, off + to - nbase] + tpost_exp[t, off + to])
            )
    return trace


# ---------------------------------------------------------------------------
# RLE V2 CRF
# ---------------------------------------------------------------------------


def rle_trans_lookup(bf, sf, bt, nbase):
    return bt * 2 * nbase + bf + (nbase if sf else 0)


def rle_partition(trans, nbase):
    """src/layers.c:1255-1304; trans: [T, 2*nbase*nbase]."""
    nstate = 2 * nbase
    a = np.zeros(nstate)
    for t in range(trans.shape[0]):
        p = trans[t]
        curr = np.empty(nstate)
        for b1 in range(nbase):
            acc = -np.inf
            for b2 in range(nbase):
                if b1 == b2:
                    continue
                acc = logsumexp2(acc, a[b2] + p[rle_trans_lookup(b2, False, b1, nbase)])
                acc = logsumexp2(
                    acc, a[b2 + nbase] + p[rle_trans_lookup(b2, True, b1, nbase)]
                )
            curr[b1] = acc
            curr[b1 + nbase] = logsumexp2(
                a[b1] + p[rle_trans_lookup(b1, False, b1, nbase)],
                a[b1 + nbase] + p[rle_trans_lookup(b1, True, b1, nbase)],
            )
        a = curr
    acc = a[0]
    for s in range(1, nstate):
        acc = logsumexp2(acc, a[s])
    return acc


def rle_viterbi(trans, nbase):
    """decode_crf_runlength (src/decode.c:927-1011); trans is the
    transition slice [T, 2*nbase^2]; returns (score, path [T])."""
    T = trans.shape[0]
    nstate = 2 * nbase
    prev = np.zeros(nstate)
    tb = np.zeros((T, nstate), dtype=np.int64)
    for t in range(T):
        p = trans[t]
        curr = np.full(nstate, -np.inf)
        for b1 in range(nbase):
            for b2 in range(nbase):
                if b1 == b2:
                    continue
                mv = prev[b2] + p[rle_trans_lookup(b2, False, b1, nbase)]
                if mv > curr[b1]:
                    curr[b1] = mv
                    tb[t, b1] = b2
                st = prev[b2 + nbase] + p[rle_trans_lookup(b2, True, b1, nbase)]
                if st > curr[b1]:
                    curr[b1] = st
                    tb[t, b1] = b2 + nbase
        for b in range(nbase):
            st = prev[b + nbase] + p[rle_trans_lookup(b, True, b, nbase)]
            mv = prev[b] + p[rle_trans_lookup(b, False, b, nbase)]
            if st > mv:
                curr[b + nbase] = st
                tb[t, b + nbase] = b + nbase
            else:
                curr[b + nbase] = mv
                tb[t, b + nbase] = b
        prev = curr
    last = prev.argmax()
    score = prev[last]
    path = np.zeros(T, dtype=np.int64)
    for t in range(T, 0, -1):
        state = tb[t - 1, last]
        path[t - 1] = last
        last = state
    return score, path
