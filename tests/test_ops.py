"""JAX ops vs the numpy oracle (reference C semantics).

House pattern from the reference tests: an independent naive
implementation, self-tested on tiny cases, then compared against the
optimised implementation - here additionally across batch padding, so
variable-length batching is proven not to leak into valid outputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import oracle
from flappie_tpu.ops import crf as crf_ops
from flappie_tpu.ops import rnn as rnn_ops
from flappie_tpu.ops.conv import conv1d_same
from flappie_tpu.ops.heads import globalnorm_flipflop, globalnorm_runlengthV2
from flappie_tpu.ops.masking import mask_tail, reverse_sequence

RNG = np.random.default_rng(42)


def rnd(*shape, scale=1.0):
    return (RNG.normal(size=shape) * scale).astype(np.float32)


# ---------------------------------------------------------------------------
# conv
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("winlen,stride,T", [(5, 1, 20), (19, 5, 33), (4, 2, 10), (3, 3, 7), (11, 5, 100)])
def test_conv_matches_oracle(winlen, stride, T):
    Cin, Cout = 3, 8
    x = rnd(T, Cin)
    W = rnd(winlen, Cin, Cout, scale=0.3)
    b = rnd(Cout)
    want = oracle.conv_same(x.astype(np.float64), W, b, stride)
    got = conv1d_same(jnp.asarray(x)[None], jnp.asarray(W), jnp.asarray(b), stride)[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_conv_batch_padding_no_leak():
    """A padded batch must give the same valid outputs as unpadded."""
    winlen, stride = 19, 5
    Cin, Cout = 1, 4
    W, b = rnd(winlen, Cin, Cout, scale=0.3), rnd(Cout)
    T_short, T_pad = 53, 80
    x = rnd(T_short, Cin)
    xpad = np.zeros((T_pad, Cin), np.float32)
    xpad[:T_short] = x
    solo = conv1d_same(jnp.asarray(x)[None], W, b, stride)[0]
    padded = conv1d_same(
        jnp.asarray(xpad)[None], W, b, stride, jnp.asarray([T_short])
    )[0]
    nblk = -(-T_short // stride)
    np.testing.assert_allclose(padded[:nblk], solo, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("winlen,stride", [(19, 5), (19, 2), (11, 5), (7, 4)])
def test_conv_ref_edge_lengths_in_padded_batch(winlen, stride):
    """Per-read right-edge quirk columns must be computed from each
    read's own length inside a padded batch, across a sweep of lengths
    (the quirk geometry changes with n mod stride terms)."""
    Cin, Cout, T_pad = 3, 4, 96
    W, b = rnd(winlen, Cin, Cout, scale=0.3), rnd(Cout)
    lengths = list(range(winlen + 2, T_pad + 1, 7)) + [T_pad]
    xpad = np.zeros((len(lengths), T_pad, Cin), np.float32)
    wants = []
    for i, n in enumerate(lengths):
        xpad[i, :n] = rnd(n, Cin)
        wants.append(oracle.conv_same(xpad[i, :n].astype(np.float64), W, b, stride))
    got = conv1d_same(
        jnp.asarray(xpad), jnp.asarray(W), jnp.asarray(b), stride,
        jnp.asarray(lengths, dtype=jnp.int32),
    )
    for i, want in enumerate(wants):
        np.testing.assert_allclose(
            got[i, : want.shape[0]], want, rtol=2e-5, atol=2e-5,
            err_msg=f"n={lengths[i]}",
        )


# ---------------------------------------------------------------------------
# rnn
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kind,gates", [("lstm", 4), ("grumod", 3)])
def test_rnn_matches_oracle(kind, gates):
    T, H = 31, 12
    xa = rnd(T, gates * H)
    sW = rnd(H, gates * H, scale=0.3)
    want = getattr(oracle, kind)(xa.astype(np.float64), sW.astype(np.float64))
    fn = {"lstm": rnn_ops.lstm_seq, "grumod": rnn_ops.grumod_seq}[kind]
    got = fn(jnp.asarray(xa)[None], jnp.asarray(sW))[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_reverse_sequence():
    x = np.arange(2 * 5 * 1, dtype=np.float32).reshape(2, 5, 1)
    lengths = np.array([3, 5])
    y = np.asarray(reverse_sequence(jnp.asarray(x), jnp.asarray(lengths)))
    assert y[0, :, 0].tolist() == [2, 1, 0, 3, 4]
    assert y[1, :, 0].tolist() == [9, 8, 7, 6, 5]
    # involution on valid region
    z = np.asarray(reverse_sequence(jnp.asarray(y), jnp.asarray(lengths)))
    np.testing.assert_array_equal(z, x)


def test_backward_rnn_with_padding_matches_unpadded():
    """Backward LSTM via reverse_sequence: padded batch == solo run."""
    T, Tpad, H = 17, 29, 8
    xa = rnd(T, 4 * H)
    sW = rnd(H, 4 * H, scale=0.3)
    solo = oracle.run_rnn(xa.astype(np.float64), sW.astype(np.float64), "lstm", backward=True)
    xpad = np.zeros((Tpad, 4 * H), np.float32)
    xpad[:T] = xa
    lengths = jnp.asarray([T])
    xr = reverse_sequence(jnp.asarray(xpad)[None], lengths)
    y = rnn_ops.lstm_seq(xr, jnp.asarray(sW))
    y = reverse_sequence(y, lengths)[0]
    np.testing.assert_allclose(np.asarray(y)[:T], solo, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# flip-flop CRF
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nbase", [4, 5])
def test_partition_matches_oracle(nbase):
    T = 50
    nparam = 2 * nbase * (nbase + 1)
    trans = rnd(T, nparam, scale=2.0)
    want = oracle.ff_partition(trans.astype(np.float64), nbase)
    got = crf_ops.crf_partition(
        jnp.asarray(trans)[None], jnp.asarray([T]), nbase
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_partition_masked():
    nbase, T, Tpad = 4, 37, 64
    nparam = 40
    trans = rnd(T, nparam, scale=2.0)
    tpad = np.zeros((Tpad, nparam), np.float32)
    tpad[:T] = trans
    want = oracle.ff_partition(trans.astype(np.float64), nbase)
    got = crf_ops.crf_partition(jnp.asarray(tpad)[None], jnp.asarray([T]), nbase)[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("nbase", [4, 5])
def test_viterbi_matches_oracle(nbase):
    T, Tpad = 60, 75
    nparam = 2 * nbase * (nbase + 1)
    trans = rnd(T, nparam, scale=2.0)
    tpad = np.zeros((Tpad, nparam), np.float32)
    tpad[:T] = trans
    wscore, wpath, wq = oracle.ff_viterbi(trans.astype(np.float64), nbase)
    score, path, qpath = crf_ops.crf_viterbi(
        jnp.asarray(tpad)[None], jnp.asarray([T]), nbase
    )
    np.testing.assert_allclose(score[0], wscore, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(path)[0, : T + 1], wpath)
    got_q = np.asarray(qpath)[0, : T + 1]
    assert np.isnan(got_q[0]) and np.isnan(wq[0])
    np.testing.assert_allclose(got_q[1:], wq[1:], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nbase", [4, 5])
def test_transpost_matches_oracle(nbase):
    T, Tpad = 40, 50
    nparam = 2 * nbase * (nbase + 1)
    trans = rnd(T, nparam, scale=2.0)
    tpad = np.zeros((Tpad, nparam), np.float32)
    tpad[:T] = trans
    want = oracle.ff_transpost(trans.astype(np.float64), nbase)
    got = crf_ops.crf_transpost(jnp.asarray(tpad)[None], jnp.asarray([T]), nbase)
    np.testing.assert_allclose(np.asarray(got)[0, :T], want, rtol=1e-4, atol=1e-4)


def test_trace_matches_oracle():
    nbase, T = 4, 25
    nparam = 40
    trans = rnd(T, nparam, scale=2.0)
    tpost = oracle.ff_transpost(trans.astype(np.float64), nbase, return_log=False)
    want = oracle.ff_trace(tpost, nbase)
    got = crf_ops.trace_from_posterior(jnp.asarray(tpost.astype(np.float32))[None], nbase)[0]
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.uint8))


def test_rle_partition_matches_oracle():
    nbase, T = 4, 30
    ntrans = 2 * nbase * nbase
    trans = rnd(T, ntrans, scale=2.0)
    want = oracle.rle_partition(trans.astype(np.float64), nbase)
    got = crf_ops.crf_partition(
        jnp.asarray(trans)[None], jnp.asarray([T]), nbase, idx=crf_ops.rle_index(nbase)
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_rle_viterbi_matches_oracle():
    nbase, T = 4, 45
    ntrans = 2 * nbase * nbase
    trans = rnd(T, ntrans, scale=2.0)
    wscore, wpath = oracle.rle_viterbi(trans.astype(np.float64), nbase)
    idx = crf_ops.rle_index(nbase)
    score, path, _ = crf_ops.crf_viterbi(
        jnp.asarray(trans)[None], jnp.asarray([T]), nbase, idx=idx
    )
    np.testing.assert_allclose(score[0], wscore, rtol=1e-5, atol=1e-5)
    # RLE path convention: path[t] = state after transition t, i.e. the
    # flip-flop-style [T+1] device path shifted by one.
    np.testing.assert_array_equal(np.asarray(path)[0, 1:], wpath)


# ---------------------------------------------------------------------------
# heads
# ---------------------------------------------------------------------------


def test_globalnorm_flipflop_matches_oracle():
    T, H, nbase = 22, 16, 4
    x = rnd(T, H)
    W = rnd(H, 40, scale=0.3)
    b = rnd(40)
    temp = 0.9
    want = oracle.globalnorm_flipflop(
        x.astype(np.float64), W.astype(np.float64), b.astype(np.float64), temp, nbase
    )
    got = globalnorm_flipflop(
        jnp.asarray(x)[None], jnp.asarray(W), jnp.asarray(b), temp, jnp.asarray([T]), nbase
    )[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_globalnorm_runlengthV2_shapes_and_ranges():
    T, H, nbase = 18, 16, 4
    x = rnd(T, H)
    W = rnd(H, 40, scale=0.3)
    b = rnd(40)
    out = np.asarray(
        globalnorm_runlengthV2(
            jnp.asarray(x)[None], jnp.asarray(W), jnp.asarray(b), 1.0, jnp.asarray([T]), nbase
        )[0]
    )
    assert out.shape == (T, 40)
    assert (out[:, :4] >= 1.0).all()  # shape = 1 + softplus
    assert (out[:, 4:8] > 0.0).all()  # scale = eta + softplus


def test_transitions_input_tail_masked():
    """Data beyond `lengths` in the input buffer must not affect valid
    outputs (the reference conv zero-pads past the read end)."""
    from flappie_tpu.models import get_model_config, init_synthetic, transitions

    cfg = get_model_config("r941_native")
    params = init_synthetic(cfg, seed=0)
    T, L = 640, 431
    sig = rnd(T)
    a, na = transitions(params, cfg, jnp.asarray(sig)[None], jnp.asarray([L]))
    garbage = sig.copy()
    garbage[L:] = 99.0
    b, nb = transitions(params, cfg, jnp.asarray(garbage)[None], jnp.asarray([L]))
    n = int(np.asarray(na)[0])
    np.testing.assert_allclose(
        np.asarray(a)[0, :n], np.asarray(b)[0, :n], rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("kind", ["lstm", "grumod"])
def test_pallas_kernels_match_scan(kind):
    """Pallas recurrent kernels (interpret mode on CPU) == lax.scan
    baseline, including the K-step time blocking path."""
    from flappie_tpu.ops import rnn_pallas

    B, T, H = 3, 32, 16  # T % TIME_BLOCK == 0 exercises the K-step path
    gates = 4 if kind == "lstm" else 3
    xa = rnd(B, T, gates * H)
    sW = rnd(H, gates * H, scale=0.3)
    base = {"lstm": rnn_ops.lstm_seq, "grumod": rnn_ops.grumod_seq}[kind]
    fused = {
        "lstm": rnn_pallas.lstm_seq_pallas,
        "grumod": rnn_pallas.grumod_seq_pallas,
    }[kind]
    a = base(jnp.asarray(xa), jnp.asarray(sW))
    b = fused(jnp.asarray(xa), jnp.asarray(sW), interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
    # odd T exercises the K=1 fallback
    a = base(jnp.asarray(xa[:, :29]), jnp.asarray(sW))
    b = fused(jnp.asarray(xa[:, :29]), jnp.asarray(sW), interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("kind", ["lstm", "grumod"])
@pytest.mark.parametrize("T", [32, 29])
def test_pallas_fused_layer_matches_affine_plus_scan(kind, T):
    """Fused (input affine inside the kernel) layer == affine + scan."""
    from flappie_tpu.ops import rnn_pallas

    B, IN, H = 3, 8, 16
    gates = 4 if kind == "lstm" else 3
    x = rnd(B, T, IN)
    iW = rnd(IN, gates * H, scale=0.3)
    bias = rnd(gates * H, scale=0.2)
    sW = rnd(H, gates * H, scale=0.3)
    xa = rnn_ops.affine(jnp.asarray(x), jnp.asarray(iW), jnp.asarray(bias))
    base = {"lstm": rnn_ops.lstm_seq, "grumod": rnn_ops.grumod_seq}[kind]
    want = base(xa, jnp.asarray(sW))
    fused = {
        "lstm": rnn_pallas.lstm_layer_tm,
        "grumod": rnn_pallas.grumod_layer_tm,
    }[kind]
    got = fused(
        jnp.swapaxes(jnp.asarray(x), 0, 1), jnp.asarray(iW),
        jnp.asarray(bias), jnp.asarray(sW), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(want), np.swapaxes(np.asarray(got), 0, 1), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("kind", ["lstm", "grumod"])
@pytest.mark.parametrize("backward", [False, True])
def test_pallas_fused_layer_directional_lengths(kind, backward):
    """In-kernel direction + per-read validity == host-side
    reverse_sequence + scan + mask_tail on variable-length reads."""
    from flappie_tpu.ops import rnn_pallas
    from flappie_tpu.ops.masking import mask_tail, reverse_sequence

    B, T, IN, H = 3, 37, 8, 16
    gates = 4 if kind == "lstm" else 3
    lengths = jnp.asarray(np.array([37, 29, 5], np.int32))
    x = rnd(B, T, IN)
    # zero the padded tails like the conv stack does
    x = np.where(np.arange(T)[None, :, None] < np.asarray(lengths)[:, None, None], x, 0.0)
    iW = rnd(IN, gates * H, scale=0.3)
    bias = rnd(gates * H, scale=0.2)
    sW = rnd(H, gates * H, scale=0.3)

    xa = rnn_ops.affine(jnp.asarray(x), jnp.asarray(iW), jnp.asarray(bias))
    if backward:
        xa = reverse_sequence(xa, lengths)
    base = {"lstm": rnn_ops.lstm_seq, "grumod": rnn_ops.grumod_seq}[kind]
    want = base(xa, jnp.asarray(sW))
    if backward:
        want = reverse_sequence(want, lengths)
    want = np.asarray(mask_tail(want, lengths))

    fused = {
        "lstm": rnn_pallas.lstm_layer_tm,
        "grumod": rnn_pallas.grumod_layer_tm,
    }[kind]
    got = fused(
        jnp.swapaxes(jnp.asarray(x), 0, 1), jnp.asarray(iW),
        jnp.asarray(bias), jnp.asarray(sW), interpret=True,
        backward=backward, lengths=lengths,
    )
    got = np.swapaxes(np.asarray(got), 0, 1)
    np.testing.assert_allclose(want, got, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["lstm", "grumod"])
@pytest.mark.parametrize("backward", [False, True])
def test_pallas_fused_dual_chain_bitexact(kind, backward, monkeypatch):
    """FLAPPIE_TPU_RNN_DUAL=on (two interleaved half-batch chains,
    docs/PROBE_dual_r3.json) is bit-exact vs the single-chain fused
    kernel: identical per-row math and op order, only the issue
    interleaving differs."""
    from flappie_tpu.ops import rnn_pallas

    B, T, IN, H = 4, 37, 8, 16
    gates = 4 if kind == "lstm" else 3
    lengths = jnp.asarray(np.array([37, 29, 5, 33], np.int32))
    x = rnd(B, T, IN)
    x = np.where(
        np.arange(T)[None, :, None] < np.asarray(lengths)[:, None, None], x, 0.0
    )
    iW = rnd(IN, gates * H, scale=0.3)
    bias = rnd(gates * H, scale=0.2)
    sW = rnd(H, gates * H, scale=0.3)
    fused = {
        "lstm": rnn_pallas.lstm_layer_tm,
        "grumod": rnn_pallas.grumod_layer_tm,
    }[kind]
    args = (
        jnp.swapaxes(jnp.asarray(x), 0, 1), jnp.asarray(iW),
        jnp.asarray(bias), jnp.asarray(sW),
    )
    # small time block: interpret mode unrolls K steps into the traced
    # graph, and compile time dominates this test at the default K
    monkeypatch.setenv("FLAPPIE_TPU_RNN_K", "4")
    monkeypatch.setenv("FLAPPIE_TPU_RNN_DUAL", "off")
    want = np.asarray(fused(*args, interpret=True, backward=backward,
                            lengths=lengths))
    monkeypatch.setenv("FLAPPIE_TPU_RNN_DUAL", "on")
    got = np.asarray(fused(*args, interpret=True, backward=backward,
                           lengths=lengths))
    np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("kind", ["lstm", "grumod"])
def test_pallas_fused_layer_bf16_stream(kind, monkeypatch):
    """FLAPPIE_TPU_RNN_STREAM=bf16 (the TPU speed mode): output is bf16
    and tracks the f32 reference within the bf16 rounding envelope.
    State and the step matmul stay f32, so error does not compound."""
    from flappie_tpu.ops import rnn_pallas

    B, T, IN, H = 3, 32, 8, 16
    gates = 4 if kind == "lstm" else 3
    x = rnd(B, T, IN)
    iW = rnd(IN, gates * H, scale=0.3)
    bias = rnd(gates * H, scale=0.2)
    sW = rnd(H, gates * H, scale=0.3)
    xa = rnn_ops.affine(jnp.asarray(x), jnp.asarray(iW), jnp.asarray(bias))
    base = {"lstm": rnn_ops.lstm_seq, "grumod": rnn_ops.grumod_seq}[kind]
    want = np.asarray(base(xa, jnp.asarray(sW)))
    fused = {
        "lstm": rnn_pallas.lstm_layer_tm,
        "grumod": rnn_pallas.grumod_layer_tm,
    }[kind]
    monkeypatch.setenv("FLAPPIE_TPU_RNN_STREAM", "bf16")
    got = fused(
        jnp.swapaxes(jnp.asarray(x), 0, 1), jnp.asarray(iW),
        jnp.asarray(bias), jnp.asarray(sW), interpret=True,
    )
    assert got.dtype == jnp.bfloat16
    got = np.swapaxes(np.asarray(got, dtype=np.float32), 0, 1)
    # inputs and outputs round to 8 mantissa bits; |h| <= 1
    np.testing.assert_allclose(want, got, atol=0.05)
    assert np.abs(want - got).mean() < 0.01


def test_rnn_stack_fused_matches_scan_path():
    """network.rnn_stack 'pallas' (fused time-major, interpret mode on
    CPU) == 'scan' path, with backward layers and masked tails."""
    from flappie_tpu.models.config import get_model_config
    from flappie_tpu.models.network import rnn_stack
    from flappie_tpu.models.params import init_synthetic
    from dataclasses import replace

    cfg = get_model_config("r941_native")
    cfg = replace(
        cfg,
        convs=tuple(replace(c, out_ch=min(c.out_ch, 8)) for c in cfg.convs),
        rnns=tuple(replace(r, size=8) for r in cfg.rnns),
    )
    params = jax.tree.map(
        jnp.asarray,
        {k: v for k, v in init_synthetic(cfg, seed=3).items() if k.startswith("rnn") or k == "ff"},
    )
    B, T, C = 2, 37, 8
    x = jnp.asarray(rnd(B, T, C))
    lengths = jnp.asarray(np.array([37, 21], np.int32))
    a = rnn_stack(params, cfg, x, lengths, "scan")
    b = rnn_stack(params, cfg, x, lengths, "pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_crf_pallas_scans_match_scan_impl(monkeypatch):
    """Pallas CRF kernels (interpret mode on CPU) == blocked-scan path:
    transpost, Viterbi scores/paths/backpointers, traceback."""
    import flappie_tpu.ops.crf as crf_mod

    B, T, nbase = 3, 45, 4
    idx = crf_mod.flipflop_index(nbase)
    trans = jnp.asarray(rnd(B, T, idx.nparam, scale=2.0))
    nblocks = jnp.asarray(np.array([45, 33, 20], np.int32))

    want_tp = crf_mod.crf_transpost(trans, nblocks, nbase)
    want_v = crf_mod.crf_viterbi(trans, nblocks, nbase)

    monkeypatch.setattr(crf_mod, "_use_pallas", lambda: True)
    got_tp = crf_mod.crf_transpost(trans, nblocks, nbase)
    got_v = crf_mod.crf_viterbi(trans, nblocks, nbase)

    np.testing.assert_allclose(np.asarray(want_tp), np.asarray(got_tp), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(want_v[0]), np.asarray(got_v[0]), rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(want_v[1]), np.asarray(got_v[1]))  # paths
    q_w, q_g = np.asarray(want_v[2]), np.asarray(got_v[2])
    np.testing.assert_allclose(q_w[:, 1:], q_g[:, 1:], rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("force_pallas", [False, True])
def test_viterbi_tie_break_matches_reference(monkeypatch, force_pallas):
    """Exact score ties must resolve as the C decode loops do
    (decode.c:153-180): flop destinations keep the STAY, flip
    destinations the lowest from-state.  Real models hit exact ties
    when the tanh output head saturates."""
    import flappie_tpu.ops.crf as crf_mod

    if force_pallas:
        monkeypatch.setattr(crf_mod, "_use_pallas", lambda: True)
    nbase, nstate = 4, 8
    nparam = 40
    T = 1
    trans = np.full((1, T, nparam), -5.0, np.float32)
    # block 0 starts from alpha = 0 everywhere, so equal transition
    # weights produce exact ties.
    off = nbase * nstate
    trans[0, 0, off + 0] = 1.0          # move flip0 -> flop0
    trans[0, 0, off + nbase + 0] = 1.0  # stay flop0 -> flop0 (tie)
    trans[0, 0, 0 * nstate + 2] = 2.0   # into flip0 from state 2
    trans[0, 0, 0 * nstate + 5] = 2.0   # into flip0 from state 5 (tie)
    _, last, backptr = crf_mod.crf_viterbi_forward(
        jnp.asarray(trans), jnp.asarray([T]), nbase
    )
    bp = np.asarray(backptr)[0, 0]
    assert bp[nbase + 0] == nbase + 0, "flop tie must keep the stay"
    assert bp[0] == 2, "flip tie must keep the lowest from-state"


def test_rle_viterbi_tie_break_matches_reference():
    """RLE stay destinations prefer the MOVE on exact ties
    (decode.c:981-995: `if (stay_score > move_score)`)."""
    import flappie_tpu.ops.crf as crf_mod

    nbase = 4
    idx = crf_mod.rle_index(nbase)
    T = 1
    trans = np.full((1, T, idx.nparam), -5.0, np.float32)
    # to = stay of base 1 (state 5): set move (from 1) == stay (from 5)
    move_p = idx.param_idx[1, nbase + 1]
    stay_p = idx.param_idx[nbase + 1, nbase + 1]
    trans[0, 0, move_p] = 1.5
    trans[0, 0, stay_p] = 1.5
    _, _, backptr = crf_mod.crf_viterbi_forward(
        jnp.asarray(trans), jnp.asarray([T]), nbase, idx=idx
    )
    assert np.asarray(backptr)[0, 0, nbase + 1] == 1, "RLE stay tie must keep the move"


def test_ff_dot_high3_matches_f32_within_band():
    """The in-kernel block-affine 'high3' tier (manual 3-pass bf16
    emulation of Precision.HIGH, used on TPU where Mosaic cannot lower
    HIGH natively) reproduces the true-f32 product to the ~2^-21
    relative band on realistic magnitudes."""
    from jax import lax

    from flappie_tpu.ops.rnn_pallas import _ff_dot

    rng = np.random.default_rng(11)
    x = rng.normal(0, 1.5, size=(96, 64)).astype(np.float32)
    w = rng.normal(0, 0.5, size=(64, 128)).astype(np.float32)
    exact = np.asarray(
        _ff_dot(jnp.asarray(x), jnp.asarray(w), lax.Precision.HIGHEST)
    )
    h3 = np.asarray(_ff_dot(jnp.asarray(x), jnp.asarray(w), "high3"))
    # error relative to the product scale (cancellation points make
    # element-wise relative error meaningless); the dropped lo*lo term
    # bounds it around 2^-17 over the K=64 accumulation
    rel = np.abs(h3 - exact).max() / np.abs(exact).max()
    assert rel < 2e-5


def test_fused_affine_ffprec_resolution():
    """The in-kernel FF tier: HIGH lowers to the manual bf16x3 ONLY on
    TPU; everywhere else it clamps to HIGHEST (true f32) so the CPU
    parity suite keeps bit-exact affines.  Explicit tiers pass through
    unchanged."""
    from jax import lax

    from flappie_tpu.ops.rnn_pallas import _resolve_ffprec

    assert _resolve_ffprec(lax.Precision.HIGH, "tpu") == "high3"
    assert _resolve_ffprec(lax.Precision.HIGH, "cpu") == lax.Precision.HIGHEST
    assert _resolve_ffprec(lax.Precision.HIGH, "gpu") == lax.Precision.HIGHEST
    for p in (lax.Precision.HIGHEST, lax.Precision.DEFAULT):
        assert _resolve_ffprec(p, "tpu") == p
        assert _resolve_ffprec(p, "cpu") == p


def test_rnn_precision_default_is_backend_dependent(monkeypatch):
    """The recurrent-matmul tier defaults to true f32 off-TPU (the
    manual bf16x3 emulation would really execute on CPU and perturb
    the parity suite) and HIGH on TPU (byte parity certified on chip,
    docs/PROBE_rnnprec_r3.json); the env var still pins either."""
    import jax
    from jax import lax

    import flappie_tpu.ops.precision as prec

    monkeypatch.setattr(prec, "_rnn_precision", None)
    expect = (lax.Precision.HIGH if jax.default_backend() == "tpu"
              else lax.Precision.HIGHEST)
    assert prec.rnn_precision() == expect

    monkeypatch.setattr(prec, "_rnn_precision", lax.Precision.HIGHEST)
    assert prec.rnn_precision() == lax.Precision.HIGHEST
