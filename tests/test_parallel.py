"""Mesh sharding + training-step tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flappie_tpu.models.config import get_model_config
from flappie_tpu.models.params import init_synthetic
from flappie_tpu.ops.crf import path_score
from flappie_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from flappie_tpu.train import make_train_step, nll_loss, synthetic_batch


@pytest.fixture(scope="module")
def cfg():
    return get_model_config("r941_native")


@pytest.fixture(scope="module")
def params(cfg):
    return init_synthetic(cfg, seed=0)


def test_path_score_matches_qpath(cfg, params):
    from flappie_tpu.models.network import transitions
    from flappie_tpu.ops.crf import crf_viterbi

    rng = np.random.default_rng(0)
    sig = rng.normal(size=(1, 512)).astype(np.float32)
    trans, nblocks = transitions(params, cfg, jnp.asarray(sig), jnp.asarray([512]))
    score, path, qpath = crf_viterbi(trans, nblocks, cfg.nbase)
    ps = path_score(trans, path, nblocks, cfg.nbase)
    # path_score of the Viterbi path == Viterbi score
    np.testing.assert_allclose(np.asarray(ps), np.asarray(score), rtol=1e-5, atol=1e-4)


def test_train_step_reduces_loss(cfg, params):
    train_step, optimizer = make_train_step(cfg)
    opt_state = optimizer.init(params)
    signal, lengths, path = synthetic_batch(cfg, B=2, T=512, seed=3)
    signal, lengths, path = jnp.asarray(signal), jnp.asarray(lengths), jnp.asarray(path)
    l0 = float(nll_loss(params, cfg, signal, lengths, path))
    p, s = params, opt_state
    for _ in range(5):
        p, s, loss = train_step(p, s, signal, lengths, path)
    l1 = float(nll_loss(p, cfg, signal, lengths, path))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0, f"loss did not decrease: {l0} -> {l1}"


def test_dp_sharded_matches_single_device(cfg, params):
    """Data-parallel execution over the mesh == single-device result."""
    from flappie_tpu.models.network import transitions

    rng = np.random.default_rng(1)
    B, T = 8, 512
    sig = rng.normal(size=(B, T)).astype(np.float32)
    lengths = np.full(B, T, np.int32)

    solo, nb_solo = transitions(params, cfg, jnp.asarray(sig), jnp.asarray(lengths))

    mesh = make_mesh(n_data=8, n_model=1)
    with mesh:
        p = shard_params(params, mesh)
        s, l = shard_batch(mesh, jnp.asarray(sig), jnp.asarray(lengths))
        sharded, nb = transitions(p, cfg, s, l)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(solo), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(nb), np.asarray(nb_solo))


def test_tp_sharded_matches_single_device(cfg, params):
    """Tensor-parallel gate dims over 'model' == single-device result."""
    from flappie_tpu.models.network import transitions

    rng = np.random.default_rng(2)
    B, T = 4, 256
    sig = rng.normal(size=(B, T)).astype(np.float32)
    lengths = np.full(B, T, np.int32)
    solo, _ = transitions(params, cfg, jnp.asarray(sig), jnp.asarray(lengths))

    mesh = make_mesh(n_data=2, n_model=4)
    with mesh:
        p = shard_params(params, mesh)
        s, l = shard_batch(mesh, jnp.asarray(sig), jnp.asarray(lengths))
        sharded, _ = transitions(p, cfg, s, l)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(solo), rtol=1e-4, atol=1e-4
    )


def test_graft_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    score, path, qpath, nblocks, trace = out
    assert np.asarray(score).shape == (2,)
    assert np.isfinite(np.asarray(score)).all()


def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_distributed_basecaller_matches_solo(cfg, params):
    """DistributedBasecaller over the 8-device mesh == plain Basecaller,
    including batch padding to the data-axis size (zero-length rows)."""
    from flappie_tpu.basecall import Basecaller
    from flappie_tpu.parallel.pipeline import DistributedBasecaller

    rng = np.random.default_rng(4)
    B, T = 5, 2048  # B=5 forces padding to 8
    sig = rng.normal(size=(B, T)).astype(np.float32)
    lengths = np.array([T, T - 100, T - 999, 1500, 1111], np.int32)

    solo = Basecaller(cfg, params=params, compute_trace=False)
    dist = DistributedBasecaller(cfg, params=params, compute_trace=False)
    a = solo.call_batch(sig, lengths)
    b = dist.call_batch(sig, lengths)
    for x, y, name in zip(a, b, ["score", "path", "qpath", "nblocks", "trace"]):
        assert x.shape == y.shape, name
        if name == "qpath":
            np.testing.assert_allclose(x[:, 1:], y[:, 1:], rtol=1e-4, atol=1e-4)
        elif x.dtype.kind == "f":
            np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-4, err_msg=name)
        else:
            np.testing.assert_array_equal(x, y, err_msg=name)


def test_zero_length_rows_are_nan_isolated(cfg, params):
    from flappie_tpu.models.network import transitions

    rng = np.random.default_rng(5)
    sig = rng.normal(size=(2, 1024)).astype(np.float32)
    out, nb = transitions(params, cfg, jnp.asarray(sig), jnp.asarray([1024, 0]))
    out = np.asarray(out)
    assert np.isfinite(out[0]).all()  # live row unaffected by dead row


def test_chunk_plan_coverage():
    from flappie_tpu.parallel.chunking import plan_chunks

    for n in (5000, 16000, 16001, 37590, 100001):
        plan = plan_chunks(n, 5, chunk=16000, overlap=2000)
        assert plan.cuts[0] == 0 and plan.cuts[-1] == -(-n // 5)
        assert all(b > a for a, b in zip(plan.cuts, plan.cuts[1:]))
        # every chunk's assigned range lies within its local blocks
        for i in range(plan.nchunk):
            g0 = plan.starts[i] // 5
            local = -(-min(plan.chunk, n - plan.starts[i]) // 5)
            assert plan.cuts[i] >= g0
            assert plan.cuts[i + 1] - g0 <= local


def test_chunked_matches_full_read(cfg, params):
    """Chunk+stitch path agrees with the full-read path away from the
    (decaying) recurrent context at chunk borders."""
    from flappie_tpu.basecall import Basecaller
    from flappie_tpu.io.crp import read_crp

    sig = read_crp("/root/reference/src/test/normalised_signal.crp").reshape(-1)
    from flappie_tpu.signal.preprocess import RawTable

    caller = Basecaller(cfg, params=params, compute_trace=False)
    # bypass preprocessing: signal already normalised
    rt = RawTable("u", sig.size, 0, sig.size, sig.copy())
    full = caller.basecall_raw_tables([rt], trim_start=0, trim_end=0, varseg_thresh=0.0)[0]

    rt2 = RawTable("u", sig.size, 0, sig.size, sig.copy())
    # chunked path normalises internally; med-MAD of an already
    # normalised signal is ~identity up to scale, so compare paths via
    # direct call on the same normalised data:
    import numpy as _np

    rt2 = RawTable("u", sig.size, 0, sig.size, sig.copy())
    chunked = caller.basecall_read_chunked(
        rt2, chunk=16000, overlap=2000, trim_start=0, trim_end=0,
        varseg_chunk=100, varseg_thresh=0.0,
    )
    assert chunked is not None
    assert chunked.nblock == full.nblock
    # sequences should agree almost everywhere
    a, b = full.basecall, chunked.basecall
    assert abs(len(a) - len(b)) <= max(3, 0.01 * len(a))
    n = min(len(a), len(b))
    agree = sum(x == y for x, y in zip(a[: n // 2], b[: n // 2])) / (n // 2)
    assert agree > 0.95, f"prefix agreement {agree}"


# ---------------------------------------------------------------------------
# flip-flop sequence NLL (CTC-style)
# ---------------------------------------------------------------------------


def _brute_force_seq_logprob(trans, states):
    """Enumerate all monotonic alignments of the state chain onto the
    T blocks (path[0]=states[0], path[T]=states[-1])."""
    from itertools import product

    import oracle

    T = trans.shape[0]
    L = len(states)
    nbase = 4
    best = []
    # alignment = nondecreasing map pos: [0..T] -> [0..L-1], pos[0]=0, pos[T]=L-1
    def rec(t, i, acc):
        if t == T:
            if i == L - 1:
                best.append(acc)
            return
        # stay
        rec(t + 1, i, acc + trans[t][oracle.trans_lookup(states[i], states[i], nbase)])
        if i + 1 < L:
            rec(t + 1, i + 1, acc + trans[t][oracle.trans_lookup(states[i], states[i + 1], nbase)])

    rec(0, 0, 0.0)
    m = max(best)
    return m + np.log(np.sum(np.exp(np.array(best) - m)))


def test_flipflop_encode():
    from flappie_tpu.train.ctc import flipflop_encode, flipflop_encode_jnp

    y = np.array([[0, 0, 0, 1, 1, 2, 1]])
    states = flipflop_encode(y, np.array([7]), 4)
    # A A(flop) A(flip) C C(flop) G C(flip)
    assert states[0].tolist() == [0, 4, 0, 1, 5, 2, 1]
    states2 = np.asarray(flipflop_encode_jnp(jnp.asarray(y), jnp.asarray([7]), 4))
    np.testing.assert_array_equal(states, states2)


def test_ctc_nll_matches_brute_force():
    from flappie_tpu.train.ctc import flipflop_encode, flipflop_ctc_nll

    rng = np.random.default_rng(9)
    T, nparam = 6, 40
    trans = (rng.normal(size=(T, nparam)) * 0.5).astype(np.float32)
    y = np.array([[0, 2, 2, 1]])
    lengths = np.array([4])
    states = flipflop_encode(y, lengths, 4)
    want = _brute_force_seq_logprob(trans.astype(np.float64), states[0].tolist())
    got = flipflop_ctc_nll(
        jnp.asarray(trans)[None], jnp.asarray([T]), jnp.asarray(states),
        jnp.asarray(lengths), 4,
    )
    np.testing.assert_allclose(-np.asarray(got)[0], want, rtol=1e-5, atol=1e-5)


def test_ctc_single_alignment_equals_path_score():
    """L == T+1 forces all-moves: NLL == -sum of move weights."""
    from flappie_tpu.train.ctc import flipflop_encode, flipflop_ctc_nll
    import oracle

    rng = np.random.default_rng(10)
    T = 5
    trans = (rng.normal(size=(T, 40)) * 0.5).astype(np.float32)
    y = np.array([[0, 1, 2, 3, 0, 2]])
    lengths = np.array([6])
    states = flipflop_encode(y, lengths, 4)[0]
    want = sum(
        trans[t][oracle.trans_lookup(states[t], states[t + 1], 4)] for t in range(T)
    )
    got = flipflop_ctc_nll(
        jnp.asarray(trans)[None], jnp.asarray([T]),
        jnp.asarray(states)[None], jnp.asarray(lengths), 4,
    )
    np.testing.assert_allclose(-np.asarray(got)[0], want, rtol=1e-5, atol=1e-5)


def test_ctc_train_step_reduces_loss(cfg, params):
    from flappie_tpu.train.ctc import flipflop_encode, make_ctc_train_step

    rng = np.random.default_rng(11)
    B, T = 2, 512
    signal = rng.normal(size=(B, T)).astype(np.float32)
    lengths = np.full(B, T, np.int32)
    L = 40
    y = rng.integers(0, 4, size=(B, L))
    tl = np.array([L, L - 5])
    states = flipflop_encode(y, tl, cfg.nbase)

    train_step, optimizer = make_ctc_train_step(cfg)
    opt_state = optimizer.init(params)
    p = params
    losses = []
    for _ in range(4):
        p, opt_state, loss = train_step(
            p, opt_state, jnp.asarray(signal), jnp.asarray(lengths),
            jnp.asarray(states), jnp.asarray(tl),
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
