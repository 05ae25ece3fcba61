"""Runnie (RLE) path tests: device decode vs oracle, .run format, FASTA."""

import io

import numpy as np
import pytest

import jax.numpy as jnp

import oracle
from flappie_tpu.decode.runlength import (
    RunRecord,
    dwmean,
    rle_transpost,
    rle_viterbi,
    runlength_to_basecall,
    runlengths_mean,
    runs_from_path,
)
from flappie_tpu.io.run_format import (
    read_run_records,
    rlc_basecall,
    runlength_basecall,
    wrap_fasta,
    write_run_record,
)

RNG = np.random.default_rng(7)


def make_params(T, nbase=4):
    ntrans = 2 * nbase * nbase
    shape = 1.0 + np.abs(RNG.normal(size=(T, nbase))).astype(np.float32)
    scale = 0.5 + np.abs(RNG.normal(size=(T, nbase))).astype(np.float32)
    trans = (RNG.normal(size=(T, ntrans)) * 2).astype(np.float32)
    return np.concatenate([shape, scale, trans], axis=-1)


def test_rle_viterbi_path_convention():
    T, nbase = 35, 4
    params = make_params(T)
    wscore, wpath = oracle.rle_viterbi(params[:, 8:].astype(np.float64), nbase)
    score, path = rle_viterbi(jnp.asarray(params)[None], jnp.asarray([T]), nbase)
    np.testing.assert_allclose(np.asarray(score)[0], wscore, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(path)[0], wpath)


def test_rle_transpost_copies_shape_scale():
    T, nbase = 20, 4
    params = make_params(T)
    post = np.asarray(rle_transpost(jnp.asarray(params)[None], jnp.asarray([T]), nbase))[0]
    np.testing.assert_array_equal(post[:, :8], params[:, :8])
    assert post.shape == params.shape
    # posterior block differs from raw trans and is finite
    assert np.isfinite(post[:, 8:]).all()
    assert not np.allclose(post[:, 8:], params[:, 8:])


def test_runs_from_path_dwell_semantics():
    nbase = 4
    # path: A move, stay, stay, C move, stay, G move
    path = np.array([0, 4, 4, 1, 5, 2])
    params = np.zeros((6, 40), np.float32)
    params[:, :4] = np.arange(6)[:, None] + 1  # shape = blk+1
    params[:, 4:8] = 10.0
    runs = runs_from_path(params, path, 6, nbase)
    assert [r.base for r in runs] == ["A", "C", "G"]
    assert [r.dwell for r in runs] == [3, 2, 1]
    assert runs[0].shape == 1.0 and runs[1].shape == 4.0


def test_run_format_roundtrip():
    runs = [RunRecord("A", 1.5, 2.25, 3), RunRecord("T", 1.0, 0.5, 1)]
    buf = io.StringIO()
    write_run_record(buf, "uuid-x", runs)
    text = buf.getvalue()
    assert text.startswith("# uuid-x\nA\t1.500000\t2.250000\t3\n")
    name, rows = next(read_run_records(io.StringIO(text)))
    assert name == "uuid-x"
    assert rows[0][0] == "A" and float(rows[0][2]) == 2.25


def test_runlength_basecall_estimator():
    rows = [["A", "1.0", "3.7", "2"], ["C", "1.0", "0.4", "1"], ["G", "1.0", "1.0", "5"]]
    # scale factors default: A 1.02 -> floor(3.774)=3; C 1.04*0.4=0.416 -> max(1, 0)=1
    seq = runlength_basecall(rows)
    assert seq == "AAAC" + "G" * max(1, int(np.floor(1.0 * 1.04)))
    assert rlc_basecall(rows) == "ACG"
    assert runlength_basecall([]) is None


def test_wrap_fasta():
    s = wrap_fasta("r", "A" * 130, 60)
    lines = s.splitlines()
    assert lines[0] == ">r"
    assert len(lines[1]) == 60 and len(lines[3]) == 10


def test_dwmean_and_runlengths():
    # dwmean: sum over i of exp(-(i/scale)^shape)
    v = dwmean(1.0, 2.0, 100)
    i = np.arange(1, 101)
    assert abs(v - np.exp(-(i / 2.0)).sum()) < 1e-9
    params = np.zeros((3, 40))
    params[:, :4] = 1.0
    params[:, 4:8] = 2.0
    path = np.array([0, -1, 2])
    runs = runlengths_mean(params, path)
    assert runs[1] == 0 and runs[0] == runs[2] == 1 + round(dwmean(1.0, 2.0))
    assert runlength_to_basecall(path, runs) == "A" * runs[0] + "G" * runs[2]


def test_runnie_cli_end_to_end(tmp_path, capsys):
    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.signal.fast5 import write_single_read_fast5
    from flappie_tpu.cli.runnie import main as runnie_main
    from flappie_tpu.cli.decode_runnie import main as decode_main

    raw = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    f5 = tmp_path / "r.fast5"
    write_single_read_fast5(str(f5), raw[:9000], "runnie-read")
    runfile = tmp_path / "out.run"
    rc = runnie_main([str(f5), "-o", str(runfile)])
    assert rc == 0
    text = runfile.read_text()
    assert text.startswith("# runnie-read\n")
    rows = [l.split("\t") for l in text.splitlines()[1:]]
    assert len(rows) > 10
    assert all(r[0] in "ACGT" and float(r[1]) >= 1.0 and int(r[3]) >= 1 for r in rows)

    rc = decode_main([str(runfile)])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith(">runnie-read\n")
    seq = "".join(out.splitlines()[1:])
    assert len(seq) >= len(rows)
    assert set(seq) <= set("ACGT")


def test_runnie_cli_batched_multi_read(tmp_path):
    """Batched dispatch (round 2): several reads of different lengths
    batch through the engine; .run records come back in input order and
    match the per-read invocations byte-for-byte."""
    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.signal.fast5 import write_single_read_fast5
    from flappie_tpu.cli.runnie import main as runnie_main

    raw = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    lens = [9000, 6000, 9000]
    files = []
    for k, n in enumerate(lens):
        f5 = tmp_path / f"r{k}.fast5"
        write_single_read_fast5(str(f5), raw[:n], f"read-{k}")
        files.append(str(f5))

    batched = tmp_path / "batched.run"
    assert runnie_main(files + ["-o", str(batched)]) == 0

    singles = []
    for k, fn in enumerate(files):
        single = tmp_path / f"single{k}.run"
        assert runnie_main([fn, "-o", str(single)]) == 0
        singles.append(single.read_text())

    # Batch size changes XLA reduction tiling, so float fields can move
    # by an ulp in the last printed digit; the contract is the .run
    # parity band (base+dwell exact, shape/scale within 2e-5), with
    # records in input order.
    bl = batched.read_text().splitlines()
    sl = "".join(singles).splitlines()
    assert len(bl) == len(sl)
    for a, b in zip(bl, sl):
        if a == b:
            continue
        fa, fb = a.split("\t"), b.split("\t")
        assert len(fa) == len(fb) == 4, (a, b)
        assert fa[0] == fb[0] and fa[3] == fb[3], (a, b)
        assert abs(float(fa[1]) - float(fb[1])) < 2e-5, (a, b)
        assert abs(float(fa[2]) - float(fb[2])) < 2e-5, (a, b)


def test_decode_runnie_threads_matches_serial(tmp_path, capsys):
    """--threads N (misc/decode_runnie.py:46-47,139) preserves input
    order and bytes."""
    from flappie_tpu.cli.decode_runnie import main as decode_main

    runfile = tmp_path / "multi.run"
    rng = __import__("numpy").random.default_rng(5)
    with open(runfile, "w") as fh:
        for r in range(6):
            fh.write(f"# read-{r}\n")
            for _ in range(40):
                b = "ACGT"[rng.integers(4)]
                fh.write(f"{b}\t{1+rng.random():.6f}\t{1+9*rng.random():.6f}\t{rng.integers(1,5)}\n")

    assert decode_main([str(runfile)]) == 0
    serial = capsys.readouterr().out
    assert decode_main(["--threads", "3", str(runfile)]) == 0
    threaded = capsys.readouterr().out
    assert threaded == serial
    assert serial.count(">") == 6


def test_runnie_cli_fast_flag(tmp_path, monkeypatch):
    """--fast sets the bf16 stream policy before the first trace and
    still produces a valid .run file (band certified on hardware,
    tools/fast_mode_accuracy.py)."""
    import os

    from flappie_tpu.cli.runnie import main as runnie_main
    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.signal.fast5 import write_single_read_fast5

    monkeypatch.delenv("FLAPPIE_TPU_RNN_STREAM", raising=False)
    raw = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    f5 = tmp_path / "r.fast5"
    write_single_read_fast5(str(f5), raw[:9000], "runnie-read")
    runfile = tmp_path / "out.run"
    try:
        rc = runnie_main(["--fast", str(f5), "-o", str(runfile)])
        assert rc == 0
        assert os.environ.get("FLAPPIE_TPU_RNN_STREAM") == "bf16"
    finally:
        # main() mutates the process env; a leaked bf16 policy would
        # silently detune any parity test traced later in this process
        os.environ.pop("FLAPPIE_TPU_RNN_STREAM", None)
    assert runfile.read_text().startswith("# runnie-read\n")


def test_runnie_i16_upload_matches_f32(tmp_path, monkeypatch):
    """The halved-bytes int16 ADC upload yields a byte-identical .run
    file to the f32 upload on XLA:CPU (the device prologue replays the
    exact host normalisation; see basecall._unpack_i16)."""
    from flappie_tpu.cli.runnie import main as runnie_main
    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.signal.fast5 import write_single_read_fast5

    raw = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    f5 = tmp_path / "r.fast5"
    write_single_read_fast5(str(f5), raw[:9000], "runnie-read")

    monkeypatch.setenv("FLAPPIE_TPU_UPLOAD", "f32")
    a = tmp_path / "f32.run"
    assert runnie_main([str(f5), "-o", str(a)]) == 0

    # guard: the fixture read really is i16-capable (otherwise the i16
    # run would silently fall back to f32 and the comparison is vacuous)
    from flappie_tpu.basecall import _i16_capable
    from flappie_tpu.signal.fast5 import read_raw
    from flappie_tpu.signal.preprocess import normalise_signal, trim_and_segment

    rt = trim_and_segment(read_raw(str(f5), scale_to_pA=True), 200, 10, 100, 0.0)
    normalise_signal(rt, 0.0)
    assert _i16_capable(rt)

    monkeypatch.setenv("FLAPPIE_TPU_UPLOAD", "i16")
    b = tmp_path / "i16.run"
    assert runnie_main([str(f5), "-o", str(b)]) == 0

    assert b.read_bytes() == a.read_bytes()


# ---------------------------------------------------------------------------
# V1 run-length decoders (reference src/decode.c:692-892) vs a direct
# transcription of the C loops
# ---------------------------------------------------------------------------


def _c_decode_runlength(param):
    """Transcription of decode_runlength (src/decode.c:692-770).

    param: [T, 4*nbase] float32.  Returns (logscore, path) with the
    reference's conventions (first-argmax move ties, stay on strict >).
    """
    T, nparam = param.shape
    nbase = nparam // 4
    prev = np.zeros(nbase, np.float32)
    tb = np.zeros((T, nbase), np.int64)
    for blk in range(T):
        move = param[blk, 2 * nbase : 3 * nbase]
        stay = param[blk, 3 * nbase :]
        idx = int(np.argmax(prev))
        mx = prev[idx]
        tmp = prev.copy()
        tmp[idx] = -np.inf
        idx2 = int(np.argmax(tmp))
        curr = np.full(nbase, mx, np.float32)
        tb[blk, :] = idx
        curr[idx] = prev[idx2]
        tb[blk, idx] = idx2
        curr = (curr + move).astype(np.float32)
        for b in range(nbase):
            st = np.float32(prev[b] + stay[b])
            if st > curr[b]:
                curr[b] = st
                tb[blk, b] = b + nbase
        prev = curr
    path = np.full(T, -1, np.int64)
    last = int(np.argmax(prev))
    logscore = prev[last]
    for blk in range(T, 0, -1):
        state = tb[blk - 1, last]
        if state < nbase:
            path[blk - 1] = last
            last = int(state)
    return float(logscore), path


def _c_posterior_runlength(param):
    """Transcription of posterior_runlength (src/decode.c:795-892),
    in float64 (the tolerance oracle; fwd/bwd ordering differences are
    washout-level)."""
    T, nparam = param.shape
    nbase = nparam // 4
    p = param.astype(np.float64)
    fwd = np.zeros((T + 1, nbase))
    for blk in range(T):
        move = p[blk, 2 * nbase : 3 * nbase]
        stay = p[blk, 3 * nbase :]
        for b1 in range(nbase):
            others = [fwd[blk, b2] for b2 in range(nbase) if b2 != b1]
            fwd[blk + 1, b1] = np.logaddexp.reduce(others) + move[b1]
        for b in range(nbase):
            fwd[blk + 1, b] = np.logaddexp(fwd[blk + 1, b], fwd[blk, b] + stay[b])
    post = np.zeros((T, nparam))
    curr = np.zeros(nbase)
    for blk in range(T - 1, -1, -1):
        move = p[blk, 2 * nbase : 3 * nbase]
        stay = p[blk, 3 * nbase :]
        prev = curr.copy()
        for b1 in range(nbase):
            others = [prev[b2] + move[b2] for b2 in range(nbase) if b2 != b1]
            curr[b1] = np.logaddexp.reduce(others)
            post[blk, 2 * nbase + b1] = (
                np.logaddexp.reduce([fwd[blk, b2] for b2 in range(nbase) if b2 != b1])
                + prev[b1] + move[b1]
            )
        for b in range(nbase):
            curr[b] = np.logaddexp(curr[b], prev[b] + stay[b])
            post[blk, 3 * nbase + b] = fwd[blk, b] + stay[b] + prev[b]
    return post


def test_rle_v1_viterbi_matches_c_loops():
    from flappie_tpu.decode.runlength import rle_v1_viterbi

    rng = np.random.default_rng(7)
    B, T, nbase = 3, 23, 4
    params = rng.normal(0, 2, size=(B, T, 4 * nbase)).astype(np.float32)
    # inject exact ties to exercise the tie ranks
    params[:, 5, 2 * nbase :] = 0.0
    params[:, 6, :] = params[:, 5, :]
    nblocks = np.array([T, 17, 1], np.int32)
    score, path = rle_v1_viterbi(jnp.asarray(params), jnp.asarray(nblocks), nbase)
    score, path = np.asarray(score), np.asarray(path)
    for b in range(B):
        ref_score, ref_path = _c_decode_runlength(params[b, : nblocks[b]])
        assert np.isclose(score[b], ref_score, rtol=0, atol=1e-5), b
        np.testing.assert_array_equal(path[b, : nblocks[b]], ref_path)
        assert (path[b, nblocks[b] :] == -1).all()


def test_rle_v1_posterior_matches_oracle():
    from flappie_tpu.decode.runlength import rle_v1_posterior

    rng = np.random.default_rng(11)
    B, T, nbase = 2, 19, 4
    params = rng.normal(0, 1.5, size=(B, T, 4 * nbase)).astype(np.float32)
    nblocks = np.array([T, 12], np.int32)
    post = np.asarray(rle_v1_posterior(jnp.asarray(params), jnp.asarray(nblocks), nbase))
    for b in range(B):
        ref = _c_posterior_runlength(params[b, : nblocks[b]])
        got = post[b, : nblocks[b]]
        assert np.allclose(got[:, 2 * nbase :], ref[:, 2 * nbase :],
                           rtol=1e-4, atol=1e-4)
        assert (got[:, : 2 * nbase] == 0).all()


def test_runlengths_unit():
    from flappie_tpu.decode.runlength import runlengths_unit

    path = np.array([2, -1, 0, -1, -1, 3], np.int64)
    np.testing.assert_array_equal(
        runlengths_unit(path), [1, 0, 1, 0, 0, 1]
    )
