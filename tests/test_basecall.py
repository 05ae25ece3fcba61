"""End-to-end basecalling tests: decode path -> strings -> CLI output.

The reference weights are LFS pointers, so end-to-end runs use
deterministic synthetic checkpoints; decode/formatting semantics are
still pinned against the numpy oracle and the C format strings.
"""

import io
import subprocess
import sys

import numpy as np
import pytest

import oracle
from flappie_tpu.basecall import Basecaller, bucket_length
from flappie_tpu.decode.seq import change_positions, path_to_basecall, phred_chars
from flappie_tpu.io.crp import read_crp
from flappie_tpu.io.fastx import BasecallResult, format_fasta, format_fastq, format_sam
from flappie_tpu.signal.preprocess import RawTable

FIX = "/root/reference/src/test"


@pytest.fixture(scope="module")
def norm_signal():
    return read_crp(f"{FIX}/normalised_signal.crp").reshape(-1)


@pytest.fixture(scope="module")
def caller():
    return Basecaller("r941_native", seed=0, compute_trace=True)


def _fake_rt(sig):
    raw = sig.copy()
    return RawTable("uuid-1234", raw.size, 0, raw.size, raw)


def test_change_positions_semantics():
    # npos excludes the final path entry (reference quirk)
    path = np.array([0, 0, 1, 1, 2, 3])
    idx = change_positions(path, 5)  # only first 5 entries
    assert idx.tolist() == [2, 4]


def test_phred_chars_known_values():
    # p=0.9 -> q=10 -> chr(43) '+'; p->1 clipped at 0.99999 -> q=50 -> 'S'
    assert phred_chars(np.array([0.9], np.float32))[0] == ord("+")
    assert phred_chars(np.array([0.999999], np.float32))[0] == 33 + 50
    # tiny p -> q ~ 0 -> '!'
    assert phred_chars(np.array([1e-8], np.float32))[0] == 33


def test_path_to_basecall_matches_manual():
    nbase = 4
    path = np.array([0, 0, 5, 5, 2, 2, 1])  # nblock = 6 -> entries 0..5 compared
    qpath = np.log(np.array([np.nan, 0.5, 0.9, 0.8, 0.7, 0.6, 0.5], np.float32))
    seq, qual = path_to_basecall(path, qpath, 6, nbase)
    # changes at idx 2 (5 -> flop of C... 5 % 4 = 1 -> C) and idx 4 (2 -> G)
    assert seq == "CG"
    assert len(qual) == 2
    assert qual[0] == chr(phred_chars(np.array([0.9], np.float32))[0])


def test_fastq_format_exact():
    res = BasecallResult(
        uuid="abcd-1234",
        score=-1234.5,
        basecall="ACGT",
        quality="!!+S",
        nblock=100,
        nsample=5000,
        trim_start=200,
        trim_end=4990,
    )
    got = format_fastq("abcd-1234", "read.fast5", True, "px", res)
    assert got == (
        '@pxabcd-1234  { "filename" : "read.fast5", "uuid" : "abcd-1234", '
        '"normalised_score" : 12.345000,  "nblock" : 100,  '
        '"sequence_length" : 4,  "blocks_per_base" : 25.000000, '
        '"nsample" : 5000, "trim" : [ 200, 4990 ] }\n'
        "ACGT\n+\n!!+S\n"
    )


def test_sam_double_print_quirk():
    res = BasecallResult(
        uuid="u", score=-1.0, basecall="ACGT", quality="!!!!",
        nblock=5, nsample=10, trim_start=0, trim_end=10,
    )
    got = format_sam("u", "r", True, "", res)
    assert got == "u\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\t!!!!\nACGT\t!!!!\n"


def test_fasta_format():
    res = BasecallResult(
        uuid="u", score=-2.0, basecall="AC", quality=None,
        nblock=4, nsample=10, trim_start=1, trim_end=9,
    )
    got = format_fasta("u", "r.fast5", False, "", res)
    assert got.startswith('>r.fast5  { "filename" : "r.fast5", "uuid" : "u", ')
    assert got.endswith("}\nAC\n")


def test_bucket_length():
    assert bucket_length(1) == 2048
    assert bucket_length(2048) == 2048
    assert bucket_length(2049) == 4096
    assert bucket_length(37000) == 65536


def test_end_to_end_matches_oracle(norm_signal, caller):
    """Full device pipeline vs the pure-numpy oracle on a real signal."""
    sig = norm_signal[:4000]
    rt = RawTable("u", sig.size, 0, sig.size, sig.copy())
    # bypass trim/normalise (signal already normalised): call device directly
    T = bucket_length(sig.size)
    buf = np.zeros((1, T), np.float32)
    buf[0, : sig.size] = sig
    score, path, qpath, nblocks, trace = caller.call_batch(buf, np.array([sig.size]))
    nblk = int(nblocks[0])

    # Oracle: full forward in float64 from the same weights
    from flappie_tpu.models.params import flatten

    p = {k: np.asarray(v, np.float64) for k, v in flatten(caller.params).items()}
    cfg = caller.cfg
    x = sig.astype(np.float64)[:, None]
    for i, c in enumerate(cfg.convs):
        x = oracle.conv_same(x, p[f"conv{i}/W"], p[f"conv{i}/b"], c.stride)
        x = oracle.swish(x)
    for i, r in enumerate(cfg.rnns):
        xa = oracle.affine(x, p[f"rnn{i}/iW"], p[f"rnn{i}/b"])
        x = oracle.run_rnn(xa, p[f"rnn{i}/sW"], r.kind, r.backward)
    trans = oracle.globalnorm_flipflop(x, p["ff/W"], p["ff/b"], 1.0, cfg.nbase)
    assert trans.shape[0] == nblk
    tpost = oracle.ff_transpost(trans, cfg.nbase)
    oscore, opath, oqpath = oracle.ff_viterbi(tpost, cfg.nbase)

    np.testing.assert_allclose(score[0], oscore, rtol=1e-3, atol=0.5)
    agree = (path[0, : nblk + 1] == opath).mean()
    assert agree > 0.999, f"path agreement {agree}"


def test_basecall_raw_tables_pipeline(norm_signal, caller):
    # Feed unnormalised-ish signal through the full host pipeline.
    raw = read_crp(f"{FIX}/raw_signal.crp").reshape(-1)
    unit = np.float32(1373.41) / np.float32(8192.0)
    pa = (raw + np.float32(16.0)) * unit
    rt = RawTable("the-uuid", pa.size, 0, pa.size, pa.copy())
    res = caller.basecall_read(rt)
    assert res is not None
    assert res.nblock == caller.cfg.nblocks(37590)
    assert len(res.basecall) > 100
    assert len(res.quality) == len(res.basecall)
    assert set(res.basecall) <= set("ACGT")
    assert res.trace.shape == (res.nblock + 1, 8)
    assert res.uuid == "the-uuid"
    assert res.trim_start == 200 and res.trim_end == 37790


def test_cli_smoke(tmp_path, norm_signal):
    """CLI end-to-end on synthesised fast5 inputs (reference ctest
    test_flappie_call analogue)."""
    from flappie_tpu.signal.fast5 import write_single_read_fast5

    raw = read_crp(f"{FIX}/raw_signal.crp").reshape(-1)
    d = tmp_path / "reads"
    d.mkdir()
    write_single_read_fast5(str(d / "a.fast5"), raw, "read-a")
    write_single_read_fast5(str(d / "b.fast5"), raw[:12000], "read-b")

    out = tmp_path / "out.fastq"
    from flappie_tpu.cli.flappie import main

    rc = main([str(d), "-o", str(out), "--trace", str(tmp_path / "trace.h5")])
    assert rc == 0
    text = out.read_text()
    recs = [l for l in text.splitlines() if l.startswith("@")]
    assert len(recs) == 2
    assert recs[0].startswith("@read-a  ")
    lines = text.splitlines()
    assert lines[2] == "+"
    assert len(lines[1]) == len(lines[3])

    import h5py

    with h5py.File(tmp_path / "trace.h5", "r") as f:
        assert "read-a" in f and "read-b" in f
        assert f["read-a/trace"].dtype == np.uint8
        assert f["read-a/signal"].dtype == np.float32


def test_cli_fast_flag(tmp_path, monkeypatch):
    """--fast sets the bf16 stream policy before the first trace and
    still basecalls (the numeric band is certified on hardware:
    tools/fast_mode_accuracy.py)."""
    import os

    from flappie_tpu.cli.flappie import main
    from flappie_tpu.signal.fast5 import write_single_read_fast5

    monkeypatch.delenv("FLAPPIE_TPU_RNN_STREAM", raising=False)
    raw = read_crp(f"{FIX}/raw_signal.crp").reshape(-1)
    write_single_read_fast5(str(tmp_path / "a.fast5"), raw[:12000], "read-a")
    out = tmp_path / "out.fastq"
    try:
        rc = main(["--fast", str(tmp_path / "a.fast5"), "-o", str(out)])
        assert rc == 0
        assert os.environ.get("FLAPPIE_TPU_RNN_STREAM") == "bf16"
    finally:
        # main() mutates the process env; a leaked bf16 policy would
        # silently detune any parity test traced later in this process
        os.environ.pop("FLAPPIE_TPU_RNN_STREAM", None)
    assert out.read_text().startswith("@read-a  ")


def test_cli_model_help(capsys):
    from flappie_tpu.cli.flappie import main

    rc = main(["--model", "help", "x.fast5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "r941_native" in out and "(default)" in out
    assert "rle_r941_native" not in out  # runnie-only model not listed


def test_cli_multi_read_fast5(tmp_path):
    """--multi basecalls every read of a multi-read fast5 (extension
    beyond the reference, which only handles the first read)."""
    import h5py

    from flappie_tpu.cli.flappie import main

    raw = read_crp(f"{FIX}/raw_signal.crp").reshape(-1)
    f5 = tmp_path / "multi.fast5"
    with h5py.File(f5, "w") as f:
        f.attrs["file_version"] = np.bytes_("2.0")
        for i, (uuid, n) in enumerate([("m-read-1", 12000), ("m-read-2", 9000)]):
            grp = f.create_group(f"read_{uuid}")
            rg = grp.create_group("Raw")
            rg.attrs["read_id"] = np.bytes_(uuid)
            rg.create_dataset("Signal", data=np.round(raw[:n]).astype(np.int16))
            ch = grp.create_group("channel_id")
            ch.attrs["digitisation"] = np.float64(8192.0)
            ch.attrs["offset"] = np.float64(16.0)
            ch.attrs["range"] = np.float64(1373.41)
            ch.attrs["sampling_rate"] = np.float64(4000.0)

    out = tmp_path / "o.fastq"
    rc = main(["--multi", str(f5), "-o", str(out)])
    assert rc == 0
    recs = [l for l in out.read_text().splitlines() if l.startswith("@")]
    assert len(recs) == 2
    assert recs[0].startswith("@m-read-1") and recs[1].startswith("@m-read-2")
    # without --multi: first read only (reference behaviour would find
    # no /Raw/Reads and fail; our reader handles the multi layout)
    rc = main([str(f5), "-o", str(out)])
    recs = [l for l in out.read_text().splitlines() if l.startswith("@")]
    assert len(recs) <= 1


def test_chaos_fault_isolation(tmp_path, monkeypatch, capsys):
    """FLAPPIE_TPU_CHAOS=1.0 -> every read fails, CLI continues and
    reports per-read errors (CHAOSMONKEY-equivalent)."""
    from flappie_tpu.signal.fast5 import write_single_read_fast5
    from flappie_tpu.cli.flappie import main

    raw = read_crp(f"{FIX}/raw_signal.crp").reshape(-1)
    f5 = tmp_path / "c.fast5"
    write_single_read_fast5(str(f5), raw[:8000], "chaos-read")
    monkeypatch.setenv("FLAPPIE_TPU_CHAOS", "1.0")
    out = tmp_path / "o.fastq"
    rc = main([str(f5), "-o", str(out)])
    assert rc == 0
    assert out.read_text() == ""
    assert "No basecall returned" in capsys.readouterr().err


def test_batch_poisoned_read_isolation(caller, norm_signal):
    """A NaN read inside a batch degrades to None; its batchmates'
    calls are byte-identical to an all-clean batch (VERDICT r2 #8:
    allocation-grade isolation inside the packed device paths)."""
    sig = norm_signal[:8000]
    clean_batch = caller.basecall_raw_tables([_fake_rt(sig) for _ in range(3)])
    assert all(r is not None for r in clean_batch)

    poisoned = _fake_rt(sig)
    poisoned.raw[:] = np.nan
    mixed = caller.basecall_raw_tables([_fake_rt(sig), poisoned, _fake_rt(sig)])
    assert mixed[1] is None
    for r in (mixed[0], mixed[2]):
        assert r is not None
        assert r.basecall == clean_batch[0].basecall
        assert r.quality == clean_batch[0].quality
        assert r.score == clean_batch[0].score


def test_chunked_poisoned_read_isolation(caller, norm_signal):
    """Same isolation on the chunked production path: the poisoned
    long read's chunks share batches with the clean read's chunks."""
    sig = np.concatenate([norm_signal, norm_signal])[:40000]
    clean_batch = caller.basecall_raw_tables([_fake_rt(sig), _fake_rt(sig)])
    assert all(r is not None for r in clean_batch)

    poisoned = _fake_rt(sig)
    poisoned.raw[20000:] = np.nan  # NaN mid-read: some chunks clean
    mixed = caller.basecall_raw_tables([_fake_rt(sig), poisoned])
    assert mixed[1] is None
    assert mixed[0] is not None
    assert mixed[0].basecall == clean_batch[0].basecall
    assert mixed[0].quality == clean_batch[0].quality


def test_chaos_device_corruption(caller, norm_signal, monkeypatch):
    """FLAPPIE_TPU_CHAOS_DEVICE=1.0: every read is corrupted (NaN /
    zero-length alternating) inside the batch, every result degrades
    to None, and the run completes."""
    monkeypatch.setenv("FLAPPIE_TPU_CHAOS_DEVICE", "1.0")
    sig = norm_signal[:8000]
    out = caller.basecall_raw_tables([_fake_rt(sig) for _ in range(4)])
    assert out == [None] * 4


def test_chaos_dispatch_failure(caller, norm_signal, monkeypatch, capsys):
    """FLAPPIE_TPU_CHAOS_DISPATCH=1.0: every device dispatch raises;
    the batch degrades to None results and a stderr diagnostic, and
    the process survives (reference CHAOSMONKEY semantics)."""
    monkeypatch.setenv("FLAPPIE_TPU_CHAOS_DISPATCH", "1.0")
    sig = norm_signal[:8000]
    out = caller.basecall_raw_tables([_fake_rt(sig) for _ in range(2)])
    assert out == [None, None]
    assert "batch failed" in capsys.readouterr().err

    # chunked path too
    long_sig = np.concatenate([norm_signal, norm_signal])[:40000]
    out = caller.basecall_raw_tables([_fake_rt(long_sig)])
    assert out == [None]
    assert "chunk batch failed" in capsys.readouterr().err


def test_collector_thread_byte_identity(caller, norm_signal, monkeypatch):
    """The background collector thread (_Pipeline, default on since
    round 5) must produce byte-identical results to caller-thread
    collection on both the batch and chunked production paths — FIFO
    collection preserves push order, so threading is invisible."""
    sig = norm_signal[:8000]
    long_sig = np.concatenate([norm_signal, norm_signal])[:40000]
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("FLAPPIE_TPU_COLLECT_THREAD", flag)
        outs[flag] = caller.basecall_raw_tables(
            [_fake_rt(sig) for _ in range(3)] + [_fake_rt(long_sig)])
    assert all(r is not None for r in outs["0"])
    for a, b in zip(outs["0"], outs["1"]):
        assert a.basecall == b.basecall
        assert a.quality == b.quality
        assert a.score == b.score


def test_collector_thread_error_isolation(
    caller, norm_signal, monkeypatch, capsys
):
    """A dispatch failure that surfaces on the COLLECTOR thread (the
    dispatch ran on the upload pool, so its exception is first seen by
    the collector resolving the future) still degrades to per-batch
    None results via _Pipeline.on_error instead of killing the run or
    leaking out of the background thread."""
    monkeypatch.setenv("FLAPPIE_TPU_COLLECT_THREAD", "1")
    monkeypatch.setenv("FLAPPIE_TPU_UPLOAD_THREADS", "2")
    monkeypatch.setenv("FLAPPIE_TPU_CHAOS_DISPATCH", "1.0")
    sig = norm_signal[:8000]
    out = caller.basecall_raw_tables([_fake_rt(sig) for _ in range(2)])
    assert out == [None, None]
    assert "batch failed" in capsys.readouterr().err


def test_device_phred_matches_host_formula():
    """ops.crf.phred_from_qpath (device, used by _device_decode) must
    agree with decode.seq's host formula, including the double-precision
    constant multiply (emulated hi/lo on device), over a dense sweep and
    near the rounding boundaries."""
    import jax.numpy as jnp

    from flappie_tpu.ops.crf import phred_from_qpath

    rng = np.random.default_rng(7)
    q = np.concatenate([
        rng.uniform(-30, 0, 300000),
        np.linspace(-25, 0, 300000),
    ]).astype(np.float32)
    host = phred_chars(np.exp(q, dtype=np.float32))
    dev = np.asarray(phred_from_qpath(jnp.asarray(q)))
    mism = np.nonzero(host != dev)[0]
    assert mism.size == 0, f"{mism.size} mismatched quality bytes, e.g. q={q[mism[:5]]}"


def test_read_shorter_than_trim_fails_gracefully(tmp_path, capsys):
    """A read shorter than the fixed trims must yield 'No basecall
    returned' and not crash the batch (reference: trim_and_segment_raw
    leaves an empty window, flappie.c:372-375 skips the read)."""
    from flappie_tpu.signal.fast5 import write_single_read_fast5
    from flappie_tpu.cli.flappie import main

    f5 = tmp_path / "tiny.fast5"
    write_single_read_fast5(str(f5), np.full(150, 500.0, np.float32), "tiny-read")
    out = tmp_path / "o.fastq"
    rc = main([str(f5), "-o", str(out)])
    assert rc == 0
    assert out.read_text() == ""
    assert "No basecall returned" in capsys.readouterr().err


def test_corrupt_fast5_fails_gracefully(tmp_path, capsys):
    """Unreadable fast5 -> per-read error, exit code 0 (per-read fault
    isolation, reference warnx + continue)."""
    from flappie_tpu.cli.flappie import main

    bad = tmp_path / "bad.fast5"
    bad.write_bytes(b"not an hdf5 file")
    out = tmp_path / "o.fastq"
    rc = main([str(bad), "-o", str(out)])
    assert rc == 0
    assert out.read_text() == ""
    assert "No basecall returned" in capsys.readouterr().err


def test_mixed_batch_one_bad_read_others_survive(tmp_path, capsys):
    """One failing read in a multi-file batch must not poison the rest."""
    from flappie_tpu.signal.fast5 import write_single_read_fast5
    from flappie_tpu.cli.flappie import main

    raw = read_crp(f"{FIX}/raw_signal.crp").reshape(-1)
    good = tmp_path / "a_good.fast5"
    write_single_read_fast5(str(good), raw[:8000], "good-read")
    bad = tmp_path / "b_bad.fast5"
    bad.write_bytes(b"junk")
    out = tmp_path / "o.fastq"
    rc = main([str(good), str(bad), "-o", str(out)])
    assert rc == 0
    text = out.read_text()
    assert text.startswith("@good-read")
    assert "No basecall returned" in capsys.readouterr().err


def test_packed_io_layout_roundtrip():
    """The packed device-I/O byte layouts are load-bearing (one array
    each way through the tunnel): pin pack/unpack and the packed
    programs against their unpacked equivalents."""
    import jax.numpy as jnp

    from flappie_tpu.basecall import (
        Basecaller,
        _device_basecall,
        _device_basecall_packed,
        _unpack_chunk_outputs,
    )
    from tests.ref_harness.parity_models import _shrink
    from flappie_tpu.models.params import init_synthetic

    cfg = _shrink("r941_native")
    params = init_synthetic(cfg, seed=3)
    import jax

    params = jax.tree.map(jnp.asarray, params)
    rng = np.random.default_rng(0)
    B, T = 3, 2048
    sig = rng.normal(size=(B, T)).astype(np.float32)
    lengths = np.array([2048, 1999, 640], np.int32)
    for b in range(B):
        sig[b, lengths[b]:] = 0

    for compute_trace in (False, True):
        want = tuple(
            np.asarray(x)
            for x in _device_basecall(
                params, jnp.asarray(sig), jnp.asarray(lengths), cfg, 1.0,
                False, compute_trace,
            )
        )
        buf = Basecaller.pack_chunk_inputs(
            sig, lengths, np.zeros(B, np.int32), np.zeros(B, np.int32)
        )
        packed = np.asarray(_device_basecall_packed(
            params, jnp.asarray(buf), cfg, 1.0, False, compute_trace,
        ))
        T1 = -(-T // cfg.total_stride) + 1
        score, path, qchar, nblocks, trace = _unpack_chunk_outputs(
            packed, T1, cfg.nstate, compute_trace
        )
        np.testing.assert_array_equal(score, want[0])
        np.testing.assert_array_equal(path, want[1])
        np.testing.assert_array_equal(qchar, want[2])
        np.testing.assert_array_equal(nblocks, want[3])
        if compute_trace:
            np.testing.assert_array_equal(trace, want[4])


def test_cli_prewarm_identity(tmp_path, monkeypatch):
    """FLAPPIE_TPU_PREWARM=1 (background trace of the chunked
    production program at CLI start) must not change any output; the
    real dispatch shares the prewarmed trace."""
    from flappie_tpu.cli.flappie import main
    from flappie_tpu.signal.fast5 import write_single_read_fast5

    raw = read_crp(f"{FIX}/raw_signal.crp").reshape(-1)
    d = tmp_path / "reads"
    d.mkdir()
    write_single_read_fast5(str(d / "a.fast5"), raw[:9000], "read-a")
    write_single_read_fast5(str(d / "b.fast5"), raw[:7000], "read-b")

    args = [str(d), "--chunk", "2560", "--overlap", "600",
            "--chunk-batch", "8"]
    monkeypatch.setenv("FLAPPIE_TPU_DISPATCH_GROUP", "2")
    monkeypatch.setenv("FLAPPIE_TPU_PREWARM", "0")
    cold_out = tmp_path / "cold.fastq"
    assert main(args + ["-o", str(cold_out)]) == 0
    monkeypatch.setenv("FLAPPIE_TPU_PREWARM", "1")
    warm_out = tmp_path / "warm.fastq"
    assert main(args + ["-o", str(warm_out)]) == 0
    assert warm_out.read_text() == cold_out.read_text()
    assert cold_out.read_text().count("@read-") == 2
