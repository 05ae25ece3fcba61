"""Cross-backend drift check: TPU vs XLA:CPU on real-fixture-signal fast5s.

Round-4 left the TPU-vs-CPU drift (8/2868 differing bases on the 37.8k
fixture read, normalised score moving at 1e-5 -- the TPU
transcendental-ulp band flipping near-ties) as a prose note; this tool
turns it into a tolerance-banded regression artifact
(docs/XBACKEND_r5.json) and a pass/fail check, the TPU analogue of the
reference's Debug-build numeric validation
(/root/reference/src/flappie_matrix.c:150-232 validate_flappie_matrix).

Checks:
  1. WITHIN the active backend, the i16 and d8 wires produce
     byte-identical output: both replay device-side normalisation from
     the same int16 ADC (d8 reconstructs the i16 exactly), so ANY
     drift here is a wire bug, not ulp.
  2. WITHIN the active backend, the f32 wire (host-side normalisation)
     vs the d8 wire (device-side) must sit inside the same tolerance
     band as the cross-backend check: host C++ and TPU XLA disagree by
     1 ulp on a fraction of divides/transcendentals, which flips
     near-tie bases (ROUND3.md: the i16 wire is byte-identical on
     XLA:CPU, sequence-STABLE on TPU -- that is the contract).
  3. ACROSS backends (device-norm wire each side): per-read alignment
     identity >= 99.5% and |normalised score delta| <= 1e-4.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/xbackend_check.py

Exits nonzero outside the band.  tests/test_xbackend.py wraps this when
a TPU is reachable and validates the committed artifact otherwise.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IDENTITY_MIN = 0.995
SCORE_DELTA_MAX = 1e-4
N_READS = 6


def write_corpus(reads_dir: str) -> None:
    """Synthesize fast5 reads from the REAL fixture ADC signal.

    /root/reference/reads/*.fast5 are 130-byte git-LFS pointers in this
    checkout (like the model blobs), so the corpus is the committed
    37.8k-sample raw_signal.crp tiled to varying lengths with seeded
    +-2 ADC jitter -- real pore signal shape, deterministic bytes."""
    import numpy as np

    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.signal.fast5 import write_single_read_fast5

    adc = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    adc = adc.astype(np.int16)
    rng = np.random.default_rng(77)
    os.makedirs(reads_dir, exist_ok=True)
    for i in range(N_READS):
        n = int(rng.integers(20_000, 38_000))
        row = np.tile(adc, int(np.ceil(n / adc.size)))[:n]
        noisy = (row + rng.integers(-2, 3, size=n)).astype(np.int16)
        write_single_read_fast5(
            os.path.join(reads_dir, f"read{i:04d}.fast5"), noisy,
            f"0f776a08-0002-4000-8000-{i:012d}")


def run_cli(reads_dir: str, tmp: str, tag: str, platforms: str | None,
            wire: str, timeout: int = 3600) -> str:
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    env["FLAPPIE_TPU_UPLOAD"] = wire
    if platforms is None:
        env.pop("JAX_PLATFORMS", None)
    else:
        env["JAX_PLATFORMS"] = platforms
    out_path = os.path.join(tmp, f"out_{tag}.fastq")
    t0 = time.perf_counter()
    with open(out_path, "w") as fh:
        proc = subprocess.run(
            [sys.executable, "-m", "flappie_tpu.cli.flappie",
             "--model", "r941_native", reads_dir],
            stdout=fh, stderr=subprocess.PIPE, text=True, env=env,
            timeout=timeout)
    if proc.returncode != 0:
        print(proc.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"CLI run {tag} failed rc={proc.returncode}")
    print(f"# {tag}: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    with open(out_path) as fh:
        text = fh.read()
    if "@" not in text:
        # an empty call set must never pass as a vacuous band check
        print(proc.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"CLI run {tag} produced no basecalls")
    return text


def parse_fastq(text: str) -> dict:
    """uuid -> (normalised_score, sequence)."""
    out = {}
    lines = text.splitlines()
    for i in range(0, len(lines) - 3, 4):
        head, seq = lines[i], lines[i + 1]
        uuid = head[1:].split()[0]
        m = re.search(r'"normalised_score" : ([-0-9.a-z]+)', head)
        out[uuid] = (float(m.group(1)) if m else float("nan"), seq)
    return out


def main() -> int:
    sys.path.insert(0, REPO)
    from flappie_tpu.accuracy import align_identity

    artifact: dict = {
        "corpus": "synthetic fast5 from the committed real fixture ADC "
                  "(tiled + seeded jitter; reference reads/*.fast5 are "
                  "git-LFS pointers in this checkout)",
        "band": {
            "identity_min": IDENTITY_MIN,
            "score_delta_max": SCORE_DELTA_MAX,
        },
    }
    failures = []
    with tempfile.TemporaryDirectory() as tmp:
        reads_dir = os.path.join(tmp, "reads")
        write_corpus(reads_dir)

        def band_compare(a: dict, b: dict, tag_a: str, tag_b: str) -> list:
            rows = []
            for uuid, (score_a, seq_a) in sorted(a.items()):
                if uuid not in b:
                    failures.append(f"{uuid}: missing in {tag_b}")
                    continue
                score_b, seq_b = b[uuid]
                ident = align_identity(seq_b, seq_a).identity
                sdelta = abs(score_b - score_a)
                rows.append({
                    "uuid": uuid,
                    f"len_{tag_a}": len(seq_a), f"len_{tag_b}": len(seq_b),
                    "identity": round(ident, 6),
                    "score_delta": round(sdelta, 8),
                    "byte_equal": seq_a == seq_b,
                })
                if ident < IDENTITY_MIN:
                    failures.append(
                        f"{tag_a}/{tag_b} {uuid}: identity {ident:.4f} "
                        f"< {IDENTITY_MIN}")
                if not sdelta <= SCORE_DELTA_MAX:  # catches NaN too
                    failures.append(
                        f"{tag_a}/{tag_b} {uuid}: score delta {sdelta} "
                        f"> {SCORE_DELTA_MAX}")
            if not rows:
                failures.append(
                    f"{tag_a}/{tag_b}: no reads measured (empty call sets)")
            return rows

        # 1. device-norm wires must be byte-equal (d8 reconstructs the
        #    i16 ADC exactly; both normalise on device)
        wire_out = {w: run_cli(reads_dir, tmp, f"wire_{w}", None, w)
                    for w in ("f32", "i16", "d8")}
        devnorm_equal = wire_out["i16"] == wire_out["d8"]
        artifact["device_norm_wires_byte_equal"] = devnorm_equal
        if not devnorm_equal:
            failures.append("i16 and d8 wire outputs differ (wire bug)")

        # 2. host-norm vs device-norm band on the SAME backend (f32
        #    normalises on host; 1-ulp divide/transcendental deltas on
        #    TPU flip near-tie bases -- byte-equal on XLA:CPU)
        artifact["hostnorm_vs_devnorm_reads"] = band_compare(
            parse_fastq(wire_out["f32"]), parse_fastq(wire_out["d8"]),
            "f32", "d8")

        # 3. cross-backend band (device-norm wire both sides)
        cpu = parse_fastq(run_cli(reads_dir, tmp, "cpu", "cpu", "auto"))
        dev = parse_fastq(wire_out["d8"])
        artifact["reads"] = band_compare(cpu, dev, "cpu", "dev")
        artifact["ok"] = not failures
        artifact["failures"] = failures

    out = os.path.join(REPO, "docs", "XBACKEND_r5.json")
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact["reads"], indent=1), file=sys.stderr)
    print(f"wrote {out}: ok={artifact['ok']} {failures}")
    return 0 if artifact["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
