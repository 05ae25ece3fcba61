"""Full-architecture taiyaki-flipflop5-style torch checkpoint (H=256).

Closes the real-weights loop (VERDICT r2 #4): the reference's product
models are taiyaki checkpoints exported to C headers
(misc/taiyaki_flipflop5_guppy.py); the LFS blobs are absent here, so
this module builds a checkpoint with the *exact structural shape a
trained taiyaki flipflop5 model serialises to* — a ``model_state_dict``
whose sublayers are numbered AROUND a parameterless leading DeltaSample,
with backward LSTMs under a Reverse wrapper's ``.layer.`` prefix,
``bias_hh_l0`` entries present (the exporter ignores them), and weight
magnitudes of a trained model — saved with ``torch.save`` and pulled
back through the production chain:

    torch.load -> weights.taiyaki.convert_state_dict -> npz ->
       Basecaller                 (JAX side)
    ...                -> weights.header_emit -> reference C oracle
                                  (golden side)

so the committed ``ff_ckpt_fastq`` golden certifies weights that flowed
through the converter, not init_synthetic.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

SEED = 20260817
HID = 256

def make_state_dict(hid: int = HID, seed: int = SEED):
    """Torch-layout flat state dict with taiyaki flipflop5 naming.

    Sublayer indices follow a real flipflop5 taiyaki Serial model:
    0 DeltaSample (no params), 1-3 convs, 4-8 LSTMs (B,F,B,F,B), 9 head.
    """
    rng = np.random.default_rng(seed)

    def w(*shape, fan_in):
        return (rng.standard_normal(shape) / np.sqrt(fan_in)).astype(np.float32)

    state = {}
    conv_specs = ((4, 1, 5), (16, 4, 5), (hid, 16, 19))  # (out, in, winlen)
    for i, (oc, ic, wl) in enumerate(conv_specs):
        p = f"sublayers.{i + 1}.conv."
        state[p + "weight"] = w(oc, ic, wl, fan_in=ic * wl)
        state[p + "bias"] = w(oc, fan_in=1000)  # small, trained-like
    for i in range(5):
        backward = i % 2 == 0  # B, F, B, F, B
        p = f"sublayers.{i + 4}." + ("layer.lstm." if backward else "lstm.")
        state[p + "weight_ih_l0"] = w(4 * hid, hid, fan_in=hid)
        state[p + "weight_hh_l0"] = w(4 * hid, hid, fan_in=hid)
        # trained LSTMs sit near forget-bias +1; a large random head/gate
        # bias instead makes one stay transition dominate every block and
        # the golden basecall degenerates to length 0
        bias = w(4 * hid, fan_in=1000)
        bias[hid : 2 * hid] += 1.0
        state[p + "bias_ih_l0"] = bias
        # torch LSTMs carry a second bias; taiyaki trains it at zero and
        # the exporter never reads it (print_lstm, bias_ih_l0 only)
        state[p + "bias_hh_l0"] = np.zeros(4 * hid, np.float32)
    state["sublayers.9.linear.weight"] = w(40, hid, fan_in=hid)
    state["sublayers.9.linear.bias"] = w(40, fan_in=1000)
    return state


def save_checkpoint(path: str, hid: int = HID, seed: int = SEED) -> None:
    """torch.save in the trained-checkpoint envelope taiyaki uses."""
    import torch

    state = {k: torch.from_numpy(v) for k, v in make_state_dict(hid, seed).items()}
    torch.save({"model_state_dict": state, "epoch": 99}, path)


def converted_params(hid: int = HID, seed: int = SEED):
    """The production conversion chain, end to end through a real file."""
    from flappie_tpu.weights.taiyaki import convert_state_dict, load_torch_checkpoint

    from .parity_models import _shrink

    cfg = _shrink("r941_native", hid)
    fd, path = tempfile.mkstemp(suffix=".pt")
    os.close(fd)
    try:
        save_checkpoint(path, hid, seed)
        state = load_torch_checkpoint(path)
        params = convert_state_dict(state, cfg, scale_first_conv=True)
    finally:
        os.unlink(path)
    return cfg, params
