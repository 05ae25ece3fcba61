"""Weight pipeline tests: C-header emit -> parse roundtrip.

The reference .mdl blobs are git-LFS pointers, so the parser is
validated against our emitter, which reproduces the exporter format
(misc/taiyaki_flipflop5_guppy.py) bit-exactly via hex floats.
"""

import numpy as np

from flappie_tpu.models.config import get_model_config
from flappie_tpu.models.params import flatten, init_synthetic
from flappie_tpu.weights import convert_reference_header, emit_model_header


def _roundtrip(model_name, modelid):
    cfg = get_model_config(model_name)
    params = init_synthetic(cfg, seed=11)
    text = emit_model_header(cfg, params, modelid=modelid)
    cfg2, params2 = convert_reference_header(text)
    f1, f2 = flatten(params), flatten(params2)
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_array_equal(f1[k], f2[k], err_msg=k)
    assert tuple(c.winlen for c in cfg2.convs) == tuple(c.winlen for c in cfg.convs)
    assert tuple(c.stride for c in cfg2.convs) == tuple(c.stride for c in cfg.convs)
    assert tuple(r.kind for r in cfg2.rnns) == tuple(r.kind for r in cfg.rnns)
    assert tuple(r.backward for r in cfg2.rnns) == tuple(r.backward for r in cfg.rnns)
    assert cfg2.nbase == cfg.nbase
    return cfg2


def test_roundtrip_flipflop5():
    cfg2 = _roundtrip("r941_native", "r941native")
    assert cfg2.head == "flipflop"


def test_roundtrip_5mC_grumod():
    cfg2 = _roundtrip("r941_5mC", "r941native5mC")
    assert cfg2.nbase == 5


def test_roundtrip_rle():
    from flappie_tpu.weights import config_from_arrays

    cfg2 = _roundtrip("rle_r941_native", "rle941")
    # out_dim 40 is ambiguous (flipflop vs RLE V2); override
    cfg3 = config_from_arrays(cfg2, "runlengthV2")
    assert cfg3.head == "runlengthV2"


def test_header_format_matches_exporter_conventions():
    cfg = get_model_config("r941_5mC")
    params = init_synthetic(cfg, seed=1)
    text = emit_model_header(cfg, params, modelid="x5mC")
    assert "#pragma once" in text
    assert "const flappie_matrix conv_rnnrf_flipflop_x5mC_W = &_conv_rnnrf_flipflop_x5mC_W;" in text
    assert "#define conv_rnnrf_flipflop_x5mC_stride  2" in text
    assert "_Mat _gruB1_rnnrf_flipflop_x5mC_iW" in text
    # hex floats with trailing-zero trimming, as small_hex does
    assert "0x1.p" in text or "0x1p" in text or "p+" in text


def test_torch_state_dict_conversion():
    """Synthetic torch-layout state dict -> params; LSTM + GRU paths."""
    import numpy as np

    from flappie_tpu.weights.taiyaki import convert_state_dict, cudnn_to_guppy_gru

    rng = np.random.default_rng(5)
    cfg = get_model_config("r941_5mC")
    H = cfg.rnns[0].size
    state = {}
    c = cfg.convs[0]
    state["sublayers.0.conv.weight"] = rng.normal(size=(c.out_ch, c.in_ch, c.winlen)).astype(np.float32)
    state["sublayers.0.conv.bias"] = rng.normal(size=(c.out_ch,)).astype(np.float32)
    for i, r in enumerate(cfg.rnns):
        d_in = c.out_ch if i == 0 else H
        state[f"sublayers.{i+1}.cudnn_gru.weight_ih_l0"] = rng.normal(size=(3 * H, d_in)).astype(np.float32)
        state[f"sublayers.{i+1}.cudnn_gru.weight_hh_l0"] = rng.normal(size=(3 * H, H)).astype(np.float32)
        state[f"sublayers.{i+1}.cudnn_gru.bias_ih_l0"] = rng.normal(size=(3 * H,)).astype(np.float32)
    state["sublayers.6.linear.weight"] = rng.normal(size=(cfg.out_dim, H)).astype(np.float32)
    state["sublayers.6.linear.bias"] = rng.normal(size=(cfg.out_dim,)).astype(np.float32)

    params = convert_state_dict(state, cfg, scale_first_conv=True)
    # conv transposed [winlen, in, out] and MAD-scaled
    np.testing.assert_allclose(
        params["conv0"]["W"],
        state["sublayers.0.conv.weight"].transpose(2, 1, 0) * np.float32(1.4826),
        rtol=1e-6,
    )
    # GRU gates reordered from cudnn (r,z,h) to guppy (z,r,h), transposed
    iW = state["sublayers.1.cudnn_gru.weight_ih_l0"]
    np.testing.assert_array_equal(params["rnn0"]["iW"], cudnn_to_guppy_gru(iW).T)


def test_convert_cli_roundtrip(tmp_path):
    from flappie_tpu.cli.convert import main
    from flappie_tpu.models.params import load_npz

    npz = tmp_path / "m.npz"
    hdr = tmp_path / "m.h"
    npz2 = tmp_path / "m2.npz"
    assert main(["synth", str(npz), "--model", "r941_native", "--seed", "3"]) == 0
    assert main(["npz2header", str(npz), str(hdr), "--model", "r941_native", "--id", "r941native"]) == 0
    assert main(["header2npz", str(hdr), str(npz2)]) == 0
    a, b = load_npz(str(npz)), load_npz(str(npz2))
    for layer in a:
        for k in a[layer]:
            np.testing.assert_array_equal(a[layer][k], b[layer][k])
