"""Legacy sloika pickle parsers (misc/parse_flipflop*.py, parse_runlen.py).

The fixture builds a sloika-shaped object graph in a throwaway module,
pickles it, then DELETES the module before loading -- so the permissive
unpickler's stub path (the one real sloika pickles hit, their classes
being long dead) is what every test exercises.  Numerics are pinned by
an independent numpy transcription of the residual-GRU graph
(flipflop_gru_transitions, src/networks.c:403-448) operating directly
on the sloika-oriented [out, in] matrices.
"""

from __future__ import annotations

import pickle
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

H = 8  # hidden size == nfilter (residual graphs need matching dims)
NPARAM = 40


def _fake_module():
    mod = types.ModuleType("sloika_fake_layers")

    class Shared:
        """theano-shared-like: value buried inside container state."""

        def __init__(self, v):
            self.container = {"storage": [np.asarray(v, np.float32)]}

    class Layer:
        pass

    for cls in (Shared, Layer):
        cls.__module__ = mod.__name__
        cls.__qualname__ = cls.__name__
    mod.Shared = Shared
    mod.Layer = Layer
    return mod


def _layer(mod, **attrs):
    obj = mod.Layer()
    obj.__dict__.update(attrs)
    return obj


def _wrap(mod, inner, levels):
    for _ in range(levels):
        inner = _layer(mod, sublayers=[inner])
    return inner


def _build_network(mod, rng, flavour, winlen=1, version=(2, 0)):
    S = mod.Shared
    conv = _layer(
        mod,
        W=S(rng.normal(0, 0.5, (H, 1, winlen))),
        b=S(rng.normal(0, 0.1, (H,))),
        stride=1,
    )
    layers = [conv]
    for i in range(5):
        if flavour == "flipflop_gru":
            gru = _layer(
                mod,
                iW=S(rng.normal(0, 0.3, (3 * H, H))),
                sW=S(rng.normal(0, 0.3, (2 * H, H))),
                sW2=S(rng.normal(0, 0.3, (H, H))),
                b=S(rng.normal(0, 0.1, (3 * H,))),
            )
            # backward layers: Reverse(Residual(gru)); forward: Residual(gru)
            layers.append(_wrap(mod, gru, 2 if i % 2 == 0 else 1))
        else:
            gru = _layer(
                mod,
                iW=S(rng.normal(0, 0.3, (3 * H, H))),
                sW=S(rng.normal(0, 0.3, (3 * H, H))),
                b=S(rng.normal(0, 0.1, (3 * H,))),
            )
            layers.append(_wrap(mod, gru, 1 if i % 2 == 0 else 0))
    out = 16 if flavour == "runlength" else NPARAM
    layers.append(
        _layer(mod, W=S(rng.normal(0, 0.2, (out, H))), b=S(rng.normal(0, 0.1, (out,))))
    )
    return _layer(mod, version=version, sublayers=layers)


@pytest.fixture()
def fake_pickle(tmp_path):
    """(flavour, winlen, version) -> path of a stub-forcing pickle."""

    def make(flavour, winlen=1, version=(2, 0), seed=0):
        mod = _fake_module()
        sys.modules[mod.__name__] = mod
        try:
            net = _build_network(
                mod, np.random.default_rng(seed), flavour, winlen, version
            )
            path = tmp_path / f"{flavour}.pkl"
            with open(path, "wb") as fh:
                pickle.dump(net, fh, protocol=2)
        finally:
            del sys.modules[mod.__name__]
        return path

    return make


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_gru2(xa, sW, sW2):
    """sloika 2-matrix GRU on sloika-oriented mats: xa [T, 3H],
    sW [2H, H], sW2 [H, H] (src/layers.c:513-568)."""
    T = xa.shape[0]
    h = np.zeros(H, np.float32)
    out = np.zeros((T, H), np.float32)
    for t in range(T):
        zr = _sigmoid(xa[t, : 2 * H] + sW @ h)
        z, r = zr[:H], zr[H:]
        hbar = np.tanh(xa[t, 2 * H :] + sW2 @ (r * h))
        h = z * h + (1 - z) * hbar
        out[t] = h
    return out


def _np_flipflop_gru_body(sig, net):
    """conv(winlen=1)+elu then 5 residual GRUs, numpy, sloika layout."""
    from flappie_tpu.weights.sloika import value_of

    conv = net.sublayers[0]
    W = value_of(conv.W)[:, 0, 0]  # [H] pointwise filter
    b = value_of(conv.b)
    x = sig[:, None] * W[None, :] + b[None, :]
    x = np.where(x > 0, x, np.expm1(np.minimum(x, 0))).astype(np.float32)  # elu
    for i in range(5):
        g = net.sublayers[1 + i]
        while not hasattr(g, "iW"):
            g = g.sublayers[0]
        iW, sW, sW2, gb = (value_of(g.iW), value_of(g.sW), value_of(g.sW2),
                           value_of(g.b))
        xa = x @ iW.T + gb[None, :]
        if i % 2 == 0:  # backward
            y = _np_gru2(xa[::-1], sW, sW2)[::-1]
        else:
            y = _np_gru2(xa, sW, sW2)
        x = (y + x).astype(np.float32)
    return x


def test_sloika_stub_unpickle_and_shapes(fake_pickle):
    from flappie_tpu.weights.sloika import convert_sloika_pickle

    for flavour, kind, head in (
        ("flipflop_gru", "gru", "flipflop"),
        ("flipflop_grumod", "grumod", "flipflop"),
        ("runlength", "grumod", "runlength"),
    ):
        cfg, params = convert_sloika_pickle(fake_pickle(flavour, winlen=5), flavour)
        assert cfg.rnns[0].kind == kind and cfg.head == head
        assert cfg.convs[0].winlen == 5 and cfg.convs[0].out_ch == H
        assert [r.backward for r in cfg.rnns] == [True, False, True, False, True]
        assert cfg.rnns[0].residual == (flavour == "flipflop_gru")
        assert params["rnn0"]["iW"].shape == (H, 3 * H)
        assert cfg.nbase == 4


def test_sloika_residual_gru_numerics(fake_pickle):
    """Converted params through conv_stack+rnn_stack must match the
    independent numpy transcription of the sloika graph."""
    from flappie_tpu.models.network import conv_stack, rnn_stack
    from flappie_tpu.weights.sloika import convert_sloika_pickle, load_sloika_pickle

    path = fake_pickle("flipflop_gru", winlen=1, seed=3)
    cfg, params = convert_sloika_pickle(path, "flipflop_gru")
    net = load_sloika_pickle(path)

    T = 31
    sig = np.random.default_rng(1).normal(0, 1, T).astype(np.float32)
    want = _np_flipflop_gru_body(sig, net)

    x = jnp.asarray(sig)[None, :, None]
    lengths = jnp.asarray([T], jnp.int32)
    params_j = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
                for k, v in params.items()}
    y, nblocks = conv_stack(params_j, cfg, x, lengths)
    got = np.asarray(rnn_stack(params_j, cfg, y, nblocks, rnn_impl="scan"))[0]
    assert int(nblocks[0]) == T
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sloika_full_transitions_and_npz_roundtrip(fake_pickle, tmp_path):
    from flappie_tpu.models.network import transitions
    from flappie_tpu.weights.sloika import (
        convert_sloika_pickle,
        load_sloika_npz,
        save_sloika_npz,
    )

    cfg, params = convert_sloika_pickle(
        fake_pickle("flipflop_gru", winlen=5), "flipflop_gru", name="m1"
    )
    sig = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 64, 1)).astype(np.float32)
    )
    trans, nblocks = transitions(
        params, cfg, sig, jnp.asarray([64, 40], jnp.int32), rnn_impl="scan"
    )
    assert trans.shape == (2, 64, NPARAM)
    assert np.isfinite(np.asarray(trans)[0]).all()

    p = tmp_path / "m.npz"
    save_sloika_npz(str(p), cfg, params)
    cfg2, params2 = load_sloika_npz(str(p))
    assert cfg2 == cfg or (
        cfg2.convs == cfg.convs and cfg2.rnns == cfg.rnns
        and cfg2.head == cfg.head and cfg2.nbase == cfg.nbase
    )
    for k, d in params.items():
        for kk, v in d.items():
            np.testing.assert_array_equal(params2[k][kk], v)


def test_sloika_version_gate(fake_pickle):
    from flappie_tpu.weights.sloika import convert_sloika_pickle

    with pytest.raises(ValueError, match="version"):
        convert_sloika_pickle(
            fake_pickle("flipflop_grumod", version=(1, 1)), "flipflop_grumod"
        )


def test_sloika_cli(fake_pickle, tmp_path, capsys):
    from flappie_tpu.cli.convert import main

    out = tmp_path / "cli.npz"
    rc = main(["sloika2npz", str(fake_pickle("runlength")), str(out),
               "--flavour", "runlength"])
    assert rc == 0
    assert "runlength nbase=4" in capsys.readouterr().out
    from flappie_tpu.weights.sloika import load_sloika_npz

    cfg, params = load_sloika_npz(str(out))
    assert cfg.head == "runlength" and cfg.rnns[0].kind == "grumod"
