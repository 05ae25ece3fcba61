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
