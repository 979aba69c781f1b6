"""Tensor-parallel parameter sharding on the virtual 8-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from orcai_tpu.models import build_model, init_variables
from orcai_tpu.parallel.mesh import batch_sharding, make_mesh
from orcai_tpu.parallel.sharding_rules import params_shardings, shard_params
from orcai_tpu.train.trainer import Trainer, make_optimizer

PARAM = {
    "name": "tp-test",
    "architecture": "ResNetLSTM",
    "model": {
        "filters": [4, 6],
        "kernel_size": 3,
        "dropout_rate": 0.1,
        "lstm_units": 16,
    },
    "calls": ["A", "B"],
}
INPUT_SHAPE = (16, 9, 1)
OUT = 4


def test_sharding_specs():
    model = build_model(PARAM)
    variables = init_variables(model, INPUT_SHAPE, seed=0)
    mesh = make_mesh(n_data=4, n_model=2)
    shardings = params_shardings(variables["params"], mesh)

    lstm = shardings["bilstm1"]["forward"]
    assert lstm["kernel"].spec == P(None, "model")
    assert lstm["recurrent_kernel"].spec == P(None, "model")
    assert lstm["bias"].spec == P("model")
    assert shardings["dense"]["kernel"].spec == P(None, "model")
    conv = shardings["trunk"]["entry_conv"]
    assert conv["kernel"].spec == P(None, None, None, "model")


def test_tp_train_step_runs_and_matches_dp():
    model = build_model(PARAM)

    def make_state(trainer, mesh, tp):
        p0, stats, _, key = trainer.init_state(INPUT_SHAPE, seed=3)
        if tp:
            p0 = shard_params(p0, mesh)
        opt = trainer.optimizer.init(p0)
        return (p0, stats, opt, key)

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(8, *INPUT_SHAPE)).astype(np.float32)
    y = rng.integers(0, 2, size=(8, OUT, 2)).astype(np.float32)

    # dp-only reference
    mesh_dp = make_mesh(n_data=8)
    tr_dp = Trainer(model, make_optimizer(1e-3), mesh=mesh_dp)
    s_dp = make_state(tr_dp, mesh_dp, tp=False)
    s_dp, m_dp = tr_dp.train_step(s_dp, jnp.asarray(x), jnp.asarray(y))

    # dp x tp
    mesh_tp = make_mesh(n_data=4, n_model=2)
    tr_tp = Trainer(model, make_optimizer(1e-3), mesh=mesh_tp)
    s_tp = make_state(tr_tp, mesh_tp, tp=True)
    step = jax.jit(tr_tp._train_step, donate_argnums=(0,))
    xb = jax.device_put(jnp.asarray(x), batch_sharding(mesh_tp))
    yb = jax.device_put(jnp.asarray(y), batch_sharding(mesh_tp))
    s_tp, m_tp = step(s_tp, xb, yb)

    # identical math regardless of layout
    np.testing.assert_allclose(
        np.asarray(m_dp)[0], np.asarray(m_tp)[0], rtol=1e-5
    )
    # updated params agree across layouts
    a = np.asarray(s_dp[0]["out"]["kernel"])
    b = np.asarray(s_tp[0]["out"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_tp_train_step_tcn_matches_dp():
    """The ResNetTCN extension under the same generic path-suffix rules:
    its Conv1D head kernels shard as (None, None, "model") and the dp==dpxtp
    equivalence must hold exactly as for the LSTM arch."""
    param = dict(PARAM, architecture="ResNetTCN", name="tp-tcn-test")
    model = build_model(param)

    def make_state(trainer, mesh, tp):
        p0, stats, _, key = trainer.init_state(INPUT_SHAPE, seed=3)
        if tp:
            p0 = shard_params(p0, mesh)
        opt = trainer.optimizer.init(p0)
        return (p0, stats, opt, key)

    rng = np.random.default_rng(1)
    x = rng.uniform(size=(8, *INPUT_SHAPE)).astype(np.float32)
    y = rng.integers(0, 2, size=(8, OUT, 2)).astype(np.float32)

    mesh_dp = make_mesh(n_data=8)
    tr_dp = Trainer(model, make_optimizer(1e-3), mesh=mesh_dp)
    s_dp = make_state(tr_dp, mesh_dp, tp=False)
    s_dp, m_dp = tr_dp.train_step(s_dp, jnp.asarray(x), jnp.asarray(y))

    mesh_tp = make_mesh(n_data=4, n_model=2)
    tr_tp = Trainer(model, make_optimizer(1e-3), mesh=mesh_tp)
    s_tp = make_state(tr_tp, mesh_tp, tp=True)
    specs = params_shardings(s_tp[0], mesh_tp)
    assert specs["tcn0_conv"]["kernel"].spec == P(None, None, "model")
    step = jax.jit(tr_tp._train_step, donate_argnums=(0,))
    xb = jax.device_put(jnp.asarray(x), batch_sharding(mesh_tp))
    yb = jax.device_put(jnp.asarray(y), batch_sharding(mesh_tp))
    s_tp, m_tp = step(s_tp, xb, yb)

    np.testing.assert_allclose(
        np.asarray(m_dp)[0], np.asarray(m_tp)[0], rtol=1e-5
    )
    a = np.asarray(s_dp[0]["out"]["kernel"])
    b = np.asarray(s_tp[0]["out"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-5)
