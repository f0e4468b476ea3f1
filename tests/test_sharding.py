"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Validates that the dp/tp-sharded forward and train step produce the same
numbers as the single-device path (XLA inserts the collectives; outputs must
be bitwise-close), and that parameters actually land sharded.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.config import PAD_ID, test_preset
from mdcnet_tpu.models import build_model
from mdcnet_tpu.parallel import sharding as sh
from mdcnet_tpu.train.state import create_train_state, make_optimizer
from mdcnet_tpu.train.step import make_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def setup():
    cfg = test_preset()
    model = build_model(cfg.model)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (8, cfg.data.img_size,
                                      cfg.data.img_size, 3))
    y = np.full((8, cfg.data.max_len), PAD_ID, np.int32)
    y[:, :11] = [300, 303, 270, 271, 304, 263, 10, 20, 110, 120, 301]
    y = jnp.asarray(y)
    state = create_train_state(model, cfg, rng, images, y[:, :-1])
    return cfg, model, state, images, y


class TestMesh:
    def test_make_mesh_axes(self):
        mesh = sh.make_mesh(data=4, model=2)
        assert mesh.shape == {"data": 4, "model": 2, "context": 1}

    def test_auto_mesh(self):
        mesh = sh.auto_mesh(8)
        assert mesh.shape["data"] * mesh.shape["model"] == 8


class TestShardedForward:
    def test_tp_forward_matches_single_device(self, setup):
        cfg, model, state, images, y = setup
        single = model.apply(state.params, images, y[:, :-1])

        mesh = sh.make_mesh(data=2, model=2)
        with mesh:
            params = sh.shard_params(state.params, mesh)
            im_s, y_s = sh.data_parallel_batch(mesh, images, y[:, :-1])
            sharded = jax.jit(lambda p, i, t: model.apply(p, i, t))(
                params, im_s, y_s)
        np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                                   rtol=2e-4, atol=1e-4)

    def test_params_are_actually_sharded(self, setup):
        cfg, model, state, *_ = setup
        mesh = sh.make_mesh(data=4, model=2)
        params = sh.shard_params(state.params, mesh)
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        sharded_count = 0
        for path, leaf in flat:
            spec = leaf.sharding.spec
            if any(ax is not None for ax in spec):
                sharded_count += 1
                # a model-sharded dim must be split across 2 devices
                shard_shape = leaf.sharding.shard_shape(leaf.shape)
                assert shard_shape != leaf.shape
        assert sharded_count >= 10  # qkv/out/ffn kernels across layers


class TestShardState:
    def test_moments_sharded_like_params_with_values_preserved(self, setup):
        cfg, model, state, images, y = setup
        # give the moments non-trivial values first (as after a resume)
        train_step, _ = make_train_step(model, cfg)
        state, _ = train_step(state, images, y)

        mesh = sh.make_mesh(data=4, model=2)
        sstate = sh.shard_state(state, mesh, make_optimizer(cfg.train))

        # values preserved bit-exactly
        for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                        jax.tree_util.tree_leaves(sstate.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # every model-sharded param has its adam mu/nu sharded the same way
        p_flat = jax.tree_util.tree_flatten_with_path(
            sstate.params["params"])[0]
        mu = sstate.opt_state[0].mu
        mu_flat = {sh._path_str(p): leaf for p, leaf
                   in jax.tree_util.tree_flatten_with_path(mu)[0]}
        n_sharded = 0
        for path, leaf in p_flat:
            key = sh._path_str(path)
            if any(ax is not None for ax in leaf.sharding.spec):
                n_sharded += 1
                assert mu_flat[key].sharding.spec == leaf.sharding.spec, key
        assert n_sharded >= 10

    def test_step_runs_from_blessed_state(self, setup):
        cfg, model, state, images, y = setup
        mesh = sh.make_mesh(data=2, model=2)
        train_step, _ = make_train_step(model, cfg)
        sstate = sh.shard_state(state, mesh, make_optimizer(cfg.train))
        with mesh:
            im_s, y_s = sh.data_parallel_batch(mesh, images, y)
            sstate, metrics = train_step(sstate, im_s, y_s)
            jax.block_until_ready(metrics)
        assert np.isfinite(float(metrics["total_loss"]))


class TestShardedTrainStep:
    def test_step_matches_single_device(self, setup):
        cfg, model, state, images, y = setup
        train_step, _ = make_train_step(model, cfg)
        _, metrics_single = train_step(state, images, y)

        mesh = sh.make_mesh(data=2, model=2)
        sstate = sh.shard_state(state, mesh, make_optimizer(cfg.train))
        with mesh:
            im_s, y_s = sh.data_parallel_batch(mesh, images, y)
            new_state, metrics = train_step(sstate, im_s, y_s)
            jax.block_until_ready(metrics)

        # loss value identical up to reduction order
        np.testing.assert_allclose(float(metrics["total_loss"]),
                                   float(metrics_single["total_loss"]),
                                   rtol=2e-4)
        np.testing.assert_allclose(float(metrics["ce_loss"]),
                                   float(metrics_single["ce_loss"]),
                                   rtol=2e-4)

    def test_two_sharded_steps_progress(self, setup):
        cfg, model, state, images, y = setup
        mesh = sh.make_mesh(data=8, model=1)
        train_step, eval_step = make_train_step(model, cfg)
        sstate = sh.shard_state(state, mesh, make_optimizer(cfg.train))
        with mesh:
            im_s, y_s = sh.data_parallel_batch(mesh, images, y)
            m0, _ = eval_step(sstate, im_s, y_s)
            for _ in range(3):
                sstate, _ = train_step(sstate, im_s, y_s)
            m1, _ = eval_step(sstate, im_s, y_s)
        assert float(m1["ce_loss"]) < float(m0["ce_loss"])
