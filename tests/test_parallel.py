"""Mesh/sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diffusion_pullback_tpu.geometry import local_pullback
from diffusion_pullback_tpu.models import UNet2D, ddpm_tiny
from diffusion_pullback_tpu.ops import DiffusionSchedule
from diffusion_pullback_tpu.parallel import (
    make_mesh,
    mesh_shape_for,
    sharded_local_pullback,
)
from diffusion_pullback_tpu.training import create_train_state, make_train_step


pytestmark = pytest.mark.slow  # heavy e2e/oracle/mesh (make test-all)


def test_mesh_shape_for():
    assert mesh_shape_for(8, ("dp",)) == {"dp": 8}
    s = mesh_shape_for(8, ("dp", "probe"))
    assert s["dp"] * s["probe"] == 8 and s["probe"] > 1
    assert mesh_shape_for(1, ("dp", "probe")) == {"dp": 1, "probe": 1}


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def _mlp():
    key = jax.random.key(7)
    k1, k2, k3 = jax.random.split(key, 3)
    W1 = jax.random.normal(k1, (24, 32)) / 5.0
    W2 = jax.random.normal(k2, (32, 16)) / 5.0
    f = lambda x: jnp.tanh(jnp.tanh(x @ W1) @ W2)
    x = jax.random.normal(k3, (1, 24))
    return f, x


def test_sharded_pullback_matches_single_device():
    f, x = _mlp()
    mesh = make_mesh(("probe",))
    res_sh = sharded_local_pullback(
        f, x, jax.random.key(0), mesh, pca_rank=8, max_iter=30, atol=1e-6
    )
    res_1d = local_pullback(f, x, jax.random.key(0), pca_rank=8, max_iter=30, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res_sh.s), np.asarray(res_1d.s), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_sh.vT), np.asarray(res_1d.vT), atol=1e-4
    )
    # vT is genuinely sharded over the probe axis
    assert len(res_sh.vT.sharding.device_set) == 8


def test_make_mesh_explicit_shape_takes_device_prefix():
    """`--mesh_axes tp:2` on an 8-device host must build a 2-device mesh
    (device prefix), not fail coverage; explicit devices still enforce it."""
    mesh = make_mesh(("tp",), shape={"tp": 2})
    assert dict(mesh.shape) == {"tp": 2}
    assert list(mesh.devices.flat) == jax.devices()[:2]
    with pytest.raises(ValueError, match="does not cover"):
        make_mesh(("tp",), shape={"tp": 2}, devices=jax.devices()[:4])


def test_dp_sharded_train_step():
    """One diffusion train step with batch sharded over dp and params
    replicated; loss must match the unsharded step bit-for-bit-ish."""
    cfg = ddpm_tiny(16)
    model = UNet2D(cfg)
    x = jnp.zeros((8, 16, 16, 3))
    params = model.init(jax.random.key(0), x[:1], jnp.float32(0.0))
    sched = DiffusionSchedule.linear()
    opt = optax.adam(1e-4)
    state = create_train_state(params, opt)
    step = make_train_step(
        lambda p, xt, t: model.apply(p, xt, t), sched, opt, ema_rate=0.999
    )

    batch = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 16, 16, 3)) * 0.5, jnp.float32
    )
    key = jax.random.key(42)

    # unsharded
    _, m_ref = jax.jit(step)(state, batch, key)

    mesh = make_mesh(("dp",))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    state_sh = jax.device_put(state, repl)
    batch_sh = jax.device_put(batch, data)
    step_sh = jax.jit(step, in_shardings=(repl, data, repl))
    new_state, m = step_sh(state_sh, batch_sh, key)
    assert float(m["loss"]) == pytest.approx(float(m_ref["loss"]), rel=1e-5)
    assert int(m["step"]) == 1
    # ema moved toward params
    d = jax.tree.leaves(
        jax.tree.map(lambda e, p: float(jnp.abs(e - p).max()),
                     new_state.ema_params, new_state.params)
    )
    assert max(d) > 0.0


def test_dp_vmap_pullback_sweep():
    """Sweep-axis data parallelism: 8 pullbacks over an 8-device dp mesh
    match the unsharded vmap bit-for-bit-ish."""
    from diffusion_pullback_tpu.parallel.sharded_pullback import dp_vmap

    f, x = _mlp()

    def pull_one(xi, key):
        return local_pullback(f, xi[None], key, pca_rank=4, min_iter=3,
                              max_iter=5, atol=0.0)

    xs = jax.random.normal(jax.random.key(5), (8, 24))
    keys = jax.random.split(jax.random.key(6), 8)

    ref = jax.vmap(pull_one)(xs, keys)
    mesh = make_mesh(("dp",))
    out = dp_vmap(pull_one, mesh)(xs, keys)
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vT), np.asarray(ref.vT), atol=1e-5)
    assert len(out.s.sharding.device_set) == 8


def test_checkpoint_save_restore(tmp_path):
    from diffusion_pullback_tpu.training.checkpoint import CheckpointManager

    cfg = ddpm_tiny(16)
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.float32(0.0))
    opt = optax.adam(1e-4)
    state = create_train_state(params, opt)
    step = make_train_step(lambda p, xt, t: model.apply(p, xt, t),
                           DiffusionSchedule.linear(), opt)
    batch = jnp.ones((2, 16, 16, 3)) * 0.1
    for i in range(3):
        state, _ = jax.jit(step)(state, batch, jax.random.key(i))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(state)
    assert mgr.latest_step() == 3
    template = create_train_state(params, opt)
    restored = mgr.restore(template)
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # gc keeps only `keep` newest
    state2, _ = jax.jit(step)(state, batch, jax.random.key(9))
    mgr.save(state2)
    state3, _ = jax.jit(step)(state2, batch, jax.random.key(10))
    mgr.save(state3)
    assert mgr.latest_step() == 5
    import os as _os
    names = sorted(_os.listdir(tmp_path / "ckpt"))
    assert names == ["step_00000004", "step_00000005"]


def test_checkpoint_multi_ema_roundtrip(tmp_path):
    """The multi-rate EMA state (ema_params as a tuple of pytrees) survives
    the save/restore round trip with tuple structure intact."""
    from diffusion_pullback_tpu.training.checkpoint import CheckpointManager

    model = UNet2D(ddpm_tiny(16))
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.float32(0.0))
    opt = optax.sgd(1e-2)
    rates = (0.0, 0.9)
    state = create_train_state(params, opt, n_ema=len(rates))
    step = make_train_step(lambda p, xt, t: model.apply(p, xt, t),
                           DiffusionSchedule.linear(), opt, ema_rate=rates)
    state, _ = jax.jit(step)(state, jnp.ones((2, 16, 16, 3)) * 0.1,
                             jax.random.key(1))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state)
    restored = mgr.restore(create_train_state(params, opt, n_ema=len(rates)))
    assert isinstance(restored.ema_params, tuple)
    assert len(restored.ema_params) == 2
    for a, b in zip(jax.tree.leaves(restored.ema_params),
                    jax.tree.leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_2d_mesh_dp_probe_harvest():
    """Sweep axis over 'dp' AND probe axis over 'probe' simultaneously on a
    4x2 mesh: vmapped pullbacks whose internal probe iterate is sharded."""
    from jax.sharding import PartitionSpec as P2

    f, _ = _mlp()
    mesh = make_mesh(("dp", "probe"), shape={"dp": 4, "probe": 2})
    repl = NamedSharding(mesh, P2())
    dp_sh = NamedSharding(mesh, P2("dp"))

    def pull_one(xi, key):
        res = local_pullback(f, xi[None], key, pca_rank=4, min_iter=3,
                             max_iter=5, atol=0.0)
        # constrain the probe axis of the result over the 'probe' mesh axis
        return res._replace(
            vT=jax.lax.with_sharding_constraint(
                res.vT, NamedSharding(mesh, P2("probe", None))
            )
        )

    xs = jax.random.normal(jax.random.key(7), (4, 24))
    keys = jax.random.split(jax.random.key(8), 4)
    run = jax.jit(jax.vmap(pull_one), in_shardings=(dp_sh, dp_sh))
    with mesh:
        out = run(xs, keys)
    jax.block_until_ready(out)
    ref = jax.vmap(lambda x, k: local_pullback(
        f, x[None], k, pca_rank=4, min_iter=3, max_iter=5, atol=0.0))(xs, keys)
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.vT), np.asarray(ref.vT), atol=1e-4)
    assert len(out.vT.sharding.device_set) == 8  # uses the whole mesh


class TestTensorParallel:
    """Megatron-layout TP via parameter shardings (parallel/tp.py): the
    unchanged forward under GSPMD must match the single-device result."""

    def _sd(self):
        import numpy as _np

        from diffusion_pullback_tpu.models import UNet2DCondition
        from diffusion_pullback_tpu.models.configs import sd_tiny_unet

        model = UNet2DCondition(sd_tiny_unet(8))
        x = jnp.asarray(_np.random.default_rng(0).normal(size=(1, 8, 8, 4)),
                        jnp.float32)
        ctx = jnp.asarray(_np.random.default_rng(1).normal(size=(1, 7, 16)),
                          jnp.float32)
        t = jnp.float32(321.0)
        params = model.init(jax.random.key(0), x, t, ctx)
        return model, params, x, t, ctx

    def test_specs_shard_attention_projections_only(self):
        from diffusion_pullback_tpu.parallel import (
            tp_param_specs,
            tp_sharded_leaf_count,
        )

        model, params, x, t, ctx = self._sd()
        mesh = make_mesh(("tp",), shape={"tp": 2}, devices=jax.devices()[:2])
        specs = tp_param_specs(params, mesh)
        flat = jax.tree_util.tree_flatten_with_path(specs)[0]
        by_name = {}
        for path, s in flat:
            names = [p.key for p in path if hasattr(p, "key")]
            by_name.setdefault((names[-2], names[-1]), set()).add(s.spec)
        # column-parallel: qkv kernels shard the output axis
        assert by_name[("to_q", "kernel")] == {P(None, "tp")}
        assert by_name[("to_v", "kernel")] == {P(None, "tp")}
        # row-parallel: out-projection kernels shard the input axis
        assert by_name[("to_out", "kernel")] == {P("tp", None)}
        assert by_name[("net_2", "kernel")] == {P("tp", None)}
        # row-parallel bias and norms replicate
        assert by_name[("to_out", "bias")] == {P()}
        assert all(s == {P()} for (owner, leaf), s in by_name.items()
                   if "norm" in owner)
        assert tp_sharded_leaf_count(specs) >= 10

    @pytest.mark.parametrize("tp_size", [2, 4])
    def test_sd_forward_parity(self, tp_size):
        from diffusion_pullback_tpu.parallel import tp_shard_params

        model, params, x, t, ctx = self._sd()
        ref = jax.jit(model.apply)(params, x, t, ctx)
        mesh = make_mesh(("tp",), shape={"tp": tp_size},
                         devices=jax.devices()[:tp_size])
        params_tp = tp_shard_params(params, mesh)
        with mesh:
            out = jax.jit(model.apply)(params_tp, x, t, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def test_uncond_forward_parity(self):
        from diffusion_pullback_tpu.models import ddpm_tiny
        from diffusion_pullback_tpu.parallel import tp_shard_params

        model = UNet2D(ddpm_tiny(16))
        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(1, 16, 16, 3)), jnp.float32)
        t = jnp.float32(400.0)
        params = model.init(jax.random.key(1), x, t)
        ref = jax.jit(model.apply)(params, x, t)
        mesh = make_mesh(("tp",), shape={"tp": 2}, devices=jax.devices()[:2])
        params_tp = tp_shard_params(params, mesh)
        with mesh:
            out = jax.jit(model.apply)(params_tp, x, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def test_composes_with_dp_batch_axis(self):
        """('dp','tp') mesh: batch over dp, weights over tp, one jit."""
        from diffusion_pullback_tpu.parallel import tp_shard_params

        model, params, x, t, ctx = self._sd()
        xb = jnp.concatenate([x] * 4)
        cb = jnp.concatenate([ctx] * 4)
        ref = jax.jit(model.apply)(params, xb, t, cb)
        mesh = make_mesh(("dp", "tp"), shape={"dp": 2, "tp": 2},
                         devices=jax.devices()[:4])
        params_tp = tp_shard_params(params, mesh)
        xb_sh = jax.device_put(xb, NamedSharding(mesh, P("dp")))
        cb_sh = jax.device_put(cb, NamedSharding(mesh, P("dp")))
        with mesh:
            out = jax.jit(model.apply)(params_tp, xb_sh, t, cb_sh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
