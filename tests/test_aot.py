"""AOT program-export cache (utils/aot.py): export → deserialize round trip,
key sensitivity, and the fail-open fallback."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.utils.aot import AOTProgramCache


def f(a, b):
    return jnp.tanh(a @ b) * 2.0


@pytest.fixture
def args():
    k = jax.random.key(0)
    return (jax.random.normal(k, (4, 8)), jax.random.normal(k, (8, 3)))


def test_export_roundtrip(tmp_path, args):
    cache = AOTProgramCache(str(tmp_path))
    out1 = cache.wrap("f", f)(*args)
    files = list(tmp_path.iterdir())
    assert len(files) == 1 and files[0].name.endswith(".jaxexport")

    # a fresh process-equivalent: deserialize must serve the call without
    # re-exporting (exporting again would raise here)
    cache2 = AOTProgramCache(str(tmp_path))
    real_export = jax.export.export
    try:
        jax.export.export = lambda *_a, **_k: (_ for _ in ()).throw(
            AssertionError("re-exported instead of deserializing"))
        out2 = cache2.wrap("f", f)(*args)
    finally:
        jax.export.export = real_export
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(f(*args)),
                               atol=1e-6)


def test_distinct_shapes_get_distinct_exports(tmp_path, args):
    cache = AOTProgramCache(str(tmp_path))
    run = cache.wrap("f", f)
    run(*args)
    a2 = (jnp.zeros((2, 8)), jnp.zeros((8, 3)))
    out = run(*a2)
    assert out.shape == (2, 3)
    assert len(list(tmp_path.iterdir())) == 2


def test_fail_open_on_unwritable_dir(tmp_path, args):
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file where the export dir should go")
    cache = AOTProgramCache(str(blocker))
    out = cache.wrap("f", f)(*args)  # export write fails -> plain jit
    np.testing.assert_allclose(np.asarray(out), np.asarray(f(*args)),
                               atol=1e-6)


def test_pytree_args_key(tmp_path):
    cache = AOTProgramCache(str(tmp_path))
    g = lambda tree: tree["a"] * tree["b"]["c"] + 1.0
    tree = {"a": jnp.ones((3,)), "b": {"c": jnp.full((3,), 2.0)}}
    out = cache.wrap("g", g)(tree)
    np.testing.assert_allclose(np.asarray(out), np.full((3,), 3.0))
    assert len(list(tmp_path.iterdir())) == 1


def test_fingerprint_separates_exports(tmp_path, args):
    """Closures bake flag-derived constants into the export (ADVICE r4):
    two wraps with the same name/avals but different fingerprints must not
    share an artifact, and each must replay ITS constant."""
    cache = AOTProgramCache(str(tmp_path))
    mk = lambda s: (lambda a, b: jnp.tanh(a @ b) * s)
    out1 = cache.wrap("f", mk(2.0), fingerprint="s2")(*args)
    out2 = cache.wrap("f", mk(5.0), fingerprint="s5")(*args)
    assert len(list(tmp_path.iterdir())) == 2
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1) * 2.5,
                               atol=1e-5)

    # fresh cache (new process equivalent): same fingerprint -> same artifact
    cache2 = AOTProgramCache(str(tmp_path))
    real_export = jax.export.export
    try:
        jax.export.export = lambda *_a, **_k: (_ for _ in ()).throw(
            AssertionError("re-exported instead of deserializing"))
        out1b = cache2.wrap("f", mk(2.0), fingerprint="s2")(*args)
        out2b = cache2.wrap("f", mk(5.0), fingerprint="s5")(*args)
    finally:
        jax.export.export = real_export
    np.testing.assert_allclose(np.asarray(out1b), np.asarray(out1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out2b), np.asarray(out2), atol=1e-6)


def test_cfg_fingerprint_tracks_mutation():
    """DriverCommonMixin._cfg_fingerprint must change when a traced-constant
    flag changes, and ignore IO paths / the mesh handle."""
    import dataclasses

    from diffusion_pullback_tpu.experiments._common import DriverCommonMixin

    @dataclasses.dataclass
    class Cfg:
        guidance_scale: float = 0.0
        inv_steps: int = 100
        result_folder: str = "./runs/a"
        mesh: object = None

    class D(DriverCommonMixin):
        def __init__(self, cfg):
            self.cfg = cfg

    d = D(Cfg())
    fp0 = d._cfg_fingerprint()
    d.cfg.guidance_scale = 7.5
    fp1 = d._cfg_fingerprint()
    assert fp0 != fp1
    d.cfg.result_folder = "./runs/b"
    d.cfg.mesh = object()
    assert d._cfg_fingerprint() == fp1
