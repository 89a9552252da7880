"""SD stack structural tests: conditioned U-Net taps, VAE, CLIP text."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    HashTokenizer,
    TapPoint,
    UNet2DCondition,
    clip_text_tiny,
    sd_tiny_unet,
    vae_tiny,
)


@pytest.fixture(scope="module")
def sd_tiny():
    cfg = sd_tiny_unet(8)
    model = UNet2DCondition(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 4)), jnp.float32)
    ctx = jnp.asarray(np.random.default_rng(1).normal(size=(1, 7, 16)), jnp.float32)
    t = jnp.float32(321.0)
    params = model.init(jax.random.key(0), x, t, ctx)
    return model, params, x, t, ctx


def test_cond_forward_shape(sd_tiny):
    model, params, x, t, ctx = sd_tiny
    eps = model.apply(params, x, t, ctx)
    assert eps.shape == x.shape


COND_TAPS = [TapPoint("down", 0), TapPoint("down", 1), TapPoint("mid", 0),
             TapPoint("up", 0), TapPoint("up", 1)]


@pytest.mark.parametrize("tap", COND_TAPS, ids=str)
def test_cond_encode_decode_composes(sd_tiny, tap):
    model, params, x, t, ctx = sd_tiny
    full = model.apply(params, x, t, ctx)
    h, state = model.apply(
        params, x, t, ctx, tap, method=UNet2DCondition.encode_with_state
    )
    back = model.apply(
        params, h, state, tap, method=UNet2DCondition.decode_with_state
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(back))


@pytest.mark.slow
def test_cond_probe_batch_broadcasts_context(sd_tiny):
    model, params, x, t, ctx = sd_tiny
    tap = TapPoint("mid", 0)
    h, state = model.apply(
        params, x, t, ctx, tap, method=UNet2DCondition.encode_with_state
    )
    h3 = jnp.concatenate([h, h, h], axis=0)
    eps = model.apply(
        params, h3, state, tap, method=UNet2DCondition.decode_with_state
    )
    assert eps.shape == (3, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(eps[0]), np.asarray(eps[1]))


@pytest.mark.slow
def test_cond_encode_jvp(sd_tiny):
    """The pullback requirement: linearize through the conditioned encoder."""
    model, params, x, t, ctx = sd_tiny
    tap = TapPoint("mid", 0)
    f = lambda z: model.apply(params, z, t, ctx, tap,
                              method=UNet2DCondition.encode)
    h, jvp_fn = jax.linearize(f, x)
    v = jnp.ones_like(x) / x.size
    u = jvp_fn(v)
    assert u.shape == h.shape
    vjp_fn = jax.linear_transpose(jvp_fn, x)
    (w,) = vjp_fn(u)
    assert float(jnp.vdot(u, u)) == pytest.approx(float(jnp.vdot(w, v)), rel=1e-4)


def test_cfg_batch_eval(sd_tiny):
    """Classifier-free guidance pattern: 2-batch [uncond; cond] in one call."""
    model, params, x, t, ctx = sd_tiny
    ctx2 = jnp.concatenate([jnp.zeros_like(ctx), ctx], axis=0)
    x2 = jnp.concatenate([x, x], axis=0)
    eps = model.apply(params, x2, t, ctx2)
    e_un, e_c = np.asarray(eps[0]), np.asarray(eps[1])
    assert np.abs(e_un - e_c).max() > 1e-6  # conditioning actually matters


def test_vae_round_trip_shapes():
    cfg = vae_tiny(16)
    vae = AutoencoderKL(cfg)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 16, 16, 3)), jnp.float32)
    params = vae.init(jax.random.key(0), x)
    z = vae.apply(params, x, method=AutoencoderKL.encode)
    assert z.shape == (1, 8, 8, 4)  # one downsample (2 blocks)
    mean, logvar = vae.apply(params, x, method=AutoencoderKL.encode_moments)
    assert mean.shape == z.shape and logvar.shape == z.shape
    # encode with key is stochastic around the mean
    z1 = vae.apply(params, x, jax.random.key(1), method=AutoencoderKL.encode)
    z2 = vae.apply(params, x, jax.random.key(2), method=AutoencoderKL.encode)
    assert float(jnp.abs(z1 - z2).max()) > 0
    y = vae.apply(params, z, method=AutoencoderKL.decode)
    assert y.shape == x.shape


def test_clip_text_encoder():
    cfg = clip_text_tiny()
    model = CLIPTextModel(cfg)
    tok = HashTokenizer(cfg.vocab_size, cfg.max_length)
    ids = jnp.asarray(tok(["hello world", ""]))
    assert ids.shape == (2, 8)
    params = model.init(jax.random.key(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (2, 8, 16)
    # deterministic and prompt-sensitive
    out2 = model.apply(params, jnp.asarray(tok(["hello world", ""])))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = model.apply(params, jnp.asarray(tok(["other prompt", ""])))
    assert np.abs(np.asarray(out3[0]) - np.asarray(out[0])).max() > 1e-6


def test_causal_mask():
    """Token i's embedding must not depend on tokens after i."""
    cfg = clip_text_tiny()
    model = CLIPTextModel(cfg)
    tok = HashTokenizer(cfg.vocab_size, cfg.max_length)
    a = jnp.asarray(tok(["one two three"]))
    b = a.at[0, 4].set(99)  # change a later token
    params = model.init(jax.random.key(0), a)
    ea = model.apply(params, a)
    eb = model.apply(params, b)
    np.testing.assert_array_equal(np.asarray(ea[0, :4]), np.asarray(eb[0, :4]))
    assert np.abs(np.asarray(ea[0, 4:]) - np.asarray(eb[0, 4:])).max() > 0


def test_sdxl_addition_embeddings():
    from diffusion_pullback_tpu.models import sdxl_tiny_unet

    cfg = sdxl_tiny_unet(8)
    model = UNet2DCondition(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, 16))
    te = jnp.ones((1, 8))       # pooled text
    tids = jnp.ones((1, 6))     # time_ids
    t = jnp.float32(3.0)
    params = model.init(jax.random.key(0), x, t, ctx, added_cond=(te, tids))
    out = model.apply(params, x, t, ctx, added_cond=(te, tids))
    assert out.shape == x.shape
    # missing added_cond must fail loudly
    with pytest.raises(ValueError, match="addition embeddings"):
        model.apply(params, x, t, ctx)
    # addition embedding actually conditions the output
    out2 = model.apply(params, x, t, ctx, added_cond=(te * 2.0, tids))
    assert float(jnp.abs(out - out2).max()) > 1e-7
    # taps work with added conds
    tap = TapPoint("mid", 0)
    h, state = model.apply(params, x, t, ctx, tap, added_cond=(te, tids),
                           method=UNet2DCondition.encode_with_state)
    back = model.apply(params, h, state, tap,
                       method=UNet2DCondition.decode_with_state)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(back))


def test_cond_intra_block_taps(sd_tiny):
    model, params, x, t, ctx = sd_tiny
    h_res = model.apply(params, x, t, ctx, TapPoint("down", 0, ("res", 0)),
                        method=UNet2DCondition.encode)
    h_attn = model.apply(params, x, t, ctx, TapPoint("down", 0, ("attn", 0)),
                         method=UNet2DCondition.encode)
    assert h_res.shape == h_attn.shape
    assert float(jnp.abs(h_res - h_attn).max()) > 1e-7


def test_clip_pooled_output():
    cfg = clip_text_tiny()
    model = CLIPTextModel(cfg)
    tok = HashTokenizer(cfg.vocab_size, cfg.max_length)
    ids = jnp.asarray(tok(["short", "a longer test prompt"]))
    params = model.init(jax.random.key(0), ids, return_pooled=True)
    hidden, pooled = model.apply(params, ids, return_pooled=True)
    assert hidden.shape == (2, 8, 16) and pooled.shape == (2, 16)
    # pooled feature tracks the (per-prompt) eos position: differs per row
    assert float(jnp.abs(pooled[0] - pooled[1]).max()) > 1e-6
    # plain call still works without the projection params being used
    hidden2 = model.apply(params, ids)
    np.testing.assert_array_equal(np.asarray(hidden), np.asarray(hidden2))


def test_remat_transformer_identical_outputs():
    """remat_transformer changes memory behaviour only — outputs are
    bit-identical with the same params."""
    import dataclasses

    from diffusion_pullback_tpu.models import sdxl_tiny_unet

    cfg = sdxl_tiny_unet(8)
    m = UNet2DCondition(cfg)
    mr = UNet2DCondition(dataclasses.replace(cfg, remat_transformer=True))
    x = jnp.ones((1, 8, 8, 4)) * 0.1
    ctx = jnp.ones((1, 7, 16)) * 0.1
    te, tids = jnp.ones((1, 8)), jnp.ones((1, 6))
    t = jnp.float32(5.0)
    p = m.init(jax.random.key(0), x, t, ctx, added_cond=(te, tids))
    a = m.apply(p, x, t, ctx, added_cond=(te, tids))
    b = mr.apply(p, x, t, ctx, added_cond=(te, tids))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and jvp works through the remat blocks (pullback compatibility)
    f = lambda q: mr.apply(p, q, t, ctx, TapPoint("mid", 0),
                           added_cond=(te, tids), method=UNet2DCondition.encode)
    _, lin = jax.linearize(f, x)
    assert lin(jnp.ones_like(x)).shape == f(x).shape


def test_vae_flash_attn_impl_matches_xla():
    """attn_impl='flash' (interpret-mode Pallas on CPU) through the actual
    VAE mid block must match the xla path; non-tiling seqs fall back."""
    import dataclasses

    from unittest import mock

    from diffusion_pullback_tpu.models import vae_tiny
    from diffusion_pullback_tpu.ops.pallas import flash_attention as fa

    cfg_x = vae_tiny(16)
    cfg_f = dataclasses.replace(cfg_x, attn_impl="flash")
    x = jnp.asarray(np.random.default_rng(6).normal(size=(1, 16, 16, 3)),
                    jnp.float32)
    vx = AutoencoderKL(cfg_x)
    params = vx.init(jax.random.key(0), x)
    out_x = vx.apply(params, x, method=AutoencoderKL.encode)
    # run the flash path through the interpreter (no TPU in tests)
    orig = fa._flash
    with mock.patch.object(
        fa, "_flash", lambda q, k, v, scale, interpret: orig(q, k, v, scale, True)
    ):
        vf = AutoencoderKL(cfg_f)
        out_f = vf.apply(params, x, method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), atol=2e-5)


def test_fuse_qkv_identical_params_and_outputs(sd_tiny):
    """project_qkv's fused dot must be a pure execution detail: the param
    tree (names, shapes, init values) and the forward outputs match the
    unfused three-Dense layout exactly (same per-element reduction order —
    concatenation along the output axis reassociates nothing)."""
    import dataclasses

    model, params, x, t, ctx = sd_tiny
    unfused = UNet2DCondition(
        dataclasses.replace(model.config, fuse_qkv=False))
    params_u = unfused.init(jax.random.key(0), x, t, ctx)
    jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, params_u))
    out_f = model.apply(params, x, t, ctx)
    out_u = unfused.apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=0, atol=1e-6)


def test_fuse_qkv_selfattention2d_parity():
    """Same guarantee for the uncond family's SelfAttention2D."""
    from diffusion_pullback_tpu.models.layers import SelfAttention2D

    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 4, 4, 16)),
                    jnp.float32)
    fused = SelfAttention2D(num_head_channels=8, norm_num_groups=4)
    plain = SelfAttention2D(num_head_channels=8, norm_num_groups=4,
                            fuse_qkv=False)
    p = fused.init(jax.random.key(3), x)
    p2 = plain.init(jax.random.key(3), x)
    jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), p, p2))
    np.testing.assert_allclose(np.asarray(fused.apply(p, x)),
                               np.asarray(plain.apply(p, x)),
                               rtol=0, atol=1e-6)
