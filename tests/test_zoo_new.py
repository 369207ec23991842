"""Tests for the round-2 zoo additions: DUF, DIC, LIIF, TTSR, GLEAN,
RealBasicVSR, StyleGAN2 components, discriminators, and the GAN losses /
restorer.  Golden tests (torch oracles written fresh here) cover the
gather/fold-heavy ops where layout bugs hide: DUF's dynamic filter, TTSR's
search transformer, LIIF's nearest sampling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import torch.nn.functional as F

RNG = np.random.default_rng(11)


def _rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


# ------------------------------- DUF ----------------------------------------


def test_duf_filter_matches_torch():
    from fcvsr_tpu.models.duf import dynamic_upsampling_filter

    x = _rand(2, 6, 7, 3)
    filters = _rand(2, 6, 7, 25, 4)
    got = np.asarray(dynamic_upsampling_filter(jnp.asarray(x),
                                               jnp.asarray(filters)))

    # torch oracle: identity im2col conv + matmul (reference formulation)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    expansion = torch.eye(25).view(25, 1, 5, 5).repeat(3, 1, 1, 1)
    expanded = F.conv2d(xt, expansion, padding=2, groups=3)  # (n, 75, h, w)
    expanded = expanded.view(2, 3, 25, 6, 7).permute(0, 3, 4, 1, 2)
    ft = torch.from_numpy(filters).permute(0, 1, 2, 3, 4)  # (n,h,w,25,4)
    ref = torch.matmul(expanded, ft)  # (n, h, w, 3, 4)
    ref = ref.permute(0, 3, 4, 1, 2).reshape(2, 12, 6, 7)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))  # (n, h, w, 12)
    np.testing.assert_allclose(got, ref, atol=1e-5)


# ------------------------------- DIC ----------------------------------------


@pytest.mark.slow
def test_dic_forward_and_grad():
    from fcvsr_tpu.models.dic import DICNet

    m = DICNet(mid_channels=8, num_blocks=2, hg_mid_channels=16,
               num_steps=2, num_fusion_blocks=1)
    x = jnp.asarray(_rand(1, 3, 16, 16))
    p = m.init(jax.random.PRNGKey(0), x)
    srs, hms = m.apply(p, x)
    assert len(srs) == 2 and len(hms) == 2
    assert srs[0].shape == (1, 3, 128, 128)
    assert hms[0].shape == (1, 68, 32, 32)

    def loss(p):
        srs, hms = m.apply(p, x)
        return sum(jnp.abs(s).mean() for s in srs)

    g = jax.grad(loss)(p)
    assert all(np.isfinite(v).all() for v in jax.tree.leaves(g))


# ------------------------------- LIIF ---------------------------------------


def test_liif_nearest_sample_matches_torch():
    from fcvsr_tpu.models.liif import _nearest_sample

    feat = _rand(2, 5, 7, 4)
    coord = RNG.uniform(-0.99, 0.99, (2, 13, 2)).astype(np.float32)
    got = np.asarray(_nearest_sample(jnp.asarray(feat), jnp.asarray(coord)))

    ft = torch.from_numpy(np.transpose(feat, (0, 3, 1, 2)))
    ct = torch.from_numpy(coord)
    ref = F.grid_sample(ft, ct.flip(-1).unsqueeze(1), mode="nearest",
                        align_corners=False)[:, :, 0, :].permute(0, 2, 1)
    np.testing.assert_allclose(got, ref.numpy(), atol=1e-6)


def test_liif_make_coord():
    from fcvsr_tpu.models.liif import make_coord

    c = np.asarray(make_coord((2, 4)))
    assert c.shape == (8, 2)
    np.testing.assert_allclose(sorted(set(np.round(c[:, 0], 6))), [-0.5, 0.5])
    np.testing.assert_allclose(sorted(set(np.round(c[:, 1], 6))),
                               [-0.75, -0.25, 0.25, 0.75])


def test_liif_forward_and_grad():
    from fcvsr_tpu.models.liif import LIIFEDSR, make_coord

    m = LIIFEDSR(mid_channels=8, num_blocks=2, imnet_hidden=(16, 16))
    lq = jnp.asarray(_rand(1, 3, 8, 8))
    coord = jnp.broadcast_to(make_coord((16, 16))[None], (1, 256, 2))
    cell = jnp.full((1, 256, 2), 2.0 / 16)
    p = m.init(jax.random.PRNGKey(0), lq, coord, cell)
    out = m.apply(p, lq, coord, cell)
    assert out.shape == (1, 256, 3)
    g = jax.grad(lambda p: jnp.abs(m.apply(p, lq, coord, cell)).mean())(p)
    assert all(np.isfinite(v).all() for v in jax.tree.leaves(g))


# ------------------------------- TTSR ---------------------------------------


def test_search_transformer_matches_torch():
    from fcvsr_tpu.models.ttsr import SearchTransformer

    h = w = 4
    lq_up = _rand(1, h, w, 8)
    ref_downup = _rand(1, h, w, 8)
    refs = [_rand(1, h, w, 8), _rand(1, 2 * h, 2 * w, 4),
            _rand(1, 4 * h, 4 * w, 2)]

    soft, tex = SearchTransformer()(jnp.asarray(lq_up),
                                    jnp.asarray(ref_downup),
                                    [jnp.asarray(r) for r in refs])

    # torch oracle, NCHW
    tq = torch.from_numpy(np.transpose(lq_up, (0, 3, 1, 2)))
    tk = torch.from_numpy(np.transpose(ref_downup, (0, 3, 1, 2)))
    tvs = [torch.from_numpy(np.transpose(r, (0, 3, 1, 2))) for r in refs]
    q = F.normalize(F.unfold(tq, 3, padding=1), dim=1)
    k = F.normalize(F.unfold(tk, 3, padding=1).permute(0, 2, 1), dim=2)
    rel = torch.bmm(k, q)
    mv, mi = rel.max(dim=1)
    outs = []
    for i, v in enumerate(tvs):
        s = 2 ** i
        un = F.unfold(v, 3 * s, padding=s, stride=s)
        g = torch.gather(un, 2, mi.unsqueeze(1).expand(-1, un.shape[1], -1))
        f = F.fold(g, (h * s, w * s), 3 * s, padding=s, stride=s) / 9.0
        outs.append(f)
    np.testing.assert_allclose(np.asarray(soft)[..., 0], mv.view(1, h, w),
                               atol=1e-5)
    for got, ref_t in zip(tex, outs):
        np.testing.assert_allclose(np.asarray(got),
                                   np.transpose(ref_t.numpy(), (0, 2, 3, 1)),
                                   atol=1e-4)


@pytest.mark.slow
def test_ttsr_forward_and_grad():
    from fcvsr_tpu.models.ttsr import TTSR

    m = TTSR(mid_channels=8, texture_channels=64, num_blocks=(1, 1, 1, 1))
    lq = jnp.asarray(_rand(1, 3, 8, 8))
    ref = jnp.asarray(_rand(1, 3, 32, 32))
    p = m.init(jax.random.PRNGKey(0), lq, ref)
    out = m.apply(p, lq, ref)
    assert out.shape == (1, 3, 32, 32)
    g = jax.grad(lambda p: jnp.abs(m.apply(p, lq, ref)).mean())(p)
    assert all(np.isfinite(v).all() for v in jax.tree.leaves(g))


# --------------------------- GLEAN / StyleGAN2 -------------------------------


def test_stylegan2_generator_and_discriminator():
    from fcvsr_tpu.models.stylegan2 import (StyleGAN2Discriminator,
                                            StyleGAN2Generator)

    g = StyleGAN2Generator(out_size=16, style_channels=8, num_mlps=2,
                           channel_multiplier=1)
    z = jnp.asarray(_rand(2, 8))
    vg = g.init(jax.random.PRNGKey(0), z)
    img = g.apply(vg, z)
    assert img.shape == (2, 16, 16, 3)

    d = StyleGAN2Discriminator(in_size=16, channel_multiplier=1)
    vd = d.init(jax.random.PRNGKey(0), img)
    assert d.apply(vd, img).shape == (2, 1)


@pytest.mark.slow
def test_glean_forward_and_grad():
    from fcvsr_tpu.models.glean import GLEANStyleGANv2

    m = GLEANStyleGANv2(in_size=8, out_size=32, rrdb_channels=8, num_rrdbs=1,
                        style_channels=8, channel_multiplier=1)
    lq = jnp.asarray(_rand(1, 3, 8, 8))
    v = m.init(jax.random.PRNGKey(0), lq)
    out = m.apply(v, lq)
    assert out.shape == (1, 3, 32, 32)
    g = jax.grad(lambda p: jnp.abs(
        m.apply({"params": p, "noises": v["noises"]}, lq)).mean())(v["params"])
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(g))


def test_glean_rejects_wrong_size():
    from fcvsr_tpu.models.glean import GLEANStyleGANv2

    m = GLEANStyleGANv2(in_size=8, out_size=32)
    with pytest.raises(ValueError):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)))


# ---------------------------- RealBasicVSR -----------------------------------


@pytest.mark.slow
def test_real_basicvsr_forward_and_cleaning():
    from fcvsr_tpu.models.real_basicvsr import RealBasicVSRNet

    m = RealBasicVSRNet(mid_channels=8, num_propagation_blocks=1,
                        num_cleaning_blocks=1, dynamic_refine_thres=255)
    x = jnp.asarray(RNG.uniform(0, 1, (1, 3, 3, 64, 64)).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    out, cleaned = m.apply(p, x, return_lqs=True)
    assert out.shape == (1, 3, 3, 256, 256)
    assert cleaned.shape == x.shape

    # thres=0 forces the full 3 cleaning passes; outputs must differ
    m3 = RealBasicVSRNet(mid_channels=8, num_propagation_blocks=1,
                         num_cleaning_blocks=1, dynamic_refine_thres=0)
    _, cleaned3 = m3.apply(p, x, return_lqs=True)
    assert not np.allclose(np.asarray(cleaned), np.asarray(cleaned3))


# ------------------------- discriminators + GAN step -------------------------


@pytest.mark.slow
def test_gan_restorer_train_step():
    from fcvsr_tpu.models.discriminators import \
        UNetDiscriminatorWithSpectralNorm
    from fcvsr_tpu.models.gan_restorer import GANRestorer
    from fcvsr_tpu.models.sisr import MSRResNet

    gen = MSRResNet(mid_channels=8, num_blocks=1, upscale_factor=4)
    disc = UNetDiscriminatorWithSpectralNorm(mid_channels=8)

    lq = jnp.asarray(RNG.uniform(0, 1, (1, 3, 8, 8)).astype(np.float32))
    gt = jnp.asarray(RNG.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32))

    gp = gen.init(jax.random.PRNGKey(0), lq)
    dp = disc.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))

    rest = GANRestorer(
        generator_apply=lambda p, x: gen.apply(p, x),
        disc_apply=lambda p, x: disc.apply(p, x),
        gan_type="vanilla", pixel_loss_weight=1.0, gan_loss_weight=5e-3)

    g_tx = optax.adam(1e-4)
    d_tx = optax.adam(1e-4)
    state = (gp, dp, g_tx.init(gp), d_tx.init(dp), jnp.int32(0))
    step = rest.make_train_step(g_tx, d_tx)
    state2, logs = step(state, lq, gt)
    assert np.isfinite(float(logs["loss_g"]))
    assert np.isfinite(float(logs["loss_d"]))
    # generator params changed
    a = jax.tree.leaves(state[0])[0]
    b = jax.tree.leaves(state2[0])[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_area_downsample_matches_torch():
    from fcvsr_tpu.models.gan_restorer import area_downsample

    x = _rand(2, 8, 12, 3)
    got = np.asarray(area_downsample(jnp.asarray(x), 4))
    ref = F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                        scale_factor=0.25, mode="area")
    np.testing.assert_allclose(got, np.transpose(ref.numpy(), (0, 2, 3, 1)),
                               atol=1e-6)


def test_registry_has_new_backbones():
    from fcvsr_tpu.models.registry import BACKBONES

    for name in ("DICNet", "LIIFEDSR", "LIIFRDN", "TTSR", "TTSRNet",
                 "GLEANStyleGANv2", "RealBasicVSRNet", "StyleGAN2Generator",
                 "StyleGAN2Discriminator", "ModifiedVGG",
                 "UNetDiscriminatorWithSpectralNorm", "FeedbackHourglass"):
        assert name in BACKBONES


def test_lightcnn_and_dic_losses():
    from fcvsr_tpu.models.discriminators import (LightCNN,
                                                 light_cnn_feature_loss)
    from fcvsr_tpu.models.gan_restorer import dic_losses

    m = LightCNN()
    x = jnp.asarray(RNG.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (1, 1)
    feats = m.apply(p, x, features_only=True)
    assert feats.shape == (1, 8, 8, 128)
    loss = light_cnn_feature_loss(m, p, x, x * 0.5)
    assert float(loss) > 0

    srs = [jnp.ones((1, 3, 16, 16)) * v for v in (0.4, 0.6)]
    hms = [jnp.ones((1, 5, 4, 4)) * v for v in (0.2, 0.3)]
    total, logs = dic_losses(srs, hms, jnp.ones((1, 3, 16, 16)) * 0.5,
                             jnp.ones((1, 5, 4, 4)) * 0.25)
    np.testing.assert_allclose(float(total), 0.1 + 0.1 + 0.05 + 0.05,
                               atol=1e-5)  # f32 |a-b| means
    assert "loss_pixel_v1" in logs and "loss_align_v0" in logs
