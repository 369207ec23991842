"""Golden tests: SAC/IAC vs an independent torch unfold formulation."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fcvsr_tpu.ops import iac, sac
from tests.test_ops_warp import torch_flow_warp


def torch_sac(feat_nchw, k1_nchw, k2_nchw, ksize=3, kernel1_both=True):
    """Reference SAC semantics via unfold (CVSR_freq.py:1253-1276)."""
    feat = torch.from_numpy(feat_nchw)
    k1 = torch.from_numpy(k1_nchw)
    k2 = torch.from_numpy(k2_nchw)
    n, c, h, w = feat.shape
    pad = (ksize - 1) // 2

    t = F.pad(feat, (0, 0, pad, pad), mode="replicate")
    t = t.unfold(2, ksize, 1).permute(0, 2, 3, 1, 4).reshape(n, h, w, c, ksize)
    kv = k1.permute(0, 2, 3, 1).reshape(n, h, w, c, ksize)
    t = (t * kv).sum(-1).permute(0, 3, 1, 2)

    t = F.pad(t, (pad, pad, 0, 0), mode="replicate")
    t = t.unfold(3, ksize, 1).permute(0, 2, 3, 1, 4).reshape(n, h, w, c, ksize)
    kh = (k1 if kernel1_both else k2).permute(0, 2, 3, 1).reshape(n, h, w, c, ksize)
    t = (t * kh).sum(-1).permute(0, 3, 1, 2)
    return t.numpy()


def test_sac_matches_torch():
    rng = np.random.default_rng(0)
    b, h, w, c, k = 2, 9, 11, 8, 3
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    k1 = rng.standard_normal((b, h, w, c * k), dtype=np.float32)
    k2 = rng.standard_normal((b, h, w, c * k), dtype=np.float32)
    for bug in (True, False):
        got = np.asarray(sac(jnp.asarray(x), jnp.asarray(k1), jnp.asarray(k2),
                             k, kernel1_both=bug))
        ref = torch_sac(
            np.transpose(x, (0, 3, 1, 2)),
            np.transpose(k1, (0, 3, 1, 2)),
            np.transpose(k2, (0, 3, 1, 2)),
            k, kernel1_both=bug,
        )
        np.testing.assert_allclose(got, np.transpose(ref, (0, 2, 3, 1)),
                                   atol=1e-5, rtol=1e-5)


def test_iac_matches_torch():
    """Full IAC loop vs torch composition (CVSR_freq.py:1230-1250)."""
    rng = np.random.default_rng(1)
    b, h, w, c, k, ac = 1, 8, 10, 4, 3, 3
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    pred_k = rng.standard_normal((b, h, w, ac * c * k * 2), dtype=np.float32)
    offs = (rng.standard_normal((ac, b, h, w, 2)) * 1.5).astype(np.float32)

    got = np.asarray(iac(jnp.asarray(x), jnp.asarray(pred_k), jnp.asarray(offs),
                         ac, c, k))

    feat_in = np.transpose(x, (0, 3, 1, 2))
    pk = np.transpose(pred_k, (0, 3, 1, 2))
    feat = feat_in
    chunk = c * k * 2
    for i in range(ac):
        ks = pk[:, i * chunk : (i + 1) * chunk]
        k1, k2 = ks[:, : c * k], ks[:, c * k :]
        warped = torch_flow_warp(feat, offs[i])
        feat = torch_sac(warped, k1, k2, k) + feat_in
        feat = F.leaky_relu(torch.from_numpy(feat), 0.1).numpy()
    np.testing.assert_allclose(got, np.transpose(feat, (0, 2, 3, 1)),
                               atol=2e-4, rtol=2e-4)
