import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.layers import (
    MLP,
    TorchBatchNorm,
    TorchConv,
    TorchConvTranspose,
    TorchGroupNorm,
    TorchInstanceNorm,
    TorchLayerNorm,
    TorchLinear,
    avg_pool2d,
    max_pool2d,
)

RNG = np.random.default_rng(42)


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def conv_w_to_hwio(w_oihw):
    return np.transpose(w_oihw, (2, 3, 1, 0))


@pytest.mark.parametrize(
    "cin,cout,k,s,p,d,g,mode",
    [
        (3, 8, 3, 1, 1, 1, 1, "zeros"),
        (4, 6, 3, 2, 1, 1, 1, "zeros"),
        (4, 6, 7, 2, 3, 1, 1, "zeros"),
        (8, 8, 1, 1, 0, 1, 1, "zeros"),
        (6, 6, 3, 1, 1, 1, 1, "reflect"),
        (6, 6, 4, 2, 1, 1, 1, "reflect"),
        (4, 8, 3, 1, 2, 2, 1, "zeros"),
    ],
)
def test_conv_matches_torch(cin, cout, k, s, p, d, g, mode):
    x = RNG.normal(size=(2, cin, 17, 19)).astype(np.float32)
    tconv = tnn.Conv2d(cin, cout, k, stride=s, padding=p, dilation=d, groups=g,
                       padding_mode="zeros" if mode == "zeros" else "reflect")
    want = tconv(torch.from_numpy(x)).detach().numpy()

    m = TorchConv(cout, kernel_size=k, stride=s, padding=p, dilation=d,
                  groups=g, padding_mode=mode)
    params = {
        "kernel": jnp.asarray(conv_w_to_hwio(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }
    got = m.apply({"params": params}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(nhwc(want), np.asarray(got), atol=2e-4)


@pytest.mark.parametrize("cin,cout,k,s,p", [(8, 4, 4, 2, 1), (6, 6, 3, 1, 1),
                                            (5, 7, 2, 2, 0)])
def test_conv_transpose_matches_torch(cin, cout, k, s, p):
    x = RNG.normal(size=(2, cin, 9, 11)).astype(np.float32)
    tconv = tnn.ConvTranspose2d(cin, cout, k, stride=s, padding=p)
    want = tconv(torch.from_numpy(x)).detach().numpy()

    # torch weight (I, O, kH, kW) -> flip spatial -> HWIO
    w = tconv.weight.detach().numpy()[:, :, ::-1, ::-1]
    kernel = np.transpose(w, (2, 3, 0, 1)).copy()
    m = TorchConvTranspose(cout, kernel_size=k, stride=s, padding=p)
    params = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(tconv.bias.detach().numpy())}
    got = m.apply({"params": params}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(nhwc(want), np.asarray(got), atol=2e-4)


def test_batchnorm_eval_and_train():
    c = 6
    x = RNG.normal(size=(4, c, 8, 8)).astype(np.float32) * 2 + 1
    tbn = tnn.BatchNorm2d(c)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(RNG.normal(size=c).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(RNG.normal(size=c).astype(np.float32)))
        tbn.running_mean.copy_(torch.from_numpy(RNG.normal(size=c).astype(np.float32)))
        tbn.running_var.copy_(torch.from_numpy(np.abs(RNG.normal(size=c)).astype(np.float32) + 0.5))

    # .copy(): jax CPU zero-copies numpy buffers, and torch updates running
    # stats in place during the train-mode forward below.
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy().copy()),
                   "bias": jnp.asarray(tbn.bias.detach().numpy().copy())},
        "batch_stats": {"mean": jnp.asarray(tbn.running_mean.numpy().copy()),
                        "var": jnp.asarray(tbn.running_var.numpy().copy())},
    }
    m = TorchBatchNorm()

    # eval mode
    tbn.eval()
    want = tbn(torch.from_numpy(x)).detach().numpy()
    got = m.apply(variables, jnp.asarray(nhwc(x)), use_running_average=True)
    np.testing.assert_allclose(nhwc(want), np.asarray(got), atol=1e-4)

    # train mode: outputs + updated running stats
    tbn.train()
    want = tbn(torch.from_numpy(x)).detach().numpy()
    got, mut = m.apply(variables, jnp.asarray(nhwc(x)),
                       use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_allclose(nhwc(want), np.asarray(got), atol=1e-4)
    np.testing.assert_allclose(tbn.running_mean.numpy(),
                               np.asarray(mut["batch_stats"]["mean"]), atol=1e-5)
    np.testing.assert_allclose(tbn.running_var.numpy(),
                               np.asarray(mut["batch_stats"]["var"]), atol=1e-5)


def test_batchnorm1d_sequences():
    # LTAE MLP uses BatchNorm1d on (N, C)
    c = 10
    x = RNG.normal(size=(32, c)).astype(np.float32)
    tbn = tnn.BatchNorm1d(c)
    tbn.eval()
    want = tbn(torch.from_numpy(x)).detach().numpy()
    m = TorchBatchNorm()
    variables = {
        "params": {"scale": jnp.ones(c), "bias": jnp.zeros(c)},
        "batch_stats": {"mean": jnp.zeros(c), "var": jnp.ones(c)},
    }
    got = m.apply(variables, jnp.asarray(x), use_running_average=True)
    np.testing.assert_allclose(want, np.asarray(got), atol=1e-5)


@pytest.mark.parametrize("groups,c", [(4, 16), (16, 64), (1, 8)])
def test_groupnorm_matches_torch(groups, c):
    x = RNG.normal(size=(3, c, 7, 9)).astype(np.float32)
    tgn = tnn.GroupNorm(groups, c)
    with torch.no_grad():
        tgn.weight.copy_(torch.from_numpy(RNG.normal(size=c).astype(np.float32)))
        tgn.bias.copy_(torch.from_numpy(RNG.normal(size=c).astype(np.float32)))
    want = tgn(torch.from_numpy(x)).detach().numpy()
    m = TorchGroupNorm(num_groups=groups)
    params = {"scale": jnp.asarray(tgn.weight.detach().numpy()),
              "bias": jnp.asarray(tgn.bias.detach().numpy())}
    got = m.apply({"params": params}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(nhwc(want), np.asarray(got), atol=1e-4)


def test_groupnorm_1d_sequences():
    # LTAE in_norm: GroupNorm(n_head, C) applied to (N, C, T)
    c, t, heads = 16, 11, 4
    x = RNG.normal(size=(5, c, t)).astype(np.float32)
    tgn = tnn.GroupNorm(heads, c)
    want = tgn(torch.from_numpy(x)).detach().numpy()  # (N, C, T)
    m = TorchGroupNorm(num_groups=heads)
    params = {"scale": jnp.ones(c), "bias": jnp.zeros(c)}
    # our layout: (N, T, C)
    got = m.apply({"params": params}, jnp.asarray(np.transpose(x, (0, 2, 1))))
    np.testing.assert_allclose(np.transpose(want, (0, 2, 1)), np.asarray(got), atol=1e-4)


def test_layernorm_matches_torch():
    c = 24
    x = RNG.normal(size=(2, 13, c)).astype(np.float32)
    tln = tnn.LayerNorm(c)
    with torch.no_grad():
        tln.weight.copy_(torch.from_numpy(RNG.normal(size=c).astype(np.float32)))
    want = tln(torch.from_numpy(x)).detach().numpy()
    m = TorchLayerNorm()
    params = {"scale": jnp.asarray(tln.weight.detach().numpy()),
              "bias": jnp.asarray(tln.bias.detach().numpy())}
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(want, np.asarray(got), atol=1e-4)


def test_linear_and_mlp():
    x = RNG.normal(size=(7, 12)).astype(np.float32)
    tl = tnn.Linear(12, 5)
    want = tl(torch.from_numpy(x)).detach().numpy()
    m = TorchLinear(5)
    params = {"kernel": jnp.asarray(tl.weight.detach().numpy().T),
              "bias": jnp.asarray(tl.bias.detach().numpy())}
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(want, np.asarray(got), atol=1e-5)

    # MLP with exact (non-tanh) GELU, as timm uses
    tmlp = tnn.Sequential(tnn.Linear(12, 24), tnn.GELU(), tnn.Linear(24, 12))
    want = tmlp(torch.from_numpy(x)).detach().numpy()
    m = MLP(hidden=24, out=12)
    params = {
        "fc1": {"kernel": jnp.asarray(tmlp[0].weight.detach().numpy().T),
                "bias": jnp.asarray(tmlp[0].bias.detach().numpy())},
        "fc2": {"kernel": jnp.asarray(tmlp[2].weight.detach().numpy().T),
                "bias": jnp.asarray(tmlp[2].bias.detach().numpy())},
    }
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(want, np.asarray(got), atol=1e-5)


def test_pools_match_torch():
    x = RNG.normal(size=(2, 3, 15, 17)).astype(np.float32)
    want = tnn.MaxPool2d(3, 2, 1)(torch.from_numpy(x)).numpy()
    got = max_pool2d(jnp.asarray(nhwc(x)), 3, 2, 1)
    np.testing.assert_allclose(nhwc(want), np.asarray(got), atol=1e-6)

    want = tnn.AvgPool2d(2)(torch.from_numpy(x)).numpy()
    got = avg_pool2d(jnp.asarray(nhwc(x)), 2)
    np.testing.assert_allclose(nhwc(want), np.asarray(got), atol=1e-6)


def test_instance_norm():
    x = RNG.normal(size=(2, 4, 6, 6)).astype(np.float32)
    want = tnn.InstanceNorm2d(4)(torch.from_numpy(x)).numpy()
    got = TorchInstanceNorm().apply({}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(nhwc(want), np.asarray(got), atol=1e-4)


def test_patch_conv_fast_path_matches_torch():
    """Non-overlapping small-C_in conv (the swin patch embed) takes the
    space-to-depth + matmul lowering; must match torch Conv2d exactly,
    and odd sizes must fall back to the conv lowering (VALID crop)."""
    x = RNG.normal(size=(2, 3, 16, 16)).astype(np.float32)
    tconv = tnn.Conv2d(3, 8, 4, stride=4)
    want = tconv(torch.from_numpy(x)).detach().numpy()
    m = TorchConv(8, 4, 4, 0)
    params = {
        "kernel": jnp.asarray(conv_w_to_hwio(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }
    got = m.apply({"params": params}, jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(nhwc(want), np.asarray(got), atol=1e-5)

    # indivisible spatial size: VALID semantics (torch drops the remainder)
    x2 = RNG.normal(size=(1, 3, 15, 15)).astype(np.float32)
    want2 = tconv(torch.from_numpy(x2)).detach().numpy()
    got2 = m.apply({"params": params}, jnp.asarray(nhwc(x2)))
    np.testing.assert_allclose(nhwc(want2), np.asarray(got2), atol=1e-5)
