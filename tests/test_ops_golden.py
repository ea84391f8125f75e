"""Golden-parity tests: every op vs its torch / PIL reference implementation."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from heuristique_style_transfer_code_tpu import ops

RTOL, ATOL = 1e-4, 1e-4


def _np(x):
    return np.asarray(x)


@pytest.fixture
def rng():
    return np.random.RandomState(42)


class TestLinear:
    def test_matches_torch(self, rng):
        x = rng.randn(5, 16).astype(np.float32)
        lin = torch.nn.Linear(16, 8)
        params = {
            "kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy()),
        }
        want = lin(torch.from_numpy(x)).detach().numpy()
        got = _np(ops.linear(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestConv:
    @pytest.mark.parametrize("stride,padding", [(1, 0), (2, 1), (1, 1)])
    def test_conv2d(self, rng, stride, padding):
        x = rng.randn(2, 9, 11, 3).astype(np.float32)
        conv = torch.nn.Conv2d(3, 5, kernel_size=4, stride=stride, padding=padding)
        params = {
            # torch OIHW -> HWIO
            "kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(conv.bias.detach().numpy()),
        }
        want = conv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        got = _np(ops.conv2d(params, jnp.asarray(x), stride=stride, padding=padding))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=RTOL, atol=ATOL)

    def test_max_pool(self, rng):
        x = rng.randn(2, 10, 10, 4).astype(np.float32)
        want = F.max_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, stride=2, padding=1
        ).numpy()
        got = _np(ops.max_pool2d(jnp.asarray(x), 3, 2, 1))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("tie_mode", ["random", "relu", "quantized"])
    @pytest.mark.parametrize(
        "shape,cfg",
        [
            ((2, 14, 14, 8), (3, 2, 1)),  # the stem pool (overlapping windows)
            ((1, 13, 11, 4), (2, 2, 0)),  # non-overlapping
            ((2, 12, 12, 3), ((3, 2), (2, 1), (1, 0))),  # asymmetric
        ],
    )
    def test_max_pool_argmax_vjp(self, rng, shape, cfg, tie_mode):
        """max_pool2d_argmax: value bit-equal to max_pool2d; gradient equal
        to XLA's select-and-scatter — bit-equal for non-overlapping windows,
        and up to f32 summation grouping (<=4 overlapping-window terms, ~1
        ULP) otherwise — with identical first-max tie-breaking exercised by
        tie-heavy ReLU/quantised inputs; also matches torch's maxpool grad."""
        import jax

        k, s, p = cfg
        x = rng.randn(*shape).astype(np.float32)
        if tie_mode == "relu":
            x = np.maximum(x, 0.0)
        elif tie_mode == "quantized":
            x = np.round(x * 2) / 2
        xj = jnp.asarray(x)
        y_ref, vjp_ref = jax.vjp(lambda t: ops.max_pool2d(t, k, s, p), xj)
        y_new, vjp_new = jax.vjp(
            lambda t: ops.conv.max_pool2d_argmax(t, k, s, p), xj
        )
        assert np.array_equal(_np(y_ref), _np(y_new))
        g = rng.randn(*np.asarray(y_ref.shape)).astype(np.float32)
        gr = _np(vjp_ref((gj := jnp.asarray(g)))[0])
        gn = _np(vjp_new(gj)[0])
        kh, kw = (k, k) if isinstance(k, int) else k
        sh, sw = (s, s) if isinstance(s, int) else s
        if kh <= sh and kw <= sw:  # non-overlapping: single-term grads
            assert np.array_equal(gr, gn)
        else:
            np.testing.assert_allclose(gn, gr, rtol=0, atol=2e-6)
            assert np.array_equal(gr == 0.0, gn == 0.0)  # same tie-break
        # torch cross-check (same first-max semantics)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
        yt = F.max_pool2d(xt, kh if kh == kw else (kh, kw), stride=(sh, sw),
                          padding=(p if isinstance(p, int) else p[0],
                                   p if isinstance(p, int) else p[1]))
        yt.backward(torch.from_numpy(g.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            gn.transpose(0, 3, 1, 2), xt.grad.numpy(), rtol=0, atol=2e-6
        )

    @pytest.mark.parametrize("count_include_pad", [True, False])
    def test_avg_pool(self, rng, count_include_pad):
        x = rng.randn(2, 11, 9, 4).astype(np.float32)
        want = F.avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            3,
            stride=2,
            padding=1,
            count_include_pad=count_include_pad,
        ).numpy()
        got = _np(
            ops.avg_pool2d(jnp.asarray(x), 3, 2, 1, count_include_pad=count_include_pad)
        )
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=RTOL, atol=ATOL)


class TestNorm:
    def test_batch_norm_eval(self, rng):
        bn = torch.nn.BatchNorm2d(6)
        bn.weight.data.normal_()
        bn.bias.data.normal_()
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.eval()
        x = rng.randn(2, 5, 7, 6).astype(np.float32)
        want = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        params = {
            "scale": jnp.asarray(bn.weight.detach().numpy()),
            "bias": jnp.asarray(bn.bias.detach().numpy()),
            "mean": jnp.asarray(bn.running_mean.numpy()),
            "var": jnp.asarray(bn.running_var.numpy()),
        }
        got = _np(ops.batch_norm(params, jnp.asarray(x), train=False))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=RTOL, atol=ATOL)

    def test_batch_norm_train_updates_running_stats(self, rng):
        bn = torch.nn.BatchNorm2d(4)
        bn.train()
        x = rng.randn(3, 5, 5, 4).astype(np.float32)
        want = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        params = {
            "scale": jnp.asarray(bn.weight.detach().numpy()),
            "bias": jnp.asarray(bn.bias.detach().numpy()),
            "mean": jnp.zeros(4),
            "var": jnp.ones(4),
        }
        got, new_params = ops.batch_norm(params, jnp.asarray(x), train=True)
        np.testing.assert_allclose(
            _np(got).transpose(0, 3, 1, 2), want, rtol=RTOL, atol=ATOL
        )
        np.testing.assert_allclose(
            _np(new_params["mean"]), bn.running_mean.numpy(), rtol=RTOL, atol=ATOL
        )
        np.testing.assert_allclose(
            _np(new_params["var"]), bn.running_var.numpy(), rtol=RTOL, atol=ATOL
        )

    def test_instance_norm(self, rng):
        x = rng.randn(2, 7, 5, 6).astype(np.float32)
        want = F.instance_norm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = _np(ops.instance_norm(jnp.asarray(x)))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=RTOL, atol=ATOL)

    def test_layer_norm_tail(self, rng):
        # reference: F.layer_norm(x, x.shape[1:]) on NCHW tensors
        x = rng.randn(2, 6, 5, 7).astype(np.float32)  # NCHW here
        want = F.layer_norm(torch.from_numpy(x), x.shape[1:]).numpy()
        got = _np(ops.layer_norm_tail(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestAdaptivePool:
    @pytest.mark.parametrize("in_hw,out", [((14, 14), 7), ((10, 13), 4), ((7, 7), 7), ((5, 9), 3)])
    def test_matches_torch(self, rng, in_hw, out):
        x = rng.randn(2, 6, *in_hw).astype(np.float32)  # NCHW
        want = F.adaptive_avg_pool2d(torch.from_numpy(x), out).numpy()
        got = _np(ops.adaptive_avg_pool2d(jnp.asarray(x), out))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestAttention:
    @pytest.mark.parametrize("embed,heads,L,N", [(16, 1, 4, 3), (64, 8, 7, 2)])
    def test_matches_torch_mha(self, rng, embed, heads, L, N):
        mha = torch.nn.MultiheadAttention(embed, heads)
        mha.eval()
        x = rng.randn(L, N, embed).astype(np.float32)
        want, _ = mha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))
        params = {
            "in_proj_weight": jnp.asarray(mha.in_proj_weight.detach().numpy()),
            "in_proj_bias": jnp.asarray(mha.in_proj_bias.detach().numpy()),
            "out_proj_weight": jnp.asarray(mha.out_proj.weight.detach().numpy()),
            "out_proj_bias": jnp.asarray(mha.out_proj.bias.detach().numpy()),
        }
        got = _np(ops.multihead_attention(params, jnp.asarray(x), num_heads=heads))
        np.testing.assert_allclose(got, want.detach().numpy(), rtol=1e-3, atol=1e-4)


    def test_init_bound_matches_torch_xavier_on_packed_qkv(self):
        """torch xavier_uniform_ on the PACKED (3E, E) in_proj tensor uses
        fan_in+fan_out = E+3E, so the bound is sqrt(6/(4E)) — NOT the
        sqrt(6/(2E)) of a square tensor (review finding: init was sqrt(2)x
        too wide vs torch.nn.MultiheadAttention)."""
        E = 64
        torch.manual_seed(0)
        want_bound = float(torch.nn.MultiheadAttention(E, 8).in_proj_weight.abs().max())
        params = ops.multihead_attention_init(jax.random.PRNGKey(0), E, 8)
        got = np.abs(_np(params["in_proj_weight"]))
        assert got.max() <= want_bound * 1.001, (got.max(), want_bound)
        # and actually fills the range (not accidentally much narrower)
        assert got.max() > want_bound * 0.95


class TestGram:
    def test_gram_nhwc_matches_reference_formula(self, rng):
        x = rng.randn(2, 5, 7, 16).astype(np.float32)  # NHWC
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
        b, ch, h, w = t.shape
        f = t.view(b, ch, h * w)
        want = torch.bmm(f, f.transpose(1, 2)).div(h * w).numpy()
        got = _np(ops.gram_matrix_nhwc(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_pooled_gram_identity(self, rng):
        """(P f)(P f)^T must equal adaptive_pool(f f^T) exactly."""
        x = rng.randn(2, 5, 7, 32).astype(np.float32)
        full = ops.gram_matrix_nhwc(jnp.asarray(x))
        want = _np(ops.adaptive_avg_pool2d(full, 7))
        got = _np(ops.pooled_gram_nhwc(jnp.asarray(x), 7))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_gram_ncl_patchgan_denominator(self, rng):
        f = rng.randn(3, 8, 16).astype(np.float32)
        tf_ = torch.from_numpy(f)
        want = (torch.bmm(tf_, tf_.transpose(1, 2)) / (16 + 1e-6)).numpy()
        got = _np(ops.gram_matrix_ncl(jnp.asarray(f), denom=16 + 1e-6))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestResize:
    @pytest.mark.parametrize("in_hw,shorter", [((48, 64), 32), ((100, 77), 56), ((64, 64), 48)])
    def test_matches_pil_bilinear(self, rng, in_hw, shorter):
        from PIL import Image

        h, w = in_hw
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        from heuristique_style_transfer_code_tpu.ops.resize import resize_target

        th, tw = resize_target(h, w, shorter)
        want = (
            np.asarray(
                Image.fromarray(img).resize((tw, th), Image.BILINEAR)
            ).astype(np.float32)
            / 255.0
        )
        got = _np(ops.resize_shorter_side(jnp.asarray(img).astype(jnp.float32) / 255.0, shorter))
        # PIL quantises to uint8 between H and V passes; allow 1/255 slack
        np.testing.assert_allclose(got, want, atol=2.5 / 255.0)

    def test_resize_target_truncates_like_torchvision(self):
        """torchvision Resize(int) computes the long side as
        int(size * long / short) — TRUNCATION (F_pil.resize and
        _compute_resized_output_size agree). round() deviated whenever the
        fractional part was >= .5 (review finding)."""
        from heuristique_style_transfer_code_tpu.core.geometry import resize_target

        # 256 * 499 / 333 = 383.51...: torchvision says 383
        assert resize_target(333, 499, 256) == (256, 383)
        # transposed orientation
        assert resize_target(499, 333, 256) == (383, 256)
        # exact ratio unaffected
        assert resize_target(48, 64, 32) == (32, 42)  # 42.67 truncates
        assert resize_target(100, 100, 56) == (56, 56)

    def test_upscale_matches_pil(self, rng):
        from PIL import Image

        img = rng.randint(0, 256, (20, 30, 3), dtype=np.uint8)
        want = np.asarray(Image.fromarray(img).resize((60, 40), Image.BILINEAR)).astype(
            np.float32
        ) / 255.0
        got = _np(
            ops.resize_image(jnp.asarray(img).astype(jnp.float32) / 255.0, 40, 60)
        )
        np.testing.assert_allclose(got, want, atol=2.5 / 255.0)

    def test_center_crop_matches_torchvision_rule(self, rng):
        img = rng.randn(57, 91, 3).astype(np.float32)
        got = _np(ops.center_crop(jnp.asarray(img), 32))
        top = int(round((57 - 32) / 2.0))
        left = int(round((91 - 32) / 2.0))
        np.testing.assert_array_equal(got, img[top : top + 32, left : left + 32])

    def test_normalize(self, rng):
        img = rng.rand(4, 4, 3).astype(np.float32)
        got = _np(ops.normalize_imagenet(jnp.asarray(img)))
        want = (img - ops.IMAGENET_MEAN) / ops.IMAGENET_STD
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)
