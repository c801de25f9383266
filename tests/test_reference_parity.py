"""Golden forward parity vs the ACTUAL reference implementation.

Builds the reference torch SUNet from /root/reference (read-only, imported
at runtime with stubbed timm/thop — nothing is copied), converts its random
weights through tools/import_torch_checkpoint.torch_to_params, and compares
full forward passes. This is the strongest parity evidence available:
identical logits (to fp32 conv/matmul tolerance) on the same weights.

Skipped automatically when /root/reference or torch is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "model")),
    reason="reference repo not mounted",
)


def _import_reference_sunet():
    """Import the reference model module with stub timm/thop (not installed).
    Stubs replicate only the trivial helpers the reference imports."""
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        def trunc_normal_(t, std=1.0, mean=0.0, a=-2.0, b=2.0):
            with torch.no_grad():
                t.normal_(mean, std).clamp_(a, b)
            return t

        class DropPath(torch.nn.Module):
            def __init__(self, p=0.0):
                super().__init__()
                self.p = p

            def forward(self, x):  # eval-mode identity, like timm
                return x

        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = trunc_normal_
        layers.DropPath = DropPath
        timm.models = models
        models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    if "thop" not in sys.modules:
        thop = types.ModuleType("thop")
        thop.profile = lambda *a, **k: (0, 0)
        sys.modules["thop"] = thop
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from model.SUNet_detail import SUNet as RefSUNet  # noqa: E402

    return RefSUNet


TINY = dict(img_size=64, patch_size=4, in_chans=3, out_chans=1, embed_dim=16,
            depths=[2, 2, 2, 2], num_heads=[2, 2, 2, 2], window_size=4,
            mlp_ratio=4.0, qkv_bias=True, qk_scale=8, drop_rate=0.0,
            attn_drop_rate=0.0, drop_path_rate=0.0)


@pytest.fixture(scope="module")
def ref_and_ours():
    import jax

    from sunet_tf_tpu.config import Config, SwinUNetConfig
    from sunet_tf_tpu.models.sunet import build_model
    from tools.import_torch_checkpoint import torch_to_params

    RefSUNet = _import_reference_sunet()
    torch.manual_seed(3)
    ref = RefSUNet(**TINY).eval()

    cfg = Config(swinunet=SwinUNetConfig(
        img_size=64, patch_size=4, win_size=4, emb_dim=16,
        depth_en=(2, 2, 2, 2), head_num=(2, 2, 2, 2), qk_scale=8.0,
        drop_path_rate=0.0))
    ours = build_model(cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32")))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_to_params(sd, ours)

    from flax import nnx

    graphdef, _ = nnx.split(ours, nnx.Param)
    fwd = jax.jit(lambda p, x: nnx.merge(graphdef, p)(x))
    return ref, fwd, params


def test_param_count_matches(ref_and_ours):
    from sunet_tf_tpu.models.sunet import param_count
    from flax import nnx

    ref, fwd, params = ref_and_ours
    n_ref = sum(p.numel() for p in ref.parameters())
    import jax

    n_ours = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert n_ours == n_ref


def test_forward_parity_full_model(ref_and_ours):
    import jax.numpy as jnp

    ref, fwd, params = ref_and_ours
    rng = np.random.default_rng(0)
    x = rng.random((2, 64, 64, 3), np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    ours_out = np.asarray(fwd(params, jnp.asarray(x)))
    assert ours_out.shape == ref_out.shape
    np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=2e-4)


def test_export_round_trip(ref_and_ours):
    """import(torch ckpt) -> export -> reference loads it and agrees."""
    ref, fwd, params = ref_and_ours
    from flax import nnx

    from sunet_tf_tpu.config import Config, SwinUNetConfig
    from sunet_tf_tpu.models.sunet import build_model
    from tools.export_torch_checkpoint import params_to_state_dict

    cfg = Config(swinunet=SwinUNetConfig(
        img_size=64, patch_size=4, win_size=4, emb_dim=16,
        depth_en=(2, 2, 2, 2), head_num=(2, 2, 2, 2), qk_scale=8.0,
        drop_path_rate=0.0))
    ours = build_model(cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32")))
    gd, _ = nnx.split(ours, nnx.Param)
    ours = nnx.merge(gd, params)
    sd = {k.removeprefix("swin_unet."): torch.from_numpy(np.ascontiguousarray(v))
          for k, v in params_to_state_dict(ours).items()}
    missing, unexpected = ref.load_state_dict(sd, strict=True), None
    x = np.random.default_rng(5).random((1, 64, 64, 3), np.float32)
    import jax.numpy as jnp

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    ours_out = np.asarray(fwd(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=2e-4)


def test_forward_parity_grayscale_input(ref_and_ours):
    """Reference wrapper repeats 1ch->3ch (model/SUNet.py:27-28); we do the
    same inside SUNet."""
    import jax.numpy as jnp

    ref, fwd, params = ref_and_ours
    rng = np.random.default_rng(1)
    g = rng.random((1, 64, 64, 1), np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.repeat(g, 3, -1)).permute(0, 3, 1, 2))
        ref_out = ref_out.permute(0, 2, 3, 1).numpy()
    ours_out = np.asarray(fwd(params, jnp.asarray(g)))
    np.testing.assert_allclose(ours_out, ref_out, rtol=1e-3, atol=2e-4)
