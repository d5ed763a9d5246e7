"""Golden parity: lrce_tpu Swin3D vs the reference torch implementation.

The reference implementation at /root/reference (read-only) is imported as a
*test oracle* — it is never copied into the framework. Its timm/mmcv imports
are stubbed since those packages are unavailable (only DropPath [identity in
eval], trunc_normal_, and loggers are used)."""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lrce_tpu.models import swin3d as S
from lrce_tpu.utils import torch_io as tio

TOL = dict(rtol=3e-4, atol=1e-4)


def _stub_modules():
    if "timm" in sys.modules and hasattr(sys.modules.get("timm.models.layers", None), "DropPath"):
        return

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-mode identity
            return x

    import importlib.machinery

    def make_mod(name):
        mod = types.ModuleType(name)
        # a real ModuleSpec so importlib.util.find_spec on the stub works
        # (transformers probes optional deps that way)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
        return mod

    make_mod("timm")
    make_mod("timm.models")
    layers_mod = make_mod("timm.models.layers")
    layers_mod.DropPath = DropPath
    layers_mod.trunc_normal_ = torch.nn.init.trunc_normal_

    make_mod("mmcv")
    mmcv_utils = make_mod("mmcv.utils")
    mmcv_utils.get_logger = lambda *a, **k: __import__("logging").getLogger("x")
    mmcv_runner = make_mod("mmcv.runner")
    mmcv_runner.load_checkpoint = lambda *a, **k: None


def _load_reference_swin():
    _stub_modules()
    sys.path.insert(0, "/root/reference/lrce/feature_extractor")
    try:
        import video_swin_ori  # noqa: F401  (reference oracle, read-only)
    finally:
        sys.path.pop(0)
    return sys.modules["video_swin_ori"]


def _run_pair(cfg: S.SwinConfig, x_np: np.ndarray):
    oracle_mod = _load_reference_swin()
    torch.manual_seed(0)
    model = oracle_mod.SwinTransformer3D(
        pretrained=None, pretrained2d=False,
        patch_size=cfg.patch_size, embed_dim=cfg.embed_dim,
        depths=list(cfg.depths), num_heads=list(cfg.num_heads),
        window_size=cfg.window_size, drop_path_rate=cfg.drop_path_rate,
        patch_norm=cfg.patch_norm)
    model.eval()  # note: the oracle's train() override returns None

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()
          if "relative_position_index" not in k}
    params = tio.convert_swin(sd, depths=cfg.depths, patch_norm=cfg.patch_norm)

    with torch.no_grad():
        ref = model(torch.from_numpy(x_np)).numpy()  # (B, C, D, H, W)

    # ours is channels-last
    x_jax = jnp.asarray(np.transpose(x_np, (0, 2, 3, 4, 1)))
    got = S.swin_forward(params, x_jax, cfg)  # (B, D, H', W', C)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, ref, **TOL)
    return got.shape


def test_swin_small_full_pipeline():
    """2-stage small config exercising clamped windows, shifted masks, and
    patch merging."""
    cfg = S.SwinConfig(patch_size=(2, 2, 2), embed_dim=16, depths=(2, 2),
                       num_heads=(2, 4), window_size=(2, 3, 3),
                       drop_path_rate=0.1, patch_norm=True)
    x = np.random.RandomState(0).randn(2, 3, 5, 24, 24).astype(np.float32)
    shape = _run_pair(cfg, x)
    assert shape == (2, 32, 3, 6, 6)


def test_swin_window877_geometry():
    """Swin-B window geometry (8,7,7) at reduced width: D clamps to 3,
    H/W shifts active, odd spatial dims force pad paths."""
    cfg = S.SwinConfig(patch_size=(2, 4, 4), embed_dim=8, depths=(2, 2),
                       num_heads=(2, 2), window_size=(8, 7, 7),
                       drop_path_rate=0.0, patch_norm=True)
    x = np.random.RandomState(1).randn(1, 3, 5, 72, 72).astype(np.float32)
    shape = _run_pair(cfg, x)
    assert shape == (1, 16, 3, 9, 9)


@pytest.mark.slow
def test_swin_base_live_path_shapes():
    """Swin-B on the live-path input (B,3,5,224,224) -> (B,1024,3,7,7)
    (reference lrce/feature_extractor/video.py:28-43 shape contract)."""
    cfg = S.SWIN_BASE
    params = S.swin_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 5, 224, 224, 3))
    out = S.swin_forward(params, x, cfg)
    assert out.shape == (1, 3, 7, 7, 1024)
