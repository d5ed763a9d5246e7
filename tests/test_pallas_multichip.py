"""The production composition: Pallas kernels under a >1-device mesh.

Round-3 verdict's top gap — every multi-device artifact ran the XLA path
(CPU dryrun disables Pallas) and every Pallas execution was single-chip,
so nothing proved the fused Swin tower survives a real v5e-8 data-parallel
mesh. These tests close that from two directions:

1. EXECUTION: the real kernel code runs (Pallas interpret mode) under an
   8-virtual-device mesh via jax.shard_map, and its outputs/gradients match
   the unsharded single-device path (tests the shard_map wrapper, the
   per-shard grid, the boundary weight-grad psums).

2. LOWERING: the FULL flagship-geometry train step (fwd+loss+bwd+AdamW,
   bf16, real Mosaic kernels — not interpret) is AOT-exported for an
   8-device TPU topology and the StableHLO is checked: every
   `tpu_custom_call` (Mosaic) receives PER-SHARD activations (leading dim =
   clips/8) and the module contains no all_gather — i.e. GSPMD never
   rematerializes the batch to feed a kernel.

Reference capability being matched: 4-GPU DDP training of the full model
(reference train.py:137-138, lrce/agent/agent_base.py:75-76).
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import AbstractMesh, Mesh, NamedSharding, PartitionSpec as P

from lrce_tpu.models import swin3d as S
from lrce_tpu.parallel.swin_shard import swin_forward_sharded

# tiny but window-aligned geometry: patch (2,4,4) on (4, 24, 24) frames ->
# (D,H,W) = (2,6,6), window (2,3,3) divides exactly (the Pallas kernels
# never pad)
TINY = S.SwinConfig(patch_size=(2, 4, 4), embed_dim=16, depths=(2,),
                    num_heads=(2,), window_size=(2, 3, 3),
                    drop_path_rate=0.0, patch_norm=True)


def _mesh3():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]).reshape(2, 2, 2),
                ("data", "fsdp", "model"))


def _tiny_inputs():
    params = S.swin_init(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 24, 24, 3),
                          jnp.float32)
    return params, x


def _tree_close(got, want, tol):
    def chk(path, a, b):
        err = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(b))) + 1.0
        assert err <= tol * scale, (
            f"{jax.tree_util.keystr(path)}: |err|={err:.3e} vs scale {scale:.3e}")
    jax.tree_util.tree_map_with_path(chk, got, want)


@pytest.mark.parametrize("pallas", [True, False],
                         ids=["interpret-pallas", "xla-path"])
def test_swin_sharded_matches_unsharded(pallas):
    """shard_map over the batch axes of a 3-axis (data x fsdp x model) mesh
    reproduces the single-device forward AND parameter gradients — with the
    real kernels executing per shard (interpret mode) and on the XLA path."""
    cfg = TINY._replace(pallas_interpret=pallas)
    mesh = _mesh3()
    params, x = _tiny_inputs()
    if pallas:
        # make sure the tiny geometry actually selects the fused kernel
        shape = jax.eval_shape(lambda p, v: S.patch_embed(
            p["patch_embed"], v, cfg), params, x).shape
        assert S._pallas_supported(shape, (2, 3, 3), interpret=True) == "full"

    y_ref = jax.jit(lambda p, v: S.swin_forward(p, v, TINY))(params, x)
    g_ref = jax.jit(jax.grad(
        lambda p, v: jnp.sum(S.swin_forward(p, v, TINY) ** 2)))(params, x)

    xs = jax.device_put(
        x, NamedSharding(mesh, P(("data", "fsdp"), None, None, None, None)))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    y = jax.jit(
        lambda p, v: swin_forward_sharded(p, v, cfg, mesh=mesh))(ps, xs)
    assert np.asarray(jnp.max(jnp.abs(y - y_ref))) < 2e-5

    g = jax.jit(jax.grad(lambda p, v: jnp.sum(
        swin_forward_sharded(p, v, cfg, mesh=mesh) ** 2)))(ps, xs)
    _tree_close(g, g_ref, 5e-5)


def test_swin_sharded_training_randomness_is_per_shard():
    """Active drop_path under the sharded tower: per-shard rng folding makes
    shards draw independently; the run must stay finite and (with rate->1
    impossible) differ from the deterministic output."""
    cfg = TINY._replace(pallas_interpret=True, drop_path_rate=0.5)
    mesh = _mesh3()
    params, x = _tiny_inputs()
    xs = jax.device_put(
        x, NamedSharding(mesh, P(("data", "fsdp"), None, None, None, None)))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    y = jax.jit(lambda p, v: swin_forward_sharded(
        p, v, cfg, mesh=mesh, deterministic=False,
        rng=jax.random.PRNGKey(7)))(ps, xs)
    assert bool(jnp.all(jnp.isfinite(y)))
    y_det = jax.jit(lambda p, v: swin_forward_sharded(
        p, v, cfg, mesh=mesh))(ps, xs)
    assert float(jnp.max(jnp.abs(y - y_det))) > 0.0


def test_swin_sharded_falls_back_on_indivisible_batch():
    """A batch that does not divide the batch axes must not crash: the
    wrapper degrades to the plain (GSPMD) path."""
    cfg = TINY._replace(pallas_interpret=True)
    mesh = _mesh3()
    params, _ = _tiny_inputs()
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 4, 24, 24, 3))
    y = swin_forward_sharded(params, x, cfg, mesh=mesh)
    y_ref = S.swin_forward(params, x, cfg._replace(pallas_interpret=False))
    assert np.asarray(jnp.max(jnp.abs(y - y_ref))) < 2e-5


# ---------------------------------------------------------------------------
# AOT lowering proof at flagship geometry
# ---------------------------------------------------------------------------

def test_aot_export_8dev_train_step_shards_pallas_kernels():
    """Export the full train step (bf16, REAL Mosaic kernels, AdamW) for an
    8-device TPU data mesh and assert from the StableHLO that every Mosaic
    custom call consumes PER-SHARD activations with no all_gather anywhere:
    the Swin tower scales data-parallel instead of degrading to replicated
    compute. Uses flagship dims (224^2, 5-frame clips, C=128..1024 with the
    hsplit kernel at stage3) at reduced depth — depth only changes the scan
    trip count, not the lowered kernels."""
    import jax.export as je

    from lrce_tpu.models import bert as B
    from lrce_tpu.models import e2e as E
    from lrce_tpu.train import losses as L
    from lrce_tpu.train import optimizer as O

    amesh = AbstractMesh((8,), ("data",))
    swin = S.SWIN_BASE._replace(depths=(2, 2, 2, 2), pallas_force=True)
    bert = B.BertConfig(num_layers=2)
    cfg = E.E2EConfig(num_classes=100, temporal_scale=(3,), text_seq_len=16,
                      bert=bert, swin=swin)

    params_shape = jax.eval_shape(lambda k: E.e2e_init(k, cfg),
                                  jax.random.key(0))
    adam = O.make_optimizer()
    labels = O.group_index_tree(params_shape)
    opt_shape = jax.eval_shape(adam.init, params_shape)

    def train_step(params, opt_state, clips, ids, mask, types, gt, lrs, rng):
        def loss_fn(p):
            logits = E.e2e_forward(p, clips, ids, mask, types, cfg,
                                   deterministic=False, rng=rng,
                                   compute_dtype=jnp.bfloat16, mesh=amesh)
            return L.cross_entropy(logits, gt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = O.apply_updates(params, grads, opt_state, adam,
                                            labels, lrs)
        return params, opt_state, loss

    bsz = 8                       # 8 samples x 3 clips = 24 clips over 8 dev
    repl = NamedSharding(amesh, P())
    bsh = NamedSharding(amesh, P("data"))
    in_sh = (jax.tree_util.tree_map(lambda _: repl, params_shape),
             jax.tree_util.tree_map(lambda _: repl, opt_shape),
             bsh, bsh, bsh, bsh, bsh, repl, repl)
    jf = jax.jit(train_step, in_shardings=in_sh, donate_argnums=(0, 1))
    args = (params_shape, opt_shape,
            jax.ShapeDtypeStruct((bsz, 3, 5, 224, 224, 3), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 16), jnp.int32),
            jax.ShapeDtypeStruct((bsz, 16), jnp.int32),
            jax.ShapeDtypeStruct((bsz, 16), jnp.int32),
            jax.ShapeDtypeStruct((bsz,), jnp.int32),
            jax.ShapeDtypeStruct((3,), jnp.float32),
            jax.eval_shape(lambda: jax.random.key(0)))
    txt = je.export(jf, platforms=("tpu",))(*args).mlir_module()

    calls = re.findall(
        r"custom_call @tpu_custom_call\(%[^)]*\)\s*\{.*?\}\s*:\s*\(([^)]+)\)"
        r"\s*->", txt, re.S)
    # fwd kernels at 4 stages + backward chunk/MLP kernels
    assert len(calls) >= 8, f"only {len(calls)} Mosaic calls lowered"

    per_shard_clips = bsz * 3 // 8
    acts_seen = set()
    for operands in calls:
        first = operands.split(",")[0].strip()
        m = re.match(r"tensor<(\d+)x(\d+)x(\d+)x(\d+)x(\d+)xbf16>", first)
        assert m, f"unexpected Mosaic activation operand {first}"
        lead, c = int(m.group(1)), int(m.group(5))
        assert lead == per_shard_clips, (
            f"Mosaic kernel sees batch {lead}, expected per-shard "
            f"{per_shard_clips} (replicated compute / all-gather!): {first}")
        acts_seen.add(c)
    # all four stage widths reached the fused kernels (1024 = hsplit)
    assert {128, 256, 512, 1024} <= acts_seen, acts_seen

    assert "all_gather" not in txt, "activation all-gather in train step"
    # the weight-grad psums at the shard_map boundary ARE expected
    assert txt.count("stablehlo.all_reduce") > 0
