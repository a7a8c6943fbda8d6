"""Tensor (channel) parallelism on the 8-device virtual CPU mesh.

The 'model' mesh axis (parallel/tensor.py) shards every DoubleConv
Megatron-style: conv1 on Cout, conv2 on Cin, BN1 with its channels —
expressed purely as GSPMD weight shardings. The contract tested here:

  * tp training is numerically the SAME program as single-device training
    (the sharded Cmid contraction only reassociates the conv2 accumulation,
    so fp32 round-off tolerance, not bitwise);
  * the params / optimizer state are actually distributed (per-device
    shards hold 1/tp of the channel dim);
  * the full train_model wiring (--tensor-parallel) runs end-to-end and
    matches the 1-D DP run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpu_unet.data import synth_batch
from tpu_unet.models import UNetConfig, init_unet, unet_apply
from tpu_unet.optim import rmsprop_init
from tpu_unet.parallel.mesh import image_sharding
from tpu_unet.parallel.tensor import (
    make_mesh_3d,
    shard_model,
    shard_opt_state,
    unet_param_specs,
)
from tpu_unet.train import make_train_step

# Fast-tier exclusion (VERDICT r3 next #3): 3-D dp x sp x tp mesh compiles per family.
pytestmark = pytest.mark.slow


CONFIG = UNetConfig(3, 1, bilinear=True, base_channels=8)


def _init():
    return init_unet(jax.random.PRNGKey(0), CONFIG)


def test_mesh_3d_shape_and_axes():
    mesh = make_mesh_3d(model=4)
    assert mesh.axis_names == ("data", "spatial", "model")
    assert mesh.shape["data"] == 2 and mesh.shape["model"] == 4
    with pytest.raises(ValueError):
        make_mesh_3d(model=3)  # 8 % 3 != 0


def test_param_specs_megatron_pairing():
    params, _ = _init()
    specs = unet_param_specs(params, tp=4)
    assert specs["down2"]["conv1"]["w"] == P(None, None, None, "model")
    assert specs["down2"]["conv2"]["w"] == P(None, None, "model", None)
    assert specs["down2"]["bn1"]["scale"] == P("model")
    assert specs["down2"]["bn2"]["scale"] == P()
    # Decoder DoubleConvs sit under up{i}/conv; the head stays replicated.
    assert specs["up1"]["conv"]["conv1"]["w"] == P(None, None, None, "model")
    assert specs["outc"]["w"] == P()


def test_params_actually_distributed():
    params, state = _init()
    mesh = make_mesh_3d(model=4)
    sp, ss = shard_model(mesh, params, state)
    w = sp["down3"]["conv1"]["w"]  # [3,3,32,64] -> 16 Cout per device
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(3, 3, 32, 16)}
    # BN1 running stats shard with their channels; BN2 stays replicated.
    assert {s.data.shape for s in ss["down3"]["bn1"].mean.addressable_shards} == {(16,)}
    assert {s.data.shape for s in ss["down3"]["bn2"].mean.addressable_shards} == {(64,)}
    opt = shard_opt_state(mesh, rmsprop_init(params), params)
    sq = opt.square_avg["down3"]["conv1"]["w"]
    assert {s.data.shape for s in sq.addressable_shards} == {(3, 3, 32, 16)}


@pytest.mark.parametrize("tp,amp", [(4, False), (8, False), (4, True)])
def test_tp_train_steps_match_single_device(tp, amp):
    """Three fused train steps under dp×tp equal the single-device run to
    fp32 reassociation tolerance (losses, params, BN running stats)."""
    params, state = _init()
    imgs, masks = synth_batch(np.random.default_rng(0), 8, 32, 32)
    imgs, masks = jnp.asarray(imgs), jnp.asarray(masks)

    def run(mesh):
        # Fresh arrays per run: the fused step DONATES params/state/opt.
        p0 = jax.tree.map(jnp.array, params)
        s0 = jax.tree.map(jnp.array, state)
        if mesh is None:
            p, s, o = p0, s0, rmsprop_init(p0)
            im, mk = imgs, masks
        else:
            p, s = shard_model(mesh, p0, s0)
            o = shard_opt_state(mesh, rmsprop_init(p0), p0)
            im = jax.device_put(imgs, image_sharding(mesh))
            mk = jax.device_put(masks, image_sharding(mesh))
        step = make_train_step(CONFIG, amp=amp)
        losses = []
        # amp compares ONE step: bf16 gradient quantization makes the
        # step-1 RMSprop sign flips widespread, and a 3-step trajectory
        # comparison then only measures compounding, not equivalence.
        for _ in range(1 if amp else 3):
            p, s, o, loss, _ = step(p, s, o, im, mk, jnp.float32(1e-3))
            losses.append(float(loss))
        return losses, jax.device_get(p), jax.device_get(s)

    l_ref, p_ref, s_ref = run(None)
    l_tp, p_tp, s_tp = run(make_mesh_3d(model=tp))
    # bf16 activations quantize the reassociation differences to ~1e-2
    # relative immediately; fp32 trajectories track to ~5e-4.
    np.testing.assert_allclose(l_tp, l_ref, rtol=(2e-2 if amp else 5e-4),
                               atol=1e-5)
    # Params after 3 steps: torch-RMSprop with zero-init sq is hypersensitive
    # at step 1 — buf ≈ 10·sign(g), so ONE reassociation-flipped near-zero
    # grad element moves its param by ~2·10·lr·(1+μ+μ²) ≈ 0.06, regardless
    # of how small the underlying fp difference was. Uniform tolerances
    # can't express "everything tight except isolated sign-flip outliers",
    # so the bound is quantile-shaped: ≤0.05% of elements may exceed the DP
    # grad tolerance (2e-2), none may exceed the one-flip ceiling. The
    # per-step LOSSES above are the trajectory-tracking assertion.
    # Under amp the gradients themselves are bf16-quantized, so near-zero
    # sign flips are widespread (not isolated) — there only the flip
    # ceiling is meaningful; in fp32 flips must be rare.
    worst_frac = 0.0
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_tp)):
        diff = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        # One flipped element moves ≤ 2·10·lr·Σμᵏ ≈ 0.02 (1 step) / 0.06 (3).
        assert diff.max() < (0.03 if amp else 0.08), diff.max()
        if not amp:
            worst_frac = max(worst_frac, np.mean(diff > 2e-2))
    assert worst_frac <= 5e-4, worst_frac
    # BN running stats: at step 1 (amp) both programs reduce the SAME
    # activations so the stats match to conv-reassociation noise; the fp32
    # 3-step bound additionally carries the params divergence above.
    for a, b in zip(jax.tree.leaves(s_ref), jax.tree.leaves(s_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=(5e-3 if amp else 2e-2))


def test_tp_eval_forward_matches():
    """Inference on tp-sharded params equals the replicated forward."""
    params, state = _init()
    imgs, _ = synth_batch(np.random.default_rng(1), 4, 32, 32)
    imgs = jnp.asarray(imgs)
    fwd = jax.jit(lambda p, s, x: unet_apply(p, s, x, config=CONFIG, train=False)[0])
    ref = fwd(params, state, imgs)
    mesh = make_mesh_3d(model=4)
    sp, ss = shard_model(mesh, params, state)
    out = fwd(sp, ss, jax.device_put(imgs, image_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_indivisible_block_falls_back_to_replicated():
    """tp that doesn't divide a block's Cmid replicates THAT block only —
    degraded sharding, never an error or wrong numerics."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=6)
    params, _ = init_unet(jax.random.PRNGKey(0), config)
    specs = unet_param_specs(params, tp=4)  # 6 % 4 != 0 at inc
    assert specs["inc"]["conv1"]["w"] == P()
    assert specs["down1"]["conv1"]["w"] == P(None, None, None, "model")  # 12 % 4 == 0


def test_tensor_parallel_train_model_e2e(tmp_path):
    """train_model(..., tensor_parallel=4) end-to-end: mesh construction,
    sharded params/opt, sharded validation, checkpointing — loss history
    matches the 1-D DP run."""
    from tpu_unet.data import CarvanaDataset, make_synthetic_carvana
    from tpu_unet.train import train_model

    make_synthetic_carvana(tmp_path / "d", n=16, h=64, w=64)
    ds = CarvanaDataset(tmp_path / "d" / "imgs", tmp_path / "d" / "masks",
                        scale=1.0, num_workers=0)
    params, state = _init()
    copy = lambda t: jax.tree.map(jnp.array, t)

    common = dict(dataset=ds, epochs=2, batch_size=8, learning_rate=1e-3,
                  val_percent=0.25, save_checkpoint_flag=False, seed=0,
                  data_parallel=True)
    _, _, h_dp = train_model(copy(params), copy(state), CONFIG, **common)
    _, _, h_tp = train_model(copy(params), copy(state), CONFIG,
                             tensor_parallel=4, **common)
    assert len(h_tp["train_loss"]) == len(h_dp["train_loss"]) == 2
    np.testing.assert_allclose(h_tp["train_loss"], h_dp["train_loss"],
                               rtol=1e-3, atol=1e-4)
    if h_dp["val_dice"]:
        np.testing.assert_allclose(h_tp["val_dice"], h_dp["val_dice"], atol=1e-3)


def test_tensor_parallel_requires_data_parallel():
    from tpu_unet.train import train_model

    with pytest.raises(ValueError, match="tensor-parallel"):
        train_model(*_init(), CONFIG, dataset=[], tensor_parallel=2)


def test_tp_shards_unetpp_too():
    """UNet++ nodes reuse the DoubleConv param structure, so the Megatron
    pairing (parallel/tensor.py) shards the whole nested family with no
    arch-specific code: forward + one fp32 train step match single-device,
    and the node weights are actually distributed."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8, arch="unetpp")
    params, state = init_unet(jax.random.PRNGKey(0), config)
    imgs, masks = synth_batch(np.random.default_rng(1), 8, 32, 32)
    imgs, masks = jnp.asarray(imgs), jnp.asarray(masks)

    def run(mesh):
        p0 = jax.tree.map(jnp.array, params)
        s0 = jax.tree.map(jnp.array, state)
        if mesh is None:
            p, s, o = p0, s0, rmsprop_init(p0)
            im, mk = imgs, masks
        else:
            p, s = shard_model(mesh, p0, s0)
            o = shard_opt_state(mesh, rmsprop_init(p0), p0)
            im = jax.device_put(imgs, image_sharding(mesh))
            mk = jax.device_put(masks, image_sharding(mesh))
        y, _ = unet_apply(p, s, im, config=config, train=False)
        step = make_train_step(config)
        p, s, o, loss, _ = step(p, s, o, im, mk, jnp.float32(1e-3))
        return jax.device_get(y), float(loss)

    mesh = make_mesh_3d(model=2)
    # A nested node's conv1 is Cout-sharded across the 'model' axis.
    specs = unet_param_specs(params, 2)
    assert specs["x01"]["conv1"]["w"] == P(None, None, None, "model")
    y_ref, l_ref = run(None)
    y_tp, l_tp = run(mesh)
    np.testing.assert_allclose(y_tp, y_ref, atol=1e-4)
    np.testing.assert_allclose(l_tp, l_ref, rtol=5e-4)


def test_tp_shards_adam_state_with_scalar_step():
    """The optimizer menu (optim/optimizers.py) composes with tp:
    shard_opt_state shards AdamState's two moment trees over 'model' and
    replicates the scalar ``step`` counter; one adam train step matches
    single-device to fp32 reassociation tolerance."""
    from tpu_unet.optim import get_optimizer

    params, state = _init()
    imgs, masks = synth_batch(np.random.default_rng(3), 8, 32, 32)
    imgs, masks = jnp.asarray(imgs), jnp.asarray(masks)
    adam_init, _ = get_optimizer("adam")

    def run(mesh):
        p0 = jax.tree.map(jnp.array, params)
        s0 = jax.tree.map(jnp.array, state)
        if mesh is None:
            p, s, o = p0, s0, adam_init(p0)
            im, mk = imgs, masks
        else:
            p, s = shard_model(mesh, p0, s0)
            o = shard_opt_state(mesh, adam_init(p0), p0)
            assert o.step.sharding.spec == P()  # scalar replicated
        if mesh is not None:
            im = jax.device_put(imgs, image_sharding(mesh))
            mk = jax.device_put(masks, image_sharding(mesh))
        step = make_train_step(CONFIG, optimizer="adam")
        p, s, o, loss, _ = step(p, s, o, im, mk, jnp.float32(1e-3))
        return float(loss), o

    l_ref, _ = run(None)
    l_tp, o_tp = run(make_mesh_3d(model=2))
    np.testing.assert_allclose(l_tp, l_ref, rtol=5e-4)
    assert int(o_tp.step) == 1


def test_tp_shards_attention_unet_too():
    """Attention U-Net's encoder/decoder reuses the DoubleConv structure,
    so the Megatron pairing shards it with no arch-specific code; the
    attention-gate 1x1 projections are NOT DoubleConv-shaped and stay
    replicated (correct by construction — their inputs are replicated
    decoder/skip tensors): forward + one fp32 train step match
    single-device."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8,
                        arch="attention")
    params, state = init_unet(jax.random.PRNGKey(0), config)
    imgs, masks = synth_batch(np.random.default_rng(1), 8, 32, 32)
    imgs, masks = jnp.asarray(imgs), jnp.asarray(masks)

    def run(mesh):
        p0 = jax.tree.map(jnp.array, params)
        s0 = jax.tree.map(jnp.array, state)
        if mesh is None:
            p, s, o = p0, s0, rmsprop_init(p0)
            im, mk = imgs, masks
        else:
            p, s = shard_model(mesh, p0, s0)
            o = shard_opt_state(mesh, rmsprop_init(p0), p0)
            im = jax.device_put(imgs, image_sharding(mesh))
            mk = jax.device_put(masks, image_sharding(mesh))
        y, _ = unet_apply(p, s, im, config=config, train=False)
        step = make_train_step(config)
        p, s, o, loss, _ = step(p, s, o, im, mk, jnp.float32(1e-3))
        return jax.device_get(y), float(loss)

    specs = unet_param_specs(params, 2)
    # The decoder DoubleConv is sharded; the gate projections replicated.
    assert specs["up1"]["conv"]["conv1"]["w"] == P(None, None, None, "model")
    assert specs["up1"]["att"]["psi"]["w"] == P()
    mesh = make_mesh_3d(model=2)
    y_ref, l_ref = run(None)
    y_tp, l_tp = run(mesh)
    np.testing.assert_allclose(y_tp, y_ref, atol=1e-4)
    np.testing.assert_allclose(l_tp, l_ref, rtol=5e-4)


@pytest.mark.parametrize("arch", ["r2u", "r2attu"])
def test_tp_shards_rrcnn_families(arch):
    """RRCNN blocks shard under tp with the pair mapped onto the two
    weight-shared recurrent units (rec1 on Cout, rec2 on Cin) — GSPMD
    derives the per-application resharding of the recurrent activations
    from those two weight specs alone. Params are actually distributed;
    forward + one fp32 train step match single-device to reassociation
    tolerance. r2attu's gate projections stay replicated."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8, arch=arch,
                        recur_t=2)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    imgs, masks = synth_batch(np.random.default_rng(1), 8, 32, 32)
    imgs, masks = jnp.asarray(imgs), jnp.asarray(masks)

    specs = unet_param_specs(params, 2)
    assert specs["down2"]["rec1"]["conv"]["w"] == P(None, None, None, "model")
    assert specs["down2"]["rec2"]["conv"]["w"] == P(None, None, "model", None)
    assert specs["down2"]["rec1"]["bn"]["scale"] == P("model")
    assert specs["down2"]["proj"]["w"] == P()
    if arch == "r2attu":
        assert specs["up1"]["att"]["psi"]["w"] == P()

    def run(mesh):
        p0 = jax.tree.map(jnp.array, params)
        s0 = jax.tree.map(jnp.array, state)
        if mesh is None:
            p, s, o = p0, s0, rmsprop_init(p0)
            im, mk = imgs, masks
        else:
            p, s = shard_model(mesh, p0, s0)
            o = shard_opt_state(mesh, rmsprop_init(p0), p0)
            # The recurrent unit's weights are really 1/tp per device.
            w = p["down2"]["rec1"]["conv"]["w"]
            shard_shapes = {tuple(sh.data.shape) for sh in w.addressable_shards}
            assert shard_shapes == {(3, 3, 32, 16)}
            im = jax.device_put(imgs, image_sharding(mesh))
            mk = jax.device_put(masks, image_sharding(mesh))
        y, _ = unet_apply(p, s, im, config=config, train=False)
        step = make_train_step(config)
        p, s, o, loss, _ = step(p, s, o, im, mk, jnp.float32(1e-3))
        return jax.device_get(y), float(loss)

    mesh = make_mesh_3d(model=2)
    y_ref, l_ref = run(None)
    y_tp, l_tp = run(mesh)
    np.testing.assert_allclose(y_tp, y_ref, atol=1e-4)
    np.testing.assert_allclose(l_tp, l_ref, rtol=5e-4)
