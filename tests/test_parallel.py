"""Distributed tests on the 8-device virtual CPU mesh (SURVEY.md §4.3):
data-parallel training ≡ single-device at equal global batch; sharded eval."""

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.data import synth_batch
from tpu_unet.models import UNetConfig, init_unet
from tpu_unet.optim import rmsprop_init
from tpu_unet.parallel.mesh import batch_sharding, make_mesh, replicated
from tpu_unet.train import make_train_step


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_dp_gradients_match_single_device():
    """The DP contract: global-batch gradients sharded over 8 devices equal
    the single-device gradients. Asserted tightly in eval mode (pure conv
    path, no reduction-order amplification); train mode asserts loss + BN
    running stats (train-mode BN backward amplifies fp reassociation noise
    through 18 rsqrt(var) layers, so grads only match loosely there)."""
    import functools

    from tpu_unet.models import unet_apply
    from tpu_unet.train import compute_loss

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    imgs, masks = synth_batch(rng, 8, 32, 32)

    mesh = make_mesh()
    shard = batch_sharding(mesh)
    rep = replicated(mesh)

    def make_grad_fn(train):
        def loss_fn(p, s, im, mk):
            logits, new_bn = unet_apply(p, s, im, config=config, train=train)
            return compute_loss(logits, mk, 1), new_bn

        return jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    for train, grad_atol in ((False, 1e-5), (True, 2e-2)):
        grad_fn = make_grad_fn(train)
        (l1, bn1), g1 = grad_fn(params, state, jnp.asarray(imgs), jnp.asarray(masks))
        (l2, bn2), g2 = grad_fn(
            jax.device_put(params, rep),
            jax.device_put(state, rep),
            jax.device_put(jnp.asarray(imgs), shard),
            jax.device_put(jnp.asarray(masks), shard),
        )
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=grad_atol)
        for a, b in zip(jax.tree.leaves(bn1), jax.tree.leaves(bn2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_dp_train_step_runs_sharded():
    """The fused train step executes end-to-end on sharded inputs and keeps
    params replicated."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    step = make_train_step(config)
    mesh = make_mesh()
    shard = batch_sharding(mesh)
    rep = replicated(mesh)
    imgs, masks = synth_batch(np.random.default_rng(0), 8, 32, 32)
    p, s, o, loss, gnorm = step(
        jax.device_put(params, rep),
        jax.device_put(state, rep),
        jax.device_put(rmsprop_init(params), rep),
        jax.device_put(jnp.asarray(imgs), shard),
        jax.device_put(jnp.asarray(masks), shard),
        jnp.float32(1e-3),
    )
    assert np.isfinite(float(loss)) and np.isfinite(float(gnorm))
    # Updated params must remain fully replicated (no accidental sharding).
    leaf = jax.tree.leaves(p)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_batch_is_actually_sharded():
    mesh = make_mesh()
    shard = batch_sharding(mesh)
    x = jax.device_put(jnp.zeros((8, 16, 16, 3)), shard)
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape == (1, 16, 16, 3)


def test_synced_bn_axis_name_matches_full_batch():
    """The explicit shard_map synced-BN path (axis_name=) must reproduce
    full-batch statistics exactly — including the between-replica variance
    term E_r[(mean_r - mean_g)^2] (ADVICE r1: omitting it understates var
    whenever per-replica means differ, which this data guarantees)."""
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from tpu_unet.ops.batchnorm import batch_norm, init_bn_params, init_bn_state

    c = 8
    params = init_bn_params(c)
    state = init_bn_state(c)
    rng = np.random.default_rng(1)
    # Give every device-shard a very different mean so the between-replica
    # term dominates: shard k is centred at 10*k.
    x = rng.standard_normal((8, 4, 4, c)).astype(np.float32)
    x += 10.0 * np.arange(8, dtype=np.float32)[:, None, None, None]
    x = jnp.asarray(x)

    ref_y, ref_state = batch_norm(x, params, state, train=True)

    mesh = make_mesh()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data"), P(), P()),
        out_specs=(P("data"), P()),
        check_rep=False,
    )
    def synced(xs, p, s):
        return batch_norm(xs, p, s, train=True, axis_name="data")

    y, new_state = synced(x, params, state)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_state.mean), np.asarray(ref_state.mean), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state.var), np.asarray(ref_state.var), rtol=1e-5
    )


def test_pallas_dp_step_matches_single_device_xla():
    """--kernels pallas under data parallelism: the shard_map step (fused
    Pallas convs per device, psum'd BN stat sums, pmean'd grads) must match
    the single-device XLA step on the same global batch — same loss, same
    BN running stats (global-batch semantics), same updated params within
    train-mode BN reassociation tolerance."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    opt = rmsprop_init(params)
    imgs, masks = synth_batch(np.random.default_rng(0), 8, 32, 32)
    imgs, masks = jnp.asarray(imgs), jnp.asarray(masks)
    lr = jnp.float32(1e-3)

    mesh = make_mesh()
    shard = batch_sharding(mesh)
    rep = replicated(mesh)
    params_r = jax.device_put(params, rep)
    state_r = jax.device_put(state, rep)
    opt_r = jax.device_put(opt, rep)

    ref_step = make_train_step(config)
    # Fresh buffers for the donating reference step: device_put to a
    # replicated sharding aliases the source as the device-0 shard, so
    # donating the originals would delete the replicated copies too.
    copy = lambda t: jax.tree.map(jnp.array, t)
    p1, s1, o1, l1, g1 = ref_step(copy(params), copy(state), copy(opt), imgs, masks, lr)

    dp_step = make_train_step(config, kernels="pallas", mesh=mesh)
    p2, s2, o2, l2, g2 = dp_step(
        params_r, state_r, opt_r,
        jax.device_put(imgs, shard),
        jax.device_put(masks, shard),
        lr,
    )
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    np.testing.assert_allclose(float(g1), float(g2), rtol=2e-2)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)
    assert jax.tree.leaves(p2)[0].sharding.is_fully_replicated


def test_spatial_parallel_train_model_e2e(tmp_path):
    """VERDICT r2 next #7: drive train_model itself (not just the step)
    through the 2-D dp×sp wiring — mesh construction, image_sharding
    prefetch, sharded validation, an epoch — and assert the loss history
    matches the 1-D DP run (both are GSPMD global-batch programs)."""
    from tpu_unet.data import CarvanaDataset, make_synthetic_carvana
    from tpu_unet.train import train_model

    # batch 8: divisible by the full 8-device 'data' axis (1-D run) AND by
    # the 2-device 'data' axis of the 2×4 dp×sp mesh.
    make_synthetic_carvana(tmp_path / "d", n=16, h=64, w=64)
    ds = CarvanaDataset(tmp_path / "d" / "imgs", tmp_path / "d" / "masks",
                        scale=1.0, num_workers=0)
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    copy = lambda t: jax.tree.map(jnp.array, t)

    common = dict(dataset=ds, epochs=2, batch_size=8, learning_rate=1e-3,
                  val_percent=0.25, save_checkpoint_flag=False, seed=0,
                  data_parallel=True)
    _, _, h_dp = train_model(copy(params), copy(state), config, **common)
    _, _, h_2d = train_model(copy(params), copy(state), config,
                             spatial_parallel=4, **common)
    assert len(h_2d["train_loss"]) == len(h_dp["train_loss"]) == 2
    np.testing.assert_allclose(h_2d["train_loss"], h_dp["train_loss"],
                               rtol=1e-3, atol=1e-4)
    if h_dp["val_dice"]:
        np.testing.assert_allclose(h_2d["val_dice"], h_dp["val_dice"], atol=1e-3)


def test_spatial_parallel_cli(tmp_path, monkeypatch):
    """The --spatial-parallel CLI flag end-to-end through main()."""
    from tpu_unet.data import make_synthetic_carvana
    from tpu_unet.train import main as train_main

    make_synthetic_carvana(tmp_path / "d", n=8, h=64, w=64)
    monkeypatch.chdir(tmp_path)
    train_main([
        "-e", "1", "-b", "2", "-l", "1e-3", "-s", "1.0",
        "--data-dir", str(tmp_path / "d"),
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--data-parallel", "--spatial-parallel", "4",
    ])
    assert (tmp_path / "ck" / "checkpoint_epoch1.npz").exists()


def test_dp_device_dataset_with_odd_val_split(tmp_path):
    """--data-parallel --device-dataset end-to-end with a val split whose
    batches DON'T divide the mesh: round-3 regression (the sharded gather
    crashed at the first validation; self-review r3 #1). Validation runs
    every step here, exercising the fallback gather repeatedly."""
    from tpu_unet.data import CarvanaDataset, make_synthetic_carvana
    from tpu_unet.train import train_model

    # 50 imgs, val 20% -> 10 val / 40 train; batch 8 over 8 devices:
    # division_step = 40 // 40 = 1 (validation every step); train batches
    # of 8 shard; val batches are 8 + 2 (the 2 can't shard -> fallback).
    make_synthetic_carvana(tmp_path / "d", n=50, h=32, w=32)
    ds = CarvanaDataset(tmp_path / "d" / "imgs", tmp_path / "d" / "masks",
                        scale=1.0, num_workers=0)
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    _, _, hist = train_model(
        params, state, config, dataset=ds, epochs=1, batch_size=8,
        learning_rate=1e-3, val_percent=0.2, save_checkpoint_flag=False,
        seed=0, data_parallel=True, device_dataset=True,
    )
    assert len(hist["train_loss"]) == 5  # 40 // 8, drop_last under DP
    assert hist["val_dice"], "validation must have run"
    assert all(np.isfinite(v) for v in hist["val_dice"])


def test_sharded_eval_matches_host_loop():
    """Sharded validation (VERDICT r2 next #1): evaluate() over the DP mesh
    — batch-sharded inputs, on-device accumulation, one D2H at the end —
    must equal the single-device host loop to fp32 tolerance, including an
    odd trailing batch that can't shard."""
    from tpu_unet.parallel.mesh import image_sharding

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    # 8 + 8 + 3: two shardable batches and one odd remainder.
    batches = []
    for bs in (8, 8, 3):
        imgs, masks = synth_batch(rng, bs, 32, 32)
        batches.append({"image": imgs, "mask": masks})

    from tpu_unet.evaluate import evaluate

    ref_d, ref_i = evaluate(params, state, batches, config)

    mesh = make_mesh()
    sharding = image_sharding(mesh)
    p_r = jax.device_put(params, replicated(mesh))
    s_r = jax.device_put(state, replicated(mesh))
    d, i = evaluate(p_r, s_r, batches, config, sharding=sharding)
    np.testing.assert_allclose(d, ref_d, rtol=1e-5)
    np.testing.assert_allclose(i, ref_i, rtol=1e-5)


def test_2d_dp_spatial_step_matches_single_device():
    """2-D (data, spatial) GSPMD: batch over 'data', image height over
    'spatial'. XLA spatially partitions the convs (halo exchanges inserted
    automatically) and BN stats stay global-batch, so the full fused train
    step must match single-device to reduction-order tolerance."""
    from tpu_unet.parallel.mesh import image_sharding, make_mesh_2d

    config = UNetConfig(3, 2, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    opt = rmsprop_init(params)
    rng = np.random.default_rng(0)
    imgs, masks = synth_batch(rng, 4, 64, 64)  # binary masks ≡ 2-class indices
    imgs, masks = jnp.asarray(imgs), jnp.asarray(masks)
    lr = jnp.float32(1e-3)

    step = make_train_step(config)
    copy = lambda t: jax.tree.map(jnp.array, t)
    p1, s1, o1, l1, g1 = step(copy(params), copy(state), copy(opt), imgs, masks, lr)

    mesh = make_mesh_2d(spatial=4)  # 2 data x 4 spatial
    assert mesh.shape == {"data": 2, "spatial": 4}
    xsh = image_sharding(mesh)
    rep = replicated(mesh)
    p2, s2, o2, l2, g2 = step(
        jax.device_put(params, rep),
        jax.device_put(state, rep),
        jax.device_put(opt, rep),
        jax.device_put(imgs, xsh),
        jax.device_put(masks, xsh),
        lr,
    )
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-3)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    # Params: RMSprop's FIRST step from sq=0 is ~sign(g)·lr/√(1−β), so a
    # reduction-order flip on a near-zero gradient moves that element by
    # ~2·31.6·lr — bound the bulk tightly and the sign-flip tail by count.
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        diff = np.abs(np.asarray(a) - np.asarray(b))
        assert np.median(diff) < 1e-5
        n_off = int((diff > 1e-3).sum())
        assert n_off <= max(3, 0.01 * diff.size), f"{n_off}/{diff.size} elements off"
        assert diff.max() < 0.1


def test_sharded_eval_tta_matches_host_loop():
    """--tta composed with sharded evaluation: the 4-view batched forward
    is a plain jit program, so GSPMD shards it like any eval step; values
    must equal the unsharded TTA host loop."""
    from tpu_unet.parallel.mesh import image_sharding

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(1)
    imgs, masks = synth_batch(rng, 8, 32, 32)
    batches = [{"image": imgs, "mask": masks}]

    from tpu_unet.evaluate import evaluate

    ref = evaluate(params, state, batches, config, tta=True)
    mesh = make_mesh()
    p_r = jax.device_put(params, replicated(mesh))
    s_r = jax.device_put(state, replicated(mesh))
    got = evaluate(p_r, s_r, batches, config,
                   sharding=image_sharding(mesh), tta=True)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_zero_sharded_opt_state_matches_plain_dp():
    """ZeRO-1 (parallel/zero.py): RMSprop state sharded 1/8 per device
    matches the replicated-DP update to fp32 round-off (pinning the state
    shardings lets GSPMD reduce-scatter the weight grads — a reduction
    regrouping, not a semantic change), and the new state KEEPS its
    shardings (not silently re-replicated)."""
    from jax.sharding import PartitionSpec as P

    from tpu_unet.parallel.zero import shard_opt_state_zero, zero_opt_shardings

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    mesh = make_mesh()
    shard = batch_sharding(mesh)
    rep = replicated(mesh)
    imgs, masks = synth_batch(np.random.default_rng(0), 8, 32, 32)
    args = (jax.device_put(jnp.asarray(imgs), shard),
            jax.device_put(jnp.asarray(masks), shard), jnp.float32(1e-3))

    def run(zero):
        # Fresh copies: the fused step donates (params, state, opt) buffers.
        copy = lambda t: jax.tree.map(jnp.array, t)
        p = jax.device_put(copy(params), rep)
        s = jax.device_put(copy(state), rep)
        o = rmsprop_init(p)
        if zero:
            o = shard_opt_state_zero(mesh, o, params)
            step = make_train_step(
                config, opt_shardings=zero_opt_shardings(mesh, o, params))
        else:
            o = jax.device_put(o, rep)
            step = make_train_step(config)
        for _ in range(3):  # a few steps so momentum_buf/square_avg engage
            p, s, o, loss, gnorm = step(p, s, o, *args)
        return p, o, loss

    p_plain, o_plain, loss_plain = run(zero=False)
    p_zero, o_zero, loss_zero = run(zero=True)

    np.testing.assert_allclose(float(loss_plain), float(loss_zero), rtol=1e-6)
    # RMSprop's g/(sqrt(sq)+eps) is O(1)-sensitive to grad round-off on
    # near-zero elements while sq is warming up (same mechanism as the
    # loose train-mode grad tolerance in
    # test_dp_gradients_match_single_device), and the momentum buffer
    # integrates those outliers over the 3 steps: single momentum_buf
    # elements land ~2e-4 apart (observed: 1/18432 at 1.9e-4, rel 3e-2).
    # 1e-4 absolute on O(0.05) params pins the update semantics; the
    # state gets the looser 5e-4 because it carries the pre-lr-scaled
    # update; the e2e test's loss-history match is the strong invariant.
    for a, b in zip(jax.tree.leaves(p_plain), jax.tree.leaves(p_zero)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree.leaves(o_plain), jax.tree.leaves(o_zero)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-4)
    # The updated state is still sharded (not silently re-replicated): every
    # leaf with a dim divisible by 8 must carry a non-trivial PartitionSpec.
    sharded_leaves = [
        x for x in jax.tree.leaves(o_zero)
        if any(d % 8 == 0 for d in x.shape)
    ]
    assert sharded_leaves
    for x in sharded_leaves:
        assert x.sharding.spec != P(), x.shape


def test_zero_composes_with_adam_scalar_step():
    """The optimizer menu rides ZeRO-1: AdamState carries a non-param-shaped
    scalar ``step`` (optim/optimizers.py), which zero_opt_shardings must
    replicate while sharding the two moment trees 1/8 per chip."""
    from jax.sharding import PartitionSpec as P

    from tpu_unet.optim import get_optimizer
    from tpu_unet.parallel.zero import shard_opt_state_zero, zero_opt_shardings

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    mesh = make_mesh()
    shard = batch_sharding(mesh)
    rep = replicated(mesh)
    imgs, masks = synth_batch(np.random.default_rng(0), 8, 32, 32)
    args = (jax.device_put(jnp.asarray(imgs), shard),
            jax.device_put(jnp.asarray(masks), shard), jnp.float32(1e-3))
    adam_init, _ = get_optimizer("adam")

    def run(zero):
        copy = lambda t: jax.tree.map(jnp.array, t)
        p = jax.device_put(copy(params), rep)
        s = jax.device_put(copy(state), rep)
        o = adam_init(p)
        if zero:
            o = shard_opt_state_zero(mesh, o, params)
            step = make_train_step(
                config, optimizer="adam",
                opt_shardings=zero_opt_shardings(mesh, o, params))
        else:
            o = jax.device_put(o, rep)
            step = make_train_step(config, optimizer="adam")
        for _ in range(3):
            p, s, o, loss, gnorm = step(p, s, o, *args)
        return p, o, loss

    p_plain, o_plain, loss_plain = run(zero=False)
    p_zero, o_zero, loss_zero = run(zero=True)

    np.testing.assert_allclose(float(loss_plain), float(loss_zero), rtol=1e-6)
    assert int(o_zero.step) == 3  # the bias-correction counter advanced
    for a, b in zip(jax.tree.leaves(p_plain), jax.tree.leaves(p_zero)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    # Moment trees stay sharded after the step; the scalar stays replicated.
    sharded_leaves = [
        x for t in (o_zero.exp_avg, o_zero.exp_avg_sq)
        for x in jax.tree.leaves(t) if any(d % 8 == 0 for d in x.shape)
    ]
    assert sharded_leaves
    for x in sharded_leaves:
        assert x.sharding.spec != P(), x.shape
    assert o_zero.step.sharding.spec == P()


def test_zero_train_model_e2e(tmp_path):
    """--zero end-to-end through train_model: loss history matches the
    plain-DP run to fp32 round-off."""
    from tpu_unet.data import CarvanaDataset, make_synthetic_carvana
    from tpu_unet.train import train_model

    make_synthetic_carvana(tmp_path / "d", n=8, h=48, w=64)
    ds = CarvanaDataset(tmp_path / "d" / "imgs", tmp_path / "d" / "masks",
                        scale=1.0, num_workers=0)
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    copy = lambda t: jax.tree.map(jnp.array, t)

    common = dict(dataset=ds, epochs=1, batch_size=8, learning_rate=1e-3,
                  val_percent=0.25, save_checkpoint_flag=False, seed=0,
                  data_parallel=True)
    _, _, h_plain = train_model(copy(params), copy(state), config, **common)
    _, _, h_zero = train_model(copy(params), copy(state), config,
                               zero=True, **common)
    np.testing.assert_allclose(h_plain["train_loss"], h_zero["train_loss"],
                               rtol=1e-4)
    if h_plain["val_dice"]:
        np.testing.assert_allclose(h_plain["val_dice"], h_zero["val_dice"],
                                   atol=1e-4)
