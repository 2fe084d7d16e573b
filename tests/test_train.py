"""Training-loop tests on the tiny victim network, on an 8-device CPU mesh:
loss decreases, state round-trips through checkpoints, scheduler parity
with torch ReduceLROnPlateau, optimizer step parity with torch
Adam(amsgrad)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu as A
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import train as T
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.dataset import SyntheticData
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
    build_network, init_params, fold_bn, tiny_test_blocks)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.parallel.mesh import make_mesh


def tiny_exp(**kw):
    base = dict(name="tiny", img_size=64, patch_size=16, batch_size=8,
                max_labels=8, compute_dtype="float32", max_epochs=2,
                checkpoint_every=1)
    base.update(kw)
    return T.ExperimentConfig(**base)


@pytest.fixture(scope="module")
def tiny_victim():
    net = build_network(tiny_test_blocks())
    params = fold_bn(net, init_params(net, jax.random.PRNGKey(11)))
    return net, params


def _batches(exp, n_batches=2):
    data = SyntheticData(n_batches * exp.batch_size, exp.img_size,
                         exp.max_labels)
    def make(epoch):
        return [data.batch(exp.batch_size, epoch * 100 + i)
                for i in range(n_batches)]
    return make


def test_train_step_runs_and_updates(tiny_victim):
    net, params = tiny_victim
    exp = tiny_exp()
    mesh = make_mesh()
    assert mesh.devices.size == 8
    trainer = T.PatchTrainer(exp, net=net, params=params, mesh=mesh,
                             log=lambda s: None)
    patch0 = np.asarray(trainer.state.patch)
    stats = trainer.run_epoch(_batches(exp)(0), 0)
    patch1 = np.asarray(trainer.state.patch)
    assert np.isfinite(stats["loss"])
    assert not np.allclose(patch0, patch1)
    assert (patch1 >= 0).all() and (patch1 <= 1).all()


@pytest.mark.parametrize("recipe", T.LOSS_RECIPES)
@pytest.mark.slow
def test_all_loss_recipes_compile(tiny_victim, recipe):
    net, params = tiny_victim
    exp = tiny_exp(loss_recipe=recipe)
    loss_fn = T.make_loss_fn(net, exp,
                             A.data.load_printable_colors())
    data = SyntheticData(4, exp.img_size, exp.max_labels)
    imgs, labs = data.batch(4)
    patch = T.init_patch(exp, jax.random.PRNGKey(0))
    (loss, aux), grads = jax.jit(jax.value_and_grad(
        loss_fn, has_aux=True))(patch, params, jnp.asarray(imgs),
                                jnp.asarray(labs), None,
                                jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grads)).all()
    assert float(jnp.abs(grads).sum()) > 0


@pytest.mark.slow
def test_objective_actually_optimizes(tiny_victim):
    """A few steps of the real objective should reduce the creation loss
    on a fixed batch (sanity: gradients point the right way)."""
    net, params = tiny_victim
    exp = tiny_exp(loss_recipe="untargeted_obj", learning_rate=0.05)
    loss_fn = T.make_loss_fn(net, exp, A.data.load_printable_colors())
    data = SyntheticData(8, exp.img_size, exp.max_labels)
    imgs, labs = data.batch(8)
    imgs, labs = jnp.asarray(imgs), jnp.asarray(labs)
    step = T.make_train_step(net, exp)
    state = T.init_train_state(exp, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)
    first = float(loss_fn(state.patch, params, imgs, labs, None, key)[0])
    for _ in range(30):
        state, aux = step(state, params, imgs, labs, jnp.float32(0.05))
    last = float(loss_fn(state.patch, params, imgs, labs, None, key)[0])
    assert last < first


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, tiny_victim):
    net, params = tiny_victim
    exp = tiny_exp()
    trainer = T.PatchTrainer(exp, net=net, params=params,
                             checkpoint_dir=str(tmp_path),
                             log=lambda s: None)
    trainer.run_epoch(_batches(exp)(0), 0)
    trainer.scheduler.step(1.23)
    trainer.save_checkpoint(epoch=0)
    assert os.path.exists(tmp_path / "0_patch.png")

    trainer2 = T.PatchTrainer(exp, net=net, params=params,
                              checkpoint_dir=str(tmp_path),
                              log=lambda s: None)
    epoch = trainer2.restore_checkpoint()
    assert epoch == 0
    np.testing.assert_array_equal(np.asarray(trainer2.state.patch),
                                  np.asarray(trainer.state.patch))
    assert trainer2.scheduler.best == trainer.scheduler.best


def test_scheduler_torch_parity():
    import torch
    lr0 = 0.03
    ours = T.ReduceLROnPlateau(lr0, factor=0.1, patience=3)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, "min", factor=0.1, patience=3)
    rng = np.random.default_rng(3)
    losses = [5.0] + list(5.0 + rng.random(30))
    for l in losses:
        ours.step(l)
        sched.step(l)
        assert ours.lr == pytest.approx(opt.param_groups[0]["lr"])


def test_amsgrad_torch_parity():
    """scale_by_torch_amsgrad + lr step matches torch Adam(amsgrad=True)
    on a deterministic quadratic."""
    import torch
    import optax

    w0 = np.array([0.5, -0.3, 0.8], dtype=np.float32)
    lr = 0.03

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=lr, amsgrad=True)

    tx = T.scale_by_torch_amsgrad()
    jw = jnp.asarray(w0)
    state = tx.init(jw)

    for i in range(20):
        grad_t = 2 * tw + float(i % 3)
        topt.zero_grad()
        tw.grad = grad_t.detach().clone()
        topt.step()

        g = 2 * jw + (i % 3)
        updates, state = tx.update(g, state)
        jw = jw - lr * updates

    np.testing.assert_allclose(np.asarray(jw), tw.detach().numpy(),
                               atol=1e-5)


@pytest.mark.slow
def test_full_train_two_epochs(tmp_path, tiny_victim):
    net, params = tiny_victim
    exp = tiny_exp(max_epochs=2)
    trainer = T.PatchTrainer(exp, net=net, params=params,
                             checkpoint_dir=str(tmp_path),
                             log=lambda s: None)
    patch, history = trainer.train(_batches(exp), epochs=2)
    assert len(history) == 2
    assert patch.shape == (16, 16, 3)
    assert {"loss", "no_obj", "lr"} <= set(history[0])


@pytest.mark.slow
def test_creation_attack_efficacy(tiny_victim):
    """Optimizing the creation objective through the full stack lowers
    the no-obj loss (raises patch-cell objectness). Random victim
    weights give weak but directional signal; rotation/jitter are off to
    reduce EOT variance."""
    net, params = tiny_victim
    exp = tiny_exp(loss_recipe="untargeted_obj", patch_size=32,
                   do_rotate=False, photometric=False)
    data = SyntheticData(8, exp.img_size, exp.max_labels)
    imgs, labs = map(jnp.asarray, data.batch(8))
    labs = labs.at[:, 0].set(jnp.asarray([0, 0.5, 0.9, 0.9, 0.9]))

    step = T.make_train_step(net, exp)
    state = T.init_train_state(exp, jax.random.PRNGKey(0))
    hist = []
    for _ in range(300):
        state, aux = step(state, params, imgs, labs, jnp.float32(0.05))
        hist.append(aux["no_obj"])
    hist = np.asarray(jnp.stack(hist))
    assert hist[-10:].mean() < hist[:10].mean() - 0.03, (
        hist[:10].mean(), hist[-10:].mean())


@pytest.mark.slow
def test_padded_final_batch_trains(tiny_victim):
    """A final batch not divisible by the mesh is padded + masked (not
    skipped, the round-1 behavior): both batches train, and loss stats
    come from real samples only."""
    net, params = tiny_victim
    exp = tiny_exp()
    mesh = make_mesh()
    trainer = T.PatchTrainer(exp, net=net, params=params, mesh=mesh,
                             log=lambda s: None)
    data = SyntheticData(16, exp.img_size, exp.max_labels)
    full = data.batch(8, 0)
    imgs, labs = data.batch(8, 1)
    partial = (imgs[:5], labs[:5])          # 5 % 8 != 0
    patch0 = np.asarray(trainer.state.patch)
    stats = trainer.run_epoch([full, partial], 0)
    assert stats["num_batches"] == 2
    assert int(trainer.state.step) == 2
    assert np.isfinite(stats["loss"])
    assert not np.allclose(patch0, np.asarray(trainer.state.patch))


@pytest.mark.slow
def test_pad_weights_zero_influence(tiny_victim):
    """Zero-weighted pad rows must not affect the loss or the patch
    gradient: swapping the pad images for garbage changes nothing."""
    net, params = tiny_victim
    exp = tiny_exp()
    loss_fn = T.make_loss_fn(net, exp, A.data.load_printable_colors())
    data = SyntheticData(8, exp.img_size, exp.max_labels)
    imgs, labs = data.batch(8)
    w = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)
    garbage = imgs.copy()
    garbage[5:] = 0.123
    key = jax.random.PRNGKey(3)
    patch = T.init_patch(exp, jax.random.PRNGKey(0))
    g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (l1, _), g1 = g(patch, params, jnp.asarray(imgs), jnp.asarray(labs),
                    jnp.asarray(w), key)
    (l2, _), g2 = g(patch, params, jnp.asarray(garbage),
                    jnp.asarray(labs), jnp.asarray(w), key)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_make_mesh_for_batch():
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.parallel.mesh import (
        init_distributed, make_mesh_for_batch)
    assert make_mesh_for_batch(8).devices.size == 8
    assert make_mesh_for_batch(4).devices.size == 4
    assert make_mesh_for_batch(6).devices.size == 6
    assert make_mesh_for_batch(7).devices.size == 7
    assert make_mesh_for_batch(5).devices.size == 5
    assert make_mesh_for_batch(3).devices.size == 3
    assert make_mesh_for_batch(1).devices.size == 1
    assert init_distributed() is False  # single host: no-op


@pytest.mark.slow
def test_training_determinism(tiny_victim):
    """Same seed + data => bit-identical patches (explicit-key RNG; the
    reference's global torch RNG cannot guarantee this)."""
    net, params = tiny_victim
    exp = tiny_exp()
    data = SyntheticData(8, exp.img_size, exp.max_labels)
    imgs, labs = map(jnp.asarray, data.batch(8))

    def run():
        step = T.make_train_step(net, exp)
        state = T.init_train_state(exp, jax.random.PRNGKey(7))
        for _ in range(5):
            state, _ = step(state, params, imgs, labs, jnp.float32(0.03))
        return np.asarray(state.patch)

    np.testing.assert_array_equal(run(), run())


@pytest.mark.slow
def test_trainer_with_file_loader(tmp_path, tiny_victim):
    """File-backed dataset -> BatchLoader -> trainer epoch (the real
    data path, not synthetic)."""
    from PIL import Image
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.dataset import (
        BatchLoader, DotaDataset)
    img_dir = tmp_path / "img"
    lab_dir = tmp_path / "lab"
    img_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)
                        ).save(img_dir / f"t{i}.png")
        (lab_dir / f"t{i}.txt").write_text("3 0.5 0.5 0.2 0.2\n")
    net, params = tiny_victim
    exp = tiny_exp(batch_size=2)
    ds = DotaDataset(str(img_dir), str(lab_dir), exp.max_labels,
                     exp.img_size)
    loader = BatchLoader(ds, exp.batch_size, num_workers=2, seed=0)
    trainer = T.PatchTrainer(exp, net=net, params=params,
                             log=lambda s: None)
    stats = trainer.run_epoch(loader, 0)
    assert stats["num_batches"] == 3
    assert np.isfinite(stats["loss"])


@pytest.mark.slow
def test_partial_batch_smaller_than_pad(tiny_victim):
    """A partial batch smaller than the needed padding (3 real, 5 pad)
    tiles its samples to fill — never skipped, never crashes."""
    net, params = tiny_victim
    exp = tiny_exp(batch_size=8)
    trainer = T.PatchTrainer(exp, net=net, params=params,
                             log=lambda s: None)
    data = SyntheticData(8, exp.img_size, exp.max_labels)
    full = data.batch(8, 0)
    partial = tuple(a[:3] for a in data.batch(8, 1))  # 3 % 8 devices != 0
    stats = trainer.run_epoch([full, partial], 0)
    assert stats["num_batches"] == 2
    assert int(trainer.state.step) == 2
    assert np.isfinite(stats["loss"])


def test_gather_warp_method_trains(tiny_victim):
    """The exact grid_sample-parity warp is selectable for training."""
    net, params = tiny_victim
    exp = tiny_exp(warp_method="gather")
    step = T.make_train_step(net, exp)
    state = T.init_train_state(exp, jax.random.PRNGKey(0))
    data = SyntheticData(8, exp.img_size, exp.max_labels)
    imgs, labs = map(jnp.asarray, data.batch(8))
    state, aux = step(state, params, imgs, labs, jnp.float32(0.03))
    assert np.isfinite(float(aux["loss"]))


# ---------------------------------------------------------------------------
# device-resident store + epoch-scan path (the protocol-scale data path)
# ---------------------------------------------------------------------------

def test_epoch_plan_shapes_padding_determinism():
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.dataset import epoch_plan
    # 10 items, batch 4 -> 3 batches, final has 2 real + 2 tiled pads
    idx, w = epoch_plan(10, 4, epoch=0, seed=5)
    assert idx.shape == (3, 4) and w.shape == (3, 4)
    assert idx.dtype == np.int32 and w.dtype == np.float32
    assert w[:2].all() and (w[2] == [1, 1, 0, 0]).all()
    # pads tile the final batch's REAL rows (run_epoch's fill rule)
    assert idx[2, 2] == idx[2, 0] and idx[2, 3] == idx[2, 1]
    # every real slot covers the dataset exactly once
    real = np.sort(idx[w.astype(bool)])
    np.testing.assert_array_equal(real, np.arange(10))
    # per-(seed, epoch) determinism; different epochs reshuffle
    idx2, _ = epoch_plan(10, 4, epoch=0, seed=5)
    np.testing.assert_array_equal(idx, idx2)
    assert not np.array_equal(idx, epoch_plan(10, 4, epoch=1, seed=5)[0])
    # divisible n -> all weights 1
    _, w = epoch_plan(8, 4, epoch=0)
    assert w.all()
    # drop_last trims instead of padding
    idx, w = epoch_plan(10, 4, epoch=0, drop_last=True)
    assert idx.shape == (2, 4) and w.all()
    with pytest.raises(ValueError):
        epoch_plan(3, 4, epoch=0, drop_last=True)


def _file_dataset(tmp_path, n, img_size=64):
    from PIL import Image
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.dataset import DotaDataset
    img_dir, lab_dir = tmp_path / "img", tmp_path / "lab"
    img_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.default_rng(42)
    for i in range(n):
        Image.fromarray(
            (rng.random((img_size, img_size, 3)) * 255).astype(np.uint8)
        ).save(img_dir / f"t{i}.png")
        (lab_dir / f"t{i}.txt").write_text(
            f"{i % 15} 0.5 0.5 0.3 0.3\n" if i % 3 else "")
    return DotaDataset(str(img_dir), str(lab_dir), max_labels=8,
                       img_size=img_size)


@pytest.mark.slow
def test_store_epoch_matches_per_step_path(tmp_path, tiny_victim):
    """The epoch-scan program over a DeviceStore must walk the SAME
    trajectory as the per-step run_epoch path on the same batch
    content: same per-step RNG splits, same weighted padding of the
    partial final batch, uint8 store exact for PNG sources."""
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.dataset import (
        DeviceStore, epoch_plan)
    net, params = tiny_victim
    exp = tiny_exp(batch_size=4, max_labels=8)
    ds = _file_dataset(tmp_path, 10)
    store = DeviceStore(ds, num_workers=2)
    assert np.asarray(store.images).dtype == np.uint8
    assert store.n == 10

    # host copies for the per-step oracle
    items = [ds[i] for i in range(10)]
    imgs = np.stack([it[0] for it in items])
    labs = np.stack([it[1] for it in items])

    t_step = T.PatchTrainer(exp, net=net, params=params, seed=3,
                            log=lambda s: None)
    t_scan = T.PatchTrainer(exp, net=net, params=params, seed=3,
                            log=lambda s: None)
    np.testing.assert_array_equal(np.asarray(t_step.state.patch),
                                  np.asarray(t_scan.state.patch))

    for epoch in range(2):
        idx, w = epoch_plan(10, 4, epoch, seed=3)
        # feed run_epoch the same order, UNPADDED final batch (it pads
        # with the identical tile rule itself)
        batches = []
        for b in range(idx.shape[0]):
            rows = idx[b][w[b].astype(bool)]
            batches.append((imgs[rows], labs[rows]))
        s_step = t_step.run_epoch(batches, epoch)
        s_scan = t_scan.run_epoch_store(store, epoch)
        assert s_step["num_batches"] == s_scan["num_batches"] == 3
        np.testing.assert_allclose(s_step["loss"], s_scan["loss"],
                                   rtol=2e-5)
    np.testing.assert_allclose(np.asarray(t_step.state.patch),
                               np.asarray(t_scan.state.patch),
                               atol=5e-6)
    assert int(t_scan.state.step) == 6


@pytest.mark.slow
def test_store_train_resume(tmp_path, tiny_victim):
    """train_store + checkpoint/resume: a run killed mid-schedule and
    resumed lands on the same epoch count and a finite loss, and the
    resumed epoch replays the same (seed, epoch) plan."""
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.dataset import DeviceStore
    net, params = tiny_victim
    exp = tiny_exp(batch_size=4, max_labels=8, checkpoint_every=1)
    ds = _file_dataset(tmp_path, 8)
    store = DeviceStore(ds, num_workers=2)

    ck = str(tmp_path / "run")
    t1 = T.PatchTrainer(exp, net=net, params=params, seed=9,
                        checkpoint_dir=ck, log=lambda s: None)
    t1.train_store(store, epochs=2)            # epochs 0, 1 (ckpt @ 1)
    t2 = T.PatchTrainer(exp, net=net, params=params, seed=9,
                        checkpoint_dir=ck, log=lambda s: None)
    start = t2.restore_checkpoint() + 1
    assert start == 2
    np.testing.assert_array_equal(np.asarray(t1.state.patch),
                                  np.asarray(t2.state.patch))
    patch, hist = t2.train_store(store, epochs=1, start_epoch=start)
    assert hist[-1]["epoch"] == 2
    assert np.isfinite(hist[-1]["loss"])
    assert (patch >= 0).all() and (patch <= 1).all()
