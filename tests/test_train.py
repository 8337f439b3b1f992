"""Training-engine tests: schedule parity vs torch, checkpoints, policies,
and a tiny end-to-end fit."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from unet_research_tpu.data.dataset import ArrayDataset
from unet_research_tpu.models import DropBlockConfig, UNet, UNetConfig, canonical_config
from unet_research_tpu.train import (
    EarlyStopping,
    POLICIES,
    ReduceLROnPlateau,
    Trainer,
    TrainerConfig,
    make_size_plan,
)
from unet_research_tpu.train.checkpoint import (
    BestCheckpointKeeper,
    find_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from unet_research_tpu.train.policies import lf_policy


def test_plateau_matches_torch(rng):
    metrics = rng.random(40) * 0.5 + 0.1
    ours = ReduceLROnPlateau(0.05)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.05)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.1, patience=3, threshold=0.001,
        threshold_mode="rel", cooldown=0, min_lr=0, eps=1e-8,
    )
    for m in metrics:
        lr = ours.step(float(m))
        ref.step(float(m))
        assert lr == pytest.approx(opt.param_groups[0]["lr"], rel=1e-9)


def test_early_stopping():
    es = EarlyStopping(patience=3)
    seq = [1.0, 0.9, 0.8, 0.85, 0.81, 0.84]  # 3 non-improving after 0.8
    stops = [es.step(v) for v in seq]
    assert stops == [False, False, False, False, False, True]


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, params, {"epoch": 3, "val_loss": 0.5})
    template = {"a": {"kernel": np.zeros((2, 3), np.float32)}}
    restored, meta, _ = load_checkpoint(path, template)
    np.testing.assert_array_equal(restored["a"]["kernel"], params["a"]["kernel"])
    assert meta["epoch"] == 3


def test_best_keeper_reference_naming(tmp_path):
    keeper = BestCheckpointKeeper(str(tmp_path))
    params = {"w": np.ones(3, np.float32)}
    assert keeper.update(0, 0.5, params) is not None
    assert keeper.update(1, 0.6, params) is None  # no improvement -> no save
    p2 = keeper.update(2, 0.41, params)
    assert os.path.basename(p2) == "model-epoch=02-val_loss=0.41.ckpt"
    assert os.listdir(tmp_path) == ["model-epoch=02-val_loss=0.41.ckpt"]
    assert find_checkpoint(str(tmp_path)) == p2


def _fake_batch(h=40, w=32):
    rng = np.random.default_rng(0)
    im = rng.random((1, h, w, 1), dtype=np.float32)
    gt = (rng.random((1, h, w, 1)) > 0.5).astype(np.float32)
    mask = np.ones((1, h, w, 1), np.float32)
    return jnp.asarray(im), jnp.asarray(gt), jnp.asarray(mask)


def _fake_forward(x):
    # a stand-in "model": sigmoid of a local average, same spatial size
    return jax.nn.sigmoid(x - 0.5)


@pytest.mark.parametrize("kind,size", [("none", -1), ("uni", 128), ("uni", -1), ("rat", 128), ("rsz-rat", 128)])
def test_policy_shapes_mf(kind, size):
    im, gt, mask = _fake_batch()
    pol = POLICIES[kind]
    seg, gt2, mask2 = pol.train_io(_fake_forward, im, gt, mask, size)
    if kind == "none":
        assert seg.shape == im.shape
    else:
        # square-padded to 40x40, loss always back at full square size
        assert seg.shape == (1, 40, 40, 1)
        assert gt2.shape == (1, 40, 40, 1)
        assert mask2.shape == (1, 40, 40, 1)


def test_policy_uni_keeps_mask_unresized():
    # the UNI quirk: mask is never resized, so inside jit the mask used for
    # the loss is the exact square-padded original
    im, gt, mask = _fake_batch()
    captured = {}

    def fwd(x):
        captured["in_shape"] = x.shape
        return x

    seg, gt2, mask2 = POLICIES["uni"].train_io(fwd, im, gt, mask, 16)
    assert captured["in_shape"] == (1, 16, 16, 1)
    # mask comes back exactly square_pad(mask): binary, untouched by resize
    assert set(np.unique(np.asarray(mask2))) <= {0.0, 1.0}


def test_policy_shapes_lf():
    im, gt, mask = _fake_batch()
    for kind, train_shape, loss_hw in [("lft", 16, 16), ("hft", 16, 40), ("lft-up", 40, 40)]:
        pol = lf_policy(kind, 16)
        shapes = {}

        def fwd(x):
            shapes["in"] = x.shape
            return x

        seg, gt2, mask2 = pol.train_io(fwd, im, gt, mask)
        assert shapes["in"][1] == train_shape
        assert seg.shape[1] == loss_hw and gt2.shape[1] == loss_hw

    # HFT predicts at native res; LFT predicts at train_size
    seg, *_ = lf_policy("hft", 16).predict_io(_fake_forward, im, gt, mask)
    assert seg.shape == im.shape
    seg, *_ = lf_policy("lft", 16).predict_io(_fake_forward, im, gt, mask)
    assert seg.shape == (1, 16, 16, 1)


def test_size_plan_counts():
    rng = np.random.default_rng(0)
    plan = make_size_plan("uni", 14, 36, rng)
    assert len(plan) == 14 * 36
    # ceil(14/3)=5 of each resized size, 4 originals
    vals, counts = np.unique(plan, return_counts=True)
    d = dict(zip(vals.tolist(), (counts // 36).tolist()))
    assert d == {-1: 4, 128: 5, 256: 5}
    plan = make_size_plan("rat", 14, 1, rng)
    vals, counts = np.unique(plan, return_counts=True)
    d = dict(zip(vals.tolist(), counts.tolist()))
    assert d == {-1: 2, 128: 8, 256: 4}
    # plan repeats each original image's size num_aug times consecutively
    plan = make_size_plan("uni", 3, 4, rng)
    assert all(len(set(plan[i * 4 : (i + 1) * 4])) == 1 for i in range(3))


def _tiny_model(dropblock_kind="dependent"):
    cfg = canonical_config(filters=8)
    cfg = UNetConfig(
        **{
            **cfg.__dict__,
            "group_norm_groups": 4,
            "model_depth": 2,
            "dropblock": DropBlockConfig(
                kind=dropblock_kind, block_size=3, use_scheduler=True,
                start_drop_prob=0.0, max_drop_prob=0.1, nr_steps=10,
            ),
            "remat": True,
        }
    )
    return UNet(cfg)


def _tiny_dataset(n=6, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    ims = (rng.random((n, h, w, 1)) * 255).astype(np.uint8)
    gts = (rng.random((n, h, w, 1)) > 0.5).astype(np.uint8) * 255
    masks = np.full((n, h, w, 1), 255, np.uint8)
    return ArrayDataset(ims, gts, masks)


def test_fit_end_to_end(tmp_path):
    model = _tiny_model()
    tcfg = TrainerConfig(
        max_epochs=3, lr=0.01, auto_lr_find=False, seed=7, verbose=False
    )
    trainer = Trainer(model, POLICIES["none"], tcfg)
    state, history, keeper = trainer.fit(
        _tiny_dataset(), _tiny_dataset(3, seed=1), str(tmp_path / "model_info")
    )
    assert len(history["train_loss_epoch"]) == 3
    assert len(history["val_loss_epoch"]) == 3
    assert all(np.isfinite(v) for v in history["train_loss_epoch"])
    assert keeper.best_path and os.path.exists(keeper.best_path)
    assert int(state.step) == 3 * 6

    # loss should be sane for BCE-on-random data, and predict must work
    preds = list(trainer.predict(state.params, _tiny_dataset(2, seed=2)))
    assert len(preds) == 2
    idx, seg, im, gt, mask = preds[0]
    assert seg.shape == (1, 32, 32, 1)
    assert np.isfinite(seg).all()


def test_fit_resumes_from_checkpoint(tmp_path):
    model = _tiny_model(dropblock_kind=None)
    tcfg = TrainerConfig(max_epochs=1, lr=0.01, auto_lr_find=False, seed=3, verbose=False)
    trainer = Trainer(model, POLICIES["none"], tcfg)
    state, _, keeper = trainer.fit(
        _tiny_dataset(), _tiny_dataset(2, seed=1), str(tmp_path / "mi")
    )
    template = trainer.init_params(seed=0)
    params, meta, _ = load_checkpoint(keeper.best_path, template)
    # restored params produce identical validation loss
    v1 = trainer.validate(state.params, _tiny_dataset(2, seed=1))
    v2 = trainer.validate(params, _tiny_dataset(2, seed=1))
    assert v1 == pytest.approx(v2, rel=1e-6)


def test_fit_resume_continues(tmp_path):
    """Resume from a checkpoint restores params+momentum+epoch (SURVEY §5)."""
    model = _tiny_model(dropblock_kind=None)
    tcfg = TrainerConfig(max_epochs=2, lr=0.02, auto_lr_find=False, seed=5, verbose=False)
    trainer = Trainer(model, POLICIES["none"], tcfg)
    tds, vds = _tiny_dataset(), _tiny_dataset(2, seed=1)
    state, hist, keeper = trainer.fit(tds, vds, str(tmp_path / "a"))
    assert int(state.step) == 12

    tcfg2 = TrainerConfig(max_epochs=4, lr=0.02, auto_lr_find=False, seed=5, verbose=False)
    trainer2 = Trainer(model, POLICIES["none"], tcfg2)
    state2, hist2, _ = trainer2.fit(
        tds, vds, str(tmp_path / "b"), resume_from=keeper.best_path
    )
    # resumed run starts after the checkpoint's epoch and keeps stepping
    assert len(hist2["train_loss_epoch"]) <= 3
    assert int(state2.step) > int(state.step)


def test_lr_find_indexed_matches_batch_path():
    """The device-resident (indexed) lr_find probe must give the same
    suggestion as the host-batch path: same shuffle-rng stream, same
    uint8->f32/255 math, same step sequence."""
    from unet_research_tpu.train.loop import lr_find

    model = _tiny_model(dropblock_kind=None)
    tcfg = TrainerConfig(lr=0.01, auto_lr_find=False, seed=13, verbose=False)
    trainer = Trainer(model, POLICIES["none"], tcfg)
    params = trainer.init_params(seed=0)
    key = jax.random.PRNGKey(13)
    lr_indexed = lr_find(trainer, params, _tiny_dataset(), None, key, 13,
                         num_training=16)
    # force the host-batch path: lr_find routes on trainer.mesh, which only
    # gates the probe's data feeding (the jitted steps were built mesh-free)
    trainer.mesh = object()
    lr_batch = lr_find(trainer, params, _tiny_dataset(), None, key, 13,
                       num_training=16)
    trainer.mesh = None
    assert lr_indexed == pytest.approx(lr_batch, rel=1e-6)


def test_scan_epochs_matches_per_step(tmp_path):
    """The one-dispatch-per-epoch lax.scan path must reproduce the per-step
    loop: same shuffle-rng consumption, same per-step key folds, same
    plateau/early-stop inputs -> near-identical training trajectory."""
    def run(scan):
        model = _tiny_model()
        tcfg = TrainerConfig(
            max_epochs=3, lr=0.01, auto_lr_find=False, seed=11,
            verbose=False, scan_epochs=scan,
        )
        trainer = Trainer(model, POLICIES["none"], tcfg)
        return trainer.fit(
            _tiny_dataset(), _tiny_dataset(3, seed=1),
            str(tmp_path / f"mi_{scan}"),
        )

    st_a, hist_a, _ = run(True)
    st_b, hist_b, _ = run(False)
    # scan and per-step compile separately; fusion differences drift at
    # float epsilon and SGD momentum compounds it over steps
    np.testing.assert_allclose(
        hist_a["train_loss_epoch"], hist_b["train_loss_epoch"], rtol=2e-3)
    np.testing.assert_allclose(
        hist_a["val_loss_epoch"], hist_b["val_loss_epoch"], rtol=2e-3)
    la = jax.tree_util.tree_leaves(st_a.params)
    lb = jax.tree_util.tree_leaves(st_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-3)
    assert int(st_a.step) == int(st_b.step)


def test_fit_batchnorm_end_to_end(tmp_path):
    """norm='batch' through the full trainer: batch stats update during
    training (mutable collection through the scan path), ride the checkpoint
    as a variables bundle, and drive eval (use_running_average)."""
    cfg = canonical_config(
        filters=8, model_depth=2, norm="batch",
        dropblock=DropBlockConfig(kind="dependent", block_size=3,
                                  use_scheduler=False, drop_prob=0.05),
    )
    model = UNet(cfg)
    tcfg = TrainerConfig(max_epochs=2, lr=0.01, auto_lr_find=False, seed=9,
                         verbose=False)
    trainer = Trainer(model, POLICIES["none"], tcfg)

    init_bundle = trainer.init_params(seed=9)
    assert "batch_stats" in init_bundle  # init returns the bundle

    state, history, keeper = trainer.fit(
        _tiny_dataset(), _tiny_dataset(2, seed=1), str(tmp_path / "mi")
    )
    assert all(np.isfinite(v) for v in history["train_loss_epoch"])

    # running stats moved away from the (0, 1) init
    means = [np.asarray(v) for k, v in
             jax.tree_util.tree_leaves_with_path(state.batch_stats)
             if "mean" in jax.tree_util.keystr(k)]
    assert any(np.abs(m).max() > 1e-4 for m in means)

    # checkpoint stores the bundle: the restored params + running stats must
    # reproduce the recorded best val loss exactly (stale or missing
    # batch_stats would shift it)
    template = trainer.init_params(seed=0)
    bundle, _, _ = load_checkpoint(keeper.best_path, template)
    assert "batch_stats" in bundle
    v2 = trainer.validate(bundle, _tiny_dataset(2, seed=1))
    assert v2 == pytest.approx(keeper.best_metric, rel=1e-6)

    # eval normalizes with running stats, not batch stats: a constant input
    # still yields a non-degenerate (finite, in-[0,1]) prediction
    preds = list(trainer.predict(bundle, _tiny_dataset(2, seed=2)))
    seg = preds[0][1]
    assert np.isfinite(seg).all() and seg.min() >= 0.0 and seg.max() <= 1.0


def test_batchnorm_torch_semantics(rng):
    """One train-mode forward of a single site vs torch BatchNorm2d: batch
    normalization and the running-stat update rule (momentum 0.1) agree."""
    cfg = canonical_config(filters=8, model_depth=2, norm="batch",
                           dropblock=DropBlockConfig(kind=None))
    model = UNet(cfg)
    x = rng.standard_normal((4, 16, 16, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))

    _, upd = model.apply(variables, jnp.asarray(x), train=True,
                         mutable=["batch_stats"])
    new_stats = upd["batch_stats"]

    # reproduce the first conv + BN site in torch
    k = np.asarray(variables["params"]["down0"]["conv0"]["kernel"])
    conv = torch.nn.Conv2d(1, 8, 3, padding=1, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.transpose(k, (3, 2, 0, 1))))
    bn = torch.nn.BatchNorm2d(8)
    bn.train()
    with torch.no_grad():
        bn(conv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))))
    got_mean = np.asarray(new_stats["down0"]["norm0"]["mean"])
    got_var = np.asarray(new_stats["down0"]["norm0"]["var"])
    np.testing.assert_allclose(got_mean, bn.running_mean.numpy(),
                               rtol=1e-4, atol=1e-5)
    # flax updates running_var with the biased batch variance; torch with
    # unbiased (factor n/(n-1), n = N*H*W = 1024) — tolerance covers it
    np.testing.assert_allclose(got_var, bn.running_var.numpy(),
                               rtol=3e-3, atol=1e-5)
