"""The training engine: jitted steps + host-side epoch control.

Replaces the reference's PyTorch-Lightning assembly (Trainer + callbacks +
LightningModule overrides, base_model_tests/training.py:198-231) with a
functional JAX loop:

- one jitted train step (forward via the active resize policy, masked
  rescaled BCE, SGD+momentum update) — the LR, dropblock step and PRNG fold
  all thread through as traced scalars so plateau decay / the linear
  dropblock ramp never recompile;
- host-side per-epoch control: ReduceLROnPlateau, EarlyStopping,
  best-checkpoint keeping, the PL-parity logged-metrics dict (including the
  reference's `if batch_idx % 10:` train-loss logging gate,
  utils_training.py:36);
- an LR finder reproducing PL's trainer.tune(auto_lr_find=True) exponential
  sweep + steepest-gradient suggestion (training.py:217-220).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from unet_research_tpu.models.unet import UNet
from unet_research_tpu.ops.dropblock import linear_drop_prob
from unet_research_tpu.ops.losses import masked_rescaled_bce
from unet_research_tpu.train.checkpoint import BestCheckpointKeeper
from unet_research_tpu.train.policies import ResizePolicy
from unet_research_tpu.train.schedule import EarlyStopping, ReduceLROnPlateau
from unet_research_tpu.train.state import TrainState, create_train_state
from unet_research_tpu.data.dataset import ArrayDataset
from unet_research_tpu.data.loading import batch_iterator


@dataclasses.dataclass
class TrainerConfig:
    max_epochs: int = 50
    lr: float = 1e-3
    momentum: float = 0.99
    clip_norm: Optional[float] = None  # --gradient_clip_val
    auto_lr_find: bool = True
    early_stop_patience: int = 10
    check_val_every_n_epoch: int = 1
    train_batch: int = 1
    val_batch: int = 1
    seed: int = -1
    log_gate: int = 10  # reference logs train loss when batch_idx % 10 != 0
    verbose: bool = True
    # aux subsystems (SURVEY.md §5): --profiler / --detect_anomaly analogues
    profiler: Optional[str] = None  # 'simple' | 'trace'
    detect_anomaly: bool = False  # per-step finite check (forces host sync)
    # dispatch a whole epoch as ONE lax.scan program instead of one RPC per
    # step: the axon tunnel costs ~40 ms per dispatch, which dominates
    # small-resolution epochs (a 128^2 LF epoch is ~60 s per-step vs ~7 s
    # scanned). Identical step math; auto-falls-back for size plans (MF),
    # batch>1, meshes, and detect_anomaly.
    scan_epochs: bool = True


class Trainer:
    """Drives one model + one resize policy end to end.

    With `mesh`, the jitted steps carry data-parallel sharding constraints:
    batches shard over the mesh's 'data' axis, params/optimizer state
    replicate, and XLA inserts the gradient psum (the reference's latent
    DDP path, SURVEY.md §2.8, done the TPU way).
    """

    def __init__(self, model: UNet, policy: ResizePolicy, cfg: TrainerConfig, mesh=None):
        self.model = model
        self.policy = policy
        self.cfg = cfg
        self.mesh = mesh
        db = model.cfg.dropblock
        self._has_dropblock = db.kind is not None
        # norm='batch' threads the running stats ('batch_stats' collection)
        # through the steps: train mode normalizes with batch stats and
        # updates the running ones (mutable), eval reads them
        self._has_batch_stats = model.cfg.norm == "batch"

        def forward_eval(params, batch_stats, im):
            variables = {"params": params}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            return model.apply(variables, im)

        def train_step(state: TrainState, im, gt, mask, lr, base_key, size: int):
            if self._has_dropblock:
                if db.use_scheduler:
                    dp = linear_drop_prob(
                        state.step, db.start_drop_prob, db.max_drop_prob, db.nr_steps
                    )
                else:
                    dp = jnp.asarray(db.drop_prob, jnp.float32)
                key = jax.random.fold_in(base_key, state.step)

            def loss_fn(params):
                def fwd(x):
                    variables = {"params": params}
                    kwargs = {}
                    if self._has_dropblock:
                        kwargs = dict(drop_prob=dp,
                                      rngs={"dropblock": key})
                    if self._has_batch_stats:
                        variables["batch_stats"] = state.batch_stats
                        seg, upd = model.apply(
                            variables, x, train=True,
                            mutable=["batch_stats"], **kwargs
                        )
                        fwd.new_stats = upd["batch_stats"]
                        return seg
                    return model.apply(variables, x, **kwargs)

                fwd.new_stats = None
                seg, gt2, mask2 = self.policy.train_io(fwd, im, gt, mask, size)
                return masked_rescaled_bce(seg, gt2, mask2), fwd.new_stats

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            new_state = state.apply_gradients(grads, lr)
            if new_stats is not None:
                new_state = new_state.replace(batch_stats=new_stats)
            return new_state, loss

        def eval_step(params, batch_stats, im, gt, mask):
            seg, gt2, mask2 = self.policy.val_io(
                lambda x: forward_eval(params, batch_stats, x), im, gt, mask
            )
            return masked_rescaled_bce(seg, gt2, mask2)

        def predict_step(params, batch_stats, im, gt, mask):
            return self.policy.predict_io(
                lambda x: forward_eval(params, batch_stats, x), im, gt, mask
            )

        def train_step_indexed(state: TrainState, ims, gts, masks, oi,
                               lr, base_key, size: int):
            """train_step reading batch `oi` from the device-resident uint8
            dataset (per-step fallback paths — MF size plans — still avoid
            re-shipping data over the tunnel every step)."""
            im = (ims[oi].astype(jnp.float32) / 255.0)[None]
            gt = (gts[oi].astype(jnp.float32) / 255.0)[None]
            mask = (masks[oi].astype(jnp.float32) / 255.0)[None]
            return train_step(state, im, gt, mask, lr, base_key, size)

        def train_epoch_scan(state: TrainState, ims, gts, masks, order,
                             lr, base_key):
            """All K steps of one epoch as a single device program over the
            DEVICE-RESIDENT dataset.

            ims/gts/masks: (N, H, W, C) uint8 — uploaded once per fit (the
            remote-tunnel host->device link is the bottleneck: re-shipping
            the f32 dataset cost ~30-50 s per epoch). order: (K,) int32
            shuffled indices. The uint8->f32/255 conversion matches
            ArrayDataset.__getitem__ exactly. Returns (state, (K,) losses) —
            identical math to K calls of train_step at size=-1."""

            def body(st, oi):
                im = (ims[oi].astype(jnp.float32) / 255.0)[None]
                gt = (gts[oi].astype(jnp.float32) / 255.0)[None]
                mask = (masks[oi].astype(jnp.float32) / 255.0)[None]
                st2, loss = train_step(st, im, gt, mask, lr, base_key, -1)
                return st2, loss

            return jax.lax.scan(body, state, order)

        if mesh is not None:
            from unet_research_tpu.parallel.mesh import data_sharding, replicated

            dp = data_sharding(mesh)
            rep = replicated(mesh)
            self._train_step = jax.jit(
                train_step,
                static_argnames=("size",),
                in_shardings=(rep, dp, dp, dp, rep, rep),
                out_shardings=(rep, rep),
            )
            self._eval_step = jax.jit(
                eval_step, in_shardings=(rep, rep, dp, dp, dp), out_shardings=rep
            )
            self._predict_step = jax.jit(
                predict_step, in_shardings=(rep, rep, dp, dp, dp), out_shardings=dp
            )
        else:
            self._train_step = jax.jit(train_step, static_argnames=("size",))
            self._eval_step = jax.jit(eval_step)
            self._predict_step = jax.jit(predict_step)
            self._train_epoch = jax.jit(train_epoch_scan)
            self._train_step_indexed = jax.jit(
                train_step_indexed, static_argnames=("size",)
            )

    # ------------------------------------------------------------------
    def init_params(self, init_channels: Optional[int] = None, seed: int = 0):
        """Bare param tree for GroupNorm/no-norm models; for norm='batch'
        the full variables bundle ({'params', 'batch_stats'}) — every
        downstream surface (create_state, engines, checkpoints) accepts
        either via models.unet.as_variables."""
        c = init_channels or self.model.cfg.init_channels
        dummy = jnp.zeros((1, 32, 32, c), jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(seed), dummy)
        if self._has_batch_stats:
            return dict(variables)
        return variables["params"]

    def create_state(self, params, lr: Optional[float] = None) -> TrainState:
        from unet_research_tpu.models.unet import split_variables

        p, bs = split_variables(params)
        return create_train_state(
            p, lr or self.cfg.lr, self.cfg.momentum, self.cfg.clip_norm,
            batch_stats=bs,
        )

    # ------------------------------------------------------------------
    def fit(
        self,
        train_ds: ArrayDataset,
        val_ds: ArrayDataset,
        model_info_dir: str,
        size_plan: Optional[np.ndarray] = None,
        params=None,
        ckpt_meta: Optional[dict] = None,
        resume_from: Optional[str] = None,
    ):
        """Train with early stopping + plateau LR + best-ckpt keeping.

        resume_from: a checkpoint written by this trainer (with optimizer
        state) — training continues from its epoch with its params, momentum
        and LR (the checkpoint/resume subsystem, SURVEY.md §5).

        Returns (final_state, history, keeper). `history` mirrors PL's
        logged-metrics: per-epoch lists 'train_loss_epoch' /
        'val_loss_epoch' / 'lr'.
        """
        cfg = self.cfg
        seed = cfg.seed if cfg.seed != -1 else int(time.time()) % (2**31)
        np_rng = np.random.default_rng(seed)
        base_key = jax.random.PRNGKey(seed)

        start_epoch = 0
        resume_state = None
        resume_meta = {}
        if resume_from is not None:
            from unet_research_tpu.train.checkpoint import load_checkpoint

            from unet_research_tpu.models.unet import split_variables

            template = self.init_params(seed=seed)
            tpl_state = self.create_state(template)
            r_params, resume_meta, r_opt = load_checkpoint(
                resume_from, template, tpl_state.opt_state
            )
            lr = float(resume_meta.get("lr", cfg.lr))
            r_p, r_bs = split_variables(r_params)
            resume_state = tpl_state.replace(
                params=r_p,
                batch_stats=r_bs,
                opt_state=r_opt if r_opt is not None else tpl_state.opt_state,
                step=jnp.asarray(int(resume_meta.get("step", 0)), jnp.int32),
            )
            start_epoch = int(resume_meta.get("epoch", -1)) + 1
            params = r_params

        if params is None:
            params = self.init_params(seed=seed)

        if resume_state is not None:
            state = resume_state
        else:
            lr = cfg.lr
            if cfg.auto_lr_find:
                lr = lr_find(self, params, train_ds, size_plan, base_key, seed)
                if cfg.verbose:
                    print(f"LR finder suggestion: {lr:.3e}")
            state = self.create_state(params, lr)
        plateau = ReduceLROnPlateau(lr)
        early = EarlyStopping(patience=cfg.early_stop_patience)
        keeper = BestCheckpointKeeper(model_info_dir)
        history = {"train_loss_epoch": [], "val_loss_epoch": [], "lr": []}

        if cfg.profiler == "trace":
            import os

            trace_dir = os.path.join(model_info_dir, "..", "profile")
            jax.profiler.start_trace(trace_dir)

        t_fit = time.time()
        shuffle = not self.policy.uses_size_plan  # MF plans index by batch_idx
        use_scan = (
            cfg.scan_epochs
            and size_plan is None
            and cfg.train_batch == 1
            and not cfg.detect_anomaly
            and self.mesh is None
        )
        dev_data = None
        for epoch in range(start_epoch, cfg.max_epochs):
            t0 = time.time()
            if use_scan:
                # device-resident uint8 dataset (one-time upload) + ONE
                # dispatch per epoch; only the (K,) shuffle order ships
                if dev_data is None:
                    dev_data = jax.device_put(
                        (train_ds.images, train_ds.targets, train_ds.masks)
                    )
                order = np.arange(len(train_ds))
                if shuffle:
                    np_rng.shuffle(order)
                state, losses = self._train_epoch(
                    state, *dev_data, jnp.asarray(order, jnp.int32),
                    lr, base_key,
                )
                losses = jax.device_get(losses)
                step_losses = [
                    losses[i] for i in range(len(order)) if i % cfg.log_gate
                ]
            elif cfg.train_batch == 1 and self.mesh is None:
                # per-step (MF size plans / --detect_anomaly) but still
                # against the device-resident dataset: one tiny index ships
                # per step instead of the batch
                if dev_data is None:
                    dev_data = jax.device_put(
                        (train_ds.images, train_ds.targets, train_ds.masks)
                    )
                order = np.arange(len(train_ds))
                if shuffle:
                    np_rng.shuffle(order)
                step_losses = []
                for batch_idx, oi in enumerate(order):
                    size = int(size_plan[batch_idx]) if size_plan is not None else -1
                    state, loss = self._train_step_indexed(
                        state, *dev_data, int(oi), lr, base_key, size
                    )
                    if cfg.detect_anomaly and not np.isfinite(float(loss)):
                        raise FloatingPointError(
                            f"non-finite train loss at epoch {epoch} batch {batch_idx}"
                            " (--detect_anomaly)"
                        )
                    if batch_idx % cfg.log_gate:  # reference gate quirk
                        step_losses.append(loss)
            else:
                step_losses = []
                for batch_idx, (im, gt, mask) in enumerate(
                    batch_iterator(train_ds, cfg.train_batch, shuffle, np_rng)
                ):
                    size = int(size_plan[batch_idx]) if size_plan is not None else -1
                    state, loss = self._train_step(state, im, gt, mask, lr, base_key, size)
                    if cfg.detect_anomaly and not np.isfinite(float(loss)):
                        raise FloatingPointError(
                            f"non-finite train loss at epoch {epoch} batch {batch_idx}"
                            " (--detect_anomaly)"
                        )
                    if batch_idx % cfg.log_gate:  # reference gate quirk
                        step_losses.append(loss)

            train_loss = float(np.mean(jax.device_get(step_losses))) if step_losses else float("nan")
            history["train_loss_epoch"].append(train_loss)
            history["lr"].append(lr)

            if (epoch + 1) % cfg.check_val_every_n_epoch == 0:
                val_losses = [
                    self._eval_step(state.params, state.batch_stats, im, gt, mask)
                    for im, gt, mask in batch_iterator(val_ds, cfg.val_batch, False)
                ]
                val_loss = float(np.mean(jax.device_get(val_losses)))
                history["val_loss_epoch"].append(val_loss)

                ckpt_params = state.params
                if self._has_batch_stats:
                    # the variables bundle: eval surfaces restore running
                    # stats alongside the weights
                    ckpt_params = {"params": state.params,
                                   "batch_stats": state.batch_stats}
                keeper.update(
                    epoch, val_loss, ckpt_params,
                    meta={**(ckpt_meta or {}), "lr": lr, "step": int(state.step)},
                    opt_state=state.opt_state,
                )
                lr = plateau.step(val_loss)
                stop = early.step(val_loss)
                if cfg.verbose:
                    print(
                        f"epoch {epoch:3d} train_loss {train_loss:.4f} "
                        f"val_loss {val_loss:.4f} lr {lr:.2e} "
                        f"({time.time()-t0:.1f}s)"
                    )
                if stop:
                    if cfg.verbose:
                        print(f"early stopping at epoch {epoch}")
                    break
        if cfg.profiler == "trace":
            jax.profiler.stop_trace()
        if cfg.profiler == "simple" and cfg.verbose:
            n_epochs = len(history["train_loss_epoch"])
            total = time.time() - t_fit
            print(
                f"[profiler simple] {n_epochs} epochs in {total:.1f}s "
                f"({total / max(1, n_epochs):.1f}s/epoch)"
            )
        return state, history, keeper

    # ------------------------------------------------------------------
    def validate(self, params, val_ds: ArrayDataset) -> float:
        from unet_research_tpu.models.unet import split_variables

        p, bs = split_variables(params)
        losses = [
            self._eval_step(p, bs, im, gt, mask)
            for im, gt, mask in batch_iterator(val_ds, 1, False)
        ]
        return float(np.mean(jax.device_get(losses)))

    def predict(self, params, ds: ArrayDataset):
        """Batch-1 predictions like trainer.predict over a re-wrapped loader
        (utils_metrics.py:52-56,87-90). Yields (idx, seg, im, gt, mask) as
        numpy NHWC. `params` may be a bare tree or a variables bundle."""
        from unet_research_tpu.models.unet import split_variables

        p, bs = split_variables(params)
        for i, (im, gt, mask) in enumerate(batch_iterator(ds, 1, False)):
            seg, im2, gt2, mask2 = self._predict_step(p, bs, im, gt, mask)
            yield i, *jax.device_get((seg, im2, gt2, mask2))


def lr_find(
    trainer: Trainer,
    params,
    train_ds: ArrayDataset,
    size_plan: Optional[np.ndarray],
    base_key,
    seed: int,
    num_training: int = 100,
    min_lr: float = 1e-8,
    max_lr: float = 1.0,
    beta: float = 0.98,
) -> float:
    """PL 1.5 lr_find: exponential LR sweep over `num_training` steps,
    EWMA-smoothed losses, divergence stop at 4x best, steepest-negative-
    gradient suggestion skipping the first 10 and last point. The probe
    state is discarded (PL restores the initial weights)."""
    lrs = min_lr * (max_lr / min_lr) ** (np.arange(num_training) / (num_training - 1))
    state = trainer.create_state(params, float(lrs[0]))
    np_rng = np.random.default_rng(seed)
    losses = []
    avg, best = 0.0, float("inf")
    i = 0
    shuffle = not trainer.policy.uses_size_plan
    # device-resident probe: upload the uint8 dataset once and ship one int
    # index per step instead of a full batch — the same trick fit() uses
    # (the ~100 probe steps otherwise pay ~40 ms RPC + batch transfer each
    # on the tunnel). uint8->f32/255 on device is the exact __getitem__ math.
    indexed = trainer.cfg.train_batch == 1 and trainer.mesh is None
    if indexed:
        dev_data = jax.device_put(
            (train_ds.images, train_ds.targets, train_ds.masks)
        )
    while i < num_training:
        if indexed:
            order = np.arange(len(train_ds))
            if shuffle:
                np_rng.shuffle(order)
            batches = enumerate(order)
        else:
            batches = enumerate(
                batch_iterator(train_ds, trainer.cfg.train_batch, shuffle, np_rng)
            )
        for batch_idx, item in batches:
            if i >= num_training:
                break
            size = int(size_plan[batch_idx]) if size_plan is not None else -1
            if indexed:
                state, loss = trainer._train_step_indexed(
                    state, *dev_data, int(item), float(lrs[i]), base_key, size
                )
            else:
                im, gt, mask = item
                state, loss = trainer._train_step(
                    state, im, gt, mask, float(lrs[i]), base_key, size
                )
            loss = float(loss)
            if not np.isfinite(loss):
                i = num_training
                break
            avg = beta * avg + (1 - beta) * loss
            smoothed = avg / (1 - beta ** (len(losses) + 1))
            if losses and smoothed > 4 * best:
                i = num_training
                break
            best = min(best, smoothed)
            losses.append(smoothed)
            i += 1

    skip_begin, skip_end = 10, 1
    if len(losses) < skip_begin + skip_end + 2:
        return float(trainer.cfg.lr)
    seg_losses = np.array(losses[skip_begin:-skip_end])
    idx = int(np.gradient(seg_losses).argmin()) + skip_begin
    return float(lrs[idx])
