"""Monte-Carlo DropBlock uncertainty: the reference's 1000 serial batch-1
forward passes (uncertainty_tests/Dropblock_Uncertainty.py:48-72) as one
jitted, chunk-vmapped device program.

Per-sample PRNG keys reproduce the semantics of forcing dropblock modules
into training mode per pass (Dropblock_Uncertainty.py:22-25,50): every
ensemble member draws fresh independent masks at every dropblock site.
Optional square-pad + resize before the loop matches
Dropblock_Uncertainty.py:52-61. Statistics are the per-pixel mean and
unbiased std of the masked segmentations.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from unet_research_tpu.models.unet import UNet
from unet_research_tpu.ops.image import resize_bilinear, square_pad
from unet_research_tpu.uncertainty.ensemble import streaming_ensemble_batched
from unet_research_tpu.models.unet import as_variables


class MCDropBlockEngine:
    """DropBlockEval-equivalent: build once per model/config, call per image.

    mode 'save'     -> (mean, std, first return_num member outputs)
    mode 'evaluate' -> mean used as the segmentation for metric scoring
                       (Dropblock_Uncertainty.py:69-72)
    """

    def __init__(
        self,
        model: UNet,
        num_iterations: int = 1000,
        return_num: int = 25,
        resize: int = -1,
        chunk: int = 25,
        mesh=None,
    ):
        """mesh: an optional ('data','model') jax Mesh — the chunk batch
        shards over 'data' so the MC ensemble scales across chips over ICI
        (the reference's serial loop has no multi-device story at all)."""
        self.model = model
        self.num_iterations = num_iterations
        self.return_num = min(return_num, num_iterations)
        self.resize = resize
        self.chunk = chunk
        self.mesh = mesh
        if mesh is not None:
            ndev = mesh.shape["data"]
            if chunk % ndev:
                raise ValueError(f"chunk {chunk} must divide over {ndev} devices")

        def run(params, im, gt, mask, key, drop_prob):
            if self.resize != -1:
                t = (self.resize, self.resize)
                im = resize_bilinear(square_pad(im), t)
                gt = resize_bilinear(square_pad(gt), t)
                mask = resize_bilinear(square_pad(mask), t)

            def batch(k, size: int):
                # one real batched forward per chunk: the dropblock kernel
                # derives independent per-sample mask streams from the batch
                # index, so a single chunk key covers `size` MC members
                xb = jnp.broadcast_to(im, (size,) + im.shape[1:])
                if self.mesh is not None and size % self.mesh.shape["data"] == 0:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    xb = jax.lax.with_sharding_constraint(
                        xb, NamedSharding(self.mesh, P("data"))
                    )
                seg = model.apply(
                    as_variables(params), xb,
                    drop_prob=drop_prob, rngs={"dropblock": k}
                )
                return seg * mask  # (size, H, W, 1)

            mean, std, saved = streaming_ensemble_batched(
                batch, key, self.num_iterations, self.chunk, self.return_num
            )
            return mean[None], std[None], saved[:, None], im, gt, mask

        # drop_prob is a per-run constant (Dropblock_Uncertainty.py:22-25
        # forces a fixed rate for the whole ensemble): compiling it static
        # constant-folds the Bernoulli comparator's gamma bits in the
        # bit-plane mask pipeline (ops/dropblock.py)
        self._run = jax.jit(run, static_argnums=(5,))

    def predict(self, params, im, gt, mask, key, drop_prob):
        """Returns (mean, std, saved, im, gt, mask); mean/std are (1,H,W,1),
        saved is (return_num, 1, H, W, 1) — the reference's tensor layout."""
        return self._run(params, im, gt, mask, key, drop_prob)
