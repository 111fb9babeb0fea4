"""Linear probe / fine-tune evaluation on ImageNet or iNaturalist.

Equivalent of the reference's linear_clf.py (:79-329): attach a
``num_classes`` head to the pretrained image tower, train with CE under
the downstream config's optimizer/schedule, report Top-1.  ``--frozen``
keeps the backbone in eval mode with stopped gradients (linear probe,
reference :177-185); otherwise the whole tower fine-tunes.

SPMD: batch sharded over the data mesh, grads psum'd, identical to the
pretraining engine.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from clip_lite_tpu.config import Config
from clip_lite_tpu.engine import TrainState
from clip_lite_tpu.factories import (
    DownstreamDatasetFactory,
    LRSchedulerFactory,
    OptimizerFactory,
    VisualBackboneFactory,
)
from clip_lite_tpu.data.pipeline import DataLoader, infinite_batches
from clip_lite_tpu.ops.layers import Linear
from clip_lite_tpu.parallel import create_mesh, shard_batch
from clip_lite_tpu.parallel.collectives import axis_is_bound, pmean_if_bound
from clip_lite_tpu.utils.checkpointing import (
    CheckpointManager,
    load_model_variables,
)
from clip_lite_tpu.utils.common import (
    apply_platform_args,
    common_parser,
    common_setup,
)
from clip_lite_tpu.utils.metrics import TopkAccuracy
from clip_lite_tpu.utils.timers import Timer

parser = common_parser(description="Linear probe / fine-tune eval.")
parser.add_argument("--pretrain-config", required=True)
parser.add_argument("--pretrain-config-override", nargs="*", default=[])
parser.add_argument("--checkpoint-path", default=None,
                    help="Pretrained checkpoint (None = random init probe).")
parser.add_argument("--frozen", action="store_true",
                    help="Linear probe: freeze the backbone.")
parser.add_argument("--log-every", type=int, default=100)
parser.add_argument("--checkpoint-every", type=int, default=2000)

NUM_CLASSES = {"imagenet": 1000, "imagenet2012": 1000, "inaturalist": 8142}


class LinearClassifier(nn.Module):
    """Backbone + classification head (the reference re-attaches fc to the
    chopped tower, linear_clf.py:153-170)."""

    backbone: nn.Module
    num_classes: int
    frozen: bool = False

    @nn.compact
    def __call__(self, image, train: bool = True):
        if self.frozen:
            feats = self.backbone(image, train=False)
            feats = jax.lax.stop_gradient(feats)
        else:
            feats = self.backbone(image, train=train)
        return Linear(self.num_classes, name="fc")(feats)


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()


def main(_A) -> None:
    apply_platform_args(_A)
    _C_down = Config(_A.config, list(_A.config_override))
    _C = Config(_A.pretrain_config, list(_A.pretrain_config_override))
    logger = common_setup(_C_down, _A, job_type="linear_clf")

    import os

    mesh = create_mesh(_C_down.PARALLEL.NUM_DEVICES)
    data_axis = _C_down.PARALLEL.DATA_AXIS
    background = mesh.devices.flat[0].platform != "cpu"

    # Datasets + loaders.
    train_ds = DownstreamDatasetFactory.from_config(_C_down, split="train")
    val_ds = DownstreamDatasetFactory.from_config(_C_down, split="val")

    # Head width: the dataset's own class map when it has one (real
    # ImageNet still gives 1000), else the reference's path-keyed table
    # (reference: linear_clf.py:91-106).
    key = os.path.basename(os.path.normpath(_C_down.DATA.ROOT))
    if getattr(train_ds, "class_to_idx", None):
        num_classes = len(train_ds.class_to_idx)
    else:
        num_classes = NUM_CLASSES.get(key, 1000)
    put = lambda b: shard_batch(b, mesh, data_axis)
    train_loader = DataLoader(train_ds, _C_down.OPTIM.BATCH_SIZE,
                              shuffle=True, num_workers=_A.cpu_workers,
                              seed=_C_down.RANDOM_SEED, device_put_fn=put,
                              background=background)
    val_loader = DataLoader(val_ds, _C_down.OPTIM.BATCH_SIZE, shuffle=False,
                            drop_last=False, num_workers=_A.cpu_workers,
                            background=background)

    # Model: pretrained tower + fresh head.
    backbone = VisualBackboneFactory.from_config(_C)
    model = LinearClassifier(backbone=backbone, num_classes=num_classes,
                             frozen=_A.frozen)
    sample = next(iter(DataLoader(train_ds, 2, shuffle=False,
                                  background=False)))
    variables = model.init(jax.random.PRNGKey(_C_down.RANDOM_SEED),
                           jnp.asarray(sample["image"]), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if _A.checkpoint_path:
        pretrained = load_model_variables(_A.checkpoint_path)
        # The pretraining checkpoint nests the tower under image_encoder.
        # LinearClassifier.backbone is the ImageEncoder module, whose params
        # live under "image_encoder" in the pretraining checkpoint.
        params = dict(params)
        params["backbone"] = pretrained["params"]["image_encoder"]
        batch_stats = dict(batch_stats)
        batch_stats["backbone"] = pretrained["batch_stats"]["image_encoder"]
        logger.info("Loaded pretrained tower from %s", _A.checkpoint_path)

    tx = OptimizerFactory.from_config(_C_down)
    state = TrainState(step=jnp.zeros([], jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params))

    def train_step(state, batch):
        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"])
            return cross_entropy(logits, batch["label"]), mutated
        (loss, mutated), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # AD already psums grads of replicated params under check_vma
        # (see engine.make_train_step); divide for the mean.
        if axis_is_bound(data_axis):
            n = jax.lax.axis_size(data_axis)
            grads = jax.tree.map(lambda g: g / n, grads)
        loss = pmean_if_bound(loss, data_axis)
        new_stats = pmean_if_bound(mutated.get("batch_stats", {}), data_axis)
        from clip_lite_tpu.optim.fused import FusedOptimizer

        if isinstance(tx, FusedOptimizer):  # OPTIM.FUSED (the default)
            new_params, opt_state, _ = tx.apply(
                grads, state.opt_state, state.params)
        else:
            updates, opt_state = tx.update(
                grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda a, b: a + b,
                                      state.params, updates)
        return state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=opt_state), loss

    def eval_step(state, batch):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=False)
        return logits

    from jax.sharding import PartitionSpec as P

    train_fn = jax.jit(jax.shard_map(
        train_step, mesh=mesh, in_specs=(P(), P(data_axis)),
        out_specs=(P(), P())))
    # Eval runs un-sharded with a FIXED batch (tails padded) — one compile.
    eval_fn = jax.jit(eval_step)
    eval_bs = _C_down.OPTIM.BATCH_SIZE

    def eval_logits(state, batch):
        img = np.asarray(batch["image"])
        n = img.shape[0]
        if n < eval_bs:
            img = np.concatenate(
                [img, np.repeat(img[-1:], eval_bs - n, axis=0)], axis=0)
        logits = np.asarray(eval_fn(state, {"image": jnp.asarray(img)}))
        return logits[:n]

    manager = CheckpointManager(
        (_A.checkpoints_dir or _A.serialization_dir) + "/linear_clf",
        state=state)
    timer = Timer(total_iterations=_C_down.OPTIM.NUM_ITERATIONS)
    batches = infinite_batches(train_loader)
    best_top1 = 0.0
    for iteration in range(1, _C_down.OPTIM.NUM_ITERATIONS + 1):
        timer.tic()
        state, loss = train_fn(state, next(batches))
        timer.toc()
        if iteration % _A.log_every == 0:
            logger.info("%s | CE %.4f", timer.stats, float(loss))
        if iteration % _A.checkpoint_every == 0 or \
                iteration == _C_down.OPTIM.NUM_ITERATIONS:
            acc = TopkAccuracy(top_k=1)
            for vb in val_loader:
                logits = eval_logits(state, vb)
                acc(logits, np.asarray(vb["label"]))
            top1 = acc.get_metric()
            best_top1 = max(best_top1, top1)
            logger.info("VAL @ %d: top-1 %.2f%% (best %.2f%%)",
                        iteration, top1, best_top1)
            manager.checkpointables["state"] = state
            manager.step(iteration, metric=top1, mode="max")

    print(json.dumps({"top1": best_top1}))
    return best_top1


if __name__ == "__main__":
    main(parser.parse_args())
