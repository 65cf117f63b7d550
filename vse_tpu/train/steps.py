"""Jitted train steps for the OCR models, sharded over a (data, model) mesh.

One combined step trains both models (DB det on map targets, CRNN rec on CTC
targets): dp shards the batch axis over `data`, tp shards the wide projection
axes over `model` (rules in vse_tpu/parallel/sharding.py); GSPMD inserts the
psum/all-gather collectives.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vse_tpu.models.crnn import CRNNRecognizer
from vse_tpu.models.db_detector import DBDetector
from vse_tpu.parallel.sharding import data_sharding, param_shardings, replicated
from vse_tpu.train.losses import ctc_rec_loss, db_loss


@flax.struct.dataclass
class TrainState:
    det_params: Any
    rec_params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def make_models(vocab_size: int, det_variant="mobile", rec_variant="mobile"):
    det = DBDetector(variant=det_variant, train_outputs=True)
    rec = CRNNRecognizer(vocab_size=vocab_size, variant=rec_variant)
    return det, rec


def init_state(
    det: DBDetector,
    rec: CRNNRecognizer,
    det_shape=(1, 64, 64, 3),
    rec_shape=(1, 48, 320, 3),
    lr: float = 1e-3,
    seed: int = 0,
) -> Tuple[TrainState, optax.GradientTransformation]:
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    det_vars = det.init(k1, jnp.zeros(det_shape, jnp.float32), train=True)
    rec_vars = rec.init(k2, jnp.zeros(rec_shape, jnp.float32))
    tx = optax.adamw(lr)
    opt_state = tx.init({"det": det_vars["params"], "rec": rec_vars["params"]})
    state = TrainState(
        det_params=det_vars,
        rec_params=rec_vars,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )
    return state, tx


def make_train_step(det: DBDetector, rec: CRNNRecognizer, tx, mesh: Optional[Mesh] = None):
    """Returns train_step(state, batch) -> (state, metrics).

    batch dict:
      det_images [B,H,W,3], gt_shrink/gt_shrink_mask/gt_thresh/gt_thresh_mask
      [B,H,W]; rec_images [B,h,w,3], labels [B,L], label_lengths [B].
    """

    def loss_fn(params, batch_stats_det, batch_stats_rec, batch):
        det_vars = {"params": params["det"], **batch_stats_det}
        rec_vars = {"params": params["rec"], **batch_stats_rec}
        (prob, thresh, binary), det_mut = det.apply(
            det_vars, batch["det_images"], train=True, mutable=["batch_stats"]
        )
        dloss, dmetrics = db_loss(
            prob, thresh, binary,
            batch["gt_shrink"], batch["gt_shrink_mask"],
            batch["gt_thresh"], batch["gt_thresh_mask"],
        )
        logits, rec_mut = rec.apply(
            rec_vars, batch["rec_images"], train=True, mutable=["batch_stats"]
        )
        rloss = ctc_rec_loss(logits, batch["labels"], batch["label_lengths"])
        total = dloss + rloss
        aux = ({"det": det_mut, "rec": rec_mut},
               {"loss": total, "det_loss": dloss, "rec_loss": rloss, **dmetrics})
        return total, aux

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        params = {
            "det": state.det_params["params"],
            "rec": state.rec_params["params"],
        }
        bs_det = {k: v for k, v in state.det_params.items() if k != "params"}
        bs_rec = {k: v for k, v in state.rec_params.items() if k != "params"}
        (loss, (mutated, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, bs_det, bs_rec, batch)
        updates, opt_state = tx.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        new_det = {"params": params["det"], **mutated["det"]}
        new_rec = {"params": params["rec"], **mutated["rec"]}
        return (
            TrainState(new_det, new_rec, opt_state, state.step + 1),
            metrics,
        )

    return jax.jit(train_step)


def shard_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Place the train state on the mesh: params per the TP rules, optimizer
    moments alongside their params, step replicated. XLA propagates these
    input shardings through the jitted step (GSPMD)."""
    from vse_tpu.parallel.sharding import shard_params

    det_p = shard_params(mesh, state.det_params)
    rec_p = shard_params(mesh, state.rec_params)
    opt = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state.opt_state
    )
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return TrainState(det_p, rec_p, opt, step)


def place_batch(mesh: Mesh, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    sh = data_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
