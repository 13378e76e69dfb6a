"""Pure training-step functions (jit/pjit-ready).

The hot loops of the reference trainers rebuilt as single jitted steps:
- ArcFace: mixup + label smoothing + ArcMargin CE + grad clip + cosine train
  accuracy (reference models/arcface/train_arcface.py:573-668, :96-111,
  :430, :639-649)
- FaceNet: two-pass online mining fused into ONE step — no-grad mining
  forward and grad forward on mined triplets inside the same jit
  (reference models/facenet/train_facenet.py:163-262 runs them as two
  separate python-level passes)

Data parallelism: steps are written over global arrays; under ``jit`` with a
``data``-sharded batch and replicated params, XLA inserts the grad
all-reduce over ICI automatically. No explicit collectives needed here.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from facerecognition_tpu.models.arcface import ArcFaceModel
from facerecognition_tpu.models.facenet import (
    FaceNetModel,
    masked_triplet_loss,
    mine_batch_hard,
    mine_semi_hard,
)


class ArcFaceTrainState(train_state.TrainState):
    """TrainState + batch_stats (BN) — the pytree the DP step updates."""

    batch_stats: Any = None


def softmax_cross_entropy(
    logits: jax.Array, labels: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """CE with label smoothing (reference train_arcface.py:430 uses
    nn.CrossEntropyLoss(label_smoothing=...))."""
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_classes)
    if label_smoothing > 0:
        one_hot = (
            one_hot * (1.0 - label_smoothing) + label_smoothing / num_classes
        )
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.sum(one_hot * logp, axis=-1))


def mixup_batch(rng: jax.Array, images: jax.Array, alpha: float):
    """Mixup (reference train_arcface.py:96-111): lam ~ Beta(alpha, alpha),
    x = lam*x + (1-lam)*x[perm]. Returns (mixed, perm, lam)."""
    rng_lam, rng_perm = jax.random.split(rng)
    lam = jax.random.beta(rng_lam, alpha, alpha)
    perm = jax.random.permutation(rng_perm, images.shape[0])
    mixed = lam * images + (1.0 - lam) * images[perm]
    return mixed, perm, lam


def make_arcface_train_step(
    model: ArcFaceModel,
    label_smoothing: float = 0.1,
    mixup_alpha: float = 0.0,
    margin_schedule: Optional[Callable] = None,
) -> Callable:
    """Build the jitted ArcFace train step.

    step(state, images, labels, rng) -> (state, metrics) where metrics has
    loss and train_acc (pure-cosine accuracy against the margin weights —
    reference train_arcface.py:639-649 computes accuracy WITHOUT the margin).

    ``margin_schedule``: optional fn(step) → margin (traced scalar ok) —
    ramping the angular margin stabilizes early ArcFace training; the
    schedule runs inside the jit, so it never triggers recompiles.
    """

    def loss_fn(params, batch_stats, images, labels, rng, margin_override):
        rng_drop, rng_mix = jax.random.split(rng)
        use_mixup = mixup_alpha > 0.0
        if use_mixup:
            images_in, perm, lam = mixup_batch(rng_mix, images, mixup_alpha)
        else:
            images_in, perm, lam = images, None, 1.0
        (logits, emb), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images_in,
            labels=labels,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng_drop},
            margin_override=margin_override,
        )
        loss = softmax_cross_entropy(logits, labels, label_smoothing)
        if use_mixup:
            # Reference-faithful caveat (train_arcface.py:96-111): the
            # angular margin is applied at the PRIMARY labels' columns only,
            # so the permuted-target CE term scores a margin-free logit —
            # the standard torch-ArcFace+mixup composition, kept for parity.
            loss = lam * loss + (1.0 - lam) * softmax_cross_entropy(
                logits, labels[perm], label_smoothing
            )
        # margin-free cosine train accuracy
        w = params["arcface"]["weight"]
        emb_n = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12
        )
        w_n = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
        cos = jnp.dot(emb_n, w_n.T, preferred_element_type=jnp.float32)
        acc = jnp.mean((jnp.argmax(cos, axis=1) == labels).astype(jnp.float32))
        return loss, (mutated["batch_stats"], acc)

    def step(state: ArcFaceTrainState, images, labels, rng):
        margin_override = (
            margin_schedule(state.step) if margin_schedule is not None else None
        )
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_stats, acc)), grads = grad_fn(
            state.params, state.batch_stats, images, labels, rng, margin_override
        )
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        metrics = {
            "loss": loss,
            "train_acc": acc,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return step


def make_arcface_eval_step(model: ArcFaceModel) -> Callable:
    """Eval step: embeddings (no margin head) for verification accuracy."""

    def step(state: ArcFaceTrainState, images):
        emb = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, images
        )
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12
        )

    return step


def make_facenet_train_step(
    model: FaceNetModel,
    margin: float = 0.5,
    mining: str = "semi_hard",
    remat: bool = False,
) -> Callable:
    """Fused two-pass online-mining FaceNet step.

    Pass 1 (stop-gradient) embeds the (B·K) batch and mines triplets with
    the vectorized miner; pass 2 re-derives the loss with gradients on the
    SAME forward by indexing the differentiable embeddings. Because mining
    only picks indices, one grad forward suffices — mathematically identical
    to the reference's two forwards (train_facenet.py:203-229) but half the
    FLOPs.

    ``remat=True`` rematerializes the backbone forward in the backward pass
    (``jax.checkpoint``): no inter-pass residuals live in HBM, at the cost
    of a second forward's FLOPs. Required to fit P32K4 @160² next to an
    HBM-resident multi-GB dataset on one 16 GB chip.
    """
    if mining not in ("semi_hard", "batch_hard", "random"):
        raise ValueError(f"unknown mining {mining}")

    def forward(params, batch_stats, images, rng):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )

    if remat:
        forward = jax.checkpoint(forward)

    def loss_fn(params, batch_stats, images, labels, rng):
        emb, mutated = forward(params, batch_stats, images, rng)
        mined = jax.lax.stop_gradient(emb)
        if mining == "semi_hard":
            ai, pi, ni, valid = mine_semi_hard(mined, labels, margin)
        elif mining == "batch_hard":
            ai, pi, ni, valid = mine_batch_hard(mined, labels)
        else:  # random negatives (reference train_facenet.py:265 baseline)
            b = images.shape[0]
            ai = jnp.arange(b)
            pi = jnp.roll(ai, -1)  # same-identity neighbour under K-grouping
            ni = jax.random.permutation(jax.random.fold_in(rng, 1), b)
            valid = (labels[ai] == labels[pi]) & (labels[ai] != labels[ni])
        loss = masked_triplet_loss(emb, ai, pi, ni, valid, margin)
        n_valid = jnp.sum(valid.astype(jnp.float32))
        return loss, (mutated["batch_stats"], n_valid)

    def step(state: ArcFaceTrainState, images, labels, rng):
        (loss, (new_stats, n_valid)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, images, labels, rng)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return new_state, {"loss": loss, "n_triplets": n_valid}

    return step


def make_resident_step(
    step_fn: Callable, image_shape: tuple = None
) -> Callable:
    """Jit a ``(state, images_u8, labels, rng)`` train step as HBM-resident.

    The whole uint8 dataset lives on device; each step ships only a (B,)
    int32 index vector and gathers the batch on device. This is the axon
    host-buffer-leak mitigation (every host->device transfer leaks its
    staging buffer in host RSS — CLAUDE.md): one transfer for the whole
    run instead of one per step. Shared by train_synthid and train_facenet
    so the mitigation lives in one place.

    When ``image_shape`` (H, W, C) is given, ``data`` must be FLAT
    (N, H*W*C): gathering rows of a 2-D array matches the array's natural
    (8,128)-tiled layout, so XLA gathers in place. Gathering a 4-D
    (N, H, W, 3) array instead makes XLA materialize a relayouted COPY of
    the WHOLE dataset inside the step program — measured +10.3 GB (1.6x
    padding on the channels-minor tile) for the 6.4 GB facenet-9k set,
    which alone OOMed the chip. The gathered (B, F) batch reshapes to
    images for free.
    """

    def step_resident(state, data, labels_all, idx, rng):
        batch = jnp.take(data, idx, axis=0)
        if image_shape is not None:
            batch = batch.reshape((idx.shape[0],) + tuple(image_shape))
        return step_fn(
            state,
            batch,
            jnp.take(labels_all, idx, axis=0),
            rng,
        )

    return jax.jit(step_resident, donate_argnums=(0,))
