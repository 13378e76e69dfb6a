"""MobileFaceNet backbone tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from facerecognition_tpu.models.mobilefacenet import (
    MobileFaceNet,
    MobileFaceNetArcFace,
)


@pytest.mark.slow
class TestMobileFaceNet:
    def test_forward_shape_and_params(self):
        model = MobileFaceNet(embedding_size=512)
        x = jnp.zeros((2, 112, 112, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        emb = model.apply(v, x)
        assert emb.shape == (2, 512)
        n_params = sum(
            np.prod(p.shape) for p in jax.tree_util.tree_leaves(v["params"])
        )
        assert n_params < 3e6, f"{n_params:,} params — should be ~1-2M"

    def test_train_branch_and_learning(self, rng):
        import optax

        from facerecognition_tpu.training.steps import softmax_cross_entropy

        n_classes = 4
        model = MobileFaceNetArcFace(
            num_classes=n_classes, embedding_size=64, margin=0.2, easy_margin=True
        )
        v = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 112, 112, 3)),
            labels=jnp.zeros((2,), jnp.int32),
        )
        params, stats = v["params"], v["batch_stats"]
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        palette = rng.normal(size=(n_classes, 1, 1, 3)).astype(np.float32)

        @jax.jit
        def step(params, stats, opt_state, images, labels):
            def loss_fn(p):
                (logits, emb), mut = model.apply(
                    {"params": p, "batch_stats": stats},
                    images,
                    labels=labels,
                    train=True,
                    mutable=["batch_stats"],
                )
                return softmax_cross_entropy(logits, labels), mut["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), new_stats, opt_state, loss

        losses = []
        for i in range(15):
            labels = rng.integers(0, n_classes, 16)
            images = palette[labels] + 0.05 * rng.normal(
                size=(16, 112, 112, 3)
            ).astype(np.float32)
            params, stats, opt_state, loss = step(
                params, stats, opt_state, jnp.asarray(images), jnp.asarray(labels)
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0], (losses[0], losses[-1])
