"""Recognition-accuracy-at-scale training on synthetic identities.

The reference's quality numbers (88.14% top-1 / AUC 0.9595 on 9,343 CelebA
identities — BASELINE.md rows 1-4, notebooks/evaluate_arcface_kaggle.ipynb)
have no counterpart in this dataset-free environment; the honest substitute
is training ArcFace on a many-identity procedural dataset
(`synthetic_faces.identity_dataset`) and measuring top-1/top-5/AUC/EER with
this framework's own evaluation suite. Produces the committed serving
checkpoint ``assets/arcface_synthid_512.msgpack`` used by bench.py.

Run: python -m facerecognition_tpu.training.train_synthid --n-ids 500
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from facerecognition_tpu.models.arcface import ArcFaceModel
from facerecognition_tpu.training.steps import (
    ArcFaceTrainState,
    make_arcface_train_step,
    make_resident_step,
)


@dataclasses.dataclass
class SynthIdConfig:
    n_ids: int = 500
    train_per_id: int = 24
    val_per_id: int = 6
    batch_size: int = 128
    epochs: int = 15
    lr: float = 0.05
    momentum: float = 0.9
    weight_decay: float = 5e-4
    margin: float = 0.2
    scale: float = 64.0
    label_smoothing: float = 0.1
    embedding_size: int = 512
    seed: int = 0
    # ArcFace backbone depth: (3, 4, 6, 3) = ResNet50 (reference parity);
    # (2, 2, 2, 2) = slim serving variant (marker saved in the checkpoint).
    stage_sizes: tuple = (3, 4, 6, 3)
    cache: str | None = None  # npz path: render once, reuse across runs
    # Keep the uint8 train set resident in HBM when it fits (one transfer
    # for the whole run, batches gathered on device by index). Streaming
    # from host each step leaked ~one batch of host buffers per step on the
    # axon tunnel (a 9k-id run grew to 130GB RSS and was OOM-killed).
    device_data_budget_bytes: int = 5 << 30
    ckpt_path: str | None = None  # per-epoch crash checkpoint (msgpack)
    resume: bool = False


def _embed_all(model, params, batch_stats, images_u8, batch=256):
    """Embed a uint8 array in fixed-size batches (eval helper)."""
    from facerecognition_tpu.ops.image import normalize_imagenet_style

    @jax.jit
    def fwd(imgs):
        x = normalize_imagenet_style(imgs)
        emb = model.apply(
            {"params": params, "batch_stats": batch_stats}, x
        ).astype(jnp.float32)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12
        )

    out = []
    n = len(images_u8)
    for i in range(0, n, batch):
        # Ship uint8 (4x less host->device traffic than f32); cast on device.
        chunk = np.ascontiguousarray(images_u8[i : i + batch])
        if len(chunk) < batch:  # pad to keep one compiled shape
            chunk = np.concatenate(
                [chunk, np.zeros((batch - len(chunk),) + chunk.shape[1:], chunk.dtype)]
            )
        out.append(np.asarray(fwd(jnp.asarray(chunk))))
    return np.concatenate(out)[:n]


def evaluate_retrieval(
    train_emb, train_labels, val_emb, val_labels, n_ids
) -> dict:
    """Top-1/top-5 retrieval vs class prototypes + verification ROC/EER.

    Mirrors what evaluate_arcface_kaggle.ipynb measures: gallery = per-class
    mean prototypes of the train split, queries = val images.
    """
    from facerecognition_tpu.inference.evaluate import (
        cmc_curve,
        roc_eer,
        top_k_accuracy,
    )
    from facerecognition_tpu.ops.matcher import compute_prototypes

    protos = np.asarray(
        compute_prototypes(
            jnp.asarray(train_emb), jnp.asarray(train_labels), n_ids
        )
    )
    scores = val_emb @ protos.T  # (Nv, C) cosine (all normalized)
    out = top_k_accuracy(scores, val_labels, ks=(1, 5))
    out["cmc"] = cmc_curve(scores, val_labels, max_rank=20)

    # Verification pairs: each consecutive same-id val pair positive, random
    # different-id pairs negative (reference train_arcface.py:114-210 style).
    rng = np.random.default_rng(0)
    pos_a, pos_b, neg_a, neg_b = [], [], [], []
    by_class: dict[int, list[int]] = {}
    for i, lab in enumerate(val_labels):
        by_class.setdefault(int(lab), []).append(i)
    for lab, idxs in by_class.items():
        for j in range(len(idxs) - 1):
            pos_a.append(idxs[j])
            pos_b.append(idxs[j + 1])
    n_pairs = len(pos_a)
    labs = np.asarray(val_labels)
    for _ in range(n_pairs):
        while True:
            i, j = rng.integers(0, len(val_labels), 2)
            if labs[i] != labs[j]:
                neg_a.append(i)
                neg_b.append(j)
                break
    pair_scores = np.concatenate(
        [
            np.sum(val_emb[pos_a] * val_emb[pos_b], axis=1),
            np.sum(val_emb[neg_a] * val_emb[neg_b], axis=1),
        ]
    )
    pair_labels = np.concatenate([np.ones(n_pairs), np.zeros(n_pairs)])
    roc = roc_eer(pair_labels, pair_scores)
    out.update(
        {k: roc[k] for k in ("auc", "eer", "eer_threshold")}
    )  # drop the fpr/tpr arrays — this dict is JSON-serialized
    return out


def train_synthid(config: SynthIdConfig, log=print):
    """Train + evaluate; returns (variables, metrics_history, final_eval)."""
    from facerecognition_tpu.training.synthetic_faces import identity_dataset

    t0 = time.time()
    k_total = config.train_per_id + config.val_per_id
    # Everything the rendered data depends on. A cache is only reused when
    # this matches exactly — a sample-count check alone would silently accept
    # a wrong-seed or differently-split cache.
    fingerprint = {
        "n_ids": config.n_ids,
        "k_total": k_total,
        "train_per_id": config.train_per_id,
        "seed": config.seed,
        "out_size": 112,
    }
    if config.cache and __import__("os").path.exists(config.cache):
        log(f"loading cached dataset {config.cache} ...")
        with np.load(config.cache) as z:
            imgs, labels = z["imgs"], z["labels"]
            cached_fp = (
                json.loads(str(z["fingerprint"])) if "fingerprint" in z else None
            )
        if cached_fp is None:
            # Legacy cache (pre-fingerprint): only the sample count can be
            # checked. Seed/split mismatches are NOT detectable here.
            if len(imgs) != config.n_ids * k_total:
                raise ValueError(
                    f"cache {config.cache} has {len(imgs)} samples, expected "
                    f"{config.n_ids * k_total} ({config.n_ids} ids x {k_total})"
                )
            log(
                f"WARNING: {config.cache} has no fingerprint (legacy cache); "
                f"cannot verify seed/split match {fingerprint}"
            )
        elif cached_fp != fingerprint:
            raise ValueError(
                f"cache {config.cache} was rendered with {cached_fp}, "
                f"this run needs {fingerprint} — delete the cache or point "
                "--cache elsewhere"
            )
    else:
        log(f"rendering {config.n_ids} ids x {k_total} samples ...")
        imgs, labels = identity_dataset(
            config.n_ids, k_total, out_size=112, seed=config.seed
        )
        if config.cache:
            np.savez(
                config.cache,
                imgs=imgs,
                labels=labels,
                fingerprint=json.dumps(fingerprint),
            )
            log(f"cached dataset -> {config.cache}")
    k = config.train_per_id + config.val_per_id
    mask = (np.arange(len(imgs)) % k) < config.train_per_id
    tr_imgs, tr_labels = imgs[mask], labels[mask]
    va_imgs, va_labels = imgs[~mask], labels[~mask]
    log(f"dataset: train {tr_imgs.shape} val {va_imgs.shape} "
        f"({time.time()-t0:.0f}s)")

    model = ArcFaceModel(
        num_classes=config.n_ids,
        embedding_size=config.embedding_size,
        margin=config.margin,
        scale=config.scale,
        dtype=jnp.float32,
        stage_sizes=tuple(config.stage_sizes),
    )
    rng = jax.random.PRNGKey(config.seed)
    variables = model.init(
        rng, jnp.zeros((2, 112, 112, 3)), labels=jnp.zeros((2,), jnp.int32)
    )
    steps_per_epoch = max(len(tr_imgs) // config.batch_size, 1)
    if len(tr_imgs) < config.batch_size:
        raise ValueError(
            f"train set ({len(tr_imgs)}) smaller than batch_size "
            f"({config.batch_size}) — raise --n-ids/--train-per-id or "
            "lower --batch-size"
        )
    total_steps = steps_per_epoch * config.epochs
    sched = optax.warmup_cosine_decay_schedule(
        0.0, config.lr, min(total_steps // 20 + 1, 500), total_steps
    )
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.add_decayed_weights(config.weight_decay),
        optax.sgd(sched, momentum=config.momentum),
    )
    state = ArcFaceTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )
    # Margin ramp over the first 2 epochs stabilizes early training.
    ramp = 2 * steps_per_epoch
    margin_schedule = lambda s: config.margin * jnp.minimum(  # noqa: E731
        s.astype(jnp.float32) / ramp, 1.0
    )
    raw_step = make_arcface_train_step(
        model,
        label_smoothing=config.label_smoothing,
        margin_schedule=margin_schedule,
    )

    from facerecognition_tpu.data.augment import augment_batch

    def step_with_aug(state, images_u8, labels, rng):
        rng_aug, rng_step = jax.random.split(rng)
        images = augment_batch(rng_aug, images_u8, "light")
        images = (images / 255.0 - 0.5) / 0.5
        return raw_step(state, images, labels, rng_step)

    # Two dispatch modes for the batch source:
    #  - resident: the whole uint8 train set lives in HBM; each step ships
    #    only a (B,) int32 index vector and gathers on device. Zero per-step
    #    image transfer (and zero host-buffer churn — see config docstring).
    #  - streaming: uint8 batches shipped per step (4x lighter than the old
    #    f32 path) for datasets too big for the HBM budget.
    resident = tr_imgs.nbytes <= config.device_data_budget_bytes

    if resident:
        # FLAT (N, H*W*3): row-gather keeps the array's natural 2-D tiling;
        # a 4-D gather makes XLA copy+relayout the whole dataset inside the
        # step program (+60% padded HBM) — see make_resident_step.
        data_dev = jnp.asarray(tr_imgs.reshape(len(tr_imgs), -1))
        labels_dev = jnp.asarray(tr_labels, jnp.int32)
        step_fn = make_resident_step(
            step_with_aug, image_shape=tr_imgs.shape[1:]
        )
    else:
        step_fn = jax.jit(step_with_aug, donate_argnums=(0,))
    log(f"batch source: {'HBM-resident' if resident else 'host-streaming'} "
        f"({tr_imgs.nbytes / 2**30:.1f} GiB uint8)")

    def crash_save(epoch, history):
        if not config.ckpt_path:
            return
        import os

        from facerecognition_tpu.utils.serialization import save_variables

        tmp = config.ckpt_path + ".tmp"
        save_variables(
            tmp,
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                # Arch marker: a --stage-sizes mismatch on resume must fail
                # with a clear message, not a flax param-tree error.
                "stage_sizes": np.asarray(config.stage_sizes, np.int32),
            },
        )
        os.replace(tmp, config.ckpt_path)
        # Meta is replaced atomically AND after the ckpt: a kill between the
        # two replaces leaves a stale meta (epoch-1) with an epoch-N ckpt,
        # which resume handles by re-running one epoch — never a broken pair.
        meta_tmp = config.ckpt_path + ".meta.json.tmp"
        with open(meta_tmp, "w") as f:
            json.dump({"epoch": epoch, "history": history}, f)
        os.replace(meta_tmp, config.ckpt_path + ".meta.json")

    history = []
    start_epoch = 0
    if config.resume and config.ckpt_path:
        import os

        from facerecognition_tpu.utils.serialization import load_variables

        if os.path.exists(config.ckpt_path):
            tree = load_variables(config.ckpt_path)
            raw_stages = tree.pop("stage_sizes", None)
            ckpt_stages = (
                tuple(int(v) for v in np.asarray(raw_stages))
                if raw_stages is not None
                else (3, 4, 6, 3)  # pre-marker checkpoints were ResNet50
            )
            if ckpt_stages != tuple(config.stage_sizes):
                raise ValueError(
                    f"checkpoint {config.ckpt_path} was trained with "
                    f"stage_sizes={ckpt_stages}, this run asks for "
                    f"{tuple(config.stage_sizes)} — point --ckpt elsewhere"
                )
            state = state.replace(
                params=tree["params"], batch_stats=tree["batch_stats"]
            )
            try:
                with open(config.ckpt_path + ".meta.json") as f:
                    meta = json.load(f)
                start_epoch = meta["epoch"] + 1
                history = meta["history"]
            except (FileNotFoundError, json.JSONDecodeError, KeyError) as e:
                # Missing/torn meta (kill between the two crash_save
                # replaces): keep the weights, restart the epoch counter.
                log(f"resume: ckpt ok but meta unreadable ({e}); "
                    "restarting epoch count with loaded weights")
            log(f"resumed from {config.ckpt_path} at epoch {start_epoch} "
                "(optimizer state restarts)")

    data_rng = np.random.default_rng(config.seed + 1)
    key = jax.random.PRNGKey(config.seed + 2)
    for epoch in range(config.epochs):
        perm = data_rng.permutation(len(tr_imgs))
        key, *subs = jax.random.split(key, steps_per_epoch + 1)
        if epoch < start_epoch:
            continue  # burn the same rng stream so resume stays deterministic
        ep_loss = ep_acc = 0.0
        te = time.time()
        for s in range(steps_per_epoch):
            sel = perm[s * config.batch_size : (s + 1) * config.batch_size]
            if resident:
                state, metrics = step_fn(
                    state, data_dev, labels_dev,
                    jnp.asarray(sel, jnp.int32), subs[s],
                )
            else:
                state, metrics = step_fn(
                    state,
                    jnp.asarray(np.ascontiguousarray(tr_imgs[sel])),
                    jnp.asarray(tr_labels[sel]),
                    subs[s],
                )
            ep_loss += float(metrics["loss"])
            ep_acc += float(metrics["train_acc"])
        row = {
            "epoch": epoch,
            "loss": ep_loss / steps_per_epoch,
            "train_acc": ep_acc / steps_per_epoch,
            "sec": round(time.time() - te, 1),
        }
        history.append(row)
        crash_save(epoch, history)
        log(f"epoch {epoch}: loss {row['loss']:.4f} "
            f"train_acc {row['train_acc']:.3f} ({row['sec']}s)")
    # Final evaluation through the eval suite.
    eval_model = ArcFaceModel(
        embedding_size=config.embedding_size,
        dtype=jnp.float32,
        stage_sizes=tuple(config.stage_sizes),
    )
    tr_emb = _embed_all(eval_model, state.params, state.batch_stats, tr_imgs)
    va_emb = _embed_all(eval_model, state.params, state.batch_stats, va_imgs)
    final = evaluate_retrieval(tr_emb, tr_labels, va_emb, va_labels, config.n_ids)
    log("final eval: " + json.dumps(final))
    return (
        {"params": state.params, "batch_stats": state.batch_stats},
        history,
        final,
    )


def main():
    from facerecognition_tpu.utils.compile_cache import enable_compile_cache
    from facerecognition_tpu.utils.serialization import save_variables

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-ids", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--train-per-id", type=int, default=24)
    ap.add_argument("--val-per-id", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--out", default="assets/arcface_synthid_512.msgpack")
    ap.add_argument("--report", default="docs/SYNTHID_EVAL.json")
    ap.add_argument("--cache", default=None,
                    help="npz dataset cache (render once, reuse)")
    ap.add_argument("--ckpt", default=None,
                    help="per-epoch crash checkpoint path (msgpack)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from --ckpt if it exists")
    ap.add_argument("--stage-sizes", default="3,4,6,3",
                    help="backbone blocks per stage; 2,2,2,2 = slim variant")
    args = ap.parse_args()
    config = SynthIdConfig(
        n_ids=args.n_ids,
        epochs=args.epochs,
        train_per_id=args.train_per_id,
        val_per_id=args.val_per_id,
        batch_size=args.batch_size,
        lr=args.lr,
        cache=args.cache,
        ckpt_path=args.ckpt,
        resume=args.resume,
        stage_sizes=tuple(int(v) for v in args.stage_sizes.split(",")),
    )
    variables, history, final = train_synthid(config)
    # Strip the margin head: the serving checkpoint loads into
    # ArcFaceModel(num_classes=None) via inference.load_arcface_model.
    params = {k: v for k, v in variables["params"].items() if k != "arcface"}
    ckpt = {"params": params, "batch_stats": variables["batch_stats"]}
    if tuple(config.stage_sizes) != (3, 4, 6, 3):
        # Arch marker (like the detector's 'arch' key): load_arcface_model
        # pops it and builds the matching backbone.
        ckpt["stage_sizes"] = np.asarray(config.stage_sizes, np.int32)
    save_variables(args.out, ckpt)
    with open(args.report, "w") as f:
        json.dump(
            {"config": dataclasses.asdict(config), "history": history,
             "final": final},
            f,
            indent=2,
        )
    print(f"saved {args.out} and {args.report}")


if __name__ == "__main__":
    main()
