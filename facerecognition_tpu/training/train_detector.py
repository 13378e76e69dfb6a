"""Detector training: anchor matching, focal+smooth-L1 loss, synthetic faces.

The reference ships no detector training (its MTCNN/RetinaFace are frozen
pip models); a trainable TPU detector needs one. This module provides:
- anchor target assignment (IoU-based, fixed GT padding — static shapes)
- the detection loss (focal sigmoid CE + smooth-L1 box/landmark regression)
- a jitted train step
- a procedural synthetic-face generator (for tests, smoke pretraining, and
  the detector demo; real training plugs a WIDER-Face-style dataset into the
  same step).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from facerecognition_tpu.models.detector_net import BlazeFaceNet, anchor_centers
from facerecognition_tpu.ops.nms import iou_matrix

MAX_GT = 4  # static per-image ground-truth face slots


def _np_iou(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Host-side IoU of one xyxy box vs (N, 4) boxes — pure numpy.

    The jitted ``ops.nms.iou_matrix`` pays a device dispatch round-trip per
    call; in the host-side rejection/eval loops below that dominates
    wall-clock on the high-latency tunnel, so these loops stay on numpy.
    """
    ix = np.maximum(
        0.0,
        np.minimum(box[2], boxes[:, 2]) - np.maximum(box[0], boxes[:, 0]),
    )
    iy = np.maximum(
        0.0,
        np.minimum(box[3], boxes[:, 3]) - np.maximum(box[1], boxes[:, 1]),
    )
    inter = ix * iy
    area = (box[2] - box[0]) * (box[3] - box[1])
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(area + areas - inter, 1e-9)


def anchor_default_boxes(anchors: jax.Array) -> jax.Array:
    """(A, 4) xyxy default boxes: base x base squares at anchor centers."""
    cx, cy, s = anchors[:, 0], anchors[:, 1], anchors[:, 2]
    return jnp.stack([cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2], -1)


@jax.jit
def assign_targets(
    anchors: jax.Array,
    gt_boxes: jax.Array,
    gt_landmarks: jax.Array,
    gt_valid: jax.Array,
):
    """Match anchors to padded GT faces.

    Args:
      anchors: (A, 3) [cx, cy, base].
      gt_boxes: (MAX_GT, 4) xyxy (padding rows arbitrary).
      gt_landmarks: (MAX_GT, 5, 2).
      gt_valid: (MAX_GT,) bool.

    Returns:
      dict with cls (A,) float {0, 1}, reg (A, 14) regression targets,
      pos (A,) bool positive mask. An anchor is positive if IoU > 0.5 with a
      valid GT, or if it is the best anchor for that GT (guarantees every GT
      has ≥1 positive).
    """
    boxes_a = anchor_default_boxes(anchors)
    iou = iou_matrix(boxes_a, gt_boxes)  # (A, G)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)

    best_gt = jnp.argmax(iou, axis=1)  # (A,)
    best_iou = jnp.max(iou, axis=1)
    # Force-match: the best anchor per GT is positive. Invalid (padding)
    # GTs all argmax to anchor 0 (their IoU row is zeroed) — scattering
    # them would race real GTs at that anchor and could erase a face's
    # guaranteed positive, so route them OUT OF RANGE (dropped scatter).
    n_anchor = anchors.shape[0]
    best_anchor_per_gt = jnp.where(
        gt_valid, jnp.argmax(iou, axis=0), n_anchor
    )  # (G,)
    forced = jnp.zeros(n_anchor, bool)
    forced = forced.at[best_anchor_per_gt].set(True, mode="drop")
    # Forced anchors adopt their GT.
    forced_gt = jnp.zeros(n_anchor, jnp.int32)
    forced_gt = forced_gt.at[best_anchor_per_gt].set(
        jnp.arange(MAX_GT, dtype=jnp.int32), mode="drop"
    )
    pos = (best_iou > 0.5) | forced
    gt_idx = jnp.where(forced, forced_gt, best_gt)

    g = gt_boxes[gt_idx]  # (A, 4)
    g_lm = gt_landmarks[gt_idx]  # (A, 5, 2)
    cx, cy, s = anchors[:, 0], anchors[:, 1], anchors[:, 2]
    g_cx = (g[:, 0] + g[:, 2]) / 2
    g_cy = (g[:, 1] + g[:, 3]) / 2
    g_w = jnp.maximum(g[:, 2] - g[:, 0], 1e-3)
    g_h = jnp.maximum(g[:, 3] - g[:, 1], 1e-3)
    reg = jnp.concatenate(
        [
            ((g_cx - cx) / (0.5 * s))[:, None],
            ((g_cy - cy) / (0.5 * s))[:, None],
            jnp.log(g_w / s)[:, None],
            jnp.log(g_h / s)[:, None],
            ((g_lm - jnp.stack([cx, cy], -1)[:, None, :]) / (0.5 * s)[:, None, None]).reshape(-1, 10),
        ],
        axis=1,
    )
    return {"cls": pos.astype(jnp.float32), "reg": reg, "pos": pos}


def smooth_l1(x: jax.Array) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def detection_loss(
    raw: jax.Array, targets: dict, focal_gamma: float = 2.0, alpha: float = 0.25
) -> tuple[jax.Array, dict]:
    """Focal sigmoid CE over all anchors + smooth-L1 on positives.

    raw: (A, 15); targets from :func:`assign_targets`.
    """
    logits = raw[:, 0]
    p = jax.nn.sigmoid(logits)
    cls_t = targets["cls"]
    pt = jnp.where(cls_t > 0.5, p, 1.0 - p)
    alpha_t = jnp.where(cls_t > 0.5, alpha, 1.0 - alpha)
    bce = -jnp.log(jnp.clip(pt, 1e-7, 1.0))
    focal = alpha_t * (1.0 - pt) ** focal_gamma * bce
    n_pos = jnp.maximum(jnp.sum(targets["pos"].astype(jnp.float32)), 1.0)
    cls_loss = jnp.sum(focal) / n_pos

    reg_err = smooth_l1(raw[:, 1:15] - targets["reg"])
    reg_loss = (
        jnp.sum(reg_err * targets["pos"][:, None].astype(jnp.float32)) / n_pos
    )
    loss = cls_loss + 2.0 * reg_loss
    return loss, {"cls_loss": cls_loss, "reg_loss": reg_loss, "n_pos": n_pos}


def make_detector_train_step(net: BlazeFaceNet, anchors: jax.Array) -> Callable:
    """Jitted DP-ready step over batches of (images, gt_boxes, gt_lms, gt_valid)."""

    assign_batch = jax.vmap(
        lambda gb, gl, gv: assign_targets(anchors, gb, gl, gv)
    )

    def loss_fn(params, images, gt_boxes, gt_lms, gt_valid):
        raw = net.apply({"params": params}, images)  # (B, A, 15)
        targets = assign_batch(gt_boxes, gt_lms, gt_valid)
        losses, metrics = jax.vmap(detection_loss)(raw, targets)
        return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, metrics)

    def step(state: train_state.TrainState, images, gt_boxes, gt_lms, gt_valid):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, gt_boxes, gt_lms, gt_valid
        )
        state = state.apply_gradients(grads=grads)
        metrics["loss"] = loss
        return state, metrics

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Synthetic face generator (procedural — test/smoke data)
# ---------------------------------------------------------------------------


def synthetic_face_batch(
    rng: np.random.Generator,
    batch: int,
    size: int = 128,
    p_face: float = 0.9,
    max_per_image: int = 1,
):
    """Procedural 'faces': skin ellipse + eyes/nose/mouth landmarks on noise.

    Places 1..max_per_image non-overlapping faces per image (w.p. p_face).
    Returns (images (B, S, S, 3) f32, gt_boxes (B, MAX_GT, 4),
    gt_lms (B, MAX_GT, 5, 2), gt_valid (B, MAX_GT) bool).
    """
    assert max_per_image <= MAX_GT
    imgs = rng.integers(0, 90, (batch, size, size, 3)).astype(np.float32)
    boxes = np.zeros((batch, MAX_GT, 4), np.float32)
    lms = np.zeros((batch, MAX_GT, 5, 2), np.float32)
    valid = np.zeros((batch, MAX_GT), bool)
    yy, xx = np.mgrid[0:size, 0:size]
    for b in range(batch):
        if rng.random() > p_face:
            continue
        # (skip the draw when single-face to keep RNG streams stable)
        n_faces = (
            1
            if max_per_image == 1
            else int(rng.integers(1, max_per_image + 1))
        )
        slot = 0
        for _ in range(n_faces * 4):  # rejection-sample placements
            if slot >= n_faces:
                break
            rmax = size * (0.3 if n_faces == 1 else 0.18)
            r = rng.uniform(size * 0.12, rmax)
            cx = rng.uniform(r + 2, size - r - 2)
            cy = rng.uniform(r + 2, size - r - 2)
            box = np.array([cx - r, cy - 1.25 * r, cx + r, cy + 1.25 * r])
            if slot and _np_iou(box, boxes[b, :slot]).max() > 0.05:
                continue
            skin = np.array(
                [
                    rng.uniform(170, 230),
                    rng.uniform(120, 180),
                    rng.uniform(90, 140),
                ]
            )
            mask = ((xx - cx) / r) ** 2 + ((yy - cy) / (1.25 * r)) ** 2 <= 1.0
            imgs[b][mask] = skin + rng.normal(0, 6, 3)
            # landmarks in the canonical face layout
            eye_y = cy - 0.35 * r
            lm = np.array(
                [
                    [cx - 0.45 * r, eye_y],
                    [cx + 0.45 * r, eye_y],
                    [cx, cy + 0.15 * r],
                    [cx - 0.35 * r, cy + 0.65 * r],
                    [cx + 0.35 * r, cy + 0.65 * r],
                ]
            )
            for k, (lx, ly) in enumerate(lm):
                ix, iy = int(lx), int(ly)
                rad = max(1, int(r * 0.1))
                m2 = (xx - ix) ** 2 + (yy - iy) ** 2 <= rad * rad
                imgs[b][m2] = 25.0 if k < 2 else (80.0 if k == 2 else 50.0)
            boxes[b, slot] = box
            lms[b, slot] = lm
            valid[b, slot] = True
            slot += 1
    return imgs, boxes, lms, valid


@dataclasses.dataclass
class DetectorTrainConfig:
    input_size: int = 128
    batch_size: int = 32
    steps: int = 500
    lr: float = 1e-3
    seed: int = 0
    max_faces_per_image: int = 1


@dataclasses.dataclass
class CurriculumConfig:
    """Config for curriculum training on the v2 procedural scenes
    (`training.synthetic_faces`)."""

    input_size: int = 128
    batch_size: int = 64
    steps: int = 4000
    lr: float = 1.5e-3
    warmup: int = 200
    seed: int = 0
    max_faces: int = 2
    p_face: float = 0.92
    prefetch_threads: int = 4
    arch: str = "blaze"  # see models.detector_net.DETECTOR_ARCHS
    ranges: str = "v3"  # see synthetic_faces.SCENE_RANGES (v4 = wide OOD)


def train_detector_curriculum(
    config: CurriculumConfig,
    log_every: int = 200,
    progress: Callable[[int, float], None] | None = None,
    init_variables: dict | None = None,
):
    """Train BlazeFaceNet on the v2 scene curriculum (varied faces, poses,
    backgrounds, hard negatives — see `synthetic_faces.render_scene`).

    Host rendering runs in ``prefetch_threads`` producer threads so the TPU
    never waits on cv2 (the reference's DataLoader-worker pattern,
    arcface_dataloader.py:567, minus the process boundary).
    ``init_variables`` warm-starts from an earlier checkpoint (fresh
    optimizer/schedule). Returns (variables, history).
    """
    import queue
    import threading

    from facerecognition_tpu.models.detector_net import build_detector_net
    from facerecognition_tpu.training.synthetic_faces import (
        SCENE_RANGES,
        scene_batch,
    )

    scene_ranges = SCENE_RANGES[config.ranges]

    net = build_detector_net(config.arch)
    anchors = jnp.asarray(anchor_centers(config.input_size))
    if init_variables is not None:
        variables = {"params": init_variables["params"]}
    else:
        variables = net.init(
            jax.random.PRNGKey(config.seed),
            jnp.zeros((1, config.input_size, config.input_size, 3)),
        )
    warmup = min(config.warmup, max(config.steps // 10, 1))
    tx = optax.adam(
        optax.warmup_cosine_decay_schedule(
            0.0, config.lr, warmup, config.steps
        )
    )
    state = train_state.TrainState.create(
        apply_fn=net.apply, params=variables["params"], tx=tx
    )
    step_fn = make_detector_train_step(net, anchors)

    q: "queue.Queue" = queue.Queue(maxsize=config.prefetch_threads * 2)
    stop = threading.Event()
    producer_errors: list[BaseException] = []

    def producer(tid: int) -> None:
        rng = np.random.default_rng((config.seed, tid))
        try:
            while not stop.is_set():
                batch = scene_batch(
                    rng,
                    config.batch_size,
                    config.input_size,
                    config.max_faces,
                    config.p_face,
                    ranges=scene_ranges,
                )
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as exc:  # surface instead of a silent hang
            producer_errors.append(exc)

    threads = [
        threading.Thread(target=producer, args=(t,), daemon=True)
        for t in range(config.prefetch_threads)
    ]
    for t in threads:
        t.start()
    # Normalize on device: the batch crosses the host→device link as uint8
    # (4x less traffic than f32 — the tunnel link is the bottleneck here).
    @jax.jit
    def normalize(u8):
        return u8.astype(jnp.float32) / 127.5 - 1.0

    history = []
    try:
        for step in range(config.steps):
            while True:
                try:
                    imgs, gb, gl, gv = q.get(timeout=2.0)
                    break
                except queue.Empty:
                    if producer_errors:
                        raise RuntimeError(
                            "scene producer thread died"
                        ) from producer_errors[0]
                    if not any(t.is_alive() for t in threads):
                        raise RuntimeError(
                            "all scene producer threads exited"
                        )
            state, metrics = step_fn(
                state,
                normalize(jnp.asarray(imgs.astype(np.uint8))),
                jnp.asarray(gb),
                jnp.asarray(gl),
                jnp.asarray(gv),
            )
            if step % log_every == 0 or step == config.steps - 1:
                loss = float(metrics["loss"])
                history.append({"step": step, "loss": loss})
                if progress is not None:
                    progress(step, loss)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=2.0)
    return {"params": state.params}, history


def evaluate_detector(
    detector,
    n_scenes: int = 200,
    seed: int = 777,
    size: int | None = None,
    max_faces: int = 2,
    iou_match: float = 0.5,
    ranges=None,
) -> dict:
    """Detection quality on held-out v2 scenes: recall@IoU, mean matched
    IoU, landmark error (fraction of face width), false positives/image.
    ``ranges`` (a synthetic_faces.SceneRanges) selects the scene sampling
    envelope; default = v3, so historical seed-777 numbers stay comparable.

    The quality metric the reference never had for its detector backends
    (face_detector.py:465-534 only measures latency).
    """
    from facerecognition_tpu.training.synthetic_faces import render_scene

    rng = np.random.default_rng(seed)
    size = size or detector.input_size
    n_gt = n_match = n_fp = 0
    iou_sum = 0.0
    lm_err_sum = 0.0
    pool = ranges if isinstance(ranges, (tuple, list)) else None
    for _ in range(n_scenes):
        rr = pool[int(rng.integers(0, len(pool)))] if pool else ranges
        img, gt_boxes, gt_lms, gt_valid = render_scene(
            rng, size, max_faces, p_face=0.92, ranges=rr
        )
        dets = detector.detect_all(img.astype(np.uint8))
        gt = gt_boxes[gt_valid]
        glm = gt_lms[gt_valid]
        n_gt += len(gt)
        taken = np.zeros(len(gt), bool)
        for d in dets:
            db = np.asarray(d["bbox"], np.float32)
            if len(gt) == 0:
                n_fp += 1
                continue
            ious = _np_iou(db, gt)
            ious = np.where(taken, 0.0, ious)
            j = int(np.argmax(ious))
            if ious[j] >= iou_match:
                taken[j] = True
                n_match += 1
                iou_sum += float(ious[j])
                if d.get("landmarks") is not None:
                    w = gt[j, 2] - gt[j, 0]
                    lm_err_sum += float(
                        np.linalg.norm(
                            np.asarray(d["landmarks"]) - glm[j], axis=1
                        ).mean()
                        / max(w, 1e-6)
                    )
            else:
                n_fp += 1
    return {
        "recall": n_match / max(n_gt, 1),
        "mean_iou": iou_sum / max(n_match, 1),
        "mean_lm_err_frac": lm_err_sum / max(n_match, 1),
        "fp_per_image": n_fp / n_scenes,
        "n_gt": n_gt,
    }


def fit_score_calibration(
    detector,
    n_scenes: int = 300,
    seed: int = 555,
    max_faces: int = 2,
    iou_match: float = 0.5,
    ranges=None,
) -> tuple[float, float]:
    """Platt-scale the detector's confidence on held-out scenes.

    Focal-loss training (γ=2) systematically deflates raw sigmoid scores —
    a well-detecting net can put its TPs at 0.2-0.4. Fit ``p = σ(a·z + b)``
    (z = raw logit) by logistic regression on TP/FP labels of low-threshold
    candidate detections, so a calibrated score of 0.5 means "as likely a
    true face as not" and the reference's 0.9-style thresholds
    (face_detector.py:49) regain meaning.

    Returns (a, b); apply via FaceDetector checkpoint key ``calibration``.
    """
    from facerecognition_tpu.training.synthetic_faces import render_scene

    rng = np.random.default_rng(seed)
    old_thr = detector.confidence_threshold
    old_cal = getattr(detector, "_calibration", None)
    detector.confidence_threshold = 0.02
    detector._calibration = None  # fit on RAW scores
    zs, ys = [], []
    try:
        pool = ranges if isinstance(ranges, (tuple, list)) else None
        for _ in range(n_scenes):
            rr = pool[int(rng.integers(0, len(pool)))] if pool else ranges
            img, gt_boxes, _, gt_valid = render_scene(
                rng, detector.input_size, max_faces, p_face=0.8, ranges=rr
            )
            gt = gt_boxes[gt_valid]
            taken = np.zeros(len(gt), bool)
            for d in detector.detect_all(img.astype(np.uint8)):
                s = min(max(d["confidence"], 1e-6), 1.0 - 1e-6)
                z = float(np.log(s / (1.0 - s)))
                tp = False
                if len(gt):
                    ious = _np_iou(np.asarray(d["bbox"], np.float32), gt)
                    ious = np.where(taken, 0.0, ious)
                    j = int(np.argmax(ious))
                    if ious[j] >= iou_match:
                        taken[j] = True
                        tp = True
                zs.append(z)
                ys.append(1.0 if tp else 0.0)
    finally:
        detector.confidence_threshold = old_thr
        detector._calibration = old_cal
    z = np.asarray(zs)
    y = np.asarray(ys)
    # 2-param logistic regression via IRLS (no sklearn dependency).
    a, b = 1.0, 0.0
    for _ in range(50):
        p = 1.0 / (1.0 + np.exp(-(a * z + b)))
        w = np.maximum(p * (1.0 - p), 1e-6)
        g = np.array([np.sum((p - y) * z), np.sum(p - y)])
        H = np.array(
            [
                [np.sum(w * z * z) + 1e-6, np.sum(w * z)],
                [np.sum(w * z), np.sum(w) + 1e-6],
            ]
        )
        da, db = np.linalg.solve(H, g)
        a, b = a - da, b - db
        if abs(da) + abs(db) < 1e-8:
            break
    return float(a), float(b)


def train_detector_synthetic(
    config: DetectorTrainConfig,
    log_every: int = 100,
    progress: Callable[[int, float], None] | None = None,
):
    """Train BlazeFaceNet on procedural faces; returns (variables, history)."""
    net = BlazeFaceNet()
    anchors = jnp.asarray(anchor_centers(config.input_size))
    rng = np.random.default_rng(config.seed)
    variables = net.init(
        jax.random.PRNGKey(config.seed),
        jnp.zeros((1, config.input_size, config.input_size, 3)),
    )
    tx = optax.adam(config.lr)
    state = train_state.TrainState.create(
        apply_fn=net.apply, params=variables["params"], tx=tx
    )
    step_fn = make_detector_train_step(net, anchors)
    history = []
    for step in range(config.steps):
        imgs, gb, gl, gv = synthetic_face_batch(
            rng,
            config.batch_size,
            config.input_size,
            max_per_image=config.max_faces_per_image,
        )
        norm = jnp.asarray(imgs) / 127.5 - 1.0
        state, metrics = step_fn(
            state, norm, jnp.asarray(gb), jnp.asarray(gl), jnp.asarray(gv)
        )
        if step % log_every == 0 or step == config.steps - 1:
            loss = float(metrics["loss"])
            history.append({"step": step, "loss": loss})
            if progress is not None:
                progress(step, loss)
    return {"params": state.params}, history
