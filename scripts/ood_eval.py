"""Out-of-distribution evaluation: detector recall/IoU and embedder top-1
on generator parameter families held OUT of training
(training/ood_faces.py; the generality check VERDICT r3 asked for —
the reference's MTCNN handles arbitrary photos,
/root/reference/preprocessing/face_detector.py:144-210, so held-out-seed
evals of the training generator are not enough evidence).

Per family: N single-face scenes → FaceDetector (shipped checkpoint) →
recall@IoU0.5, mean IoU, median landmark error (fraction of box size).
Embedder: OOD-appearance identities rendered aligned (enroll 2 / probe 3)
→ prototype top-1 over all OOD identities, using the shipped 9k ArcFace
checkpoint.

Run: PYTHONPATH=/root/repo python -u scripts/ood_eval.py \
        [--scenes 200] [--ids 100] [--size 256] [--out docs/OOD_EVAL.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

T0 = time.time()


def log(msg):
    print(f"[ood +{time.time()-T0:.0f}s] {msg}", flush=True)


def iou(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def eval_detector_family(det, family, n_scenes, size, seed=0):
    from facerecognition_tpu.training.ood_faces import ood_render_scene

    rng = np.random.default_rng(seed)
    hits, ious, lm_errs, confs = 0, [], [], []
    for _ in range(n_scenes):
        img, boxes, lms, valid = ood_render_scene(rng, size, family)
        # GT clipped to the frame: detectors predict inside the image, and
        # near-full-frame OOD faces legitimately overflow it (the training
        # convention only pins the face CENTER inside).
        gt = np.clip(boxes[0], 0, size)
        gt_lm = lms[0]
        faces = det.detect_all(img)
        best = 0.0
        best_face = None
        for f in faces:
            v = iou(np.clip(np.asarray(f["bbox"], np.float32), 0, size), gt)
            if v > best:
                best, best_face = v, f
        if best >= 0.5:
            hits += 1
            ious.append(best)
            confs.append(best_face["confidence"])
            bw = max(gt[2] - gt[0], gt[3] - gt[1])
            lm_errs.append(
                float(
                    np.median(
                        np.linalg.norm(
                            np.asarray(best_face["landmarks"]) - gt_lm, axis=1
                        )
                    )
                    / max(bw, 1e-9)
                )
            )
    return {
        "scenes": n_scenes,
        "recall@iou0.5": round(hits / n_scenes, 4),
        "mean_iou_matched": round(float(np.mean(ious)), 4) if ious else None,
        "median_lm_err_frac": (
            round(float(np.median(lm_errs)), 4) if lm_errs else None
        ),
        "mean_conf_matched": (
            round(float(np.mean(confs)), 4) if confs else None
        ),
    }


def eval_embedder_ood(n_ids, enroll_per_id=2, probe_per_id=3, seed=7):
    """Top-1 prototype identification over OOD-appearance identities."""
    import jax.numpy as jnp

    from facerecognition_tpu.inference.extract_embeddings import (
        load_arcface_checkpoint,
    )
    from facerecognition_tpu.ops.image import normalize_imagenet_style
    from facerecognition_tpu.ops.matcher import l2_normalize
    from facerecognition_tpu.training.ood_faces import sample_identity_ood
    from facerecognition_tpu.training.synthetic_faces import (
        render_aligned_identity_sample,
    )

    from facerecognition_tpu.inference.extract_embeddings import (
        default_arcface_checkpoint,
    )

    # The SERVING-DEFAULT embedder (round-5 fix: this previously pinned the
    # deep (3,4,6,3) checkpoint, so the canonical table didn't track what
    # ships). The report records which checkpoint was measured.
    ckpt = default_arcface_checkpoint() or os.path.join(
        _REPO, "assets", "arcface_synthid9k_512.msgpack"
    )
    model, variables = load_arcface_checkpoint(ckpt)
    rng = np.random.default_rng(seed)
    ids = [sample_identity_ood(rng) for _ in range(n_ids)]
    per = enroll_per_id + probe_per_id
    imgs = np.stack(
        [
            render_aligned_identity_sample(rng, p, 112)
            for p in ids
            for _ in range(per)
        ]
    )  # (n_ids * per, 112, 112, 3)

    import jax

    @jax.jit
    def embed(x):
        e = model.apply(variables, normalize_imagenet_style(x))
        return l2_normalize(e.astype(jnp.float32))

    embs = []
    for i in range(0, len(imgs), 128):
        chunk = imgs[i : i + 128]
        pad = 128 - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        embs.append(np.asarray(embed(jnp.asarray(chunk)))[: 128 - pad])
    embs = np.concatenate(embs).reshape(n_ids, per, -1)
    protos = embs[:, :enroll_per_id].mean(1)
    protos /= np.maximum(np.linalg.norm(protos, axis=1, keepdims=True), 1e-9)
    probes = embs[:, enroll_per_id:].reshape(n_ids * probe_per_id, -1)
    scores = probes @ protos.T  # (n_probes, n_ids)
    pred = scores.argmax(1)
    gt = np.repeat(np.arange(n_ids), probe_per_id)
    return {
        "n_ids": n_ids,
        "probes": int(len(gt)),
        "top1": round(float((pred == gt).mean()), 4),
        "mean_genuine_cos": round(
            float(scores[np.arange(len(gt)), gt].mean()), 4
        ),
        "checkpoint": os.path.basename(ckpt),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=200)
    ap.add_argument("--ids", type=int, default=100)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument(
        "--out",
        default=None,
        help="output JSON (default: docs/OOD_EVAL.json for the canonical "
        "full run; A/B runs with --weights/--detector-only default to a "
        "separate file so they can't clobber the committed table)",
    )
    ap.add_argument(
        "--weights",
        default=None,
        help="detector checkpoint (default: shipped serving default)",
    )
    ap.add_argument(
        "--detector-only",
        action="store_true",
        help="skip the embedder eval (fast detector A/B)",
    )
    args = ap.parse_args()

    if args.out is None:
        if args.weights or args.detector_only:
            tag = (
                os.path.splitext(os.path.basename(args.weights))[0]
                if args.weights
                else "default"
            )
            args.out = os.path.join(_REPO, "docs", f"OOD_EVAL_{tag}.json")
        else:
            args.out = os.path.join(_REPO, "docs", "OOD_EVAL.json")

    from facerecognition_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from facerecognition_tpu.preprocessing.face_detector import FaceDetector
    from facerecognition_tpu.training.ood_faces import OOD_FAMILIES
    from facerecognition_tpu.training.synthetic_faces import render_scene

    det = FaceDetector(weights=args.weights, confidence_threshold=0.5)
    report = {"detector": {}, "size": args.size}
    if args.weights:
        report["detector_weights"] = os.path.basename(args.weights)

    # In-distribution control row: same eval code on held-out seeds of the
    # TRAINING generator, so the OOD deltas have a denominator.
    rng = np.random.default_rng(123)
    ctrl_hits, n_ctrl = 0, args.scenes
    for _ in range(n_ctrl):
        img, boxes, lms, valid = render_scene(rng, args.size, 1, 1.0)
        gt = np.clip(boxes[0], 0, args.size)
        faces = det.detect_all(img)
        if any(
            iou(np.clip(np.asarray(f["bbox"], np.float32), 0, args.size), gt)
            >= 0.5
            for f in faces
        ):
            ctrl_hits += 1
    report["detector"]["in_distribution_control"] = {
        "scenes": n_ctrl,
        "recall@iou0.5": round(ctrl_hits / n_ctrl, 4),
    }
    log(f"control recall {ctrl_hits / n_ctrl:.3f}")

    for family in OOD_FAMILIES:
        r = eval_detector_family(det, family, args.scenes, args.size)
        report["detector"][family] = r
        log(f"{family}: {r}")

    if not args.detector_only:
        report["embedder_ood_appearance"] = eval_embedder_ood(args.ids)
        log(f"embedder: {report['embedder_ood_appearance']}")

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    log(f"wrote {args.out}")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
