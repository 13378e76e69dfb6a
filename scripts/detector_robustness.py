"""Real-photo robustness matrix for the face detector.

Sweeps the one real photograph in this environment (the reference's test
upload) through rotation, scale, crop, brightness/contrast, JPEG quality,
occlusion, and blur, and reports detection recall + IoU vs the
hand-annotated ground-truth box per transform (VERDICT r2 item 5; the
reference's MTCNN handles arbitrary uploads, preprocessing/
face_detector.py:144-210, but ships no such measurement).

Output: a markdown table on stdout (paste into docs/DETECTOR.md) + JSON.

Run: PYTHONPATH=/root/repo python scripts/detector_robustness.py \
        [--weights assets/detector_v3_128.msgpack]
"""

import argparse
import json
import os

import cv2
import numpy as np

PHOTO = "/root/reference/uploads/anh1.jpg"
# Hand-annotated face box (x1, y1, x2, y2) — the same ground truth as
# tests/test_real_face.py (tests/fixtures/anh1_gt.json).
_GT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "anh1_gt.json",
)
GT_BOX = np.array(json.load(open(_GT))["bbox"], np.float32)


def _iou(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def _transform_box(box, m):
    """Axis-aligned bounding box of an affine-transformed box."""
    corners = np.array(
        [
            [box[0], box[1]],
            [box[2], box[1]],
            [box[0], box[3]],
            [box[2], box[3]],
        ],
        np.float32,
    )
    pts = corners @ m[:, :2].T + m[:, 2]
    return np.array(
        [pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()],
        np.float32,
    )


def variants(img):
    """Yield (group, name, image, gt_box) transform cases."""
    h, w = img.shape[:2]
    yield "baseline", "original", img, GT_BOX
    # ±45° probes the v4 curriculum's widened rotation range (v3 trained
    # to ±30°); the GT box of a rotated face grows under axis-aligned
    # re-boxing, so IoU is structurally lower at 45° even for a perfect
    # detection.
    for deg in (-45, -30, -15, 15, 30, 45):
        m = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
        out = cv2.warpAffine(img, m, (w, h), borderMode=cv2.BORDER_REFLECT)
        yield "rotation", f"{deg:+d}°", out, _transform_box(GT_BOX, m)
    for s in (0.3, 0.5, 2.0):
        sw, sh = int(w * s), int(h * s)
        out = cv2.resize(img, (sw, sh), interpolation=cv2.INTER_AREA)
        yield "scale", f"{s}x", out, GT_BOX * s
    # crops: keep the face but cut context (tight) / shift it off-center
    cx1, cy1 = int(GT_BOX[0] * 0.5), int(GT_BOX[1] * 0.5)
    cx2 = int(min(GT_BOX[2] + 0.2 * (GT_BOX[2] - GT_BOX[0]), w))
    cy2 = int(min(GT_BOX[3] + 0.2 * (GT_BOX[3] - GT_BOX[1]), h))
    crop = img[cy1:cy2, cx1:cx2]
    yield "crop", "tight", crop, GT_BOX - [cx1, cy1, cx1, cy1]
    half = img[:, w // 4 :]
    yield "crop", "left-quarter cut", half, GT_BOX - [w // 4, 0, w // 4, 0]
    for name, gain, bias in (
        ("dark 0.4x", 0.4, 0),
        ("bright 1.6x", 1.6, 20),
        ("low-contrast", 0.5, 96),
    ):
        out = np.clip(img.astype(np.float32) * gain + bias, 0, 255).astype(
            np.uint8
        )
        yield "lighting", name, out, GT_BOX
    for q in (50, 25, 10):
        ok, enc = cv2.imencode(".jpg", img, [int(cv2.IMWRITE_JPEG_QUALITY), q])
        out = cv2.imdecode(enc, cv2.IMREAD_COLOR)
        yield "jpeg", f"q={q}", out, GT_BOX
    for sigma in (2.0, 4.0):
        out = cv2.GaussianBlur(img, (0, 0), sigma)
        yield "blur", f"σ={sigma}", out, GT_BOX
    # occlusion: gray bar over the eyes / lower face
    for name, (fy1, fy2) in (("eyes covered", (0.25, 0.45)), ("mouth covered", (0.65, 0.9))):
        out = img.copy()
        y1 = int(GT_BOX[1] + fy1 * (GT_BOX[3] - GT_BOX[1]))
        y2 = int(GT_BOX[1] + fy2 * (GT_BOX[3] - GT_BOX[1]))
        out[y1:y2, int(GT_BOX[0]) : int(GT_BOX[2])] = 128
        yield "occlusion", name, out, GT_BOX


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None)
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()

    from facerecognition_tpu.preprocessing.face_detector import FaceDetector
    from facerecognition_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    bgr = cv2.imread(PHOTO)
    assert bgr is not None, PHOTO
    img = bgr  # FaceDetector takes RGB; cv2 loads BGR
    rgb = img[..., ::-1].copy()

    det = FaceDetector(weights=args.weights, confidence_threshold=args.threshold)
    print(f"detector arch={det.arch} threshold={args.threshold}\n")
    rows, results = [], []
    for group, name, im_bgr, gt in variants(img):
        im_rgb = np.ascontiguousarray(im_bgr[..., ::-1])
        dets = det.detect_all(im_rgb)
        best_iou, best_conf = 0.0, 0.0
        for d in dets:
            i = _iou(np.asarray(d["bbox"], np.float32), gt)
            if i > best_iou:
                best_iou, best_conf = i, float(d["confidence"])
        found = best_iou >= 0.5
        rows.append(
            f"| {group} | {name} | {'✓' if found else '✗'} "
            f"| {best_iou:.2f} | {best_conf:.2f} | {len(dets)} |"
        )
        results.append(
            dict(
                group=group,
                name=name,
                detected=bool(found),
                iou=round(float(best_iou), 3),
                conf=round(float(best_conf), 3),
                n_dets=len(dets),
            )
        )
    print("| group | transform | detected | IoU | conf | #dets |")
    print("|---|---|---|---|---|---|")
    print("\n".join(rows))
    n_ok = sum(r["detected"] for r in results)
    print(f"\nrecall@IoU0.5: {n_ok}/{len(results)}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
