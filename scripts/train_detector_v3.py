"""Train detector v3: MXU-dense backbone + robustness-augmented curriculum.

v3 = DenseDetNet (models/detector_net.py — ~25% faster than BlazeFaceNet on
the MXU) trained on the upgraded scene curriculum (±30° rotation, partial
occlusion, JPEG artifacts — see synthetic_faces.render_scene), then Platt
score calibration. Saves assets/detector_v3_128.msgpack with the 'arch'
marker BEFORE running evals (a timeout must not destroy the training run).

Run: PYTHONPATH=/root/repo python scripts/train_detector_v3.py [--steps N]
"""

import argparse
import json
import os
import time

_ASSETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1.5e-3)
    ap.add_argument("--out", default=os.path.join(_ASSETS, "detector_v3_128.msgpack"))
    args = ap.parse_args()

    from facerecognition_tpu.training.train_detector import (
        CurriculumConfig,
        evaluate_detector,
        fit_score_calibration,
        train_detector_curriculum,
    )
    from facerecognition_tpu.utils.compile_cache import enable_compile_cache
    from facerecognition_tpu.utils.serialization import save_variables

    enable_compile_cache()
    t0 = time.time()
    config = CurriculumConfig(
        steps=args.steps,
        batch_size=args.batch,
        lr=args.lr,
        arch="dense",
        max_faces=2,
    )
    variables, history = train_detector_curriculum(
        config,
        log_every=250,
        progress=lambda s, l: print(
            f"step {s}: loss {l:.4f} ({time.time()-t0:.0f}s)", flush=True
        ),
    )
    # SAVE FIRST (uncalibrated) so eval/calibration failures can't lose it.
    save_variables(args.out, {"params": variables["params"], "arch": "dense"})
    print(f"saved (uncalibrated) -> {args.out}", flush=True)

    from facerecognition_tpu.preprocessing.face_detector import FaceDetector

    det = FaceDetector(weights=args.out, confidence_threshold=0.3)
    assert det.arch == "dense", det.arch
    quality = evaluate_detector(det, n_scenes=250)
    print("held-out quality:", json.dumps(quality), flush=True)

    a, b = fit_score_calibration(det, n_scenes=300)
    print(f"calibration: a={a:.4f} b={b:.4f}", flush=True)
    save_variables(
        args.out,
        {
            "params": variables["params"],
            "arch": "dense",
            "calibration": {"a": a, "b": b},
        },
    )
    print(f"saved (calibrated) -> {args.out}", flush=True)

    # Re-evaluate with calibration active at the serving threshold.
    det2 = FaceDetector(weights=args.out, confidence_threshold=0.5)
    q2 = evaluate_detector(det2, n_scenes=250, seed=778)
    print("calibrated@0.5 quality:", json.dumps(q2), flush=True)
    print(f"total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
