"""Fine-tune detector v3 on the widened face-fraction curriculum.

The first v3 run mislocalized near-full-frame faces (tight portrait crops)
because the curriculum capped single-face width at 0.62 of the frame; the
cap is now 0.80. Warm-starts from the saved v3 params, short run at low lr,
then re-calibrates and re-saves in place (save-first discipline).

Run: PYTHONPATH=/root/repo python scripts/finetune_detector_v3.py
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
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument(
        "--ckpt", default=os.path.join(_ASSETS, "detector_v3_128.msgpack")
    )
    args = ap.parse_args()

    from facerecognition_tpu.training.train_detector import (
        CurriculumConfig,
        evaluate_detector,
        fit_score_calibration,
        train_detector_curriculum,
    )
    from facerecognition_tpu.utils.compile_cache import enable_compile_cache
    from facerecognition_tpu.utils.serialization import (
        load_variables,
        save_variables,
    )

    enable_compile_cache()
    t0 = time.time()
    init = load_variables(args.ckpt)
    init.pop("calibration", None)
    init.pop("arch", None)
    config = CurriculumConfig(
        steps=args.steps, lr=args.lr, arch="dense", max_faces=2
    )
    variables, _ = train_detector_curriculum(
        config,
        log_every=250,
        progress=lambda s, l: print(
            f"step {s}: loss {l:.4f} ({time.time()-t0:.0f}s)", flush=True
        ),
        init_variables=init,
    )
    save_variables(args.ckpt, {"params": variables["params"], "arch": "dense"})
    print(f"saved (uncalibrated) -> {args.ckpt}", flush=True)

    from facerecognition_tpu.preprocessing.face_detector import FaceDetector

    det = FaceDetector(weights=args.ckpt, confidence_threshold=0.3)
    quality = evaluate_detector(det, n_scenes=250)
    print("held-out quality:", json.dumps(quality), flush=True)
    a, b = fit_score_calibration(det, n_scenes=300)
    print(f"calibration: a={a:.4f} b={b:.4f}", flush=True)
    save_variables(
        args.ckpt,
        {
            "params": variables["params"],
            "arch": "dense",
            "calibration": {"a": a, "b": b},
        },
    )
    print(f"saved (calibrated) -> {args.ckpt} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
