"""On-chip verification harness: drive the public API on the real TPU.

The pytest suite runs on the virtual CPU mesh (tests/conftest.py), so a
green suite is NOT TPU verification. This script is the chip-side
counterpart (the /verify surface, .claude/skills/verify/SKILL.md): it
drives detector checkpoint helpers, the bench's loader parity, the int8
engine end-to-end on the one real photograph in this environment, and a
short resident-step training run — all on whatever platform `import jax`
resolves to (the axon TPU by default).

Run: PYTHONPATH=/root/repo python -u scripts/verify_on_tpu.py
Prints VERIFY OK on success. ~10-20 min on a cold compile cache, ~2 min
warm (the persistent cache is enabled on startup).
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

REAL_PHOTO = os.environ.get("VERIFY_PHOTO", "/root/reference/uploads/anh1.jpg")
T0 = time.time()


def log(msg):
    print(f"[verify +{time.time()-T0:.0f}s] {msg}", flush=True)


def main():
    from facerecognition_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax

    log(f"platform: {jax.devices()}")

    # --- 1. detector checkpoint helpers on the real photo -------------------
    from facerecognition_tpu.preprocessing.face_detector import (
        FaceDetector,
        default_detector_checkpoint,
        load_detector_checkpoint,
    )

    ckpt = default_detector_checkpoint()
    assert ckpt and os.path.exists(ckpt), f"default detector ckpt missing: {ckpt}"
    arch, variables, cal = load_detector_checkpoint(ckpt)
    log(f"detector ckpt: {os.path.basename(ckpt)} arch={arch} "
        f"cal={'yes' if cal else 'no'}")

    det = FaceDetector(weights=ckpt, confidence_threshold=0.5)
    if os.path.exists(REAL_PHOTO):
        from PIL import Image

        photo = np.asarray(Image.open(REAL_PHOTO).convert("RGB"))
    else:  # dataset-free fallback: a rendered face scene
        from facerecognition_tpu.training.synthetic_faces import render_scene

        photo = render_scene(np.random.default_rng(0), size=640, p_face=1.0)[0]
        log("real photo absent; using a rendered scene")
    face = det.detect(photo)
    assert face is not None, "no face detected"
    x1, y1, x2, y2 = face["bbox"]
    assert face["confidence"] > 0.8, f"low confidence {face['confidence']}"
    assert (x2 - x1) > 50 and (y2 - y1) > 50, f"implausible box {face['bbox']}"
    log(f"detected conf={face['confidence']:.3f} box={face['bbox']}")

    # --- 2. bench.load_detector parity with the serving chain ---------------
    import bench

    _, bvars, _ = bench.load_detector(128)
    leaves_b = jax.tree_util.tree_leaves(bvars)
    leaves_d = jax.tree_util.tree_leaves(variables)
    assert len(leaves_b) == len(leaves_d), "bench/serving param trees differ"
    for lb, ld in zip(leaves_b, leaves_d):
        np.testing.assert_array_equal(np.asarray(lb), np.asarray(ld))
    log("bench.load_detector matches serving chain (bit-exact params)")

    # --- 3. engine int8 match_kernel end-to-end ------------------------------
    from facerecognition_tpu.inference.engine import RecognitionEngine

    eng = RecognitionEngine(
        checkpoint_path=os.path.join(_REPO, "assets/arcface_synthid_512.msgpack"),
        detector=det,
        match_kernel="int8",
        threshold=0.3,
    )
    rng = np.random.default_rng(0)
    fakes = rng.normal(size=(64, 512)).astype(np.float32)
    fakes /= np.linalg.norm(fakes, axis=1, keepdims=True)
    eng.gallery.add_many([f"fake_{i:03d}" for i in range(64)], fakes)

    # Enroll through the same detect→align→embed path recognize() takes so
    # the self-match cosine is ~1.0 (int8 quantization shifts O(1e-3)).
    emb = eng.extract_embedding(photo)
    assert emb is not None
    eng.gallery.add("subject", np.asarray(emb))

    res = eng.recognize(photo)
    assert res["status"] == "success", res["status"]
    assert res["identity"] == "subject", f"int8 match picked {res['identity']}"
    assert res["confidence"] > 0.95, f"low self-match conf {res['confidence']}"
    margin = res["confidence"] - res["top_k"][1][1]
    assert margin > 0.5, f"weak separation from fakes: {res['top_k'][:2]}"
    log(f"int8 engine recognized subject conf={res['confidence']:.4f} "
        f"vs 64 fakes")

    # --- 4. short resident-step train with loss drop -------------------------
    from facerecognition_tpu.training.train_synthid import (
        SynthIdConfig,
        train_synthid,
    )

    # 8 epochs: after the one-time compile each epoch is ~0.2s, and the
    # margin ramp spans the first 2 epochs — enough steps that the
    # learning-signal assertion is solid, not a coin flip.
    cfg = SynthIdConfig(
        n_ids=24, train_per_id=8, val_per_id=2, batch_size=64, epochs=8,
        lr=0.05,
    )
    _, history, _ = train_synthid(
        cfg, log=lambda m: print(f"  [train] {m}", flush=True)
    )
    # Learning signal: train accuracy must rise. (NOT loss — the ArcFace
    # margin ramp means early-epoch loss legitimately increases while the
    # model improves.)
    accs = [row["train_acc"] for row in history]
    losses = [row["loss"] for row in history]
    assert np.isfinite(losses).all(), f"non-finite loss: {losses}"
    assert max(accs[3:]) > accs[0] + 0.05, f"no learning: {accs}"
    log(
        f"resident {cfg.epochs}-epoch train: acc {accs[0]:.3f} -> "
        f"{max(accs):.3f} (loss {losses[0]:.2f} -> {losses[-1]:.2f}; "
        f"margin ramps over the first 2 epochs)"
    )

    print("VERIFY OK", flush=True)


if __name__ == "__main__":
    main()
