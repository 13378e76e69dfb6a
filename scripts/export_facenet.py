"""Export a FaceNet training checkpoint to the serving msgpack format.

Restores the orbax training checkpoint (best/last) written by
training/train_facenet.py and strips it to the params+batch_stats tree the
inference loaders consume (models/port_torch.load_facenet_model /
RecognitionEngine(model_type='facenet')).

Run: PYTHONPATH=/root/repo python scripts/export_facenet.py \
        --ckpt-dir checkpoints/facenet --tag best \
        --out assets/facenet_synthid_512.msgpack
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="checkpoints/facenet")
    ap.add_argument("--tag", default="best")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from facerecognition_tpu.training.checkpoint import CheckpointManager
    from facerecognition_tpu.utils.serialization import save_variables

    mgr = CheckpointManager(args.ckpt_dir)
    tree, meta = mgr.restore(args.tag)
    save_variables(
        args.out,
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
    )
    hist = (meta or {}).get("history") or []
    last = hist[-1] if hist else {}
    print(
        f"exported {args.ckpt_dir}/ckpt_{args.tag} -> {args.out} "
        f"(epoch {last.get('epoch')}, val_loss {last.get('val_loss')}, "
        f"ver_acc {last.get('verification_accuracy')})"
    )


if __name__ == "__main__":
    main()
