"""Export a serving checkpoint (.msgpack) to a reference-loadable .pth.

Takes the ArcFace/FaceNet msgpack checkpoints this framework ships and
writes a torch checkpoint in the reference stack's exact state-dict layout
(models/arcface/train_arcface.py:755-773 / models/facenet/facenet_model.py
naming), so weights trained here run in the reference unchanged.

Run: PYTHONPATH=/root/repo python scripts/export_torch.py \
        --model arcface --ckpt assets/arcface_synthid_512.msgpack \
        --out /tmp/arcface_synthid_512.pth

Note: slim ArcFace checkpoints (non-(3,4,6,3) stage_sizes markers) export
fine but need a matching torch backbone — torchvision's resnet50 only
accepts the standard depth.
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["arcface", "facenet"], required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--prefix",
        default="model.",
        help="facenet backbone key prefix ('' for bare InceptionResnetV1)",
    )
    args = ap.parse_args()

    from facerecognition_tpu.models.port_torch import (
        export_arcface_state_dict,
        export_facenet_state_dict,
        save_torch_checkpoint,
    )
    from facerecognition_tpu.utils.serialization import load_variables

    variables = dict(load_variables(args.ckpt))
    stages = variables.pop("stage_sizes", None)
    if args.model == "arcface":
        sd = export_arcface_state_dict(variables)
        if stages is not None and tuple(int(s) for s in stages) != (3, 4, 6, 3):
            print(
                f"note: non-standard backbone depth {list(stages)} — "
                "the reference's torchvision resnet50 cannot load this; "
                "use a matching custom torch backbone"
            )
    else:
        sd = export_facenet_state_dict(variables, prefix=args.prefix)
    save_torch_checkpoint(args.out, sd)
    print(f"exported {args.ckpt} -> {args.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
