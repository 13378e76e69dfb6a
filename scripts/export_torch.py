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

    # Host-side conversion job — never claim (or block on) the TPU for it.
    # The env var alone doesn't stick here (axon sitecustomize); the config
    # update after import does.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from facerecognition_tpu.models.port_torch import (
        export_arcface_state_dict,
        export_facenet_state_dict,
        save_torch_checkpoint,
    )

    if args.model == "arcface":
        # Single source of truth for the stage_sizes arch marker (CLAUDE.md:
        # always load serving ckpts via load_arcface_checkpoint).
        from facerecognition_tpu.inference.extract_embeddings import (
            load_arcface_checkpoint,
        )

        model, variables = load_arcface_checkpoint(args.ckpt)
        sd = export_arcface_state_dict(variables)
        if tuple(model.stage_sizes) != (3, 4, 6, 3):
            print(
                f"note: non-standard backbone depth {list(model.stage_sizes)}"
                " — the reference's torchvision resnet50 cannot load this; "
                "use a matching custom torch backbone"
            )
    else:
        from facerecognition_tpu.utils.serialization import load_variables

        sd = export_facenet_state_dict(
            dict(load_variables(args.ckpt)), prefix=args.prefix
        )
    save_torch_checkpoint(args.out, sd)
    print(f"exported {args.ckpt} -> {args.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
