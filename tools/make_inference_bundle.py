"""Assemble a single-file inference bundle from stage training artifacts.

Reference analogue: the released ``GenVC_*.pth`` bundles hold the composed
``HiFiGANTrainer`` state dict + config (SURVEY.md §5.4c). Here the four stage
artifacts (each a torch ``.pth`` stage checkpoint or an orbax/npz genvc_tpu
checkpoint) merge into one ``.npz`` + ``.config.json`` consumable by
``infer.py`` / ``genvc_tpu.inference.pipeline.model_init``.

Usage:
  python tools/make_inference_bundle.py \
      --gpt exp/genVC/ckpt/... --hifigan exp/HiFiGAN/... \
      --acoustic_dvae pre_trained/acoustic_dvae.pth \
      --content_dvae pre_trained/content_dvae.pth \
      --contentvec pre_trained/contentVec.pt \
      --config config.json --out GenVC_mine.npz
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_family(path: str, family: str):
    from genvc_tpu import checkpoint as ck

    if path.endswith(".npz"):
        return ck.load_pytree_npz(path)
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if family == "gpt":
        sd = ck.strip_prefix(sd, "gpt.") if any(
            k.startswith("gpt.") for k in sd) else sd
        n = max(int(k.split(".")[2]) for k in sd if k.startswith("gpt.h.")) + 1
        return ck.convert_gpt(sd, n)
    if family == "hifigan":
        sd = ck.strip_prefix(sd, "hifigan.") if any(
            k.startswith("hifigan.") for k in sd) else sd
        return ck.convert_hifigan(sd)
    if family in ("acoustic_dvae", "content_dvae"):
        sd = ck.strip_prefix(sd, "dvae.") if any(
            k.startswith("dvae.") for k in sd) else sd
        return ck.convert_dvae(sd)
    if family == "contentvec":
        sd = {k: v for k, v in sd.items() if hasattr(v, "numpy")}
        n = max(int(k.split(".")[2]) for k in sd
                if k.startswith("encoder.layers.")) + 1
        return ck.convert_contentvec(sd, n_layers=n)
    raise ValueError(family)


def main():
    ap = argparse.ArgumentParser()
    for name in ("gpt", "hifigan", "acoustic_dvae", "content_dvae",
                 "contentvec"):
        ap.add_argument(f"--{name}", required=True)
    ap.add_argument("--config", required=True,
                    help="json file with the GenVCConfig dict")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from genvc_tpu import checkpoint as ck

    tree = {}
    for fam in ("gpt", "hifigan", "acoustic_dvae", "content_dvae",
                "contentvec"):
        tree[fam] = load_family(getattr(args, fam), fam)
    with open(args.config) as f:
        cfg = json.load(f)
    out = args.out if args.out.endswith(".npz") else args.out + ".npz"
    ck.save_pytree_npz(out, tree)
    with open(out[:-4] + ".config.json", "w") as f:
        json.dump(cfg, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
