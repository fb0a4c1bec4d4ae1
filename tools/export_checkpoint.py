"""Export a genvc_tpu ``.npz`` bundle back to a reference-format ``.pth``.

Usage:
    python tools/export_checkpoint.py GenVC_small.npz GenVC_small.pth

The inverse of tools/convert_checkpoint.py: a model trained (or fine-tuned)
on this framework exports to the exact ``{'model': state_dict, 'config':
dict}`` bundle the reference's ``model_init`` loads
(/root/reference/inference/model_init.py:11-22), so TPU checkpoints deploy
anywhere the reference runs. Reads ``<src>.config.json`` next to the npz.
"""

import json
import sys


def main():
    src, dst = sys.argv[1], sys.argv[2]
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from genvc_tpu import checkpoint

    tree = checkpoint.load_pytree_npz(src)
    base = src[:-4] if src.endswith(".npz") else src
    try:
        with open(base + ".config.json") as f:
            tree["config"] = json.load(f)
    except FileNotFoundError:
        tree.setdefault("config", None)
        print(f"warning: {base}.config.json not found; exporting without an "
              "embedded config", file=sys.stderr)
    checkpoint.export_bundle(tree, dst)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
