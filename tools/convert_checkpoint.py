"""Convert a GenVC torch ``.pth`` bundle to a genvc_tpu ``.npz`` bundle.

Usage:
    python tools/convert_checkpoint.py GenVC_small.pth GenVC_small.npz

Writes ``<out>.npz`` (flattened param pytrees) plus ``<out>.config.json``.
Run once; afterwards inference never needs torch.
"""

import json
import sys


def main():
    src, dst = sys.argv[1], sys.argv[2]
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from genvc_tpu import checkpoint

    tree = checkpoint.convert_bundle(src)
    cfg = tree.pop("config")
    checkpoint.save_pytree_npz(dst if dst.endswith(".npz") else dst + ".npz", tree)
    base = dst[:-4] if dst.endswith(".npz") else dst
    with open(base + ".config.json", "w") as f:
        json.dump(cfg, f, indent=2)
    print(f"wrote {dst} and {base}.config.json")


if __name__ == "__main__":
    main()
