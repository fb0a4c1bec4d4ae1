"""Fetch the published GenVC checkpoints and convert them to genvc_tpu bundles.

One command, when network is available:

    python tools/fetch_checkpoints.py [--model small|large|all] [--dest pre_trained/]

Downloads (reference README.md:53-58, 93):
  * ``GenVC_small.pth``  — LibriTTS model            (HF ZexinCai/GenVC)
  * ``GenVC_large.pth``  — LibriTTS+MLS+CommonVoice  (HF ZexinCai/GenVC)
  * ``contentVec.pt``    — fairseq ContentVec encoder (HF mirror of the
                            legacy-500 checkpoint; the reference points at an
                            IBM Box link that is not scriptable)

then runs ``tools/convert_checkpoint.py`` on each GenVC bundle to produce the
``.npz`` + ``.config.json`` pair that ``infer.py`` consumes natively.

Integrity: sizes and sha256 are verified when known. The GenVC bundle hashes
are NOT pre-recorded here (this environment has zero egress — see
docs/checkpoint_fetch_attempt.md for the failed-fetch transcript); on first
successful download the script prints the sha256 so it can be pinned below.
"""

import argparse
import hashlib
import os
import subprocess
import sys
import urllib.request

HF = "https://huggingface.co"

ARTIFACTS = {
    "small": {
        "url": f"{HF}/ZexinCai/GenVC/resolve/main/pre_trained/GenVC_small.pth",
        "file": "GenVC_small.pth",
        "sha256": None,  # pin after first successful fetch
    },
    "large": {
        "url": f"{HF}/ZexinCai/GenVC/resolve/main/pre_trained/GenVC_large.pth",
        "file": "GenVC_large.pth",
        "sha256": None,
    },
    "contentvec": {
        # reference README.md:93 points at an IBM Box share for
        # checkpoint_best_legacy_500.pt; ZexinCai/GenVC also mirrors it in
        # pre_trained/. Try the GenVC mirror first, then the widely-used HF
        # mirror of the same fairseq checkpoint.
        "url": f"{HF}/ZexinCai/GenVC/resolve/main/pre_trained/contentVec.pt",
        "fallback_url": (
            f"{HF}/lengyue233/content-vec-best/resolve/main"
            "/checkpoint_best_legacy_500.pt"),
        "file": "contentVec.pt",
        "sha256": None,
    },
    "mel_stats": {
        "url": f"{HF}/ZexinCai/GenVC/resolve/main/pre_trained/mel_stats.pth",
        "file": "mel_stats.pth",
        "sha256": None,
    },
}


def sha256_of(path, chunk=1 << 20):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def fetch(url, dest):
    print(f"fetching {url} -> {dest}")
    tmp = dest + ".part"
    req = urllib.request.Request(url, headers={"User-Agent": "genvc-tpu/1.0"})
    with urllib.request.urlopen(req, timeout=60) as r, open(tmp, "wb") as f:
        total = int(r.headers.get("Content-Length") or 0)
        done = 0
        while True:
            b = r.read(1 << 20)
            if not b:
                break
            f.write(b)
            done += len(b)
            if total:
                print(f"\r  {done / 1e6:.0f}/{total / 1e6:.0f} MB", end="")
    print()
    os.replace(tmp, dest)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="small",
                    choices=["small", "large", "all"])
    ap.add_argument("--dest", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pre_trained"))
    ap.add_argument("--skip-convert", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.dest, exist_ok=True)
    models = ["small", "large"] if args.model == "all" else [args.model]
    want = models + ["contentvec", "mel_stats"]

    failures = []
    for name in want:
        spec = ARTIFACTS[name]
        dest = os.path.join(args.dest, spec["file"])
        if os.path.exists(dest):
            print(f"{dest}: already present ({os.path.getsize(dest)} bytes)")
        else:
            try:
                fetch(spec["url"], dest)
            except Exception as e:
                fb = spec.get("fallback_url")
                if fb:
                    print(f"  primary failed ({e}); trying fallback")
                    try:
                        fetch(fb, dest)
                    except Exception as e2:
                        failures.append((name, str(e2)))
                        continue
                else:
                    failures.append((name, str(e)))
                    continue
        digest = sha256_of(dest)
        if spec["sha256"] and digest != spec["sha256"]:
            print(f"ERROR: {dest} sha256 mismatch: {digest}")
            failures.append((name, "sha256 mismatch"))
        else:
            print(f"  sha256 {digest}  <- pin this in ARTIFACTS[{name!r}]")

    if not args.skip_convert:
        for name in models:
            pth = os.path.join(args.dest, ARTIFACTS[name]["file"])
            if not os.path.exists(pth):
                continue
            npz = pth[:-4] + ".npz"
            print(f"converting {pth} -> {npz}")
            subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "convert_checkpoint.py"), pth, npz],
                check=True)

    if failures:
        print("\nFAILED artifacts:")
        for name, err in failures:
            print(f"  {name}: {err}")
        sys.exit(1)
    print("\nall artifacts present; run e.g.:\n"
          f"  python infer.py --model_path {args.dest}/GenVC_small.npz "
          "--src_wav samples/src.wav --ref_audio samples/ref.wav "
          "--output_path out.wav")


if __name__ == "__main__":
    main()
