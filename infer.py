"""GenVC-compatible inference CLI (reference: infer.py:7-36).

Usage:
    python infer.py --model_path GenVC_small.pth --src_wav in.wav \
        --ref_audio ref.wav --output_path out.wav [--top_k 15] [--streaming]

Accepts either a torch ``.pth`` bundle (converted on the fly) or a
pre-converted ``.npz`` bundle (see tools/convert_checkpoint.py).
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str,
                        default="pre_trained/GenVC_large.pth")
    parser.add_argument("--device", type=str, default="tpu",
                        help="kept for reference-CLI compatibility; JAX picks "
                             "the platform")
    parser.add_argument("--src_wav", type=str, default="samples/EF4_ENG_0112_1.wav")
    parser.add_argument("--ref_audio", type=str, default="samples/EM1_ENG_0037_1.wav")
    parser.add_argument("--output_path", type=str, default="samples/converted.wav")
    parser.add_argument("--src_wavs", type=str, nargs="+", default=None,
                        help="batch serving mode (no reference analogue): "
                             "convert N sources in one batched pass; pair "
                             "with --ref_audios and --output_paths")
    parser.add_argument("--ref_audios", type=str, nargs="+", default=None,
                        help="per-source reference audio for --src_wavs "
                             "(a single path is broadcast)")
    parser.add_argument("--output_paths", type=str, nargs="+", default=None,
                        help="per-source output paths for --src_wavs "
                             "(default: <output_path stem>_<i>.wav)")
    parser.add_argument("--top_k", type=int, default=15)
    parser.add_argument("--num_beams", type=int, default=1,
                        help="beam search for non-streaming synthesis "
                             "(reference HiFiGANTrainer.inference surface); "
                             "1 = sampling")
    parser.add_argument("--beam_do_sample", action="store_true",
                        help="with --num_beams>1: HF beam_sample "
                             "(multinomial beam search with the sampling "
                             "warpers — the reference inference() default "
                             "do_sample=True path)")
    parser.add_argument("--length_penalty", type=float, default=1.0)
    parser.add_argument("--num_beam_groups", type=int, default=1,
                        help="with --num_beams>1: group/diverse beam search "
                             "(num_beams split into groups penalized by "
                             "--diversity_penalty for repeating earlier "
                             "groups' step tokens); 1 = plain beam search")
    parser.add_argument("--diversity_penalty", type=float, default=1.0)
    parser.add_argument("--penalty_alpha", type=float, default=0.0,
                        help="contrastive search for non-streaming synthesis "
                             "(vendored HF generator mode; candidates from "
                             "--contrastive_top_k); 0 = off")
    parser.add_argument("--contrastive_top_k", type=int, default=4)
    parser.add_argument("--streaming", action="store_true")
    parser.add_argument("--serve", type=int, default=0, metavar="SLOTS",
                        help="with --src_wavs --streaming: run the sources "
                             "through a continuous-batching StreamServer "
                             "with SLOTS decode slots (dynamic admission, "
                             "per-stream stats) instead of lockstep batching")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="run the GPT decode in bfloat16")
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8"],
                        help="int8-quantize the GPT decode weights (halves "
                             "the per-step HBM weight stream; logits move at "
                             "the ~1e-2 level vs full precision)")
    parser.add_argument("--kv_cache", type=str, default=None,
                        choices=["fp8"],
                        help="store the decode KV cache as float8_e4m3 "
                             "(halves the per-step cache read — the dominant "
                             "HBM stream at serving batch; scores move at "
                             "the ~1e-2 level)")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the synthesis "
                             "into DIR (view with tensorboard/xprof)")
    args = parser.parse_args()

    import os

    import jax

    try:  # persistent compile cache: repeat invocations skip minutes of compiles
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/genvc_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from genvc_tpu.dsp.audio_io import load_audio, write_wav
    from genvc_tpu.inference.pipeline import model_init

    if not os.path.exists(args.model_path):
        print(f"model checkpoint not found: {args.model_path}", file=sys.stderr)
        sys.exit(1)
    pipe = model_init(args.model_path,
                      compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                      seed=args.seed, quantize=args.quantize,
                      kv_cache_dtype=args.kv_cache)
    # top_k is the main inference quality knob; greedy (top_k=1) is preferred
    # for streaming (reference README.md:52)
    pipe.sampler = pipe.sampler.__class__(
        temperature=pipe.sampler.temperature, top_k=args.top_k,
        top_p=pipe.sampler.top_p,
        repetition_penalty=pipe.sampler.repetition_penalty)
    pipe._build_jits()

    if args.profile:
        import atexit

        import jax

        jax.profiler.start_trace(args.profile)
        atexit.register(jax.profiler.stop_trace)  # covers every exit path

    if args.src_wavs:
        refs_paths = args.ref_audios or [args.ref_audio]
        if len(refs_paths) == 1:
            refs_paths = refs_paths * len(args.src_wavs)
        if len(refs_paths) != len(args.src_wavs):
            print("--ref_audios must match --src_wavs (or be a single path)",
                  file=sys.stderr)
            sys.exit(1)
        srcs = [load_audio(p, pipe.content_sample_rate) for p in args.src_wavs]
        refs = [load_audio(p, pipe.sample_rate) for p in refs_paths]
        if any(s is None for s in srcs) or any(r is None for r in refs):
            print("failed to load audio", file=sys.stderr)
            sys.exit(1)
        if args.streaming and args.serve > 0:
            from genvc_tpu.serving.server import StreamServer

            server = StreamServer(pipe, slots=args.serve)
            sids = [server.submit(s, r) for s, r in zip(srcs, refs)]
            server.drain()
            wavs = []
            for sid in sids:
                wav, stats = server.result(sid)
                wavs.append(wav)
                rtf_txt = (f"{stats['rtf']:.3f}"
                           if stats["rtf"] is not None else "n/a")
                print(f"stream {sid}: latency "
                      f"{(stats['latency_s'] or 0) * 1000:.0f} ms, "
                      f"rtf {rtf_txt}")
            m = server.metrics()
            print(f"pool: {m['ticks']} ticks, mean occupancy "
                  f"{m['mean_occupancy']:.2f}/{m['slots']}, "
                  f"{m['completed']} completed")
        elif args.streaming:
            pipe.warmup(streaming=True)
            wavs, _, _ = pipe.synthesize_streaming_batch(srcs, refs)
        else:
            wavs = pipe.synthesize_batch(srcs, refs)
        outs = args.output_paths
        if not outs:
            stem, ext = os.path.splitext(args.output_path)
            outs = [f"{stem}_{i}{ext or '.wav'}" for i in range(len(wavs))]
        if len(outs) != len(wavs):
            print("--output_paths must match --src_wavs", file=sys.stderr)
            sys.exit(1)
        failures = 0
        for path, wav in zip(outs, wavs):
            if wav.shape[-1] == 0:
                print(f"{path}: decode produced no audio tokens (model "
                      "generated only the stop token); not written",
                      file=sys.stderr)
                failures += 1
                continue
            write_wav(path, wav, pipe.sample_rate)
            print(f"wrote {path}")
        sys.exit(1 if failures == len(wavs) else 0)

    src_wav = load_audio(args.src_wav, pipe.content_sample_rate)
    ref_audio = load_audio(args.ref_audio, pipe.sample_rate)
    if src_wav is None or ref_audio is None:
        print("failed to load audio", file=sys.stderr)
        sys.exit(1)

    if args.streaming:
        pipe.warmup(streaming=True)
        wav, latency, rtf = pipe.synthesize_streaming(src_wav, ref_audio)
    else:
        wav = pipe.synthesize(src_wav, ref_audio, num_beams=args.num_beams,
                              length_penalty=args.length_penalty,
                              penalty_alpha=args.penalty_alpha,
                              contrastive_top_k=args.contrastive_top_k,
                              beam_do_sample=args.beam_do_sample,
                              num_beam_groups=args.num_beam_groups,
                              diversity_penalty=args.diversity_penalty)

    if wav.shape[-1] == 0:
        print("decode produced no audio tokens (model generated only the "
              "stop token); no output written", file=sys.stderr)
        sys.exit(1)
    write_wav(args.output_path, wav, pipe.sample_rate)
    print(f"wrote {args.output_path}")


if __name__ == "__main__":
    main()
