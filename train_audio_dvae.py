"""Train the acoustic (mel) discrete VAE — stage 1
(reference: train_audio_dvae.py; hyperparameters mirrored exactly)."""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_metafile", default="metafiles/libritts/train.txt")
    ap.add_argument("--test_metafile", default="metafiles/libritts/test.txt")
    ap.add_argument("--mel_norm_file",
                    default="pre_trained/mel_stats.npy")
    ap.add_argument("--output_path", default="exp/audio_dvae")
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--use_wandb", action="store_true")
    ap.add_argument("--num_workers", type=int, default=16)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--max_eval_batches", type=int, default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="2-step end-to-end smoke on synthetic data")
    args = ap.parse_args()

    from genvc_tpu.config import AudioConfig, VAEConfig
    from genvc_tpu.train.runner import run_vae_training

    audio = AudioConfig(dvae_sample_rate=24000, sample_rate=24000)
    cfg = VAEConfig(
        audio=audio, mel_norm_file=args.mel_norm_file,
        feat_type="Mel-spectrogram", warmup_steps=1000,
        batch_size=args.batch_size, eval_batch_size=32, lr=args.lr,
        opt_betas=[0.5, 0.9], num_loader_workers=args.num_workers,
        max_wav_len=24000 * 6, train_metafile=args.train_metafile,
        test_metafile=args.test_metafile, epochs=args.epochs,
        grad_clip_norm=0.5, output_path=args.output_path,
        use_wandb=args.use_wandb, wandb_project="audio_dvae",
        wandb_run_name="libritts", save_n_checkpoints=2, save_step=5000,
        num_channels=80, num_tokens=1024, codebook_dim=512, hidden_dim=512,
        num_resnet_blocks=3, kernel_size=3, num_layers=2)
    if args.smoke:
        from genvc_tpu.testing_synthetic import smoke_vae_overrides

        cfg.output_path = "exp/smoke_audio_dvae"
        smoke_vae_overrides(cfg, "exp/smoke_assets_advae")
        run_vae_training(cfg, max_steps=2, max_eval_batches=1)
        return
    run_vae_training(cfg, max_steps=args.max_steps,
                     max_eval_batches=args.max_eval_batches)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
