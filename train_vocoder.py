"""Train the HiFi-GAN vocoder — stage 4
(reference: train_vocoder.py; hyperparameters mirrored exactly: frozen GPT,
fixed 8-token segments = 0.64 s, batch 64, lr 2e-4 betas (0.8, 0.99))."""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_metafile", default="metafiles/libritts/train.txt")
    ap.add_argument("--test_metafile", default="metafiles/libritts/test.txt")
    ap.add_argument("--mel_norm_file",
                    default="pre_trained/mel_stats.npy")
    ap.add_argument("--acoustic_dvae_checkpoint",
                    default="pre_trained/acoustic_dvae.pth")
    ap.add_argument("--content_dvae_checkpoint",
                    default="pre_trained/content_dvae.pth")
    ap.add_argument("--contentvec_model_path",
                    default="pre_trained/contentVec.pt")
    ap.add_argument("--gpt_checkpoint", default="pre_trained/gpt.pth")
    ap.add_argument("--hifigan_checkpoint", default=None)
    ap.add_argument("--output_path", default="exp/HiFiGAN_LibriTTS")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--use_wandb", action="store_true")
    ap.add_argument("--num_workers", type=int, default=24)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--max_eval_batches", type=int, default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="2-step end-to-end smoke on synthetic data")
    ap.add_argument("--bf16_discs", action="store_true",
                    help="run discriminator conv stacks in bfloat16 "
                         "(~2x faster GAN step; spectral front-ends and all "
                         "losses stay f32)")
    args = ap.parse_args()

    from genvc_tpu.config import (AudioConfig, GenVCConfig, GPTModelArgs,
                                  VAEConfig, VocoderConfig)
    from genvc_tpu.train.runner import run_vocoder_training

    acoustic_vae = VAEConfig(
        audio=AudioConfig(dvae_sample_rate=24000),
        mel_norm_file=args.mel_norm_file, num_channels=80, num_tokens=1024,
        codebook_dim=512, hidden_dim=512, num_resnet_blocks=3, kernel_size=3,
        num_layers=2)
    content_vae = VAEConfig(
        audio=AudioConfig(dvae_sample_rate=16000),
        mel_norm_file=args.mel_norm_file, num_channels=256, num_tokens=256,
        codebook_dim=512, hidden_dim=512, num_resnet_blocks=3, kernel_size=3,
        num_layers=2)
    model_args = GPTModelArgs(
        mel_norm_file=args.mel_norm_file, gpt_num_audio_tokens=1026,
        gpt_start_audio_token=1024, gpt_stop_audio_token=1025,
        gpt_start_text_token=256, gpt_stop_text_token=257,
        gpt_number_text_tokens=258, gpt_fix_condition_embeddings=True,
        gpt_use_masking_gt_prompt_approach=True,
        min_text_length=8, max_text_length=8,  # fixed 0.64 s segments
        gpt_n_heads=4, gpt_layers=30,
        gpt_checkpoint=args.gpt_checkpoint,
        hifigan_checkpoint=args.hifigan_checkpoint)

    cfg = GenVCConfig(
        contentvec_model_path=args.contentvec_model_path,
        acoustic_dvae_checkpoint=args.acoustic_dvae_checkpoint,
        content_dvae_checkpoint=args.content_dvae_checkpoint,
        model_args=model_args, audio=AudioConfig(),
        content_dvae_config=content_vae, acoustic_dvae_config=acoustic_vae,
        vocoder_config=VocoderConfig(),
        batch_size=args.batch_size, eval_batch_size=args.batch_size,
        num_loader_workers=args.num_workers, epochs=args.epochs,
        print_step=50, save_step=5000, save_n_checkpoints=2,
        optimizer="AdamW", output_path=args.output_path,
        optimizer_wd_only_on_weights=True, lr=args.lr,
        optimizer_params={"betas": [0.8, 0.99], "eps": 1e-8,
                          "weight_decay": 1e-6},
        lr_decay=0.98, weight_decay=1e-6, warmup_steps=1000,
        max_grad_norm=1.0, train_metafile=args.train_metafile,
        test_metafile=args.test_metafile, use_wandb=args.use_wandb,
        wandb_project="hifi-gan", wandb_run_name="libritts")
    if args.smoke:
        from genvc_tpu.testing_synthetic import smoke_overrides

        cfg.output_path = "exp/smoke_vocoder"
        smoke_overrides(cfg, "exp/smoke_assets_voc", need_gpt_ckpt=True)
        run_vocoder_training(cfg, max_steps=2, max_eval_batches=1,
                             bf16_discs=args.bf16_discs)
        return
    run_vocoder_training(cfg, max_steps=args.max_steps,
                         max_eval_batches=args.max_eval_batches,
                         bf16_discs=args.bf16_discs)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
