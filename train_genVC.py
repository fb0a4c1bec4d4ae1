"""Train the GenVC GPT decoder — stage 3
(reference: train_genVC.py; hyperparameters mirrored exactly)."""

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
    ap.add_argument("--gpt_checkpoint", default=None)
    ap.add_argument("--output_path", default="exp/genVC_contentVec_LibriTTS")
    ap.add_argument("--batch_size", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--use_wandb", action="store_true")
    ap.add_argument("--num_workers", type=int, default=24)
    ap.add_argument("--n_model", type=int, default=1,
                    help="tensor-parallel mesh axis size (megatron sharding)")
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--max_eval_batches", type=int, default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="2-step end-to-end smoke on synthetic data")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute on the trainable GPT "
                         "(f32 master params; frozen tokenizers stay f32)")
    ap.add_argument("--remat", default="0", choices=["0", "1", "dots"],
                    help="activation rematerialization: 0 store-all, 1 full "
                         "per-block, dots = save MXU matmul outputs / "
                         "recompute elementwise glue (fits B=24 flagship "
                         "at near-no-remat speed)")
    ap.add_argument("--content_bf16", action="store_true",
                    help="bf16 frozen ContentVec forward in feature prep "
                         "(~17%% faster B=24 step; content codes may flip "
                         "vs f32 — see gpt_stage.prepare_features)")
    args = ap.parse_args()

    from genvc_tpu.config import (AudioConfig, GenVCConfig, GPTModelArgs,
                                  VAEConfig)
    from genvc_tpu.train.runner import run_gpt_training

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
        gpt_use_masking_gt_prompt_approach=True, min_text_length=15,
        max_text_length=100, gpt_n_heads=4, gpt_layers=30,
        gpt_checkpoint=args.gpt_checkpoint)

    cfg = GenVCConfig(
        contentvec_model_path=args.contentvec_model_path,
        acoustic_dvae_checkpoint=args.acoustic_dvae_checkpoint,
        content_dvae_checkpoint=args.content_dvae_checkpoint,
        model_args=model_args, audio=AudioConfig(),
        content_dvae_config=content_vae, acoustic_dvae_config=acoustic_vae,
        batch_size=args.batch_size, eval_batch_size=args.batch_size,
        num_loader_workers=args.num_workers, epochs=args.epochs,
        print_step=50, save_step=5000, save_n_checkpoints=2,
        optimizer="AdamW", output_path=args.output_path,
        optimizer_wd_only_on_weights=True, lr=args.lr,
        optimizer_params={"betas": [0.9, 0.96], "eps": 1e-8,
                          "weight_decay": 1e-6},
        lr_scheduler="MultiStepLR",
        lr_scheduler_params={"milestones": [10, 25, 35, 50], "gamma": 0.5},
        weight_decay=1e-6, warmup_steps=4000, max_grad_norm=1.0,
        train_metafile=args.train_metafile, test_metafile=args.test_metafile,
        use_wandb=args.use_wandb, wandb_project="genVC",
        wandb_run_name="libritts")
    if args.smoke:
        from genvc_tpu.testing_synthetic import smoke_overrides

        cfg.output_path = "exp/smoke_gpt"
        smoke_overrides(cfg, "exp/smoke_assets")
        run_gpt_training(cfg, max_steps=2, max_eval_batches=1,
                         n_model=args.n_model, bf16=args.bf16,
                         remat="dots" if args.remat == "dots"
                         else args.remat == "1",
                         content_bf16=args.content_bf16)
        return
    run_gpt_training(cfg, max_steps=args.max_steps,
                     max_eval_batches=args.max_eval_batches,
                     n_model=args.n_model, bf16=args.bf16,
                     remat="dots" if args.remat == "dots"
                     else args.remat == "1",
                     content_bf16=args.content_bf16)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
