"""Test harness: run everything on a virtual 8-device CPU mesh so that
multi-chip sharding tests work without TPU hardware (SURVEY.md §4d).

Note: this environment pins JAX_PLATFORMS=axon (TPU); popping the env var and
updating jax config before first backend use is the reliable override.
"""

import os
import sys

os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# single-core hosts serialize the virtual devices' compute; the default
# 20 s/40 s CPU-collective rendezvous timeouts can abort multi-device steps
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    # `-m fast` gives a <5-minute confidence sweep on this 1-core host
    # (the full suite takes ~40+ min).
    config.addinivalue_line("markers", "fast: quick test (<10 s on CPU); run with -m fast")
    config.addinivalue_line("markers", "slow: excluded from -m fast (>=10 s on CPU)")


# Tests measured >=10 s on this host (pytest --durations=0, round-4 full run).
# Everything else is auto-marked fast below; tag NEW heavyweight tests with
# @pytest.mark.slow so they stay out of the -m fast sweep.
_SLOW_TESTS = {
    "test_decode_beam_matches_numpy_reference",
    "test_decode_constrained_matches_hf_scorer",
    "test_discriminator_p_grad_parity", "test_discriminator_s_grad_parity",
    "test_mpd_spectral_flag_honored", "test_msd_init_parametrization",
    "test_streaming_multi_segment",
    "test_streaming_vs_nonstreaming_code_consistency",
    "test_synthesize_streaming_batch_matches_single",
    "test_flash_backward_matches_reference",
    "test_forward_train_formatting_and_loss",
    "test_fp8_pipeline_e2e",
    "test_contentvec_matches_hf_hubert", "test_contentvec_padded_matches_exact",
    "test_dvae_train_step_ema", "test_hifigan_generator_parity",
    "test_graft_dryrun", "test_sharded_stream_server",
    "test_tp_forward_matches_single_device",
    "test_vq_ema_psum_matches_global_batch",
    "test_gpt_runner_end_to_end", "test_gpt_runner_tensor_parallel",
    "test_vae_runner_end_to_end", "test_vocoder_runner_end_to_end",
    "test_per_row_decode_matches_lockstep", "test_server_matches_single_stream",
    "test_server_soak_many_streams",
    "test_discriminator_shapes", "test_prepare_features_kaiser_resample_branch",
    "test_vae_train_step_runs_and_improves",
    "test_vocoder_split_steps_match_fused", "test_vocoder_train_step_smoke",
    "test_training_forward_loss_parity",
    "test_verify_bundle_all_families",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS or item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.slow)
        elif not item.get_closest_marker("fast"):
            item.add_marker(pytest.mark.fast)

# persistent compile cache: repeat suite runs skip most CPU compiles
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/genvc_jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
