"""genvc_tpu: TPU-native (JAX/XLA/Pallas/pjit) zero-shot streaming voice
conversion framework with the capabilities of GenVC (see SURVEY.md)."""

__version__ = "0.1.0"
