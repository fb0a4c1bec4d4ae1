"""Shim: generators moved to genvc_tpu.testing_synthetic so the train
scripts' --smoke mode can use them too (VERDICT r1 item 9)."""

from genvc_tpu.testing_synthetic import *  # noqa: F401,F403
from genvc_tpu.testing_synthetic import (CV_LAYERS, DVAE_HIDDEN, GPT_DIM,
                                         GPT_HEADS, GPT_LAYERS)
