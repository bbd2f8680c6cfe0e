"""qtesla_tpu — a TPU-native polynomial-multiplication framework for qTESLA.

Built from scratch in JAX/XLA/Pallas with the capabilities of the CUDA
reference ``benlwk/ntt-gpu-qTESLA`` (see SURVEY.md): NTT variants with exact
precomputed twiddle tables, lane-parallel Shoup/Barrett modular reduction,
fused negacyclic weighting, a Nussbaumer cross-check path, batched polymul
pipelines, and multi-chip sharding (batch DP + four-step intra-transform SP).
"""

from .params import (ParamSet, available_param_sets, get_params,  # noqa: F401
                     register_param_set)

__version__ = "0.1.0"
