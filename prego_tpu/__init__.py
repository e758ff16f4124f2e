"""prego_tpu — TPU-native online procedural-mistake-detection framework.

A from-scratch JAX/XLA/Pallas re-design of the PREGO / TI-PREGO two-branch
system (CVPR'24 "PREGO: Online Mistake Detection in PRocedural EGOcentric
Videos"; reference implementation surveyed in SURVEY.md):

  * step recognition  — MiniROAD-style streaming GRU over precomputed
    per-frame TSN features, batched causal inference on the MXU
    (reference: step_recognition/model/rnn/rnn.py).
  * prediction aggregation — fixed-window majority-vote consensus
    (reference: utils/aggregate.py).
  * step anticipation — LLaMA-style decoder doing symbolic in-context
    next-step prediction, tensor-parallel over a jax.sharding.Mesh
    (reference: step_anticipation/llama/, src/models/llama_meta.py).
  * mistake detection — recognized-step ∉ anticipated-set, one-class
    metrics (reference: llama_meta.py get_metrics).
"""

import os as _os

# On this image a sitecustomize force-sets JAX_PLATFORMS to the hardware
# plugin, so the standard env var cannot select a backend. PREGO_PLATFORM
# provides that control: it pins jax's platform via the in-process config
# (which wins) the moment the package is imported — before any CLI touches
# a backend. PREGO_NUM_CPU_DEVICES additionally sizes the virtual CPU mesh.
_platform = _os.environ.get("PREGO_PLATFORM")
if _platform:
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)
    _n = _os.environ.get("PREGO_NUM_CPU_DEVICES")
    if _n:
        _jax.config.update("jax_num_cpu_devices", int(_n))

from prego_tpu.version import __version__

__all__ = ["__version__"]
