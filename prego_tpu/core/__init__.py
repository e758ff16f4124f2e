from prego_tpu.core.config import RecognitionConfig, parse_overrides
from prego_tpu.core.logging import get_logger
from prego_tpu.core.outdir import create_outdir
from prego_tpu.core.registry import (
    CRITERIONS,
    DATASETS,
    EVALUATORS,
    LLMS,
    MODELS,
    TRAINERS,
    Registry,
)
from prego_tpu.core.seed import set_seed

__all__ = [
    "RecognitionConfig",
    "parse_overrides",
    "get_logger",
    "create_outdir",
    "Registry",
    "MODELS",
    "DATASETS",
    "CRITERIONS",
    "TRAINERS",
    "EVALUATORS",
    "LLMS",
    "set_seed",
]
