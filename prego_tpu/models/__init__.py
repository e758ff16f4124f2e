from prego_tpu.models.miniroad import MiniROAD
from prego_tpu.models.miniroad_a import MiniROADA
from prego_tpu.models.transformer import TransformerRecognizer

__all__ = ["MiniROAD", "MiniROADA", "TransformerRecognizer"]
