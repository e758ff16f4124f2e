from prego_tpu.models.miniroad import MiniROAD

__all__ = ["MiniROAD"]
