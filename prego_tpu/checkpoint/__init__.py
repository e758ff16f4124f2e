from prego_tpu.checkpoint.io import load_checkpoint, load_params, save_checkpoint

__all__ = ["load_checkpoint", "load_params", "save_checkpoint"]
