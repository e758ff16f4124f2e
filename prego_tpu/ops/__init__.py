from prego_tpu.ops.gru import gru_cell, gru_scan, init_gru_params

__all__ = ["gru_cell", "gru_scan", "init_gru_params"]
