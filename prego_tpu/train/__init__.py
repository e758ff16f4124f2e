from prego_tpu.train.evaluator import Evaluator, make_chunk_fn, streaming_scores
from prego_tpu.train.loss import l2_normalize, last_frame_mlce
from prego_tpu.train.lr_schedule import warmup_cosine_schedule
from prego_tpu.train.trainer import build_optimizer, make_train_step, train_one_epoch

__all__ = [
    "Evaluator",
    "make_chunk_fn",
    "streaming_scores",
    "l2_normalize",
    "last_frame_mlce",
    "warmup_cosine_schedule",
    "build_optimizer",
    "make_train_step",
    "train_one_epoch",
]
