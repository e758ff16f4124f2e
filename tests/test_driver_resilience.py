"""Anticipation driver crash resilience: incremental checkpoints + resume."""

import pickle

import pytest

from prego_tpu.anticipation import FakeLLM, run_anticipation


def _seqs(n):
    return {
        f"nusar-2021_action_both_90{i:02d}-a08_x_y": {"pred": [1, 2, 3], "gt": []}
        for i in range(n)
    }


def test_incremental_checkpoint_and_resume(tmp_path):
    ckpt = tmp_path / "partial.pkl"
    seqs = _seqs(7)

    class CrashLLM(FakeLLM):
        def __init__(self):
            super().__init__()
            self.video_calls = 0

        def text_completion(self, prompts, **kw):
            self.video_calls += 1
            if self.video_calls > 5 * 3:  # crash partway through video 6
                raise RuntimeError("boom")
            return super().text_completion(prompts, **kw)

    with pytest.raises(RuntimeError):
        run_anticipation(
            seqs, CrashLLM(), dataset="assembly", eval_metrics=False,
            checkpoint_path=str(ckpt), checkpoint_every=2,
        )
    saved = pickle.loads(ckpt.read_bytes())
    assert 2 <= len(saved["preds"]) <= 5  # periodic snapshots survived

    # resume with a healthy LLM: finished videos skipped, all complete
    llm = FakeLLM()
    res = run_anticipation(
        seqs, llm, dataset="assembly", eval_metrics=True,
        checkpoint_path=str(ckpt), checkpoint_every=2,
    )
    assert set(res.preds) == set(seqs)
    # only the unfinished videos were re-queried
    assert len(llm.calls) == (len(seqs) - len(saved["preds"])) * 3
    assert res.llm_latencies  # TIME_CNT-parity latency tracking active
