"""Online (strictly-causal, frame-by-frame) mistake-detection serving.

PREGO is *defined* as online detection, but the reference runs offline in
stages (full-video eval -> aggregate JSON -> anticipation script). This
module is the live composition of the same three components, frame in ->
verdict out, with identical math:

  OnlineRecognizer  — jitted single-frame MiniROAD step with carried GRU
                      state per stream (models/miniroad.py forward_step;
                      equality with full-video eval is tested);
  OnlineAggregator  — streaming TI-PREGO consensus: modal class per
                      completed fixed window (200 frames, bincount
                      tie-break parity), consecutive dedup — on window
                      boundaries this equals utils/aggregate.py exactly;
  OnlineMistakeDetector — when the aggregated step sequence grows, ask the
                      LLM for the anticipated-next-step set from the
                      history and flag the new step if absent
                      (llama_meta.py:14-58 one-class rule).

Serving-scale paths (all equality-tested against the per-frame loop):
  * micro-batch: step_block / push_frames scan N buffered frames in ONE
    device dispatch with aggregator state carried on device — decouples
    throughput from the per-frame host<->device round trip;
  * multi-stream: MultiStreamMistakeDetector serves B concurrent videos per
    dispatch and batches all LLM anticipation checks of a block into a
    single text_completion call.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Set

import jax
import jax.numpy as jnp
import numpy as np

from prego_tpu.aggregate import WINDOW_SIZE
from prego_tpu.anticipation.cleaning import clean_generation
from prego_tpu.anticipation.llm import CompletionLLM
from prego_tpu.anticipation.prompts import PromptBuilder
from prego_tpu.models.miniroad import MiniROAD


class OnlineRecognizer:
    """Per-frame streaming step recognition over B concurrent streams."""

    def __init__(self, model: MiniROAD, params, batch: int = 1, flow_is_zero: bool = True):
        self.model = model
        self.params = params
        self.batch = batch
        self.flow_is_zero = flow_is_zero
        self.hidden = model.init_hidden(batch)
        self._step = jax.jit(
            lambda p, r, f, h: model.forward_step(p, r, f, h, flow_is_zero=flow_is_zero)
        )

        def scan_block(p, rgb_block, flow_block, hidden):
            def body(h, xs):
                scores, h = model.forward_step(
                    p, xs[0], xs[1], h, flow_is_zero=flow_is_zero
                )
                return h, jnp.argmax(scores, axis=-1)

            hidden, ids = jax.lax.scan(body, hidden, (rgb_block, flow_block))
            return ids, hidden

        self._scan_block = jax.jit(scan_block)

    def step(self, rgb: np.ndarray, flow: Optional[np.ndarray] = None) -> np.ndarray:
        """rgb: (B, D_rgb) one frame per stream -> argmax class ids (B,)."""
        if flow is None:
            flow = np.zeros((self.batch, self.model.flow_dim), np.float32)
        scores, self.hidden = self._step(
            self.params, jnp.asarray(rgb), jnp.asarray(flow), self.hidden
        )
        return np.argmax(np.asarray(scores), axis=-1)

    def step_block(
        self, rgb: np.ndarray, flow: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """N buffered frames per stream in ONE device dispatch.

        rgb: (N, B, D_rgb) -> argmax class ids (N, B). Identical math to N
        `step` calls (lax.scan over the same forward_step) but pays one
        host->device round trip instead of N — the online path is otherwise
        RTT-bound on remote-attached accelerators.
        """
        if flow is None:
            flow = np.zeros((*rgb.shape[:2], self.model.flow_dim), np.float32)
        ids, self.hidden = self._scan_block(
            self.params, jnp.asarray(rgb), jnp.asarray(flow), self.hidden
        )
        return np.asarray(ids)

    def reset(self, stream: Optional[int] = None) -> None:
        if stream is None:
            self.hidden = self.model.init_hidden(self.batch)
        else:
            self.hidden = tuple(
                h.at[stream].set(0.0) for h in self.hidden
            )


class OnlineAggregator:
    """Streaming fixed-window majority vote + consecutive dedup."""

    def __init__(self, num_classes: int, window_size: int = WINDOW_SIZE):
        self.window_size = window_size
        self.counts = np.zeros(num_classes, np.int64)
        self.in_window = 0
        self.sequence: List[int] = []

    def push(self, class_id: int) -> Optional[int]:
        """Feed one recognized frame. Returns a NEW aggregated step id when
        a window completes and extends the deduped sequence, else None."""
        self.counts[class_id] += 1
        self.in_window += 1
        if self.in_window < self.window_size:
            return None
        winner = int(np.argmax(self.counts))  # lowest id wins ties (parity)
        self.counts[:] = 0
        self.in_window = 0
        if not self.sequence or self.sequence[-1] != winner:
            self.sequence.append(winner)
            return winner
        return None

    def flush(self) -> Optional[int]:
        """Close a trailing partial window (end of stream)."""
        if self.in_window == 0:
            return None
        winner = int(np.argmax(self.counts))
        self.counts[:] = 0
        self.in_window = 0
        if not self.sequence or self.sequence[-1] != winner:
            self.sequence.append(winner)
            return winner
        return None


def _make_detector_block_fn(model: MiniROAD, flow_is_zero: bool, window_size: int):
    """One-dispatch micro-batch: GRU step + windowed majority vote fused in a
    single jitted lax.scan, aggregator state (counts, in-window fill) carried
    on device. Emits per-frame (window_completed, winner); the cheap dedup +
    LLM trigger stay on host. jnp.argmax picks the lowest index on ties,
    matching the np.bincount-argmax parity rule (utils/aggregate.py:69-70)."""

    def block_fn(params, rgb_block, flow_block, hidden, counts, in_window):
        # rgb_block: (N, B, D); counts: (B, K) int32; in_window: (B,) int32
        def body(carry, xs):
            hidden, counts, in_w = carry
            scores, hidden = model.forward_step(
                params, xs[0], xs[1], hidden, flow_is_zero=flow_is_zero
            )
            cls = jnp.argmax(scores, axis=-1)  # (B,)
            counts = counts.at[jnp.arange(counts.shape[0]), cls].add(1)
            in_w = in_w + 1
            completed = in_w >= window_size
            winner = jnp.argmax(counts, axis=-1)
            counts = jnp.where(completed[:, None], 0, counts)
            in_w = jnp.where(completed, 0, in_w)
            return (hidden, counts, in_w), (cls, completed, winner)

        (hidden, counts, in_w), out = jax.lax.scan(
            body, (hidden, counts, in_window), (rgb_block, flow_block)
        )
        return out, hidden, counts, in_w

    return jax.jit(block_fn)


@dataclass
class MistakeEvent:
    frame_index: int
    step: int
    history: List[int]
    anticipated: Set
    is_mistake: bool
    stream: int = 0


class OnlineMistakeDetector:
    """Frame in -> (optional) verdict out, single stream."""

    def __init__(
        self,
        recognizer: OnlineRecognizer,
        llm: CompletionLLM,
        context: str = "",
        toy: Optional[str] = None,
        toy_class: Optional[str] = None,
        type_prompt: str = "num",
        prompt_context: str = "default",
        num_samples: int = 1,
        temperature: float = 0.6,
        top_p: float = 0.9,
        max_gen_len: Optional[int] = 8,
        window_size: int = WINDOW_SIZE,
        cleaning_mode: str = "meta",
    ):
        self.recognizer = recognizer
        self.llm = llm
        self.builder = PromptBuilder(
            context=context, toy=toy, toy_class=toy_class,
            type_prompt=type_prompt, prompt_context=prompt_context,
        )
        self.aggregator = OnlineAggregator(
            recognizer.model.num_classes, window_size
        )
        self.num_samples = num_samples
        self.temperature = temperature
        self.top_p = top_p
        self.max_gen_len = max_gen_len
        self.cleaning_mode = cleaning_mode
        self.frame_index = 0
        self.events: List[MistakeEvent] = []
        self._block_fn = None  # built lazily on first push_frames

    def _check_step(self, step: int) -> MistakeEvent:
        seq = self.aggregator.sequence
        i = len(seq) - 1  # the step being checked
        prompt = self.builder.step_prompt(seq, i)
        prompts = [prompt] * (self.num_samples * self.num_samples)
        results = self.llm.text_completion(
            prompts, max_gen_len=self.max_gen_len,
            temperature=self.temperature, top_p=self.top_p,
        )
        anticipated = {
            clean_generation(r["generation"], self.builder.type_prompt, self.cleaning_mode)
            for r in results
        }
        event = MistakeEvent(
            frame_index=self.frame_index,
            step=step,
            history=list(seq[:i]),
            anticipated=anticipated,
            is_mistake=step not in anticipated,
        )
        self.events.append(event)
        return event

    def push_frame(
        self, rgb: np.ndarray, flow: Optional[np.ndarray] = None
    ) -> Optional[MistakeEvent]:
        """rgb: (D_rgb,) one frame. Returns a MistakeEvent when a new
        aggregated step completes, else None."""
        class_id = int(self.recognizer.step(rgb[None], None if flow is None else flow[None])[0])
        self.frame_index += 1
        new_step = self.aggregator.push(class_id)
        if new_step is None:
            return None
        return self._check_step(new_step)

    def push_frames(
        self, rgb_block: np.ndarray, flow_block: Optional[np.ndarray] = None
    ) -> List[MistakeEvent]:
        """N buffered frames in ONE device dispatch (micro-batch serving).

        rgb_block: (N, D_rgb). Identical semantics to N push_frame calls —
        the GRU step and the windowed majority vote run fused in a single
        jitted scan with the aggregator state carried on device; only the
        consecutive-dedup and the LLM anticipation calls happen on host.
        This decouples single-stream serving throughput from the per-frame
        host<->device round-trip (the per-frame path pays one RTT per frame).
        """
        assert self.recognizer.batch == 1, (
            "push_frames drives a SINGLE stream; a recognizer built with "
            f"batch={self.recognizer.batch} would broadcast every stream's "
            "votes into one aggregator row — use MultiStreamMistakeDetector"
        )
        if self._block_fn is None:
            self._block_fn = _make_detector_block_fn(
                self.recognizer.model,
                self.recognizer.flow_is_zero,
                self.aggregator.window_size,
            )
        N = rgb_block.shape[0]
        rgb = jnp.asarray(rgb_block[:, None, :])
        if flow_block is None:
            flow = jnp.zeros((N, 1, self.recognizer.model.flow_dim), jnp.float32)
        else:
            flow = jnp.asarray(flow_block[:, None, :])
        counts = jnp.asarray(self.aggregator.counts[None, :].astype(np.int32))
        in_w = jnp.asarray([self.aggregator.in_window], np.int32)
        (cls_seq, completed, winner), hidden, counts, in_w = self._block_fn(
            self.recognizer.params, rgb, flow, self.recognizer.hidden, counts, in_w
        )
        self.recognizer.hidden = hidden
        # one bundled device->host fetch (each separate fetch would pay an RTT)
        completed, winner, counts, in_w = jax.device_get(
            (completed[:, 0], winner[:, 0], counts[0], in_w[0])
        )
        self.aggregator.counts[:] = counts
        self.aggregator.in_window = int(in_w)
        events: List[MistakeEvent] = []
        for t in range(N):
            self.frame_index += 1
            if completed[t]:
                w = int(winner[t])
                if not self.aggregator.sequence or self.aggregator.sequence[-1] != w:
                    self.aggregator.sequence.append(w)
                    events.append(self._check_step(w))
        return events

    def finish(self) -> Optional[MistakeEvent]:
        """Flush the trailing partial window at end of stream."""
        new_step = self.aggregator.flush()
        if new_step is None:
            return None
        return self._check_step(new_step)


class MultiStreamMistakeDetector:
    """Production-shaped serving: B concurrent video streams through ONE
    fused device dispatch per frame block (recognition + per-stream windowed
    vote batched in the same scan), with all LLM anticipation checks of the
    block batched into a single text_completion call.

    Semantically identical to B independent OnlineMistakeDetectors (pinned
    by tests/test_serving.py): a stream's aggregated sequence extends
    regardless of the verdict, so batching the LLM calls cannot change any
    event. Each stream may carry its own toy/context (per-stream
    PromptBuilder kwargs).
    """

    def __init__(
        self,
        recognizer: OnlineRecognizer,
        llm: CompletionLLM,
        stream_prompts: Optional[List[Dict]] = None,
        type_prompt: str = "num",
        prompt_context: str = "default",
        num_samples: int = 1,
        temperature: float = 0.6,
        top_p: float = 0.9,
        max_gen_len: Optional[int] = 8,
        window_size: int = WINDOW_SIZE,
        cleaning_mode: str = "meta",
    ):
        B = recognizer.batch
        self.recognizer = recognizer
        self.llm = llm
        stream_prompts = stream_prompts or [{} for _ in range(B)]
        assert len(stream_prompts) == B, "one prompt config per stream"
        self.builders = [
            PromptBuilder(
                type_prompt=type_prompt, prompt_context=prompt_context,
                **{"context": "", **sp},
            )
            for sp in stream_prompts
        ]
        self.aggregators = [
            OnlineAggregator(recognizer.model.num_classes, window_size)
            for _ in range(B)
        ]
        self.num_samples = num_samples
        self.temperature = temperature
        self.top_p = top_p
        self.max_gen_len = max_gen_len
        self.cleaning_mode = cleaning_mode
        self.frame_index = [0] * B
        self.events: List[List[MistakeEvent]] = [[] for _ in range(B)]
        self._block_fn = _make_detector_block_fn(
            recognizer.model, recognizer.flow_is_zero, window_size
        )

    def _run_checks(self, checks: List[Dict]) -> List[MistakeEvent]:
        """checks: [{stream, frame_index, step, history}] -> events, with
        one batched LLM call covering every check (num_samples^2 prompts
        each, matching the reference's duplicated-sampling distribution)."""
        if not checks:
            return []
        n_rep = self.num_samples * self.num_samples
        prompts: List[str] = []
        for c in checks:
            hist_with_step = c["history"] + [c["step"]]
            prompt = self.builders[c["stream"]].step_prompt(
                hist_with_step, len(c["history"])
            )
            prompts.extend([prompt] * n_rep)
        results = self.llm.text_completion(
            prompts, max_gen_len=self.max_gen_len,
            temperature=self.temperature, top_p=self.top_p,
        )
        events = []
        for j, c in enumerate(checks):
            builder = self.builders[c["stream"]]
            anticipated = {
                clean_generation(r["generation"], builder.type_prompt, self.cleaning_mode)
                for r in results[j * n_rep : (j + 1) * n_rep]
            }
            event = MistakeEvent(
                frame_index=c["frame_index"],
                step=c["step"],
                history=c["history"],
                anticipated=anticipated,
                is_mistake=c["step"] not in anticipated,
                stream=c["stream"],
            )
            self.events[c["stream"]].append(event)
            events.append(event)
        return events

    def push_frames(
        self, rgb_block: np.ndarray, flow_block: Optional[np.ndarray] = None
    ) -> List[MistakeEvent]:
        """rgb_block: (N, B, D_rgb) — N frames for each of the B streams."""
        N, B = rgb_block.shape[:2]
        assert B == self.recognizer.batch
        rgb = jnp.asarray(rgb_block)
        if flow_block is None:
            flow = jnp.zeros((N, B, self.recognizer.model.flow_dim), jnp.float32)
        else:
            flow = jnp.asarray(flow_block)
        counts = jnp.asarray(
            np.stack([a.counts for a in self.aggregators]).astype(np.int32)
        )
        in_w = jnp.asarray(
            np.array([a.in_window for a in self.aggregators], np.int32)
        )
        (cls_seq, completed, winner), hidden, counts, in_w = self._block_fn(
            self.recognizer.params, rgb, flow, self.recognizer.hidden, counts, in_w
        )
        self.recognizer.hidden = hidden
        completed, winner, counts, in_w = jax.device_get(
            (completed, winner, counts, in_w)
        )
        for b, agg in enumerate(self.aggregators):
            agg.counts[:] = counts[b]
            agg.in_window = int(in_w[b])
        checks: List[Dict] = []
        for t in range(N):
            for b in range(B):
                self.frame_index[b] += 1
                if completed[t, b]:
                    w = int(winner[t, b])
                    seq = self.aggregators[b].sequence
                    if not seq or seq[-1] != w:
                        checks.append(
                            {
                                "stream": b,
                                "frame_index": self.frame_index[b],
                                "step": w,
                                "history": list(seq),
                            }
                        )
                        seq.append(w)
        return self._run_checks(checks)

    def finish(self, stream: Optional[int] = None) -> List[MistakeEvent]:
        """Flush trailing partial windows (all streams or one)."""
        streams = range(len(self.aggregators)) if stream is None else [stream]
        checks = []
        for b in streams:
            before = list(self.aggregators[b].sequence)
            new_step = self.aggregators[b].flush()
            if new_step is not None:
                checks.append(
                    {
                        "stream": b,
                        "frame_index": self.frame_index[b],
                        "step": new_step,
                        "history": before,
                    }
                )
        return self._run_checks(checks)

    def reset_stream(self, b: int) -> None:
        """Start a new video on stream b (recognizer state + aggregation)."""
        self.recognizer.reset(stream=b)
        self.aggregators[b] = OnlineAggregator(
            self.recognizer.model.num_classes, self.aggregators[b].window_size
        )
        self.frame_index[b] = 0
        self.events[b] = []
