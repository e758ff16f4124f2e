"""Full-video streaming evaluation + per-frame prediction export.

Parity surface: Evaluate (step_recognition/trainer/eval.py:15-84):
  * strictly-causal per-frame softmax scores over each full test video;
  * on --eval, argmax pred/gt int lists per video dumped to
    output_miniRoad/output_miniROAD.json (eval.py:50-65) — schema kept,
    path configurable;
  * per-frame mAP via metrics.perframe_average_precision;
  * frames/sec logging (the reference's timer is broken by variable
    shadowing, eval.py:35-36,77 — fixed here, SURVEY.md §7 quirk table).

TPU-first design: instead of a python loop over batch-1 videos, all test
videos are packed into one (V, Tmax, D) padded batch and streamed through
the GRU in fixed-size time chunks with carried hidden state — constant
device memory in video length, MXU-sized matmuls, one compile. The GRU is
batch-independent and h0 is zero per video, so per-frame outputs match the
reference's batch-1 eval exactly; padded frames are sliced off on host.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prego_tpu.core.registry import EVALUATORS
from prego_tpu.data.features import FeatureStore
from prego_tpu.data.windowing import pack_eval_batch
from prego_tpu.metrics.perframe import perframe_average_precision
from prego_tpu.models.miniroad import MiniROAD


def make_chunk_fn(
    model: MiniROAD, flow_is_zero: bool, softmax: bool = True, backend: str = "scan"
):
    """Jitted chunk forward: (params, rgb (B,C,Dr), flow, hidden) -> (scores, hidden).

    backend='pallas' runs the fused VMEM-resident recurrence
    (prego_tpu.ops.gru_pallas) — the production TPU path; 'scan' is the
    XLA reference used on CPU and in numerics tests.
    """

    @jax.jit
    def chunk_fn(params, rgb, flow, hidden):
        x = model._embed(params, rgb, flow, flow_is_zero=flow_is_zero, train=False, dropout_rng=None)
        new_hidden = []
        h_seq = x
        for layer_params, h0 in zip(params["gru"], hidden):
            if backend == "pallas":
                from prego_tpu.ops.gru_pallas import gru_pallas

                h_seq, hT = gru_pallas(
                    h_seq, h0, layer_params, stream_dtype=jnp.bfloat16
                )
            else:
                from prego_tpu.ops.gru import gru_scan

                h_seq, hT = gru_scan(h_seq, h0, layer_params)
            new_hidden.append(hT)
        logits = model._classify(params, h_seq)
        out = jax.nn.softmax(logits, axis=-1) if softmax else logits
        return out, tuple(new_hidden)

    return chunk_fn


def streaming_scores(
    model: MiniROAD,
    params,
    rgb: np.ndarray,
    flow: np.ndarray,
    flow_is_zero: bool,
    chunk_size: int = 2048,
    chunk_fn=None,
    backend: str = "scan",
) -> np.ndarray:
    """Causal scores for a padded batch (V, T, D) -> (V, T, K), chunked over time."""
    V, T = rgb.shape[0], rgb.shape[1]
    if chunk_fn is None:
        chunk_fn = make_chunk_fn(model, flow_is_zero, backend=backend)
    hidden = model.init_hidden(V)
    outs = []
    for t0 in range(0, T, chunk_size):
        t1 = min(t0 + chunk_size, T)
        r = rgb[:, t0:t1]
        f = flow[:, t0:t1]
        if t1 - t0 < chunk_size:  # pad trailing chunk to the compiled shape
            padw = chunk_size - (t1 - t0)
            r = np.concatenate([r, np.zeros((V, padw, r.shape[2]), r.dtype)], axis=1)
            f = np.concatenate([f, np.zeros((V, padw, f.shape[2]), f.dtype)], axis=1)
        scores, hidden = chunk_fn(params, jnp.asarray(r), jnp.asarray(f), hidden)
        outs.append(np.asarray(scores[:, : t1 - t0]))
    return np.concatenate(outs, axis=1)


def streaming_scores_lazy(
    model: MiniROAD,
    params,
    store: FeatureStore,
    vids: List[str],
    chunk_size: int = 2048,
    chunk_fn=None,
    backend: str = "scan",
) -> List[np.ndarray]:
    """Causal scores per video WITHOUT materializing a padded (V, Tmax, D)
    batch: each time chunk is gathered from the store just before its
    dispatch, so peak host memory is one (V, chunk, D) slab regardless of
    video length (at real Assembly scale a dense padded batch would be tens
    of GB). Returns a list of (T_v, K) arrays aligned with ``vids``."""
    V = len(vids)
    lengths = np.array([store.length(v) for v in vids], np.int64)
    Tmax = int(lengths.max())
    if chunk_fn is None:
        chunk_fn = make_chunk_fn(model, store.flow_is_zero, backend=backend)
    hidden = model.init_hidden(V)
    zero_flow = (
        jnp.zeros((V, chunk_size, store.flow_dim), jnp.float32)
        if store.flow_is_zero
        else None
    )
    per_chunk: List[np.ndarray] = []
    for t0 in range(0, Tmax, chunk_size):
        r = np.zeros((V, chunk_size, store.rgb_dim), np.float32)
        f = None if store.flow_is_zero else np.zeros(
            (V, chunk_size, store.flow_dim), np.float32
        )
        for i, v in enumerate(vids):
            t1v = min(t0 + chunk_size, int(lengths[i]))
            if t1v > t0:
                r[i, : t1v - t0] = store.rgb[v][t0:t1v]
                if f is not None:
                    f[i, : t1v - t0] = store.flow[v][t0:t1v]
        scores, hidden = chunk_fn(
            params,
            jnp.asarray(r),
            zero_flow if f is None else jnp.asarray(f),
            hidden,
        )
        per_chunk.append(np.asarray(scores))
    return [
        np.concatenate([c[i] for c in per_chunk], axis=0)[: int(lengths[i])]
        for i in range(V)
    ]


@EVALUATORS.register("ANTICIPATION")
class AntEvaluator:
    """ANT_Evaluate parity (trainer/eval.py:87-161): per-frame mAP for the
    current step plus one mAP per anticipation offset; returns the mean
    anticipation mAP."""

    def __init__(self, cfg, class_names: List[str], logger=None):
        self.cfg = cfg
        self.class_names = class_names
        self.metric = cfg["metric"]
        self.anticipation_length = cfg["anticipation_length"]
        self.logger = logger

    def __call__(self, model, params, store: FeatureStore) -> Tuple[float, Dict]:
        import jax.numpy as jnp

        L = self.anticipation_length
        fwd = jax.jit(
            lambda p, r, f: model.forward_full(p, r, f, flow_is_zero=store.flow_is_zero)
        )
        pred_scores, gt_targets = [], []
        ant_scores, ant_targets = [], []
        for vid in store.vids:
            T = store.length(vid)
            end = T - L
            rgb = jnp.asarray(store.rgb[vid][None, :end])
            flow = jnp.asarray(store.flow[vid][None, :end])
            scores, ant = fwd(params, rgb, flow)
            pred_scores.append(np.asarray(scores[0]))
            gt_targets.append(store.target[vid][:end])
            ant_scores.append(np.asarray(ant[0]))  # (end, L, K)
            tgt = store.target[vid]
            ant_targets.append(
                np.stack([tgt[s : s + L] for s in range(end)], axis=0)
            )
        pred_scores = np.concatenate(pred_scores)
        gt_targets = np.concatenate(gt_targets)
        ant_scores = np.concatenate(ant_scores)
        ant_targets = np.concatenate(ant_targets)

        result = perframe_average_precision(
            pred_scores, gt_targets, self.class_names, None, self.metric
        )
        if self.logger is not None:
            self.logger.info(f'OAD mAP: {result["mean_AP"] * 100:.2f}')
        ant_maps = []
        for step in range(L):
            r = perframe_average_precision(
                ant_scores[:, step, :], ant_targets[:, step, :],
                self.class_names, None, self.metric,
            )
            result[f"anticipation_{step + 1}"] = r
            ant_maps.append(r["mean_AP"])
            if self.logger is not None:
                self.logger.info(
                    f"Anticipation at step {step + 1}: {r['mean_AP'] * 100:.2f}"
                )
        mean_ant = float(np.mean(ant_maps))
        result["mean_anticipation_AP"] = mean_ant
        return mean_ant, result


@EVALUATORS.register("OAD")
class Evaluator:
    def __init__(self, cfg, class_names: List[str], logger=None):
        self.cfg = cfg
        self.class_names = class_names
        self.metric = cfg["metric"]
        self.logger = logger
        # THUMOS postprocessing; None for the PREGO datasets (eval.py:20-22)
        if "THUMOS" in cfg["data_name"]:
            from prego_tpu.metrics.postprocessing import thumos_postprocessing

            self.postprocessing = thumos_postprocessing
        else:
            self.postprocessing = None

    def __call__(
        self,
        model: MiniROAD,
        params,
        store: FeatureStore,
        export_json: Optional[str] = None,
        chunk_size: int = 2048,
        video_batch: int = 64,
    ) -> Tuple[float, Dict]:
        """Evaluate in groups of ``video_batch`` videos so peak host memory
        stays bounded (a dense padded batch over the real Assembly test set
        would be tens of GB); within a group, time chunks are gathered from
        the store lazily just before dispatch."""
        backend = self.cfg.get("gru_backend", "scan")
        all_vids = list(store.vids)
        t_start = time.perf_counter()
        per_video_scores: Dict[str, np.ndarray] = {}
        for g0 in range(0, len(all_vids), video_batch):
            group = all_vids[g0 : g0 + video_batch]
            if hasattr(model, "init_hidden"):  # recurrent carried-state path
                group_scores = streaming_scores_lazy(
                    model, params, store, group,
                    chunk_size=chunk_size, backend=backend,
                )
            else:  # windowed models (Transformer) chunk internally per frame
                rgb, flow, _, lengths_g, _ = pack_eval_batch(store, group)
                dense = np.asarray(
                    model.forward_full(
                        params, jnp.asarray(rgb), jnp.asarray(flow),
                        flow_is_zero=store.flow_is_zero,
                    )
                )
                group_scores = [dense[i, : int(lengths_g[i])] for i in range(len(group))]
            per_video_scores.update(zip(group, group_scores))
        elapsed = time.perf_counter() - t_start

        pred_scores, gt_targets = [], []
        output = {}
        lengths = np.array([store.length(v) for v in all_vids], np.int64)
        for vid in all_vids:
            s = per_video_scores[vid]
            g = store.target[vid]
            pred_scores.append(s)
            gt_targets.append(g)
            output[vid] = {
                "pred": np.argmax(s, axis=1).astype(int).tolist(),
                "gt": np.argmax(g, axis=1).astype(int).tolist(),
            }
        pred_scores = np.concatenate(pred_scores, axis=0)
        gt_targets = np.concatenate(gt_targets, axis=0)

        if export_json is not None:
            os.makedirs(os.path.dirname(export_json) or ".", exist_ok=True)
            with open(export_json, "w") as f:
                json.dump(output, f)

        num_frames = int(lengths.sum())
        if self.logger is not None:
            self.logger.info(
                f"Processed {num_frames} frames in {elapsed:.2f}s "
                f"({num_frames / max(elapsed, 1e-9):.1f} FPS)"
            )
        result = perframe_average_precision(
            pred_scores, gt_targets, self.class_names, self.postprocessing, self.metric
        )
        result["fps"] = num_frames / max(elapsed, 1e-9)
        result["output"] = output
        return result["mean_AP"], result
