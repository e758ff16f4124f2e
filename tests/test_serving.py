"""Online serving loop: streaming consensus parity with the offline
aggregator, and the live frame->verdict mistake-detection path."""

import jax
import numpy as np

from prego_tpu.aggregate import aggregate_video
from prego_tpu.anticipation import FakeLLM
from prego_tpu.core import RecognitionConfig
from prego_tpu.models.miniroad import MiniROAD
from prego_tpu.serving import OnlineAggregator, OnlineMistakeDetector, OnlineRecognizer

CFG = RecognitionConfig.from_dict(
    {
        "rgb_type": "rgb_kinetics_bninception",
        "flow_type": "flow_anet_resnet50",
        "embedding_dim": 32,
        "hidden_dim": 16,
        "num_layers": 1,
        "num_classes": 5,
        "dropout": 0.0,
    }
)


def test_streaming_aggregator_matches_offline(rng):
    for _ in range(5):
        n = int(rng.integers(50, 900))
        preds = rng.integers(0, 6, n).tolist()
        agg = OnlineAggregator(num_classes=6, window_size=200)
        for p in preds:
            agg.push(int(p))
        agg.flush()
        offline = aggregate_video(preds, preds)["pred"]
        assert agg.sequence == offline


def test_online_recognizer_matches_batch_eval(rng):
    model = MiniROAD(CFG)
    params = model.init(jax.random.PRNGKey(0))
    T = 30
    rgb = rng.normal(0, 1, (T, model.rgb_dim)).astype(np.float32)

    rec = OnlineRecognizer(model, params, batch=1, flow_is_zero=True)
    online_ids = [int(rec.step(rgb[t][None])[0]) for t in range(T)]

    import jax.numpy as jnp

    scores = model.forward_full(
        params, jnp.asarray(rgb[None]), jnp.zeros((1, T, model.flow_dim)), flow_is_zero=True
    )
    offline_ids = np.argmax(np.asarray(scores[0]), axis=-1).tolist()
    assert online_ids == offline_ids


def test_online_detector_end_to_end(rng):
    model = MiniROAD(CFG)
    params = model.init(jax.random.PRNGKey(1))
    rec = OnlineRecognizer(model, params, batch=1, flow_is_zero=True)
    llm = FakeLLM()  # echoes the last history symbol
    det = OnlineMistakeDetector(
        rec, llm, context="", toy="t1", type_prompt="num",
        window_size=10, temperature=0.0,
    )
    events = []
    for t in range(45):
        frame = rng.normal(0, 1, (model.rgb_dim,)).astype(np.float32)
        ev = det.push_frame(frame)
        if ev is not None:
            events.append(ev)
    tail = det.finish()
    if tail is not None:
        events.append(tail)
    # 45 frames / window 10 -> 4 full windows + flush; events only on
    # sequence EXTENSION (dedup), so count <= 5 but >= 1
    assert 1 <= len(events) <= 5
    for ev in events:
        assert isinstance(ev.is_mistake, bool)
        assert ev.step == det.aggregator.sequence[len(ev.history)]
        assert isinstance(ev.anticipated, set) and ev.anticipated


def test_step_block_matches_per_frame(rng):
    model = MiniROAD(CFG)
    params = model.init(jax.random.PRNGKey(5))
    T, B = 24, 2
    frames = rng.normal(0, 1, (T, B, model.rgb_dim)).astype(np.float32)

    rec1 = OnlineRecognizer(model, params, batch=B, flow_is_zero=True)
    per_frame = np.stack([rec1.step(frames[t]) for t in range(T)])

    rec2 = OnlineRecognizer(model, params, batch=B, flow_is_zero=True)
    blocked = np.concatenate(
        [rec2.step_block(frames[:10]), rec2.step_block(frames[10:])]
    )
    np.testing.assert_array_equal(per_frame, blocked)
    for h1, h2 in zip(rec1.hidden, rec2.hidden):
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-6)


def test_push_frames_matches_push_frame(rng):
    """Micro-batch serving (one dispatch per block, aggregator state carried
    on device) must produce byte-identical events to the per-frame path,
    including across block boundaries that split aggregation windows."""

    def run(det, frames, block):
        events = []
        if block == 1:
            for t in range(len(frames)):
                ev = det.push_frame(frames[t])
                if ev is not None:
                    events.append(ev)
        else:
            for t0 in range(0, len(frames), block):
                events.extend(det.push_frames(frames[t0 : t0 + block]))
        tail = det.finish()
        if tail is not None:
            events.append(tail)
        return events

    model = MiniROAD(CFG)
    params = model.init(jax.random.PRNGKey(6))
    T = 47
    frames = rng.normal(0, 1, (T, model.rgb_dim)).astype(np.float32)

    def make_det():
        rec = OnlineRecognizer(model, params, batch=1, flow_is_zero=True)
        return OnlineMistakeDetector(
            rec, FakeLLM(), context="", toy="t1", type_prompt="num",
            window_size=10, temperature=0.0,
        )

    base_det = make_det()
    base = run(base_det, frames, block=1)
    for block in (7, 10, 47):  # window-splitting, window-aligned, whole-stream
        det = make_det()
        got = run(det, frames, block=block)
        assert det.aggregator.sequence == base_det.aggregator.sequence
        assert len(got) == len(base)
        for a, b in zip(got, base):
            assert (a.frame_index, a.step, a.history, a.anticipated, a.is_mistake) == (
                b.frame_index, b.step, b.history, b.anticipated, b.is_mistake
            )


def test_multistream_matches_independent_detectors(rng):
    """B streams through the fused multi-stream path (one dispatch per block,
    one batched LLM call per block) must produce the same per-stream events
    as B independent single-stream detectors."""
    from prego_tpu.serving import MultiStreamMistakeDetector

    model = MiniROAD(CFG)
    params = model.init(jax.random.PRNGKey(8))
    B, T = 3, 44
    frames = rng.normal(0, 1, (T, B, model.rgb_dim)).astype(np.float32)

    # independent per-stream references
    singles = []
    for b in range(B):
        rec = OnlineRecognizer(model, params, batch=1, flow_is_zero=True)
        det = OnlineMistakeDetector(
            rec, FakeLLM(), context="", toy=f"t{b}", type_prompt="num",
            window_size=10, temperature=0.0,
        )
        evs = []
        for t in range(T):
            ev = det.push_frame(frames[t, b])
            if ev is not None:
                evs.append(ev)
        tail = det.finish()
        if tail is not None:
            evs.append(tail)
        singles.append((det, evs))

    rec = OnlineRecognizer(model, params, batch=B, flow_is_zero=True)
    multi = MultiStreamMistakeDetector(
        rec, FakeLLM(),
        stream_prompts=[{"context": "", "toy": f"t{b}"} for b in range(B)],
        type_prompt="num", window_size=10, temperature=0.0,
    )
    for t0 in range(0, T, 13):  # window-splitting block boundaries
        multi.push_frames(frames[t0 : t0 + 13])
    multi.finish()

    for b, (det, evs) in enumerate(singles):
        assert multi.aggregators[b].sequence == det.aggregator.sequence
        got = multi.events[b]
        assert len(got) == len(evs)
        for a, e in zip(got, evs):
            assert a.stream == b
            assert (a.frame_index, a.step, a.history, a.anticipated, a.is_mistake) == (
                e.frame_index, e.step, e.history, e.anticipated, e.is_mistake
            )


def test_multistream_reset_stream(rng):
    from prego_tpu.serving import MultiStreamMistakeDetector

    model = MiniROAD(CFG)
    params = model.init(jax.random.PRNGKey(9))
    rec = OnlineRecognizer(model, params, batch=2, flow_is_zero=True)
    multi = MultiStreamMistakeDetector(
        rec, FakeLLM(), type_prompt="num", window_size=5, temperature=0.0,
    )
    frames = rng.normal(0, 1, (12, 2, model.rgb_dim)).astype(np.float32)
    multi.push_frames(frames)
    assert multi.frame_index == [12, 12]
    multi.reset_stream(0)
    assert multi.frame_index == [0, 12]
    assert multi.aggregators[0].sequence == []
    assert np.all(np.asarray(rec.hidden[0])[0] == 0)
    assert not np.all(np.asarray(rec.hidden[0])[1] == 0)
    # stream 1 keeps accumulating after the reset
    multi.push_frames(frames[:5])
    assert multi.frame_index == [5, 17]


def test_recognizer_per_stream_reset(rng):
    model = MiniROAD(CFG)
    params = model.init(jax.random.PRNGKey(2))
    rec = OnlineRecognizer(model, params, batch=2, flow_is_zero=True)
    frames = rng.normal(0, 1, (6, 2, model.rgb_dim)).astype(np.float32)
    for t in range(3):
        rec.step(frames[t])
    rec.reset(stream=0)  # stream 0 restarts; stream 1 keeps its state
    h_after = np.asarray(rec.hidden[0])
    assert np.all(h_after[0] == 0)
    assert not np.all(h_after[1] == 0)


def test_online_detector_with_jax_llama(rng):
    """The live loop composed with the TPU-native LLM path (tiny model):
    recognizer -> streaming consensus -> prefix-cached LLaMA anticipation."""
    import jax.numpy as jnp

    from prego_tpu.models.llama import ByteTokenizer, Llama, init_params, tiny_test_config
    from prego_tpu.models.llama.model import fuse_projections

    tok = ByteTokenizer()
    lcfg = tiny_test_config(vocab_size=tok.n_words)
    llama = Llama(
        fuse_projections(init_params(lcfg, jax.random.PRNGKey(3), dtype=jnp.float32)),
        tok, lcfg,
    )

    class Adapter:
        def text_completion(self, prompts, max_gen_len=None, temperature=0.6, top_p=0.9):
            return llama.text_completion(
                prompts, temperature=temperature, top_p=top_p,
                max_gen_len=max_gen_len, use_prefix_cache=True,
            )

    model = MiniROAD(CFG)
    params = model.init(jax.random.PRNGKey(4))
    rec = OnlineRecognizer(model, params, batch=1, flow_is_zero=True)
    context = "Sequence type: t1\nInput Sequence:\n -1, 2\nNext Symbol:\n 3\n---\n"
    det = OnlineMistakeDetector(
        rec, Adapter(), context=context, toy="t1", type_prompt="num",
        window_size=8, temperature=0.0, max_gen_len=3,
    )
    events = []
    for t in range(25):
        frame = rng.normal(0, 1, (model.rgb_dim,)).astype(np.float32)
        ev = det.push_frame(frame)
        if ev is not None:
            events.append(ev)
    tail = det.finish()
    if tail is not None:
        events.append(tail)
    assert events, "at least one aggregated step must surface"
    for ev in events:
        assert isinstance(ev.is_mistake, bool) and ev.anticipated
