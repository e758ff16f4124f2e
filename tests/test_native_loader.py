"""Native data path parity: identical batches to the numpy FeatureStore
path given the same RNG (zero-prefix, zeroed flow, window layout)."""

import numpy as np
import pytest

from prego_tpu.data import WindowSampler, load_dataset_info, load_feature_store
from prego_tpu.native import build_native_library, native_available
from tests.synth import make_synth_dataset

pytestmark = pytest.mark.skipif(
    not (native_available() or build_native_library()),
    reason="native library unavailable",
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_loader")
    return make_synth_dataset(
        str(root), num_train=3, num_test=2, num_classes=6, rgb_dim=1024,
        flow_dim=2048, min_len=60, max_len=120, seed=9,
        rgb_type="rgb_kinetics_bninception",
    )


def _make_pair(synth, training):
    from prego_tpu.data.native_loader import NativeRecognitionData

    data_root, vl_path, _, _ = synth
    info = load_dataset_info(vl_path, "SYNTH")
    vids = info.train_session_set if training else info.test_session_set
    kwargs = dict(
        rgb_type="rgb_kinetics_bninception",
        flow_type="flow_anet_resnet50",
        annotation_type="target_perframe",
        num_classes=6,
        training=training,
        window_size=16,
    )
    numpy_store = load_feature_store(data_root, list(vids), **kwargs)
    native_data = NativeRecognitionData(data_root, list(vids), **kwargs)
    return numpy_store, native_data


def test_lengths_match_padded(synth):
    numpy_store, native_data = _make_pair(synth, training=True)
    assert native_data.vids == numpy_store.vids
    for v in numpy_store.vids:
        assert native_data.length(v) == numpy_store.length(v)


def test_batches_bitwise_equal(synth):
    from prego_tpu.data.native_loader import NativeWindowSampler

    numpy_store, native_data = _make_pair(synth, training=True)
    s_np = WindowSampler(numpy_store, 16, 4)
    s_nat = NativeWindowSampler(native_data, 16, 4)
    s_np.resample(np.random.default_rng(5))
    s_nat.resample(np.random.default_rng(5))
    assert s_np.windows == s_nat.windows

    batches_np = list(s_np.iter_batches(8, shuffle=True, rng=np.random.default_rng(7)))
    batches_nat = list(s_nat.iter_batches(8, shuffle=True, rng=np.random.default_rng(7)))
    assert len(batches_np) == len(batches_nat)
    for a, b in zip(batches_np, batches_nat):
        np.testing.assert_array_equal(a.rgb, b.rgb)
        np.testing.assert_array_equal(a.flow, b.flow)  # both zeroed-flow
        np.testing.assert_array_equal(a.target, b.target)
        np.testing.assert_array_equal(a.valid, b.valid)
        assert a.vids == b.vids


def test_prefetch_batches_equal_sync(synth):
    """prefetch=True (background double-buffered gathers) must yield
    bit-identical batches to prefetch=False."""
    from prego_tpu.data.native_loader import NativeWindowSampler

    _, native_data = _make_pair(synth, training=True)
    s = NativeWindowSampler(native_data, 16, 4)
    s.resample(np.random.default_rng(5))
    a = list(s.iter_batches(8, shuffle=True, rng=np.random.default_rng(7), prefetch=False))
    b = list(s.iter_batches(8, shuffle=True, rng=np.random.default_rng(7), prefetch=True))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.rgb, y.rgb)
        np.testing.assert_array_equal(x.flow, y.flow)
        np.testing.assert_array_equal(x.target, y.target)
        np.testing.assert_array_equal(x.valid, y.valid)
        assert x.vids == y.vids


def test_missing_video_dropped_native(synth):
    from prego_tpu.data.native_loader import NativeRecognitionData

    data_root, vl_path, train_vids, _ = synth
    data = NativeRecognitionData(
        data_root, list(train_vids) + ["ghost_video"],
        rgb_type="rgb_kinetics_bninception", flow_type="flow_anet_resnet50",
        annotation_type="target_perframe", num_classes=6,
        training=True, window_size=16,
    )
    assert data.removed == 1
    assert "ghost_video" not in data.vids


def test_native_store_drives_lazy_eval(synth):
    """The evaluator runs entirely off the mmap store, same results as the
    in-RAM FeatureStore path."""
    import jax

    from prego_tpu.core import RecognitionConfig
    from prego_tpu.models.miniroad import MiniROAD
    from prego_tpu.train import Evaluator

    numpy_store, _ = _make_pair(synth, training=False)
    from prego_tpu.data.native_loader import NativeRecognitionData

    data_root, vl_path, _, _ = synth
    info = load_dataset_info(vl_path, "SYNTH")
    native_store = NativeRecognitionData(
        data_root, list(info.test_session_set),
        rgb_type="rgb_kinetics_bninception", flow_type="flow_anet_resnet50",
        annotation_type="target_perframe", num_classes=6,
        training=False, window_size=16,
    )
    cfg = RecognitionConfig.from_dict(
        {
            "rgb_type": "rgb_kinetics_bninception",
            "flow_type": "flow_anet_resnet50",
            "embedding_dim": 48, "hidden_dim": 32, "num_layers": 1,
            "num_classes": 6, "dropout": 0.0, "metric": "AP",
            "data_name": "SYNTH",
        }
    )
    model = MiniROAD(cfg)
    params = model.init(jax.random.PRNGKey(0))
    ev = Evaluator(cfg, [f"c{i}" for i in range(6)])
    mAP_np, r_np = ev(model, params, numpy_store, chunk_size=64)
    mAP_nat, r_nat = ev(model, params, native_store, chunk_size=64)
    assert mAP_np == pytest.approx(mAP_nat, abs=1e-9)
    assert r_np["output"] == r_nat["output"]
