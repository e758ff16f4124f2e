"""Pipeline CLI: one command from checkpoint to mistake metrics."""

import json

import pytest
import yaml

from prego_tpu.cli.pipeline import main as pipeline_main
from prego_tpu.cli.train import main as train_main
from tests.synth import make_synth_dataset


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    data_root, vl_path, _, _ = make_synth_dataset(
        str(root), num_train=2, num_test=2, num_classes=5, rgb_dim=1024,
        min_len=100, max_len=160, seed=6, rgb_type="rgb_kinetics_bninception",
    )
    cfg = {
        "model": "MiniROAD", "data_name": "SYNTH", "task": "OAD",
        "loss": "NONUNIFORM", "metric": "AP", "optimizer": "AdamW",
        "feature_pretrained": "synth", "root_path": data_root,
        "rgb_type": "rgb_kinetics_bninception", "flow_type": "flow_anet_resnet50",
        "annotation_type": "target_perframe", "video_list_path": vl_path,
        "output_path": str(root / "out"), "window_size": 16, "batch_size": 8,
        "num_epoch": 1, "lr": 0.003, "weight_decay": 0.05, "dropout": 0.1,
        "num_classes": 5, "embedding_dim": 48, "hidden_dim": 32,
        "num_layers": 1, "stride": 4,
    }
    cfg_path = root / "synth.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    train_main(["--config", str(cfg_path)])
    ckpt = next((root / "out").glob("**/ckpts/best_*.ckpt"))
    return root, cfg_path, ckpt


def test_pipeline_end_to_end(trained, tmp_path):
    root, cfg_path, ckpt = trained
    workdir = tmp_path / "wd"
    result = pipeline_main(
        [
            "--config", str(cfg_path),
            "--ckpt", str(ckpt),
            "--workdir", str(workdir),
            "--llm", "fake",
            "--dataset", "synthcustom",
            "--data_root", str(tmp_path),  # no assets needed for fake llm
        ]
    )
    # all three stage artifacts exist and chain together
    raw = json.loads((workdir / "perframe_predictions.json").read_text())
    agg = json.loads((workdir / "aggregated.json").read_text())
    assert set(raw) == set(agg) == {"synth_test_00", "synth_test_01"}
    assert result.metrics is not None
    assert result.metrics["samples"] == sum(len(v["pred"]) for v in agg.values())
    assert (workdir / "results").exists()


def test_pipeline_skip_recognition_requires_seqs(trained, tmp_path):
    with pytest.raises(SystemExit):
        pipeline_main(["--skip_recognition", "--workdir", str(tmp_path / "x")])
