"""Entry-point integration: train CLI -> eval export -> aggregate CLI,
exercising every public recognition entry point on synthetic data
(SURVEY.md §7 minimum end-to-end slice)."""

import json

import pytest
import yaml

from prego_tpu.aggregate import main as aggregate_main
from prego_tpu.cli.train import main as train_main
from tests.synth import make_synth_dataset


@pytest.fixture(scope="module")
def synth_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data_root, vl_path, _, _ = make_synth_dataset(
        str(root), num_train=2, num_test=2, num_classes=5, rgb_dim=1024,
        min_len=100, max_len=160, seed=4, rgb_type="rgb_kinetics_bninception",
    )
    cfg = {
        "model": "MiniROAD",
        "data_name": "SYNTH",
        "task": "OAD",
        "loss": "NONUNIFORM",
        "metric": "AP",
        "optimizer": "AdamW",
        "feature_pretrained": "synth",
        "root_path": data_root,
        "rgb_type": "rgb_kinetics_bninception",
        "flow_type": "flow_anet_resnet50",
        "annotation_type": "target_perframe",
        "video_list_path": vl_path,
        "output_path": str(root / "out"),
        "window_size": 16,
        "batch_size": 8,
        "num_epoch": 2,
        "lr": 0.003,
        "weight_decay": 0.05,
        "dropout": 0.1,
        "num_classes": 5,
        "embedding_dim": 64,
        "hidden_dim": 48,
        "num_layers": 1,
        "stride": 4,
    }
    cfg_path = root / "synth.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    return root, cfg_path


def test_train_eval_aggregate_pipeline(synth_cfg, tmp_path):
    root, cfg_path = synth_cfg

    best_mAP = train_main(["--config", str(cfg_path)])
    assert best_mAP > 0

    # find the renamed best checkpoint (main.py:112-115 behavior)
    out_root = root / "out"
    ckpts = list(out_root.glob("**/ckpts/best_*.ckpt"))
    assert len(ckpts) == 1

    export = tmp_path / "preds" / "output.json"
    mAP = train_main(
        [
            "--config", str(cfg_path),
            "--eval", str(ckpts[0]),
            "--eval_output_dir", str(export.parent),
            "--eval_output_name", export.name,
        ]
    )
    assert abs(mAP - best_mAP) < 1e-6  # same params -> same mAP
    raw = json.loads(export.read_text())
    assert set(raw.keys()) == {"synth_test_00", "synth_test_01"}

    agg_path = tmp_path / "aggregated.json"
    aggregate_main([str(export), str(agg_path)])
    agg = json.loads(agg_path.read_text())
    for vid, v in agg.items():
        assert set(v) == {"pred", "gt", "changes_pred", "changes_gt"}
        assert len(v["pred"]) == len(v["changes_pred"])
