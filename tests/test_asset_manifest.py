"""Real-asset onramp manifest (VERDICT r3 #8): the --dry-run must be green
in-suite with nothing mounted, and the validators must actually catch
shape/digest violations when (synthetic) assets exist."""

import json
import os.path as osp

import numpy as np
import pytest

from prego_tpu.cli.asset_manifest import main

MANIFEST = osp.join(osp.dirname(__file__), "..", "configs", "real_assets_manifest.json")


def test_dry_run_green_with_no_assets(capsys):
    """The in-suite mode: nothing mounted, exit 0, per-asset would-check
    report (this is what scripts/real_data_regression.sh --dry-run runs)."""
    rc = main(["--manifest", MANIFEST, "--dry-run"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "would check" in out
    assert "dry-run" in out


def test_strict_fails_without_features():
    rc = main(["--manifest", MANIFEST])
    assert rc == 1  # features are always required in strict mode


@pytest.fixture()
def synth_epictent_tree(tmp_path):
    """Features tree shaped per the manifest contract for EPIC-TENT-O,
    with a video list small enough to fabricate (3+2 videos)."""
    vids_train, vids_test = ["v_a", "v_b", "v_c"], ["v_d", "v_e"]
    vl = {
        "EPIC-TENT-O": {
            "class_index": [f"c{i}" for i in range(12)],
            "train_session_set": vids_train,
            "test_session_set": vids_test,
        }
    }
    vl_path = tmp_path / "video_list.json"
    vl_path.write_text(json.dumps(vl))
    root = tmp_path / "features"
    (root / "rgb_anet_resnet50").mkdir(parents=True)
    (root / "target_perframe").mkdir()
    rng = np.random.default_rng(0)
    for v in vids_train + vids_test:
        T = int(rng.integers(20, 40))
        np.save(root / "rgb_anet_resnet50" / f"{v}.npy",
                rng.normal(size=(T, 2048)).astype(np.float32))
        np.save(root / "target_perframe" / f"{v}.npy",
                np.zeros((T, 12), np.float32))
    man = json.loads(open(MANIFEST).read())
    man["features"]["epic-tent-O"]["video_list_path"] = str(vl_path)
    man_path = tmp_path / "manifest.json"
    man_path.write_text(json.dumps(man))
    return str(man_path), str(root)


def test_features_validate_and_catch_bad_shape(synth_epictent_tree, capsys):
    man_path, root = synth_epictent_tree
    rc = main(["--manifest", man_path, "--dataset", "epic-tent-O",
               "--features_root", root])
    assert rc == 0, capsys.readouterr().out
    assert "5/5 videos validated" in capsys.readouterr().out
    # corrupt one feature file's dim -> strict failure
    np.save(osp.join(root, "rgb_anet_resnet50", "v_b.npy"),
            np.zeros((10, 1024), np.float32))
    rc = main(["--manifest", man_path, "--dataset", "epic-tent-O",
               "--features_root", root])
    assert rc == 1


def test_checkpoint_validation_and_record_pins_digests(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    man = json.loads(open(MANIFEST).read())
    # a "7B" whose dims are tiny (the validator matches on declared dims)
    man["checkpoints"] = {
        "tiny": {"dim": 64, "n_layers": 2, "n_heads": 4, "expected_shards": 1,
                 "shard_sha256_first_mb": None}
    }
    man_path = tmp_path / "manifest.json"
    man_path.write_text(json.dumps(man))
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "params.json").write_text(json.dumps(
        {"dim": 64, "n_layers": 2, "n_heads": 4, "norm_eps": 1e-5,
         "vocab_size": -1}
    ))
    torch.save({"w": torch.zeros(4)}, ckpt / "consolidated.00.pth")
    args = ["--manifest", str(man_path), "--dry-run", "--ckpt_dir", str(ckpt)]
    assert main(args + ["--record"]) == 0
    pinned = json.loads(man_path.read_text())
    assert pinned["checkpoints"]["tiny"]["shard_sha256_first_mb"]
    # unchanged shard revalidates; tampered shard fails
    assert main(args) == 0
    torch.save({"w": torch.ones(5)}, ckpt / "consolidated.00.pth")
    rc = main(["--manifest", str(man_path), "--ckpt_dir", str(ckpt)])
    assert rc == 1

    # dims that match no declared size fail too
    (ckpt / "params.json").write_text(json.dumps({"dim": 999, "n_layers": 1}))
    assert main(["--manifest", str(man_path), "--ckpt_dir", str(ckpt)]) == 1


def test_dry_run_exit_0_even_with_fail_rows(synth_epictent_tree, capsys):
    """ADVICE r4 (low): --dry-run documents 'always exit 0' — a partially
    present asset with a bad shape must be REPORTED but not fatal in
    dry-run mode (strict mode still fails on it)."""
    man_path, root = synth_epictent_tree
    np.save(osp.join(root, "rgb_anet_resnet50", "v_b.npy"),
            np.zeros((10, 1024), np.float32))
    rc = main(["--manifest", man_path, "--dataset", "epic-tent-O",
               "--features_root", root, "--dry-run"])
    out = capsys.readouterr()
    assert rc == 0
    assert "FAIL" in out.out  # still reported
    rc = main(["--manifest", man_path, "--dataset", "epic-tent-O",
               "--features_root", root])
    assert rc == 1  # strict unchanged


def test_draft_checkpoint_contract(tmp_path, capsys):
    """VERDICT r4 #8: the --spec_draft <ckpt_dir> asset is validated the
    day it exists — record pins dims + shard digests, tamper fails."""
    torch = pytest.importorskip("torch")
    man = json.loads(open(MANIFEST).read())
    assert "draft_checkpoint" in man  # shipped manifest declares it
    man_path = tmp_path / "manifest.json"
    man_path.write_text(json.dumps(man))
    # skipped row advertises the contract when nothing is mounted
    rc = main(["--manifest", str(man_path), "--dry-run"])
    assert rc == 0
    assert "--spec_draft" in capsys.readouterr().out
    # synthetic tiny Meta-format draft dir
    draft = tmp_path / "draft"
    draft.mkdir()
    (draft / "params.json").write_text(json.dumps(
        {"dim": 32, "n_layers": 1, "n_heads": 2, "norm_eps": 1e-5,
         "vocab_size": -1}
    ))
    torch.save({"w": torch.zeros(3)}, draft / "consolidated.00.pth")
    args = ["--manifest", str(man_path), "--dry-run",
            "--draft_ckpt_dir", str(draft)]
    assert main(args + ["--record"]) == 0
    pinned = json.loads(man_path.read_text())["draft_checkpoint"]
    assert pinned["dim"] == 32 and pinned["shard_sha256_first_mb"]
    assert main(args) == 0  # unchanged revalidates
    torch.save({"w": torch.ones(4)}, draft / "consolidated.00.pth")
    rc = main(["--manifest", str(man_path), "--draft_ckpt_dir", str(draft)])
    assert rc == 1  # tampered shard fails strict
    # dims drifting from the pinned contract fail too
    (draft / "params.json").write_text(json.dumps({"dim": 64, "n_layers": 2}))
    assert main(["--manifest", str(man_path),
                 "--draft_ckpt_dir", str(draft)]) == 1


def test_regression_script_dry_run_green():
    import subprocess
    import sys

    proc = subprocess.run(
        ["bash", osp.join(osp.dirname(__file__), "..", "scripts",
                          "real_data_regression.sh"), "--dry-run"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dry-run" in proc.stdout
