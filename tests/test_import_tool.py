"""Reference-asset import tool: copy and link modes."""

import json
import os

import pytest

from prego_tpu.cli.import_reference_data import import_assets


@pytest.fixture
def fake_reference(tmp_path):
    ref = tmp_path / "ref"
    (ref / "step_recognition" / "data_info").mkdir(parents=True)
    (ref / "step_anticipation" / "data" / "predictions").mkdir(parents=True)
    (ref / "step_recognition" / "data_info" / "video_list.json").write_text(
        json.dumps({"X": {"class_index": [], "train_session_set": [], "test_session_set": []}})
    )
    (ref / "step_anticipation" / "data" / "predictions" / "p.json").write_text("{}")
    return ref


def test_copy_mode(fake_reference, tmp_path):
    dest = tmp_path / "ws"
    imported = import_assets(str(fake_reference), str(dest), link=False)
    assert set(imported) == {"data_info/video_list.json", "step_anticipation/data"}
    assert (dest / "data_info" / "video_list.json").is_file()
    assert not (dest / "data_info" / "video_list.json").is_symlink()
    assert (dest / "step_anticipation" / "data" / "predictions" / "p.json").exists()


def test_link_mode_and_overwrite(fake_reference, tmp_path):
    dest = tmp_path / "ws"
    import_assets(str(fake_reference), str(dest), link=True)
    assert (dest / "data_info" / "video_list.json").is_symlink()
    # re-import over existing links/dirs must not fail
    import_assets(str(fake_reference), str(dest), link=False)
    assert not (dest / "data_info" / "video_list.json").is_symlink()


def test_empty_reference_reports_nothing(tmp_path):
    assert import_assets(str(tmp_path / "nothing"), str(tmp_path / "ws2")) == []
