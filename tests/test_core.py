import pytest
import yaml

from prego_tpu.core import RecognitionConfig, Registry, parse_overrides


def test_registry_register_get():
    r = Registry("test")

    @r.register("A", "A-alias")
    class A:
        pass

    assert r.get("A") is A
    assert r.get("A-alias") is A
    assert "A" in r
    with pytest.raises(KeyError):
        r.get("missing")
    with pytest.raises(KeyError):
        r.register("A")(object)


def test_config_yaml_and_overrides(tmp_path):
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(
        yaml.dump(
            {
                "model": "MiniROAD",
                "data_name": "ASSEMBLY101-O",
                "window_size": 128,
                "stride": 4,
                "lr": 0.0001,
                "num_classes": 86,
                "custom_key": "kept",
            }
        )
    )
    cfg = RecognitionConfig.from_yaml(str(cfg_path), ["--lr", "0.01", "--no_flow"])
    assert cfg.window_size == 128
    assert cfg.lr == 0.01  # CLI wins over YAML (main.py:27-30 semantics)
    assert cfg.no_flow is True
    assert cfg["custom_key"] == "kept"  # unknown keys preserved in extras
    assert cfg["window_size"] == 128  # dict-style access kept


def test_parse_overrides_forms():
    out = parse_overrides(["--a", "1", "--b=x", "--flag", "--f", "2.5"])
    assert out == {"a": 1, "b": "x", "flag": True, "f": 2.5}
