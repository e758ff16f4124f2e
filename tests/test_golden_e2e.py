"""Committed fake-LLM end-to-end golden + pipeline-artifact schema checks.

The golden pins the whole anticipation pipeline (prompt building -> LLM seam
-> cleaning -> set-union voting -> one-class get_metrics -> metrics.json)
on a committed synthetic input, so pipeline regressions are caught without
any reference assets. The schema checker is what the real-data regression
recipe (scripts/real_data_regression.sh) runs on real artifacts.
"""

import json
import os.path as osp

import pytest

GOLDEN = osp.join(osp.dirname(__file__), "golden")
NONDETERMINISTIC = ("mean_llm_call_s", "llm_calls")


def test_fake_llm_e2e_matches_committed_golden(tmp_path):
    from prego_tpu.cli.anticipate import main

    main(
        [
            "--seqs", osp.join(GOLDEN, "synth_seqs.json"),
            "--llm", "fake",
            "--dataset", "synthcustom",
            "--results_root", str(tmp_path),
            "--temperature", "0.0",
        ]
    )
    out = tmp_path / "fake_0_num_0_1_0.00_synthcustom_default" / "metrics.json"
    got = json.loads(out.read_text())
    for k in NONDETERMINISTIC:
        got.pop(k, None)
    want = json.load(open(osp.join(GOLDEN, "fake_e2e_metrics.json")))
    assert got == want


# ---------------- schema_check CLI ----------------


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_schema_check_perframe_ok_and_against(tmp_path):
    from prego_tpu.cli.schema_check import main

    good = {"v1": {"pred": [0, 1, 1], "gt": [0, 0, 1]}}
    f = _write(tmp_path, "good.json", good)
    assert main(["perframe", f]) == 0
    ref = _write(tmp_path, "ref.json", {"v1": {"pred": [9, 9, 9], "gt": [1, 1, 1]}})
    assert main(["perframe", f, "--against", ref]) == 0
    ref2 = _write(tmp_path, "ref2.json", {"v2": {"pred": [0], "gt": [0]}})
    with pytest.raises(SystemExit, match="video keys differ"):
        main(["perframe", f, "--against", ref2])


def test_schema_check_perframe_violations(tmp_path):
    from prego_tpu.cli.schema_check import main

    with pytest.raises(SystemExit, match="keys must be exactly"):
        main(["perframe", _write(tmp_path, "a.json", {"v": {"pred": [1]}})])
    with pytest.raises(SystemExit, match="frames"):
        main(["perframe", _write(tmp_path, "b.json", {"v": {"pred": [1], "gt": [1, 2]}})])
    with pytest.raises(SystemExit, match="list of ints"):
        main(["perframe", _write(tmp_path, "c.json", {"v": {"pred": [0.5], "gt": [1]}})])


def test_schema_check_aggregated(tmp_path):
    from prego_tpu.cli.schema_check import main

    good = {
        "v": {"pred": [0, 2, 1], "gt": [0, 1], "changes_pred": [0, 200, 400],
              "changes_gt": [0, 600]}
    }
    f = _write(tmp_path, "agg.json", good)
    assert main(["aggregated", f]) == 0
    assert main(["aggregated", f, "--against", f, "--exact"]) == 0

    bad = {**good, "v": {**good["v"], "pred": [0, 0, 1]}}
    with pytest.raises(SystemExit, match="consecutive duplicates"):
        main(["aggregated", _write(tmp_path, "bad.json", bad)])
    bad2 = {**good, "v": {**good["v"], "changes_pred": [0, 400, 200]}}
    with pytest.raises(SystemExit, match="strictly increasing"):
        main(["aggregated", _write(tmp_path, "bad2.json", bad2)])
    other = {
        "v": {"pred": [0, 2, 9], "gt": [0, 1], "changes_pred": [0, 200, 400],
              "changes_gt": [0, 600]}
    }
    with pytest.raises(SystemExit, match="content differs"):
        main(["aggregated", f, "--against", _write(tmp_path, "o.json", other), "--exact"])


def test_schema_check_on_reference_artifacts():
    """When the reference checkout is present, our aggregation of its shipped
    per-frame output must be --exact equal to its shipped aggregated JSON
    through the schema_check CLI (the recipe's step 5)."""
    ref_perframe = "/root/reference/output_miniRoad/output_miniROAD.json"
    ref_agg = "/root/reference/data/output/aggregated_data.json"
    if not (osp.exists(ref_perframe) and osp.exists(ref_agg)):
        pytest.skip("reference artifacts not mounted")
    import tempfile

    from prego_tpu.aggregate import main as agg_main
    from prego_tpu.cli.schema_check import main as check_main

    assert check_main(["perframe", ref_perframe]) == 0
    with tempfile.TemporaryDirectory() as d:
        out = osp.join(d, "agg.json")
        agg_main([ref_perframe, out])
        assert check_main(["aggregated", out, "--against", ref_agg, "--exact"]) == 0


def test_jax_llama_cli_quantized_orbax_launch(tmp_path):
    """The anticipate CLI through the int8 direct-restore startup: first
    launch converts+quantizes+caches, second restores int8 straight from
    --orbax_dir; both produce metrics."""
    import jax
    import jax.numpy as jnp
    import torch

    from prego_tpu.cli.anticipate import main
    from prego_tpu.models.llama import init_params, tiny_test_config
    from tests.test_convert import _params_to_meta_state

    cfg = tiny_test_config(vocab_size=258)  # byte tokenizer n_words
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    torch.save(_params_to_meta_state(params), ckpt / "consolidated.00.pth")
    (ckpt / "params.json").write_text(json.dumps({
        "dim": cfg.dim, "n_layers": cfg.n_layers, "n_heads": cfg.n_heads,
        "n_kv_heads": cfg.n_kv_heads, "norm_eps": cfg.norm_eps,
        "vocab_size": -1, "multiple_of": cfg.multiple_of,
    }))
    cache = tmp_path / "orbax_q8"

    args = [
        "--seqs", osp.join(GOLDEN, "synth_seqs.json"),
        "--llm", "jax-llama",
        "--ckpt_dir", str(ckpt),
        "--tokenizer_path", "byte",
        "--quantize",
        "--orbax_dir", str(cache),
        "--dataset", "synthcustom",
        "--results_root", str(tmp_path / "r1"),
        "--temperature", "0.0",
        "--max_gen_len", "4",
        "--max_seq_len", "128",
    ]
    main(args)
    assert cache.is_dir()  # serving-layout cache written on first launch
    first = next((tmp_path / "r1").glob("*/metrics.json"))

    args[args.index(str(tmp_path / "r1"))] = str(tmp_path / "r2")
    main(args)  # restores fused int8 directly
    second = next((tmp_path / "r2").glob("*/metrics.json"))
    g1, g2 = json.loads(first.read_text()), json.loads(second.read_text())
    for k in NONDETERMINISTIC:
        g1.pop(k, None), g2.pop(k, None)
    assert g1 == g2


REF_DATA = "/root/reference/step_anticipation/data"


@pytest.mark.skipif(not osp.isdir(REF_DATA), reason="reference assets absent")
def test_epictent_fake_llm_e2e_on_reference_assets(tmp_path):
    """The Epic-tent-O branch of the reference workload (the OTHER
    dataset llama_meta.py serves) drives end-to-end on the reference's
    shipped predictions + flat context prompt: 162 mistake-detection
    steps, deterministic fake-LLM counts pinned."""
    from prego_tpu.cli.anticipate import main

    main([
        "--llm", "fake", "--dataset", "epictent",
        "--data_root", REF_DATA,
        "--results_root", str(tmp_path),
        "--temperature", "0.0",
    ])
    out = next(tmp_path.glob("*/metrics.json"))
    m = json.loads(out.read_text())
    assert m["samples"] == 162
    assert m["tp"] + m["fp"] + m["fn"] + m["tn"] == 162
