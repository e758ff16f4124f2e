"""Hermetic tests for the HF-pipeline and Ollama LLM backends.

HFPipelineLLM runs against an in-memory random tiny transformers Llama +
a programmatically-built WordLevel tokenizer (no downloads); OllamaLLM runs
against a local fake Ollama HTTP server that validates the request schema
(llm_ollama.py:120-131 parity: system message forcing a single number,
stream=False, options passthrough)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest


# ---------------- HFPipelineLLM ----------------


@pytest.fixture(scope="module")
def tiny_hf_pipeline():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {str(i): i for i in range(50)}
    vocab.update({"[UNK]": 50, "[PAD]": 51, ",": 52, "-1": 53})
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="[UNK]", pad_token="[PAD]"
    )

    cfg = transformers.LlamaConfig(
        vocab_size=len(vocab), hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    return transformers.pipeline(
        "text-generation", model=model, tokenizer=fast, device="cpu"
    )


def test_hf_pipeline_llm_no_echo_and_determinism(tiny_hf_pipeline):
    from prego_tpu.anticipation.llm import HFPipelineLLM

    llm = HFPipelineLLM("unused", pipe=tiny_hf_pipeline)
    prompts = ["1 , 2 , 3", "7 , 7"]
    out = llm.text_completion(prompts, max_gen_len=4, temperature=0.0)
    assert len(out) == 2
    for o, p in zip(out, prompts):
        assert isinstance(o["generation"], str)
        assert not o["generation"].startswith(p)  # prompt echo stripped
    # greedy is deterministic
    again = llm.text_completion(prompts, max_gen_len=4, temperature=0.0)
    assert [o["generation"] for o in out] == [o["generation"] for o in again]


def test_hf_pipeline_llm_drives_anticipation(tiny_hf_pipeline):
    from prego_tpu.anticipation import run_anticipation
    from prego_tpu.anticipation.llm import HFPipelineLLM

    llm = HFPipelineLLM("unused", pipe=tiny_hf_pipeline)
    seqs = {"v0": {"pred": [1, 2, 3], "gt": [1, 2]}}
    result = run_anticipation(
        seqs, llm, dataset="custom", num_samples=1, temperature=0.0,
        max_gen_len=3, type_prompt="num", cleaning_mode="hf",
    )
    assert len(result.preds["v0"]) == 3  # one anticipated-set per step
    assert result.metrics is not None


# ---------------- OllamaLLM ----------------


class _FakeOllamaHandler(BaseHTTPRequestHandler):
    requests_seen = []

    def do_POST(self):
        assert self.path == "/api/chat"
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).requests_seen.append(body)
        reply = {"message": {"role": "assistant", "content": "42"}}
        data = json.dumps(reply).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # keep test output clean
        pass


@pytest.fixture
def fake_ollama():
    _FakeOllamaHandler.requests_seen = []
    server = HTTPServer(("127.0.0.1", 0), _FakeOllamaHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_ollama_llm_request_schema_and_responses(fake_ollama):
    from prego_tpu.anticipation.llm import OllamaLLM

    llm = OllamaLLM("llama3.2:1b", host=fake_ollama)
    out = llm.text_completion(
        ["what comes after 1, 2?", "and after 3?"],
        max_gen_len=8, temperature=0.3, top_p=0.85,
    )
    assert [o["generation"] for o in out] == ["42", "42"]

    reqs = _FakeOllamaHandler.requests_seen
    assert len(reqs) == 2
    for r in reqs:
        assert r["model"] == "llama3.2:1b"
        assert r["stream"] is False
        assert r["messages"][0]["role"] == "system"
        assert "one and only one number" in r["messages"][0]["content"]
        assert r["messages"][1]["role"] == "user"
        assert r["options"] == {"temperature": 0.3, "top_p": 0.85, "num_predict": 8}


def test_ollama_llm_drives_anticipation(fake_ollama):
    from prego_tpu.anticipation import run_anticipation
    from prego_tpu.anticipation.llm import OllamaLLM

    llm = OllamaLLM("m", host=fake_ollama)
    seqs = {"v0": {"pred": [41, 42, 7], "gt": [41, 42]}}
    result = run_anticipation(
        seqs, llm, dataset="custom", num_samples=1, temperature=0.0,
        max_gen_len=3, type_prompt="num",
    )
    # the fake server always anticipates 42 (cleaned to the int symbol)
    assert all(42 in s for s in result.preds["v0"])
    assert result.metrics is not None


def test_jax_llama_cb_serving_matches_batch_greedy():
    """--serving cb: text_completion through the continuous batcher is
    greedy-identical to the drain-style batch path (VERDICT r3 #1c)."""
    from prego_tpu.anticipation.llm import JaxLlamaLLM

    batch = JaxLlamaLLM(None, None, fabricated="tiny", max_seq_len=256)
    cb = JaxLlamaLLM(None, None, fabricated="tiny", serving="cb", max_seq_len=256)
    # short prompts (no shareable prefix) AND long-shared-context prompts
    ctx = "step list: " + ", ".join(str(i % 9) for i in range(60)) + "\n"
    for prompts in (
        ["Sequence: 1, 2, 3\nNext:\n", "Sequence: 1, 2\nNext:\n"],
        [ctx + "next after 3:\n", ctx + "next after 7:\n", ctx + "next:\n"],
    ):
        a = batch.text_completion(prompts, max_gen_len=6, temperature=0.0)
        b = cb.text_completion(prompts, max_gen_len=6, temperature=0.0)
        assert a == b, prompts[0][:30]


def test_cb_backend_drives_anticipation_with_context_reuse():
    """The full PREGO driver through the CB backend: per-toy contexts are
    prefix-prefilled ~once per CONTEXT, not per video or per step
    (VERDICT r3 #1 'prefix-prefill count ≈ #contexts')."""
    from prego_tpu.anticipation.driver import run_anticipation
    from prego_tpu.anticipation.llm import JaxLlamaLLM

    llm = JaxLlamaLLM(
        None, None, fabricated="tiny", serving="cb",
        max_seq_len=512, max_batch_size=8,
    )
    # context long enough that the 64-aligned prefix lands INSIDE the
    # context for every step prompt (the real workload's regime: ~1.5k-
    # token contexts vs ~64-token tails)
    ctx_a = ("toy A steps: " + "3 1 4 1 5 9 2 6 " * 12)[:195]
    ctx_b = ("toy B steps: " + "2 7 1 8 2 8 1 8 " * 12)[:195]
    contexts = {"a21": {"num": ctx_a}, "a33": {"num": ctx_b}}
    seqs = {
        "v1-x-a21_1": {"pred": [1, 2, 3], "gt": [1, 2, 3]},
        "v2-x-a21_2": {"pred": [2, 3], "gt": [2, 3]},
        "v3-x-a33_1": {"pred": [4, 5], "gt": [4, 5]},
        "v4-x-a33_2": {"pred": [5, 6], "gt": [5, 6]},
    }
    res = run_anticipation(
        seqs, llm, dataset="assembly", contexts=contexts,
        temperature=0.0, num_samples=2, max_gen_len=4,
    )
    assert len(res.preds) == 4
    # samples = total anticipated steps across the 4 videos (3+2+2+2)
    assert res.metrics is not None and res.metrics["samples"] == 9
    # one from-scratch context prefill per toy; everything else reused
    assert llm.llama.prefix_rebuilds == 2, (
        llm.llama.prefix_rebuilds, llm.llama.prefix_extends
    )


def test_jax_llama_spec_serving_matches_batch_greedy():
    """--spec_k/--spec_draft: text_completion through the speculative
    decoder is greedy-identical to the plain batch path for ANY draft
    (here a different-seed random draft — acceptance ~0), on both the
    short-prompt fallback and the prefix-cached path."""
    from prego_tpu.anticipation.llm import JaxLlamaLLM

    batch = JaxLlamaLLM(None, None, fabricated="tiny", max_seq_len=256)
    spec = JaxLlamaLLM(
        None, None, fabricated="tiny", max_seq_len=256,
        spec_k=2, spec_draft="fabricated-tiny",
    )
    # layer-truncated self-draft (shared weights, zero extra HBM)
    spec_self = JaxLlamaLLM(
        None, None, fabricated="tiny", max_seq_len=256,
        spec_k=2, spec_draft="self-1",
    )
    ctx = "step list: " + ", ".join(str(i % 9) for i in range(60)) + "\n"
    for prompts in (
        ["Sequence: 1, 2, 3\nNext:\n", "Sequence: 1, 2\nNext:\n"],
        [ctx + "next after 3:\n", ctx + "next after 7:\n", ctx + "next:\n"],
    ):
        a = batch.text_completion(prompts, max_gen_len=6, temperature=0.0)
        b = spec.text_completion(prompts, max_gen_len=6, temperature=0.0)
        c = spec_self.text_completion(prompts, max_gen_len=6, temperature=0.0)
        assert a == b, prompts[0][:30]
        assert a == c, prompts[0][:30]
    assert (
        spec_self._spec.draft_params["layers"][0]
        is spec_self.llama.params["layers"][0]
    )


def test_jax_llama_spec_draft_from_meta_checkpoint(tmp_path):
    """--spec_draft <ckpt_dir>: a real Meta-format draft checkpoint loads
    through convert_meta_checkpoint and drives speculation (the path a
    trained 1B draft asset takes the day it exists; here the draft IS the
    target's checkpoint — acceptance ~1, greedy-identical output)."""
    import json as _json

    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    torch = _pytest.importorskip("torch")
    from tests.test_convert import _params_to_meta_state
    from prego_tpu.models.llama import LlamaConfig
    from prego_tpu.models.llama.model import init_params
    from prego_tpu.anticipation.llm import JaxLlamaLLM

    cfg = LlamaConfig(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=4, vocab_size=-1,
        multiple_of=16, norm_eps=1e-5, max_batch_size=2, max_seq_len=128,
    )
    src = init_params(
        LlamaConfig(**{**vars(cfg), "vocab_size": 258}),
        jax.random.PRNGKey(3), dtype=jnp.float32,
    )
    torch.save(_params_to_meta_state(src), tmp_path / "consolidated.00.pth")
    (tmp_path / "params.json").write_text(_json.dumps({
        "dim": cfg.dim, "n_layers": cfg.n_layers, "n_heads": cfg.n_heads,
        "n_kv_heads": cfg.n_kv_heads, "norm_eps": cfg.norm_eps,
        "vocab_size": -1, "multiple_of": cfg.multiple_of,
    }))
    kw = dict(ckpt_dir=str(tmp_path), tokenizer_path="byte",
              max_seq_len=128, max_batch_size=2, dtype=jnp.float32)
    plain = JaxLlamaLLM(**kw)
    spec = JaxLlamaLLM(spec_k=2, spec_draft=str(tmp_path), **kw)
    prompts = ["Sequence: 1, 2, 3\nNext:\n"]
    a = plain.text_completion(prompts, max_gen_len=6, temperature=0.0)
    b = spec.text_completion(prompts, max_gen_len=6, temperature=0.0)
    assert a == b
    # the draft really came from the checkpoint loader, not a fabricated
    # tree (separate arrays from the target's, equal values)
    d = spec._spec.draft_params["layers"][0]["attention"]["wq"]
    t = spec.llama.params["layers"][0]["attention"]["wq"]
    assert d is not t
    assert spec._spec._self_draft_layers == 0


def test_spec_backend_drives_anticipation_with_context_reuse():
    """The full PREGO driver through the speculative backend: identical
    greedy verdicts to the batch path, contexts prefix-prefilled once per
    toy on BOTH models."""
    from prego_tpu.anticipation.driver import run_anticipation
    from prego_tpu.anticipation.llm import JaxLlamaLLM

    ctx_a = ("toy A steps: " + "3 1 4 1 5 9 2 6 " * 12)[:195]
    ctx_b = ("toy B steps: " + "2 7 1 8 2 8 1 8 " * 12)[:195]
    contexts = {"a21": {"num": ctx_a}, "a33": {"num": ctx_b}}
    seqs = {
        "v1-x-a21_1": {"pred": [1, 2, 3], "gt": [1, 2, 3]},
        "v2-x-a33_1": {"pred": [4, 5], "gt": [4, 5]},
    }

    def run(**kw):
        llm = JaxLlamaLLM(
            None, None, fabricated="tiny", max_seq_len=512,
            max_batch_size=8, **kw,
        )
        res = run_anticipation(
            seqs, llm, dataset="assembly", contexts=contexts,
            temperature=0.0, num_samples=2, max_gen_len=4,
        )
        return llm, res

    llm_b, res_b = run()
    llm_s, res_s = run(spec_k=2, spec_draft="fabricated-tiny")
    assert res_s.preds == res_b.preds
    assert llm_s.llama.prefix_rebuilds == 2  # one per toy context
    assert llm_s._spec._draft_llama.prefix_rebuilds == 2


def test_jax_llama_fabricated_quantized_runs_on_cpu():
    """--fabricated --quantize must run off-TPU too (the int8 tree's
    embedding/norm leaves follow the platform dtype — bf16 leaves break
    the CPU dot thunk; regression found driving the CLI)."""
    from prego_tpu.anticipation.llm import JaxLlamaLLM

    llm = JaxLlamaLLM(
        None, None, fabricated="tiny", max_seq_len=128, quantize=True,
        kv_quant=True,
    )
    out = llm.text_completion(
        ["Sequence: 1, 2\nNext:\n"], max_gen_len=4, temperature=0.0
    )
    assert len(out) == 1 and "generation" in out[0]


def test_jax_llama_fabricated_int8x8_runs_on_cpu():
    """quantize='int8x8' (activation-quant int8xint8) through the LLM
    adapter: fabricated leaves carry the 'act' marker and generation runs
    off-TPU (VERDICT r4 #6's adapter seam)."""
    import pytest as _pytest

    from prego_tpu.anticipation.llm import JaxLlamaLLM

    with _pytest.raises(ValueError, match="quantize mode"):
        JaxLlamaLLM(None, None, fabricated="tiny", quantize="int4")
    llm = JaxLlamaLLM(
        None, None, fabricated="tiny", max_seq_len=128, quantize="int8x8",
    )
    wqkv = llm.llama.params["layers"][0]["attention"]["wqkv"]
    assert "act" in wqkv
    out = llm.text_completion(
        ["Sequence: 1, 2\nNext:\n"], max_gen_len=4, temperature=0.0
    )
    assert len(out) == 1 and "generation" in out[0]


def test_jax_llama_fabricated_tiny_drives_cli(tmp_path):
    """--fabricated runs the real driver with random weights at a named
    shape (timing demonstrations; no checkpoint assets needed)."""
    import json
    import os.path as osp

    from prego_tpu.cli.anticipate import main

    golden = osp.join(osp.dirname(__file__), "golden", "synth_seqs.json")
    main([
        "--seqs", golden, "--llm", "jax-llama", "--fabricated", "tiny",
        "--dataset", "synthcustom", "--results_root", str(tmp_path),
        "--temperature", "0.0", "--max_gen_len", "4", "--max_seq_len", "128",
    ])
    out = next(tmp_path.glob("*/metrics.json"))
    m = json.loads(out.read_text())
    assert m["samples"] > 0
