"""LLM seam for step anticipation.

Parity surface: the reference proves the LLM is swappable behind
``text_completion(prompts, max_gen_len, temperature, top_p)`` — three
drivers share that seam (llama/generation.py:233-282 Llama.text_completion,
llm_hf.py:37-58 HFModel.text_completion, llm_ollama.py ollama.chat wrapper).
This module defines the protocol plus:

  * FakeLLM — a deterministic next-symbol oracle for hermetic end-to-end
    tests (SURVEY.md §4);
  * HFPipelineLLM — transformers pipeline adapter (llm_hf.py parity);
  * the TPU-native JAX LLaMA adapter lives in prego_tpu.models.llama.

Completion dicts carry {"generation": str} with the prompt echo already
stripped, matching Llama.text_completion output.
"""

from __future__ import annotations

import os
import sys
from typing import Callable, Dict, List, Optional, Protocol

from prego_tpu.core.registry import LLMS


class CompletionLLM(Protocol):
    def text_completion(
        self,
        prompts: List[str],
        max_gen_len: Optional[int] = None,
        temperature: float = 0.6,
        top_p: float = 0.9,
    ) -> List[Dict[str, str]]: ...


@LLMS.register("fake")
class FakeLLM:
    """Deterministic in-context next-symbol oracle.

    Parses the last "Input Sequence:"-style block of the prompt and answers
    with a configurable function of the history (default: echo the last
    symbol). Lets the full anticipation pipeline run hermetically.
    """

    def __init__(
        self,
        oracle: Optional[Callable[[List[str]], str]] = None,
        input_marker: str = "\n",
    ):
        self.oracle = oracle or (lambda hist: hist[-1])
        self.calls: List[List[str]] = []

    def _history_from_prompt(self, prompt: str) -> List[str]:
        # The step prompt ends "...{input}\n {hist}\n{output}\n" — the
        # history is the penultimate non-empty line.
        lines = [ln for ln in prompt.split("\n") if ln.strip()]
        hist_line = lines[-2] if len(lines) >= 2 else ""
        return [tok.strip() for tok in hist_line.split(",") if tok.strip()]

    def text_completion(
        self,
        prompts: List[str],
        max_gen_len: Optional[int] = None,
        temperature: float = 0.6,
        top_p: float = 0.9,
    ) -> List[Dict[str, str]]:
        self.calls.append(list(prompts))
        out = []
        for p in prompts:
            hist = self._history_from_prompt(p)
            out.append({"generation": f" {self.oracle(hist)}"})
        return out


@LLMS.register("hf")
class HFPipelineLLM:
    """transformers text-generation pipeline adapter (llm_hf.py:24-58).

    The pipeline echoes the prompt; it is stripped here so every backend
    honours the same no-echo contract.
    """

    def __init__(self, model_name: str, device_map: str = "auto", pipe=None):
        if pipe is not None:  # injected prebuilt pipeline (tests, local models)
            self.pipe = pipe
            return
        from transformers import pipeline  # lazy: heavy import

        self.pipe = pipeline(
            "text-generation",
            model=model_name,
            tokenizer=model_name,
            device_map=device_map,
        )

    def text_completion(
        self,
        prompts: List[str],
        max_gen_len: Optional[int] = None,
        temperature: float = 0.6,
        top_p: float = 0.9,
    ) -> List[Dict[str, str]]:
        do_sample = temperature > 0
        kwargs = {
            "max_new_tokens": max_gen_len,
            "do_sample": do_sample,
            "return_full_text": False,
        }
        if do_sample:
            kwargs.update(temperature=temperature, top_p=top_p)
        outputs = self.pipe(prompts, **kwargs)
        flat = []
        for res in outputs:
            if isinstance(res, list):
                res = res[0]
            flat.append({"generation": res["generated_text"]})
        return flat


@LLMS.register("ollama")
class OllamaLLM:
    """Ollama chat adapter (llm_ollama.py:76-145 parity) — talks to a local
    Ollama server over raw HTTP (the ollama pip package is not required).
    The reference's system message forcing a single-number answer is kept.
    """

    SYSTEM = (
        "Always provide only the final output, consisting in one and only "
        "one number. Never output anything different from a single number."
    )

    def __init__(self, model_name: str, host: str = "http://127.0.0.1:11434"):
        self.model_name = model_name
        self.host = host.rstrip("/")

    def _chat(self, prompt: str, temperature: float, top_p: float, max_gen_len):
        import json as _json
        import urllib.request

        body = _json.dumps(
            {
                "model": self.model_name,
                "stream": False,
                "messages": [
                    {"role": "system", "content": self.SYSTEM},
                    {"role": "user", "content": prompt},
                ],
                "options": {
                    "temperature": temperature,
                    "top_p": top_p,
                    **({"num_predict": max_gen_len} if max_gen_len else {}),
                },
            }
        ).encode()
        req = urllib.request.Request(
            f"{self.host}/api/chat", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            return _json.loads(resp.read())["message"]["content"]

    def text_completion(
        self,
        prompts: List[str],
        max_gen_len: Optional[int] = None,
        temperature: float = 0.6,
        top_p: float = 0.9,
    ) -> List[Dict[str, str]]:
        return [
            {"generation": self._chat(p, temperature, top_p, max_gen_len)}
            for p in prompts
        ]


@LLMS.register("jax-llama")
class JaxLlamaLLM:
    """TPU-native LLaMA backend (replaces the vendored Meta runtime +
    torchrun/NCCL/fairscale launch, llama/generation.py:52-123).

    Loads Meta consolidated .pth shards or an HF export, merges them on
    host, and (optionally) shards tensor-parallel over a ('tp',) mesh.
    """

    def __init__(
        self,
        ckpt_dir: str,
        tokenizer_path: str,
        max_seq_len: int = 512,
        max_batch_size: int = 8,
        tp: Optional[int] = None,
        dtype=None,
        prefix_cache: bool = True,  # PREGO prompts share huge prefixes
        orbax_dir: Optional[str] = None,  # sharded-format cache of converted weights
        quantize=False,  # int8 serving (ops/quant.py): False | True/"int8"
        # (weight-only) | "int8x8" (activation-quant int8 x int8 MXU;
        # under tp>1 it shards with the same column/row specs as
        # weight-only and routes through the SPMD-partitionable int32-dot
        # XLA dense — parallel/sharding.py::llama_param_specs)
        kv_quant: bool = False,  # int8 KV cache (model.init_cache(quantized=True))
        fabricated: Optional[str] = None,  # "7b"/"13b": random weights at a
        # reference serving shape (vocab 32000, byte tokenizer) — TIMING
        # demonstrations of the full driver at scale, not real predictions
        serving: str = "batch",  # "batch": drain-style generate (reference
        # semantics); "cb": route every text_completion through the
        # continuous-batching slot loop (serving_llm.ContinuousBatcher)
        cb_slots: Optional[int] = None,  # CB slot count (default max_batch_size)
        spec_k: int = 0,  # >0: speculative decoding with k-token drafts
        # (models/llama/speculative.py) — greedy output identical to the
        # plain path for any draft; sampled mode distribution-preserving
        spec_draft: Optional[str] = None,  # "self-N" (first N target
        # layers, SHARED weight arrays — zero extra HBM, the deployable
        # draft at 7B on one v5e), "fabricated-1b"/"fabricated-tiny"
        # (random weights — demonstrates the machinery; acceptance ~0), or
        # a Meta checkpoint dir for a real trained draft
    ):
        self.prefix_cache = prefix_cache
        if quantize is True:
            quantize = "int8"
        if quantize not in (False, "int8", "int8x8"):
            raise ValueError(
                f"unknown quantize mode {quantize!r} (False|'int8'|'int8x8')"
            )
        act_quant = quantize == "int8x8"
        quantize = bool(quantize)
        if serving not in ("batch", "cb"):
            raise ValueError(f"unknown serving mode {serving!r} (batch|cb)")
        if spec_k and serving == "cb":
            raise ValueError(
                "speculative decoding rides the batch path (spec_k is "
                "incompatible with --serving cb)"
            )
        if bool(spec_k) != (spec_draft is not None):
            raise ValueError("spec_k and spec_draft must be set together")
        self._serving = serving
        self._cb_slots = cb_slots
        self._cb = None  # built lazily per (temperature-independent) config
        self._spec_k = int(spec_k)
        self._spec_draft = spec_draft
        self._spec = None  # built lazily (needs self.llama)
        # production guard: once enough proposals have accumulated, a
        # realized acceptance below break-even means speculation is
        # SLOWING the run (the measured k=4 endpoints put break-even at
        # acceptance ~0.26 for a 1B-class draft, RESULTS.md) — fall back
        # to the plain path for the rest of the run instead of silently
        # paying the draft tax. Threshold defaults to 1/k (conservative:
        # cheaper drafts break even lower); PREGO_SPEC_MIN_ACCEPT
        # overrides, 0 disables the guard.
        self._spec_disabled = False
        env = os.environ.get("PREGO_SPEC_MIN_ACCEPT")
        try:
            self._spec_min_accept = (
                float(env) if env is not None
                else (1.0 / spec_k if spec_k else 0.0)
            )
        except ValueError:
            print(
                f"prego_tpu: ignoring unparsable PREGO_SPEC_MIN_ACCEPT="
                f"{env!r}; using 1/k",
                file=sys.stderr,
            )
            self._spec_min_accept = 1.0 / spec_k if spec_k else 0.0
        if fabricated is not None:
            self._init_fabricated(
                fabricated, max_seq_len, max_batch_size, quantize, kv_quant,
                act_quant,
            )
            return
        import jax
        import jax.numpy as jnp

        from prego_tpu.checkpoint.convert import (
            convert_hf_checkpoint,
            convert_meta_checkpoint,
        )
        from prego_tpu.models.llama import Llama, LlamaConfig, load_tokenizer
        from prego_tpu.parallel import llama_param_specs, shard_params, tp_mesh

        # bf16 is the TPU serving dtype; CPU XLA cannot execute bf16 dots,
        # so asset-free smoke drives on host fall back to f32
        if dtype is None:
            dtype = (
                jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
            )
        tokenizer = load_tokenizer(tokenizer_path)
        import os.path as osp

        if not osp.isdir(ckpt_dir):
            raise FileNotFoundError(
                f"ckpt_dir {ckpt_dir!r} does not exist (expected a Meta "
                "checkpoint dir with params.json or an HF export with config.json)"
            )
        # With quantize=True every pre-int8 stage (convert, fuse,
        # quantize) runs on host CPU: the intermediate bf16 tree is
        # 13.5 GB at 7B and must never land on a 16 GB serving chip.
        # Only the final int8 tree (~6.7 GB) is device_put.
        import contextlib

        if tp is None:
            # bf16 keeps the historical default (use every visible device);
            # QUANTIZED serving defaults to single-chip — the int8 fused
            # layout + Pallas kernels are the flagship one-chip mode, and
            # auto-sharding it just because multiple devices are visible
            # (e.g. a CPU test mesh) would silently swap layouts. Pass
            # tp>1 explicitly for multi-chip int8 (unfused + xla paths).
            tp = 1 if quantize else len(jax.devices())
        quantized_loaded = False
        stage_ctx = (
            (lambda: jax.default_device(jax.devices("cpu")[0]))
            if quantize
            else contextlib.nullcontext
        )
        if osp.exists(osp.join(ckpt_dir, "params.json")):
            config = LlamaConfig.from_params_json(
                ckpt_dir,
                max_seq_len=max_seq_len,
                max_batch_size=max_batch_size,
                vocab_size=tokenizer.n_words,
            )
            params = None
            if orbax_dir and osp.isdir(orbax_dir) and (tp > 1 and quantize):
                # the int8 orbax cache holds the FUSED single-chip serving
                # layout; tensor-parallel int8 needs the unfused fairscale
                # layout, so convert fresh instead of restoring it
                pass
            elif orbax_dir and osp.isdir(orbax_dir):
                from prego_tpu.checkpoint.orbax_io import load_llama_params

                if quantize and not act_quant:
                    # the cache holds the serving layout (fused weight-only
                    # int8) — restores straight into int8+scale leaves;
                    # fall back to a bf16 cache written by a non-quantized
                    # run (the act layout never restores from it: its
                    # leaves carry the extra marker)
                    try:
                        params = load_llama_params(
                            orbax_dir, config, dtype=dtype, quantized=True
                        )
                        quantized_loaded = True
                    except Exception:
                        with stage_ctx():
                            params = load_llama_params(
                                orbax_dir, config, dtype=dtype
                            )
                else:
                    params = load_llama_params(orbax_dir, config, dtype=dtype)
            if params is None:
                with stage_ctx():
                    params = convert_meta_checkpoint(ckpt_dir, config, dtype)
                if orbax_dir and not quantize:
                    from prego_tpu.checkpoint.orbax_io import save_llama_params

                    save_llama_params(orbax_dir, params)
        else:  # HF-format directory (config.json + safetensors)
            import json as _json

            with open(osp.join(ckpt_dir, "config.json")) as f:
                hf = _json.load(f)
            config = LlamaConfig(
                dim=hf["hidden_size"],
                n_layers=hf["num_hidden_layers"],
                n_heads=hf["num_attention_heads"],
                n_kv_heads=hf.get("num_key_value_heads"),
                vocab_size=hf["vocab_size"],
                norm_eps=hf.get("rms_norm_eps", 1e-5),
                rope_theta=hf.get("rope_theta", 10000.0),
                max_seq_len=max_seq_len,
                max_batch_size=max_batch_size,
            )
            with stage_ctx():
                params = convert_hf_checkpoint(ckpt_dir, config, dtype)

        if tp > 1:
            # Multi-chip tensor parallelism — fairscale column/row layout
            # as sharding metadata (llama/model.py:202-235; SURVEY §2.4).
            # The UNfused leaves are sharded (fusion is a single-chip
            # optimization); int8 leaves get quantized PartitionSpecs and
            # the "xla" dense marker so every projection runs through the
            # SPMD-partitionable dequant-fused XLA matmul instead of the
            # single-chip Pallas kernels (VERDICT r3 #2 — previously
            # quantize=True silently IGNORED tp).
            import dataclasses as _dc

            config = _dc.replace(config, tp_serving=True)
            mesh = tp_mesh(tp)
            if quantize:
                from prego_tpu.models.llama.model import (
                    mark_xla_dense,
                    quantize_params,
                )

                with stage_ctx():
                    params = quantize_params(params, activations=act_quant)
                params = shard_params(
                    params,
                    llama_param_specs(
                        config, quantized=True, activations=act_quant
                    ),
                    mesh,
                )
                params = mark_xla_dense(params)
            else:
                params = shard_params(params, llama_param_specs(config), mesh)
        elif quantized_loaded:
            pass  # restored directly as fused int8 on the serving chip
        else:
            # single-chip serving: fused qkv/w13 projections (28% decode win)
            from prego_tpu.models.llama.model import fuse_projections

            if quantize:
                from prego_tpu.checkpoint.orbax_io import save_llama_params
                from prego_tpu.models.llama.model import quantize_params

                with stage_ctx():  # host-side fuse + quantize (see above)
                    params = fuse_projections(params)
                    params = quantize_params(params, activations=act_quant)
                if orbax_dir and not osp.isdir(orbax_dir) and not act_quant:
                    # fresh cache: store the serving layout so later
                    # launches restore int8 directly (no bf16 stage at
                    # all); an existing bf16 cache is left untouched (the
                    # act layout is not cached — its marker is structural)
                    save_llama_params(orbax_dir, params)
                params = jax.device_put(params, jax.devices()[0])
            else:
                params = fuse_projections(params)
        self.llama = Llama(params, tokenizer, config, kv_quant=kv_quant)

    # reference serving shapes (llama/model.py:20-31 + Llama.build's
    # 7B/13B checkpoints, generation.py:101-120); "1b"/"tiny" are
    # smoke-scale stand-ins
    _FABRICATED_SHAPES = {
        "7b": dict(dim=4096, n_layers=32, n_heads=32),
        "13b": dict(dim=5120, n_layers=40, n_heads=40),
        "1b": dict(dim=2048, n_layers=16, n_heads=16),
        "tiny": dict(dim=64, n_layers=2, n_heads=4),
    }

    def _init_fabricated(
        self, shape: str, max_seq_len: int, max_batch_size: int,
        quantize: bool, kv_quant: bool, act_quant: bool = False,
    ):
        """Random weights at a reference serving shape (full 32000-entry
        lm-head; prompts go through the ByteTokenizer) — lets the REAL
        driver run the complete anticipation workload at the reference's
        scale for timing when no checkpoint assets exist in the image.
        Output text is noise, so metrics from such runs are meaningless;
        the run IS the measurement."""
        import jax
        import jax.numpy as jnp

        from prego_tpu.models.llama import ByteTokenizer, Llama, LlamaConfig
        from prego_tpu.models.llama.model import (
            fuse_projections,
            init_params,
            init_params_quantized,
        )

        s = self._FABRICATED_SHAPES[shape]
        cfg = LlamaConfig(
            dim=s["dim"], n_layers=s["n_layers"], n_heads=s["n_heads"],
            n_kv_heads=s["n_heads"],
            vocab_size=32000 if shape in ("7b", "13b") else 258,
            multiple_of=256 if shape != "tiny" else 16, norm_eps=1e-5,
            max_batch_size=max_batch_size, max_seq_len=max_seq_len,
        )
        dtype = (
            jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        )
        if quantize:
            params = init_params_quantized(
                cfg, jax.random.PRNGKey(0), fused=True, dtype=dtype,
                activations=act_quant,
            )
        else:
            params = fuse_projections(
                init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
            )
        self.llama = Llama(params, ByteTokenizer(), cfg, kv_quant=kv_quant)

    def _batcher(self):
        if self._cb is None:
            from prego_tpu.serving_llm import ContinuousBatcher

            self._cb = ContinuousBatcher(
                self.llama,
                slots=self._cb_slots or self.llama.config.max_batch_size,
                prefix_sharing=self.prefix_cache,
            )
        return self._cb

    def _speculator(self):
        if self._spec is None:
            import jax
            import jax.numpy as jnp

            from prego_tpu.models.llama import LlamaConfig
            from prego_tpu.models.llama.model import init_params
            from prego_tpu.models.llama.speculative import (
                SpeculativeLlama,
                self_draft,
            )

            cfg = self.llama.config
            if self._spec_draft.startswith("self-"):
                # layer-truncated self-draft: shares the TARGET's weight
                # arrays (zero extra HBM — the deployable 7B-on-one-v5e
                # draft config); "self-8" = first 8 of the target's layers
                d_params, d_cfg = self_draft(
                    self.llama.params, cfg, int(self._spec_draft[5:])
                )
                self._spec = SpeculativeLlama(
                    self.llama, d_params, d_cfg, k=self._spec_k
                )
                return self._spec
            if self._spec_draft.startswith("fabricated-"):
                s = self._FABRICATED_SHAPES[
                    self._spec_draft[len("fabricated-"):]
                ]
                d_cfg = LlamaConfig(
                    dim=s["dim"], n_layers=s["n_layers"], n_heads=s["n_heads"],
                    n_kv_heads=s["n_heads"], vocab_size=cfg.vocab_size,
                    multiple_of=256 if s["dim"] >= 256 else 16, norm_eps=1e-5,
                    max_batch_size=cfg.max_batch_size,
                    max_seq_len=cfg.max_seq_len,
                )
                dtype = (
                    jnp.bfloat16
                    if jax.default_backend() == "tpu" else jnp.float32
                )
                d_params = init_params(d_cfg, jax.random.PRNGKey(11), dtype=dtype)
            else:  # Meta checkpoint dir (bf16 draft, same tokenizer/vocab)
                from prego_tpu.checkpoint.convert import convert_meta_checkpoint

                d_cfg = LlamaConfig.from_params_json(
                    self._spec_draft,
                    max_seq_len=cfg.max_seq_len,
                    max_batch_size=cfg.max_batch_size,
                    vocab_size=cfg.vocab_size,
                )
                dtype = (
                    jnp.bfloat16
                    if jax.default_backend() == "tpu" else jnp.float32
                )
                d_params = convert_meta_checkpoint(self._spec_draft, d_cfg, dtype)
            self._spec = SpeculativeLlama(
                self.llama, d_params, d_cfg, k=self._spec_k
            )
        return self._spec

    def text_completion(
        self,
        prompts: List[str],
        max_gen_len: Optional[int] = None,
        temperature: float = 0.6,
        top_p: float = 0.9,
    ) -> List[Dict[str, str]]:
        if self._serving == "cb":
            # continuous-batching backend: the anticipation dispatch
            # (step_batch x num_samples^2 prompts sharing a long context)
            # runs through the slot loop — per-request retirement instead
            # of drain-to-the-longest, prefix KV shared via the same LRU
            # the batch path uses (VERDICT r3 #1c)
            if max_gen_len is None:
                max_gen_len = self.llama.config.max_seq_len - 1
            toks = [
                self.llama.tokenizer.encode(x, bos=True, eos=False)
                for x in prompts
            ]
            outs = self._batcher().serve_prompts(
                toks, max_gen_len, temperature=temperature, top_p=top_p
            )
            return [{"generation": self.llama.tokenizer.decode(t)} for t in outs]
        if self._spec_k and not self._spec_disabled:
            spec = self._speculator()
            out = spec.text_completion(
                prompts, temperature=temperature, top_p=top_p,
                max_gen_len=max_gen_len, use_prefix_cache=self.prefix_cache,
            )
            # auto-off guard: judge acceptance only once the sample is
            # meaningful (>= 256 proposals — the hermetic driver tests
            # stay under the bar and keep speculating)
            if (
                self._spec_min_accept > 0
                and spec.drafts_proposed >= 256
                and spec.drafts_accepted
                < self._spec_min_accept * spec.drafts_proposed
            ):
                self._spec_disabled = True
                print(
                    "prego_tpu: speculative decoding auto-disabled — "
                    f"acceptance {spec.drafts_accepted}/"
                    f"{spec.drafts_proposed} = "
                    f"{spec.drafts_accepted / spec.drafts_proposed:.3f} "
                    f"is below break-even "
                    f"(~{self._spec_min_accept:.2f} at k="
                    f"{self._spec_k}); continuing on the plain path "
                    "(PREGO_SPEC_MIN_ACCEPT=0 disables this guard)",
                    file=sys.stderr,
                )
            return out
        return self.llama.text_completion(
            prompts, temperature=temperature, top_p=top_p,
            max_gen_len=max_gen_len, use_prefix_cache=self.prefix_cache,
        )


def build_llm(name: str, **kwargs) -> CompletionLLM:
    return LLMS.get(name)(**kwargs)
