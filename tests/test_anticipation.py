"""Anticipation branch: prompt golden strings, output cleaning, fake-LLM
end-to-end mistake detection (SURVEY.md §4: integration with a fake LLM)."""

import json
import os

import pytest

from prego_tpu.anticipation import (
    FakeLLM,
    PromptBuilder,
    anticipate_sequence,
    clean_generation,
    get_toy,
    remove_sequence_input,
    run_anticipation,
    symbolize_sequence,
)
from prego_tpu.metrics import get_metrics

REF_PRED = "/root/reference/step_anticipation/data/predictions/output_miniROAD_Assembly101-O.json"


# ---- prompt construction ----

def test_step_prompt_golden():
    """Exact prompt layout of llama_meta.py:118-159 for the default style."""
    context = (
        "Sequence type: a21\nInput Sequence:\n -1, 39, 74\nNext Symbol:\n 37\n---\n"
    )
    b = PromptBuilder(context=context, toy="a21", type_prompt="num")
    got = b.step_prompt([5, 7, 9], 2)
    expected = (
        context
        + "Sequence type: a21\n"
        + "Input Sequence:\n -1, 5, 7\n"
        + "Next Symbol:\n"
    )
    assert got == expected


def test_step_prompt_first_step_history_is_start_token():
    b = PromptBuilder(context="", toy="x1", type_prompt="num")
    got = b.step_prompt([3], 0)
    assert "Input Sequence:\n -1\n" in got


def test_emoji_prompt_start_token_replaced():
    context = "Input Sequence:\n -1, 39\n"
    b = PromptBuilder(context=context, toy="a21", type_prompt="emoji")
    got = b.step_prompt(["🎉"], 0)
    assert "-1" not in got
    assert "👉, 39" in got  # context replacement (llama_meta.py:110-112)
    assert "Input Sequence:\n 👉\n" in got  # history start token


def test_toy_class_rewrite():
    prompt = (
        "Sequence type: a21\nInput Sequence:\n -1, 1\nNext Symbol:\n 2\n---\n"
        "Sequence type: b05c\nInput Sequence:\n -1, 3\nNext Symbol:\n 4\n---\n"
    )
    out = remove_sequence_input(prompt, "dumper")
    assert "a21" not in out and "b05c" not in out
    assert out.count("Sequence type: dumper\n") == 2
    assert "Symbol" not in out  # Symbol -> Sequence rewrite
    assert "Next Sequence:" in out

    b = PromptBuilder(context=prompt, toy="a21", toy_class="dumper", type_prompt="num")
    got = b.step_prompt([1], 0)
    assert "Sequence type: dumper\n" in got.split("---\n")[-1]


def test_accumulate_mode_grows():
    """llm_hf.py builds the prompt cumulatively across steps."""
    b = PromptBuilder(context="", toy="t", type_prompt="num", accumulate=True)
    p0 = b.step_prompt([1, 2], 0)
    p1 = b.step_prompt([1, 2], 1)
    assert p1.startswith(p0)
    assert len(p1) > len(p0)


def test_symbolize():
    assert symbolize_sequence([1, 2], "num") == [1, 2]
    assert symbolize_sequence([0], "alpha", idx2action={0: "attach-foo"}) == ["attach-foo"]
    assert symbolize_sequence(
        [3], "emoji", idx2emoji={"3": {"escape": "🚓"}}
    ) == ["🚓"]


# ---- output cleaning ----

def test_clean_num():
    assert clean_generation(" 37\n---\nSequence", "num") == 37
    assert clean_generation("_42_", "num") == 42
    assert clean_generation(" not-a-number ", "num") == " not-a-number "[: 0] or isinstance(
        clean_generation(" nope ", "num"), str
    )


def test_clean_alpha_cuts_at_newline():
    assert clean_generation("attach-tilter\n---\nnext", "alpha") == "attach-tilter"
    # reference quirk: no newline -> v[:-1] drops the last char (llama_meta.py:207)
    assert clean_generation("abc", "alpha") == "ab"


def test_clean_emoji_first_char():
    assert clean_generation("🚓 something", "emoji") == "🚓"
    assert clean_generation("", "emoji") == ""


def test_clean_hf_mode_strips_everywhere():
    assert clean_generation(" 3 7 \n", "num", mode="hf") == 37


def test_get_toy():
    assert get_toy("nusar-2021_action_both_9044-a08_9044_user_id_2021-02-05_154403") == "a08"


# ---- fake-LLM end-to-end ----

def test_anticipate_with_perfect_oracle_detects_only_last_mistake():
    """An oracle that predicts the true next step ⇒ every non-final step
    matches; making the last step deviate ⇒ tp=1 per video."""
    seqs = {
        "nusar-2021_action_both_9044-a08_9044_x": {"pred": [1, 2, 3, 99], "gt": []},
        "nusar-2021_action_both_9025-b08d_9025_x": {"pred": [4, 5, 6, 98], "gt": []},
    }
    # oracle: given history [-1, s0..s_{i-1}] predict s_{i-1}+1 (true next for
    # the consecutive part; start token -1 -> predicts first element)
    def oracle(hist):
        last = int(hist[-1])
        return {-1: 1, 1: 2, 2: 3, 3: 4, 4: 4, 5: 6}.get(last, last + 1)

    # build per-video oracles: answer the next element of the correct prefix
    def make_oracle(seq):
        def o(hist):
            i = len(hist) - 1  # history includes the start token
            return seq[i] if i < len(seq) - 1 else -123  # never predicts the mistake
        return o

    preds, gts = {}, {}
    for k, v in seqs.items():
        llm = FakeLLM(oracle=make_oracle(v["pred"]))
        b = PromptBuilder(context="", toy=get_toy(k), type_prompt="num")
        p, g = anticipate_sequence(v["pred"], b, llm, num_samples=1, temperature=0.0)
        preds[k], gts[k] = p, g

    m = get_metrics(preds, gts)
    assert m["tp"] == 2 and m["fn"] == 0  # both mistakes caught
    assert m["fp"] == 0 and m["tn"] == 6  # all correct steps matched
    assert m["f1"] == 1.0


def test_num_samples_squared_generations():
    llm = FakeLLM()
    b = PromptBuilder(context="", toy="t", type_prompt="num")
    anticipate_sequence([1, 2], b, llm, num_samples=3, batch_mode="batched")
    # one call per step, each with 9 prompts
    assert [len(c) for c in llm.calls] == [9, 9]

    llm2 = FakeLLM()
    anticipate_sequence([1, 2], b, llm2, num_samples=3, batch_mode="reference")
    # reference shape: 3 calls of 3 prompts per step
    assert [len(c) for c in llm2.calls] == [3, 3, 3, 3, 3, 3]


def test_step_batched_equals_per_step():
    """step_batch folds N steps into one dispatch; with a deterministic
    LLM the preds/gts/out_plot must be identical to step_batch=1."""
    seq = [1, 2, 3, 4, 4, 6, 7]
    b = PromptBuilder(context="ctx", toy="t", type_prompt="num")

    llm1 = FakeLLM()
    plot1: dict = {}
    p1, g1 = anticipate_sequence(
        seq, b, llm1, num_samples=2, out_plot=plot1, latencies=[]
    )
    for sb in (2, 3, 100):
        llm2 = FakeLLM()
        plot2: dict = {}
        p2, g2 = anticipate_sequence(
            seq, b, llm2, num_samples=2, step_batch=sb, out_plot=plot2, latencies=[]
        )
        assert p2 == p1 and g2 == g1 and plot2 == plot1
    # dispatch count shrinks: 7 steps at step_batch=3 -> 3 calls, and the
    # tail call is PADDED to the same 12-prompt signature (one compile
    # signature per suffix bucket; padding results are discarded)
    llm3 = FakeLLM()
    anticipate_sequence(seq, b, llm3, num_samples=2, step_batch=3)
    assert [len(c) for c in llm3.calls] == [12, 12, 12]


def test_step_batch_rejects_reference_mode():
    b = PromptBuilder(context="", toy="t", type_prompt="num")
    with pytest.raises(ValueError):
        anticipate_sequence(
            [1, 2], b, FakeLLM(), step_batch=2, batch_mode="reference"
        )


def test_run_anticipation_out_plot_and_metrics():
    seqs = {
        "nusar-2021_action_both_9044-a08_9044_x": {"pred": [1, 1, 7], "gt": [1, 1, 7]},
    }
    llm = FakeLLM()  # echoes last history symbol
    res = run_anticipation(seqs, llm, dataset="assembly", eval_metrics=True)
    # echo oracle: step0 history [-1] -> echo "-1", and the reference num
    # cleaning strips the minus sign -> pred {1} MATCHES gt 1;
    # step1 history [-1,1] -> {1} matches; step2 history [-1,1,1] -> {1} vs 7 no match
    assert res.metrics["tp"] == 1  # last step mismatch -> mistake caught
    assert res.metrics["fp"] == 0 and res.metrics["tn"] == 2
    assert set(res.out_plot) == {1, 2, 3}


@pytest.mark.skipif(not os.path.exists(REF_PRED), reason="reference artifacts absent")
def test_fake_llm_on_reference_predictions():
    """Drive the full driver over the real shipped recognizer predictions."""
    with open(REF_PRED) as f:
        seqs = json.load(f)
    small = dict(list(seqs.items())[:5])
    llm = FakeLLM()
    res = run_anticipation(small, llm, dataset="assembly", eval_metrics=True)
    assert res.metrics["samples"] == sum(len(v["pred"]) for v in small.values())
    for k in small:
        assert len(res.preds[k]) == len(small[k]["pred"])


@pytest.mark.parametrize(
    "style,init,inp,out",
    [
        ("unreferenced", "Context:", "Input:", "Output:"),
        ("elaborate", "Given the sequences of the following:",
         "Complete the following sequence:", "Sequence is completed with:"),
        ("no-context", "Sequence type:", "", ""),
    ],
)
def test_other_context_styles_golden(style, init, inp, out):
    """All four published prompt styles produce the exact reference layout
    (data/context_prompt/context_prompt.json x llama_meta.py:118-159)."""
    b = PromptBuilder(context="CTX\n", toy="a08", type_prompt="num", prompt_context=style)
    got = b.step_prompt([4, 5], 1)
    assert got == f"CTX\n{init} a08\n{inp}\n -1, 4\n{out}\n"


@pytest.mark.skipif(not os.path.exists(REF_PRED), reason="reference artifacts absent")
def test_reference_context_styles_match_embedded_defaults():
    """The embedded default styles equal the reference's shipped JSON."""
    import json as _json

    from prego_tpu.anticipation import DEFAULT_CONTEXT_STYLES

    path = "/root/reference/step_anticipation/data/context_prompt/context_prompt.json"
    if not os.path.exists(path):
        pytest.skip("context_prompt.json absent")
    with open(path) as f:
        shipped = _json.load(f)
    assert shipped == DEFAULT_CONTEXT_STYLES
