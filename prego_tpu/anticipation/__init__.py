from prego_tpu.anticipation.cleaning import clean_generation
from prego_tpu.anticipation.driver import (
    AnticipationResult,
    anticipate_sequence,
    get_toy,
    run_anticipation,
    save_results,
)
from prego_tpu.anticipation.llm import FakeLLM, HFPipelineLLM, build_llm
from prego_tpu.anticipation.prompts import (
    DEFAULT_CONTEXT_STYLES,
    PromptBuilder,
    load_context_styles,
    remove_sequence_input,
    symbolize_sequence,
)

__all__ = [
    "clean_generation",
    "AnticipationResult",
    "anticipate_sequence",
    "get_toy",
    "run_anticipation",
    "save_results",
    "FakeLLM",
    "HFPipelineLLM",
    "build_llm",
    "DEFAULT_CONTEXT_STYLES",
    "PromptBuilder",
    "load_context_styles",
    "remove_sequence_input",
    "symbolize_sequence",
]
