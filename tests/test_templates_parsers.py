"""Template/parser breadth: per-family rendering + loss-mask span checks
with a reversible character tokenizer (decode == exact rendered text), the
unit-test pattern the reference applies per model family
(reference data/template.py:92-, data/parse.py:15-510)."""

import numpy as np

from specforge_tpu.data.parse import (
    GeneralParser,
    GLMParser,
    build_parser_for_template,
)
from specforge_tpu.data.template import get_template, template_names


class CharTokenizer:
    """Reversible codepoint tokenizer: supervised spans decode to exact
    substrings of the rendered conversation."""

    bos_token_id = None

    def encode(self, text, add_special_tokens=False):
        return [ord(c) for c in text]

    def decode(self, ids):
        return "".join(chr(int(i)) for i in ids)


TOK = CharTokenizer()

CONV = [
    {"role": "user", "content": "Q1"},
    {"role": "assistant", "content": "A1"},
    {"role": "user", "content": "Q2"},
    {"role": "assistant", "content": "A2"},
]

REFERENCE_FAMILIES = {
    "llama3", "llama4", "qwen", "lfm", "phi3", "phi4", "phi4-mini",
    "gpt-oss-naive", "gpt-oss", "deepseek-r1-distill", "qwen3-thinking",
    "qwen3-instruct", "qwen3-next-thinking", "kimi-k2-thinking",
    "kimi-k2-instruct", "kimi-k3-thinking", "deepseek-v3", "deepseek-v2",
    "ling-flash-2.0", "deepseek-v32", "glm-5.2", "gemma", "longcat",
    "longcat_xml", "qwen3.5", "inkling-thinking",
}


def _supervised_text(sample):
    return TOK.decode(sample.input_ids[sample.loss_mask.astype(bool)])


def test_reference_family_breadth():
    assert REFERENCE_FAMILIES <= set(template_names())


def test_general_families_supervise_bodies_exactly():
    for name in ("llama3", "llama4", "qwen", "phi3", "phi4", "phi4-mini",
                 "deepseek-v3", "deepseek-v2", "ling-flash-2.0", "gemma",
                 "longcat", "longcat_xml", "kimi-k2-instruct", "lfm"):
        tmpl = get_template(name)
        parser = build_parser_for_template(TOK, name)
        assert isinstance(parser, GeneralParser)
        sample = parser.parse(CONV, max_length=4096)
        expected = f"A1{tmpl.end_token}A2{tmpl.end_token}"
        assert _supervised_text(sample) == expected, name
        # rendered text contains every user turn unsupervised
        full = TOK.decode(sample.input_ids)
        assert f"{tmpl.user_header}Q1" in full, name
        assert f"{tmpl.assistant_header}A1" in full, name


def test_qwen3_instruct_ignores_empty_think_scaffold():
    parser = build_parser_for_template(TOK, "qwen3-instruct")
    conv = [
        {"role": "user", "content": "Q"},
        {"role": "assistant",
         "content": "<think>\n\n</think>\n\nThe answer."},
    ]
    sample = parser.parse(conv, max_length=4096)
    assert _supervised_text(sample) == "The answer.<|im_end|>\n"
    assert "<think>" in TOK.decode(sample.input_ids)  # rendered as context


def test_thinking_family_supervises_think_spans():
    parser = build_parser_for_template(TOK, "qwen3-thinking")
    conv = [
        {"role": "user", "content": "Q"},
        {"role": "assistant",
         "content": "<think>step by step</think>Four."},
    ]
    sample = parser.parse(conv, max_length=4096)
    sup = _supervised_text(sample)
    # enable_thinking: the draft learns to draft reasoning tokens too
    assert "<think>step by step</think>" in sup
    assert sup.endswith("Four.<|im_end|>\n")


def test_kimi_k3_end_token_never_supervised():
    parser = build_parser_for_template(TOK, "kimi-k3-thinking")
    conv = [
        {"role": "user", "content": "Q"},
        {"role": "assistant", "content": "Ans"},
    ]
    sample = parser.parse(conv, max_length=4096)
    sup = _supervised_text(sample)
    assert "Ans" in sup
    assert "<|end_of_msg|>" not in sup
    assert "<|end_of_msg|>" in TOK.decode(sample.input_ids)


def test_glm_parser_scaffold_and_delimiter():
    parser = build_parser_for_template(TOK, "glm-5.2")
    assert isinstance(parser, GLMParser)
    sample = parser.parse(CONV, max_length=4096)
    full = TOK.decode(sample.input_ids)
    # scaffold closes immediately (enable_thinking forced off, ref parse.py:510)
    assert "<|assistant|><think></think>A1" in full
    # the <|user|> delimiter is not doubled: Q1/Q2 headers + final terminator
    assert full.count("<|user|>") == 3
    # terminator after the last assistant turn, never supervised
    assert full.endswith("A2<|user|>")
    assert _supervised_text(sample) == "A1A2"


def test_glm_parser_reasoning_head_unsupervised():
    parser = build_parser_for_template(TOK, "glm-5.2")
    conv = [
        {"role": "user", "content": "Q"},
        {"role": "assistant", "content": "let me think</think>Answer"},
    ]
    sample = parser.parse(conv, max_length=4096)
    full = TOK.decode(sample.input_ids)
    assert "<think>let me think</think>Answer" in full
    assert _supervised_text(sample) == "Answer"


def test_inkling_delimiter_terminator():
    parser = build_parser_for_template(TOK, "inkling-thinking")
    sample = parser.parse(CONV, max_length=4096)
    full = TOK.decode(sample.input_ids)
    assert full.count("<|message_user|>") == 3  # Q1, Q2, final terminator
    sup = _supervised_text(sample)
    assert "<|message_user|>" not in sup


def test_train_only_last_turn_supervises_final_assistant_only():
    """data.train_only_last_turn: only the LAST assistant turn carries loss
    (reference data/parse.py:283, schema.py:143) — across parser families."""
    for name in ("llama3", "qwen", "qwen3-thinking", "glm-5.2", "gpt-oss"):
        tmpl = get_template(name)
        parser = build_parser_for_template(
            TOK, name, train_only_last_turn=True
        )
        conv = CONV
        if name == "gpt-oss":
            conv = [
                {"role": "user", "content": "Q1"},
                {"role": "assistant", "content": "A1"},
                {"role": "user", "content": "Q2"},
                {"role": "assistant", "content": "A2"},
            ]
        sample = parser.parse(conv, max_length=4096)
        sup = _supervised_text(sample)
        assert "A1" not in sup, name
        assert "A2" in sup, name
        # the default parser supervises both turns on the same input
        both = build_parser_for_template(TOK, name).parse(conv, 4096)
        assert "A1" in _supervised_text(both), name


def test_tokenize_prompt_records_raw_and_pretokenized():
    """Raw conversations tokenize at the producer; pre-tokenized records
    pass through; unsupervised records drop (reference prepare_prompts,
    data/prompt_builder.py:20-336)."""
    from specforge_tpu.data.prompt_builder import tokenize_prompt_records

    pre = {"input_ids": [1, 2, 3], "loss_mask": [0, 1, 1]}
    raw = {"messages": CONV}
    empty = {"messages": [{"role": "user", "content": "Q"}]}
    out = tokenize_prompt_records(
        [pre, raw, empty], TOK, "llama3", max_length=4096
    )
    assert out[0] == pre
    assert len(out) == 2  # the all-user record dropped
    ids = np.asarray(out[1]["input_ids"])
    mask = np.asarray(out[1]["loss_mask"])
    tmpl = get_template("llama3")
    assert TOK.decode(ids[mask.astype(bool)]) == (
        f"A1{tmpl.end_token}A2{tmpl.end_token}"
    )


def test_mask_monotone_properties():
    for name in sorted(REFERENCE_FAMILIES - {"gpt-oss"}):
        parser = build_parser_for_template(TOK, name)
        sample = parser.parse(CONV, max_length=4096)
        assert len(sample.input_ids) == len(sample.loss_mask), name
        assert sample.loss_mask.sum() > 0, name
        assert sample.loss_mask[0] == 0, name
