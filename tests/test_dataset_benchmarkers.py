"""Named-dataset benchmarkers: formatting, answer extraction, accuracy
scoring (reference benchmarks/benchmarker/{gsm8k,aime,math500,mmlu,gpqa,
ceval,humaneval,mbpp,simpleqa,mtbench}.py contracts over local JSONL)."""

import json

import numpy as np
import pytest

from specforge_tpu.benchmarks.datasets import (
    DATASET_BENCHMARKERS,
    extract_code,
    get_benchmarker,
    run_python_tests,
    run_text_benchmark,
)


def test_registry_has_all_named_datasets():
    expected = {"gsm8k", "aime", "math500", "mmlu", "gpqa", "ceval",
                "humaneval", "mbpp", "simpleqa", "mt-bench"}
    assert expected <= set(DATASET_BENCHMARKERS)
    assert get_benchmarker("MT_BENCH") is DATASET_BENCHMARKERS["mt-bench"]


def test_gsm8k_few_shot_format_and_extract(tmp_path):
    bench = get_benchmarker("gsm8k")
    rows = [
        {"question": f"What is {i}+{i}?",
         "answer": f"{i} plus {i} is {2 * i}. #### {2 * i}"}
        for i in range(1, 8)
    ]
    path = tmp_path / "gsm8k.jsonl"
    path.write_text("".join(json.dumps(r) + "\n" for r in rows))
    records = bench.load(str(path))
    prompt = bench.format(records[6])
    # 5-shot prefix with gold answers, then the bare question
    assert prompt.count("Question:") == 6
    assert prompt.endswith("What is 7+7?\nAnswer:")
    assert "#### 2" in prompt  # shot answers included
    assert bench.label(records[6]) == 14
    assert bench.extract("…so the total is 1,234") == 1234
    assert bench.extract("no numbers here") is None
    # stop-string truncation inside accuracy(): text after a new
    # "Question:" (model rambling into the next few-shot round) is ignored
    acc = bench.accuracy(
        ["The answer is 14\n\nQuestion: what is 9+9?\nAnswer: 18"],
        [records[6]],
    )
    assert acc == 1.0


@pytest.mark.parametrize("out,expected", [
    ("After thinking, \\boxed{204}", "204"),
    ("\\boxed 042", "042"),
    ("The final answer: 73", "73"),
    ("x = 5000 but valid range filters to 999", "999"),
])
def test_aime_extraction(out, expected):
    bench = get_benchmarker("aime")
    assert bench.extract(out) == expected
    # numeric comparison: 042 == 42
    assert bench.score("042", "42")


def test_math500_label_from_solution_and_score():
    bench = get_benchmarker("math500")
    rec = {"problem": "p", "solution": "therefore \\boxed{3.5}"}
    assert bench.label(rec) == "3.5"
    assert bench.score(bench.extract("Answer: 3.50"), "3.5")
    assert not bench.score(bench.extract("Answer: 4"), "3.5")


def test_mmlu_format_and_extract():
    bench = get_benchmarker("mmlu")
    rec = {"question": "Pick one.", "choices": ["w", "x", "y", "z"],
           "answer": 2}
    prompt = bench.format(rec)
    assert "A) w" in prompt and "D) z" in prompt
    assert "Answer: $LETTER" in prompt
    assert bench.label(rec) == "C"
    assert bench.extract("thinking...\nAnswer: C") == "C"
    assert bench.extract("Answer: (B)") == "B"
    assert bench.extract("no answer line") is None
    assert bench.score("C", "C") and not bench.score(None, "C")


def test_ceval_format_and_extract():
    bench = get_benchmarker("ceval")
    rec = {"question": "问题？", "choices": ["一", "二", "三", "四"],
           "answer": "B"}
    prompt = bench.format(rec)
    assert "A. 一" in prompt and "请从A、B、C、D中选择一个答案" in prompt
    assert bench.extract("答案是（B）") == "B"
    assert bench.label(rec) == "B"


def test_humaneval_execution_scoring():
    bench = get_benchmarker("humaneval")
    label = {
        "prompt": "def add(a, b):\n",
        "test": "def check(candidate):\n    assert candidate(2, 3) == 5\n",
        "entry_point": "add",
    }
    # body-only completion is stitched onto the prompt
    assert bench.score("    return a + b", label)
    # complete function with the right name is used as-is
    assert bench.score("def add(a, b):\n    return a + b", label)
    # wrong code fails
    assert not bench.score("    return a - b", label)
    # markdown extraction
    assert extract_code("```python\ndef f():\n    return 1\n```") == (
        "def f():\n    return 1"
    )


def test_mbpp_extract_and_score():
    bench = get_benchmarker("mbpp")
    rec = {"text": "Write a function to double a number.",
           "test_list": ["assert dbl(2) == 4", "assert dbl(0) == 0"],
           "test_setup_code": ""}
    prompt = bench.format(rec)
    assert "assert dbl(2) == 4" in prompt and prompt.endswith("[BEGIN]\n")
    pred = bench.extract("def dbl(x):\n    return 2 * x\n[DONE] extra")
    assert bench.score(pred, bench.label(rec))
    assert not bench.score("def dbl(x):\n    return x", bench.label(rec))


def test_run_python_tests_is_fail_closed():
    assert not run_python_tests("syntax error(", "assert True")
    assert not run_python_tests("x = 1", "assert x == 2")
    assert run_python_tests("x = 1", "assert x == 1")


def test_simpleqa_normalized_containment():
    bench = get_benchmarker("simpleqa")
    assert bench.score("It was Marie Curie.", "marie curie")
    assert not bench.score("Einstein", "marie curie")
    assert bench.extract("Paris\nMore rambling") == "Paris"


def test_mtbench_has_no_accuracy():
    bench = get_benchmarker("mt-bench")
    recs = [{"turns": ["Tell me a joke", "another"]}]
    assert bench.format(recs[0]) == "Tell me a joke"
    assert bench.accuracy(["haha"], recs) is None


def test_accuracy_aggregation_counts_only_labeled():
    bench = get_benchmarker("mmlu")
    recs = [
        {"question": "q1", "choices": list("wxyz"), "answer": 0},
        {"question": "q2", "choices": list("wxyz"), "answer": 1},
    ]
    acc = bench.accuracy(["Answer: A", "Answer: C"], recs)
    assert acc == 0.5


class _FakeResult:
    def __init__(self, ids, accepts):
        self.output_ids = np.asarray(ids)
        self.accept_lengths = accepts


class _FakeDecoder:
    """Emits a fixed token tail; run_text_benchmark only needs the shape of
    the generate contract."""

    def __init__(self, tail):
        self.tail = tail

    def generate_fused(self, prompt_ids, max_new_tokens, stop_token_ids=None,
                       **kw):
        return _FakeResult(list(prompt_ids) + list(self.tail), [2, 3])


class _FakeTokenizer:
    eos_token_id = 0

    def encode(self, text):
        return [1, 2, 3]

    def decode(self, ids, skip_special_tokens=True):
        # token 7 spells the correct answer line
        return "Answer: B" if ids and ids[0] == 7 else "Answer: A"


def test_run_text_benchmark_end_to_end_accuracy():
    bench = get_benchmarker("mmlu")
    records = [
        {"question": "q", "choices": list("wxyz"), "answer": 1},
        {"question": "q2", "choices": list("wxyz"), "answer": 0},
    ]
    cell = run_text_benchmark(
        bench, records, _FakeDecoder([7, 9]), _FakeTokenizer(),
    )
    assert cell["accuracy"] == 0.5          # B right for #1, wrong for #2
    assert cell["mean_accept_length"] == 2.5
    assert cell["output_tokens"] == 4
    assert cell["records"] == 2


def test_financeqa_context_format_and_score():
    bench = get_benchmarker("financeqa")
    rec = {"context": "Revenue was $5M.", "question": "What was revenue?",
           "answer": "$5M"}
    prompt = bench.format(rec)
    assert "Context:" in prompt and "Revenue was $5M." in prompt
    assert bench.format({"context": None, "question": "Q?"}) == "Q?"
    assert bench.score("Revenue was 5m", "$5M".replace("$", "5m") and "5m")
    # unlabeled dumps -> no accuracy
    assert bench.accuracy(["x"], [{"context": None, "question": "q"}]) is None


def test_livecodebench_is_throughput_only():
    bench = get_benchmarker("livecodebench")
    assert bench.format({"question_content": " code this "}) == "code this"
    assert bench.accuracy(["out"], [{"question_content": "q"}]) is None


def test_mmstar_letter_extraction():
    bench = get_benchmarker("mmstar")
    assert bench.extract("The answer is (C)") == "C"
    assert bench.extract("b") == "B"
    assert bench.extract("答案：D") == "D"
    assert bench.extract("nothing here 42") is None
    rec = {"question": "Which? A. x B. y C. z D. w", "answer": "c"}
    assert bench.label(rec) == "C"
    assert bench.accuracy(["(C) because"], [rec]) == 1.0


def test_registry_has_thirteen_datasets():
    expected = {"gsm8k", "aime", "math500", "mmlu", "gpqa", "ceval",
                "humaneval", "mbpp", "simpleqa", "mt-bench", "financeqa",
                "livecodebench", "mmstar"}
    assert expected <= set(DATASET_BENCHMARKERS)
