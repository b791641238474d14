"""Named-dataset benchmarkers: prompt formatting, answer extraction, accuracy.

The TPU-native counterpart of the reference's per-dataset benchmarker suite
(/root/reference/benchmarks/benchmarker/: base.py:16-50 contract, registry.py,
gsm8k.py / aime.py / mmlu.py / ...): each benchmarker knows how to FORMAT a
dataset record into a prompt, EXTRACT the model's answer from generated text,
and SCORE it against the label — so an accept-length grid cell reports task
accuracy alongside accept length and throughput.

Zero-egress design: the reference downloads each dataset from HF/URLs; here
every benchmarker reads a LOCAL JSONL dump with the dataset's native fields
(produce dumps with any HF mirror you have, or scripts/prepare_data.py for
conversation sets). Formatting / extraction / scoring logic is the
reference-compatible part; loading is a one-line JSONL read.

Records-per-dataset (JSONL field contract, matching the upstream datasets):
    gsm8k      {"question", "answer"}            (answer text ends "#### N")
    aime       {"problem" | "Problem", "answer" | "Answer"}
    math500    {"problem", "answer" | "solution"}
    mmlu       {"question", "choices": [4], "answer": 0-3}
    gpqa       like mmlu (pre-shuffled choices + int answer)
    ceval      {"question", "choices": [4] | "A".."D", "answer": "A"-"D"}
    humaneval  {"prompt", "test", "entry_point"}
    mbpp       {"prompt" | "text", "test_list": [...], "test_setup_code"?}
    simpleqa   {"problem" | "question", "answer"}
    mt-bench   {"turns": [q1, q2], ...}           (no labels — no accuracy)
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

INVALID = object()

#: the reference's multiple-choice template (gpqa.py GPQA_QUERY_TEMPLATE,
#: reused by mmlu.py generate_question)
_MC_TEMPLATE = (
    "Answer the following multiple choice question. The last line of your "
    "response should be of the following format: 'Answer: $LETTER' (without "
    "quotes) where LETTER is one of ABCD. Think step by step before "
    "answering.\n\n{question}\n\nA) {A}\nB) {B}\nC) {C}\nD) {D}"
)


def _last_int(text: str) -> Optional[int]:
    """gsm8k-style numeric extraction: last integer, commas stripped
    (reference gsm8k.py get_answer_value)."""
    text = text.replace(",", "")
    numbers = re.findall(r"-?\d+", text)
    if not numbers:
        return None
    try:
        return int(numbers[-1])
    except ValueError:
        return None


def _boxed_or_number(text: str, *, integer_range=None) -> Optional[str]:
    """aime/math500-style extraction: \\boxed{}, then answer phrases, then
    the last number (reference aime.py extract_aime_answer /
    math500.py extract_math_answer)."""
    m = re.search(r"\\boxed\{([^}]+)\}", text)
    if m:
        return m.group(1).strip()
    m = re.search(r"\\boxed\s+(\S+)", text)
    if m:
        return m.group(1).strip()
    for pattern in (
        r"(?:final\s+answer|answer)[\s:]+([-+]?\d*\.?\d+)",
        r"(?:is|equals?|=\s*)([-+]?\d*\.?\d+)\s*$",
    ):
        matches = re.findall(pattern, text, re.IGNORECASE)
        if matches:
            return matches[-1].strip()
    numbers = re.findall(r"[-+]?\d*\.?\d+", text)
    if integer_range is not None:
        lo, hi = integer_range
        numbers = [
            n for n in numbers
            if re.fullmatch(r"\d+", n) and lo <= int(n) <= hi
        ]
    if numbers:
        return numbers[-1]
    return None


def _numeric_equal(pred, label) -> bool:
    if pred is None or label is None:
        return False
    ps, ls = str(pred).strip(), str(label).strip()
    if ps == ls:
        return True
    try:
        return float(ps) == float(ls)
    except ValueError:
        return False


def extract_code(output: str) -> Optional[str]:
    """Markdown block, else first def-to-end region, else raw (reference
    humaneval.py extract_code_from_output)."""
    m = re.search(r"```(?:python)?\n(.*?)```", output, re.DOTALL)
    if m:
        return m.group(1).strip()
    m = re.search(r"(def\s+\w+\([^)]*\):.*?)(?=\n\ndef\s+|\Z)", output,
                  re.DOTALL)
    if m:
        return m.group(1).strip()
    return output.strip() or None


def run_python_tests(code: str, test_code: str,
                     entry_point: Optional[str] = None) -> bool:
    """Execute generated code + test assertions in a scratch namespace;
    pass = no exception (reference humaneval.py check_code_passes_tests).
    Same trust model as the reference: benchmark dumps are local files the
    operator chose to run."""
    try:
        namespace: Dict[str, Any] = {}
        exec(code, namespace)           # noqa: S102 (benchmark sandbox)
        exec(test_code, namespace)      # noqa: S102
        checker = namespace.get("check")
        if checker is not None and entry_point:
            checker(namespace[entry_point])
        return True
    except BaseException:
        return False


@dataclass
class DatasetBenchmarker:
    """One dataset's formatting + extraction + scoring contract.

    ``format``: record -> prompt text (few-shot prefix included).
    ``label``: record -> ground-truth label (None = unlabeled).
    ``extract``: generated text -> prediction.
    ``score``: (prediction, label) -> bool.
    """

    name: str
    format: Callable[[Dict[str, Any]], str]
    label: Callable[[Dict[str, Any]], Any]
    extract: Callable[[str], Any]
    score: Callable[[Any, Any], bool] = _numeric_equal
    max_new_tokens: int = 512
    stop_strings: Sequence[str] = ()
    #: called once with all records before formatting (few-shot setup)
    prepare: Optional[Callable[["DatasetBenchmarker", List[Dict]], None]] = (
        None
    )
    state: Dict[str, Any] = field(default_factory=dict)

    def load(self, path: str, max_records: Optional[int] = None):
        records = []
        with open(path) as f:
            for line in f:
                if line.strip():
                    records.append(json.loads(line))
        if self.prepare is not None:
            self.prepare(self, records)
        if max_records is not None:
            records = records[:max_records]
        return records

    def accuracy(self, outputs: Sequence[str],
                 records: Sequence[Dict[str, Any]]) -> Optional[float]:
        labels = [self.label(r) for r in records]
        if not labels or all(l is None for l in labels):
            return None
        correct = valid = 0
        for out, label in zip(outputs, labels):
            if label is None:
                continue
            valid += 1
            text = out
            for s in self.stop_strings:
                text = text.split(s)[0]
            if self.score(self.extract(text), label):
                correct += 1
        return correct / valid if valid else None


DATASET_BENCHMARKERS: Dict[str, DatasetBenchmarker] = {}


def register(bench: DatasetBenchmarker) -> DatasetBenchmarker:
    DATASET_BENCHMARKERS[bench.name] = bench
    return bench


def get_benchmarker(name: str) -> Optional[DatasetBenchmarker]:
    return DATASET_BENCHMARKERS.get(name.lower().replace("_", "-"))


# --------------------------------------------------------------------------
# gsm8k: 5-shot Question/Answer, last-integer extraction (gsm8k.py:18-44)
# --------------------------------------------------------------------------

def _gsm8k_prepare(bench: DatasetBenchmarker, records: List[Dict]) -> None:
    shots = "".join(
        f"Question: {r['question']}\nAnswer: {r['answer']}\n\n"
        for r in records[:5]
    )
    bench.state["few_shot"] = shots


def _gsm8k_format(bench: DatasetBenchmarker):
    def fmt(record):
        return (
            bench.state.get("few_shot", "")
            + "Question: " + record["question"] + "\nAnswer:"
        )
    return fmt


def _gsm8k_label(record):
    return _last_int(str(record["answer"]))


gsm8k = DatasetBenchmarker(
    name="gsm8k",
    format=None,  # bound below (needs self for few-shot state)
    label=_gsm8k_label,
    extract=_last_int,
    score=_numeric_equal,
    max_new_tokens=512,
    stop_strings=("Question:",),
    prepare=_gsm8k_prepare,
)
gsm8k.format = _gsm8k_format(gsm8k)
register(gsm8k)


# --------------------------------------------------------------------------
# aime / math500: reasoning + boxed extraction (aime.py:20-57, math500.py)
# --------------------------------------------------------------------------

register(DatasetBenchmarker(
    name="aime",
    format=lambda r: (
        "Solve the following AIME problem. Put your final answer in "
        "\\boxed{}.\n\n" + (r.get("problem") or r.get("Problem"))
    ),
    label=lambda r: str(r.get("answer", r.get("Answer", ""))).strip() or None,
    extract=lambda out: _boxed_or_number(out, integer_range=(0, 999)),
    max_new_tokens=2048,
))

register(DatasetBenchmarker(
    name="math500",
    format=lambda r: (
        "Solve the following problem. Put your final answer in "
        "\\boxed{}.\n\n" + r["problem"]
    ),
    label=lambda r: (
        str(r["answer"]).strip() if r.get("answer") is not None
        else _boxed_or_number(r.get("solution", ""))
    ),
    extract=_boxed_or_number,
    max_new_tokens=2048,
))


# --------------------------------------------------------------------------
# mmlu / gpqa: 4-way MC, 'Answer: X' extraction (mmlu.py:20-70, gpqa.py)
# --------------------------------------------------------------------------

def _mc_format(record) -> str:
    c = record["choices"]
    return _MC_TEMPLATE.format(
        question=record["question"].strip(),
        A=str(c[0]).strip(), B=str(c[1]).strip(),
        C=str(c[2]).strip(), D=str(c[3]).strip(),
    )


def _mc_label(record):
    ans = record["answer"]
    if isinstance(ans, int):
        return "ABCD"[ans]
    return str(ans).strip().upper() or None


def _mc_extract(out: str) -> Optional[str]:
    m = re.findall(r"Answer:\s*\(?([A-D])\)?", out)
    if m:
        return m[-1]
    return None


def _mc_score(pred, label) -> bool:
    return pred is not None and pred == label


for _name in ("mmlu", "gpqa"):
    register(DatasetBenchmarker(
        name=_name, format=_mc_format, label=_mc_label,
        extract=_mc_extract, score=_mc_score, max_new_tokens=1024,
    ))


# --------------------------------------------------------------------------
# ceval: Chinese 4-way MC (ceval.py:15-60)
# --------------------------------------------------------------------------

def _ceval_format(record) -> str:
    if "choices" in record:
        choices = record["choices"]
    else:
        choices = [record.get(k, "") for k in "ABCD"]
    prompt = record["question"] + "\n\n选项：\n"
    for i, option in enumerate(choices):
        prompt += f"{chr(65 + i)}. {option}\n"
    prompt += "\n请从A、B、C、D中选择一个答案。"
    return prompt


def _ceval_extract(out: str) -> Optional[str]:
    m = re.findall(r"[（(]?([A-D])[）)、.:：]?", out)
    return m[0] if m else None


register(DatasetBenchmarker(
    name="ceval", format=_ceval_format, label=_mc_label,
    extract=_ceval_extract, score=_mc_score, max_new_tokens=256,
))


# --------------------------------------------------------------------------
# humaneval / mbpp: code + local test execution (humaneval.py, mbpp.py)
# --------------------------------------------------------------------------

def _humaneval_label(record):
    return {
        "prompt": record.get("prompt", ""),
        "test": record.get("test", ""),
        "entry_point": record.get("entry_point", ""),
    }


def _humaneval_score(pred, label) -> bool:
    if pred is None or not isinstance(label, dict):
        return False
    # strip blank lines but PRESERVE column indentation — a body-only
    # completion stitched under the prompt's signature must keep its indent
    # (the reference's .strip() loses it, humaneval.py:143)
    pred = str(pred).strip("\n").rstrip()
    entry = label.get("entry_point", "")
    if pred.lstrip().startswith("def ") and not pred.startswith((" ", "\t")):
        m = re.match(r"def\s+(\w+)\s*\(", pred)
        full = (
            pred if (m and m.group(1) == entry)
            else label.get("prompt", "") + "\n" + pred
        )
    else:
        full = label.get("prompt", "") + "\n" + pred
    return run_python_tests(full, label.get("test", ""), entry)


register(DatasetBenchmarker(
    name="humaneval",
    format=lambda r: (
        "Complete the following Python function. Return only code.\n\n"
        + r["prompt"]
    ),
    label=_humaneval_label,
    extract=extract_code,
    score=_humaneval_score,
    max_new_tokens=1024,
))


def _mbpp_format(record) -> str:
    text = record.get("prompt") or record.get("text") or ""
    tests = "\n".join(record.get("test_list", [])[:1])
    return (
        f"You are an expert Python programmer, and here is your task: "
        f"{text} Your code should pass these tests:\n\n{tests}\n[BEGIN]\n"
    )


def _mbpp_label(record):
    return {
        "test_setup": record.get("test_setup_code", "") or "",
        "test_list": record.get("test_list", []) or [],
    }


def _mbpp_extract(out: str):
    cleaned = out.strip().split("[DONE]")[0].strip()
    if cleaned.startswith("[BEGIN]"):
        cleaned = cleaned[len("[BEGIN]"):].strip()
    return extract_code(cleaned)


def _mbpp_score(pred, label) -> bool:
    if pred is None or not isinstance(label, dict):
        return False
    tests = label["test_setup"] + "\n" + "\n".join(label["test_list"])
    return run_python_tests(str(pred), tests)


register(DatasetBenchmarker(
    name="mbpp", format=_mbpp_format, label=_mbpp_label,
    extract=_mbpp_extract, score=_mbpp_score, max_new_tokens=1024,
    stop_strings=("[DONE]",),
))


# --------------------------------------------------------------------------
# simpleqa: short-form factual QA, normalized containment match
# --------------------------------------------------------------------------

def _normalize(text: str) -> str:
    return re.sub(r"[^a-z0-9 ]", "", text.lower()).strip()


def _simpleqa_score(pred, label) -> bool:
    if pred is None or label is None:
        return False
    p, l = _normalize(str(pred)), _normalize(str(label))
    return bool(l) and (l in p or p == l)


register(DatasetBenchmarker(
    name="simpleqa",
    format=lambda r: (
        "Answer the following question with a short answer.\n\nQuestion: "
        + (r.get("problem") or r.get("question", "")) + "\nAnswer:"
    ),
    label=lambda r: str(r.get("answer", "")).strip() or None,
    extract=lambda out: out.strip().split("\n")[0].strip() or None,
    score=_simpleqa_score,
    max_new_tokens=128,
    stop_strings=("Question:",),
))


# --------------------------------------------------------------------------
# mt-bench: first-turn chat, throughput/accept-length only (mtbench.py:40)
# --------------------------------------------------------------------------

register(DatasetBenchmarker(
    name="mt-bench",
    format=lambda r: str((r.get("turns") or [r.get("question", "")])[0]),
    label=lambda r: None,
    extract=lambda out: out,
    score=lambda p, l: False,
    max_new_tokens=1024,
))


# --------------------------------------------------------------------------
# financeqa: context-grounded QA, unlabeled upstream → throughput-only
# unless the dump carries an "answer" field (financeqa.py:38-52)
# --------------------------------------------------------------------------

register(DatasetBenchmarker(
    name="financeqa",
    format=lambda r: (
        "Given the following context, can you answer the following "
        f"question?\n\nContext:\n{r['context'].strip()}\n\nQuestion:\n"
        f"{r['question'].strip()}"
        if r.get("context")
        else r["question"].strip()
    ),
    label=lambda r: str(r["answer"]).strip()
    if r.get("answer") else None,
    extract=lambda out: out.strip() or None,
    score=_simpleqa_score,
    max_new_tokens=512,
))


# --------------------------------------------------------------------------
# livecodebench: code generation, unlabeled in the reference harness too
# (livecodebench.py:38 labels.append(None)) → throughput/accept-length
# --------------------------------------------------------------------------

register(DatasetBenchmarker(
    name="livecodebench",
    format=lambda r: str(
        r.get("question_content") or r.get("question", "")
    ).strip(),
    label=lambda r: None,
    extract=extract_code,
    score=lambda p, l: False,
    max_new_tokens=2048,
))


# --------------------------------------------------------------------------
# mmstar: multiple-choice over the text tower (options embedded in the
# question text; option-count-aware letter extraction, mmstar.py:17-60)
# --------------------------------------------------------------------------

def _mmstar_extract(out: str) -> Optional[str]:
    upper = out.strip().upper()
    m = re.search(r"\b([A-D])\b", upper)
    if m:
        return m.group(1)
    for pattern in (r"\(([A-D])\)", r"\[([A-D])\]", r"答案[：:]\s*([A-D])",
                    r"ANSWER[：:]\s*([A-D])", r"选择[：:]\s*([A-D])"):
        m = re.search(pattern, upper)
        if m:
            return m.group(1)
    return None


register(DatasetBenchmarker(
    name="mmstar",
    format=lambda r: (
        r["question"].strip()
        + "\n\nAnswer with the option letter (A, B, C or D)."
    ),
    label=lambda r: str(r.get("answer", "")).strip().upper() or None,
    extract=_mmstar_extract,
    score=_mc_score,
    max_new_tokens=256,
))


# --------------------------------------------------------------------------
# text-space serving run: format -> tokenize -> spec-decode -> extract/score
# --------------------------------------------------------------------------

def run_text_benchmark(
    bench: DatasetBenchmarker,
    records: Sequence[Dict[str, Any]],
    decoder,
    tokenizer,
    *,
    topk: int = 1,
    max_new_tokens: Optional[int] = None,
    fused: bool = True,
) -> Dict[str, Any]:
    """Drive the in-repo speculative decoder over a named dataset in text
    space and report accuracy + accept length + throughput — one reference
    benchmarker run (base.py:16-50 + utils.compute_metrics)."""
    import time

    max_new = max_new_tokens or bench.max_new_tokens
    generate = decoder.generate_fused if fused else decoder.generate
    kw = {"topk": topk} if topk != 1 else {}
    eos = getattr(tokenizer, "eos_token_id", None)
    stop_ids = [eos] if eos is not None else None

    outputs: List[str] = []
    accept: List[int] = []
    wall = 0.0
    tokens = 0
    warmed = False
    for record in records:
        prompt_ids = tokenizer.encode(bench.format(record))
        if not warmed:
            generate(prompt_ids, max_new_tokens=max_new,
                     stop_token_ids=stop_ids, **kw)
            warmed = True
        t0 = time.monotonic()
        result = generate(prompt_ids, max_new_tokens=max_new,
                          stop_token_ids=stop_ids, **kw)
        wall += time.monotonic() - t0
        new_ids = [int(t) for t in result.output_ids[len(prompt_ids):]]
        tokens += len(new_ids)
        accept.extend(result.accept_lengths)
        outputs.append(tokenizer.decode(new_ids, skip_special_tokens=True))

    import numpy as np

    return {
        "dataset": bench.name,
        "records": len(records),
        "accuracy": bench.accuracy(outputs, records),
        "mean_accept_length": (
            round(float(np.mean(accept)), 4) if accept else 0.0
        ),
        "output_tokens": tokens,
        "wall_seconds": round(wall, 4),
        "output_throughput": round(tokens / wall, 2) if wall > 0 else 0.0,
        "topk": topk,
    }
