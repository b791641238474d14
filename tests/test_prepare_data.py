"""Named-dataset row processors in scripts/prepare_data.py (reference
scripts/prepare_data.py:18-614): synthetic rows matching each public schema
→ canonical conversation records."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "prepare_data", os.path.join(REPO, "scripts", "prepare_data.py")
)
pd = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pd)


def test_processor_breadth():
    assert {
        "ultrachat", "sharegpt", "eaglechat", "perfectblend", "opc",
        "gsm8k", "hendrycks_math", "math_qa", "codealpaca-20k",
        "opencodeinstruct", "magicoder-evol-instruct", "sciq", "camel",
        "magpie-qwen2.5-pro-1m-v0.1",
        "nebius-llama31-8b-infinity-instruct",
    } <= set(pd.PROCESSORS)


def test_row_processors():
    cases = [
        ("ultrachat", {"prompt_id": "p1", "messages": [
            {"role": "user", "content": "q"},
            {"role": "assistant", "content": "a"},
        ]}),
        ("sharegpt", {"id": "s1", "conversations": [
            {"from": "human", "value": "q"},
            {"from": "gpt", "value": "a"},
        ]}),
        ("nebius-llama31-8b-infinity-instruct", {
            "id": "n1",
            "conversation": [{"content": "q"}],
            "generated_message": {"content": "a"},
        }),
        ("opc", {"instruction": "q", "output": "a"}),
        ("gsm8k", {"question": "q", "answer": "a"}),
        ("hendrycks_math", {"problem": "q", "solution": "a"}),
        ("math_qa", {"Problem": "q", "options": "a) 1 b) 2",
                     "Rationale": "a"}),
        ("codealpaca-20k", {"instruction": "q", "input": "ctx",
                            "output": "a"}),
        ("opencodeinstruct", {"input": "q", "output": "a"}),
        ("magicoder-evol-instruct", {"instruction": "q", "response": "a"}),
        ("camel", {"message_1": "q", "message_2": "a"}),
    ]
    for name, row in cases:
        record = pd.PROCESSORS[name](row)
        assert record["id"], name
        roles = [m["role"] for m in record["messages"]]
        assert roles[-1] == "assistant", name
        assert record["messages"][-1]["content"], name


def test_sciq_deterministic_shuffle():
    row = {
        "question": "Which gas?", "correct_answer": "oxygen",
        "distractor1": "helium", "distractor2": "argon",
        "distractor3": "neon", "support": "Plants produce it.",
    }
    r1 = pd.PROCESSORS["sciq"](row)
    r2 = pd.PROCESSORS["sciq"](row)
    assert r1 == r2
    body = r1["messages"][-1]["content"]
    assert "oxygen" in body and "answer:" in body


def test_convert_file_roundtrip(tmp_path):
    rows = [
        {"question": "q1", "answer": "a1"},
        {"question": "q2"},  # missing answer: skipped
    ]
    src = tmp_path / "in.jsonl"
    with open(src, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    out = tmp_path / "out.jsonl"
    n = pd.convert(pd._iter_file(str(src)), pd.PROCESSORS["gsm8k"], str(out))
    assert n == 1
    record = json.loads(out.read_text().splitlines()[0])
    assert record["messages"][0]["content"] == "q1"
