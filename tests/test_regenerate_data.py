"""Dataset regeneration + reasoning expansion scripts against a stub
OpenAI-compatible server (reference: scripts/regenerate_train_data.py,
expand_reasoning_conversations.py, conversation_validation.py)."""

import json
import os
import subprocess
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from specforge_tpu.data.conversation_validation import (
    has_think_marker,
    validate_conversation,
)

REPO = os.path.join(os.path.dirname(__file__), "..")
REGEN = os.path.join(REPO, "scripts", "regenerate_train_data.py")
EXPAND = os.path.join(REPO, "scripts", "expand_reasoning_conversations.py")


class _StubHandler(BaseHTTPRequestHandler):
    reasoning = False

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        last_user = [m for m in body["messages"] if m["role"] == "user"][-1]
        msg = {"role": "assistant",
               "content": f"echo:{last_user['content']}"}
        if self.reasoning:
            msg["reasoning_content"] = f"thinking about {last_user['content']}"
        resp = {"choices": [{"message": msg}]}
        payload = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture
def stub_server():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _write_rows(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(script, *args):
    return subprocess.run(
        [sys.executable, script, *args],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )


def test_validate_conversation_rules():
    ok = [{"role": "user", "content": "q"},
          {"role": "assistant", "content": "a"}]
    assert validate_conversation(ok) is None
    assert validate_conversation([]) is not None
    assert "role" in validate_conversation(
        [{"role": "assistant", "content": "a"}]
    )
    assert validate_conversation(
        [{"role": "user", "content": ""}]
    ) is not None
    think = [{"role": "user", "content": "q"},
             {"role": "assistant", "content": "<think>x</think>a"}]
    assert validate_conversation(think) is None          # inputs tolerate
    assert validate_conversation(think, check_think=True) is not None
    assert has_think_marker("<THINK>loud</THINK>")


def test_regenerate_end_to_end(stub_server, tmp_path):
    rows = [
        {"id": f"s{i}", "conversations": [
            {"role": "user", "content": f"q{i}"},
            {"role": "assistant", "content": "old answer"},
            {"role": "user", "content": f"q{i}b"},
            {"role": "assistant", "content": "old answer 2"},
        ]}
        for i in range(4)
    ] + [{"id": "bad", "conversations": []}]
    inp = tmp_path / "in.jsonl"
    out = tmp_path / "out.jsonl"
    _write_rows(inp, rows)
    r = _run(REGEN, "--model", "m", "--server-address", stub_server,
             "--input-file-path", str(inp), "--output-file-path", str(out),
             "--concurrency", "2")
    assert r.returncode == 0, r.stderr
    got = [json.loads(l) for l in open(out)]
    assert len(got) == 4
    for i, row in enumerate(got):  # input order preserved
        assert row["id"] == f"s{i}"
        assert row["status"] == "success"
        conv = row["conversations"]
        # both assistant turns replaced, each conditioned on history
        assert conv[1]["content"] == f"echo:q{i}"
        assert conv[3]["content"] == f"echo:q{i}b"
    skipped = [json.loads(l) for l in open(str(out)[:-6] + "_skipped.jsonl")]
    assert len(skipped) == 1 and skipped[0]["id"] == "bad"


def test_regenerate_resume_skips_processed(stub_server, tmp_path):
    rows = [{"id": f"s{i}", "conversations": [
        {"role": "user", "content": f"q{i}"},
        {"role": "assistant", "content": "old"},
    ]} for i in range(4)]
    inp = tmp_path / "in.jsonl"
    out = tmp_path / "out.jsonl"
    _write_rows(inp, rows[:4])
    r = _run(REGEN, "--model", "m", "--server-address", stub_server,
             "--input-file-path", str(inp), "--output-file-path", str(out),
             "--num-samples", "2")
    assert r.returncode == 0, r.stderr
    assert len(open(out).readlines()) == 2
    r = _run(REGEN, "--model", "m", "--server-address", stub_server,
             "--input-file-path", str(inp), "--output-file-path", str(out),
             "--resume")
    assert r.returncode == 0, r.stderr
    got = [json.loads(l) for l in open(out)]
    assert [g["id"] for g in got] == ["s0", "s1", "s2", "s3"]


def test_regenerate_reasoning_save(stub_server, tmp_path, monkeypatch):
    _StubHandler.reasoning = True
    try:
        rows = [{"id": "r0", "conversations": [
            {"role": "user", "content": "q"},
            {"role": "assistant", "content": "old"},
        ]}]
        inp = tmp_path / "in.jsonl"
        out = tmp_path / "out.jsonl"
        _write_rows(inp, rows)
        r = _run(REGEN, "--model", "m", "--server-address", stub_server,
                 "--input-file-path", str(inp),
                 "--output-file-path", str(out), "--reasoning", "save")
        assert r.returncode == 0, r.stderr
        row = json.loads(open(out).readline())
        turn = row["conversations"][1]
        assert turn["content"] == "echo:q"
        assert turn["reasoning_content"] == "thinking about q"
    finally:
        _StubHandler.reasoning = False


def test_expand_reasoning_events(tmp_path):
    rows = [{
        "id": "conv0", "status": "success",
        "conversations": [
            {"role": "system", "content": "sys"},
            {"role": "user", "content": "q0"},
            {"role": "assistant", "content": "a0",
             "reasoning_content": "think0"},
            {"role": "user", "content": "q1"},
            {"role": "assistant", "content": "a1",
             "reasoning_content": "think1"},
        ],
    }, {"id": "bad", "status": "error", "conversations": []}]
    inp = tmp_path / "in.jsonl"
    out = tmp_path / "out.jsonl"
    _write_rows(inp, rows)
    r = _run(EXPAND, "--input-file-path", str(inp),
             "--output-file-path", str(out))
    assert r.returncode == 0, r.stderr
    events = [json.loads(l) for l in open(out)]
    assert [e["id"] for e in events] == ["conv0#turn0", "conv0#turn1"]
    # event 1's history shows turn 0 WITHOUT its reasoning, and supervises
    # the full turn 1 including reasoning
    e1 = events[1]["conversations"]
    assert e1[2] == {"role": "assistant", "content": "a0"}
    assert e1[4]["reasoning_content"] == "think1"
    skipped = [json.loads(l) for l in open(str(out)[:-6] + "_skipped.jsonl")]
    assert len(skipped) == 1
    # refuses overwrite on rerun
    r = _run(EXPAND, "--input-file-path", str(inp),
             "--output-file-path", str(out))
    assert r.returncode != 0


def test_validate_regenerated_data_script(tmp_path):
    """Standalone dataset gate (reference validate_regenerated_data.py):
    valid rows pass with a JSON summary; think markers, reasoning
    mismatches, duplicate ids, and bad status fail with named reasons."""
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts",
        "validate_regenerated_data.py",
    )

    def run(rows, *flags):
        path = tmp_path / "d.jsonl"
        with open(path, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        return subprocess.run(
            [sys.executable, script, "--data-path", str(path), *flags],
            capture_output=True, text=True,
        )

    good = {"id": "r1", "status": "success", "conversations": [
        {"role": "user", "content": "q"},
        {"role": "assistant", "content": "a", "reasoning_content": "why"},
    ]}
    res = run([good], "--expect-reasoning", "--strict-think-markers")
    assert res.returncode == 0, res.stderr
    assert json.loads(res.stdout)["rows"] == 1

    res = run([good], "--expect-non-reasoning")
    assert res.returncode != 0 and "reasoning_content" in res.stderr

    bad_think = dict(good, conversations=[
        {"role": "user", "content": "q"},
        {"role": "assistant", "content": "<think>x</think>a"},
    ])
    res = run([bad_think], "--strict-think-markers")
    assert res.returncode != 0 and "think marker" in res.stderr

    res = run([good, dict(good)])  # duplicate id
    assert res.returncode != 0 and "duplicate id" in res.stderr

    res = run([dict(good, status="error")])
    assert res.returncode != 0 and "status" in res.stderr
