"""HTTP inbox relay: remote polling parity with the filesystem inbox."""

import numpy as np
import pytest

from specforge_tpu.runtime.data_plane.http_inbox import (
    InboxHTTPServer,
    RemoteInboxChannel,
)
from specforge_tpu.runtime.data_plane.ref_distributor import InboxChannel
from tests.test_runtime_planes import _ref


@pytest.fixture
def relay(tmp_path):
    server = InboxHTTPServer(str(tmp_path / "inboxes"), host="127.0.0.1")
    server.start()
    yield server, str(tmp_path / "inboxes")
    server.stop()


def test_remote_matches_local_inbox(relay):
    server, inbox_dir = relay
    local_writer = InboxChannel(inbox_dir, 0)
    local_writer.append(
        [{"kind": "ref", **_ref(i).to_json()} for i in range(3)]
    )

    remote = RemoteInboxChannel(f"http://127.0.0.1:{server.port}", 0)
    refs, closed, failure = remote.poll()
    assert [r.sample_id for r in refs] == ["s0", "s1", "s2"]
    assert not closed and failure is None

    # incremental: second poll sees only new records
    local_writer.append([{"kind": "ref", **_ref(3).to_json()},
                         {"kind": "closed"}])
    refs2, closed2, _ = remote.poll()
    assert [r.sample_id for r in refs2] == ["s3"]
    assert closed2

    remote.report_consumed()
    assert server.total_consumed() == 4


def test_remote_inbox_failure_sentinel(relay):
    server, inbox_dir = relay
    writer = InboxChannel(inbox_dir, 1)
    writer.append([{"kind": "failed", "error": "producer died"}])
    remote = RemoteInboxChannel(f"http://127.0.0.1:{server.port}", 1)
    _refs, _closed, failure = remote.poll()
    assert failure == "producer died"


def test_missing_inbox_is_empty(relay):
    server, _ = relay
    remote = RemoteInboxChannel(f"http://127.0.0.1:{server.port}", 7)
    refs, closed, failure = remote.poll()
    assert refs == [] and not closed and failure is None
