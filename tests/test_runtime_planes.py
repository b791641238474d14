"""Control plane + streaming data plane: stores, controller, flow control,
channel, distributor, rollout worker — and the colocated-vs-disaggregated
training equivalence gate (the reference's headline parity test)."""

import os
import queue

import numpy as np
import pytest

from specforge_tpu.inference.capture import (
    CaptureConfig,
    CaptureVerificationError,
)
from specforge_tpu.inference.rollout_worker import RolloutWorker
from specforge_tpu.runtime.contracts import PromptTask, SampleRef
from specforge_tpu.runtime.control_plane.controller import DataFlowController
from specforge_tpu.runtime.control_plane.flow_control import (
    FlowControlConfig,
    ProducerFlowControl,
)
from specforge_tpu.runtime.control_plane.metadata_store import (
    InMemoryMetadataStore,
    SQLiteMetadataStore,
)
from specforge_tpu.runtime.data_plane.feature_store import (
    InMemoryFeatureStore,
    SharedDirFeatureStore,
)
from specforge_tpu.runtime.data_plane.ref_distributor import (
    InboxChannel,
    RefDistributor,
)
from specforge_tpu.runtime.data_plane.streaming_ref_channel import (
    StreamingRefChannel,
)


def _ref(i, store=None, tensors=None):
    if store is not None:
        return store.put_sample(f"s{i}", tensors or {
            "x": np.full(4, i, np.float32)
        })
    from specforge_tpu.runtime.contracts import FeatureHandle, FeatureSpec

    return SampleRef(
        sample_id=f"s{i}",
        features={"x": FeatureHandle(
            uri=f"mem://s{i}/x.g0",
            spec=FeatureSpec(name="x", shape=(4,), dtype="float32"),
        )},
    )


def test_sqlite_store_cross_connection(tmp_path):
    path = str(tmp_path / "ledger.sqlite")
    a = SQLiteMetadataStore(path)
    assert a.commit_sample(_ref(0))
    assert not a.commit_sample(_ref(0))  # dedup
    a.record_ack(["s0"], global_step=3)

    b = SQLiteMetadataStore(path)  # second "process"
    assert b.is_committed("s0")
    assert b.acked_ids() == {"s0"}
    assert b.durable_step() == 3
    assert not b.commit_sample(_ref(0))
    a.close(); b.close()


def test_controller_lifecycle_and_poisoning():
    controller = DataFlowController(max_attempts=2)
    controller.ingest_prompts(
        [PromptTask(prompt_id=f"p{i}", payload={"text": "x"}) for i in range(3)]
    )
    leased = controller.lease_prompt_tasks("w0", limit=2)
    assert [t.prompt_id for t in leased] == ["p0", "p1"]
    controller.complete_prompt("p0")
    controller.fail_prompt("p1")  # attempt 1 of 2: re-leasable
    leased2 = controller.lease_prompt_tasks("w1", limit=3)
    assert {t.prompt_id for t in leased2} == {"p1", "p2"}
    controller.fail_prompt("p1")  # attempt 2 of 2: poisoned
    assert controller.status()["prompts_poisoned"] == 1
    assert controller.lease_prompt_tasks("w2", limit=3) == []


def test_controller_ack_and_reconcile():
    released = []
    controller = DataFlowController(
        InMemoryMetadataStore(),
        release_fn=released.extend,
    )
    refs = [_ref(i) for i in range(4)]
    committed = controller.commit_samples(refs)
    assert len(committed) == 4
    assert controller.commit_samples(refs) == []  # dedup
    controller.ack_train_refs(["s0", "s1"], global_step=1)
    assert released == ["s0", "s1"]
    tail = controller.reconcile_on_restart()
    assert [r.sample_id for r in tail] == ["s2", "s3"]


def test_flow_control_hysteresis():
    fc = ProducerFlowControl(FlowControlConfig(
        high_watermark_refs=4, low_watermark_refs=2
    ))
    fc.on_published(3)
    assert not fc.paused
    fc.on_published(1)
    assert fc.paused
    fc.on_consumed(1)
    assert fc.paused  # still above low watermark
    fc.on_consumed(1)
    assert not fc.paused
    assert fc.health()["pause_events"] == 1


def test_channel_roundtrip_and_counters(tmp_path):
    producer = StreamingRefChannel(str(tmp_path / "ctrl"))
    consumer = StreamingRefChannel(str(tmp_path / "ctrl"))
    producer.publish_batch([_ref(0), _ref(1)])
    refs, closed, failure = consumer.poll()
    assert [r.sample_id for r in refs] == ["s0", "s1"]
    assert not closed and failure is None
    producer.publish_batch([_ref(2)])
    producer.close()
    refs2, closed2, _ = consumer.poll()
    assert [r.sample_id for r in refs2] == ["s2"]
    assert closed2
    consumer.mark_consumed(3)
    assert producer.consumed_count() == 3
    assert producer.in_flight_remote() == 0
    consumer.publish_consumer_quantum(8)
    assert producer.consumer_quantum() == 8


def test_channel_failure_sentinel(tmp_path):
    producer = StreamingRefChannel(str(tmp_path / "c2"))
    consumer = StreamingRefChannel(str(tmp_path / "c2"))
    producer.publish_batch([_ref(0)])
    producer.fail("boom")
    refs, _closed, failure = consumer.poll()
    assert len(refs) == 1 and failure == "boom"


def test_distributor_windows_and_drop_last(tmp_path):
    channel_p = StreamingRefChannel(str(tmp_path / "c3"))
    channel_c = StreamingRefChannel(str(tmp_path / "c3"))
    controller = DataFlowController()
    dist = RefDistributor(
        channel_c, controller, str(tmp_path / "inbox"),
        world_size=2, window_samples=4,
    )
    channel_p.publish_batch([_ref(i) for i in range(3)])
    assert dist.pump() == 0  # below a full window
    channel_p.publish_batch([_ref(i) for i in range(3, 7)])
    assert dist.pump() == 4
    channel_p.close()
    dist.pump()
    assert dist.closed

    inbox0 = InboxChannel(str(tmp_path / "inbox"), 0)
    inbox1 = InboxChannel(str(tmp_path / "inbox"), 1)
    r0, c0, _ = inbox0.poll()
    r1, c1, _ = inbox1.poll()
    assert [r.sample_id for r in r0] == ["s0", "s1"]
    assert [r.sample_id for r in r1] == ["s2", "s3"]
    assert c0 and c1  # closed fanned out; s4..s6 dropped (incomplete window)


def test_distributor_resume_requeues_unacked(tmp_path):
    store = SQLiteMetadataStore(str(tmp_path / "ledger.sqlite"))
    controller = DataFlowController(store)
    controller.commit_samples([_ref(i) for i in range(4)])
    controller.ack_train_refs(["s0", "s1"], 1)

    channel = StreamingRefChannel(str(tmp_path / "c4"))
    controller2 = DataFlowController(
        SQLiteMetadataStore(str(tmp_path / "ledger.sqlite"))
    )
    dist = RefDistributor(
        channel, controller2, str(tmp_path / "inbox2"),
        world_size=1, window_samples=2,
    )
    assert dist.staged_count == 2  # s2, s3 requeued
    assert dist.pump() == 2
    inbox = InboxChannel(str(tmp_path / "inbox2"), 0)
    refs, _, _ = inbox.poll()
    assert [r.sample_id for r in refs] == ["s2", "s3"]


def test_rollout_worker_produces_and_verifies():
    controller = DataFlowController(max_attempts=1)
    controller.ingest_prompts(
        [PromptTask(prompt_id=f"p{i}", payload={}) for i in range(3)]
    )
    store = InMemoryFeatureStore()
    published = []
    rng = np.random.default_rng(0)

    def source(task):
        if task.prompt_id == "p1":  # bad capture: wrong aux width
            return [("0", {
                "input_ids": np.arange(4),
                "loss_mask": np.ones(4, np.int64),
                "hidden_state": rng.normal(size=(4, 5)).astype(np.float32),
            }, {})]
        return [("0", {
            "input_ids": np.arange(4),
            "loss_mask": np.ones(4, np.int64),
            "hidden_state": rng.normal(size=(4, 6)).astype(np.float32),
            "target": rng.normal(size=(4, 2)).astype(np.float32),
        }, {"target_repr": "hidden_state"})]

    worker = RolloutWorker(
        "w0", controller=controller, store=store, feature_source=source,
        capture_config=CaptureConfig(hidden_size=2, num_capture_layers=3),
        publish_fn=published.extend,
    )
    total = worker.drain()
    assert total == 2
    assert worker.health.failed == 1
    assert controller.status()["prompts_poisoned"] == 1
    assert {r.prompt_id for r in published} == {"p0", "p2"}


def test_colocated_vs_disaggregated_equivalence(tmp_path):
    """Same samples, two topologies, identical training losses (~1e-6 —
    reference parity gate docs/benchmarks/eagle3-disaggregated-parity.md)."""
    import jax

    from specforge_tpu.data.collator import CollatorConfig, PaddingCollator
    from specforge_tpu.runtime.data_plane.feature_dataloader import (
        FeatureDataLoader,
    )
    from specforge_tpu.runtime.data_plane.feature_store import FileFeatureStore
    from specforge_tpu.runtime.data_plane.offline_reader import (
        OfflineManifestReader,
    )
    from specforge_tpu.training.optimizer import OptimizerConfig, build_optimizer
    from specforge_tpu.training.train_step import TrainState, make_train_step
    from tests._fixtures import (
        MAXLEN,
        build_model_and_strategy,
        write_offline_dataset,
    )

    data_dir = str(tmp_path / "data")
    write_offline_dataset(data_dir, n=4)
    collate = PaddingCollator(
        CollatorConfig(max_length=MAXLEN, cast_float_dtype="float32")
    )
    metadata = {"target_repr": "hidden_state"}

    def train_losses(loader):
        model, strategy, variables, frozen = build_model_and_strategy()
        tx = build_optimizer(OptimizerConfig(lr=1e-3), 10)
        state = TrainState.create(variables["params"], variables["buffers"], tx)
        step = make_train_step(strategy, tx, accum_steps=1, total_steps=10,
                               metadata=metadata)
        losses = []
        for batch in loader:
            batched = {k: v[None] for k, v in batch.tensors.items()}
            state, metrics = step(state, batched, frozen)
            losses.append(float(metrics["train/loss"]))
        return losses

    # --- path A: colocated offline (file refs) ---
    refs = OfflineManifestReader(data_dir).read()
    loader_a = FeatureDataLoader(
        FileFeatureStore(), collate, refs=refs, batch_size=2, num_workers=0,
        metadata=metadata,
    )
    losses_a = train_losses(loader_a)

    # --- path B: producer → shared-dir store → channel → distributor →
    #             inbox → streaming consumer ---
    from specforge_tpu.runtime.data_plane.feature_file import load_feature_file

    shared = SharedDirFeatureStore(str(tmp_path / "plane"))
    chan_p = StreamingRefChannel(str(tmp_path / "ctrl5"))
    controller_p = DataFlowController()
    controller_p.ingest_prompts(
        [PromptTask(prompt_id=os.path.basename(p), payload={"path": p})
         for p in OfflineManifestReader(data_dir).list_files()]
    )

    def source(task):
        tensors, meta = load_feature_file(task.payload["path"])
        return [("", tensors, meta or metadata)]

    worker = RolloutWorker(
        "prod", controller=controller_p, store=shared, feature_source=source,
        publish_fn=lambda refs: chan_p.publish_batch(refs),
    )
    worker.drain()
    chan_p.close()

    chan_c = StreamingRefChannel(str(tmp_path / "ctrl5"))
    controller_c = DataFlowController()
    dist = RefDistributor(
        chan_c, controller_c, str(tmp_path / "inbox5"),
        world_size=1, window_samples=2,
    )
    dist.pump()
    inbox = InboxChannel(str(tmp_path / "inbox5"), 0)
    inbox_refs, closed, _ = inbox.poll()
    assert closed and len(inbox_refs) == 4

    q = queue.Queue()
    for r in inbox_refs:
        q.put(r)
    q.put(None)
    loader_b = FeatureDataLoader(
        shared, collate, ref_queue=q, batch_size=2, num_workers=0,
        metadata=metadata,
    )
    losses_b = train_losses(loader_b)

    assert len(losses_a) == len(losses_b) == 2
    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-6)


def test_dp_ack_collective(tmp_path):
    """Two 'ranks' (threads) exchange acked ids; rank 0 records the union."""
    import threading

    from specforge_tpu.runtime.control_plane.dp_ack import DPAckController

    recorded = []

    def sink(ids, step):
        recorded.append((step, sorted(ids)))

    c0 = DPAckController(str(tmp_path / "ack"), rank=0, world_size=2,
                         ack_fn=sink, timeout_s=10)
    c1 = DPAckController(str(tmp_path / "ack"), rank=1, world_size=2,
                         timeout_s=10)

    results = {}

    def run(controller, rank, ids):
        results[rank] = controller.ack_train_refs(ids, step=1)

    t0 = threading.Thread(target=run, args=(c0, 0, ["a", "b"]))
    t1 = threading.Thread(target=run, args=(c1, 1, ["b", "c"]))
    t0.start(); t1.start(); t0.join(10); t1.join(10)

    assert sorted(results[0]) == ["a", "b", "c"]
    assert sorted(results[1]) == ["a", "b", "c"]
    assert recorded == [(1, ["a", "b", "c"])]


def test_dp_ack_timeout(tmp_path):
    from specforge_tpu.runtime.control_plane.dp_ack import DPAckController

    c0 = DPAckController(str(tmp_path / "ack2"), rank=0, world_size=2,
                         timeout_s=0.3)
    with pytest.raises(TimeoutError):
        c0.ack_train_refs(["x"], step=5)
