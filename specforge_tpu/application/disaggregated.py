"""Disaggregated role runtimes: producer and consumer workers.

Wires the online topology from config — the role of the reference
launch.py:792-1432 + training/disaggregated.py:810 builders:

- **producer** (CPU-only process): prompt plan → DataFlowController →
  capture-server adapters → RolloutWorkers → StreamingRefChannel, with
  hysteretic flow control fed by the channel's consumed counter.
- **consumer** (TPU process): sole channel reader (RefDistributor) → per-rank
  inbox → streaming loader → Trainer, acking at optimizer boundaries
  (ledger → store release → channel consumed counter → producer resumes).
"""

from __future__ import annotations

import json
import logging
import os
import queue
import threading
import time
from typing import Any, Dict, List, Optional

import numpy as np

from specforge_tpu.config.schema import Config
from specforge_tpu.data.prompt_builder import load_prompt_records, prepare_prompt_tasks
from specforge_tpu.inference.rollout_worker import RolloutWorker
from specforge_tpu.inference.server_capture_adapter import HTTPCaptureAdapter
from specforge_tpu.runtime.control_plane.controller import DataFlowController
from specforge_tpu.runtime.control_plane.flow_control import (
    FlowControlConfig,
    ProducerFlowControl,
)
from specforge_tpu.runtime.control_plane.metadata_store import (
    InMemoryMetadataStore,
    SQLiteMetadataStore,
)
from specforge_tpu.runtime.data_plane.streaming_ref_channel import (
    StreamingRefChannel,
)

logger = logging.getLogger("specforge_tpu.disaggregated")


def _control_dir(config: Config) -> str:
    return config.runtime.control_dir or os.path.join(
        config.output_dir, config.run_id, "control"
    )


def _build_store(config: Config):
    backend = config.runtime.store_backend
    if backend == "network":
        from specforge_tpu.runtime.data_plane.network_store import (
            NetworkFeatureStore,
        )

        return NetworkFeatureStore(
            config.runtime.store_endpoint,
            secret=config.runtime.store_secret,
        )
    if backend == "shared_dir":
        from specforge_tpu.runtime.data_plane.feature_store import (
            SharedDirFeatureStore,
        )

        return SharedDirFeatureStore(config.runtime.store_dir)
    from specforge_tpu.runtime.data_plane.feature_store import (
        InMemoryFeatureStore,
    )

    return InMemoryFeatureStore()


def run_producer(config: Config, *, poll_interval: float = 0.2) -> int:
    """Drive capture until the prompt plan drains; returns samples produced."""
    if config.training.resume_from is not None:
        # schema rejects role="producer"; a role="auto" process resolving to
        # producer must not silently ignore the setting either
        raise ValueError(
            "training.resume_from is valid only for a trainer role"
        )
    if not config.data.prompt_path:
        raise ValueError("online producer requires data.prompt_path")
    records = load_prompt_records(config.data.prompt_path)
    if any("input_ids" not in r for r in records):
        # raw conversations: tokenize at the producer with the configured
        # chat template (the reference producer's prepare_prompts path)
        from transformers import AutoTokenizer

        from specforge_tpu.data.prompt_builder import tokenize_prompt_records

        if not config.model.target_model_path:
            raise ValueError(
                "raw (untokenized) prompt records require "
                "model.target_model_path for the tokenizer"
            )
        if not config.data.chat_template:
            raise ValueError(
                "raw (untokenized) prompt records require data.chat_template"
            )
        records = tokenize_prompt_records(
            records,
            AutoTokenizer.from_pretrained(config.model.target_model_path),
            config.data.chat_template,
            config.data.max_length,
            train_only_last_turn=config.data.train_only_last_turn,
        )
    tasks = prepare_prompt_tasks(
        records, epoch=0, prompt_seed=config.training.seed
    )
    controller = DataFlowController()
    controller.ingest_prompts(tasks)

    channel = StreamingRefChannel(_control_dir(config))
    # producer restart recovery: the channel file is the durable record of
    # what was already published — skip those prompts (exactly-once
    # publication; a crash between store-put and publish re-captures, which
    # at worst overwrites the same store keys). Ref: reference producer
    # re-lease/attempt-cap semantics, launch.py:853-861.
    replayed, _closed, _failure = StreamingRefChannel(_control_dir(config)).poll()
    already_produced = 0
    for ref in replayed:
        pid = ref.prompt_id or ref.sample_id.split("/", 1)[0]
        controller.complete_prompt(pid)
        already_produced += 1
    if already_produced:
        logger.info(
            "producer restart: skipping %d already-published prompts",
            already_produced,
        )
    flow = ProducerFlowControl(FlowControlConfig(
        high_watermark_refs=config.runtime.flow_high_watermark,
        low_watermark_refs=config.runtime.flow_low_watermark,
    ))
    store = _build_store(config)
    use_store_sink = config.runtime.store_backend == "network"

    from specforge_tpu.inference.batch_partition import TargetBatchPartition

    batch_size = config.runtime.capture_batch_size
    workers: List[RolloutWorker] = []
    for i, url in enumerate(config.deployment.server_urls):
        adapter = HTTPCaptureAdapter(
            url,
            store=store,
            store_endpoint=(
                config.runtime.store_endpoint if use_store_sink else None
            ),
        )
        source_kwargs = (
            dict(
                batch_ref_source=adapter.produce_refs_batch,
                batch_partition=TargetBatchPartition(
                    max_batch_tokens=config.runtime.capture_batch_tokens,
                    max_batch_size=batch_size,
                ),
                lease_limit=batch_size,
            )
            if batch_size > 1
            else dict(ref_source=adapter.produce_refs)
        )
        workers.append(RolloutWorker(
            f"producer-{i}",
            controller=controller,
            publish_fn=lambda refs, _c=channel: _c.publish_batch(refs),
            flow_control=flow,
            **source_kwargs,
        ))
    if not workers:
        raise ValueError("online producer requires deployment.server_urls")

    produced = 0
    try:
        while True:
            flow.set_in_flight(channel.in_flight_remote())
            round_produced = sum(w.step() for w in workers)
            produced += round_produced
            status = controller.status()
            if status["prompts_pending"] == 0:
                break
            if all(w.health.dropped for w in workers):
                raise RuntimeError("all producer workers dropped")
            if round_produced == 0:
                time.sleep(poll_interval)
        channel.close()
        logger.info("producer done: %d samples, status=%s", produced, status)
        return produced
    except Exception as exc:
        channel.fail(str(exc))
        raise


class InboxFeeder:
    """Background thread polling a rank inbox into a loader queue."""

    def __init__(self, inbox, poll_interval: float = 0.1):
        self.inbox = inbox
        self.queue: "queue.Queue" = queue.Queue()
        self.poll_interval = poll_interval
        self.failure: Optional[str] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def _run(self):
        while not self._stop.is_set():
            refs, closed, failure = self.inbox.poll()
            for ref in refs:
                self.queue.put(ref)
            if failure:
                self.failure = failure
                self.queue.put(None)
                return
            if closed:
                self.queue.put(None)
                return
            if not refs:
                time.sleep(self.poll_interval)

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5)


def run_consumer(config: Config, frozen_override=None) -> Dict[str, float]:
    """Online consumer: distributor + streaming loader + Trainer."""
    from specforge_tpu.application.composition import (
        _load_target_tables,
        _resolve_vocab_mapping,
        _set_buffers,
        _strategy_options,
        resolve_run,
    )
    from specforge_tpu.data.collator import CollatorConfig, PaddingCollator
    from specforge_tpu.runtime.data_plane.feature_dataloader import (
        FeatureDataLoader,
    )
    from specforge_tpu.runtime.data_plane.ref_distributor import (
        InboxChannel,
        RefDistributor,
    )
    from specforge_tpu.training.optimizer import OptimizerConfig
    from specforge_tpu.training.trainer import Trainer, TrainerConfig
    from specforge_tpu.training.tracking import build_tracker
    import jax

    from specforge_tpu.parallel.multihost import (
        is_primary,
        maybe_initialize_distributed,
        process_count,
        process_index,
    )

    maybe_initialize_distributed()
    procs = process_count()
    rank = process_index()
    primary = is_primary()

    t = config.training
    if t.total_steps is None:
        raise ValueError("online consumer requires training.total_steps")
    if t.resume and t.save_interval <= 0:
        # with no checkpoints, per-step durable acks would release samples a
        # restart can never recover (acks must not run ahead of restorable
        # state) — refuse the unsafe combination
        raise ValueError(
            "online consumer with training.resume=true requires "
            "training.save_interval > 0 (acks flush at checkpoint "
            "boundaries; without checkpoints a restart would lose every "
            "acked sample)"
        )
    resolved = resolve_run(config)
    reg = resolved.registration
    options = _strategy_options(config)

    draft, draft_config = reg.providers.build_draft(resolved.draft_config_dict)
    if options.get("mask_token_id") is None:
        options["mask_token_id"] = getattr(draft_config, "mask_token_id", 0)
    model = reg.providers.build_training_model(draft, options)
    strategy = reg.providers.build_strategy(model, options)
    rng = jax.random.PRNGKey(t.seed)
    variables = reg.providers.init_variables(
        model, draft_config, options, rng, config.data.max_length
    )
    need_embed = "target_embed_weight" in reg.providers.frozen_requirements
    frozen = (
        frozen_override if frozen_override is not None
        else _load_target_tables(config, need_embed)
    )
    mapping = _resolve_vocab_mapping(config, draft_config)
    if mapping is not None:
        variables = _set_buffers(variables, *mapping)

    # --- streaming plane ---
    if t.batch_size % procs != 0:
        raise ValueError(
            f"training.batch_size={t.batch_size} (global) must divide by "
            f"{procs} consumer processes"
        )
    local_batch = t.batch_size // procs
    window = t.batch_size * t.accumulation_steps
    store = _build_store(config)
    state_dir = os.path.join(config.output_dir, config.run_id, "consumer_state")

    # shared-FS-free remote ranks: the channel/ledger/distributor live on the
    # primary; this rank polls its inbox and routes acks over the rank-0 HTTP
    # relay (reference InboxHTTPServer topology, http_inbox.py:78-324)
    relay_url = config.runtime.inbox_server_url
    remote_mode = (not primary) and bool(relay_url)

    channel = None
    ledger = None
    controller = None
    distributor = None
    relay_server = None
    pump_thread = None
    stop_pump = threading.Event()
    if remote_mode:
        pass  # channel/ledger/distributor live on the primary host
    else:
        channel = StreamingRefChannel(_control_dir(config))
        ledger = SQLiteMetadataStore(
            os.path.join(state_dir, "consumer.sqlite")
        )
        controller = DataFlowController(ledger)
        if primary:
            channel.publish_consumer_quantum(window)
        # restart generation: a killed-and-restarted consumer must not replay
        # inbox entries that were distributed pre-crash — each (re)start
        # writes/reads a fresh inbox keyed by the ledger's durable step
        # marker, and the primary CLEARS that generation's directory before
        # staging (a crash before the first ack leaves durable_step
        # unchanged, so the same key would otherwise still hold the
        # pre-crash fan-out and every requeued ref would deliver twice);
        # the distributor requeues exactly the committed-but-unacked tail
        # (reference reconcile_on_restart, control_plane/controller.py:228 +
        # tests/test_recovery.py semantics)
        durable = ledger.durable_step() or 0
        inbox_dir = os.path.join(state_dir, f"inboxes-g{durable}")

        # multi-host DP: the primary host is the sole channel reader; every
        # host (including the primary) trains from its own per-rank inbox
        # (reference rank0 RefDistributor + per-rank inboxes,
        # launch.py:1432-1539)
        if primary:
            import shutil as _shutil

            if os.path.exists(inbox_dir):
                _shutil.rmtree(inbox_dir)
            distributor = RefDistributor(
                channel, controller, inbox_dir, world_size=procs,
                window_samples=window,
            )

            def pump():
                while not stop_pump.is_set():
                    distributor.pump()
                    distributor.forward_consumed()
                    if distributor.closed and distributor.staged_count >= 0:
                        return
                    time.sleep(0.1)

            pump_thread = threading.Thread(target=pump, daemon=True)
            pump_thread.start()

    if procs > 1:
        # EVERY process joins: shared-dir ranks must not open the generation
        # dir before the primary's restart-clear, and collective sequences
        # must match across relay-mode and shared-dir ranks alike
        from specforge_tpu.parallel.multihost import barrier

        barrier("inbox-generation")
    if remote_mode:
        from specforge_tpu.runtime.data_plane.http_inbox import (
            RemoteInboxChannel,
        )

        inbox = RemoteInboxChannel(relay_url, rank)
    else:
        inbox = InboxChannel(inbox_dir, rank)
    feeder = InboxFeeder(inbox).start()
    collate = PaddingCollator(CollatorConfig(
        max_length=config.data.max_length, cast_float_dtype="float32"
    ))
    metadata = {"target_repr": "hidden_state"}
    loader = FeatureDataLoader(
        store, collate, ref_queue=feeder.queue, batch_size=local_batch,
        num_workers=config.data.num_workers, metadata=metadata,
    )

    # optional OFFLINE eval set alongside the online stream: the reference's
    # flagship online demonstration is eval acceptance climbing during a
    # disaggregated run (docs/benchmarks/eagle3-disaggregated-parity.md:16-23)
    eval_loader = None
    if config.data.eval_data_path:
        from specforge_tpu.parallel.multihost import shard_refs_for_process
        from specforge_tpu.runtime.data_plane.feature_store import (
            FileFeatureStore,
        )
        from specforge_tpu.runtime.data_plane.offline_reader import (
            OfflineManifestReader,
        )

        eval_refs = OfflineManifestReader(
            config.data.eval_data_path
        ).read()
        eval_refs = shard_refs_for_process(eval_refs, t.batch_size)
        eval_loader = FeatureDataLoader(
            FileFeatureStore(), collate, refs=eval_refs,
            batch_size=local_batch,
            num_workers=config.data.num_workers, metadata=metadata,
        )

    ref_by_id: Dict[str, Any] = {}

    class _RecordingQueue:
        """Track refs flowing to the loader so acks can release them."""
        def __init__(self, inner):
            self.inner = inner

        def get(self, timeout=None):
            item = self.inner.get(timeout=timeout)
            if item is not None:
                ref_by_id[item.sample_id] = item
            return item

    loader.ref_queue = _RecordingQueue(feeder.queue)

    release_fn = getattr(store, "release_refs", None)

    def _apply_ack(ids: List[str], step: int):
        """Authority-side durable ack: ledger marker, then store release."""
        controller.ack_train_refs(ids, step)
        refs = [ref_by_id.pop(sid) for sid in ids if sid in ref_by_id]
        have = {r.sample_id for r in refs}
        missing = [sid for sid in ids if sid not in have]
        if missing and ledger is not None:
            # remote ranks' refs never flowed through this rank's loader:
            # resolve them with a targeted ledger query for the store release
            refs.extend(ledger.committed_refs_by_ids(missing))
        if release_fn is not None:
            release_fn(refs)
        else:
            store.release(ids)

    if primary and config.runtime.inbox_server_port:
        from specforge_tpu.runtime.data_plane.http_inbox import (
            InboxHTTPServer,
        )

        relay_server = InboxHTTPServer(
            inbox_dir, port=config.runtime.inbox_server_port,
            ack_fn=_apply_ack,
        ).start()
        logger.info("inbox relay serving on port %d", relay_server.port)

    # ack durability must never run ahead of checkpoint durability: acks are
    # buffered and flushed only at checkpoint boundaries (and at run end), so
    # a crash-restart resumes from the checkpoint with every unacked sample
    # redelivered — exactly-once training relative to the restored state.
    ack_every = t.save_interval if t.save_interval > 0 else 1
    ack_buffer: List[str] = []

    def _flush_acks(step: int):
        if not ack_buffer:
            return
        ids, ack_buffer[:] = list(ack_buffer), []
        if remote_mode:
            inbox.post_ack(ids, step)
            inbox.report_consumed()
            for sid in ids:
                ref_by_id.pop(sid, None)
        else:
            _apply_ack(ids, step)

    def ack_fn(sample_ids: List[str], step: int):
        ack_buffer.extend(sample_ids)
        if step % ack_every == 0:
            _flush_acks(step)

    # mesh over the global device set (required multi-process)
    import jax as _jax

    from specforge_tpu.parallel.mesh import (
        MeshConfig,
        build_mesh,
        shard_pytree_like_params,
    )

    n_devices = _jax.device_count()
    fsdp = t.fsdp_size or max(
        n_devices // (t.dp_size * t.sp_ulysses_size * t.sp_ring_size), 1
    )
    mesh_cfg = MeshConfig(dp=t.dp_size, fsdp=fsdp,
                          sp_ulysses=t.sp_ulysses_size,
                          sp_ring=t.sp_ring_size)
    mesh = build_mesh(mesh_cfg) if mesh_cfg.world_size == n_devices else None
    if procs > 1 and mesh is None:
        raise ValueError(
            f"multi-process consumer requires a full mesh: {mesh_cfg} vs "
            f"{n_devices} devices"
        )
    if mesh is not None:
        variables = {
            **variables,
            "params": shard_pytree_like_params(variables["params"], mesh),
        }

    tracker = (
        build_tracker(
            config.tracking.backend, output_dir=config.output_dir,
            run_id=config.run_id,
        )
        if primary
        else build_tracker("none")
    )
    trainer = Trainer(
        strategy,
        variables=variables,
        mesh=mesh,
        world_size=procs,
        train_loader=loader,
        eval_loader=eval_loader,
        config=TrainerConfig(
            num_epochs=1,
            accum_steps=t.accumulation_steps,
            log_interval=t.log_interval,
            eval_interval=t.eval_interval if eval_loader else 0,
            checkpoint_interval=t.save_interval,
            max_checkpoints=t.max_checkpoints,
            output_dir=config.output_dir,
            run_id=config.run_id,
            resume=t.resume,
            total_steps=t.total_steps,
        ),
        optimizer_config=OptimizerConfig(
            lr=t.learning_rate, weight_decay=t.weight_decay,
            max_grad_norm=t.max_grad_norm, warmup_ratio=t.warmup_ratio,
            lr_scheduler=t.lr_scheduler,
        ),
        frozen=frozen,
        tracker=tracker,
        metadata=metadata,
        ack_fn=ack_fn,
    )
    try:
        metrics = trainer.fit()
        _flush_acks(int(trainer.state.step))
        if feeder.failure:
            raise RuntimeError(f"producer failed: {feeder.failure}")
        return metrics
    finally:
        stop_pump.set()
        feeder.stop()
        if relay_server is not None:
            relay_server.stop()
        if ledger is not None:
            ledger.close()
