"""Encode worker pool: N encoder replicas draining one asyncio queue.

Reference: next-plaid-api/src/handlers/encode.rs:92-255 — an mpsc queue with
N workers, each owning its own ONNX `Colbert` session, so concurrent encode
requests don't serialize on one model.

TPU translation: replicas differ by PARAMETER PLACEMENT, not by session.
With one chip, one replica is correct (the jitted forward already serializes
on the device, and a second same-device replica would only double HBM); with
N chips, each replica's params are `jax.device_put` to its own device and
requests round-robin across chips — the multi-chip serving story for
server-side encoding. Pool size = min(MODEL_POOL_SIZE, local device count).

Tokenization and post-processing run inside each worker's thread (via
run_in_executor), off the event loop — so even single-replica pools overlap
host tokenization of request i+1 with device compute of request i (the
encoder itself pipelines batches the same way, encoder/colbert.py).
"""

from __future__ import annotations

import asyncio
import copy
import os
from typing import List, Optional

import numpy as np


def pool_size_default() -> int:
    return int(os.environ.get("MODEL_POOL_SIZE", "1"))


# Max texts merged into one coalesced encode dispatch (matches the server's
# MAX_BATCH_TEXTS request cap; reference encode.rs MAX_BATCH_TEXTS=64).
_COALESCE_MAX_TEXTS = int(os.environ.get("ENCODE_COALESCE_MAX", "64"))


def make_replicas(encoder, size: Optional[int] = None) -> List:
    """Build up to `size` encoder replicas, one per local device.

    Replica 0 is the given encoder unchanged. Replica i>0 is a shallow copy
    with its params moved to local device i and a fresh jitted-forward cache
    (cached_property is per-instance), so XLA dispatches it on that device.
    """
    import jax

    devices = jax.local_devices()
    size = max(1, min(size or pool_size_default(), len(devices)))
    replicas = [encoder]
    for i in range(1, size):
        rep = copy.copy(encoder)
        rep.__dict__.pop("_forward", None)  # drop the cached jit closure
        rep.params = jax.device_put(encoder.params, devices[i])
        replicas.append(rep)
    return replicas


class EncoderPool:
    """Round-robin encode workers over encoder replicas."""

    def __init__(self, encoder, size: Optional[int] = None):
        self.replicas = make_replicas(encoder, size)
        self._queue: asyncio.Queue = asyncio.Queue()
        self._workers: List[asyncio.Task] = []

    @property
    def size(self) -> int:
        return len(self.replicas)

    def start(self) -> None:
        if self._workers:
            return
        for rep in self.replicas:
            self._workers.append(
                asyncio.get_running_loop().create_task(self._worker(rep))
            )

    async def stop(self) -> None:
        for t in self._workers:
            t.cancel()
        for t in self._workers:
            try:
                await t
            except asyncio.CancelledError:
                pass
        self._workers = []

    async def _worker(self, encoder) -> None:
        loop = asyncio.get_running_loop()
        while True:
            first = await self._queue.get()
            batch = [first]
            # Coalesce whatever is already queued into this dispatch: the
            # reference-protocol load shape is ONE query per HTTP request
            # with N concurrent workers (README benchmarks), which would
            # otherwise serialize N single-text forwards through the
            # device queue — each paying full dispatch latency. Merging
            # the backlog into one padded forward costs nothing when
            # requests arrive alone and multiplies throughput when they
            # arrive together. Per-text results are batch-composition
            # independent (attention masks; tests/test_api.py asserts
            # allclose vs solo encodes).
            n_texts = len(first[0])
            while n_texts < _COALESCE_MAX_TEXTS:
                try:
                    item = self._queue.get_nowait()
                except asyncio.QueueEmpty:
                    break
                batch.append(item)
                n_texts += len(item[0])
            groups: dict = {}
            for texts, input_type, pool_factor, fut in batch:
                groups.setdefault((input_type, pool_factor), []).append(
                    (texts, fut)
                )
            for (input_type, pool_factor), items in groups.items():
                live = [(t, f) for t, f in items if not f.cancelled()]
                if not live:
                    continue
                all_texts = [t for ts, _ in live for t in ts]

                def _run(texts=all_texts, input_type=input_type,
                         pool_factor=pool_factor):
                    if input_type == "query":
                        return encoder.encode_queries(texts)
                    return encoder.encode_documents(
                        texts, pool_factor=pool_factor
                    )

                try:
                    result = await loop.run_in_executor(None, _run)
                    off = 0
                    for ts, f in live:
                        part = result[off : off + len(ts)]
                        off += len(ts)
                        if not f.cancelled():
                            f.set_result(part)
                except Exception as e:  # propagate, keep draining
                    for _, f in live:
                        if not f.cancelled():
                            f.set_exception(e)

    async def encode(
        self,
        texts: List[str],
        input_type: str = "query",
        pool_factor: int = 1,
    ) -> List[np.ndarray]:
        """Queue an encode job and await its result."""
        if not self._workers:
            self.start()
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        await self._queue.put((list(texts), input_type, pool_factor, fut))
        return await fut

    def warm(self) -> float:
        """Pre-compile every query-forward batch bucket (and one full
        document batch) on every replica; returns wall-clock seconds.

        The reference's ONNX sessions have ONE fixed graph, so its model
        load is the whole warm-up (onnx lib.rs session build). XLA instead
        specializes the jitted forward per (batch-bucket, length-bucket)
        shape — without warming, a production mix of coalesced batch sizes
        (1..N concurrent single-query requests) pays a multi-second compile
        at first occurrence of EACH power-of-two bucket, which reads as a
        latency storm. Call at startup (ENCODE_WARM=1 / --warm-encode) to
        move all of it off the serving path; compiles land in the
        persistent cache so later processes warm in milliseconds.
        """
        import time

        t0 = time.perf_counter()
        for enc in self.replicas:
            b = 1
            while b <= min(enc.batch_size, _COALESCE_MAX_TEXTS):
                enc.encode_queries(["warm up"] * b)
                b *= 2
            # One full-batch, full-length document forward (the bulk-ingest
            # shape: encode_documents length-sorts then pads per batch).
            filler = "warm " * max(enc.config.document_length, 1)
            enc.encode_documents([filler] * enc.batch_size)
        return time.perf_counter() - t0
