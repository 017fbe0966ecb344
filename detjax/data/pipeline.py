"""Batching, prefetch, and on-device augmentation (SURVEY.md §3.4 →
"fused device input stream").

Host side stays minimal (decode + letterbox to a fixed uint8 canvas + GT
padding — cheap, single-core friendly); photometric normalize + random
horizontal flip are jitted ON DEVICE (``device_augment``) so the HBM-bound
work fuses into the train step and the H2D transfer moves uint8 (4× fewer
bytes than fp32). A one-deep device prefetch overlaps the next batch's H2D
copy with the current step's compute.
"""

from __future__ import annotations

import collections
import threading
from functools import partial
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from detjax.config import Config
from detjax.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    letterbox,
    pad_annotations,
    random_crop,
)

Array = jnp.ndarray


def normalize_u8(images_u8: Array, mean, std, out_dtype=jnp.float32) -> Array:
    """THE uint8→normalized-image math, traceable inside any jit: fp32
    ``/255 → -mean → /std``, one cast to ``out_dtype`` at the end. The
    single definition shared by :func:`device_augment`, the fused
    detect-over-uint8 paths (``modeling._detect_u8_fn``,
    ``quant._detect_int8_u8_fn``) and the u8-signature StableHLO export
    (``export.export_detect``) — so the live fp path, the int8 engine and
    serialized artifacts can never normalize differently."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(tuple(mean), jnp.float32)) \
        / jnp.asarray(tuple(std), jnp.float32)
    return x.astype(out_dtype)


@partial(jax.jit, static_argnames=("hflip_prob", "mean", "std", "out_dtype"))
def device_augment(
    images_u8: Array,  # [B, H, W, 3] uint8
    gt_boxes: Array,  # [B, G, 4]
    rng: Array,  # PRNGKey
    hflip_prob: float = 0.5,
    mean: Tuple[float, float, float] = tuple(IMAGENET_MEAN.tolist()),
    std: Tuple[float, float, float] = tuple(IMAGENET_STD.tolist()),
    out_dtype: Any = jnp.float32,
) -> Tuple[Array, Array]:
    """Normalize + random per-image horizontal flip, fused on device.

    Fusing here (instead of DataLoader workers as the reference does,
    SURVEY.md §3.4) keeps the input stream on-chip: uint8 H2D → one
    elementwise fusion on the VPU. ``mean``/``std`` come from
    ``cfg.data.mean/std`` (trace-time constants).

    ``out_dtype``: the math is always fp32; the OUTPUT is cast to this
    dtype inside the same fusion. Passing the model dtype (bf16) here is
    bit-identical to normalizing in fp32 and letting the model cast —
    the model's ``x.astype(self.dtype)`` becomes a no-op — but halves
    the HBM traffic at the normalize→model jit boundary on the serving
    and eval paths (the fp32 batch never materializes; the detect jit's
    standalone input-cast copy disappears — docs/ROOFLINE.md round-3
    inference trace, ``resnet.py`` astype row).
    """
    b, h, w, _ = images_u8.shape
    x = normalize_u8(images_u8, mean, std)  # keep fp32 through the flip
    if hflip_prob > 0:
        flip = jax.random.bernoulli(rng, hflip_prob, (b,))
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
        flipped = jnp.stack([
            w - gt_boxes[..., 2], gt_boxes[..., 1],
            w - gt_boxes[..., 0], gt_boxes[..., 3]], axis=-1)
        gt_boxes = jnp.where(flip[:, None, None], flipped, gt_boxes)
    return x.astype(out_dtype), gt_boxes


class DetectionIterator:
    """Fixed-shape batches from a record dataset, with background prefetch.

    Yields ``{"images": u8 [B,H,W,3], "gt_boxes": [B,G,4],
    "gt_labels": [B,G], "image_id": [B], "scale": [B]}`` numpy batches.
    """

    def __init__(self, dataset, batch_size: int, image_size: Tuple[int, int],
                 max_gt: int = 100, shuffle: bool = True, repeat: bool = True,
                 seed: int = 0, crop: bool = False,
                 crop_range: Tuple[float, float] = (0.3, 1.0),
                 drop_remainder: bool = True, prefetch: int = 2,
                 workers: int = 1, shard_index: int = 0,
                 num_shards: int = 1,
                 scale_minmax: Optional[Tuple[int, int]] = None):
        self.ds = dataset
        self.bs = batch_size
        self.hw = image_size
        self.max_gt = max_gt
        self.shuffle = shuffle
        self.repeat = repeat
        self.seed = seed
        self.crop = crop
        self.crop_range = crop_range
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        # decode/resize threads (the reference's DataLoader workers,
        # SURVEY.md §2 #15 — threads suffice here: PIL decode and the
        # native resize both release the GIL)
        self.workers = max(1, workers)
        self.shard_index = shard_index
        self.num_shards = num_shards
        # reference eval-protocol resize rule (transforms.protocol_scale)
        self.scale_minmax = scale_minmax

    def _record_to_example(self, rec: dict, rng: np.random.Generator) -> dict:
        img, boxes, labels = rec["image"], rec["boxes"], rec["labels"]
        if self.crop and rng.random() < 0.5:
            img, boxes, labels = random_crop(
                img, boxes, labels, rng, *self.crop_range)
        canvas, boxes, scale = letterbox(img, boxes, self.hw,
                                         scale_minmax=self.scale_minmax)
        pb, pl = pad_annotations(boxes, labels, self.max_gt)
        return {"images": canvas, "gt_boxes": pb, "gt_labels": pl,
                "image_id": rec["image_id"], "scale": scale}

    def _epoch_order(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        if self.num_shards > 1:
            # per-host shard (multi-host DP, SURVEY.md §5.8): every host
            # sees a disjoint stride of the SAME seeded shuffle, so the
            # global batch is a permutation of the dataset with no overlap
            idx = idx[self.shard_index::self.num_shards]
        return idx

    def _examples(self, order, epoch: int):
        """Decoded examples in ``order``; multi-threaded when workers > 1.

        Per-example RNG is keyed (seed, epoch, index) in BOTH paths so
        results are identical regardless of worker count or completion
        order."""

        def load(i):
            rng = np.random.default_rng((self.seed, epoch, int(i)))
            return self._record_to_example(self.ds[int(i)], rng)

        if self.workers == 1:
            for i in order:
                yield load(i)
            return
        from concurrent.futures import ThreadPoolExecutor

        window = self.workers * 2
        with ThreadPoolExecutor(self.workers) as pool:
            pending = collections.deque()
            it = iter(order)
            for i in it:
                pending.append(pool.submit(load, i))
                if len(pending) >= window:
                    break
            for i in it:
                yield pending.popleft().result()
                pending.append(pool.submit(load, i))
            while pending:
                yield pending.popleft().result()

    def batches_per_epoch(self) -> int:
        n = len(self._epoch_order(0))
        return n // self.bs if self.drop_remainder else -(-n // self.bs)

    def iter_from(self, batch_idx: int) -> Iterator[Dict[str, np.ndarray]]:
        """Resume the stream at global batch ``batch_idx`` — O(1) seek.

        The stream is deterministic in (seed, epoch, index-within-epoch)
        (both the shuffle and the per-example augmentation RNG are keyed
        that way), so seeking is arithmetic: no skipped example is decoded.
        This is what makes checkpoint resume bit-exact end-to-end
        (SURVEY.md §5.4): step counter == global batch index.
        """
        if batch_idx and not self.drop_remainder:
            raise ValueError("iter_from requires drop_remainder batches "
                             "(train path); eval streams don't resume")
        return self._iterate(start_batch=batch_idx)

    def _gen(self, start_batch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        bpe = self.batches_per_epoch() if start_batch else 0
        epoch = start_batch // bpe if start_batch else 0
        skip = start_batch - epoch * bpe if start_batch else 0
        while True:
            order = self._epoch_order(epoch)
            if skip:
                order = order[skip * self.bs:]
                skip = 0
            buf = []
            for ex in self._examples(order, epoch):
                buf.append(ex)
                if len(buf) == self.bs:
                    yield self._stack(buf)
                    buf = []
            if buf and not self.drop_remainder:
                # pad the final partial batch by repeating the last example
                while len(buf) < self.bs:
                    filler = dict(buf[-1])
                    filler["image_id"] = -1  # marks padding for eval
                    buf.append(filler)
                yield self._stack(buf)
            epoch += 1
            if not self.repeat:
                return

    @staticmethod
    def _stack(examples) -> Dict[str, np.ndarray]:
        return {
            "images": np.stack([e["images"] for e in examples]),
            "gt_boxes": np.stack([e["gt_boxes"] for e in examples]),
            "gt_labels": np.stack([e["gt_labels"] for e in examples]),
            "image_id": np.asarray([e["image_id"] for e in examples], np.int64),
            "scale": np.asarray([e["scale"] for e in examples], np.float32),
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self._iterate(start_batch=0)

    def _iterate(self, start_batch: int) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            yield from self._gen(start_batch)
            return
        # background thread keeps `prefetch` batches ready (single-core box:
        # this overlaps host decode with device compute across the GIL
        # release in device execution)
        q: collections.deque = collections.deque()
        done = threading.Event()
        sem = threading.Semaphore(self.prefetch)
        lock = threading.Lock()

        def worker():
            try:
                for batch in self._gen(start_batch):
                    # bounded wait so an abandoned consumer (done set while
                    # we are parked here) releases the thread instead of
                    # leaking it blocked on the semaphore forever
                    while not sem.acquire(timeout=0.1):
                        if done.is_set():
                            return
                    if done.is_set():
                        return
                    with lock:
                        q.append(batch)
                with lock:
                    q.append(None)  # clean end of stream
            except BaseException as exc:  # propagate, don't fake EOF
                with lock:
                    q.append(exc)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                with lock:
                    item = q.popleft() if q else ()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                if isinstance(item, tuple) and item == ():
                    t.join(timeout=0.005)
                    continue
                sem.release()
                yield item
        finally:
            done.set()


def prefetch_is_profitable(transfer_s: float, step_s: float,
                           threshold: float = 0.5) -> bool:
    """Decide whether double-buffered device prefetch helps on THIS host.

    Prefetch wins when the next batch's H2D transfer hides under the
    current step's compute — i.e. when the transfer is meaningfully
    shorter than the step. Through a slow transport (this box's ~28 MB/s
    axon tunnel) a prefetched batch's bytes serialize AHEAD of the next
    step's dispatch commands, so every step waits out a full transfer and
    prefetch measures 0.24× serial (BASELINE.md round-3 table). The
    boundary: when one transfer costs ≥ ``threshold`` of a step, there is
    no compute to hide it under — run serial. fit() measures both at
    startup (one real batch, one compiled step) and calls this
    (VERDICT r3 #4); ``cfg.data.device_prefetch=True/False`` overrides.
    """
    return transfer_s < threshold * step_s


def device_prefetch(batches: Iterator[Dict[str, np.ndarray]],
                    size: int = 1, sharding=None):
    """Double-buffered ``jax.device_put``: keep ``size`` batches in flight
    so the NEXT batch's H2D copy overlaps the CURRENT step's device compute
    (SURVEY.md §7 "double-buffered jax.device_put prefetch").

    ``jax.device_put`` is asynchronous on TPU — it enqueues the transfer
    and returns immediately — so issuing it one batch ahead is all the
    overlap machinery needed; the jitted step then consumes
    already-resident (or in-flight) arrays instead of paying a synchronous
    copy at call time. ``sharding`` places batches for the pjit
    data-parallel path (NamedSharding over the batch axis); default is the
    single-chip default device.
    """
    target = sharding if sharding is not None else jax.devices()[0]

    def put(b):
        return {k: jax.device_put(v, target) for k, v in b.items()}

    buf: collections.deque = collections.deque()
    for b in batches:
        buf.append(put(b))
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def make_train_iterator(dataset, cfg: Config, per_host: bool = False):
    """Train batches; ``per_host=True`` gives this process its shard of the
    data and of the global batch (multi-host pjit DP — each host feeds its
    own chips; jax.make_array_from_process_local_data assembles the global
    batch)."""
    import jax

    shard_index, num_shards = (
        (jax.process_index(), jax.process_count()) if per_host else (0, 1))
    bs = cfg.train.batch_size
    if per_host:
        assert bs % num_shards == 0, (bs, num_shards)
        bs //= num_shards
    return DetectionIterator(
        dataset, bs, cfg.model.image_size,
        max_gt=cfg.train.max_gt, shuffle=True, repeat=True,
        seed=cfg.train.seed, crop=cfg.data.random_crop,
        crop_range=(cfg.data.crop_min_scale, cfg.data.crop_max_scale),
        prefetch=cfg.data.prefetch, workers=cfg.data.host_workers,
        shard_index=shard_index, num_shards=num_shards)


def make_eval_iterator(dataset, cfg: Config):
    return DetectionIterator(
        dataset, cfg.eval.batch_size, cfg.model.image_size,
        max_gt=cfg.train.max_gt, shuffle=False, repeat=False, crop=False,
        drop_remainder=False, prefetch=cfg.data.prefetch,
        workers=cfg.data.host_workers,
        scale_minmax=tuple(cfg.data.eval_scale_minmax) or None)
