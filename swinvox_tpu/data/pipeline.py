"""Host data pipeline: decode, augment, batch, prefetch.

Replaces the reference's torch DataLoader + 16 worker processes
(core/train.py:64-76) with a thread-pool pipeline: PNG decode (PIL) and
numpy augmentation release the GIL, so threads scale without pickling or
process startup; batches are assembled into pinned contiguous arrays and
prefetched ahead of the training step so the TPU never waits on the host.

View selection matches the reference (utils/data_loaders.py:61-67):
TRAIN draws a random subset of n views per epoch; VAL/TEST take the first n.
Images decode to float32 BGR(A)/255 exactly like cv2.imread(UNCHANGED)/255.
"""

from __future__ import annotations

import logging
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from swinvox_tpu.config import Config
from swinvox_tpu.data import binvox
from swinvox_tpu.data.taxonomy import DatasetType, SampleRecord

log = logging.getLogger(__name__)


def load_image_bgr(path: str) -> np.ndarray:
    """Decode an image file to float32 BGR(A) in [0,1].

    Matches cv2.imread(IMREAD_UNCHANGED).astype(float32)/255 (reference
    utils/data_loaders.py:71): RGBA files keep alpha, channels flipped
    RGB->BGR; grayscale is stacked to 3 channels (reference :194-196).

    PNG/JPEG go through the native codec when available (decode + the
    uint8->float BGR conversion in C with the GIL released, so loader
    threads scale on real cores — native/imgcodec.cc); anything else, or
    a missing compiler/libs, falls back to PIL.
    """
    from swinvox_tpu.native.runtime import decode_image_native

    with open(path, "rb") as f:
        data = f.read()
    native = decode_image_native(data)
    if native is not None:
        return native

    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        if im.mode == "P":  # palette -> true colors (cv2 semantics)
            im = im.convert(
                "RGBA" if "transparency" in im.info else "RGB"
            )
        elif im.mode == "LA":  # gray+alpha -> BGRA like the native path
            im = im.convert("RGBA")
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    arr = arr.astype(np.float32) / 255.0
    if arr.shape[-1] == 4:
        return arr[..., [2, 1, 0, 3]]
    return arr[..., ::-1]


def load_volume(path: str) -> np.ndarray:
    """Decode a ground-truth volume (.binvox or .mat) to float32."""
    if path.endswith(".mat"):
        import scipy.io

        return scipy.io.loadmat(path)["Volume"].astype(np.float32)
    with open(path, "rb") as f:
        return binvox.read_as_3d_array(f).data.astype(np.float32)


def _put_unless_stopped(q: "queue.Queue", item, stop: threading.Event) -> bool:
    """Blocking put that aborts (returns False) once `stop` is set."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.5)
            return True
        except queue.Full:
            continue
    return False


@dataclass
class Batch:
    taxonomy_ids: List[str]
    sample_names: List[str]
    images: np.ndarray  # [B, N, H, W, 3] float32, normalized — or, in
    # device-augment mode, RAW decoded [B, N, H, W, 3|4] in [0, 1]
    volumes: np.ndarray  # [B, D, H, W] float32 {0,1}
    # device-augment mode only: per-sample augmentation parameters
    # (bg_color [B,3], color_A/B [B,3,3], color_v [B,3], flips [B,N]) to
    # feed data/device_augment.device_train_augment on the accelerator
    aug: Optional[dict] = None


class VoxelDataset:
    """Decoded + transformed samples over an index's records."""

    def __init__(
        self,
        records: Sequence[SampleRecord],
        split: DatasetType,
        n_views: int,
        cfg: Config,
        train_augment: bool,
        seed: int = 0,
        device_augment: bool = False,
    ):
        self.records = list(records)
        self.split = split
        self.n_views = n_views
        self.cfg = cfg
        self.train_augment = train_augment
        self.seed = seed
        # decode-only host path: pixels ship raw, the augmentation runs on
        # the accelerator (data/device_augment.py) — train (full pipeline)
        # and eval (crop/background/normalize) splits alike
        self.device_augment = device_augment
        # optional random background images (reference DIR.RANDOM_BG_PATH,
        # utils/data_transforms.py:419-421)
        self.bg_files: List[str] = []
        if train_augment and cfg.DIR.RANDOM_BG_PATH:
            try:
                root = cfg.DIR.RANDOM_BG_PATH
                self.bg_files = [
                    os.path.join(root, f) for f in sorted(os.listdir(root))
                ]
            except OSError:
                log.warning(
                    "RANDOM_BG_PATH %s unreadable; using solid colors",
                    cfg.DIR.RANDOM_BG_PATH,
                )

    def __len__(self) -> int:
        return len(self.records)

    def set_n_views(self, n_views: int) -> None:
        """Reference's set_n_views_rendering (utils/data_loaders.py:51-52)."""
        self.n_views = n_views

    def _select_views(
        self, rec: SampleRecord, idx: int, epoch: int
    ) -> Tuple[np.random.Generator, List[str]]:
        """Per-sample rng + view paths — ONE implementation shared by
        load() and load_raw() so their rng streams stay in lockstep (the
        host/device augmentation parity depends on it)."""
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx])
        )
        if self.split == DatasetType.TRAIN:
            chosen = rng.choice(
                len(rec.image_paths), size=self.n_views, replace=False
            )
            paths = [rec.image_paths[i] for i in chosen]
        else:
            paths = rec.image_paths[: self.n_views]
        return rng, paths

    def load(self, idx: int, epoch: int = 0) -> Tuple[str, str, np.ndarray, np.ndarray]:
        from swinvox_tpu.data.transforms import eval_transform, train_transform

        rec = self.records[idx]
        rng, paths = self._select_views(rec, idx, epoch)
        images = np.stack([load_image_bgr(p) for p in paths])
        volume = load_volume(rec.volume_path)
        if self.train_augment:
            bg_image = None
            if self.bg_files:
                bg_image = load_image_bgr(
                    self.bg_files[int(rng.integers(len(self.bg_files)))]
                )
            images = train_transform(
                images, self.cfg, rng, rec.bounding_box, bg_image=bg_image
            )
        else:
            images = eval_transform(images, self.cfg, rng, rec.bounding_box)
        return rec.taxonomy_id, rec.sample_name, images, volume

    def load_raw(
        self, idx: int, epoch: int = 0
    ) -> Tuple[str, str, np.ndarray, np.ndarray, dict]:
        """Device-augment mode: decode only; draw the augmentation
        parameters with the SAME rng stream load() would use, so the
        on-device pipeline reproduces the host augmentation exactly
        (transforms.draw_train_params / data/device_augment.py).

        Requires same-size renders (ShapeNet's 137x137) and no
        RANDOM_BG_PATH (SUN background images stay a host-path feature);
        bbox crops (Pascal3D/Pix3D) are eval-only and unaffected.
        """
        from swinvox_tpu.data.transforms import (
            draw_eval_params,
            draw_train_params,
        )

        rec = self.records[idx]
        if rec.bounding_box is not None:
            raise ValueError(
                "device_augment does not support bbox-cropped sources"
            )
        if self.bg_files:
            raise ValueError(
                "device_augment does not support RANDOM_BG_PATH images"
            )
        rng, paths = self._select_views(rec, idx, epoch)
        images = np.stack([load_image_bgr(p) for p in paths])
        volume = load_volume(rec.volume_path)
        draw = draw_train_params if self.train_augment else draw_eval_params
        params = draw(
            self.cfg, rng, self.n_views, has_alpha=images.shape[-1] == 4
        )
        # ship uint8: PNG sources are 8-bit, so round(x*255) inverts the
        # decoder's /255 exactly and the host->device transfer shrinks 4x
        # (device_train_augment rescales on-device)
        images = np.round(images * 255.0).astype(np.uint8)
        return rec.taxonomy_id, rec.sample_name, images, volume, params


class BatchLoader:
    """Shuffling, prefetching batch iterator over a VoxelDataset.

    Iterating yields Batch objects; an internal thread pool decodes samples
    and a bounded queue keeps `prefetch` batches ready.
    """

    def __init__(
        self,
        dataset: VoxelDataset,
        batch_size: int,
        shuffle: bool,
        drop_last: bool,
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        """shard_index/shard_count: multi-host data sharding — every host
        derives the same global batch order (same seed) and loads only its
        contiguous slice of each batch, so per-host batches concatenate to
        the reference's global batch.  batch_size is the GLOBAL batch size.
        """
        if batch_size % shard_count != 0:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{shard_count} hosts"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.epoch = 0
        self.shard_index = shard_index
        self.shard_count = shard_count

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _batch_indices(self) -> List[np.ndarray]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch])
            ).shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Batch]:
        batches = self._batch_indices()
        if self.shard_count > 1:
            per_host = self.batch_size // self.shard_count
            lo = self.shard_index * per_host
            batches = [
                b[lo : lo + per_host] for b in batches if len(b) > lo
            ]
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def assemble(idxs: np.ndarray) -> Batch:
            if getattr(self.dataset, "device_augment", False):
                samples = [
                    self.dataset.load_raw(int(i), self.epoch) for i in idxs
                ]
                tax, names, images, volumes, params = zip(*samples)
                aug = {
                    k: np.stack([p[k] for p in params]) for k in params[0]
                }
                return Batch(
                    taxonomy_ids=list(tax),
                    sample_names=list(names),
                    images=np.stack(images),
                    volumes=np.stack(volumes),
                    aug=aug,
                )
            samples = [self.dataset.load(int(i), self.epoch) for i in idxs]
            tax, names, images, volumes = zip(*samples)
            return Batch(
                taxonomy_ids=list(tax),
                sample_names=list(names),
                images=np.stack(images),
                volumes=np.stack(volumes),
            )

        def producer():
            # keep a bounded window of futures in flight: submitting the
            # whole epoch at once would let the pool race ahead of the
            # consumer and pile completed batches up in memory
            window = self.num_workers + self.prefetch
            with ThreadPoolExecutor(self.num_workers) as pool:
                import collections

                pending = collections.deque()
                it = iter(batches)
                try:
                    while True:
                        while len(pending) < window:
                            b = next(it, None)
                            if b is None:
                                break
                            pending.append(pool.submit(assemble, b))
                        if not pending:
                            break
                        fut = pending.popleft()
                        if stop.is_set():
                            for f in pending:
                                f.cancel()
                            return
                        result = fut.result()
                        # put with a timeout so an abandoned consumer (its
                        # generator finalizer sets `stop`) can't leave the
                        # producer blocked forever holding decoded batches
                        if not _put_unless_stopped(out_q, result, stop):
                            for f in pending:
                                f.cancel()
                            return
                except Exception as e:  # surface worker errors
                    _put_unless_stopped(out_q, e, stop)
                    return
            _put_unless_stopped(out_q, None, stop)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def build_loader(
    cfg: Config,
    split: DatasetType,
    n_views: Optional[int] = None,
    batch_size: Optional[int] = None,
    dataset_name: Optional[str] = None,
    seed: int = 0,
) -> BatchLoader:
    """Assemble index -> dataset -> loader for a split, reference-style."""
    from swinvox_tpu.data.taxonomy import DATASET_INDEX_MAPPING

    if dataset_name is None:
        dataset_name = (
            cfg.DATASET.TRAIN_DATASET
            if split == DatasetType.TRAIN
            else cfg.DATASET.TEST_DATASET
        )
    import jax

    index = DATASET_INDEX_MAPPING[dataset_name](cfg)
    records = index.samples(split)
    train = split == DatasetType.TRAIN
    if not train and jax.process_count() > 1:
        # multi-host evaluation: shard the SAMPLES across processes
        # (strided, so the per-host category mix stays even); evaluate()
        # assembles global eval batches from each process's local slice
        # and reduces the metrics globally.  Train splits instead shard
        # each global batch contiguously (shard_index/shard_count below).
        records = records[jax.process_index() :: jax.process_count()]
    # device augmentation applies wherever the source supports it
    # (fixed-size bbox-less renders — ShapeNet); bbox datasets
    # (Pascal3D/Pix3D) and SUN background-image augmentation
    # (DIR.RANDOM_BG_PATH) stay on the host transform automatically
    device_aug = (
        cfg.TRAIN.DEVICE_AUGMENT
        and not cfg.DIR.RANDOM_BG_PATH
        and all(r.bounding_box is None for r in records)
    )
    dataset = VoxelDataset(
        records,
        split,
        n_views or cfg.CONST.N_VIEWS_RENDERING,
        cfg,
        train_augment=train,
        seed=seed,
        device_augment=device_aug,
    )
    return BatchLoader(
        dataset,
        batch_size=batch_size or (cfg.CONST.BATCH_SIZE if train else 1),
        shuffle=train,
        drop_last=train,
        num_workers=cfg.CONST.NUM_WORKER,
        seed=seed,
        # multi-host: each process loads its slice of the global batch
        shard_index=jax.process_index() if train else 0,
        shard_count=jax.process_count() if train else 1,
    )
