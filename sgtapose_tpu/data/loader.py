"""Host-side batch loader: PNG decode + JSON parse on worker threads, feeding
the on-device augmentation pipeline.

Replaces the reference's torch DataLoader + CenterTrackSeqDataset host work
(ref train.py:251-260, datasets.py:61-213) — but the host only does IO here;
augmentation/priors/rendering happen on device (data/pipeline.py). Double-
buffered prefetch overlaps IO with TPU compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

from sgtapose_tpu.config import Config
from sgtapose_tpu.data.discovery import FramePair, remap_seq_frame
from sgtapose_tpu.data.loaders import load_image, load_seq_keypoints
from sgtapose_tpu.data.pipeline import RawSample


class SeqBatchLoader:
    """Iterates epochs of collated RawSample batches.

    seq_frame remapping (ref datasets.py:63-91) is applied per epoch; order is
    shuffled with a numpy Generator seeded per epoch (DistributedSampler
    set_epoch equivalent).
    """

    def __init__(
        self,
        pairs: Sequence[FramePair],
        cfg: Config,
        camera_K: np.ndarray,
        robot_name: str,
        keypoint_names: Sequence[str],
        batch_size: int,
        seed: int = 317,
        shuffle: bool = True,
        num_workers: int = 4,
        drop_last: bool = True,
        depth: bool = False,
    ):
        self.pairs = list(pairs)
        self.cfg = cfg
        self.camera_K = np.asarray(camera_K)
        self.robot_name = robot_name
        self.keypoint_names = list(keypoint_names)
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        # 42-joint depth-variant format (ref CenterTrackSeqDepthDataset,
        # datasets.py:445-635): joints_3n_fixed_42 loader, no seq_frame remap
        # (flat frame stream, no per-video NNNN_color naming)
        self.depth = depth

    def __len__(self) -> int:
        if self.drop_last:
            return len(self.pairs) // self.batch_size
        return (len(self.pairs) + self.batch_size - 1) // self.batch_size

    def _load_one(self, pair: FramePair) -> RawSample:
        if self.depth:
            from sgtapose_tpu.data.loaders import load_depth_keypoints

            prev_kp = load_depth_keypoints(
                pair.prev_data_path, self.robot_name, self.camera_K
            )
            next_kp = load_depth_keypoints(
                pair.next_data_path, self.robot_name, self.camera_K
            )
            return RawSample(
                prev_img=load_image(pair.prev_img_path),
                next_img=load_image(pair.next_img_path),
                prev_projs=prev_kp["projections"].astype(np.float32),
                next_projs=next_kp["projections"].astype(np.float32),
                prev_x3d_rob=prev_kp["positions_wrt_robot"].astype(np.float32),
                next_x3d_rob=next_kp["positions_wrt_robot"].astype(np.float32),
            )
        pair = remap_seq_frame(pair, self.cfg.train.seq_frame)
        prev_kp = load_seq_keypoints(
            pair.prev_data_path, self.robot_name, self.keypoint_names, self.camera_K
        )
        next_kp = load_seq_keypoints(
            pair.next_data_path, self.robot_name, self.keypoint_names, self.camera_K
        )
        return RawSample(
            prev_img=load_image(pair.prev_img_path),
            next_img=load_image(pair.next_img_path),
            prev_projs=prev_kp["projections"].astype(np.float32),
            next_projs=next_kp["projections"].astype(np.float32),
            prev_x3d_rob=prev_kp["positions_wrt_robot"].astype(np.float32),
            next_x3d_rob=next_kp["positions_wrt_robot"].astype(np.float32),
        )

    def _collate(self, samples: List[RawSample]) -> RawSample:
        return RawSample(*(np.stack([getattr(s, f) for s in samples]) for f in RawSample._fields))

    def epoch(self, epoch_idx: int) -> Iterator[RawSample]:
        """Yield collated batches in deterministic order. Sample loading
        (PNG decode + JSON parse) fans out over a `num_workers` thread pool
        while a coordinator keeps a 2-batch prefetch window in flight; the
        consumer sees identical batches regardless of num_workers."""
        order = np.arange(len(self.pairs))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch_idx).shuffle(order)

        n_batches = len(self)
        batch_indices = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]

        q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()

        def put(item) -> bool:
            # Bounded put that stays responsive to the consumer going away
            # (a bare q.put would park forever on the full queue and leak
            # the thread + pinned batches on early `break`).
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def coordinator():
            # A load failure must surface in the consumer, not silently end
            # the epoch: ship the exception through the queue.
            try:
                if self.num_workers <= 1:
                    for idxs in batch_indices:
                        if not put(self._collate(
                            [self._load_one(self.pairs[i]) for i in idxs]
                        )):
                            return
                    return
                from collections import deque
                from concurrent.futures import ThreadPoolExecutor

                in_flight = 2  # batches of sample futures beyond the queue
                with ThreadPoolExecutor(self.num_workers) as ex:
                    pending: deque = deque()
                    for idxs in batch_indices:
                        if stop.is_set():
                            return
                        pending.append(
                            [ex.submit(self._load_one, self.pairs[i]) for i in idxs]
                        )
                        if len(pending) > in_flight:
                            if not put(self._collate(
                                [f.result() for f in pending.popleft()]
                            )):
                                return
                    while pending:
                        if not put(self._collate(
                            [f.result() for f in pending.popleft()]
                        )):
                            return
            except BaseException as e:  # noqa: BLE001 - re-raised in consumer
                put(e)
            finally:
                put(None)

        t = threading.Thread(target=coordinator, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()


class TripleBatchLoader(SeqBatchLoader):
    """Three-frame batches (RawSampleThree) for PlanA_three training
    (ref CenterTrackThreeDataset, datasets.py:215-440). Reuses the pair
    loader's epoch machinery; only the per-sample load and collate change."""

    def _load_one(self, triple):
        from sgtapose_tpu.data.pipeline import RawSampleThree

        kp = lambda path: load_seq_keypoints(
            path, self.robot_name, self.keypoint_names, self.camera_K
        )
        ppre_kp = kp(triple.ppre_data_path)
        pre_kp = kp(triple.pre_data_path)
        next_kp = kp(triple.next_data_path)
        return RawSampleThree(
            ppre_img=load_image(triple.ppre_img_path),
            pre_img=load_image(triple.pre_img_path),
            next_img=load_image(triple.next_img_path),
            ppre_projs=ppre_kp["projections"].astype(np.float32),
            pre_projs=pre_kp["projections"].astype(np.float32),
            next_projs=next_kp["projections"].astype(np.float32),
            ppre_x3d_rob=ppre_kp["positions_wrt_robot"].astype(np.float32),
            pre_x3d_rob=pre_kp["positions_wrt_robot"].astype(np.float32),
            next_x3d_rob=next_kp["positions_wrt_robot"].astype(np.float32),
        )

    def _collate(self, samples):
        from sgtapose_tpu.data.pipeline import RawSampleThree

        return RawSampleThree(
            *(np.stack([getattr(s, f) for s in samples])
              for f in RawSampleThree._fields)
        )
