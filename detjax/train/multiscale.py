"""Multi-scale train+eval (benchmark config 4; SURVEY.md §5.7).

The reference achieves multi-scale FPN training through variable-size
batches (min-608/max-1024 resize + collate-to-max), which on TPU would
retrace/recompile on every new shape. TPU-native replacement: a FIXED set
of canvas resolutions, each with its own precompiled train step (anchors
are per-resolution trace-time constants), cycled deterministically. One
``TrainState`` is shared — detector params are resolution-independent —
so N resolutions cost N compiles once, then zero retraces forever.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Sequence, Tuple

import numpy as np

from detjax.config import Config
from detjax.train.step import TrainState, make_train_step


def scale_configs(cfg: Config, scales: Sequence[Tuple[int, int]]):
    """One Config per resolution (same arch/train hyperparams)."""
    return tuple(
        dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, image_size=tuple(hw)))
        for hw in scales
    )


def make_multiscale_train_step(cfg: Config,
                               scales: Sequence[Tuple[int, int]]):
    """Returns ``step(state, batch)`` that dispatches on the batch's static
    image shape to the matching precompiled per-resolution step."""
    steps: Dict[Tuple[int, int], object] = {
        tuple(c.model.image_size): make_train_step(c)
        for c in scale_configs(cfg, scales)
    }

    def step(state: TrainState, batch):
        hw = tuple(int(s) for s in np.shape(batch["images"])[1:3])
        if hw not in steps:
            raise KeyError(f"batch resolution {hw} not in compiled set "
                           f"{sorted(steps)}")
        return steps[hw](state, batch)

    return step


class MultiScaleIterator:
    """Cycles a fixed resolution schedule over per-resolution iterators.

    Deterministic round-robin (seeded shuffle of the schedule per cycle) so
    every resolution sees the same data distribution; each underlying
    iterator produces fixed-shape batches for its resolution.
    """

    def __init__(self, dataset, cfg: Config,
                 scales: Sequence[Tuple[int, int]], seed: int = 0):
        from detjax.data.pipeline import make_train_iterator

        self.iters = [
            iter(make_train_iterator(dataset, c))
            for c in scale_configs(cfg, scales)
        ]
        self.scales = [tuple(s) for s in scales]
        self.seed = seed

    def __iter__(self) -> Iterator[dict]:
        step = 0
        n = len(self.iters)
        rng = np.random.default_rng(self.seed)
        order = np.arange(n)
        while True:
            if step % n == 0:
                rng.shuffle(order)
            yield next(self.iters[order[step % n]])
            step += 1
