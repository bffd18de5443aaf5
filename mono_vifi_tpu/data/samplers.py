"""Stateful, resumable samplers (reference datasets/__init__.py:10-85).

Permutations are seed+epoch-keyed and identical to the reference's
torch.randperm stream (we generate them with torch.Generator when torch is
available so resume parity with reference runs holds bit-for-bit; numpy
fallback otherwise). `start_iter` skips already-consumed samples after a
mid-epoch checkpoint resume.
"""

from __future__ import annotations

import numpy as np


def _randperm(n: int, seed: int) -> np.ndarray:
    try:
        import torch

        g = torch.Generator()
        g.manual_seed(seed)
        return torch.randperm(n, generator=g).numpy()
    except ImportError:  # pragma: no cover
        rng = np.random.default_rng(seed)
        return rng.permutation(n)


class StatefulSampler:
    """Single-process sampler: seed+epoch permutation, start_iter skip."""

    def __init__(self, num_samples: int, seed: int = 0):
        self.num_samples = num_samples
        self.seed = seed
        self.epoch = 0
        self.start_iter = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def set_start_iter(self, start_iter: int):
        self.start_iter = start_iter

    def __len__(self):
        return self.num_samples

    def __iter__(self):
        indices = _randperm(self.num_samples, self.seed + self.epoch)
        return iter(indices[self.start_iter :].tolist())


class StatefulDistributedSampler(StatefulSampler):
    """Strided rank sharding indices[rank::num_replicas] over the common
    truncation (reference datasets/__init__.py:64-77)."""

    def __init__(self, num_samples: int, seed: int = 0, rank: int = 0, num_replicas: int = 1):
        super().__init__(num_samples, seed)
        self.rank = rank
        self.num_replicas = num_replicas
        self.total_size = num_samples - (num_samples % num_replicas)

    def __len__(self):
        return self.total_size // self.num_replicas

    def __iter__(self):
        indices = _randperm(self.num_samples, self.seed + self.epoch)
        indices = indices[: self.total_size]
        indices = indices[self.rank : self.total_size : self.num_replicas]
        return iter(indices[self.start_iter :].tolist())
