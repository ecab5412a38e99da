"""PyTorch loader: stream a chain into an IterableDataset.

Parity: /root/reference/src/datachain/lib/pytorch.py:40-200 and
DataChain.to_pytorch (/root/reference/src/datachain/lib/dc/datachain.py:
1554-1600): iterable dataset with multi-worker rank/world sharding.

Import-gated — torch is not installed in this container; the fallback
PlainIterableDataset has the same iteration contract so the sharding logic is
testable without torch.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Callable, Iterator, Optional

if TYPE_CHECKING:
    from ..chain import DataChain

try:
    from torch.utils.data import IterableDataset, get_worker_info

    TORCH = True
except ImportError:  # pragma: no cover
    TORCH = False
    get_worker_info = None

    class IterableDataset:  # type: ignore[no-redef]
        """Minimal stand-in with the torch IterableDataset contract."""


class ChainDataset(IterableDataset):
    """Streams rows from a materialized chain snapshot.

    The chain is persisted to parquet once (so iteration does not re-run the
    plan per epoch), then each worker reads its shard:
    shard index = rank * num_workers + worker_id over row-group-aligned
    splits (parity: rank/world split, lib/pytorch.py:40-200).
    """

    def __init__(
        self,
        paths: list[str],
        columns: list[str],
        transform: Optional[Callable[[dict], Any]] = None,
        num_samples: int = 0,
        rank: int = 0,
        world_size: int = 1,
    ):
        self.paths = paths
        self.columns = columns
        self.transform = transform
        self.num_samples = num_samples
        self.rank = rank
        self.world_size = world_size

    def _shard(self) -> tuple[int, int]:
        worker_id, num_workers = 0, 1
        if TORCH and get_worker_info is not None:
            info = get_worker_info()
            if info is not None:
                worker_id, num_workers = info.id, info.num_workers
        return (
            self.rank * num_workers + worker_id,
            self.world_size * num_workers,
        )

    def __iter__(self) -> Iterator[Any]:
        import pyarrow.dataset as pads

        index, total = self._shard()
        ds = pads.dataset(self.paths, format="parquet")
        produced = 0
        for i, fragment in enumerate(ds.get_fragments()):
            if i % total != index:
                continue
            for batch in fragment.to_table(columns=self.columns).to_batches():
                for row in batch.to_pylist():
                    if self.num_samples and produced >= self.num_samples:
                        return
                    produced += 1
                    yield self.transform(row) if self.transform else row


def chain_to_pytorch(
    chain: "DataChain",
    transform: Optional[Callable[[dict], Any]] = None,
    num_samples: int = 0,
    rank: int = 0,
    world_size: int = 1,
) -> ChainDataset:
    """Materialize the chain and wrap it in a ChainDataset."""
    import glob
    import os
    import tempfile

    out = os.path.join(tempfile.mkdtemp(prefix="dc_torch_"), "data")
    chain.df.write.mode("overwrite").parquet(out)
    paths = sorted(glob.glob(os.path.join(out, "*.parquet")))
    return ChainDataset(
        paths,
        columns=chain.df.columns,
        transform=transform,
        num_samples=num_samples,
        rank=rank,
        world_size=world_size,
    )
