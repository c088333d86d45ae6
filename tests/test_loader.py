"""DataLoader regression tests: multi-worker correctness, backpressure-
bounded submission, prompt interpreter exit, and error propagation.

The reference keeps torch's DataLoader (basicsr/data/__init__.py:40-93);
ours is a thread-pool loader (data/loader.py), so its pipeline semantics
need their own coverage."""
import subprocess
import sys
import textwrap
import time

import numpy as np
import pytest

from codeformer_tpu.data.loader import DataLoader, EnlargedSampler


class _ArrayDataset:
    """Synthetic dataset: item i is a (2, 2) array filled with i."""

    def __init__(self, n=8, delay=0.0, raise_at=None):
        self.n = n
        self.delay = delay
        self.raise_at = raise_at

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        if self.raise_at is not None and idx == self.raise_at:
            raise RuntimeError(f'bad item {idx}')
        if self.delay:
            time.sleep(self.delay)
        return {'x': np.full((2, 2), idx, np.float32), 'idx': idx}


def test_multiworker_batches_match_sampler_order():
    ds = _ArrayDataset(8)
    sampler = EnlargedSampler(8, ratio=4)
    loader = DataLoader(ds, batch_size=4, sampler=sampler, num_workers=3,
                        prefetch=2, loop=False)
    want = list(EnlargedSampler(8, ratio=4))
    got = []
    for batch in loader:
        assert batch['x'].shape == (4, 2, 2)
        got.extend(int(v) for v in batch['idx'])
    assert got == want[:len(got)] and len(got) == len(want)


def test_worker_error_propagates_to_consumer():
    ds = _ArrayDataset(8, raise_at=5)
    loader = DataLoader(ds, batch_size=4, num_workers=2, prefetch=2,
                        loop=False)
    with pytest.raises(RuntimeError, match='bad item 5'):
        for _ in loader:
            pass


def test_bounded_inflight_backpressure():
    """The pool must not race ahead of the consumer: with a huge virtual
    epoch, the items computed may exceed the consumed ones only by the
    prefetch window (queue + in-flight batches), never by the epoch."""
    import threading
    produced = []
    lock = threading.Lock()

    class Counting(_ArrayDataset):
        def __getitem__(self, idx):
            with lock:
                produced.append(idx)
            return super().__getitem__(idx)

    ds = Counting(4)
    batch, prefetch = 2, 3
    loader = DataLoader(ds, batch_size=batch, num_workers=2,
                        prefetch=prefetch,
                        sampler=EnlargedSampler(4, ratio=500), loop=False)
    it = iter(loader)
    for _ in range(3):
        next(it)
    time.sleep(0.5)  # give an unbounded pool time to run away
    # consumed 3 batches; bound = consumed + queue + in-flight + 1 spare
    bound = (3 + prefetch + (prefetch + 1) + 1) * batch
    assert len(produced) <= bound, \
        f'pool ran {len(produced)} items ahead (bound {bound})'
    del it


def test_abandoned_iterator_exits_promptly():
    """Interpreter exit must not stall on leftover queued epoch work
    (shutdown cancels pending futures). Pre-fix, the whole virtual epoch
    was submitted eagerly and exit joined workers through all of it."""
    script = textwrap.dedent("""
        import sys, time
        import numpy as np
        sys.path.insert(0, %r)
        from codeformer_tpu.data.loader import DataLoader, EnlargedSampler

        class DS:
            def __len__(self):
                return 4
            def __getitem__(self, idx):
                time.sleep(0.01)
                return {'x': np.zeros((2,), np.float32)}

        loader = DataLoader(DS(), batch_size=2, num_workers=2, prefetch=2,
                            sampler=EnlargedSampler(4, ratio=5000),
                            loop=True)
        it = iter(loader)
        for _ in range(3):
            next(it)
        print('consumed', flush=True)
    """) % (str(__import__('pathlib').Path(__file__).parents[1]),)
    t0 = time.perf_counter()
    out = subprocess.run([sys.executable, '-c', script], timeout=60,
                         capture_output=True, text=True)
    wall = time.perf_counter() - t0
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'consumed' in out.stdout
    # 10k queued 10ms items would stall exit ~100s unfixed; allow slack
    # for interpreter startup on a loaded 1-CPU box
    assert wall < 30, f'exit took {wall:.1f}s — queued work not cancelled'
