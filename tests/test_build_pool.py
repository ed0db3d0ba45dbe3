"""OrderedBuildPool — the semiasync_queue equivalent (SURVEY §2.8 item 1):
prepare() may run on worker threads, commit() must run on the caller
thread strictly in submission order, so output is deterministic
regardless of thread count."""

import random
import threading
import time

from ds2i_tpu.parallel import OrderedBuildPool


def _run(workers, n=200, work_per_batch=64):
    pool = OrderedBuildPool(workers=workers, work_per_batch=work_per_batch)
    committed = []
    commit_threads = set()

    def make(i):
        def prepare():
            time.sleep(random.Random(i).random() / 2000)  # jitter worker timing
            return i * i

        def commit(result):
            commit_threads.add(threading.get_ident())
            committed.append((i, result))

        return prepare, commit

    for i in range(n):
        p, c = make(i)
        pool.add_job(p, c, expected_work=random.Random(n + i).randint(1, 40))
    pool.complete()
    return committed, commit_threads


def test_ordered_commit_across_thread_counts():
    expected = [(i, i * i) for i in range(200)]
    for workers in (1, 2, 8):
        committed, commit_threads = _run(workers)
        assert committed == expected, f"workers={workers}: commit order broken"
        # commits always happen on the caller thread
        assert commit_threads == {threading.get_ident()}


def test_batching_bounds_inflight():
    """Batches flush when accumulated expected_work crosses the
    threshold (not only at complete()), and in-flight batches stay
    bounded by the worker count."""
    pool = OrderedBuildPool(workers=2, work_per_batch=10)
    flushes = []
    orig = pool._flush_batch

    def spy():
        flushes.append(len(pool._batch))
        orig()

    pool._flush_batch = spy
    seen = []
    max_pending = 0
    for i in range(20):
        pool.add_job(lambda i=i: i, lambda r: seen.append(r), expected_work=6)
        max_pending = max(max_pending, len(pool._pending))
    mid_flushes = len([f for f in flushes if f])
    pool.complete()
    assert seen == list(range(20))
    # work 6+6 >= 10 flushes every 2 jobs: 10 mid-stream flushes of 2 jobs
    assert mid_flushes == 10 and all(f == 2 for f in flushes if f)
    # FIFO bound: never more than workers batches in flight during adds
    assert max_pending <= pool.workers
