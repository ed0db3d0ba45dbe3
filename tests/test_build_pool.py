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
    """Large expected_work flushes batches early; tiny work coalesces."""
    pool = OrderedBuildPool(workers=2, work_per_batch=10)
    seen = []
    for i in range(20):
        pool.add_job(lambda i=i: i, lambda r: seen.append(r), expected_work=6)
    pool.complete()
    assert seen == list(range(20))
