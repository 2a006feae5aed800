"""Thread-safety of the native association store.

The store is hit concurrently from the tracker finalize thread (reads:
covis_counts, num_obs_bulk), the mapper (bulk writes), and the loop
closer (erase/replace). Before the internal reader-writer lock a
concurrent rehash/reallocation under a reader dereferenced a dangling
node — observed as a segfault in a real-chip bench run (mapcore.so,
error 4). This hammers the exact read/write mix from worker threads;
a regression shows up as an interpreter crash, which pytest reports as
a hard failure of this file."""
import threading

import numpy as np

from stella_vslam_tpu.native.assoc_store import AssocStore


def test_concurrent_read_write_hammer():
    store = AssocStore()
    stop = threading.Event()
    errors = []

    def writer(seed):
        rng = np.random.default_rng(seed)
        while not stop.is_set():
            n = 256
            lm = rng.integers(0, 4000, n)
            kf = rng.integers(0, 64, n)
            idx = rng.integers(0, 600, n, dtype=np.int32)
            try:
                store.add_bulk(lm, kf, idx)
                for l in rng.integers(0, 4000, 64):
                    store.erase(int(l), int(rng.integers(0, 64)))
                for l in rng.integers(0, 4000, 16):
                    store.erase_landmark(int(l))
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    def reader(seed):
        rng = np.random.default_rng(seed)
        ids = np.arange(4000)
        while not stop.is_set():
            try:
                store.num_obs_bulk(rng.choice(ids, 300))
                store.covis_counts(rng.choice(ids, 300), -1)
                store.get_obs(int(rng.integers(0, 4000)))
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(2)]
    threads += [threading.Thread(target=reader, args=(10 + i,))
                for i in range(2)]
    for t in threads:
        t.start()
    stop.wait(4.0)
    stop.set()
    for t in threads:
        t.join(10.0)
    assert not errors, errors
    # store still coherent after the storm
    counts = store.num_obs_bulk(np.arange(4000))
    assert counts.shape == (4000,)
