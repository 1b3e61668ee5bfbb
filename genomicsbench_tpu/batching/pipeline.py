"""Load / process / output pipeline overlap.

The reference f5c driver overlaps three stages with pthreads: while batch
N is processed, batch N+1 is loaded and batch N-1's output is written
(meth_main.c:12-13, 478-615: pthread_processor / pthread_post_processor;
serial mode under IO_PROC_NO_INTERLEAVE).  Its --iop option additionally
forks multiple reader processes (f5c.c:101-244).

TPU equivalent: host threads prefetch input batches into a bounded queue
(overlapping file I/O and host->device transfer with device compute —
dispatch is async in JAX, so the device keeps a batch in flight while
the host prepares the next), and a writer thread drains results.

    for result in pipeline_map(load_iter, process_fn, output_fn,
                               prefetch=2, n_loaders=2):
        ...

Any stage exception is re-raised in the caller (abort-on-error, like the
reference's ERROR/exit macros)."""

from __future__ import annotations

import queue
import threading


_END = object()


def pipeline_map(inputs, process_fn, output_fn=None, *, prefetch: int = 2,
                 n_loaders: int = 1):
    """Run `process_fn` over `inputs` with loading and output overlapped.

    inputs: an iterable OR a list of zero-arg callables (the callables are
    executed by the loader pool — the --iop analog: n_loaders concurrent
    loaders).  process_fn(batch) runs on the caller thread (device
    dispatch).  output_fn(result), if given, runs on a writer thread.
    Yields results in input order.
    """
    in_q: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))
    err: list = []

    items = list(enumerate(inputs))

    def load_worker(worker_id):
        try:
            for idx, item in items:
                if idx % n_loaders != worker_id:
                    continue
                batch = item() if callable(item) else item
                in_q.put((idx, batch))
        except BaseException as e:  # propagate to caller
            err.append(e)
            in_q.put(_END)

    loaders = [
        threading.Thread(target=load_worker, args=(w,), daemon=True)
        for w in range(n_loaders)
    ]
    for t in loaders:
        t.start()

    out_q: queue.Queue = queue.Queue()
    writer = None
    if output_fn is not None:
        def write_worker():
            while True:
                item = out_q.get()
                if item is _END:
                    return
                try:
                    output_fn(item)
                except BaseException as e:
                    err.append(e)
                    return

        writer = threading.Thread(target=write_worker, daemon=True)
        writer.start()

    # Reorder buffer: loaders may interleave; emit in input order.
    pending: dict = {}
    results = []
    try:
        for want in range(len(items)):
            while want not in pending:
                if err:
                    raise err[0]
                got = in_q.get()
                if got is _END:
                    raise err[0] if err else RuntimeError("loader died")
                pending[got[0]] = got[1]
            batch = pending.pop(want)
            result = process_fn(batch)
            if output_fn is not None:
                out_q.put(result)
            results.append(result)
    finally:
        out_q.put(_END)
        if writer is not None:
            writer.join(timeout=60)
        if err:
            raise err[0]
    return results
