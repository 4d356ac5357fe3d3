"""Asynchronous checkpoint writing.

The reference saves checkpoints synchronously with torch.save
(reference scripts/train.py:136-157); on this framework's target
topology the same synchronous pattern costs ~6-9 s per epoch — a
device->host transfer of the full parameter/optimizer pytree plus a
~90 MB msgpack encode+write on a 1-vCPU host — which measured as ~17
minutes of the 100-epoch TED-scale recipe (RESULTS.md round 4).

Design (pure IO change — zero effect on training math):

1. The caller takes an on-device SNAPSHOT of the state pytree: one
   jitted ``jnp.copy`` over the whole tree (a single dispatch; ``copy``
   defeats jax's input-output forwarding so the snapshot buffers are
   genuinely distinct).  This matters because every train step donates
   its state buffers — a background thread must never read buffers the
   next step is about to alias.
2. A single worker thread dequeues (snapshot, host_fields, filename),
   runs ``jax.device_get`` (overlapping the transfer with the next
   epoch's compute), encodes, and writes ATOMICALLY (tmp + os.replace,
   so ``*_checkpoint_last.bin`` can never be half-written even if the
   process dies mid-save).
3. FIFO with maxsize 1: at most one queued save behind the in-flight
   one; ``submit`` blocks when the writer falls behind (epochs are
   ~15 s, saves ~6 s, so in practice it never blocks).

Worker exceptions are re-raised on the next submit()/drain() so a
failing disk aborts the run rather than silently dropping checkpoints.
"""

import logging
import queue
import threading

import jax
import jax.numpy as jnp


@jax.jit
def snapshot_device_tree(tree):
    """One-dispatch on-device copy of a pytree.

    ``jnp.copy`` (not identity) so XLA materializes fresh buffers:
    jitted identity would forward the input buffers through, and those
    are donated to the next train step."""
    return jax.tree.map(jnp.copy, tree)


class AsyncCheckpointWriter:
    """Single background thread that device_gets + encodes + writes."""

    def __init__(self):
        self._q = queue.Queue(maxsize=1)
        self._thread = None
        self._error = None
        self._lock = threading.Lock()

    def _ensure_thread(self):
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(
                target=self._run, name="ckpt-writer", daemon=True)
            self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                save_fn, device_tree, host_state, filename = item
                state = dict(host_state)
                # device->host transfer happens HERE, overlapped with
                # whatever the main thread is dispatching
                state.update(jax.device_get(device_tree))
                save_fn(state, filename)
            except BaseException as e:  # propagate via next submit/drain
                with self._lock:
                    self._error = e
                logging.error("async checkpoint write failed: %s", e)
            finally:
                self._q.task_done()

    def _raise_pending(self):
        with self._lock:
            err, self._error = self._error, None
        if err is not None:
            raise RuntimeError("checkpoint writer failed") from err

    def submit(self, save_fn, device_tree, host_state, filename):
        """Queue a save.  ``device_tree`` must be snapshot (non-donated)
        device buffers; ``host_state`` holds the already-host-side
        fields (args, epoch, vocabularies, pose_dim)."""
        self._raise_pending()
        self._ensure_thread()
        self._q.put((save_fn, device_tree, host_state, filename))

    def drain(self):
        """Block until every queued save has hit disk."""
        if self._thread is not None:
            self._q.join()
        self._raise_pending()

    def close(self):
        self.drain()
        if self._thread is not None and self._thread.is_alive():
            self._q.put(None)
            self._thread.join(timeout=60)
            self._thread = None
