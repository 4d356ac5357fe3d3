"""Host-CPU platform alongside the accelerator, for eager init work.

Flax module init and optax optimizer init run EAGERLY (no jit): every
tiny op is a separate device dispatch.  On a tunneled accelerator with
~100 ms roundtrips that turns model construction into minutes — the
TED-scale startup measured ~2 min of pure init dispatches (round 4).
The fix is to run init-time eager work on the LOCAL host CPU and let the
existing replicate/shard step upload the finished state once.

Some environments pin ``jax_platforms`` to the accelerator platform
only (which removes the cpu backend entirely).  ``enable_host_cpu``
re-adds cpu as a SECONDARY platform — the accelerator stays first, so
``jax.devices()`` and default placement are unchanged — and must be
called BEFORE any JAX backend initialization.
"""

import contextlib
import logging


def enable_host_cpu():
    """Ensure the cpu platform will be available alongside the default.

    Call before backend init.  Returns True when cpu will be available.
    """
    import jax

    try:
        cur = jax.config.jax_platforms
    except AttributeError:
        return True  # ancient config; normal discovery includes cpu
    if not cur:
        return True  # automatic discovery: cpu is always registered
    plats = [p.strip() for p in cur.split(",") if p.strip()]
    if "cpu" in plats:
        return True
    try:
        jax.config.update("jax_platforms", ",".join(plats + ["cpu"]))
        return True
    except Exception as e:  # backends already up: keep running without
        logging.info("host cpu platform unavailable: %s", e)
        return False


def host_cpu_device():
    """The local cpu device, or None when the platform isn't exposed."""
    import jax

    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


def host_init_context():
    """Context manager placing eager ops on the host cpu (no-op when the
    cpu platform is unavailable).  Arrays created inside are committed
    to cpu — callers must device_put/replicate state onto the real mesh
    afterwards (train/loops.py does, for all five families)."""
    import jax

    dev = host_cpu_device()
    if dev is None:
        return contextlib.nullcontext()
    return jax.default_device(dev)
