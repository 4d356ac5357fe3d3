"""Test configuration: run JAX on CPU with 8 virtual devices so the
data-parallel mesh paths are exercised without TPU hardware
(SURVEY.md §4 test plan (d)).

Note: the axon site hook pins JAX_PLATFORMS=axon at interpreter start, so
the env var alone is not enough — jax.config.update must be used before
any backend is initialized."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True)
def _reset_recurrent_globals():
    """Tests share one process; the train CLI sets process-global
    recurrent-op state (rnn dtype — bf16 is the DEFAULT since round 4 —
    scan unroll, gru impl).  Reset around every test so numeric pins
    (torch parity <=3e-4, path-equivalence) never see another test's
    numerics mode."""
    yield
    from gesture_generation_from_trimodal_context_tpu.ops import recurrent
    recurrent.set_rnn_dtype(None)
    recurrent.set_scan_unroll(1)
    recurrent.set_gru_impl("scan")
