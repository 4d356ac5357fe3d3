"""Parameter sharding rules: optional tensor parallelism for large tables.

The reference parallelizes with DataParallel only (SURVEY.md C32), and
pure data parallelism is this framework's default.  The one genuinely
large parameter in the model family is the fastText word-embedding table
(~30k x 300 on full TED vocab); on a 2-D ('data','model') mesh these
rules shard such tables over the 'model' axis (row-sharded vocab).  XLA
inserts the all-gather of the selected rows on the ICI; everything else
stays replicated.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def get_mesh_2d(n_data, n_model, devices=None):
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def param_spec(path, value, min_rows=1024):
    """PartitionSpec for one parameter.  Embedding-style tables (first dim
    >= min_rows, 2-D) shard rows over 'model'; everything else replicates."""
    name = path[-1] if path else ""
    if (getattr(value, "ndim", 0) == 2 and value.shape[0] >= min_rows
            and ("embedding" in str(name))):
        return P(MODEL_AXIS, None)
    return P()


def shard_state(tree, mesh, min_rows=1024):
    """device_put a state pytree with TP rules applied (params under any
    'params' subtree; other leaves replicated)."""
    def place(path, value):
        keys = tuple(getattr(p, "key", getattr(p, "idx", p)) for p in path)
        spec = param_spec(keys, value, min_rows)
        # non-divisible tables stay replicated
        if spec != P() and value.shape[0] % mesh.shape[MODEL_AXIS]:
            spec = P()
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)


def shard_batch_2d(batch, mesh):
    """Batch arrays: axis 0 over 'data', replicated over 'model'."""
    s = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
