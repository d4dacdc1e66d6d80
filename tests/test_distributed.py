"""True multi-process distributed tests (2 local processes, CPU backend)."""
import pytest

from .dist_utils import run_distributed


@pytest.mark.slow
class TestMultiProcess:
    def test_cross_process_psum(self):
        body = """
import jax, jax.numpy as jnp, json
assert jax.process_count() == 2
rank = jax.process_index()
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
import numpy as np
mesh = Mesh(np.array(jax.devices()), ("data",))
def f(x):
    return jax.lax.psum(x, "data")
g = shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P())
local = jnp.asarray([float(rank + 1)])  # rank0: 1, rank1: 2
import jax.experimental.multihost_utils as mh
garr = mh.host_local_array_to_global_array(local, mesh, P("data"))
out = jax.jit(g)(garr)
val = float(mh.process_allgather(jnp.asarray([0.0]))[0][0] + out.addressable_data(0)[0])
print(json.dumps({"rank": rank, "psum": float(out.addressable_data(0)[0])}))
"""
        outs = run_distributed(body, num_processes=2)
        # psum over both processes' values: 1 + 2 = 3
        assert all(o["psum"] == 3.0 for o in outs)

    def test_cross_process_codebook_sync(self):
        """EMA codebook psum across real process boundaries."""
        body = """
import jax, jax.numpy as jnp, json, numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
import jax.experimental.multihost_utils as mh
import sys; sys.path.insert(0, "/root/repo")
from generativemodels_tpu.networks.layers import EMAQuantizer

rank = jax.process_index()
mesh = Mesh(np.array(jax.devices()), ("data",))
q = EMAQuantizer(spatial_dims=2, num_embeddings=4, embedding_dim=2, decay=0.5,
                 ddp_sync=True, axis_name="data")
x_local = jnp.ones((1, 2, 2, 2)) * (rank + 1)
variables = q.init(jax.random.PRNGKey(0), x_local)

def update(v, x):
    (_, _, _), mut = q.apply(v, x, train=True, mutable=["codebook"])
    return mut["codebook"]["ema_cluster_size"]

x_global = mh.host_local_array_to_global_array(x_local, mesh, P("data"))
fn = shard_map(update, mesh=mesh, in_specs=(P(), P("data")), out_specs=P())
out = jax.jit(fn)(variables, x_global)
print(json.dumps({"rank": rank, "total": float(jnp.sum(out.addressable_data(0)))}))
"""
        outs = run_distributed(body, num_processes=2)
        # 8 latent vectors total (4 per process), decay 0.5 -> sum = 8 * 0.5
        assert all(abs(o["total"] - 4.0) < 1e-5 for o in outs)
