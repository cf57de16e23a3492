"""
Device mesh construction and sharding helpers.

State vectors are row-partitioned over a 1-D mesh axis named 'd': the high
bits of the state index select the device, exactly the bit-slicing trick the
reference uses to map state indices to MPI ranks
(reference: bpetsc_template_2.c:781-783). Each Pauli mask whose support
touches those high bits induces a pairwise device permutation
(dst = me ^ mask_high), implemented with lax.ppermute over ICI.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = 'd'


def make_mesh(mesh_shape=None, devices=None):
    """Build the 1-D state-sharding mesh over all devices (or a given list)."""
    if devices is None:
        devices = jax.devices()
    if mesh_shape is not None:
        n = int(np.prod(mesh_shape))
        devices = devices[:n]
    return Mesh(np.array(devices), (AXIS,))


def n_devices(mesh=None):
    if mesh is None:
        from .. import config
        mesh = config.mesh
    return mesh.devices.size


def shard_spec(mesh, dim):
    """Sharding for a state vector stored as a (2, dim) re/im stack.

    Shards the state axis when it divides evenly over the mesh (always true
    for Full/Parity power-of-two dimensions on power-of-two meshes);
    otherwise replicates.
    """
    nd = mesh.devices.size
    if nd > 1 and dim % nd == 0:
        return NamedSharding(mesh, P(None, AXIS))
    return NamedSharding(mesh, P(None, None))


def row_shard_spec(mesh, dim):
    """Sharding for a 1-D array of length ``dim`` along the state axis."""
    nd = mesh.devices.size
    if nd > 1 and dim % nd == 0:
        return NamedSharding(mesh, P(AXIS))
    return NamedSharding(mesh, P(None))


def replicated(mesh):
    return NamedSharding(mesh, P())


def device_put_state(data, mesh, dim):
    """Place a (2, dim) array on the mesh with the canonical sharding."""
    return jax.device_put(data, shard_spec(mesh, dim))
