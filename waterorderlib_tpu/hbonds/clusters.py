"""Connected components of contact/H-bond graphs.

Replaces the recursive Fortran depth-first search `depthFirstSort`
(/root/reference/fortran/sortlib.f90:26-72) and its Python driver
`getClusters` (/root/reference/structureLibs/orderParam_lib.py:123-156).
Recursion does not map to XLA; instead we use iterative min-label
propagation over the adjacency matrix, which converges in at most
graph-diameter (<= n) sweeps — each sweep is one masked min-reduction, a
pure VPU workload that also vmaps over frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def connected_components(adj: jnp.ndarray) -> jnp.ndarray:
    """Component label per vertex (the smallest vertex index in the
    component). adj: (n, n) boolean adjacency; diagonal ignored.
    """
    n = adj.shape[0]
    adj = adj | jnp.eye(n, dtype=bool)
    labels0 = jnp.arange(n, dtype=jnp.int32)

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        big = jnp.int32(n)
        neigh = jnp.where(adj, labels[None, :], big)
        new = jnp.minimum(labels, jnp.min(neigh, axis=1))
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
    return labels


@jax.jit
def cluster_sizes(adj: jnp.ndarray) -> jnp.ndarray:
    """Size of the cluster containing each root vertex, zero elsewhere.

    Returns (n,) where entry r = size of the component whose smallest
    member is r (and 0 for non-root vertices). The nonzero entries are the
    cluster-size list that `getClusters` produces (isolated vertices count
    as size-1 clusters, matching orderParam_lib.py:150-152).
    """
    labels = connected_components(adj)
    n = adj.shape[0]
    return jnp.zeros(n, jnp.int32).at[labels].add(1)


def cluster_size_distribution(adj: jnp.ndarray, max_size: int | None = None) -> jnp.ndarray:
    """Histogram of cluster sizes: out[s] = number of clusters of size s
    (index 0 unused). Replaces the histogramming in getHBClusterStats
    (orderParam_lib.py:158-237)."""
    n = adj.shape[0]
    if max_size is None:
        max_size = n
    sizes = cluster_sizes(adj)
    valid = sizes > 0
    idx = jnp.where(valid, jnp.clip(sizes, 0, max_size), 0)
    return jnp.zeros(max_size + 1, jnp.int32).at[idx].add(valid.astype(jnp.int32))


def mean_cluster_size(adj: jnp.ndarray) -> jnp.ndarray:
    """Mean cluster size over all clusters in the graph."""
    sizes = cluster_sizes(adj)
    n_clusters = jnp.sum(sizes > 0)
    return jnp.sum(sizes) / jnp.maximum(n_clusters, 1)
