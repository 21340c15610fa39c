"""Graph partitioning for the staged pipeline.

The reference delegates to pymetis k-way partitioning (gnnpe.py:62-66) and
writes ``membership.txt`` in degree-ascending node order (gnnpe.py:68-75);
the engine reads it back and both (a) assigns paths/vertices to partitions
and (b) fixes the path-enumeration order (GNN-PE/src/main.cpp:77-96).

Membership only shards work — the candidate-set union and final answer
count are invariant to it (SURVEY.md §3.3) — so any balanced partitioner
is behavior-preserving.  We provide:

  * ``degree_sorted_nodes``: the enumeration-order contract (stable sort
    by degree ascending, mirroring python ``sorted`` in gnnpe.py:68-69).
  * ``partition_graph``: balanced edge-locality partitioning via BFS
    region growing (a METIS stand-in with no native dependency), plus
    "round_robin" and "block" strategies.  For the distributed layer the
    same membership shards paths/vertices across chips.
"""

from __future__ import annotations

import numpy as np

from gnnpe_tpu.graph.csr import CSRGraph


def degree_sorted_nodes(graph: CSRGraph) -> np.ndarray:
    """Vertices sorted by degree ascending, ties by id (stable) —
    the reference's fixed enumeration order (gnnpe.py:68-69)."""
    return np.argsort(graph.degrees, kind="stable").astype(np.int32)


def partition_graph(graph: CSRGraph, num_parts: int,
                    strategy: str = "bfs") -> np.ndarray:
    """Return int32[V] membership in [0, num_parts).

    strategy:
      "bfs"         — balanced BFS region growing (edge-locality aware).
      "round_robin" — node i → i % num_parts.
      "block"       — contiguous id blocks.
    """
    v = graph.num_vertices
    if num_parts <= 1:
        return np.zeros(v, dtype=np.int32)
    if strategy == "round_robin":
        return (np.arange(v) % num_parts).astype(np.int32)
    if strategy == "block":
        return np.minimum(np.arange(v) * num_parts // max(v, 1),
                          num_parts - 1).astype(np.int32)
    if strategy != "bfs":
        raise ValueError(f"unknown partition strategy: {strategy}")

    target = (v + num_parts - 1) // num_parts
    membership = np.full(v, -1, dtype=np.int32)
    # Seed each region at the highest-degree unassigned vertex and grow
    # breadth-first until the size target, like greedy graph growing.
    order = np.argsort(-graph.degrees, kind="stable")
    assigned = 0
    for part in range(num_parts):
        if assigned >= v:
            break
        seed = next((int(s) for s in order if membership[s] < 0), None)
        if seed is None:
            break
        frontier = [seed]
        membership[seed] = part
        size = 1
        assigned += 1
        while frontier and size < target:
            nxt = []
            for u in frontier:
                for w in graph.vertex_neighbors(u):
                    w = int(w)
                    if membership[w] < 0:
                        membership[w] = part
                        nxt.append(w)
                        size += 1
                        assigned += 1
                        if size >= target:
                            break
                if size >= target:
                    break
            frontier = nxt
    # Any leftover isolated vertices: spread round-robin over the
    # least-loaded parts.
    leftovers = np.nonzero(membership < 0)[0]
    if len(leftovers):
        counts = np.bincount(membership[membership >= 0],
                             minlength=num_parts)
        for u in leftovers:
            p = int(np.argmin(counts))
            membership[u] = p
            counts[p] += 1
    return membership


def edge_cut(graph: CSRGraph, membership: np.ndarray) -> int:
    """Number of cross-partition undirected edges (partition quality)."""
    src, dst = graph.coo()
    cut = membership[src] != membership[dst]
    return int(cut.sum()) // 2


def write_membership(path: str, graph: CSRGraph,
                     membership: np.ndarray) -> None:
    """Emit the reference ``membership.txt`` wire format: one
    ``node part`` line per vertex, in degree-ascending order
    (gnnpe.py:72-75)."""
    order = degree_sorted_nodes(graph)
    with open(path, "w") as f:
        for node in order:
            f.write(f"{node} {membership[node]}\n")


def read_membership(path: str, num_vertices: int):
    """Parse ``membership.txt`` → (sorted_nodes, membership), mirroring
    GNN-PE/src/main.cpp:77-85."""
    sorted_nodes = np.zeros(num_vertices, dtype=np.int32)
    membership = np.zeros(num_vertices, dtype=np.int32)
    with open(path) as f:
        for i, line in enumerate(f):
            parts = line.split()
            if not parts:
                continue
            node, part = int(parts[0]), int(parts[1])
            sorted_nodes[i] = node
            membership[node] = part
    return sorted_nodes, membership
