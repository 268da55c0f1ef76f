"""Exact neighborhood function over the CSR link graph — the exact
cousin of ANF/HyperANF (Palmer et al. 2002; Boldi-Rosa-Vigna 2011):
N(h) = # ordered pairs (u, v) with d(u, v) <= h, the curve behind the
effective-diameter statistic of every web-graph paper.

Superstep shape: each vertex carries a V-bit REACHABILITY BITSET
(packed uint64 words); one round ORs every neighbor's bitset into the
vertex (new_bits[v] = bits[v] | OR_{u~v} bits[u]), so after h rounds
bit u of row v says d(v, u) <= h.  The pull runs as one
``map_batches`` over the CSR blocks per round (touched destinations
only leave a task, the `algos/bfs.py` posture); the driver holds the
(V, ceil(V/64)) bitset plane and the per-round popcount totals.

Exact bitsets are O(V^2/8) state — the right tool at oracle scale
(verifiable bit-for-bit against an unrolled-BFS SQL oracle).  At
100 TB the SAME superstep runs with HyperLogLog registers instead of
exact bitsets (HyperANF: union-of-HLL is the OR of registers,
~64 bytes/vertex instead of V/8) — the swap changes only the payload
dtype and the merge op, which is why the exact version is the
documented scale path's test harness, not a dead end.

The reference has no reachability analytics (its loops are
community-detection games, `hedonic/__init__.py`); this extends the
BFS/diameter family (`algos/bfs.py`, `pipelines/linkgraph.py:
doc_diameter`) with the all-pairs distance distribution.
"""

from __future__ import annotations

import numpy as np

_POP8 = np.array([bin(i).count("1") for i in range(256)],
                 dtype=np.uint8)  # byte-popcount LUT (numpy<2 has no
#                                   bitwise_count)


def _popcount_total(bits: np.ndarray) -> int:
    return int(_POP8[bits.view(np.uint8)].sum(dtype=np.int64))


def neighborhood_function(g, *, rounds: int = 32,
                          return_ecc: bool = False):
    """(h, n_pairs) rows for h = 0..min(diameter, rounds): n_pairs =
    ordered pairs within distance h (self-pairs included at h = 0).
    The round cap MUST equal the SQL oracle's unroll/recursion cap
    (fixed-round parity rule); both saturate at the true diameter
    when it is below the cap.

    ``return_ecc=True`` also returns the per-vertex ECCENTRICITY
    (max distance to any reachable vertex, radius-capped) — free from
    the same run: a vertex's eccentricity is the last round its
    bitset changed."""
    import ray

    import pyarrow as pa

    from hedonic_ray.engine.superstep import iter_block_views

    if g.directed:
        raise ValueError("neighborhood_function wants the undirected "
                         "LinkGraph (the SQL arcs CTE symmetrizes)")
    n = g.n
    w = (n + 63) // 64
    bits = np.zeros((n, w), np.uint64)
    v = np.arange(n)
    bits[v, v >> 6] |= np.uint64(1) << (v.astype(np.uint64) & np.uint64(63))

    counts = [_popcount_total(bits)]  # h = 0: the n self-pairs
    ecc = np.zeros(n, np.int64)
    for rnd in range(1, rounds + 1):
        bref = ray.put(bits)

        def pull(batch: pa.Table) -> pa.Table:
            b = ray.get(bref)
            dsts, accs = [], []
            for bv in iter_block_views(batch):
                src = bv.src_per_edge()
                tgt = bv.indices
                if len(tgt) == 0:
                    continue
                ut, inv = np.unique(tgt, return_inverse=True)
                acc = np.zeros((len(ut), b.shape[1]), np.uint64)
                np.bitwise_or.at(acc, inv, b[src])
                dsts.append(ut.astype(np.int64))
                accs.append(acc)
            if not dsts:
                return pa.table({"dst": pa.array([], pa.int64()),
                                 "words": pa.array([], pa.binary())})
            d = np.concatenate(dsts)
            a = np.ascontiguousarray(np.concatenate(accs, axis=0))
            # zero-copy row packing: one FixedSizeBinary column over
            # the row-major buffer (no per-row Python)
            fsb = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(8 * a.shape[1]), len(d),
                [None, pa.py_buffer(a.tobytes())])
            return pa.table({"dst": pa.array(d), "words": fsb})

        new_bits = bits.copy()
        for blk in g.blocks.map_batches(pull, batch_format="pyarrow") \
                .iter_batches(batch_size=65536, batch_format="pyarrow"):
            if not blk.num_rows:
                continue
            d = blk.column("dst").to_numpy()
            col = blk.column("words")
            arr = (col.combine_chunks()
                   if isinstance(col, pa.ChunkedArray) else col)
            a = np.frombuffer(arr.buffers()[1], dtype=np.uint64,
                              count=len(arr) * w,
                              offset=arr.offset * 8 * w
                              ).reshape(len(arr), w)
            np.bitwise_or.at(new_bits, d, a)
        changed = (new_bits != bits).any(axis=1)
        if not changed.any():
            break  # saturated below the cap == the SQL fixed point
        ecc[changed] = rnd
        bits = new_bits
        counts.append(_popcount_total(bits))
    out = np.array(counts, dtype=np.int64)
    return (out, ecc) if return_ecc else out
