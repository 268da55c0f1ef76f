"""node2vec biased-walk TRANSITION PROBABILITIES (Grover & Leskovec,
KDD 2016) over a directed edge Dataset — the precompute a graph-
embedding trainer runs before sampling walks.

For a walk positioned at ``cur`` having arrived from ``prev``, the
unnormalized weight of stepping to ``nxt ∈ out(cur)`` is 1/p if
``nxt == prev`` (return), 1 if ``nxt ∈ out(prev)`` (BFS-ish stay),
1/q otherwise (DFS-ish explore).  Scaling all three by ``p·q`` makes
them the exact integers ``{q, p·q, p}``, and each probability is the
exact rational ``w·10⁶ // Σw`` — no float anywhere, SQL-mirrorable.

Shape: one hash-partitioned ``Dataset.join`` expands the sampled
(prev, cur) edges against out(cur); the ``nxt ∈ out(prev)`` membership
test runs either against the broadcast sorted packed edge keys
(searchsorted per batch, below ``broadcast_max`` edges) or as a second
hash join with a marker column (the scale / force-scale path) — the
same dual-path convention as the url→id remap in `graph/build.py`.

Not in the reference repo (its walks are first-order); part of the
training-data extension surface next to `linkpred` / `walks`.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["node2vec_transition_probs"]


def node2vec_transition_probs(edges_ds, n: int, *, p: int = 4, q: int = 2,
                              prev_stride: int = 17, method: str = "auto",
                              broadcast_max: int = 50_000_000) -> pa.Table:
    """Transition table ``(prev, cur, nxt, w, prob_e6)`` for every
    2-hop context whose ``prev ≡ 0 (mod prev_stride)`` (the sampled
    slice that bounds gate output; stride 1 = the full table).
    Weights: ``q`` (return), ``p·q`` (common neighbor), ``p``
    (explore); ``prob_e6 = w·10⁶ // Σ_{(prev,cur)} w``."""
    import ray
    from ray.data.aggregate import Sum

    from hedonic_ray.context import drop_empty_blocks, force_scale

    assert n < (1 << 31), "packed (prev, nxt) keys need two ids in int64"
    edges_ds = edges_ds.materialize()
    if method == "auto":
        method = ("join" if force_scale()
                  else "broadcast" if edges_ds.count() <= broadcast_max
                  else "join")

    def sampled(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64)
        m = pa.array(s % prev_stride == 0)
        return pa.table({"prev": t.column("src").filter(m),
                         "cur": t.column("dst").filter(m)})

    walks = edges_ds.map_batches(sampled, batch_format="pyarrow")
    hops = edges_ds.map_batches(
        lambda t: pa.table({"cur": t.column("src"),
                            "nxt": t.column("dst")}),
        batch_format="pyarrow")
    s_w = pa.schema([("prev", pa.int64()), ("cur", pa.int64())])
    s_h = pa.schema([("cur", pa.int64()), ("nxt", pa.int64())])
    trip = drop_empty_blocks(walks, s_w).join(
        drop_empty_blocks(hops, s_h), "inner", 8, on=("cur",))

    w_ret, w_stay, w_exp = q, p * q, p

    if method == "broadcast":
        keys_parts = []
        for b in edges_ds.iter_batches(batch_size=262144,
                                       batch_format="pyarrow"):
            keys_parts.append(b.column("src").to_numpy().astype(np.int64)
                              * n + b.column("dst").to_numpy())
        ekeys = np.sort(np.concatenate(keys_parts)) if keys_parts \
            else np.empty(0, np.int64)
        ekeys_ref = ray.put(ekeys)

        def weigh(t: pa.Table) -> pa.Table:
            prev = t.column("prev").to_numpy().astype(np.int64)
            cur = t.column("cur").to_numpy().astype(np.int64)
            nxt = t.column("nxt").to_numpy().astype(np.int64)
            ek = ray.get(ekeys_ref)
            pk = prev * n + nxt
            pos = np.clip(np.searchsorted(ek, pk), 0, max(0, len(ek) - 1))
            common = (ek[pos] == pk) if len(ek) else np.zeros(len(pk), bool)
            w = np.where(nxt == prev, w_ret,
                         np.where(common, w_stay, w_exp)).astype(np.int64)
            return pa.table({"prev": pa.array(prev), "cur": pa.array(cur),
                             "nxt": pa.array(nxt),
                             "w": pa.array(w, pa.int64())})

        weighted = trip.map_batches(weigh, batch_format="pyarrow")
    else:
        def pack(t: pa.Table) -> pa.Table:
            prev = t.column("prev").to_numpy().astype(np.int64)
            nxt = t.column("nxt").to_numpy().astype(np.int64)
            return t.append_column("pk", pa.array(prev * n + nxt,
                                                  pa.int64()))

        def epack(t: pa.Table) -> pa.Table:
            s = t.column("src").to_numpy().astype(np.int64)
            d = t.column("dst").to_numpy().astype(np.int64)
            return pa.table({"pk": pa.array(s * n + d, pa.int64()),
                             "is_edge": pa.array(np.ones(len(s), np.int64))})

        s_t = pa.schema([("prev", pa.int64()), ("cur", pa.int64()),
                         ("nxt", pa.int64()), ("pk", pa.int64())])
        s_e = pa.schema([("pk", pa.int64()), ("is_edge", pa.int64())])
        marked = drop_empty_blocks(
            trip.map_batches(pack, batch_format="pyarrow"), s_t).join(
            drop_empty_blocks(
                edges_ds.map_batches(epack, batch_format="pyarrow"), s_e),
            "left_outer", 8, on=("pk",))

        def weigh_joined(t: pa.Table) -> pa.Table:
            prev = t.column("prev").to_numpy().astype(np.int64)
            nxt = t.column("nxt").to_numpy().astype(np.int64)
            common = t.column("is_edge").to_numpy(
                zero_copy_only=False).astype(np.float64)
            common = np.nan_to_num(common, nan=0.0) > 0
            w = np.where(nxt == prev, w_ret,
                         np.where(common, w_stay, w_exp)).astype(np.int64)
            return pa.table({"prev": t.column("prev"),
                             "cur": t.column("cur"),
                             "nxt": t.column("nxt"),
                             "w": pa.array(w, pa.int64())})

        weighted = marked.map_batches(weigh_joined, batch_format="pyarrow")

    weighted = weighted.materialize()
    sums = weighted.groupby(["prev", "cur"]).aggregate(
        Sum("w", alias_name="tw"))
    s_wt = pa.schema([("prev", pa.int64()), ("cur", pa.int64()),
                      ("nxt", pa.int64()), ("w", pa.int64())])
    s_sm = pa.schema([("prev", pa.int64()), ("cur", pa.int64()),
                      ("tw", pa.int64())])
    final = drop_empty_blocks(weighted, s_wt).join(
        drop_empty_blocks(sums, s_sm), "inner", 8, on=("prev", "cur"))

    def prob(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy().astype(np.int64)
        tw = t.column("tw").to_numpy().astype(np.int64)
        return pa.table({"prev": t.column("prev"), "cur": t.column("cur"),
                         "nxt": t.column("nxt"),
                         "w": pa.array(w, pa.int64()),
                         "prob_e6": pa.array(w * np.int64(1_000_000) // tw,
                                             pa.int64())})

    out = pa.concat_tables(
        b for b in final.map_batches(prob, batch_format="pyarrow")
        .iter_batches(batch_size=65536, batch_format="pyarrow"))
    import pyarrow.compute as pc

    return out.take(pc.sort_indices(out, sort_keys=[
        ("prev", "ascending"), ("cur", "ascending"), ("nxt", "ascending")]))
