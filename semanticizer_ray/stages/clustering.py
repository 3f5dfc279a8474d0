"""Stage T9: transitive clustering — distributed min-label propagation.

Connected components over the match-edge graph (north_rule stage 3), with
canonical cluster ids = min conv_id in the component:

1. partition-local contraction: union-find INSIDE each edge batch
   (``map_batches``, no shuffle) rewrites edges to (node → local root),
   collapsing cliques/stars — typical duplicate clusters — to depth 1
   before any global work;
2. iterated rounds to a fixed point; each round is two node-keyed
   ``groupby`` exchanges (a portable bucket join — deliberately NOT
   ``Dataset.join``, which in ray 2.49 mishandles empty partitions and
   mixed block types inside composed plans):
   a. scatter: group (label row of node k) with (edge rows keyed by k) →
      emit (neighbor, label_k) messages + the (k, label_k) self row;
   b. gather: ``groupby(node)`` over messages+self rows → new label =
      min, plus a ``changed`` flag summed on the driver for the
      convergence check. Labels only decrease → changed == 0 is a true
      fixed point.

Round complexity is O(graph diameter) — after local contraction, real
duplicate clusters (small, dense) converge in 1–2 rounds; ``max_rounds``
bounds pathological chains. Each round materializes only the label table
(one short row per node), never the edges. Known cost: each round
re-sorts sym ∪ labels (Ray Data has no co-partitioned iteration
primitive to pin sym's partitioning across rounds); edges after
contraction are one short row per node per batch, so the re-sorted
volume is label-table-sized, not edge-table-sized.

A pure-Python ``unionfind_reference`` provides the oracle for tests
(SURVEY.md §5.4 property tests) and for provably tiny edge sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import EngineConfig
from ..functions.groupagg import sorted_apply_exact, sorted_grouped_agg

CLUSTER_SCHEMA = pa.schema([("conv_id", pa.string()), ("cluster_id", pa.string())])


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p == x:
            return x
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)  # min-id wins → canonical
        self.parent[hi] = lo


def unionfind_reference(
    edges: list[tuple[str, str]], nodes: list[str] | None = None
) -> dict[str, str]:
    """Driver-side exact components (test oracle / tiny graphs)."""
    uf = _UnionFind()
    for a, b in edges:
        uf.union(a, b)
    out = {}
    for n in set([x for e in edges for x in e]) | set(nodes or []):
        out[n] = uf.find(n)
    return out


def local_contract(edges: rd.Dataset) -> rd.Dataset:
    """Union-find within each batch → (src, dst=local root) edges.

    Preserves global connectivity (each batch's spanning structure is kept)
    while collapsing dense local structure; output has ≤ one edge per
    distinct node per batch.
    """

    def contract(batch: pa.Table) -> pa.Table:
        uf = _UnionFind()
        for a, b in zip(batch["conv_a"].to_pylist(), batch["conv_b"].to_pylist()):
            uf.union(a, b)
        src, dst = [], []
        for n in list(uf.parent):
            r = uf.find(n)
            if r != n:
                src.append(n)
                dst.append(r)
        return pa.table(
            {
                "conv_a": pa.array(src, pa.string()),
                "conv_b": pa.array(dst, pa.string()),
            }
        )

    return edges.map_batches(contract, batch_format="pyarrow", batch_size=65536)


def cluster_edges(
    edges: rd.Dataset,
    all_nodes: rd.Dataset | None,
    cfg: EngineConfig,
    num_partitions: int = 16,  # kept for API symmetry; groupby manages partitions
) -> rd.Dataset:
    """Match edges (conv_a, conv_b[, is_match]) → (conv_id, cluster_id).

    ``all_nodes``: Dataset with a ``conv_id`` column covering every record
    (singletons become their own cluster); None → nodes = edge endpoints.
    """
    schema = edges.schema(fetch_if_missing=True)
    if schema is not None and "is_match" in schema.names:
        edges = edges.map_batches(
            lambda t: t.filter(t["is_match"]), batch_format="pyarrow"
        )
    edges = edges.select_columns(["conv_a", "conv_b"])
    if cfg.cluster.local_contract:
        edges = local_contract(edges)
    edges = edges.materialize()

    # count-gated exact finish: after contraction the edge count is known;
    # a small surviving edge set (typical — only MATCHED pairs survive
    # scoring) finishes on the driver with exact union-find instead of
    # paying multi-shuffle rounds. Large edge sets take the distributed
    # path below (SURVEY.md §7: driver union-find only for provably small
    # edge sets — "provably" = this count).
    if edges.count() <= cfg.cluster.driver_edge_threshold:
        edge_df = edges.to_pandas()
        # empty datasets lose their schema through to_pandas() (column-less
        # frame) — an empty edge set simply means every node is a singleton
        comp = (
            {}
            if edge_df.empty
            else unionfind_reference(list(zip(edge_df["conv_a"], edge_df["conv_b"])))
        )
        if all_nodes is not None:
            nodes_ds = all_nodes.select_columns(["conv_id"])
        else:
            nodes_ds = edges.map_batches(
                lambda t: pa.table(
                    {
                        "conv_id": pa.concat_arrays(
                            [
                                t["conv_a"].combine_chunks(),
                                t["conv_b"].combine_chunks(),
                            ]
                        )
                    }
                ),
                batch_format="pyarrow",
            )
        import ray

        comp_ref = ray.put(comp)

        def assign(batch: pa.Table) -> pa.Table:
            cmap = ray.get(comp_ref)
            ids = batch["conv_id"].to_pylist()
            return pa.table(
                {
                    "conv_id": pa.array(ids, pa.string()),
                    "cluster_id": pa.array(
                        [cmap.get(i, i) for i in ids], pa.string()
                    ),
                }
            )

        out = nodes_ds.map_batches(assign, batch_format="pyarrow")
        if all_nodes is None:  # dedup endpoint rows
            def dedup(df: pd.DataFrame) -> pd.DataFrame:
                if len(df) == 0:
                    return df
                return df.drop_duplicates("conv_id")

            out = sorted_grouped_agg(out, "conv_id", dedup, pre_combine=True)
        return out

    # symmetric adjacency keyed by the node whose label will be scattered:
    # row (key=k, other=n) means "when k's label updates, tell n".
    def to_sym(batch: pa.Table) -> pa.Table:
        a = batch["conv_a"].combine_chunks()
        b = batch["conv_b"].combine_chunks()
        return pa.table(
            {
                "key": pa.concat_arrays([a, b]),
                "other": pa.concat_arrays([b, a]),
                "label": pa.nulls(2 * batch.num_rows, pa.string()),
                "kind": pa.array(["e"] * (2 * batch.num_rows), pa.string()),
            }
        )

    sym = edges.map_batches(to_sym, batch_format="pyarrow").materialize()

    # initial labels: every node labels itself (deduped)
    if all_nodes is not None:
        label_src = all_nodes.select_columns(["conv_id"])

        def init_rows(batch: pa.Table) -> pa.Table:
            ids = batch["conv_id"].combine_chunks()
            return pa.table({"node": ids, "label": ids})

        node_rows = label_src.map_batches(init_rows, batch_format="pyarrow")
    else:

        def edge_nodes(batch: pa.Table) -> pa.Table:
            ids = batch["key"].combine_chunks()
            return pa.table({"node": ids, "label": ids})

        node_rows = sym.map_batches(edge_nodes, batch_format="pyarrow")

    def label_dedup(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"node": pd.Series(dtype="str"), "label": pd.Series(dtype="str")}
            )
        return df.groupby("node", sort=False).first().reset_index()

    labels = sorted_grouped_agg(
        node_rows.map_batches(lambda t: t, batch_format="pandas"), "node", label_dedup
    ).materialize()

    def label_to_scatter(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch["node"].combine_chunks(),
                "other": pa.nulls(n, pa.string()),
                "label": batch["label"].combine_chunks(),
                "kind": pa.array(["l"] * n, pa.string()),
            }
        )

    def scatter_block(df: pd.DataFrame) -> pd.DataFrame:
        """Complete key groups → messages, fully vectorized: merge the
        block's label rows onto its edge rows by key, then append the
        label rows as self-messages (is_current)."""
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype="str"),
                    "label": pd.Series(dtype="str"),
                    "is_current": pd.Series(dtype="bool"),
                }
            )
        lab = df.loc[df["kind"] == "l", ["key", "label"]]
        edg = df.loc[df["kind"] == "e", ["key", "other"]]
        msgs = edg.merge(lab, on="key", how="inner")
        return pd.DataFrame(
            {
                "node": np.concatenate([msgs["other"].to_numpy(), lab["key"].to_numpy()]),
                "label": np.concatenate([msgs["label"].to_numpy(), lab["label"].to_numpy()]),
                "is_current": np.concatenate(
                    [np.zeros(len(msgs), dtype=bool), np.ones(len(lab), dtype=bool)]
                ),
            }
        )

    def gather_combine(df: pd.DataFrame) -> pd.DataFrame:
        """Composable min-label reduce keeping the current label: one row
        per node with (label=min seen, cur=the is_current label)."""
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype="str"),
                    "label": pd.Series(dtype="str"),
                    "cur": pd.Series(dtype="object"),
                }
            )
        if "cur" not in df.columns:
            df = df.assign(cur=df["label"].where(df["is_current"]))
        g = df.groupby("node", sort=False).agg(
            label=("label", "min"), cur=("cur", "first")
        )
        # "first" skips NaN only with min_count tricks; use max which ignores
        # NaN for object? Safest: explicit combine below.
        cur = df.dropna(subset=["cur"]).groupby("node", sort=False)["cur"].first()
        g["cur"] = cur.reindex(g.index)
        return g.reset_index()

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype="str"),
                    "label": pd.Series(dtype="str"),
                    "changed": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "node": df["node"],
                "label": df["label"],
                "changed": (df["label"] < df["cur"]).astype("int64"),
            }
        )

    for _round in range(cfg.cluster.max_rounds):
        scat_src = sym.union(
            labels.map_batches(label_to_scatter, batch_format="pyarrow")
        )
        msgs = sorted_apply_exact(scat_src, "key", scatter_block)
        # ONE materialize per round: gather + finalize fuse into it; the
        # convergence sum scans the cached blocks and the label projection
        # stays lazy (next round's sort re-reads the cached blocks)
        stepped = (
            sorted_grouped_agg(msgs, "node", gather_combine)
            .map_batches(finalize, batch_format="pandas")
            .materialize()
        )
        changed = stepped.sum("changed")
        labels = stepped.select_columns(["node", "label"])
        if not changed:
            break
    else:
        if changed:
            # labels would be non-transitive (split clusters) — never return
            # a silently-partial partition
            raise RuntimeError(
                f"cluster_edges: no fixed point after {cfg.cluster.max_rounds} "
                f"rounds ({changed} labels still changing); raise "
                "ClusterConfig.max_rounds for graphs of this diameter"
            )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": batch["node"].combine_chunks(),
                "cluster_id": batch["label"].combine_chunks(),
            }
        )

    return labels.map_batches(rename, batch_format="pyarrow")
