"""hedonic_ray — a Ray-Data-native link-graph analytics engine.

From-scratch reconstruction of the capabilities of ``lucaslopes/hedonic``
(community detection via hedonic games, see ``/root/reference/hedonic/__init__.py``)
re-expressed as Ray Data pipelines over Common-Crawl-style web-page tables:

    pages(url, warc_ts, html, text, lang)
      --extract-->  edges(src, dst)
      --partition-->  hash-partitioned CSR blocks (Arrow list columns)
      --supersteps-->  PageRank / connected components / label propagation /
                       hedonic local-moving community detection / triangles
      --analytics-->  equilibrium fraction, robustness, resolution spectrum,
                       ARI, CPM partition potential

Design: every stage is a ``ray.data.Dataset`` transform (``map_batches``
over zero-copy Arrow batches, ``groupby().aggregate()`` for the wide
gathers); vertex state is broadcast via ``ray.put`` (it scales with V,
not E) with per-partition Parquet checkpoints + lineage manifests.

The library NEVER calls ``ray.init()`` — sessions are owned by the
caller (driver / bench.py / pytest fixture).
"""

from hedonic_ray.context import configure_context
from hedonic_ray.sources.synth import (
    generate_pages,
    pages_from_documents,
    sbm_edges,
    ground_truth_membership,
    noisy_membership,
)
from hedonic_ray.functions.extract import extract_text, extract_body, extract_links
from hedonic_ray.graph.build import (
    edges_from_pages,
    assign_vertex_ids,
    canonicalize_edges,
    degree_table,
    LinkGraph,
    build_link_graph,
)
from hedonic_ray.algos.pagerank import pagerank
from hedonic_ray.algos.components import connected_components
from hedonic_ray.algos.labelprop import label_propagation, onepass_improvement
from hedonic_ray.algos.hedonic import (
    hedonic_communities,
    onepass_hedonic,
    mirror_communities,
)
from hedonic_ray.algos.triangles import triangle_count

__all__ = [
    "configure_context",
    "generate_pages",
    "pages_from_documents",
    "sbm_edges",
    "ground_truth_membership",
    "noisy_membership",
    "extract_text",
    "extract_body",
    "extract_links",
    "edges_from_pages",
    "assign_vertex_ids",
    "canonicalize_edges",
    "degree_table",
    "LinkGraph",
    "build_link_graph",
    "pagerank",
    "connected_components",
    "label_propagation",
    "onepass_improvement",
    "hedonic_communities",
    "onepass_hedonic",
    "mirror_communities",
    "triangle_count",
]
