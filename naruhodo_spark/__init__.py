"""naruhodo_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the capabilities of the
``superkerokero/naruhodo`` text-to-semantic-graph library (see SURVEY.md for
the full blueprint; the reference checkout is empty in this sandbox, so all
reference loci cited in docstrings are provenance-tagged repo paths, not
line numbers — SURVEY.md §0 documents the evidence log and citation
policy).

Architecture (Spark-first, not a port):

- documents arrive as ``(doc_id, spans:array<struct<kind,text,media_ref,
  offset>>)`` tables (Iceberg in prod, parquet locally);
- normalization + sentence split are pure Catalyst expressions;
- dependency chunking (bunsetsu-style) runs as a vectorized
  ``mapInPandas`` UDF over Arrow batches — never per-row Python;
- predicate-argument (subj, pred, obj) extraction is a relational
  self-join + conditional aggregation (with an ``applyInPandas``
  alternative for A/B);
- pronoun / omitted-subject resolution are window functions over
  ``(doc_id) ORDER BY (sent_id, chunk_id)``;
- entity linking is a broadcast-hash join against an alias dictionary;
- canonicalization is connected components via iterative DataFrame
  self-joins (large-star/small-star style min-label propagation);
- node counts / edge weights are hash aggregations with an explicit
  salted two-phase variant for hot-entity skew;
- per-partition progress manifests + anti-join give kill-resume;
- graph consumers: plot sink (top-k subgraph + seeded force layout),
  weighted PageRank / degree stats / k-hop ego graphs / PMI
  co-occurrence as DataFrame programs, per-edge provenance counts,
  media–entity ``appears_with`` edges over interleaved documents;
- training-data ops (``ops/``): dedup families, ANN similarity, text
  stats/quality, benchmark decontamination, per-source quotas, and the
  composed ``prepare_corpus`` pipeline.
"""

__version__ = "0.1.0"
