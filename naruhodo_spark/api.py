"""User-facing facade mirroring the reference's ``parser`` API.

Reference surface [PK naruhodo/parser.py]:
    p = parser(lang="ja", gtype="k")
    p.add(text); p.addAll(texts); p.reset()
    p.exportObj(); p.exportJSON(path); p.G  # networkx graph

This facade keeps the same verbs on Spark tables. ``add``/``add_all``
accumulate documents into a staging list; ``build()`` (or any export)
runs the distributed pipeline over everything staged so far —
accumulation semantics match the reference (graph grows monotonically
across add() calls), while execution stays lazy/batched instead of
eager-per-document. ``add_stream`` points the same pipeline at a
directory for continuous ingest (streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from naruhodo_spark import export as EX
from naruhodo_spark import lang as L
from naruhodo_spark import schemas as S
from naruhodo_spark.pipeline import build_kg


class parser:  # noqa: N801 — name mirrors the reference API
    def __init__(
        self,
        spark: SparkSession,
        lang: str = "en",
        gtype: str = "k",
        aliases: DataFrame | None = None,
    ):
        self.spark = spark
        self.prof = L.get_profile(lang)
        self.gtype = gtype
        self.aliases = aliases
        self._staged: list[tuple[str, list]] = []
        self._docs_df: DataFrame | None = None
        self._kg: dict[str, DataFrame] | None = None

    # -- ingest (reference: add / addAll) --------------------------------
    def add(self, text: str, doc_id: str | None = None) -> "parser":
        doc_id = doc_id or f"doc-{len(self._staged):06d}"
        self._staged.append(
            (doc_id, [{"kind": "text", "text": text, "media_ref": "", "offset": 0}])
        )
        self._kg = None
        return self

    def add_all(self, texts: list[str]) -> "parser":
        for t in texts:
            self.add(t)
        return self

    addAll = add_all  # reference spelling

    def add_documents(self, docs_spans: DataFrame) -> "parser":
        """Spark-native ingest: a spans-shaped DataFrame (the scale path)."""
        self._docs_df = (
            docs_spans
            if self._docs_df is None
            else self._docs_df.unionByName(docs_spans)
        )
        self._kg = None
        return self

    def add_stream(
        self, input_dir: str, out_dir: str, checkpoint: str | None = None
    ):
        """Continuous ingest: drain a spans-parquet directory through the
        pipeline, upserting graph tables at out_dir per micro-batch
        (streaming.incremental_ingest). Returns the finished query."""
        from naruhodo_spark.streaming import incremental_ingest

        return incremental_ingest(
            self.spark,
            input_dir,
            out_dir,
            prof=self.prof,
            aliases=self.aliases,
            checkpoint=checkpoint,
        )

    def reset(self) -> "parser":
        self._staged, self._docs_df, self._kg = [], None, None
        return self

    # -- build ------------------------------------------------------------
    def _docs(self) -> DataFrame:
        parts = []
        if self._staged:
            parts.append(
                self.spark.createDataFrame(self._staged, schema=S.DOCUMENTS_SPANS)
            )
        if self._docs_df is not None:
            parts.append(self._docs_df)
        if not parts:
            raise ValueError("no documents added")
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def build(self) -> dict[str, DataFrame]:
        if self._kg is None:
            self._kg = build_kg(self._docs(), prof=self.prof, aliases=self.aliases)
        return self._kg

    # -- graph access (reference: parser.G) -------------------------------
    @property
    def nodes(self) -> DataFrame:
        kg = self.build()
        return kg["ksg_nodes"] if self.gtype == "k" else kg["dsg_nodes"]

    @property
    def edges(self) -> DataFrame:
        kg = self.build()
        return kg["ksg_edges"] if self.gtype == "k" else kg["dsg_edges"]

    # -- export (reference: exportObj / exportJSON) ------------------------
    def export_obj(self, max_nodes: int = 10_000) -> dict:
        if self.gtype != "k":
            raise NotImplementedError("viewer export is KSG-only")
        kg = self.build()
        return EX.export_obj(kg["ksg_nodes"], kg["ksg_edges"], max_nodes)

    exportObj = export_obj

    def export_json(self, filename: str, max_nodes: int = 10_000) -> None:
        if self.gtype != "k":
            raise NotImplementedError("viewer export is KSG-only")
        kg = self.build()
        EX.export_json(kg["ksg_nodes"], kg["ksg_edges"], filename, max_nodes)

    exportJSON = export_json

    # -- plot sink (reference: show / plotToFile, O6) ----------------------
    def show(self, max_nodes: int = 200) -> dict:
        """Reference ``show()``: returns the plotly-figure dict (no
        plotting library in this environment — the dict IS the figure;
        plotly renders it unchanged where installed)."""
        if self.gtype != "k":
            raise NotImplementedError("plot sink is KSG-only (like export)")
        from naruhodo_spark import plot as PL

        return PL.plot_figure(self.nodes, self.edges, max_nodes)

    def plot_to_file(self, filename: str, max_nodes: int = 200) -> None:
        """Reference ``plotToFile()``: standalone SVG (or the figure
        dict as .json)."""
        if self.gtype != "k":
            raise NotImplementedError("plot sink is KSG-only (like export)")
        from naruhodo_spark import plot as PL

        PL.plot_to_file(self.nodes, self.edges, filename, max_nodes)

    plotToFile = plot_to_file

    def entity_list(self, etype: int | None = None) -> DataFrame:
        """Reference ``entityList`` analog [PK naruhodo/parser.py keeps
        per-type entity lists next to G]: the KSG's entity nodes —
        everything except the predicate nodes — as (node_id, etype,
        count), optionally filtered to one type code (lang.py gazetteer
        codes), ordered by mention count."""
        nodes = self._require_ksg()["ksg_nodes"].where(
            ~F.col("node_id").startswith("pred:")
        )
        if etype is not None:
            nodes = nodes.where(F.col("etype") == int(etype))
        return nodes.select("node_id", "etype", "count").orderBy(
            F.col("count").desc(), "node_id"
        )

    entityList = entity_list  # reference spelling

    def pro_list(self) -> DataFrame:
        """Reference ``proList`` analog: pronoun-linked nodes
        (node_id, pro class, count). Node merge keeps max(pro), so this
        is every node mentioned via a pronoun at least once — resolved
        pronouns appear as their antecedent (e.g. "she" → carol),
        unresolved ones as their own surface (coref.py keeps them)."""
        return (
            self._require_ksg()["ksg_nodes"]
            .where(F.col("pro") >= 0)
            .select("node_id", "pro", "count")
            .orderBy(F.col("count").desc(), "node_id")
        )

    proList = pro_list  # reference spelling

    # -- graph analytics (reference users run these on parser.G via
    #    networkx; here they are DataFrame programs over the same graph) --
    def _require_ksg(self) -> dict[str, DataFrame]:
        if self.gtype != "k":
            raise NotImplementedError("graph analytics are KSG-only")
        return self.build()

    def _ksg_edges(self) -> DataFrame:
        return self._require_ksg()["ksg_edges"]

    def pagerank(self, damping: float = 0.85, iterations: int = 15) -> DataFrame:
        from naruhodo_spark.operators import graphstats as GS

        return GS.pagerank(self._ksg_edges(), damping, iterations)

    def degree_stats(self) -> DataFrame:
        from naruhodo_spark.operators import graphstats as GS

        return GS.degree_stats(self._ksg_edges())

    def hits(self, iterations: int = 20) -> DataFrame:
        """(node, hub, authority) — Kleinberg HITS over the KSG
        (operators/graphstats.hits); numpy-pinned power iteration."""
        from naruhodo_spark.operators import graphstats as GS

        return GS.hits(self._ksg_edges(), iterations)

    def communities(self, max_iterations: int = 10) -> DataFrame:
        """(node, label) — synchronous weighted label propagation over
        the KSG (operators/graphstats.label_propagation); a
        modularity-style alternative to the PMI/CC-based
        entity_communities."""
        from naruhodo_spark.operators import graphstats as GS

        return GS.label_propagation(self._ksg_edges(), max_iterations)

    def related_entities(
        self, seeds: list[str], damping: float = 0.85,
        iterations: int = 15,
    ) -> DataFrame:
        """(node, rank) — personalized PageRank restarted at ``seeds``
        (operators/graphstats.personalized_pagerank): 'entities related
        to these', numpy-pinned."""
        from naruhodo_spark.operators import graphstats as GS

        return GS.personalized_pagerank(
            self._ksg_edges(), seeds, damping, iterations
        )

    def k_core(self, k: int = 2, **kw) -> DataFrame:
        """(node, degree) — the k-core of this graph (graphstats.k_core):
        the dense backbone after iteratively peeling nodes of degree
        < k; the standard pre-trim before embedding/community work."""
        from naruhodo_spark.operators import graphstats as GS

        return GS.k_core(self._ksg_edges(), k, **kw)

    def k_truss(self, k: int = 3, **kw) -> DataFrame:
        """(node_a, node_b, support) — the k-truss of this graph
        (graphstats.k_truss): the maximal subgraph whose every edge
        sits in ≥ k−2 triangles; the edge-level sharpening of
        k_core (bridges that survive coring fall out)."""
        from naruhodo_spark.operators import graphstats as GS

        return GS.k_truss(self._ksg_edges(), k, **kw)

    def modularity(self, communities: DataFrame | None = None) -> DataFrame:
        """(community, n_nodes, internal_weight, total_strength,
        contribution) — Newman modularity of a (node, community)
        assignment over this graph (graphstats.modularity;
        sum(contribution) = Q). Default assignment: this graph's own
        label-propagation communities — the LPA quality gauge."""
        from naruhodo_spark.operators import graphstats as GS

        if communities is None:
            # graphstats LPA, not self.communities() — the facade name
            # is taken by the cooccur PMI communities, whose key is
            # (entity, community) over linked triples
            communities = GS.label_propagation(self._ksg_edges()).select(
                "node", F.col("label").alias("community")
            )
        return GS.modularity(self._ksg_edges(), communities)

    def quotient(
        self, groups: DataFrame | None = None, by_pred: bool = False
    ) -> DataFrame:
        """(src_group, dst_group[, pred], n_edges, total_weight, …) —
        the SNAP-style quotient summary of this graph under a
        (name, group) assignment (graphstats.quotient_graph). Default
        grouping: label-propagation communities — 'how do the
        communities talk to each other'."""
        from naruhodo_spark.operators import graphstats as GS

        if groups is None:
            groups = GS.label_propagation(self._ksg_edges()).select(
                F.col("node").alias("name"),
                F.col("label").cast("string").alias("group"),
            )
        return GS.quotient_graph(self._ksg_edges(), groups, by_pred=by_pred)

    def refine_communities(
        self, communities: DataFrame | None = None, rounds: int = 5
    ) -> DataFrame:
        """(node, community) — Louvain-style local-move refinement of
        a community assignment over this graph
        (graphstats.refine_communities): each round every active node
        takes its best positive-modularity-gain move. Default start is
        singletons (classic Louvain); pass LPA output to polish it,
        and score the result with parser.modularity()."""
        from naruhodo_spark.operators import graphstats as GS

        return GS.refine_communities(
            self._ksg_edges(), communities, rounds=rounds
        )

    def spread_types(
        self, seeds: DataFrame | None = None, rounds: int = 10,
        alpha: float = 0.8, top_k: int = 1,
    ) -> DataFrame:
        """(node, label, score) — semi-supervised entity typing by
        label spreading (graphstats.spread_labels): gazetteer-typed
        nodes (etype > 0) seed their type, which flows to UNTYPED
        entities along co-mention topology — the graph-native
        complement of infer_types' predicate-signature voting. Pass
        explicit (node, label[, score]) seeds to override."""
        from naruhodo_spark.operators import graphstats as GS

        if seeds is None:
            nodes = self._require_ksg()["ksg_nodes"]
            seeds = nodes.where(F.col("etype") > 0).select(
                F.col("name").alias("node"),
                F.concat(F.lit("etype:"), F.col("etype").cast("string"))
                .alias("label"),
            )
        return GS.spread_labels(
            self._ksg_edges(), seeds, rounds=rounds, alpha=alpha,
            top_k=top_k,
        )

    def predict_links(
        self, method: str = "adamic_adar", top_k: int | None = 100, **kw
    ):
        """(scores, audit) — neighborhood-overlap link prediction over
        this graph (graphstats.link_scores: common_neighbors /
        adamic_adar / resource_allocation), the non-embedding baseline
        a trained model's eval should beat."""
        from naruhodo_spark.operators import graphstats as GS

        return GS.link_scores(
            self._ksg_edges(), method=method, top_k=top_k, **kw
        )

    def align_with(self, other: "parser | DataFrame", **kw):
        """(matches, audit) — PARIS-style probabilistic entity
        alignment between THIS graph and another parser's (or a raw
        (subj, pred, obj) frame): noisy-or evidence over shared
        objects weighted by predicate inverse functionality
        (operators/align.align_entities). self is KG1."""
        from naruhodo_spark.operators.align import align_entities

        kg2 = other._ksg_edges() if isinstance(other, parser) else other
        return align_entities(self._ksg_edges(), kg2, **kw)

    def align_predicates_with(
        self, other: "parser | DataFrame",
        matches: DataFrame | None = None, **kw,
    ) -> DataFrame:
        """(pred_1, pred_2, n_shared, n_grounded, score) — PARIS's
        schema leg: P(r ⊑ r') between this graph's predicates and the
        other's, grounded through entity ``matches`` (defaults to
        running align_with first; operators/align.
        predicate_alignment)."""
        from naruhodo_spark.operators.align import predicate_alignment

        kg2 = other._ksg_edges() if isinstance(other, parser) else other
        if matches is None:
            matches, _ = self.align_with(other)
        return predicate_alignment(self._ksg_edges(), kg2, matches, **kw)

    def betweenness(self, n_sources: int = 16, max_dist: int = 6) -> DataFrame:
        """(node, betweenness) — sampled Brandes betweenness over the
        KSG (operators/graphstats.betweenness_sampled): the bridge
        detector, exact when n_sources covers the graph."""
        from naruhodo_spark.operators import graphstats as GS

        return GS.betweenness_sampled(
            self._ksg_edges(), n_sources=n_sources, max_dist=max_dist
        )

    def shortest_path(
        self, src: str, dst: str, max_dist: int = 6,
        direction: str = "both",
    ) -> "list[str]":
        """One shortest src→dst node path over the KSG ([] if none
        within max_dist) — the networkx shortest_path analog
        (operators/graphstats.shortest_path). For many-pair workloads
        use distances()/approx_distance."""
        from naruhodo_spark.operators import graphstats as GS

        return GS.shortest_path(
            self._ksg_edges(), src, dst, max_dist=max_dist,
            direction=direction,
        )

    def predicate_signatures(self, min_support: int = 3) -> DataFrame:
        """(pred, dom_type, dom_conf, range_type, range_conf, support)
        — statistical domain/range typing per predicate
        (operators/schema_induct.py)."""
        from naruhodo_spark.operators import schema_induct as SI

        return SI.predicate_signatures(
            self.build()["triples"], min_support=min_support
        )

    def type_violations(self, min_conf: float = 0.8) -> DataFrame:
        """Triples whose typed argument contradicts a confident
        predicate signature — the mis-extraction review queue
        (operators/schema_induct.type_violations)."""
        from naruhodo_spark.operators import schema_induct as SI

        return SI.type_violations(self.build()["triples"], min_conf=min_conf)

    def infer_types(
        self, min_conf: float = 0.0, min_support: int = 3
    ) -> DataFrame:
        """(entity, etype, score, n_evidence) — statistical type
        inference for entities the gazetteer left untyped, voted from
        the predicate signatures (operators/schema_induct.
        infer_entity_types; SDType, Paulheim & Bizer ISWC'13)."""
        from naruhodo_spark.operators import schema_induct as SI

        return SI.infer_entity_types(
            self.build()["triples"], min_conf=min_conf,
            min_support=min_support,
        )

    def type_disagreements(
        self, min_conf: float = 0.0, min_support: int = 3,
        rounds: int = 10, alpha: float = 0.8,
    ) -> DataFrame:
        """(node, sdtype_label, sdtype_score, spread_label,
        spread_score) — entities where the two typing signals
        disagree: SDType's predicate-signature vote (infer_types) vs
        topology label spreading (spread_types). The two methods use
        DISJOINT evidence, so their disagreement set is exactly where
        a curation pass should look first; agreement rows are dropped
        (they are the easy cases)."""
        sd = self.infer_types(
            min_conf=min_conf, min_support=min_support
        ).select(
            F.col("entity").alias("node"),
            F.concat(F.lit("etype:"), F.col("etype").cast("string"))
            .alias("sdtype_label"),
            F.col("score").alias("sdtype_score"),
        )
        sp = self.spread_types(rounds=rounds, alpha=alpha, top_k=1).select(
            "node",
            F.col("label").alias("spread_label"),
            F.col("score").alias("spread_score"),
        )
        return sd.join(sp, "node").where(
            F.col("sdtype_label") != F.col("spread_label")
        )

    def cardinality_violations(
        self, min_functionality: float = 0.95
    ) -> DataFrame:
        """Subjects asserting multiple objects for a (near-)functional
        predicate — the multi-value review queue complementing
        type_violations (operators/schema_induct.
        cardinality_violations; AMIE functionality scores)."""
        from naruhodo_spark.operators import schema_induct as SI

        return SI.cardinality_violations(
            self.build()["triples"].where(F.col("subj").isNotNull()),
            min_functionality=min_functionality,
        )

    def summary(self) -> DataFrame:
        """(stat, value) one-stop graph report: node/edge/predicate
        counts, total weight, and degree percentiles — two aggregation
        passes, bounded output (the networkx `nx.info` analog)."""
        from naruhodo_spark.operators import graphstats as GS

        edges = self._ksg_edges()
        deg = GS.degree_stats(edges)
        e = edges.agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum("weight").cast("double").alias("total_weight"),
            F.countDistinct("pred").alias("n_predicates"),
        ).head()
        d = deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.max(F.col("in_degree") + F.col("out_degree")).alias("max_deg"),
            F.expr(
                "percentile_approx(in_degree + out_degree,"
                " array(0.5, 0.95), 1000)"
            ).alias("pct"),
        ).head()
        rows = [
            ("n_nodes", float(d["n_nodes"])),
            ("n_edges", float(e["n_edges"])),
            ("n_predicates", float(e["n_predicates"])),
            ("total_weight", float(e["total_weight"] or 0.0)),
            ("max_degree", float(d["max_deg"] or 0.0)),
            ("p50_degree", float(d["pct"][0]) if d["pct"] else 0.0),
            ("p95_degree", float(d["pct"][1]) if d["pct"] else 0.0),
        ]
        return self.spark.createDataFrame(rows, "stat string, value double")

    def k_hop(self, sources: list[str], k: int = 2,
              direction: str = "both") -> tuple[DataFrame, DataFrame]:
        from naruhodo_spark.operators import graphstats as GS

        return GS.k_hop_subgraph(self._ksg_edges(), sources, k, direction)

    def communities(self, **kw) -> DataFrame:
        from naruhodo_spark.operators import cooccur as CO

        return CO.entity_communities(self._require_ksg()["triples_linked"], **kw)

    def negative_samples(self, k: int = 2, **kw) -> DataFrame:
        from naruhodo_spark.ops import kgtrain as KT

        return KT.negative_samples(self._ksg_edges(), k=k, **kw)

    def predicate_synonyms(self, **kw) -> DataFrame:
        """(pred, canon_pred) — DIRT-style relation canonicalization
        over this graph's edges (operators/relsyn.py)."""
        from naruhodo_spark.operators import relsyn as RS

        return RS.predicate_clusters(self._ksg_edges(), **kw)

    def rag_context(self, seeds: list, **kw) -> DataFrame:
        """(fact_order, score, subj, pred, obj, sentence) — the
        relevance-ranked, verbalized subgraph around ``seeds`` for
        retrieval-augmented generation (ops/rag.graph_rag_context);
        render with ops.rag.context_text."""
        from naruhodo_spark.ops.rag import graph_rag_context

        return graph_rag_context(self._ksg_edges(), seeds, **kw)

    def top_facts(self, k: int = 5) -> DataFrame:
        """(subj, pred, obj, weight, fact_rank) — the k most salient,
        predicate-diverse facts per entity
        (operators/graphstats.top_facts)."""
        from naruhodo_spark.operators import graphstats as GS

        return GS.top_facts(self._ksg_edges(), k=k)

    def mine_rules(self, **kw) -> DataFrame:
        """(r1, r2, r3, support, n_body, confidence) — AMIE-style path
        rules r1∘r2 ⇒ r3 over this graph (operators/rules.py)."""
        from naruhodo_spark.operators import rules as RU

        return RU.mine_path_rules(self._ksg_edges(), **kw)

    def sparql(self, query: str) -> DataFrame:
        """Run a SPARQL query (the naruhodo_spark/sparql.py subset)
        over this graph's edges, dispatched on the query form: SELECT/
        ASK → one column per projected variable (or one ``ask`` row);
        CONSTRUCT → the constructed DISTINCT (src, pred, dst) graph;
        DESCRIBE → all edges incident to the named nodes."""
        from naruhodo_spark import sparql as S

        # form keyword = first SELECT/ASK/CONSTRUCT/DESCRIBE token
        # after any PREFIX declarations (each is 3 tokens: PREFIX,
        # name-colon, <iri> — none of which collide with the forms)
        form = next(
            (
                t.upper()
                for t in query.split()
                if t.upper() in ("SELECT", "ASK", "CONSTRUCT", "DESCRIBE")
            ),
            "SELECT",
        )
        if form == "CONSTRUCT":
            return S.sparql_construct(self._ksg_edges(), query)
        if form == "DESCRIBE":
            return S.sparql_describe(self._ksg_edges(), query)
        return S.sparql_select(self._ksg_edges(), query)

    def entail(self, schema: "DataFrame | list | None" = None,
               **kw) -> DataFrame:
        """(src, pred, dst) — this graph closed under the ρdf RDFS
        rules (operators/entail.py: subClassOf/subPropertyOf closures,
        edge lift, domain/range typing, type inheritance). ``schema``
        optionally unions extra schema triples — a DataFrame with
        (src, pred, dst) or a list of 3-tuples — onto the graph before
        entailing (ontologies usually live beside the extracted data,
        not inside it)."""
        from naruhodo_spark.operators.entail import rdfs_entailment
        from naruhodo_spark.sparql import _as_edges

        edges = _as_edges(self._ksg_edges()).select("src", "pred", "dst")
        if schema is not None:
            extra = (
                schema.select("src", "pred", "dst")
                if isinstance(schema, DataFrame)
                else self.spark.createDataFrame(
                    schema, "src string, pred string, dst string"
                )
            )
            edges = edges.unionByName(extra)
        return rdfs_entailment(edges, **kw)

    def owl_entail(self, schema: "DataFrame | list | None" = None,
                   **kw) -> DataFrame:
        """(src, pred, dst) — this graph closed under owl:inverseOf /
        SymmetricProperty / TransitiveProperty (operators/owl.py).
        ``schema`` unions extra declaration triples first, like
        :meth:`entail`. Compose ``owl_entail`` then :meth:`entail`
        for the full RDFS-Plus profile."""
        from naruhodo_spark.operators.owl import owl_entailment
        from naruhodo_spark.sparql import _as_edges

        edges = _as_edges(self._ksg_edges()).select("src", "pred", "dst")
        if schema is not None:
            extra = (
                schema.select("src", "pred", "dst")
                if isinstance(schema, DataFrame)
                else self.spark.createDataFrame(
                    schema, "src string, pred string, dst string"
                )
            )
            edges = edges.unionByName(extra)
        return owl_entailment(edges, **kw)

    def validate(self, shapes, entailed: bool = False, **kw) -> DataFrame:
        """(focus, shape_id, target_class, path, constraint, expected,
        actual) — SHACL-core violations of ``shapes`` (operators/
        shacl.py) by this graph; empty = conforms. ``entailed=True``
        validates the RDFS-entailed graph instead of the raw one, so
        class/target checks see derived types."""
        from naruhodo_spark.operators.shacl import validate_shapes
        from naruhodo_spark.sparql import _as_edges

        edges = (
            self.entail() if entailed
            else _as_edges(self._ksg_edges()).select("src", "pred", "dst")
        )
        return validate_shapes(edges, shapes, **kw)

    def fuse(self, iterations: int = 0) -> DataFrame:
        """(subj, pred, obj, confidence, n_sources, n_candidates) —
        one canonical value per (subject, predicate) slot, fused
        across the documents asserting it (operators/fuse.py):
        ``iterations=0`` → uniform-trust majority vote;
        ``iterations>=1`` → Pasternack-Roth Sums source-trust
        fixpoint, where documents contradicted by consensus lose
        weight."""
        from naruhodo_spark.operators import fuse as FU

        claims = (
            self._require_ksg()["triples_linked"]
            .where(F.col("subj_canon").isNotNull())
            .select(
                F.col("subj_canon").alias("subj"),
                "pred",
                F.coalesce(F.col("obj_canon"), F.lit("")).alias("obj"),
                F.col("doc_id").alias("source"),
            )
        )
        if iterations < 1:
            return FU.majority_vote(claims)
        return FU.fuse_claims(claims, iterations=iterations)["fused"]

    def complete(self, rules: "DataFrame | None" = None, **kw) -> DataFrame:
        """(subj, pred, obj, confidence, n_rules) — rule-based KG
        completion: edges predicted by forward-chaining ``rules``
        (default: this graph's own mined rules at confidence ≥ 0.5)
        that are not already in the graph
        (operators/rules.apply_rules)."""
        from naruhodo_spark.operators import rules as RU

        if rules is None:
            rules = self.mine_rules(min_confidence=0.5)
        return RU.apply_rules(self._ksg_edges(), rules, **kw)

    def inverse_predicates(self, **kw) -> DataFrame:
        """(pred_a, pred_b, jaccard, symmetric) — inverse/symmetric
        relation detection over this graph's edges
        (operators/relsyn.inverse_pairs)."""
        from naruhodo_spark.operators import relsyn as RS

        return RS.inverse_pairs(self._ksg_edges(), **kw)

    def diff(self, other: "parser | DataFrame", **kw) -> DataFrame:
        """Edge changelog vs another parser's graph (or a raw edge
        frame): added/removed/changed/same per (subj, pred, obj)
        (operators/kgdiff.py). ``self`` is the NEW snapshot."""
        from naruhodo_spark.operators import kgdiff as KD

        old = other._ksg_edges() if isinstance(other, parser) else other
        return KD.diff_edges(old, self._ksg_edges(), **kw)

    def random_walks(self, walks_per_node: int = 2, length: int = 5,
                     **kw) -> DataFrame:
        """Deterministic DeepWalk corpus over the KSG (ops/walks.py);
        feed to walks.skipgram_pairs for embedding training rows."""
        from naruhodo_spark.ops import walks as W

        edges = self._ksg_edges().where(F.col("obj") != "").select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
        return W.random_walks(edges, walks_per_node, length, **kw)

    def distances(
        self, landmarks: list[str], max_dist: int = 6,
        direction: str = "both",
    ) -> DataFrame:
        """(node, landmark, dist) — BFS distances to each landmark over
        the KSG (operators/graphstats.landmark_distances); feed to
        approx_distance for any-pair shortest-path upper bounds."""
        from naruhodo_spark.operators import graphstats as GS

        return GS.landmark_distances(
            self._ksg_edges(), landmarks, max_dist, direction
        )

    def verbalize(self, max_facts: int = 50) -> DataFrame:
        """KG→text (ops/verbalize.py, KELM-style): one deterministic
        training document per entity — feed back into the corpus ops
        or an LM pretraining mix."""
        from naruhodo_spark.ops import verbalize as VB

        return VB.verbalize_triples(self._ksg_edges(), max_facts=max_facts)

    def train_embeddings(self, dim: int = 16, iters: int = 20,
                         model: str = "transe",
                         **kw) -> dict[str, DataFrame]:
        """KG embeddings over the KSG: {"ent_emb", "rel_emb"} as
        (name, vec) DataFrames, kept distributed. ``model`` picks the
        family member — "transe" (translation, ops/kgembed.py),
        "distmult" (symmetric bilinear, ops/distmult.py), "complex"
        (complex bilinear, ops/complexe.py), "rotate" (complex
        rotation, ops/rotate.py); all share the same training-loop
        shape and accept the same kwargs."""
        from naruhodo_spark.ops import complexe as CXM
        from naruhodo_spark.ops import distmult as DMM
        from naruhodo_spark.ops import kgembed as KEM
        from naruhodo_spark.ops import rotate as RTM

        trainers = {
            "transe": KEM.train_transe,
            "distmult": DMM.train_distmult,
            "complex": CXM.train_complex,
            "rotate": RTM.train_rotate,
        }
        if model not in trainers:
            raise ValueError(
                f"unknown embedding model {model!r} — "
                f"one of {sorted(trainers)}"
            )
        return trainers[model](
            self._ksg_edges(), dim=dim, iters=iters, **kw
        )

    def train_node_embeddings(
        self, dim: int = 16, iterations: int = 10,
        walks_per_node: int = 2, length: int = 5, p: float = 1.0,
        q: float = 1.0, **kw,
    ) -> dict[str, DataFrame]:
        """DeepWalk/node2vec embeddings over the KSG: biased walks →
        skip-gram pairs → distributed SGNS (ops/walks + ops/w2v);
        {"in_emb", "out_emb"} as (name, vec) DataFrames. p = q = 1 is
        uniform DeepWalk."""
        from naruhodo_spark.ops import w2v as W2V
        from naruhodo_spark.ops import walks as W

        edges = self._ksg_edges().where(F.col("obj") != "").select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
        walks = W.biased_walks(
            edges, p=p, q=q, walks_per_node=walks_per_node, length=length
        )
        pairs = W.skipgram_pairs(walks, window=2).select("center", "context")
        return W2V.train_sgns(pairs, dim=dim, iterations=iterations, **kw)

    def evaluate_embeddings(
        self, model: dict[str, DataFrame], test: DataFrame, **kw
    ) -> DataFrame:
        """Filtered link-prediction metrics (ops/kglinkpred.py, Bordes
        2013 protocol) of a train_embeddings() model against held-out
        ``test`` triples (subj, pred, obj), with the full KSG as the
        known-true filter: one row per side + 'all' with n, n_unranked,
        mean rank, MRR, hits@k."""
        from naruhodo_spark.ops import kglinkpred as LPR

        ranks = LPR.rank_candidates(
            test, model["ent_emb"], model["rel_emb"],
            known=self._ksg_edges().select("subj", "pred", "obj"), **kw
        )
        return LPR.link_prediction_metrics(ranks)

    def triangles(self) -> DataFrame:
        """(node, triangles, degree, clustering) — degree-ordered
        triangle counting over the KSG (operators/graphstats.py)."""
        from naruhodo_spark.operators import graphstats as GS

        return GS.triangle_counts(self._ksg_edges())

    def find(
        self,
        pattern: "list[tuple[str, str | None, str]]",
        anti: "list[tuple[str, str | None, str]] | None" = None,
        distinct_nodes: bool = True,
    ) -> DataFrame:
        """GraphFrames-style motif search over the KSG: one column per
        node variable (plus ``?``-bound predicate variables), one row
        per embedding. The reference exposes ``parser.G`` for users to
        hand-roll pattern loops over the in-memory DiGraph; here the
        pattern compiles to a Catalyst equi-join chain
        (operators/motif.py) that never cross-joins."""
        from naruhodo_spark.operators.motif import match_motif_ksg

        return match_motif_ksg(
            self._ksg_edges(), pattern, anti=anti,
            distinct_nodes=distinct_nodes,
        )

    def add_urls(self, urls: list[str], n_partitions: int = 4) -> "parser":
        """Reference ``addUrls`` [PK naruhodo/parser.py +
        naruhodo/utils/scraper.py]: fetch each page and stage its text.
        Distributed via the ``naruhodo_web`` Python DataSource
        (websource.py) — the URL list fans out one fetch task per
        partition on the executors; the fetch itself is the documented
        injectable stub (no network in this environment)."""
        from naruhodo_spark.websource import WebDocumentSource

        bad = [u for u in urls if "|" in u]
        if bad:
            # '|' is the DataSource option separator — a pipe inside a
            # URL would silently split into bogus fetches
            raise ValueError(
                f"URLs containing '|' are not supported: {bad[:3]}"
            )
        self.spark.dataSource.register(WebDocumentSource)
        docs = (
            self.spark.read.format("naruhodo_web")
            .option("urls", "|".join(urls))
            .option("n_partitions", str(n_partitions))
            .load()
        )
        return self.add_documents(docs)

    addUrls = add_urls  # reference spelling

    # -- file-format ingest (sources.py) -----------------------------------
    def add_jsonl(self, path: str, **kw) -> "parser":
        from naruhodo_spark import sources as SRC

        return self.add_documents(
            SRC.read_documents_jsonl(self.spark, path, to_spans=True, **kw)
        )

    def add_csv(self, path: str, **kw) -> "parser":
        from naruhodo_spark import sources as SRC

        return self.add_documents(
            SRC.read_documents_csv(self.spark, path, to_spans=True, **kw)
        )

    def add_text_files(self, path: str) -> "parser":
        from naruhodo_spark import sources as SRC

        return self.add_documents(
            SRC.read_documents_text(self.spark, path, to_spans=True)
        )
