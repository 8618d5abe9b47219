package graft.operators

import graft.sources.Checkpoints.BarrierOps
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the document chunk-share graph (extension suite —
  * the reference has no graph operators; these add the link-analysis ops a
  * web-scale crawl-curation pipeline runs: importance ranking for crawl
  * prioritization, triangle/clustering structure for spam-farm detection).
  *
  * The graph: docs are nodes; an edge connects each doc to the
  * representative (min doc_id) of every 10-token chunk digest they share —
  * the same star-edge derivation as x_dedup_cc's band buckets, so edge
  * count is O(docs × chunks), never all-pairs-within-bucket, even when one
  * boilerplate chunk occurs in a million docs.
  *
  * Scale design notes:
  *  - everything after chunk digesting moves (id, id) or (id, long) pairs
  *    only — document text never shuffles;
  *  - PageRank runs in exact fixed-point INTEGER arithmetic (rank mass
  *    scaled by 1e12, per-edge floor division, 85/100 damping) so the
  *    result is bit-identical regardless of partitioning or summation
  *    order — a float PageRank diverges across engines/runs, an integer
  *    one cannot;
  *  - triangle counting uses the degree-ordered orientation (Suri-Vassilvitskii
  *    MR pattern, public knowledge): each undirected edge is oriented from
  *    the lower-(degree, id) endpoint to the higher, which caps wedge
  *    fan-out at O(sqrt(|E|)) per node and keeps the two-path join skew-safe
  *    even on a star-shaped spam hub.
  */
object GraphQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  /** Rank-mass scale: 1e12 integer units = total rank 1.0 across the
    * corpus (per-node base starts at SCALE/N). Large enough that 5
    * rounds of floor division lose < 1e-9 relative mass, small enough
    * that 85 × SCALE stays far inside signed-64 range. */
  private val Scale = 1000000000000L

  /** (doc_id, h) pairs — each doc's distinct 10-token chunk digests
    * (identical derivation to x_dedup_chunks' digest grid). */
  private def chunkDigests(d: DataFrame): DataFrame = d
    .select(col("doc_id"), split(col("text"), " ").as("toks"))
    .select(col("doc_id"), explode(expr(
      "transform(sequence(0, cast(ceil(size(toks) / 10.0) as int) - 1), " +
        "i -> md5(concat_ws(' ', slice(toks, i * 10 + 1, 10))))")).as("h"))
    .distinct()

  /** Symmetric distinct (src, dst) star edges: every doc ↔ the min doc
    * of each shared chunk digest. */
  private def starEdges(hx: DataFrame): DataFrame = {
    val rep = hx.groupBy(col("h"))
      .agg(min(col("doc_id")).as("m"), count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
    val star = hx.join(rep, Seq("h"))
      .filter(col("doc_id") =!= col("m"))
      .select(col("doc_id").as("a"), col("m").as("b"))
      .distinct()
    star.select(col("a").as("src"), col("b").as("dst"))
      .union(star.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
  }

  /** Size of the derived star-edge set the whole graph family runs on —
    * for the bench artifact's output-normalized scaling column. The
    * edge set is FIXTURE-SENSITIVE (it grows with shared-chunk density,
    * not just row count), so a raw wall ratio at 8× corpus can hide a
    * derived-edge explosion exactly the way the dedup joins' raw ratios
    * hid output-bound pair growth before round 8; reporting
    * edges-emitted at both scales makes per-edge cost the comparable
    * number. */
  private[graft] def derivedEdgeCount(s: SparkSession, dir: String): Long =
    starEdges(chunkDigests(docs(s, dir))).count()

  /** The shared DuckDB edge-derivation prelude (chunk digests → star →
    * symmetric edges + out-degrees), verbatim-replayed so both graph
    * oracles see the identical graph. */
  private val edgesSql = """
      WITH n AS (SELECT doc_id, string_split(text, ' ') AS toks,
                   CAST(ceil(len(string_split(text, ' ')) / 10.0) AS INT)
                     AS n_chunks
                 FROM documents),
      ch AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS ci FROM n),
      hx AS (SELECT DISTINCT doc_id,
               md5(array_to_string(toks[ci*10+1 : ci*10+10], ' ')) AS h
             FROM ch),
      rep AS (SELECT h, min(doc_id) AS m FROM hx
              GROUP BY h HAVING count(*) > 1),
      star AS (SELECT x.doc_id AS a, r.m AS b
               FROM hx x JOIN rep r USING (h) WHERE x.doc_id <> r.m),
      edges AS (SELECT a AS src, b AS dst FROM star
                UNION SELECT b, a FROM star),
      deg AS (SELECT src, CAST(count(*) AS BIGINT) AS od
              FROM edges GROUP BY src)"""

  /** PageRank importance over the chunk-share graph — 5 damped rounds
    * (d = 85/100) in exact integer fixed-point: r'ᵢ = (15·base)÷100 +
    * (85·Σⱼ→ᵢ rⱼ÷outdegⱼ)÷100, all floor divisions. Summation order
    * cannot perturb the result (integer adds commute), so Spark at any
    * partitioning and DuckDB's serial replay agree bit-exactly — the
    * property float PageRank fundamentally lacks. Dangling docs keep the
    * teleport share only.
    *
    * Scale shape: each round is one (edge ⨝ rank-by-src) shuffle plus a
    * grouped sum keyed by dst — two longs per edge in flight, text never
    * moves; 5 rounds is the fixed crawl-ranking budget (not a
    * convergence loop), so the plan depth is static. */
  val pagerank: QueryDef = QueryDef(
    "x_graph_pagerank",
    (s, dir) => {
      val d = docs(s, dir)
      // materialize the derived graph ONCE (same localCheckpoint pattern
      // as x_dedup_cc): without it every loop reference re-derives
      // edges-from-text — the lazy plan held 114 parquet scans of the
      // corpus. Checkpointed state is (src, dst, od) longs only; on a
      // real cluster swap localCheckpoint for a reliable checkpoint dir
      // so executor loss doesn't force a re-derivation.
      val edges = starEdges(chunkDigests(d)).barrier()
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
        .barrier()
      // per-edge contribution denominator rides with the edge, so each
      // round's join touches ranks only
      val edgesDeg = edges.join(deg, Seq("src"))
      val nodes = d.select(col("doc_id"))
      val base = nodes.agg(count(lit(1)).as("n"))
        .select(expr(s"${Scale}L div n").as("base"))
      // id + constant per node, referenced by all 5 rounds — checkpoint
      // cuts the repeated doc scan (cheap but not free × rounds)
      val nodesBase = nodes.crossJoin(broadcast(base)).barrier()
      var ranks = nodesBase.select(col("doc_id"), col("base").as("r"))
      for (_ <- 1 to 5) {
        val contrib = edgesDeg
          .join(ranks.select(col("doc_id").as("src"), col("r")), Seq("src"))
          .groupBy(col("dst")).agg(sum(expr("r div od")).as("c"))
        ranks = nodesBase
          .join(contrib.withColumnRenamed("dst", "doc_id"),
            Seq("doc_id"), "left_outer")
          .select(col("doc_id"), expr(
            "(15 * base) div 100 + (85 * coalesce(c, 0L)) div 100").as("r"))
      }
      ranks.join(deg.withColumnRenamed("src", "doc_id"),
          Seq("doc_id"), "left_outer")
        .select(col("doc_id"), coalesce(col("od"), lit(0L)).as("out_deg"),
          col("r").as("rank"))
        .orderBy(col("doc_id"))
    },
    oracle = Some {
      val its = (1 to 5).map { i =>
        s"""it$i AS (SELECT b.doc_id,
             (15 * b.base) // 100 + (85 * coalesce(c.c, 0)) // 100 AS r
           FROM base b LEFT JOIN (
             SELECT e.dst AS doc_id,
               CAST(sum(it${i - 1}.r // d.od) AS BIGINT) AS c
             FROM edges e JOIN it${i - 1} ON it${i - 1}.doc_id = e.src
               JOIN deg d ON d.src = e.src
             GROUP BY e.dst) c USING (doc_id))"""
      }.mkString(",\n")
      edgesSql + s""",
      base AS (SELECT doc_id,
                 1000000000000 // (SELECT count(*) FROM n) AS base
               FROM n),
      it0 AS (SELECT doc_id, base AS r FROM base),
      $its
      SELECT b.doc_id, coalesce(d.od, 0) AS out_deg,
             CAST(it5.r AS BIGINT) AS rank
      FROM base b LEFT JOIN deg d ON d.src = b.doc_id
        JOIN it5 ON it5.doc_id = b.doc_id
      ORDER BY b.doc_id"""
    }
  )

  /** Per-doc triangle participation counts (clustering structure — link
    * farms and template rings close triangles; organic crawl graphs are
    * locally tree-ish). Degree-ordered orientation: each undirected edge
    * points from its lower-(degree, id) endpoint to the higher; every
    * triangle then has exactly one wedge (a→b, a→c with b→c closing), so
    * one two-path join + one closing-edge semi join counts each triangle
    * once, and per-node counts credit all three corners.
    *
    * Scale shape: orientation caps any node's out-degree at O(√|E|)
    * (Suri-Vassilvitskii), so the wedge join cannot blow up on a hub
    * node; everything in flight is (id, id) pairs. */
  val triangles: QueryDef = QueryDef(
    "x_graph_triangles",
    (s, dir) => {
      // one materialization of the derived graph (see pagerank note):
      // oriented is read three times below (both wedge sides + closing)
      val edges = starEdges(chunkDigests(docs(s, dir))).barrier()
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("dg"))
      // orient: src < dst by (degree, id) — each undirected edge once
      val oriented = edges
        .join(deg.withColumnRenamed("src", "u")
          .withColumnRenamed("dg", "du"), col("src") === col("u"))
        .join(deg.withColumnRenamed("src", "v")
          .withColumnRenamed("dg", "dv"), col("dst") === col("v"))
        .filter(col("du") < col("dv") ||
          (col("du") === col("dv") && col("src") < col("dst")))
        .select(col("src").as("a"), col("dst").as("b"))
        .barrier()
      val wedges = oriented.as("e1")
        .join(oriented.as("e2"),
          col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"),
          col("e2.b").as("z"))
      // closing edge may be oriented y→z or z→y
      val closing = oriented.select(col("a").as("p"), col("b").as("q"))
        .union(oriented.select(col("b").as("p"), col("a").as("q")))
        .distinct()
      val tris = wedges.join(closing,
        col("y") === col("p") && col("z") === col("q"), "left_semi")
      val perNode = tris.select(explode(array(col("x"), col("y"),
          col("z"))).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
      perNode.orderBy(col("doc_id"))
    },
    oracle = Some(edgesSql + """,
      ornt AS (SELECT e.src AS a, e.dst AS b
               FROM edges e
                 JOIN deg du ON du.src = e.src
                 JOIN deg dv ON dv.src = e.dst
               WHERE du.od < dv.od
                  OR (du.od = dv.od AND e.src < e.dst)),
      wedge AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM ornt e1 JOIN ornt e2
                  ON e1.a = e2.a AND e1.b < e2.b),
      tri AS (SELECT w.x, w.y, w.z FROM wedge w
              WHERE EXISTS (SELECT 1 FROM ornt o
                            WHERE (o.a = w.y AND o.b = w.z)
                               OR (o.a = w.z AND o.b = w.y))),
      corner AS (SELECT x AS doc_id FROM tri
                 UNION ALL SELECT y FROM tri
                 UNION ALL SELECT z FROM tri)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
      FROM corner GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Community detection by synchronous label propagation — 4 fixed
    * rounds; each node adopts the most frequent label among its
    * neighbors PLUS its own current label (the self-vote/inertia
    * variant: without it a 2-node component oscillates forever under
    * synchronous updates — and shared-chunk components are very often
    * pairs), ties broken by the smallest label. Both the round count and
    * the tie rule are fixed, so the result is deterministic under any
    * partitioning: per-(node,label) counts are exact integers and the
    * argmax is (count desc, label asc). Communities here are template/
    * boilerplate families — the clusters a curation pipeline caps or
    * downsamples as a group.
    *
    * Scale shape: each round is one (edge ⨝ label-by-src) shuffle plus
    * two grouped aggregations keyed by node — three longs per edge in
    * flight; labels are localCheckpointed per round so the lineage stays
    * O(1) deep (swap for a reliable checkpoint dir on a real cluster). */
  /** The 4-round self-vote LPA loop, shared by x_graph_labelprop and
    * x_graph_modularity: returns the final (doc_id, lab) table. */
  private def lpaLabels(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // self-loop per node implements the self-vote; star edges carry
    // the neighbor votes
    val edges = starEdges(chunkDigests(d))
      .union(d.select(col("doc_id").as("src"), col("doc_id").as("dst")))
      .barrier()
    var labels = d.select(col("doc_id"), col("doc_id").as("lab"))
      .barrier()
    for (_ <- 1 to 4) {
      val cnt = edges
        .join(labels.select(col("doc_id").as("src"), col("lab")),
          Seq("src"))
        .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("c"))
      // most-frequent neighbor label, smallest label on count ties:
      // (c, -lab) is unique per dst, so max_by is deterministic
      val best = cnt.groupBy(col("dst"))
        .agg(expr("max_by(lab, struct(c, -lab))").as("blab"))
      labels = labels
        .join(best.withColumnRenamed("dst", "doc_id"),
          Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("blab"), col("lab")).as("lab"))
        .barrier()
    }
    labels
  }

  /** The LPA rounds as DuckDB CTEs (cnt1..best4..lp4), shared by both
    * oracles; expects `edges2` (edges + self-loops) and `lp0` defined. */
  private val lpaRoundsSql: String = (1 to 4).map { i =>
    s"""cnt$i AS (SELECT e.dst AS doc_id, l.lab, count(*) AS c
           FROM edges2 e JOIN lp${i - 1} l ON l.doc_id = e.src
           GROUP BY e.dst, l.lab),
         best$i AS (SELECT doc_id, lab FROM (
             SELECT doc_id, lab, row_number() OVER
               (PARTITION BY doc_id ORDER BY c DESC, lab ASC) AS rn
             FROM cnt$i) WHERE rn = 1),
         lp$i AS (SELECT p.doc_id, coalesce(b.lab, p.lab) AS lab
           FROM lp${i - 1} p LEFT JOIN best$i b USING (doc_id))"""
  }.mkString(",\n")

  val labelprop: QueryDef = QueryDef(
    "x_graph_labelprop",
    (s, dir) => {
      val labels = lpaLabels(s, dir)
      val sizes = labels.groupBy(col("lab"))
        .agg(count(lit(1)).as("community_size"))
      labels.join(sizes, Seq("lab"))
        .select(col("doc_id"), col("lab").as("community"),
          col("community_size"))
        .orderBy(col("doc_id"))
    },
    oracle = Some(edgesSql + s""",
      edges2 AS (SELECT src, dst FROM edges
                 UNION ALL SELECT doc_id, doc_id FROM n),
      lp0 AS (SELECT doc_id, doc_id AS lab FROM n),
      $lpaRoundsSql,
      sz AS (SELECT lab, CAST(count(*) AS BIGINT) AS community_size
             FROM lp4 GROUP BY lab)
      SELECT l.doc_id, l.lab AS community, s.community_size
      FROM lp4 l JOIN sz s USING (lab) ORDER BY l.doc_id""")
  )

  /** Newman MODULARITY of the LPA partition — the number that says
    * whether the detected communities are real structure or noise:
    * Q = Σ_c [ e_c/E − (d_c/E)² ] over the symmetric star-edge graph
    * (e_c = intra-community directed edges, d_c = community out-degree
    * mass, E = total directed edges; self-loops excluded). A curation
    * pipeline reads per-community q_contrib to decide which template
    * families are coherent enough to cap as a unit, and q_total to
    * compare parameterizations. Exact integer edge counts → the only
    * doubles are the final ratios; oracle replays the LPA chain and the
    * rollup.
    *
    * Scale shape: one (edge ⨝ label) keyed join — (src, dst, lab) longs
    * in flight — then |communities|-row aggregation; E broadcasts as a
    * one-row count. */
  val modularity: QueryDef = QueryDef(
    "x_graph_modularity",
    (s, dir) => {
      val edges = starEdges(chunkDigests(docs(s, dir))).barrier()
      val labels = lpaLabels(s, dir)
      val tot = edges.agg(count(lit(1)).cast("double").as("m"))
      val el = edges
        .join(labels.select(col("doc_id").as("src"), col("lab").as("lsrc")),
          Seq("src"))
        .join(labels.select(col("doc_id").as("dst"), col("lab").as("ldst")),
          Seq("dst"))
      val intra = el.filter(col("lsrc") === col("ldst"))
        .groupBy(col("lsrc").as("community"))
        .agg(count(lit(1)).as("intra_edges"))
      val degc = el.groupBy(col("lsrc").as("community"))
        .agg(count(lit(1)).as("degree_sum"))
      val members = labels.groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("n_members"))
      val per = members
        .join(intra, Seq("community"), "left")
        .join(degc, Seq("community"), "left")
        .select(col("community"), col("n_members"),
          coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
          coalesce(col("degree_sum"), lit(0L)).as("degree_sum"))
        .crossJoin(broadcast(tot))
        .withColumn("qc", col("intra_edges").cast("double") / col("m")
          - (col("degree_sum").cast("double") / col("m"))
            * (col("degree_sum").cast("double") / col("m")))
      // Q total is a plain two-phase aggregate broadcast back onto every
      // community row — no global window; per-community terms round to 12
      // decimals and sum through exact DECIMAL so the partial-agg order
      // cannot perturb the statistic
      val qtot = per.agg(
        round(sum(round(col("qc"), 12).cast("decimal(28,12)"))
          .cast("double"), 6).as("q_total"))
      per
        .withColumn("q_contrib", round(col("qc"), 6))
        .crossJoin(broadcast(qtot))
        .select(col("community"), col("n_members"), col("intra_edges"),
          col("degree_sum"), col("q_contrib"), col("q_total"))
        .orderBy(col("community"))
    },
    oracle = Some(edgesSql + s""",
      edges2 AS (SELECT src, dst FROM edges
                 UNION ALL SELECT doc_id, doc_id FROM n),
      lp0 AS (SELECT doc_id, doc_id AS lab FROM n),
      $lpaRoundsSql,
      mm AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM edges),
      el AS (SELECT ls.lab AS lsrc, ld.lab AS ldst
             FROM edges e
             JOIN lp4 ls ON ls.doc_id = e.src
             JOIN lp4 ld ON ld.doc_id = e.dst),
      intra AS (SELECT lsrc AS community, CAST(count(*) AS BIGINT)
                  AS intra_edges
                FROM el WHERE lsrc = ldst GROUP BY lsrc),
      degc AS (SELECT lsrc AS community, CAST(count(*) AS BIGINT)
                 AS degree_sum
               FROM el GROUP BY lsrc),
      mem AS (SELECT lab AS community, count(*) AS n_members
              FROM lp4 GROUP BY lab),
      jj AS (SELECT mem.community, mem.n_members,
               coalesce(intra.intra_edges, 0) AS intra_edges,
               coalesce(degc.degree_sum, 0) AS degree_sum
             FROM mem LEFT JOIN intra USING (community)
                      LEFT JOIN degc USING (community)),
      tt AS (SELECT jj.*,
               CAST(intra_edges AS DOUBLE) / mm.m
                 - (CAST(degree_sum AS DOUBLE) / mm.m)
                   * (CAST(degree_sum AS DOUBLE) / mm.m) AS qc
             FROM jj CROSS JOIN mm),
      qt AS (SELECT round(CAST(sum(CAST(round(qc, 12) AS DECIMAL(28,12)))
                    AS DOUBLE), 6) AS q_total FROM tt)
      SELECT community, n_members, intra_edges, degree_sum,
             round(qc, 6) AS q_contrib, qt.q_total
      FROM tt CROSS JOIN qt ORDER BY community""")
  )

  /** Exactly-2-hop reachability counts — distinct nodes reachable in two
    * steps but not one (and not self): the friend-of-friend expansion a
    * crawl scheduler uses to estimate frontier growth, and a template-
    * ring detector (high 2-hop mass with low direct degree = hub-and-
    * spoke boilerplate).
    *
    * Scale shape: the two-path join is the same wedge generation as
    * triangle counting (bounded by Σ deg² — the star-edge derivation
    * already caps hub degree by construction since every bucket
    * contributes only representative edges); everything in flight is
    * (id, id) pairs, deduped before the anti join against direct edges. */
  val khop: QueryDef = QueryDef(
    "x_graph_khop",
    (s, dir) => {
      val edges = starEdges(chunkDigests(docs(s, dir))).barrier()
      val two = edges.as("e1")
        .join(edges.as("e2"), col("e1.dst") === col("e2.src"))
        .filter(col("e1.src") =!= col("e2.dst"))
        .select(col("e1.src").as("src"), col("e2.dst").as("d2"))
        .distinct()
      val strict = two.join(
        edges.select(col("src"), col("dst").as("d2")),
        Seq("src", "d2"), "left_anti")
      strict.groupBy(col("src")).agg(count(lit(1)).as("n_2hop"))
        .withColumnRenamed("src", "doc_id")
        .orderBy(col("doc_id"))
    },
    oracle = Some(edgesSql + """,
      two AS (SELECT DISTINCT e1.src, e2.dst AS d2
              FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
              WHERE e1.src <> e2.dst),
      strict AS (SELECT t.src, t.d2 FROM two t
                 WHERE NOT EXISTS (SELECT 1 FROM edges e
                                   WHERE e.src = t.src AND e.dst = t.d2))
      SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS n_2hop
      FROM strict GROUP BY src ORDER BY doc_id""")
  )

  def defs: Seq[QueryDef] = Seq(pagerank, triangles, labelprop, khop,
    modularity)
}
