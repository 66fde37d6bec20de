package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Link-graph operators — the analysis a crawl's outlink harvest feeds
 * (reference: the extracted-triple outlinks of libspider/processors/
 * rdf.c drive frontier growth; ranking those pages is the canonical
 * downstream consumer). The graph here is derived deterministically from
 * the dense `documents.doc_id` space (three modular out-edges per doc),
 * so both engines construct bit-identical edges with no external data.
 */
object GraphOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Iterations and arithmetic shared with the oracle: rank in exact
    * integer µ-units, damping 850/1000, floor division at every step. */
  private val PrIters = 6

  /** q53: PageRank over the doc link graph, exact-integer fixpoint.
    *
    * Node s has outdeg(s) = 1 + s%3 out-edges, the first outdeg(s) of
    * ((7s+1)%n, (13s+2)%n, (31s+3)%n) — the VARYING out-degree is what
    * makes the graph irregular at every n (a fixed 3 edges through
    * gcd-1 multipliers is three bijections: in-degree exactly 3
    * everywhere and PageRank collapses to uniform). r_0 = 1_000_000 µ;
    * per iteration each node sends floor(r/outdeg) along each out-edge
    * and r'(v) = 150_000 + floor(850·Σin / 1000). Floor at every step
    * keeps both engines bit-identical (the q37 k-means recipe); the
    * DuckDB oracle replays all K iterations as chained CTEs.
    *
    * Scale shape: the classic distributed PageRank loop — edges built
    * once and persisted (reused by every iteration), each iteration ONE
    * equi-join ranks⋈edges on src + a map-side-combined groupBy(dst) +
    * a left join back to the node list for dangling-in-degree nodes;
    * ranks re-materialized per iteration via lazy localCheckpoint (the
    * q18 pattern) so iteration k never replays iterations 1..k-1. At
    * 100 TB the joins shuffle on src/dst exactly like every published
    * Spark PageRank; nothing is collected to the driver but the node
    * count. */
  def pageRank(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id")).persist()
    val n = d.count()
    val edges = d.select(col("doc_id").as("src"),
      explode(slice(array(
        (col("doc_id") * 7 + 1) % n,
        (col("doc_id") * 13 + 2) % n,
        (col("doc_id") * 31 + 3) % n),
        lit(1), (col("doc_id") % 3 + 1).cast("int"))).as("dst"))
      .persist() // consumed by one action per iteration
    // State per iteration = the SPARSE in-mass table (nodes that received
    // mass); rank reconstructs inline as 150000 + (850·mass) div 1000
    // with absent ⟺ mass 0 — the same arithmetic the r5 loop applied
    // after a per-iteration left join back to the FULL node list, which
    // existed only to materialize the dangling-in-degree ranks every
    // round (the q56 sparse-intermediates fix; the reattachment happens
    // once, in the final projection). Iteration 1 needs no ranks join at
    // all (every rank is the 1e6 seed).
    var mass: DataFrame = null
    for (k <- 1 to PrIters) {
      val contrib =
        if (mass == null)
          edges.select(col("dst"),
            expr("1000000L div (src % 3 + 1)").as("c"))
        else
          edges.join(mass.withColumnRenamed("doc_id", "src"), Seq("src"),
              "left")
            .select(col("dst"),
              expr("(150000L + (850 * coalesce(in_mass, 0L)) div 1000)" +
                " div (src % 3 + 1)").as("c"))
      val next = contrib.groupBy(col("dst").as("doc_id"))
        .agg(sum("c").as("in_mass"))
      // truncate the plan each round (the q18/q37 lesson)
      mass = if (k < PrIters) next.localCheckpoint(false) else next
    }
    d.join(mass, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (lit(150000L) + expr("(850 * coalesce(in_mass, 0L)) div 1000"))
          .as("rank_u"))
  }

  val pageRankSql: String = {
    val sb = new StringBuilder
    sb ++= """WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
      |            FROM documents),
      |e AS (SELECT doc_id AS src, unnest(([
      |        (doc_id * 7 + 1) % n, (doc_id * 13 + 2) % n,
      |        (doc_id * 31 + 3) % n])[1:CAST(doc_id % 3 + 1 AS INT)])
      |        AS dst
      |      FROM documents, nn),
      |r0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS rank_u
      |       FROM documents)""".stripMargin
    for (k <- 1 to PrIters) {
      sb ++= s""",
      |r$k AS (
      |  SELECT d.doc_id,
      |    CAST(150000 + (850 * COALESCE(s.in_mass, 0)) // 1000 AS BIGINT)
      |      AS rank_u
      |  FROM documents d
      |  LEFT JOIN (
      |    SELECT e.dst AS doc_id,
      |      CAST(SUM(r.rank_u // (e.src % 3 + 1)) AS BIGINT) AS in_mass
      |    FROM e JOIN r${k - 1} r ON e.src = r.doc_id
      |    GROUP BY e.dst) s ON d.doc_id = s.doc_id)""".stripMargin
    }
    sb ++= s"\nSELECT doc_id, rank_u FROM r$PrIters"
    sb.toString
  }

  /** q55: per-node triangle counts over the undirected doc link graph —
    * the clustering-structure statistic (link farms and boilerplate
    * mirror clusters are triangle-dense; organic link graphs are
    * sparse). Edge set = q53's modular out-edges PLUS each doc's
    * sequential neighborhood (s→s+1, s→s+2 mod n — the prev/next-page
    * links real site graphs have; they close a triangle at every
    * consecutive triple, the modular edges add irregular closures),
    * made undirected (least/greatest + distinct, self-loops dropped).
    *
    * Scale shape: the published degree-ordering trick (node order =
    * deg·n + id, every edge oriented low→high order) so each triangle is
    * enumerated exactly once AT ITS LOWEST-DEGREE VERTEX — wedge fan-out
    * is Σ min-side deg² = O(m^1.5) instead of Σ deg² blowing up on hubs.
    * All joins are key-partitioned equi-joins (wedge self-join on the
    * pivot `a`, closing check on (b,c)); no cartesian, no BNLJ, nothing
    * driver-side but the node count. */
  def triangles(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id")).persist()
    val n = d.count()
    val und = d.select(col("doc_id").as("src"),
        explode(concat(
          slice(array(
            (col("doc_id") * 7 + 1) % n,
            (col("doc_id") * 13 + 2) % n,
            (col("doc_id") * 31 + 3) % n),
            lit(1), (col("doc_id") % 3 + 1).cast("int")),
          array((col("doc_id") + 1) % n, (col("doc_id") + 2) % n)))
          .as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = und.select(col("u").as("id"))
      .union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).cast("long").as("deg"))
    // total order by (degree, id) packed into one bigint — unique since
    // id is unique; deg <= n so deg*n + id never collides or overflows
    val ord = deg.select(col("id"), (col("deg") * n + col("id")).as("ord"))
    val oriented = und
      .join(ord.select(col("id").as("u"), col("ord").as("ou")), Seq("u"))
      .join(ord.select(col("id").as("v"), col("ord").as("ov")), Seq("v"))
      .select(
        when(col("ou") < col("ov"), col("u")).otherwise(col("v")).as("a"),
        when(col("ou") < col("ov"), col("v")).otherwise(col("u")).as("b"),
        when(col("ou") < col("ov"), col("ov")).otherwise(col("ou"))
          .as("ob"))
      .persist() // wedge side ×2 + closing side of one action
    val wedges = oriented.as("x")
      .join(oriented.as("y"),
        col("x.a") === col("y.a") && col("x.ob") < col("y.ob"))
      .select(col("x.a").as("a"), col("x.b").as("b"), col("y.b").as("c"))
    val tri = wedges.join(
      oriented.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).cast("long").as("tri_cnt"))
    d.join(perNode, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"))
  }

  /** Distinct, self-loop-free directed modular edges — the simple-graph
    * edge set q56/q57 operate on (q53 deliberately keeps the raw
    * multi-set: PageRank mass splits by out-degree either way). */
  private def simpleEdges(d: DataFrame, n: Long): DataFrame =
    d.select(col("doc_id").as("src"),
        explode(slice(array(
          (col("doc_id") * 7 + 1) % n,
          (col("doc_id") * 13 + 2) % n,
          (col("doc_id") * 31 + 3) % n),
          lit(1), (col("doc_id") % 3 + 1).cast("int"))).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

  private val HitsIters = 4

  /** q56: HITS hubs & authorities over the directed doc link graph —
    * the link-analysis complement of q53 (PageRank scores a page's
    * random-surfer mass; HITS separates pages that POINT AT good
    * content from pages that ARE good content). Exact-integer
    * fixpoint: score space is µ-units in [0, 10^6]; each half-step
    * sums the opposite score over in-/out-edges and renormalizes by
    * the global max via floor division — both engines replay the K=4
    * iterations bit-for-bit.
    *
    * Scale shape (the q37 Lloyd recipe): per half-step ONE equi-join
    * edges⋈scores + a map-side-combined groupBy + a dangling left
    * join; the raw-score table is lazily localCheckpoint'ed and its
    * single driver-read scalar (the max) comes from that same
    * materialization, so each iteration costs exactly two counting
    * jobs and plans never nest. Edges persisted once. */
  def hits(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id")).persist()
    val n = d.count()
    val e = simpleEdges(d, n).persist()
    // Intermediate half-steps carry ONLY nodes that received mass: a node
    // absent from the score table is exactly a zero score (inner joins
    // drop its zero contributions, max ignores zeros, 0 div mx = 0), so
    // the per-half-step dangling left-join back to the full node list —
    // 8 joins in the r5 spelling — collapses to the two left-joins of the
    // final projection. The renormalizing max rides a 1-row broadcast
    // over the SAME checkpoint leaf (both references resolve to one RDD);
    // the r5 spelling additionally read it to the driver with agg().head
    // per half-step — 8 driver-synchronous jobs moving one scalar each.
    var h = d.select(col("doc_id"), lit(1000000L).as("hub"))
    var a: DataFrame = null
    for (k <- 1 to HitsIters) {
      val araw = e
        .join(h.select(col("doc_id").as("src"), col("hub")), Seq("src"))
        .groupBy(col("dst").as("doc_id"))
        .agg(sum("hub").as("araw"))
        .localCheckpoint(false)
      a = araw.crossJoin(broadcast(araw.agg(max("araw").as("amx"))))
        .select(col("doc_id"), expr("(araw * 1000000) div amx").as("auth"))
      val hraw = e
        .join(a.select(col("doc_id").as("dst"), col("auth")), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(sum("auth").as("hraw"))
        .localCheckpoint(false)
      h = hraw.crossJoin(broadcast(hraw.agg(max("hraw").as("hmx"))))
        .select(col("doc_id"), expr("(hraw * 1000000) div hmx").as("hub"))
    }
    d.join(h, Seq("doc_id"), "left").join(a, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("hub"), lit(0L)).as("hub_u"),
        coalesce(col("auth"), lit(0L)).as("auth_u"))
  }

  val hitsSql: String = {
    val sb = new StringBuilder
    sb ++= """WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
      |            FROM documents),
      |de AS (SELECT doc_id AS src,
      |         unnest(list_filter(([
      |           (doc_id * 7 + 1) % n, (doc_id * 13 + 2) % n,
      |           (doc_id * 31 + 3) % n])[1:CAST(doc_id % 3 + 1 AS INT)],
      |           x -> x <> doc_id)) AS dst
      |       FROM documents, nn),
      |e AS (SELECT DISTINCT src, dst FROM de),
      |h0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS hub
      |       FROM documents)""".stripMargin
    for (k <- 1 to HitsIters) {
      sb ++= s""",
      |ar$k AS (SELECT d.doc_id, CAST(COALESCE(s.m, 0) AS BIGINT) AS araw
      |        FROM documents d LEFT JOIN (
      |          SELECT e.dst AS doc_id, CAST(SUM(h.hub) AS BIGINT) AS m
      |          FROM e JOIN h${k - 1} h ON e.src = h.doc_id
      |          GROUP BY e.dst) s ON d.doc_id = s.doc_id),
      |a$k AS (SELECT doc_id, (araw * 1000000) // mx AS auth
      |       FROM ar$k, (SELECT MAX(araw) AS mx FROM ar$k)),
      |hr$k AS (SELECT d.doc_id, CAST(COALESCE(s.m, 0) AS BIGINT) AS hraw
      |        FROM documents d LEFT JOIN (
      |          SELECT e.src AS doc_id, CAST(SUM(a.auth) AS BIGINT) AS m
      |          FROM e JOIN a$k a ON e.dst = a.doc_id
      |          GROUP BY e.src) s ON d.doc_id = s.doc_id),
      |h$k AS (SELECT doc_id, (hraw * 1000000) // mx AS hub
      |       FROM hr$k, (SELECT MAX(hraw) AS mx FROM hr$k))""".stripMargin
    }
    sb ++= s"""
      |SELECT h.doc_id, h.hub AS hub_u, a.auth AS auth_u
      |FROM h$HitsIters h JOIN a$HitsIters a ON h.doc_id = a.doc_id"""
      .stripMargin
    sb.toString
  }

  /** q57: host-graph contraction — collapse the doc link graph onto the
    * `source` dimension (the host/site rollup a crawl's outlink harvest
    * feeds: which sites cite which, how often, and how mutually). Per
    * directed source pair: distinct doc-edge count, reciprocated-edge
    * count (the reverse doc edge also exists — mutual-link rate
    * separates organic citation from link exchanges), and distinct
    * citing docs.
    *
    * Scale shape: the doc→host mapping joins are shuffle equi-joins on
    * doc id (the standard dimension join; AQE picks broadcast when the
    * doc table is small enough); reciprocity is ONE self equi-join of
    * the distinct edge set on the reversed key — never an all-pairs
    * expansion; the final rollup is host-pair-bounded with map-side
    * combine. */
  def hostGraph(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("source")).persist()
    val n = d.count()
    val e = simpleEdges(d.select(col("doc_id")), n).persist()
    val marked = e.join(
        e.select(col("dst").as("src"), col("src").as("dst"),
          lit(1L).as("r")), Seq("src", "dst"), "left")
      .select(col("src"), col("dst"), coalesce(col("r"), lit(0L)).as("is_recip"))
    marked
      .join(d.select(col("doc_id").as("src"), col("source").as("s_src")),
        Seq("src"))
      .join(d.select(col("doc_id").as("dst"), col("source").as("s_dst")),
        Seq("dst"))
      .groupBy("s_src", "s_dst")
      .agg(count(lit(1)).cast("long").as("n_edges"),
        sum("is_recip").cast("long").as("n_recip"),
        countDistinct(col("src")).cast("long").as("n_src_docs"))
  }

  val hostGraphSql: String =
    """WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      |de AS (SELECT doc_id AS src,
      |         unnest(list_filter(([
      |           (doc_id * 7 + 1) % n, (doc_id * 13 + 2) % n,
      |           (doc_id * 31 + 3) % n])[1:CAST(doc_id % 3 + 1 AS INT)],
      |           x -> x <> doc_id)) AS dst
      |       FROM documents, nn),
      |e AS (SELECT DISTINCT src, dst FROM de),
      |em AS (SELECT e.src, e.dst,
      |         CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END AS is_recip
      |       FROM e LEFT JOIN e r ON e.src = r.dst AND e.dst = r.src)
      |SELECT d1.source AS s_src, d2.source AS s_dst,
      |  CAST(COUNT(*) AS BIGINT) AS n_edges,
      |  CAST(SUM(is_recip) AS BIGINT) AS n_recip,
      |  CAST(COUNT(DISTINCT em.src) AS BIGINT) AS n_src_docs
      |FROM em
      |JOIN documents d1 ON em.src = d1.doc_id
      |JOIN documents d2 ON em.dst = d2.doc_id
      |GROUP BY 1, 2""".stripMargin

  val trianglesSql: String =
    """WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      |de AS (SELECT doc_id AS src,
      |         unnest(list_filter(list_concat(([
      |           (doc_id * 7 + 1) % n, (doc_id * 13 + 2) % n,
      |           (doc_id * 31 + 3) % n])[1:CAST(doc_id % 3 + 1 AS INT)],
      |           [(doc_id + 1) % n, (doc_id + 2) % n]),
      |           d -> d <> doc_id)) AS dst
      |       FROM documents, nn),
      |ue AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      |       FROM de),
      |dg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg
      |       FROM (SELECT u AS id FROM ue UNION ALL SELECT v FROM ue)
      |       GROUP BY id),
      |od AS (SELECT id, deg * n + id AS ord FROM dg, nn),
      |oe AS (SELECT CASE WHEN ou < ov THEN u ELSE v END AS a,
      |              CASE WHEN ou < ov THEN v ELSE u END AS b,
      |              CASE WHEN ou < ov THEN ov ELSE ou END AS ob
      |       FROM (SELECT ue.u, ue.v, x.ord AS ou, y.ord AS ov
      |             FROM ue
      |             JOIN od x ON ue.u = x.id
      |             JOIN od y ON ue.v = y.id)),
      |tri AS (SELECT e1.a, e1.b, e2.b AS c
      |        FROM oe e1
      |        JOIN oe e2 ON e1.a = e2.a AND e1.ob < e2.ob
      |        JOIN oe e3 ON e3.a = e1.b AND e3.b = e2.b),
      |pn AS (SELECT id AS doc_id, CAST(COUNT(*) AS BIGINT) AS tri_cnt
      |       FROM (SELECT unnest([a, b, c]) AS id FROM tri)
      |       GROUP BY id)
      |SELECT d.doc_id, CAST(COALESCE(p.tri_cnt, 0) AS BIGINT) AS tri_cnt
      |FROM documents d LEFT JOIN pn p ON d.doc_id = p.doc_id""".stripMargin
}
