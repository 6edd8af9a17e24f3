package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Graph analytics over the relational fixture (charter extension —
  * the link-analysis family a data-curation stack reaches for when
  * ranking sources/domains, e.g. quality-weighting a crawl by site
  * authority). The operator itself is `operators.PageRank`: a
  * fixed-iteration Pregel-shaped join–aggregate, one node-keyed
  * shuffle per iteration.
  */
object GraphQueries {

  /** q115: 3-iteration PageRank (d = 0.85) over the undirected
    * customer–supplier bipartite graph induced by orders⋈lineitem
    * (edge = "this customer bought from this supplier"). Both edge
    * directions are materialized so no node dangles. The two key
    * domains stay disjoint via a NUMERIC encoding (custkey·2 /
    * suppkey·2+1) rather than string prefixes: every iteration
    * shuffles on the node key, and hashing/comparing longs beats
    * strings at any scale — the 'c'/'s'-prefixed labels the oracle
    * sees are decoded map-side at emit only. The DuckDB oracle
    * unrolls the same three iterations as CTEs. */
  private def q115(s: SparkSession, d: String): DataFrame = {
    val dir = orders(s, d)
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("src"),
        (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
    val edges = dir
      .unionAll(dir.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    graft.operators.PageRank.run(edges, iters = 3, damping = 0.85)
      .select(
        when(col("node") % 2 === 0,
          concat(lit("c"), shiftright(col("node"), 1).cast("string")))
          .otherwise(
            concat(lit("s"), shiftright(col("node"), 1).cast("string")))
          .as("node"),
        Det.r6e(col("rank")).as("rank"))
      .transform(Det.emitWide(_, "node"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q115_pagerank" -> q115)

  val oracles: Map[String, String] = Map(
    "q115_pagerank" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT 'c' || CAST(c AS VARCHAR) AS src,
                      's' || CAST(s AS VARCHAR) AS dst FROM e0
               UNION ALL
               SELECT 's' || CAST(s AS VARCHAR), 'c' || CAST(c AS VARCHAR) FROM e0),
         deg AS (SELECT src, CAST(count(1) AS BIGINT) AS deg FROM e GROUP BY src),
         nodes AS (SELECT src AS node FROM deg),
         nn AS (SELECT CAST(count(1) AS DOUBLE) AS n FROM nodes),
         r0 AS (SELECT node, 1.0 / n AS r FROM nodes CROSS JOIN nn),
         c1 AS (SELECT e.dst, sum(r0.r / deg.deg) AS contrib
                FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src
                GROUP BY e.dst),
         r1 AS (SELECT node, (1.0 - 0.85) / n + 0.85 * COALESCE(contrib, 0.0) AS r
                FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.dst = nodes.node),
         c2 AS (SELECT e.dst, sum(r1.r / deg.deg) AS contrib
                FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src
                GROUP BY e.dst),
         r2 AS (SELECT node, (1.0 - 0.85) / n + 0.85 * COALESCE(contrib, 0.0) AS r
                FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.dst = nodes.node),
         c3 AS (SELECT e.dst, sum(r2.r / deg.deg) AS contrib
                FROM e JOIN deg USING (src) JOIN r2 ON r2.node = e.src
                GROUP BY e.dst),
         r3 AS (SELECT node, (1.0 - 0.85) / n + 0.85 * COALESCE(contrib, 0.0) AS r
                FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.dst = nodes.node)
         SELECT node, round(r + 0.0000000123, 6) AS rank
         FROM r3 ORDER BY node""")
}
