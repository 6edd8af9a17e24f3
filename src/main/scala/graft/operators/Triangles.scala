package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting via degree-ordered wedge closure — the
  * association-graph statistic a curation stack computes when it asks
  * "which sources/entities sit inside tight clusters" (community
  * cores, collusive duplication rings) rather than merely "which pairs
  * touch" (that's the LSH pair table).
  *
  * Scale design: the naive wedge join explodes on hubs — a node of
  * degree d contributes C(d, 2) wedges, and real association graphs
  * are power-law. The classic fix, used here: orient every undirected
  * edge from its (degree, id)-SMALLER endpoint to the larger one.
  * Out-degree under this orientation is bounded by O(√E) on ANY graph
  * (a node of out-degree k has k neighbors of degree ≥ its own, which
  * caps k² by 2E), so the wedge fan-out of a hub collapses from C(d,2)
  * to at most C(√(2E), 2) ≈ E, and total wedges are ≤ E^1.5 instead of
  * Σ C(d,2). Each triangle is generated exactly once (its three
  * vertices have a unique (degree, id) order). No global node ranking
  * is materialized — the (degree, id) pair IS the order key, carried
  * as a struct column, so there is no single-task rank window at any
  * node count. All shuffles key on node ids or (x, y) edge pairs.
  */
object Triangles {

  /** Per-node triangle participation over the UNDIRECTED simple graph
    * given as (aCol, bCol) pairs — any orientation, duplicates and
    * self-loops tolerated (deduped/dropped here). Returns
    * (node, triangles) for every node in at least one triangle; each
    * triangle credits all three vertices. */
  def perNode(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(
        least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // (degree, id) struct = the total orientation order; ids are
    // unique per node so ties in degree break deterministically
    val keyed = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(col("u"), col("v"),
        struct(col("du").as("d"), col("u").as("n")).as("ku"),
        struct(col("dv").as("d"), col("v").as("n")).as("kv"))
    val oriented = keyed.select(
      when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("s"),
      when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("t"),
      when(col("ku") < col("kv"), col("kv")).otherwise(col("ku")).as("kt"))
    // wedges: two out-edges of s, the pair normalized by the SAME
    // (degree, id) order — the closing edge, if present, is stored
    // oriented exactly as (x -> y)
    val a = oriented.select(col("s"), col("t").as("x"), col("kt").as("kx"))
    val b = oriented.select(col("s"), col("t").as("y"), col("kt").as("ky"))
    val wedges = a.join(b, "s").where(col("kx") < col("ky"))
      .select(col("s"), col("x"), col("y"))
    val closed = wedges
      .join(oriented.select(col("s").as("x"), col("t").as("y")), Seq("x", "y"))
      .select(col("s"), col("x"), col("y"))
    closed
      .select(explode(array(col("s"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }
}
