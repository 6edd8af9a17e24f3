package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.examples.RagPipeline

/** Drives `examples.RagPipeline` end to end on the fixture corpus:
  * chunk → merge (pre-image feed) → incremental index → BM25 parent
  * rollup → RRF fusion with a vector ranking → MMR diversify —
  * including the chunk-grain CDC hazard (a shrinking update must
  * tombstone vanished chunk ids) and index freshness across merges.
  */
class RagPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("rag journey: ingest, retrieve, update, delete, fuse, diversify") {
    val root = TestSpark.tmpDir("rag")
    val store = s"$root/store"; val cdf = s"$root/cdf"
    val idx = s"$root/idx"; val dlv = s"$root/dl"

    val docs = Tables.documents(spark, sf)
      .where(col("doc_id") % 4 === 1)
      .select(col("doc_id"), col("text"))
    val v1 = RagPipeline.chunk(docs, "doc_id", "text").cache()

    // v1: all inserts
    RagPipeline.ingest(spark, store, cdf, v1, "doc_id", ver = 1L)
    RagPipeline.refreshIndex(spark, idx, dlv, cdf, "doc_id")

    // single term: BM25's tf-saturation means a one-term-spam doc
    // loses to docs matching SEVERAL query terms (correct behavior —
    // observed with a two-term query), so the rank-1 assertion below
    // needs the query to be the term the update spams
    val terms = Seq("stream")
    val lex1 = RagPipeline.lexicalDocRanks(spark, idx, dlv,
      "doc_id", terms, topN = 20).cache()
    // membership: every ranked doc really contains a query term in
    // some chunk, and ranks are 1..n without gaps
    val hitIds = lex1.collect().map(_.getLong(0)).toSet
    assert(hitIds.nonEmpty)
    val withTerm = v1
      .where(terms.map(t => array_contains(split(col("chunk"), " "), t))
        .reduce(_ || _))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(hitIds.subsetOf(withTerm),
      "ranked a doc containing no query term")
    assert(lex1.collect().map(_.getInt(1)).sorted.toSeq ==
      (1 to hitIds.size).toSeq)

    // UPDATE: one doc becomes pure "stream" text with FEWER chunks
    // than before (forces trailing-tombstone correctness); another
    // doc is deleted outright
    val updId = hitIds.min
    val delId = (withTerm - updId).min
    val v2docs = docs
      .withColumn("text", when(col("doc_id") === updId,
        lit(("stream " * 13).trim)).otherwise(col("text")))
      .where(col("doc_id") =!= delId)
    val v2 = RagPipeline.chunk(v2docs, "doc_id", "text")
    val delta = RagPipeline.chunkDelta(v2, v1, "doc_id")
    // the shrinking update really produced trailing tombstones
    val updOld = v1.where(col("doc_id") === updId).count()
    val updNew = v2.where(col("doc_id") === updId).count()
    assert(updNew < updOld, "fixture must shrink the updated doc")
    assert(delta.where(col("doc_id") === updId && col("is_delete")).count()
      == updOld - updNew, "missing trailing tombstones for the shrink")
    RagPipeline.ingest(spark, store, cdf, delta, "doc_id", ver = 2L)
    RagPipeline.refreshIndex(spark, idx, dlv, cdf, "doc_id")

    val lex2 = RagPipeline.lexicalDocRanks(spark, idx, dlv,
      "doc_id", terms, topN = 20).cache()
    val ranks2 = lex2.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ranks2.get(updId).contains(1),
      s"all-'stream' doc $updId should rank first: $ranks2")
    assert(!ranks2.contains(delId), s"deleted doc $delId still ranked")
    // the store itself serves no stale trailing chunk
    val served = graft.sources.Lake.readStore(spark, store)
      .where(col("doc_id") === updId).count()
    assert(served == updNew, s"stale chunks served: $served vs $updNew")

    // FUSE with a vector ranking over the surviving doc ids
    import org.apache.spark.sql.expressions.Window
    val em = Tables.embeddings(spark, sf)
    val qv = em.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val surviving = v2docs.select(col("doc_id").as("vec_id"))
    val vec = graft.operators.Similarity.cosineTopK(
        em.join(surviving, "vec_id"), qv, "vec_id", "embedding", k = 20)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos_sim").desc, col("vec_id").asc)).cast("int"))
      .select(col("vec_id").as("doc_id"), col("rank"))
    val fused = RagPipeline.rrfFuse(lex2, vec, "doc_id", k = 10).cache()
    // hand-computed RRF over the two collected lists must agree
    val vr = vec.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = (ranks2.keySet ++ vr.keySet).toSeq
      .map { id =>
        val s = ranks2.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          vr.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (id, s)
      }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    val got = fused.collect().map(_.getLong(0)).toSeq
    assert(got == want, s"fusion drifted: $got vs $want")

    // DIVERSIFY: k rows, a subset of the fused candidates, replayable
    val cands = fused.select(col("doc_id").as("vec_id"))
    val div1 = RagPipeline.diversify(cands, em, "vec_id", "embedding",
      qv, k = 5).collect().map(r => (r.getInt(0), r.getLong(1)))
    val div2 = RagPipeline.diversify(cands, em, "vec_id", "embedding",
      qv, k = 5).collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(div1.length == 5 && div1.sameElements(div2))
    assert(div1.map(_._2).toSet.subsetOf(got.toSet),
      "diversified pick outside the fused candidate set")
    v1.unpersist(); lex1.unpersist(); lex2.unpersist(); fused.unpersist()
  }

  test("PublishSet marker-commit mode: write-once PUT publishes, strands stay invisible, modes interoperate") {
    import org.apache.hadoop.fs.Path
    import graft.sources.{PublishSet, Snapshot}
    val dir = new Path(TestSpark.tmpDir("pubset") + "/pub")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(conf)
    // v1 publishes in POINTER mode
    assert(PublishSet.publish(fs, conf, dir, Map("a" -> 3L, "b" -> 7L)) == 1L)
    assert(PublishSet.resolve(fs, dir).get == Map("a" -> 3L, "b" -> 7L))
    // v2 publishes in MARKER mode (object-store path) — modes
    // interoperate on one store, resolve takes the max
    conf.setBoolean(Snapshot.MarkerCommitKey, true)
    try {
      assert(PublishSet.publish(fs, conf, dir, Map("a" -> 4L, "b" -> 7L)) == 2L)
      assert(PublishSet.resolve(fs, dir).get == Map("a" -> 4L, "b" -> 7L))
      // a crashed publish strands a FUTURE manifest without its
      // marker: invisible — current stays v2
      val strand = new Path(dir, "_pub_v3.list")
      val out = fs.create(strand, true)
      out.write("a=99\nb=99".getBytes("UTF-8")); out.close()
      assert(PublishSet.currentVersion(fs, dir).contains(2L),
        "unmarked future manifest became visible")
      assert(PublishSet.resolve(fs, dir).get == Map("a" -> 4L, "b" -> 7L))
      // round 12: a strand is a CLAIM now (create-fails-if-exists) —
      // the next publish loses to it LOUDLY instead of overwriting (a
      // live racer's claim must never be erased); restart recovery
      // reclaims it explicitly, then the publish lands
      intercept[Snapshot.ConcurrentCommitException] {
        PublishSet.publish(fs, conf, dir, Map("a" -> 5L, "b" -> 8L))
      }
      assert(PublishSet.recoverStrandedClaim(fs, dir))
      assert(PublishSet.publish(fs, conf, dir, Map("a" -> 5L, "b" -> 8L)) == 3L)
      assert(PublishSet.resolve(fs, dir).get == Map("a" -> 5L, "b" -> 8L))
      // time travel across both modes
      assert(PublishSet.resolveAt(fs, dir, 1L) == Map("a" -> 3L, "b" -> 7L))
      assert(PublishSet.resolveAt(fs, dir, 2L) == Map("a" -> 4L, "b" -> 7L))
    } finally conf.setBoolean(Snapshot.MarkerCommitKey, false)
  }

  test("composed publish: readers see only consistent (index, view) pairs across a mid-refresh crash") {
    import org.apache.hadoop.fs.Path
    import graft.examples.IncrementalIndex
    import graft.sources.PublishSet
    val root = TestSpark.tmpDir("rag-pub")
    val store = s"$root/store"; val cdf = s"$root/cdf"
    val idx = s"$root/idx"; val dlv = s"$root/dl"; val pub = s"$root/pub"
    // the first test's slice — known to contain 'stream' docs
    val docs = Tables.documents(spark, sf)
      .where(col("doc_id") % 4 === 1)
      .select(col("doc_id"), col("text"))
    val v1 = RagPipeline.chunk(docs, "doc_id", "text").cache()
    RagPipeline.ingest(spark, store, cdf, v1, "doc_id", ver = 1L)
    assert(RagPipeline.refreshIndexPublished(spark, idx, dlv, cdf, pub,
      "doc_id") == 1L)
    val terms = Seq("stream")
    def published = RagPipeline.lexicalDocRanksPublished(spark, idx, dlv,
        pub, "doc_id", terms, topN = 20)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq.sorted
    val r1 = published
    assert(r1.nonEmpty)
    val fs = new Path(pub)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pins1 = PublishSet.resolveAt(fs, new Path(pub), 1L)
    val postings1 = IncrementalIndex
      .read(spark, idx, Some(pins1("index"))).collect()
      .map(_.toString).sorted.toSeq
    // a second batch merges, then CRASH between the member refreshes:
    // the index folds the feed, the view does NOT, no manifest lands
    val updId = r1.head._1
    val v2docs = docs.withColumn("text",
      when(col("doc_id") === updId, lit(("stream " * 13).trim))
        .otherwise(col("text")))
    val v2 = RagPipeline.chunk(v2docs, "doc_id", "text")
    RagPipeline.ingest(spark, store, cdf,
      RagPipeline.chunkDelta(v2, v1, "doc_id"), "doc_id", ver = 2L)
    IncrementalIndex.refresh(spark, idx, cdf, Seq("doc_id", "ci"),
      expr("filter(split(chunk, ' '), w -> w <> '')"))
    // the index store MOVED (torn window exists for an unpinned
    // reader pairing it with the stale view)...
    val postingsTorn = IncrementalIndex.read(spark, idx).collect()
      .map(_.toString).sorted.toSeq
    assert(postingsTorn != postings1, "fixture: index refresh was a no-op")
    // ...but the PUBLISHED read path still serves the old consistent
    // pair — all-or-nothing visibility across the store set
    assert(published == r1,
      "published read moved before the composed commit")
    // restart completes the night: the index refresh no-ops (feed
    // consumed), the view catches up, ONE manifest publishes the pair
    assert(RagPipeline.refreshIndexPublished(spark, idx, dlv, cdf, pub,
      "doc_id") == 2L)
    val r2 = published
    assert(r2.toMap.get(updId).contains(1),
      s"all-'stream' doc $updId should rank first after the publish: $r2")
    // the published pair now equals the live pair (everything current)
    val live = RagPipeline.lexicalDocRanks(spark, idx, dlv, "doc_id",
        terms, topN = 20)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq.sorted
    assert(r2 == live)
    // cross-store time travel: publish v1 still resolves and its
    // pinned index read is byte-stable under later commits
    assert(PublishSet.resolveAt(fs, new Path(pub), 1L) == pins1)
    assert(IncrementalIndex.read(spark, idx, Some(pins1("index")))
      .collect().map(_.toString).sorted.toSeq == postings1,
      "pinned v1 index read changed under later commits")
    v1.unpersist()
  }
}
