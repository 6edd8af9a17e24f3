package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.examples.CleanCorpus
import graft.operators.TextDedup

/** Pipeline invariants for the composed cleaning run (the properties
  * a corpus consumer relies on, regardless of corpus content). */
class CleanCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  lazy val input = Tables.documents(spark, sf)
  lazy val clean = CleanCorpus.run(input).cache()

  test("pipeline retains a nonempty subset with unique ids") {
    val n = clean.count()
    assert(n > 0 && n <= input.count())
    assert(clean.select("doc_id").distinct().count() == n)
  }

  test("no two retained docs share a content hash") {
    assert(clean.groupBy(md5(col("text"))).count()
      .where(col("count") > 1).isEmpty)
  }

  test("no retained pair is an LSH candidate pair") {
    val pairs = TextDedup.lshCandidatePairs(
      TextDedup.minhashSignatures(clean, "doc_id", "text"), "doc_id")
    assert(pairs.isEmpty,
      s"near-dups survived: ${pairs.limit(5).collect().mkString(",")}")
  }

  test("every retained doc passes the quality floor") {
    assert(clean.where(col("quality") < 0.3).isEmpty)
  }

  test("every retained doc passes the repetition cap") {
    assert(clean.where(col("dup_word_ratio") > 0.7).isEmpty)
  }
}
