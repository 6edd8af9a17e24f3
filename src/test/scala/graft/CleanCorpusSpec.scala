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

  test("contamination screen drops docs overlapping the benchmark") {
    // benchmark = verbatim copies of a few input docs → their clean-
    // pipeline survivors must be screened out (contam = 1.0 > cap)
    val bench = input.where(col("doc_id") % 20 === 0).select("text")
    val screened = CleanCorpus.run(input,
      benchmark = Some(bench), maxContam = 0.5)
    val leaked = screened
      .join(input.where(col("doc_id") % 20 === 0)
        .select(col("text").as("btext")), col("text") === col("btext"))
    assert(leaked.isEmpty, "benchmark-identical docs survived the screen")
    // docs sharing nothing with the benchmark are untouched relative
    // to the unscreened run
    assert(screened.count() > 0)
  }

  test("span-dedup cap drops in-doc repeated-8-gram docs and nothing else") {
    // The fixture's repeated 8-grams all come from cross-doc duplicate
    // twins, which stages 1-2 already remove — so the cap's real work
    // is IN-DOC repetition, which no dedup stage can touch. A doc of
    // 40 distinct words repeated twice passes the word-dup cap
    // (ratio 0.5 <= 0.7) but 66 of its 73 8-gram positions repeat
    // (dup_frac 0.90).
    import spark.implicits._
    val words = (0 until 40).map(i => s"tok$i")
    val selfRep = (words ++ words).mkString(" ")
    val docs2 = input.unionByName(
      Seq((-1L, selfRep, "en", "synthetic", selfRep.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val uncapped = CleanCorpus.run(docs2).cache()
    val capped = CleanCorpus.run(docs2, maxNgramDupFrac = 0.5).cache()
    assert(uncapped.where(col("doc_id") === -1).count() == 1,
      "the self-repeating doc should survive every other stage")
    assert(capped.where(col("doc_id") === -1).isEmpty,
      "span cap failed to drop the self-repeating doc")
    // every survivor is under the cap (short docs have no spans: pass)
    val over = TextDedup.repeatedNgramStats(capped, "doc_id", "text")
      .where(col("dup_frac") > 0.5)
    assert(over.isEmpty, "a retained doc exceeds the span cap")
    // and the cap drops ONLY relative to the uncapped run
    assert(capped.join(uncapped, Seq("doc_id"), "left_anti").isEmpty,
      "span-capped run retained a doc the uncapped run dropped")
  }

  test("packed pipeline assigns every clean doc once and respects bin capacity") {
    val cap = 150L
    val packed = CleanCorpus.runPacked(input, capacity = cap, streams = 4)
    // the packing is a relabeling of the clean corpus: same ids, once each
    val cleanIds = clean.select("doc_id").collect().map(_.getLong(0)).toSet
    val packedIds = packed.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(packedIds.toSet == cleanIds && packedIds.size == cleanIds.size,
      "packing must assign each clean doc exactly once")
    // bins respect capacity except a singleton bin holding an oversize doc
    val bins = packed.groupBy("stream", "bin")
      .agg(sum("bpe_tokens").as("tok"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    bins.foreach { case (tok, n) =>
      assert(tok <= cap || n == 1, s"overfull multi-doc bin: $tok tokens, $n docs")
    }
    // bin ids are 1-based and contiguous per stream (a gap means the
    // walk skipped state)
    val perStream = packed.groupBy("stream")
      .agg(min("bin").as("lo"), max("bin").as("hi"),
        countDistinct("bin").as("d"))
      .collect()
    perStream.foreach { r =>
      assert(r.getLong(1) == 1L && r.getLong(2) == r.getLong(3),
        s"non-contiguous bins in stream ${r.getInt(0)}: $r")
    }
  }

  test("mixing-weight sampling is deterministic and honors a zero rate") {
    val s1 = CleanCorpus.run(input,
      sampleRates = Map("en" -> 0.0, "de" -> 0.5), defaultRate = 0.8)
    val s2 = CleanCorpus.run(input,
      sampleRates = Map("en" -> 0.0, "de" -> 0.5), defaultRate = 0.8)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = s2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "hash sampling must be replayable")
    assert(s1.where(col("lang") === "en").isEmpty, "zero-rate stratum leaked")
    assert(ids1.subsetOf(
      clean.select("doc_id").collect().map(_.getLong(0)).toSet),
      "sample must be a subset of the unsampled clean corpus")
  }

  test("semantic-dedup stage: no retained within-cluster pair at/above the cutoff") {
    val em = Tables.embeddings(spark, sf)
    val sem = CleanCorpus.run(input, embeddings = Some(em),
      semanticMinCos = 0.35).cache()
    val kept = sem.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty)
    assert(kept.subsetOf(
      clean.select("doc_id").collect().map(_.getLong(0)).toSet),
      "semantic stage may only DROP relative to the base pipeline")
    // the dominance rule's guarantee: among retained docs, no
    // within-cluster pair at or above the threshold survives
    val keptEm = em.join(sem.select(col("doc_id").as("vec_id")), "vec_id")
    val survivors = graft.operators.Similarity.clusterDupPairs(
      keptEm, "vec_id", "embedding", "label", minCos = 0.35).count()
    assert(survivors == 0,
      s"$survivors retained near-dup pairs survived semantic dedup")
    sem.unpersist()
  }

  test("temperature mixing stage: derived cuts, deterministic, smallest lang keeps all") {
    val t1 = CleanCorpus.run(input, temperatureAlpha = Some(0.5)).cache()
    val t2 = CleanCorpus.run(input, temperatureAlpha = Some(0.5))
    val ids1 = t1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == t2.select("doc_id").collect().map(_.getLong(0)).toSet,
      "temperature sampling must be replayable")
    assert(ids1.nonEmpty && ids1.subsetOf(
      clean.select("doc_id").collect().map(_.getLong(0)).toSet))
    // the smallest language's cut is 10000 → every clean doc of that
    // lang survives the diet
    val counts = clean.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = counts.minBy { case (l, n) => (n, l) }._1
    assert(t1.where(col("lang") === minLang).count() == counts(minLang),
      s"smallest lang '$minLang' lost docs under temperature mixing")
    t1.unpersist()
  }
}
