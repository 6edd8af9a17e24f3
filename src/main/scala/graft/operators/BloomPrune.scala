package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the explicit form of a runtime
  * semi-join filter for the 100 TB fact-to-fact path (SURVEY.md §2.3).
  *
  * The problem at scale: an equi-join whose build side is too big to
  * broadcast shuffles the ENTIRE probe side, even when only a few
  * percent of probe rows have a matching key. A bloom filter of the
  * build keys is megabytes regardless of build-side row count, so it
  * CAN broadcast — probe rows whose keys cannot match are dropped
  * map-side, before the probe shuffle, which is where the money is:
  * the shuffle then moves ~selectivity × |fact| instead of |fact|.
  *
  * False positives pass the filter but are removed by the exact join
  * that follows, so `prunedJoin` ≡ the plain inner join for ANY fpp —
  * correctness never depends on the sketch (q110's oracle is the
  * plain-join SQL).
  *
  * Spark-first mechanics: the filter is built by Catalyst's own
  * `BloomFilterAggregate` (a partial+final typed aggregate — each map
  * task sketches locally, partials OR together) over `xxhash64(key)`,
  * and probed by the codegen'd `BloomFilterMightContain` — the exact
  * expression pair Spark's `InjectRuntimeFilter` plants when it fires.
  * This operator is for when it doesn't: a pre-FILTERED build side the
  * optimizer can't see selectivity stats for, a filter reused across
  * several queries of a pipeline stage, or a probe side behind
  * operators the rule won't traverse. Only the serialized bitset
  * (~`numBits/8` bytes, ≈0.9 MB at 1M keys / 3% fpp) reaches the
  * driver — the same O(metadata) driver read as the house quantile
  * arrays (NOTES.md), independent of build row count.
  */
object BloomPrune {

  /** Registers the Catalyst bloom pair under temp-function names so
    * columns can be built via `call_function` (the house idiom for
    * native expressions — functions/CosineSim.scala). Idempotent —
    * see SimHash64.register. */
  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    if (!fr.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bloom_agg")))
      fr.createOrReplaceTempFunction("graft_bloom_agg",
        exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
        "built-in")
    if (!fr.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bloom_might_contain")))
      fr.createOrReplaceTempFunction("graft_bloom_might_contain",
        exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }

  /** Spark's default cap on runtime-filter size (64 Mbit = 8 MB),
    * mirrored here so a generous `expectedItems` can't silently build
    * an unbroadcastable filter. */
  private val MaxNumBits = 1L << 26

  /** One distributed aggregate job → the serialized bloom filter of
    * `key` over `build`. `expectedItems` sizes the bitset
    * (`BloomFilter.optimalNumOfBits`); overshooting it costs bits,
    * undershooting costs fpp — correctness is unaffected either way.
    * Returns null when `build` is empty (no filter to apply). */
  def buildFilter(build: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.03): Array[Byte] = {
    register(build.sparkSession)
    val numBits =
      math.min(BloomFilter.optimalNumOfBits(expectedItems, fpp), MaxNumBits)
    build
      .agg(call_function("graft_bloom_agg", xxhash64(key),
        lit(expectedItems), lit(numBits)).as("__bf"))
      .head.getAs[Array[Byte]](0)
  }

  /** Codegen'd `might_contain(filter, xxhash64(key))` predicate —
    * false ⇒ the key is definitely absent from the build side; true ⇒
    * probably present (rate `fpp` of misses leak through). NULL keys
    * yield NULL (dropped by where), matching inner-join semantics. */
  def mightContain(spark: SparkSession, filter: Array[Byte],
      key: Column): Column = {
    register(spark)
    call_function("graft_bloom_might_contain", lit(filter), xxhash64(key))
  }

  /** Probe-side pruning alone — for when the consumer is not a plain
    * join (an aggregate over matching facts, a sink). Keeps every fact
    * row that MIGHT match a `build` key; definite non-matches drop
    * map-side. */
  def pruneProbe(fact: DataFrame, factKey: Column, build: DataFrame,
      buildKey: Column, expectedItems: Long, fpp: Double = 0.03): DataFrame =
    Option(buildFilter(build, buildKey, expectedItems, fpp)) match {
      case Some(bytes) =>
        fact.where(mightContain(fact.sparkSession, bytes, factKey))
      case None => fact.where(lit(false)) // empty build side matches nothing
    }

  /** Bloom-pruned inner equi-join: semantically identical to
    * `fact.join(dim, factKey === dimKey)` — the filter only removes
    * rows the join would drop anyway — but the fact-side shuffle (or
    * the fact-side hash probe under AQE's broadcast switch) sees only
    * the rows that might survive. */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val pruned = pruneProbe(fact, col(factKey), dim, col(dimKey), expectedItems, fpp)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
