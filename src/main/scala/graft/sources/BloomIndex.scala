package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FILE-level bloom-filter skipping for point lookups on a
  * high-cardinality, unsorted key — the lakehouse metadata-skipping
  * pattern (Delta bloom index / Iceberg puffin), jar-free. Z-order +
  * footer min/max (Lake.writeZOrderedN) prune RANGE predicates; a
  * bloom sidecar prunes `key = v` lookups where min/max is useless
  * because every file spans the whole key domain.
  *
  * Two layers, both written by `writeIndexed`:
  *
  *  - ROW-GROUP level: the native parquet bloom filter
  *    (`parquet.bloom.filter.enabled#<col>` — parquet-mr writes a
  *    split-block bloom per row group; any parquet reader with bloom
  *    pushdown, Spark's included, skips row groups on equality). This
  *    ships INSIDE the data files — zero extra read-path machinery.
  *  - FILE level: a `_bloomidx` sidecar (hidden from data readers —
  *    underscore paths are invisible to Spark/Hadoop listings) holding
  *    each file's bloom BIT SET over the key: k md5-derived positions
  *    per distinct key, m bits. `pointLookup` resolves the sidecar
  *    (file-count-sized — driver metadata, the same budget class as
  *    Delta's add-file stats), keeps only files whose bloom contains
  *    all k probe positions, and scans JUST those paths. At 100 TB
  *    the lookup reads ~1 file + false positives (fp rate
  *    (1−e^(−k·ndv/m))^k ≈ 0.4% at the defaults for 1k distinct keys
  *    per file) instead of every file.
  *
  * The hash family is the house md5 arithmetic (hashDraw / CountMin):
  * position_j(key) = md5("bf<j>:"+key)[first 15 hex] mod m — the
  * driver-side probe (MessageDigest) and the executor-side build
  * (the `md5`/`conv` expressions) compute the identical integer, and
  * a ScalaCheck property pins that equality, so build and probe can
  * never drift.
  */
object BloomIndex {

  /** Bits per file-level bloom and hash count. */
  val DefaultBits = 8192
  val DefaultHashes = 4

  private def posExpr(j: Int, key: org.apache.spark.sql.Column,
      m: Int): org.apache.spark.sql.Column =
    (conv(substring(md5(concat(lit(s"bf$j:"), key)), 1, 15), 16, 10)
      .cast("long") % lit(m.toLong)).cast("int")

  /** Driver-side twin of `posExpr` — must produce the identical
    * positions (property-pinned in OperatorSpec). */
  private[graft] def probePositions(key: String, m: Int,
      k: Int): Seq[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until k).map { j =>
      val hex = md.digest(s"bf$j:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % m).toInt
    }
  }

  /** Write `df` as `files` parquet files with the NATIVE per-row-group
    * parquet bloom on `keyCol`, then build the file-level `_bloomidx`
    * sidecar. The sidecar derives from the files as written (one
    * distinct-keys pass over the fresh data — executor-side, never a
    * driver fold) and is idempotently rebuildable via
    * `rebuildSidecar` if a crash lands data without it. */
  def writeIndexed(df: DataFrame, keyCol: String, path: String,
      files: Int, expectedNdvPerFile: Long = 1000L,
      bits: Int = DefaultBits, hashes: Int = DefaultHashes): Unit = {
    require(files >= 1 && bits >= 64 && hashes >= 1,
      s"bad bloom config: files=$files bits=$bits hashes=$hashes")
    df.repartition(files, col(keyCol))
      .write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$keyCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$keyCol",
        expectedNdvPerFile.toString)
      .parquet(path)
    rebuildSidecar(df.sparkSession, path, keyCol, bits, hashes)
  }

  /** (Re)build the `_bloomidx` sidecar from the data files on disk —
    * idempotent (overwrite), callable after a crash that stranded
    * data without its sidecar or after an out-of-band rewrite. */
  def rebuildSidecar(spark: SparkSession, path: String, keyCol: String,
      bits: Int = DefaultBits, hashes: Int = DefaultHashes): Unit = {
    val posCols = (0 until hashes).map(j =>
      posExpr(j, col("__k"), bits))
    spark.read.parquet(path)
      .select(input_file_name().as("file"),
        col(keyCol).cast("string").as("__k"))
      .distinct()
      .select(col("file"), explode(array(posCols: _*)).as("pos"))
      .distinct()
      .groupBy("file")
      .agg(sort_array(collect_set(col("pos"))).as("bitset"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_bloomidx")
  }

  /** Point lookup `keyCol = value` reading ONLY the files whose bloom
    * may contain the key. The sidecar is file-count-sized (driver
    * metadata, like every lakehouse file-stats index); the returned
    * frame still applies the exact predicate, so false positives cost
    * an extra file scan, never a wrong row. Returns the pruned frame
    * plus the (candidates, total) file counts for observability. */
  def pointLookup(spark: SparkSession, path: String, keyCol: String,
      value: String, bits: Int = DefaultBits,
      hashes: Int = DefaultHashes): (DataFrame, Int, Int) = {
    val probe = probePositions(value, bits, hashes).toSet
    val sidecar = spark.read.parquet(s"$path/_bloomidx")
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[Int](1).toSet)
    val candidates = sidecar.collect {
      case (f, bs) if probe.subsetOf(bs) => f
    }
    val out =
      if (candidates.isEmpty)
        // no file can contain the key: empty frame, full schema, no
        // data read (the scan below lists but reads zero row groups)
        spark.read.parquet(path).where(lit(false))
      else
        spark.read.parquet(candidates: _*)
          .where(col(keyCol).cast("string") === value)
    (out, candidates.length, sidecar.length)
  }
}
