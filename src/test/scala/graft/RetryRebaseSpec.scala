package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Lake, PublishSet, Snapshot}
import graft.examples.{IncrementalIndex, IncrementalIvfPq, IncrementalScd2, IncrementalView, LakeOps}

/** Live two-writer race legs for the generalized RETRY-REBASE
  * combinator (round 13 — VERDICT r12 item 1: `Lake.mergeIntoRetrying`
  * owned the loop; every other production writer failed loudly and
  * left the rebase to the caller). One leg per writer family, each in
  * BOTH commit modes (pointer rename / object-store marker):
  *
  *   - a REAL second thread watches the store for the writer's hidden
  *     stage dir (i.e. strictly after the writer resolved its read
  *     set) and claims the next version first — a metadata-only
  *     competing commit carrying the current members forward;
  *   - the retrying writer must lose that claim LOUDLY internally,
  *     re-resolve, re-derive, and land on the racer's version + 1;
  *   - invariants either side: the racer's committed version survives
  *     (its manifest is history), the writer's derivation lands
  *     exactly once (watermark semantics), and the final store equals
  *     a full recompute — no update lost on EITHER side.
  *
  * Timing decides who wins the claim; when the racer loses (loudly —
  * ConcurrentCommitException is the only acceptable failure), the
  * scenario re-runs on a fresh directory until the writer genuinely
  * lost once, so the rebase path is exercised, not merely compiled.
  */
class RetryRebaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  private def withMode(markerMode: Boolean)(body: => Unit): Unit = {
    conf.setBoolean(Snapshot.MarkerCommitKey, markerMode)
    try body finally conf.setBoolean(Snapshot.MarkerCommitKey, false)
  }

  private def isConflict(t: Option[Throwable]): Boolean =
    t.exists(_.isInstanceOf[Snapshot.ConcurrentCommitException])

  /** Start a racer committing the store's CURRENT members again (a
    * metadata-only competing version at base = cur) the moment ANY
    * `_stage.d<cur+1>-*` dir appears. Returns a join-and-report
    * thunk: None = racer committed, Some(conflict) = racer lost. */
  private def claimRacer(store: Path): () => Option[Throwable] = {
    val fs = store.getFileSystem(conf)
    val cur = Snapshot.currentVersion(fs, store).get
    @volatile var err: Option[Throwable] = None
    val t = new Thread(() => {
      try {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        def stagePresent = fs.exists(store) && fs.listStatus(store)
          .exists(_.getPath.getName.startsWith(s"_stage.d${cur + 1}-"))
        while (!stagePresent && System.nanoTime() < deadline)
          Thread.sleep(1)
        val carried = Snapshot.members(fs, store, cur)
        Snapshot.commit(fs, conf, store, carried, base = cur)
        ()
      } catch { case th: Throwable => err = Some(th) }
    })
    t.start()
    () => { t.join(120000); err }
  }

  /** Run `writer` under a live claim racer on `storeDir`. Returns
    * (writer error, racer error, store version after). The writer is
    * a RETRYING form, so the only acceptable writer outcome is clean;
    * the racer may lose loudly when the writer's commit won the
    * interleave. */
  private def raceOnce(storeDir: String)(writer: => Unit)
      : (Option[Throwable], Option[Throwable], Long) = {
    val store = new Path(storeDir)
    val fs = store.getFileSystem(conf)
    val report = claimRacer(store)
    val werr = try { writer; None } catch { case t: Throwable => Some(t) }
    val rerr = report()
    (werr, rerr, Snapshot.currentVersion(fs, store).getOrElse(0L))
  }

  /** Drive `scenario(tryDir)` until the retrying writer genuinely
    * LOST the claim once (the racer committed AND the store advanced
    * two versions past the pre-race state) — bounded interleave
    * retries, each on a fresh directory. `scenario` returns
    * (racerErr, preVersion, postVersion) and must assert its own
    * final-state correctness every run. */
  private def untilRebaseExercised(what: String)(
      scenario: String => (Option[Throwable], Long, Long)): Unit = {
    var exercised = false
    var tries = 0
    while (!exercised && tries < 5) {
      tries += 1
      val dir = TestSpark.tmpDir(s"race-$what-$tries")
      val (rerr, pre, post) = scenario(dir)
      if (rerr.isEmpty) {
        assert(post == pre + 2,
          s"$what: racer committed but store did not advance twice " +
            s"(pre $pre, post $post) — writer's rebase never landed")
        exercised = true
      } else assert(isConflict(rerr),
        s"$what: racer failed non-loudly: $rerr")
    }
    assert(exercised,
      s"$what: writer never lost the claim in 5 interleaves (racer too slow?)")
  }

  // ---------------------------------------------------------------
  // IncrementalView.refreshRetrying
  // ---------------------------------------------------------------
  test("IncrementalView.refreshRetrying rebases over a live racing commit, both modes") {
    for (markerMode <- Seq(false, true)) withMode(markerMode) {
      untilRebaseExercised(s"view-m$markerMode") { base =>
        val table = s"$base/t"; val cdf = s"$base/cdf"
        val viewDir = s"$base/view"
        def merge(rows: Seq[(Long, String, Long, Long)]): Unit =
          Lake.mergeInto(spark, table,
            rows.toDF("k", "g", "x", "ver"), Seq("k"), Seq("ver"),
            changeDir = Some(cdf), cdfPreImages = true)
        merge(Seq((1L, "a", 10L, 1L), (2L, "b", 5L, 1L)))
        IncrementalView.refresh(spark, viewDir, cdf, Seq("g"), Seq("x"))
        merge(Seq((3L, "a", 7L, 1L), (2L, "b", 9L, 2L)))
        val store = new Path(viewDir)
        val fs = store.getFileSystem(conf)
        val pre = Snapshot.currentVersion(fs, store).get
        val (werr, rerr, post) = raceOnce(viewDir) {
          IncrementalView.refreshRetrying(spark, viewDir, cdf,
            Seq("g"), Seq("x"))
        }
        assert(werr.isEmpty, s"refreshRetrying failed: $werr")
        // final view ≡ full recompute over the merged base — the
        // no-lost-update invariant, whoever won the interleave
        val got = IncrementalView.read(spark, viewDir).collect()
          .map(r => r.getAs[String]("g") ->
            (r.getAs[Long]("n"), r.getAs[Long]("sum_x"))).toMap
        val want = Lake.readStore(spark, table)
          .groupBy("g").agg(count(lit(1)).as("n"), sum("x").as("sx"))
          .collect().map(r => r.getAs[String]("g") ->
            (r.getAs[Long]("n"), r.getAs[Long]("sx"))).toMap
        assert(got == want, s"view $got != recompute $want")
        // idempotence: nothing left pending after the rebase
        assert(IncrementalView.pendingFeedIds(spark, viewDir, cdf).isEmpty)
        (rerr, pre, post)
      }
    }
  }

  // ---------------------------------------------------------------
  // IncrementalIndex.refreshRetrying
  // ---------------------------------------------------------------
  test("IncrementalIndex.refreshRetrying rebases over a live racing commit, both modes") {
    for (markerMode <- Seq(false, true)) withMode(markerMode) {
      untilRebaseExercised(s"index-m$markerMode") { base =>
        val table = s"$base/t"; val cdf = s"$base/cdf"
        val idx = s"$base/idx"
        val toks = expr("filter(split(text, ' '), w -> w <> '')")
        def merge(rows: Seq[(Long, String, Long)]): Unit =
          Lake.mergeInto(spark, table,
            rows.toDF("k", "text", "ver"), Seq("k"), Seq("ver"),
            changeDir = Some(cdf), cdfPreImages = true)
        merge(Seq((1L, "alpha beta", 1L), (2L, "beta gamma", 1L)))
        IncrementalIndex.refresh(spark, idx, cdf, Seq("k"), toks)
        merge(Seq((3L, "alpha alpha", 1L), (1L, "delta", 2L)))
        val store = new Path(idx)
        val fs = store.getFileSystem(conf)
        val pre = Snapshot.currentVersion(fs, store).get
        val (werr, rerr, post) = raceOnce(idx) {
          IncrementalIndex.refreshRetrying(spark, idx, cdf, Seq("k"), toks)
        }
        assert(werr.isEmpty, s"refreshRetrying failed: $werr")
        // postings ≡ tokenizing the merged base — no lost update
        val got = IncrementalIndex.read(spark, idx).collect()
          .map(r => (r.getAs[String]("token"), r.getAs[Long]("k")) ->
            r.getAs[Long]("tf")).toMap
        val want = Lake.readStore(spark, table)
          .select(col("k"), explode(toks).as("token"))
          .groupBy("token", "k").agg(count(lit(1)).as("tf"))
          .collect().map(r => (r.getAs[String]("token"),
            r.getAs[Long]("k")) -> r.getAs[Long]("tf")).toMap
        assert(got == want, s"index $got != recompute $want")
        (rerr, pre, post)
      }
    }
  }

  // ---------------------------------------------------------------
  // IncrementalScd2.refreshRetrying
  // ---------------------------------------------------------------
  test("IncrementalScd2.refreshRetrying rebases over a live racing commit, both modes") {
    for (markerMode <- Seq(false, true)) withMode(markerMode) {
      untilRebaseExercised(s"scd2-m$markerMode") { base =>
        val table = s"$base/t"; val cdf = s"$base/cdf"
        val hist = s"$base/hist"
        def merge(rows: Seq[(Long, String, Long)]): Unit =
          Lake.mergeInto(spark, table,
            rows.toDF("k", "attr", "ver"), Seq("k"), Seq("ver"),
            changeDir = Some(cdf), cdfPreImages = true)
        merge(Seq((1L, "a0", 1L), (2L, "b0", 1L)))
        IncrementalScd2.refresh(spark, hist, cdf, Seq("k"), Seq("attr"))
        merge(Seq((1L, "a1", 2L), (3L, "c0", 1L)))
        val store = new Path(hist)
        val fs = store.getFileSystem(conf)
        val pre = Snapshot.currentVersion(fs, store).get
        val (werr, rerr, post) = raceOnce(hist) {
          IncrementalScd2.refreshRetrying(spark, hist, cdf,
            Seq("k"), Seq("attr"))
        }
        assert(werr.isEmpty, s"refreshRetrying failed: $werr")
        // current dimension rows ≡ the merged base — no lost update;
        // k=1's superseded row is CLOSED (valid_to = the closing id)
        val rows = IncrementalScd2.read(spark, hist).collect()
          .map(r => (r.getAs[Long]("k"), r.getAs[String]("attr"),
            r.isNullAt(r.fieldIndex("valid_to"))))
        val current = rows.filter(_._3).map(t => t._1 -> t._2).toMap
        assert(current == Map(1L -> "a1", 2L -> "b0", 3L -> "c0"),
          s"scd2 current $current")
        assert(rows.exists(t => t._1 == 1L && t._2 == "a0" && !t._3),
          s"k=1's closed version missing: ${rows.toSeq}")
        (rerr, pre, post)
      }
    }
  }

  // ---------------------------------------------------------------
  // IncrementalIvfPq.refreshRetrying
  // ---------------------------------------------------------------
  test("IncrementalIvfPq.refreshRetrying rebases over a live racing commit (pointer + marker)") {
    import graft.operators.Similarity
    val em = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .where(col("vec_id") < 30)
    val cent = Similarity.ivfCentroids(em, "label", "embedding")
    for (markerMode <- Seq(false, true)) withMode(markerMode) {
      untilRebaseExercised(s"ivfpq-m$markerMode") { base =>
        val table = s"$base/t"; val cdf = s"$base/cdf"
        val idx = s"$base/idx"
        def merge(ids: Seq[Long], ver: Long): Unit =
          Lake.mergeInto(spark, table,
            em.where(col("vec_id").isin(ids: _*))
              .select(col("vec_id"), col("embedding"), lit(ver).as("ver")),
            Seq("vec_id"), Seq("ver"),
            changeDir = Some(cdf), cdfPreImages = true)
        merge(1L to 20L, ver = 1)
        // upto = 1: version-keyed feed ids (round 14); the corpus
        // read above holds merge version 1 already
        IncrementalIvfPq.bootstrap(spark, idx,
          Lake.readStore(spark, table).select("vec_id", "embedding"),
          "vec_id", "embedding", cent, dim = 64, m = 4, kc = 8, upto = 1L)
        merge(21L to 25L, ver = 1)
        val store = new Path(s"$idx/codes")
        val fs = store.getFileSystem(conf)
        val pre = Snapshot.currentVersion(fs, store).get
        val (werr, rerr, post) = raceOnce(s"$idx/codes") {
          IncrementalIvfPq.refreshRetrying(spark, idx, cdf,
            "vec_id", "embedding")
        }
        assert(werr.isEmpty, s"refreshRetrying failed: $werr")
        // served codes ≡ re-encoding the merged corpus against the
        // stored geometry — no lost update either side
        val got = IncrementalIvfPq.readCodes(spark, idx).collect()
          .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Int]]("codes")))
          .sortBy(_._1).toSeq
        val want = Similarity.encodeCodes(
            Lake.readStore(spark, table).select("vec_id", "embedding"),
            spark.read.parquet(s"$idx/codebook"),
            spark.read.parquet(s"$idx/centroids"),
            "vec_id", "embedding", 4, 16).collect()
          .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Int]]("codes")))
          .sortBy(_._1).toSeq
        assert(got == want, "ivfpq codes != re-encode after rebase")
        (rerr, pre, post)
      }
    }
  }

  // ---------------------------------------------------------------
  // PublishSet.publishRetrying — deterministic interleave (the thunk
  // is the interposition point the API provides) + a live N-pair race
  // ---------------------------------------------------------------
  test("PublishSet.publishRetrying: deterministic loser path re-derives members and lands after the racer, both modes") {
    for (markerMode <- Seq(false, true)) withMode(markerMode) {
      val dir = new Path(TestSpark.tmpDir(s"pubretry-m$markerMode"))
      val fs = dir.getFileSystem(conf)
      assert(PublishSet.publish(fs, conf, dir, Map("s" -> 1L)) == 1L)
      // the racer's claim content — what ITS publish is committing
      val racerBody = "s=2"
      var calls = 0
      val got = PublishSet.publishRetrying(fs, conf, dir, () => {
        calls += 1
        if (calls == 1) {
          // simulate a LIVE racer mid-commit: v2 claimed (fresh — the
          // age gate must NOT reclaim it), pointer not yet moved
          val out = fs.create(new Path(dir, "_pub_v2.list"), false)
          out.write(racerBody.getBytes("UTF-8")); out.close()
          Map("s" -> 3L) // stale derivation — must never publish
        } else {
          // between attempts the racer COMPLETED its publish
          if (markerMode) {
            val out = fs.create(new Path(dir, "_pubcommit.2"), false)
            out.write("2".getBytes("UTF-8")); out.close()
          } else {
            val tmp = new Path(dir, "_pub_current.tmp2")
            val out = fs.create(tmp, true)
            out.write("2".getBytes("UTF-8")); out.close()
            assert(fs.rename(tmp, new Path(dir, "_pub_current")) ||
              { fs.delete(new Path(dir, "_pub_current"), false)
                fs.rename(tmp, new Path(dir, "_pub_current")) })
          }
          Map("s" -> 4L) // the REBASED derivation
        }
      }, attempts = 3)
      assert(calls == 2, s"thunk re-derivation never happened ($calls calls)")
      assert(got == 3L, s"rebased publish landed at $got, want 3")
      assert(PublishSet.resolveAt(fs, dir, 2L) == Map("s" -> 2L),
        "racer's manifest was disturbed")
      assert(PublishSet.resolve(fs, dir).get == Map("s" -> 4L),
        "rebased publish must serve the RE-DERIVED members")
    }
  }

  test("PublishSet.publishRetrying: live concurrent publishers lose no update either side") {
    for (markerMode <- Seq(false, true)) withMode(markerMode) {
      val dir = new Path(TestSpark.tmpDir(s"publive-m$markerMode"))
      val fs = dir.getFileSystem(conf)
      // 8 concurrent publishers, each re-deriving its member map per
      // attempt; every one must land (bounded retries are enough at
      // this contention) and every landed manifest must be one of the
      // 8 — no silent overwrite, no duplicate version
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 8).map { i =>
        new Thread(() => {
          try PublishSet.publishRetrying(fs, conf, dir,
            () => Map("w" -> i.toLong), attempts = 32)
          catch { case t: Throwable => errs.add(t); () }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(120000))
      assert(errs.isEmpty, s"live publishers failed: ${errs.toArray.toSeq}")
      val cur = PublishSet.currentVersion(fs, dir).get
      assert(cur == 8L, s"8 publishers must land 8 versions, got $cur")
      val landed = (1L to cur)
        .map(v => PublishSet.resolveAt(fs, dir, v)("w")).sorted
      assert(landed == (1L to 8L),
        s"lost/duplicated publisher payloads: $landed")
    }
  }

  // ---------------------------------------------------------------
  // LakeOps.runNightly(attempts) — the composed wrapper under a racer
  // on one day store (pointer mode; the primitives' marker legs are
  // covered above and in OperatorSpec's commit-mode matrix)
  // ---------------------------------------------------------------
  test("LakeOps.runNightly(attempts=3) survives a live racing commit on a day store") {
    var exercised = false
    var tries = 0
    while (!exercised && tries < 5) {
      tries += 1
      val base = TestSpark.tmpDir(s"nightly-race-$tries")
      val lake = s"$base/lake"
      def batch(rows: Seq[(Long, String, Long)]) =
        rows.toDF("k", "v", "ver")
          .withColumn("ingest_date", lit("2026-01-01"))
      LakeOps.runNightly(spark, lake, batch(Seq((1L, "a", 1L), (2L, "b", 1L))),
        Seq("k"), Seq("ver"))
      val day = new Path(s"$lake/ingest_date=2026-01-01")
      val fs = day.getFileSystem(conf)
      val pre = Snapshot.currentVersion(fs, day).get
      val report = claimRacer(day)
      LakeOps.runNightly(spark, lake, batch(Seq((2L, "b2", 2L), (3L, "c", 1L))),
        Seq("k"), Seq("ver"), attempts = 3)
      val rerr = report()
      val got = Lake.readStore(spark, s"$lake/ingest_date=2026-01-01")
        .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
      assert(got == Map(1L -> "a", 2L -> "b2", 3L -> "c"),
        s"nightly lost updates: $got")
      if (rerr.isEmpty) {
        // racer committed → the night's merge AND compaction still
        // landed after it (merge rebase + compact rebase)
        val post = Snapshot.currentVersion(fs, day).get
        assert(post >= pre + 3,
          s"racer won but night did not advance past it (pre $pre post $post)")
        exercised = true
      } else assert(isConflict(rerr), s"racer failed non-loudly: $rerr")
    }
    assert(exercised,
      "night never lost a claim in 5 interleaves (racer too slow?)")
  }
}
