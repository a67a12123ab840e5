package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.streaming.StreamingIngest

/** Generative BATCH-SPLIT INVARIANCE tests for the stateful streaming
  * operators: the result of a streaming computation must not depend on
  * where the micro-batch boundaries fall. The fixed StreamingSpec
  * twins pin one split; here random event sets are cut at random
  * points into 1-4 micro-batches (driven one `addData` +
  * `processAllAvailable` at a time, so each cut IS a real micro-batch
  * with state carried across), and the final result must equal the
  * batch twin over the concatenated events. Events are generated in
  * ascending event-time order, so the watermark never drops anything
  * and exact equality is the contract.
  */
class StreamingDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val qId = new java.util.concurrent.atomic.AtomicInteger

  private def segments[A](xs: List[A], cuts: Seq[Int]): List[List[A]] = {
    val bounds = (0 +: cuts.distinct.sorted.filter(c => c > 0 && c < xs.length) :+ xs.length)
    bounds.sliding(2).map { case Seq(a, b) => xs.slice(a, b) }.toList.filter(_.nonEmpty)
  }

  test("property: windowed aggregation is invariant to micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val eventsGen = for {
      n <- Gen.chooseNum(4, 25)
      mins <- Gen.listOfN(n, Gen.chooseNum(0, 600))
      keys <- Gen.listOfN(n, Gen.oneOf("click", "view", "buy"))
      vals <- Gen.listOfN(n, Gen.chooseNum(0, 40).map(_ + 0.25))
    } yield mins.sorted.lazyZip(keys).lazyZip(vals).toList.map { case (m, k, v) =>
      (new Timestamp(java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime + m * 60000L), k, v)
    }
    val cutsGen = Gen.chooseNum(0, 3).flatMap(k => Gen.listOfN(k, Gen.chooseNum(1, 24)))
    val prop = Prop.forAllNoShrink(eventsGen, cutsGen) { (events, cuts) =>
      val mem = MemoryStream[(Timestamp, String, Double)]
      val name = s"win_diff_${qId.incrementAndGet()}"
      val agg = StreamingIngest.windowedCounts(
        mem.toDF().toDF("ts", "event_type", "value"), "ts", "event_type", "value",
        "1 hour", "2 hours")
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        segments(events, cuts).foreach { seg =>
          mem.addData(seg); q.processAllAvailable()
        }
      } finally q.stop()
      val got = spark.table(name).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val want = StreamingIngest.windowedCountsBatch(
        events.toDF("ts", "event_type", "value"), "ts", "event_type", "value", "1 hour")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      if (got != want) {
        println(s"cuts=$cuts events=${events.size}")
        println(s"streaming: $got")
        println(s"batch:     $want")
      }
      got == want
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: windowed approx-NDV sketches merge identically across any micro-batch split") {
    implicit val sqlCtx = spark.sqlContext
    // HLL registers merge associatively — the streaming state-store
    // merge across arbitrary splits must be bit-identical to the batch
    // single-pass aggregate, not just approximately equal
    val eventsGen = for {
      n <- Gen.chooseNum(4, 25)
      mins <- Gen.listOfN(n, Gen.chooseNum(0, 600))
      keys <- Gen.listOfN(n, Gen.oneOf("click", "view"))
      users <- Gen.listOfN(n, Gen.chooseNum(1L, 9L))
    } yield mins.sorted.lazyZip(keys).lazyZip(users).toList.map { case (m, k, u) =>
      (new Timestamp(java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime + m * 60000L), k, u)
    }
    val cutsGen = Gen.chooseNum(0, 3).flatMap(k => Gen.listOfN(k, Gen.chooseNum(1, 24)))
    val prop = Prop.forAllNoShrink(eventsGen, cutsGen) { (events, cuts) =>
      val mem = MemoryStream[(Timestamp, String, Long)]
      val name = s"ndv_diff_${qId.incrementAndGet()}"
      val agg = StreamingIngest.windowedNdv(mem.toDF().toDF("ts", "event_type", "user_id"))
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        segments(events, cuts).foreach { seg => mem.addData(seg); q.processAllAvailable() }
      } finally q.stop()
      val got = spark.table(name).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val want = StreamingIngest.windowedNdv(events.toDF("ts", "event_type", "user_id"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      if (got != want) println(s"cuts=$cuts\nstreaming: $got\nbatch:     $want")
      got == want
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: streaming dedup keeps exactly the first arrival per key across any split") {
    implicit val sqlCtx = spark.sqlContext
    // watermark far beyond the data horizon: no state eviction, so the
    // survivors must be EXACTLY one row per distinct key — the first
    // arrival's payload — however the batches are cut
    val eventsGen = for {
      n <- Gen.chooseNum(3, 20)
      keys <- Gen.listOfN(n, Gen.chooseNum(1L, 5L))
    } yield keys.zipWithIndex.map { case (k, i) =>
      (new Timestamp(java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime + i * 60000L),
        k, i.toLong) // seq payload identifies WHICH arrival survived
    }
    val cutsGen = Gen.chooseNum(0, 3).flatMap(k => Gen.listOfN(k, Gen.chooseNum(1, 19)))
    val prop = Prop.forAllNoShrink(eventsGen, cutsGen) { (events, cuts) =>
      val mem = MemoryStream[(Timestamp, Long, Long)]
      val name = s"dedup_diff_${qId.incrementAndGet()}"
      val deduped = StreamingIngest.streamingDedup(
        mem.toDF().toDF("ts", "key", "seq"), Seq("key"), "ts", "10 days")
      val q = deduped.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val segs = segments(events, cuts)
      try {
        segs.foreach { seg => mem.addData(seg); q.processAllAvailable() }
      } finally q.stop()
      val got = spark.table(name).collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      // the cross-batch contract: exactly one survivor per key, and it
      // must come from the FIRST micro-batch that contained the key
      // (later batches hit the state store). WITHIN one batch the
      // surviving duplicate is not order-guaranteed, so any occurrence
      // from that first segment is acceptable.
      val firstSeg: Map[Long, Set[Long]] = segs.foldLeft(Map.empty[Long, Set[Long]]) {
        (acc, seg) =>
          acc ++ seg.groupBy(_._2).collect {
            case (k, es) if !acc.contains(k) => k -> es.map(_._3).toSet
          }
      }
      val keysOk = got.map(_._1) == firstSeg.keySet && got.size == firstSeg.size
      val originOk = got.forall { case (k, seq) => firstSeg(k).contains(seq) }
      if (!(keysOk && originOk)) println(s"cuts=$cuts got=$got firstSeg=$firstSeg")
      keysOk && originOk
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: IVM state across query restarts equals the direct recompute for any file split") {
    // the IVM state store survives QUERY RESTARTS (same checkpoint):
    // random rows land in 1-4 CSV files, each driven by its own
    // AvailableNow run, then the newest commit marker is deleted so
    // the final restart REPLAYS that batch — the persisted rollup must
    // equal a direct aggregation of everything, nulls, single-key
    // files and the forced at-least-once replay included
    import graft.ops.Ivm
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k STRING, v BIGINT")
    def canon(df: org.apache.spark.sql.DataFrame) =
      Ivm.finalized(df).collect().map(r =>
        (r.getAs[String]("k"), r.getAs[Long]("n_rows"), r.getAs[Long]("n_vals"),
          Option(r.get(r.fieldIndex("sum_val"))), Option(r.get(r.fieldIndex("mean_val"))))).toSet
    val rowsGen = for {
      n <- Gen.chooseNum(2, 15)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c", "d")
        v <- Gen.option(Gen.chooseNum(-50L, 50L))
      } yield (k, v))
    } yield rows
    val cutsGen = Gen.chooseNum(0, 3).flatMap(c => Gen.listOfN(c, Gen.chooseNum(1, 14)))
    val prop = Prop.forAllNoShrink(rowsGen, cutsGen) { (rows, cuts) =>
      val watch = Files.createTempDirectory("graft_ivmdiff_watch").toString
      val state = Files.createTempDirectory("graft_ivmdiff_state").toString + "/state"
      val ckpt = Files.createTempDirectory("graft_ivmdiff_ckpt").toString
      def drive(): Unit = {
        val q = StreamingIngest.ivmStateStream(spark, watch, schema, Seq("k"), "v", state, ckpt)
          .trigger(Trigger.AvailableNow()).start()
        try assert(q.awaitTermination(120000), "streaming query did not finish within 120000ms")
        finally if (q.isActive) q.stop()
      }
      segments(rows, cuts).zipWithIndex.foreach { case (seg, i) =>
        val csv = "k,v\n" + seg.map { case (k, v) => s"$k,${v.getOrElse("")}" }.mkString("\n") + "\n"
        Files.writeString(java.nio.file.Paths.get(watch, f"b$i%03d.csv"), csv)
        drive()
      }
      // force a genuine REPLAY: deleting the newest commit marker makes
      // the restarted query re-run that batch under the SAME batch id,
      // and the _ivm_batch gate must skip the merge — double-counting
      // here is exactly the at-least-once failure the marker exists for
      val commits = new org.apache.hadoop.fs.Path(ckpt, "commits")
      val cfs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val markers = cfs.listStatus(commits).map(_.getPath)
        .filter(_.getName.forall(_.isDigit))
      cfs.delete(markers.maxBy(_.getName.toLong), false)
      drive()
      val direct = Ivm.state(Seq("k"), "v")(
        spark.read.schema(schema).option("header", "true").csv(watch))
      val got = canon(spark.read.parquet(state))
      val want = canon(direct)
      if (got != want) println(s"cuts=$cuts rows=$rows\ngot=$got\nwant=$want")
      got == want
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: streaming LSH near-dup pairs survive checkpoint kills and a forced replay") {
    // streamingNearDupPairs buffers LSH signatures in stream-stream
    // join state; a pair whose two documents arrive in DIFFERENT runs
    // only surfaces if that state is restored from the checkpoint.
    // Random docs land in 1-4 CSV files, each driven by its own
    // AvailableNow run (a full query stop/start = a crash-recovery
    // cycle), then the newest commit marker is deleted so the final
    // restart REPLAYS a batch — the file sink's transaction log must
    // absorb the replay without duplicating pairs. The accumulated
    // sink must equal the batch twin over all rows, triple-for-triple.
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val baseText = "the quick brown fox jumps over the lazy dog again and again today"
    val docsGen = for {
      n <- Gen.chooseNum(4, 9)
      fams <- Gen.listOfN(n, Gen.frequency(
        3 -> Gen.const("A"),   // base text: exact dups of each other
        2 -> Gen.const("A'"),  // near-dup variant (one appended word)
        2 -> Gen.const("U")))  // unrelated, doc-unique shingles
    } yield fams.zipWithIndex.map { case (fam, i) =>
      val text = fam match {
        case "A" => baseText
        case "A'" => baseText + " extra"
        case _ => s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"
      }
      // 7-minute spacing: most adjacent pairs are inside the 30-minute
      // horizon, distant ones fall outside — both paths generated
      (i.toLong, new Timestamp(t0 + i * 7 * 60000L), text)
    }
    val cutsGen = Gen.chooseNum(0, 3).flatMap(c => Gen.listOfN(c, Gen.chooseNum(1, 8)))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, ts TIMESTAMP, text STRING")
    val prop = Prop.forAllNoShrink(docsGen, cutsGen) { (docs, cuts) =>
      val watch = Files.createTempDirectory("graft_lshdiff_watch").toString
      val out = Files.createTempDirectory("graft_lshdiff_out").toString + "/pairs"
      val ckpt = Files.createTempDirectory("graft_lshdiff_ckpt").toString
      def drive(): Unit = {
        val stream = StreamingIngest.streamingNearDupPairs(
          spark.readStream.schema(schema).option("header", "true").csv(watch),
          "doc_id", "text", "ts",
          horizon = "30 minutes", watermark = "1 hour", threshold = 0.5)
        val q = stream.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        try assert(q.awaitTermination(180000), "streaming query did not finish within 180000ms")
        finally if (q.isActive) q.stop()
      }
      segments(docs, cuts).zipWithIndex.foreach { case (seg, i) =>
        val csv = "doc_id,ts,text\n" +
          seg.map { case (id, ts, tx) => s"$id,$ts,$tx" }.mkString("\n") + "\n"
        Files.writeString(java.nio.file.Paths.get(watch, f"b$i%03d.csv"), csv)
        drive() // one crash-recovery cycle per file
      }
      // force a genuine at-least-once replay of the newest batch: the
      // join state rewinds and the batch re-runs under the same id —
      // the sink's _spark_metadata log must drop the duplicate output
      val commits = new org.apache.hadoop.fs.Path(ckpt, "commits")
      val cfs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val markers = cfs.listStatus(commits).map(_.getPath)
        .filter(_.getName.forall(_.isDigit))
      cfs.delete(markers.maxBy(_.getName.toLong), false)
      drive()
      def triple(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("est_jaccard"))
      val got = spark.read.parquet(out).collect().map(triple).toSeq
      val want = StreamingIngest.streamingNearDupPairs(
        docs.toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
        horizon = "30 minutes", watermark = "1 hour", threshold = 0.5)
        .collect().map(triple).toSeq
      // sorted-seq equality, not set: a replay-induced DUPLICATE pair
      // must fail even though the pair itself is legitimate
      val ok = got.sorted == want.sorted
      if (!ok) {
        println(s"cuts=$cuts docs=$docs")
        println(s"streaming+restarts: ${got.sorted}")
        println(s"batch twin:         ${want.sorted}")
      }
      ok
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: the streaming curation gate survives checkpoint kills and a forced replay") {
    // the composed gate's only state is the watermarked fingerprint
    // dedup — a duplicate whose FIRST copy arrived in an earlier run
    // is dropped in a later run only if that state was restored from
    // the checkpoint. Random docs from five families (quality-pass
    // unique, exact duplicates, bench-contaminated, store-duplicates,
    // gopher-junk) land in 1-4 CSV files driven by separate
    // AvailableNow runs, then the newest commit marker is deleted to
    // force a replay the sink's log must absorb. Accumulated sink ==
    // the batch twin (the oracle-gated w6 composition) id-for-id.
    val t0 = java.sql.Timestamp.valueOf("2024-02-01 08:00:00").getTime
    val base = "the quick brown fox and the lazy dog have been with that crowd " * 5
    val storeText = base + "stored forever"
    val benchText = base + "zebra omega lattice prism quartz"
    val docsGen = for {
      n <- Gen.chooseNum(4, 10)
      fams <- Gen.listOfN(n, Gen.frequency(
        3 -> Gen.const("P"),  // passing, per-doc-unique suffix
        3 -> Gen.const("D"),  // exact duplicates of one text: keep-first
        2 -> Gen.const("C"),  // carries a bench 5-gram: decontam drop
        1 -> Gen.const("S"),  // store content dup: anti-join drop
        1 -> Gen.const("J"))) // 3 words: gopher drop
    } yield fams.zipWithIndex.map { case (fam, i) =>
      val text = fam match {
        case "P" => base + s"mark$i"
        case "D" => base.trim
        case "C" => benchText
        case "S" => storeText
        case _ => "x y z"
      }
      (i.toLong, new Timestamp(t0 + i * 60000L), text, s"src${i % 2}")
    }
    val cutsGen = Gen.chooseNum(0, 3).flatMap(c => Gen.listOfN(c, Gen.chooseNum(1, 9)))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, ts TIMESTAMP, text STRING, source STRING")
    val store = Seq((1000L, storeText)).toDF("doc_id", "text")
    val benchGrams = graft.llm.Decontam.collectBenchGrams(
      Seq((1L, benchText)).toDF("doc_id", "text"), "text", 5)
    val prop = Prop.forAllNoShrink(docsGen, cutsGen) { (docs, cuts) =>
      val watch = Files.createTempDirectory("graft_gatediff_watch").toString
      val out = Files.createTempDirectory("graft_gatediff_out").toString + "/kept"
      val ckpt = Files.createTempDirectory("graft_gatediff_ckpt").toString
      def drive(): Unit = {
        val stream = StreamingIngest.streamingCurationGate(
          spark.readStream.schema(schema).option("header", "true").csv(watch),
          store, benchGrams)
        val q = stream.select("doc_id", "source").writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        try assert(q.awaitTermination(180000), "streaming query did not finish within 180000ms")
        finally if (q.isActive) q.stop()
      }
      segments(docs, cuts).zipWithIndex.foreach { case (seg, i) =>
        // texts contain spaces only (no commas/quotes): plain CSV is safe
        val csv = "doc_id,ts,text,source\n" +
          seg.map { case (id, ts, tx, src) => s"$id,$ts,$tx,$src" }.mkString("\n") + "\n"
        Files.writeString(java.nio.file.Paths.get(watch, f"b$i%03d.csv"), csv)
        drive()
      }
      val commits = new org.apache.hadoop.fs.Path(ckpt, "commits")
      val cfs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val markers = cfs.listStatus(commits).map(_.getPath)
        .filter(_.getName.forall(_.isDigit))
      cfs.delete(markers.maxBy(_.getName.toLong), false)
      drive()
      val got = spark.read.parquet(out).collect().map(_.getLong(0)).toSeq.sorted
      val want = StreamingIngest.streamingCurationGate(
        docs.toDF("doc_id", "ts", "text", "source"), store, benchGrams)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      // sorted-SEQ equality: a replayed batch double-emitting a kept
      // doc must fail even though the doc itself is legitimate
      if (got != want) println(s"cuts=$cuts fams=${docs.map(_._3.take(12))}\ngot=$got\nwant=$want")
      got == want
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: mapGroupsWithState session counts survive checkpoint kills and a forced replay") {
    // the third stateful family to get the kill-and-replay treatment
    // (after the LSH join state and the curation gate's dedup state):
    // mapGroupsWithState keeps a per-user running count in the state
    // store — a user whose events are split across SEPARATE runs only
    // totals correctly if that state is restored from the checkpoint.
    // Each CSV file is driven by its own AvailableNow run; update-mode
    // emissions land through the canonical idempotent foreachBatch
    // sink (dynamic partition overwrite on the batch id), so the
    // forced replay after deleting the newest commit marker must
    // overwrite its own partition rather than double-count.
    val usersGen = for {
      n <- Gen.chooseNum(3, 16)
      us <- Gen.listOfN(n, Gen.chooseNum(1L, 4L))
    } yield us
    val cutsGen = Gen.chooseNum(0, 3).flatMap(k => Gen.listOfN(k, Gen.chooseNum(1, 15)))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("user_id BIGINT")
    val prop = Prop.forAllNoShrink(usersGen, cutsGen) { (users, cuts) =>
      val watch = Files.createTempDirectory("graft_sessdiff_watch").toString
      val outRoot = Files.createTempDirectory("graft_sessdiff_out").toString + "/updates"
      val ckpt = Files.createTempDirectory("graft_sessdiff_ckpt").toString
      def drive(): Unit = {
        val sessions = StreamingIngest.sessionize(
          spark.readStream.schema(schema).option("header", "true").csv(watch),
          gapMs = None)
        val q = sessions.toDF().writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            // idempotent per-batch sink: a replayed batch id rewrites
            // ONLY its own partition (never appends a duplicate)
            batch.withColumn("__b", org.apache.spark.sql.functions.lit(id))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("__b").parquet(outRoot)
          }
          .trigger(Trigger.AvailableNow()).start()
        try assert(q.awaitTermination(180000), "streaming query did not finish within 180000ms")
        finally if (q.isActive) q.stop()
      }
      segments(users, cuts).zipWithIndex.foreach { case (seg, i) =>
        Files.writeString(java.nio.file.Paths.get(watch, f"b$i%03d.csv"),
          "user_id\n" + seg.mkString("\n") + "\n")
        drive() // one crash-recovery cycle per file
      }
      val commits = new org.apache.hadoop.fs.Path(ckpt, "commits")
      val cfs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val markers = cfs.listStatus(commits).map(_.getPath)
        .filter(_.getName.forall(_.isDigit))
      cfs.delete(markers.maxBy(_.getName.toLong), false)
      drive() // replays the last batch from the RESTORED prior state
      // cumulative update-mode emissions: the max per user must equal
      // the all-runs batch total — true only if every run resumed from
      // the previous runs' state, and the replay overwrote in place
      val got = spark.read.parquet(outRoot).collect()
        .map(r => (r.getAs[Long]("userId"), r.getAs[Long]("nEvents")))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val want = users.groupBy(identity).view.mapValues(_.size.toLong).toMap
      if (got != want) println(s"cuts=$cuts users=$users\ngot=$got\nwant=$want")
      got == want
    }
    // stressed at 20 cases before commit (restart-heavy discipline)
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: sessionization state accumulates identically across any micro-batch split") {
    implicit val sqlCtx = spark.sqlContext
    val eventsGen = for {
      n <- Gen.chooseNum(3, 20)
      users <- Gen.listOfN(n, Gen.chooseNum(1L, 4L))
    } yield users
    val cutsGen = Gen.chooseNum(0, 3).flatMap(k => Gen.listOfN(k, Gen.chooseNum(1, 19)))
    val prop = Prop.forAllNoShrink(eventsGen, cutsGen) { (users, cuts) =>
      val mem = MemoryStream[Long]
      val name = s"sess_diff_${qId.incrementAndGet()}"
      val sessions = StreamingIngest.sessionize(mem.toDF().toDF("user_id"), gapMs = None)
      val q = sessions.toDF().writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        segments(users, cuts).foreach { seg =>
          mem.addData(seg: _*); q.processAllAvailable()
        }
      } finally q.stop()
      // update-mode emissions are cumulative per user: the LAST (= max)
      // update must equal the batch count regardless of the split
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).max).toMap
      val want = users.groupBy(identity).view.mapValues(_.size.toLong).toMap
      if (got != want) println(s"cuts=$cuts got=$got want=$want")
      got == want
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, r.status.toString)
  }
}
