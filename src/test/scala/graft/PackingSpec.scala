package graft

import org.apache.spark.sql.functions._

import graft.llm.{Packing, Sampling}

/** Sequence packing + priority sampling: layout invariants,
  * determinism under repartitioning, and the plan shapes that carry
  * the 100 TB story (one hash exchange on shard, no global sort;
  * top-k as TakeOrderedAndProject).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val docs = (1L to 200L).map(i => (i, (i % 37 + 3).toInt)).toDF("doc_id", "n_tokens")

  test("packSequences lays each shard out as a contiguous chunked token stream") {
    val packed = Packing.packSequences("doc_id", "n_tokens", budget = 64, shards = 4)(docs)
      .collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("n_tokens"), r.getAs[Long]("pack_id"),
        r.getAs[Long]("pack_offset"), r.getAs[Boolean]("spans_boundary")))
    assert(packed.length == 200)
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      var streamPos = 0L
      ordered.foreach { case (_, _, n, packId, offset, spans) =>
        // the doc starts exactly where the previous one ended
        assert(packId == streamPos / 64, s"packId at streamPos=$streamPos")
        assert(offset == streamPos % 64, s"offset at streamPos=$streamPos")
        assert(spans == (offset + n > 64))
        assert(offset >= 0 && offset < 64)
        streamPos += n
      }
    }
  }

  test("packSequences layout is invariant under input repartitioning") {
    val a = Packing.packSequences("doc_id", "n_tokens", 64, 4)(docs)
      .collect().map(_.toSeq).toSet
    val b = Packing.packSequences("doc_id", "n_tokens", 64, 4)(docs.repartition(13))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("packSequences plans one hash exchange on shard and no global sort") {
    val plan = planOf(Packing.packSequences("doc_id", "n_tokens", 64, 4)(docs))
    assert(plan.contains("hashpartitioning(shard"), plan)
    // the only Sort is the window's per-partition sort (global=false
    // in the plan) — a global Sort or a range exchange would
    // serialize the stream
    assert(!plan.contains("rangepartitioning"), plan)
    val globalSorts = "Sort \\[[^\\]]+\\], true".r.findAllIn(plan).toList
    assert(globalSorts.isEmpty, s"global sorts: $globalSorts\n$plan")
  }

  test("packManifest accounts for every document and token exactly once") {
    val manifest = Packing.packManifest("doc_id", "n_tokens", 64, 4)(docs).collect()
    val totalDocs = manifest.map(_.getAs[Long]("n_docs")).sum
    val totalTokens = manifest.map(_.getAs[Long]("n_tokens")).sum
    val expectedTokens = docs.agg(sum(col("n_tokens"))).head.getLong(0)
    assert(totalDocs == 200L)
    assert(totalTokens == expectedTokens)
    // chunks are budget-bounded: docs STARTING in a chunk begin
    // before its end, so per-chunk started-token mass is < budget +
    // one spanning doc's tail; the structural check is pack ids are
    // dense non-negative
    manifest.foreach(r => assert(r.getAs[Long]("pack_id") >= 0))
  }

  test("lengthHistogram buckets exactly on the boundaries") {
    val df = Seq(64, 65, 128, 1, 5000).toDF("n_tokens")
    val h = Packing.lengthHistogram("n_tokens", Seq(64, 128))(df)
      .collect().map(r => (r.getAs[Int]("bucket_hi"), r.getAs[Long]("n_docs"))).toMap
    assert(h == Map(64 -> 2L, 128 -> 2L, -1 -> 1L))
  }

  test("lengthHistogram rejects unsorted boundaries") {
    intercept[IllegalArgumentException] {
      Packing.lengthHistogram("n_tokens", Seq(128, 64))(docs)
    }
  }

  test("prioritySample is weight-biased, deterministic, and k-bounded") {
    val r1 = Sampling.prioritySample("doc_id", "n_tokens", 20)(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val r2 = Sampling.prioritySample("doc_id", "n_tokens", 20)(docs.repartition(7))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(r1 == r2) // pure function of the data
    assert(r1.length == 20)
    // weight bias: the sampled mean weight exceeds the corpus mean
    val sampledMean = docs.where(col("doc_id").isin(r1: _*))
      .agg(avg("n_tokens")).head.getDouble(0)
    val corpusMean = docs.agg(avg("n_tokens")).head.getDouble(0)
    assert(sampledMean > corpusMean, s"sampled=$sampledMean corpus=$corpusMean")
  }

  test("prioritySample compiles to TakeOrderedAndProject, not a global sort") {
    val plan = planOf(Sampling.prioritySample("doc_id", "n_tokens", 20)(docs))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  private val sourcedDocs = (1L to 300L)
    .map(i => (i, s"src${(i % 3)}")).toDF("doc_id", "source")

  test("mixtureSchedule two-phase rank equals the per-source global row_number") {
    val r = Packing.mixtureSchedule("doc_id", "source",
      Seq("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.25, shards = 4)(sourcedDocs)
      .select("doc_id", "source", "shard", "rank_in_source")
      .collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[String]("source"),
        x.getAs[Long]("shard"), x.getAs[Long]("rank_in_source")))
    assert(r.length == 300)
    r.groupBy(_._2).foreach { case (_, rows) =>
      // reference: rank by (shard, doc_id) within the source
      val expected = rows.sortBy(x => (x._3, x._1)).zipWithIndex
        .map { case (x, i) => x._1 -> (i + 1L) }.toMap
      rows.foreach(x => assert(x._4 == expected(x._1), s"doc ${x._1}"))
    }
  }

  test("mixtureSchedule interleaves sources at their target rates in vt order") {
    val sched = Packing.mixtureSchedule("doc_id", "source",
      Seq("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.25, shards = 4)(sourcedDocs)
    // stride scheduling: by virtual time T, source s has contributed
    // min(n_s, floor(T * rate_s)) documents — check an interior T
    val byT = sched.where(col("vt") <= 50.0).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byT("src0") == 50L, byT)  // rate 1.0 → 50 docs by vt=50
    assert(byT("src1") == 25L, byT)  // rate 0.5 → every 2nd step
    assert(byT("src2") == 12L, byT)  // rate 0.25 → floor(50/4)
  }

  test("mixtureSchedule is invariant under repartitioning and broadcast-joins the offsets") {
    val a = Packing.mixtureSchedule("doc_id", "source",
      Seq("src0" -> 0.5), shards = 4)(sourcedDocs).collect().map(_.toSeq).toSet
    val b = Packing.mixtureSchedule("doc_id", "source",
      Seq("src0" -> 0.5), shards = 4)(sourcedDocs.repartition(11)).collect().map(_.toSeq).toSet
    assert(a == b)
    val plan = planOf(Packing.mixtureSchedule("doc_id", "source",
      Seq("src0" -> 0.5), shards = 4)(sourcedDocs))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the big-side window ranks within (source, shard) — per-shard
    // parallelism, not one partition per source
    // the window partitions on the presence-tagged source key (__sk),
    // the null-safe stand-in for the raw source column
    assert("windowspecdefinition\\(__sk#\\d+, shard#\\d+".r.findFirstIn(plan).isDefined, plan)
  }

  test("mixtureSchedule rejects out-of-range rates") {
    intercept[IllegalArgumentException] {
      Packing.mixtureSchedule("doc_id", "source", Seq("src0" -> 0.0))(sourcedDocs)
    }
    intercept[IllegalArgumentException] {
      Packing.mixtureSchedule("doc_id", "source", Seq("src0" -> 1.5))(sourcedDocs)
    }
  }

  test("packSequences rejects non-positive budget and shards") {
    intercept[IllegalArgumentException](Packing.packSequences("doc_id", "n_tokens", 0)(docs))
    intercept[IllegalArgumentException](Packing.packSequences("doc_id", "n_tokens", 64, 0)(docs))
  }

  test("epochShuffle two-phase rank equals the per-epoch global row_number") {
    val r = Packing.epochShuffle("doc_id", epochs = 2, shards = 8)(docs.select("doc_id"))
      .collect()
      .map(x => (x.getAs[Int]("epoch"), x.getAs[Long]("doc_id"),
        x.getAs[Long]("order_key"), x.getAs[Long]("rank")))
    assert(r.length == 400) // 200 docs x 2 epochs
    r.groupBy(_._1).foreach { case (_, rows) =>
      // reference: rank ascending (order_key, doc_id) within the epoch
      val expected = rows.sortBy(x => (x._3, x._2)).zipWithIndex
        .map { case (x, i) => x._2 -> (i + 1L) }.toMap
      rows.foreach(x => assert(x._4 == expected(x._2), s"epoch ${x._1} doc ${x._2}"))
      assert(rows.map(_._4).sorted.toSeq == (1L to 200L)) // a permutation
    }
  }

  test("epochShuffle orders are epoch-independent and repartition-invariant") {
    val byEpoch = Packing.epochShuffle("doc_id", epochs = 2, shards = 4)(docs.select("doc_id"))
      .collect()
      .map(x => (x.getAs[Int]("epoch"), x.getAs[Long]("doc_id"), x.getAs[Long]("rank")))
      .groupBy(_._1).map { case (e, rows) => e -> rows.sortBy(_._3).map(_._2).toSeq }
    assert(byEpoch(0) != byEpoch(1)) // different epochs → different orders
    val a = Packing.epochShuffle("doc_id", 2, 4)(docs.select("doc_id"))
      .collect().map(_.toSeq).toSet
    val b = Packing.epochShuffle("doc_id", 2, 4)(docs.select("doc_id").repartition(13))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("epochShuffle windows within (epoch, shard) and broadcast-joins offsets — no global sort") {
    val plan = planOf(Packing.epochShuffle("doc_id", 2, 8)(docs.select("doc_id")))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert("windowspecdefinition\\(epoch#\\d+, shard#\\d+".r.findFirstIn(plan).isDefined, plan)
  }

  test("epochShuffle rejects non-power-of-two shards and non-positive epochs") {
    intercept[IllegalArgumentException](Packing.epochShuffle("doc_id", 2, 3)(docs))
    intercept[IllegalArgumentException](Packing.epochShuffle("doc_id", 0)(docs))
  }

  test("mixtureSchedule and epochShuffle keep NULL-source and NULL-id docs (null-safe keys)") {
    import spark.implicits._
    val df = Seq(
      (Option(1L), Option("web")), (Option(2L), Option("web")),
      (Option(3L), Option.empty[String]), // NULL source: defaultRate, not dropped
      (Option.empty[Long], Option("web")) // NULL id: NULL hash bucket, not dropped
    ).toDF("doc_id", "source")
    val sched = Packing.mixtureSchedule("doc_id", "source", Seq("web" -> 0.5))(df).collect()
    assert(sched.length == 4, s"schedule lost docs: ${sched.mkString("; ")}")
    val nullSrc = sched.find(r => Option(r.getAs[java.lang.Long]("doc_id")).contains(3L)).get
    // defaultRate 1.0 → vt == rank_in_source exactly
    assert(nullSrc.getAs[Double]("vt") == nullSrc.getAs[Long]("rank_in_source").toDouble)
    val shuf = Packing.epochShuffle("doc_id", epochs = 2)(df.select("doc_id")).collect()
    assert(shuf.length == 8, "every doc must appear in every epoch")
    // each epoch's ranks are a contiguous 1..4
    assert(shuf.groupBy(_.getAs[Int]("epoch")).values
      .forall(_.map(_.getAs[Long]("rank")).sorted.sameElements(1L to 4L)))
  }

  test("temperatureMixtureWeights: tau=1 is natural proportions; tau=2 upsamples small sources") {
    import spark.implicits._
    val corpus = Seq(
      ("big", 900L), ("big", 900L),   // 1800 tokens
      ("small", 200L)                 // 200 tokens
    ).toDF("source", "n_tokens")
    val nat = Packing.temperatureMixtureWeights("source", "n_tokens", invTau = 1.0)(corpus)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("prob"), r.getAs[Double]("upsample_factor"))).toMap
    assert(math.abs(nat("big")._1 - 0.9) < 1e-12 && math.abs(nat("big")._2 - 1.0) < 1e-12)
    assert(math.abs(nat("small")._2 - 1.0) < 1e-12)

    val warm = Packing.temperatureMixtureWeights("source", "n_tokens", invTau = 0.5)(corpus)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("prob"), r.getAs[Double]("upsample_factor"))).toMap
    // sqrt weights: small source's share rises above natural 0.1
    assert(warm("small")._1 > 0.1 && warm("small")._2 > 1.0)
    assert(warm("big")._2 < 1.0)
    assert(math.abs(warm.values.map(_._1).sum - 1.0) < 1e-12)
  }
}
