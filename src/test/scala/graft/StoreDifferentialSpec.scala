package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.io.NestedStore

/** Generative differential test of the nested STORE layer: random
  * interleaved upsert / erase / delete-by-key / compact sequences —
  * the reference's put_item/delete_item lifecycle over time — run
  * both against the on-disk partitioned store and an in-memory model
  * (a Map from (study_code, view) to its rows). After EVERY op the
  * store must agree with the model on three faces: the full read-back
  * (rows), the LISTING (the live partition-dir set, Hive-unescaped
  * back to logical keys — [[NestedStore.erase]]'s contract is that an
  * emptied partition is GONE, not an empty dir a later scan trips
  * on), and a partition-pruned POINT LOOKUP of a live key (the
  * GetItem read path).
  *
  * Partition key values deliberately include the characters the
  * parquet writer Hive-escapes (space, `%`, `=`): this round's erase
  * fix rebuilds the deleted-directory path by escaping the key back,
  * and this test pins that round-trip generatively — a regression to
  * verbatim interpolation fails the partition-count check on the
  * first erase that empties an escaped partition.
  */
class StoreDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private type Key = (String, String)
  private type SRow = (String, Option[Double]) // (name, score) — score nullable

  private sealed trait SOp
  private case class SUpsert(batch: Map[Key, Vector[SRow]]) extends SOp
  private case class SEraseGe(x: Double) extends SOp // score >= x (null-safe: null kept)
  private case class SEraseName(n: String) extends SOp // name = n
  // the reference's delete_item twin: drop ONE document by its full
  // key — partition-pruned, idempotent on absent keys like DynamoDB
  private case class SDeleteKey(key: Key) extends SOp
  private case object SCompact extends SOp

  // escapable key values: space, percent, equals all round-trip
  // through the writer's Hive escaping
  private val Studies = Vector("S1", "S 2", "S%3", "S=4")
  private val Views = Vector("V1", "V 2")
  private val Names = Vector("n1", "n2", "n3", "n4")

  private val rowsGen: Gen[Vector[SRow]] = for {
    n <- Gen.chooseNum(1, 3)
    rows <- Gen.listOfN(n, for {
      name <- Gen.oneOf(Names)
      score <- Gen.option(Gen.chooseNum(0, 15).map(_ + 0.25))
    } yield (name, score))
  } yield rows.toVector

  private def batchGen: Gen[Map[Key, Vector[SRow]]] = for {
    nParts <- Gen.chooseNum(1, 3)
    keys <- Gen.pick(nParts, for { s <- Studies; v <- Views } yield (s, v))
    rowsPer <- keys.toVector.foldLeft(Gen.const(Vector.empty[Vector[SRow]]))(
      (acc, _) => acc.flatMap(v => rowsGen.map(v :+ _)))
  } yield keys.toVector.zip(rowsPer).toMap

  private def opsGen: Gen[List[SOp]] = {
    def op(nonEmptyLikely: Boolean): Gen[SOp] =
      if (!nonEmptyLikely) batchGen.map(SUpsert)
      else Gen.frequency(
        3 -> batchGen.map(SUpsert),
        2 -> Gen.chooseNum(0, 15).map(x => SEraseGe(x + 0.25)),
        2 -> Gen.oneOf(Names).map(SEraseName),
        // any key from the full grid: deleting an ABSENT document must
        // be a no-op (DynamoDB delete_item semantics), a present one a
        // whole-partition drop; delete-then-reupsert churn falls out
        2 -> Gen.oneOf(for { s <- Studies; v <- Views } yield (s, v)).map(SDeleteKey),
        1 -> Gen.const(SCompact))
    for {
      n <- Gen.chooseNum(3, 8)
      first <- batchGen.map(SUpsert) // the store must exist before erase/compact
      rest <- Gen.listOfN(n, op(nonEmptyLikely = true))
    } yield first :: rest
  }

  private def mApply(m: Map[Key, Vector[SRow]], op: SOp): Map[Key, Vector[SRow]] = op match {
    case SUpsert(batch) => m ++ batch // dynamic overwrite: whole-partition replace
    case SEraseGe(x) =>
      // three-valued predicate: null score is NOT >= x — the row stays
      m.view.mapValues(_.filterNot(r => r._2.exists(_ >= x))).filter(_._2.nonEmpty).toMap
    case SEraseName(n) =>
      m.view.mapValues(_.filterNot(_._1 == n)).filter(_._2.nonEmpty).toMap
    case SDeleteKey(k) => m - k
    case SCompact => m
  }

  private def sApply(path: String, op: SOp): Unit = op match {
    case SUpsert(batch) =>
      val rows = batch.toSeq.flatMap { case ((s, v), rs) =>
        rs.map(r => (s, v, r._1, r._2.map(Double.box).orNull))
      }
      val df = rows.toDF("study_code", "view", "name", "score")
        .withColumn("score", col("score").cast("double"))
      NestedStore.upsert(NestedStore.nest(df, "study_code", "view"), path)
    case SEraseGe(x) => NestedStore.erase(spark, path, col("score") >= lit(x))
    case SEraseName(n) => NestedStore.erase(spark, path, col("name") === lit(n))
    case SDeleteKey((s, v)) => NestedStore.erase(spark, path,
      col("study_code") === lit(s) && col("view") === lit(v))
    case SCompact => NestedStore.compact(spark, path)
  }

  private def readBack(path: String): Vector[(String, String, String, Option[Double])] = {
    val flat = NestedStore.flatten(spark.read.option("basePath", path).parquet(path))
    flat.select("study_code", "view", "name", "score").collect().map { r =>
      (r.getString(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toVector
  }

  /** The store's LISTING as a key set — the DynamoDB scan-the-table
    * twin: every live (study_code, view) partition dir, Hive-UNescaped
    * back to its logical key (parquet writes "S%203"-style dirs for
    * escapable values; the listing must round-trip to the key the
    * model holds, or delete/upsert by key and listing disagree).
    */
  private def liveListing(path: String): Set[Key] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def unesc(dirName: String): String = {
      val v = dirName.substring(dirName.indexOf('=') + 1)
      // Hive escaping is %XX on a reserved-char set; %XX-decode only
      // (never '+'-to-space, which URLDecoder would also apply)
      val sb = new StringBuilder
      var i = 0
      while (i < v.length) {
        if (v(i) == '%' && i + 3 <= v.length)
          { sb.append(Integer.parseInt(v.substring(i + 1, i + 3), 16).toChar); i += 3 }
        else { sb.append(v(i)); i += 1 }
      }
      sb.toString
    }
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("study_code="))
      .flatMap { d =>
        fs.listStatus(d.getPath)
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("view="))
          .map(v => (unesc(d.getPath.getName), unesc(v.getPath.getName)))
      }.toSet
  }

  /** Partition-pruned point lookup (the keyed GetItem read path): the
    * store's document for one key, as (name, score) rows.
    */
  private def pointLookup(path: String, key: Key): Vector[SRow] = {
    val flat = NestedStore.flatten(spark.read.option("basePath", path).parquet(path)
      .where(col("study_code") === lit(key._1) && col("view") === lit(key._2)))
    flat.select("name", "score").collect().map { r =>
      (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    }.toVector
  }

  test("property: random upsert/erase/compact sequences read back exactly like the store model") {
    val prop = Prop.forAllNoShrink(opsGen) { ops =>
      val path = java.nio.file.Files.createTempDirectory("graft_store_diff").toString + "/store"
      var model = Map.empty[Key, Vector[SRow]]
      val ok = ops.forall { op =>
        // erase on an all-empty store is contractually an error
        // (require(byView.nonEmpty)) — the model mirrors the guard
        val skip = model.isEmpty && (op match {
          case _: SUpsert => false
          case _ => true
        })
        if (!skip) {
          sApply(path, op)
          model = mApply(model, op)
        }
        val expected = model.toVector.flatMap { case ((s, v), rs) =>
          rs.map(r => (s, v, r._1, r._2))
        }.sorted(Ordering.by((t: (String, String, String, Option[Double])) => t.toString))
        val got =
          if (model.isEmpty) Vector.empty
          else readBack(path).sorted(Ordering.by((t: (String, String, String, Option[Double])) => t.toString))
        // listing-digest invariant: the live partition-dir SET,
        // Hive-unescaped, is exactly the model's key set (count alone
        // would miss a wrong-dir-deleted + wrong-dir-kept swap)
        val listing = liveListing(path)
        val dirsOk = listing == model.keySet
        // keyed-read invariant: a partition-pruned point lookup of one
        // LIVE key returns exactly the model's document (multiset)
        val lookupOk = model.isEmpty || {
          val k = model.keySet.minBy(_.toString)
          pointLookup(path, k).sorted == model(k).sorted
        }
        if (got != expected || !dirsOk || !lookupOk) {
          println(s"OP: $op")
          println(s"listing=$listing model keys=${model.keySet} lookupOk=$lookupOk")
          expected.foreach(e => println(s"  M $e"))
          got.foreach(g => println(s"  S $g"))
        }
        got == expected && dirsOk && lookupOk
      }
      ok
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, r.status.toString)
  }
}
