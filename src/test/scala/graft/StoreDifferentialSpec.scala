package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.io.NestedStore

/** Generative differential test of the nested STORE layer: random
  * upsert / erase / compact sequences run both against the on-disk
  * partitioned store and an in-memory model (a Map from (study_code,
  * view) to its rows). After each sequence the store must read back
  * exactly the model — rows AND the set of live partition
  * directories, because [[NestedStore.erase]]'s contract is that an
  * emptied partition is GONE, not an empty dir a later scan trips on.
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
        1 -> Gen.const(SCompact))
    for {
      n <- Gen.chooseNum(2, 5)
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
    case SCompact => NestedStore.compact(spark, path)
  }

  private def readBack(path: String): Vector[(String, String, String, Option[Double])] = {
    val flat = NestedStore.flatten(spark.read.option("basePath", path).parquet(path))
    flat.select("study_code", "view", "name", "score").collect().map { r =>
      (r.getString(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toVector
  }

  private def liveViewDirs(path: String): Int = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) 0
    else fs.listStatus(root).filter(s => s.isDirectory && s.getPath.getName.startsWith("study_code="))
      .map(d => fs.listStatus(d.getPath)
        .count(s => s.isDirectory && s.getPath.getName.startsWith("view=")))
      .sum
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
        val dirsOk = liveViewDirs(path) == model.size
        if (got != expected || !dirsOk) {
          println(s"OP: $op")
          println(s"dirs=${liveViewDirs(path)} model partitions=${model.size}")
          expected.foreach(e => println(s"  M $e"))
          got.foreach(g => println(s"  S $g"))
        }
        got == expected && dirsOk
      }
      ok
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, r.status.toString)
  }
}
