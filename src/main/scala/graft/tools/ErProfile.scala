package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase profiler for the entity-resolution path: times candidate
  * pairs alone, then the full matchGroups fixpoint, so a bench swing
  * can be attributed to blocking/Levenshtein vs label propagation.
  * Off the bench path — run by hand:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ErProfile"
  */
object ErProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val customer = spark.read.parquet(s"$dir/customer.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[erprofile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (rep <- 1 to 3) {
      val pairs = time(s"rep$rep candidatePairs count") {
        val p = graft.ops.EntityRes.candidatePairs(
          "c_custkey", "c_name", Seq("c_nationkey", "c_mktsegment"), maxDist = 2)(customer)
        p.count()
      }
      val groups = time(s"rep$rep matchGroups count") {
        graft.ops.EntityRes.matchGroups(
          "c_custkey", "c_name", Seq("c_nationkey", "c_mktsegment"), maxDist = 2)(customer)
          .count()
      }
      println(s"[erprofile] rep$rep pairs=$pairs groups_rows=$groups")
    }
    spark.stop()
  }
}
