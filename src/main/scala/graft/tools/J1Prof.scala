package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Ops

object J1Prof {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[j1] $name%-22s ${(System.nanoTime()-t0)/1e9}%7.2fs  $r")
    }
    val orders = spark.read.parquet(s"$d/orders.parquet")
    val cust = spark.read.parquet(s"$d/customer.parquet").withColumnRenamed("c_custkey", "o_custkey")
    time("orders.count")(orders.count())
    time("cust.count")(cust.count())
    val j = Ops.namedJoin(orders, cust, Seq("o_custkey"), "left")
    time("join.count")(j.count())
    time("join.count2")(j.count())
    time("join.noop")(j.write.mode("overwrite").format("noop").save())
    time("join.noop2")(j.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
