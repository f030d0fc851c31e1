package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val supp = spark.read.parquet("/root/testdata/sf0.1/supplier.parquet")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(supp, "l_suppkey").groupBy("s_name")
      .agg(count(lit(1)).as("n")).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = graft.ops.Skew.saltedJoin(li, supp, "l_suppkey", col("l_orderkey"), 8)
      .groupBy("s_name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    println("PLAIN==SALTED: " + (plain == salted) + "  groups=" + plain.size + "  rows=" + plain.values.sum)
    val ss = graft.ops.Skew.saltedSum(li, "l_suppkey", "l_quantity", col("l_orderkey"), 8)
      .agg(sum("sum_l_quantity"), sum("cnt")).collect()(0)
    val ps = li.agg(sum("l_quantity"), count(lit(1))).collect()(0)
    println("SUMS match: " + (math.abs(ss.getDouble(0) - ps.getDouble(0)) < 1e-6) + " COUNTS match: " + (ss.getLong(1) == ps.getLong(1)))
    spark.stop()
  }
}
