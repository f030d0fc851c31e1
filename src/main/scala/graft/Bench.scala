package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, reports per-query min-of-N seconds as ONE JSON
  * line on stdout AND writes the same JSON to `SPARK_GRAFT_BENCH_OUT`
  * (default `bench_out.json` in the working directory) so the harness never
  * has to scrape it out of sbt-prefixed logs.
  *
  * The JSON carries every per-pass time (`passes`) plus the effective
  * config (`config`: cores, shuffle partitions, the forked JVM's actual
  * arguments) so a one-off JVM stall is distinguishable from a real
  * regression round-over-round.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    // noop sink forces full evaluation of every output column (count() would
    // let Catalyst prune the projections being measured). Deterministic name
    // order + per-query stderr progress: if a JVM stall strikes, the tail
    // shows exactly where. min-of-N shields the headline number from
    // transient stalls; the per-pass arrays expose them.
    def pass(p: Int): Map[String, Double] = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] pass $p $name%-28s $dt%8.3f s")
      name -> dt
    }.toMap
    val passes = (1 to nPasses).map(pass)
    val results = names.map(n => n -> passes.map(_(n)).min).toMap
    def qjson(m: Map[String, Double]): String =
      names.map(n => s"\"$n\":" + m(n)).mkString("{", ",", "}")
    val total = results.values.sum
    val jvmArgs = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
        .filter(a => a.startsWith("-XX") || a.startsWith("-Xmx"))
        .map(a => "\"" + a.replace("\"", "") + "\"").mkString("[", ",", "]")
    }
    val config = s"""{"master":"local[$cpus]","shuffle_partitions":$cpus,""" +
      s""""available_cores":${Runtime.getRuntime.availableProcessors()},"jvm_args":$jvmArgs}"""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":${qjson(results)},""" +
      s""""sf":"$sfDir","passes":[${passes.map(qjson).mkString(",")}],"config":$config}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
