package graft

import org.apache.spark.sql.SparkSession

/** Perf-iteration helper: run named queries N times each against a sf
  * dir and print per-iteration wall seconds (first = cold, rest = warm).
  * Usage: runMain graft.PerfOne <name>[,<name>...] [sfDir] [iters]
  */
object PerfOne {
  def main(args: Array[String]): Unit = {
    val queryNames = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // 63 queries x several codegen units far exceed the default
      // 100-entry compiled-class cache; recompiled units restart cold
      // in the interpreter and md5-heavy queries degrade 5-20x
      // nondeterministically. One JVM-wide cache large enough to hold
      // every unit compiles each exactly once.
      .config("spark.sql.codegen.cache.maxEntries", "8000")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    queryNames.foreach { name =>
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
        println(f"[perf] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
