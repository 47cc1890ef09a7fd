package graft

/** Scratch microbench for the optimization round: decompose the
  * per-job fixed cost (bare RDD job, planned DataFrame action, parquet
  * scan/write jobs, Hadoop-conf broadcast serialization).
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 20).foreach(_ => spark.sparkContext.parallelize(1 to 1, 1).count())
    var t0 = System.nanoTime()
    (1 to 100).foreach(_ => spark.sparkContext.parallelize(1 to 1, 1).count())
    println(f"[mb] bare 1-task RDD job: ${(System.nanoTime() - t0) / 1e6 / 100}%.1f ms")

    (1 to 10).foreach(_ => spark.range(1).toDF("x").queryExecution.toRdd.count())
    t0 = System.nanoTime()
    (1 to 100).foreach(_ => spark.range(1).toDF("x").queryExecution.toRdd.count())
    println(f"[mb] range df action (plan each time): ${(System.nanoTime() - t0) / 1e6 / 100}%.1f ms")

    val p = "/tmp/mb_parquet"
    spark.range(10).toDF("x").coalesce(1).write.mode("overwrite").parquet(p)
    (1 to 10).foreach(_ => spark.read.parquet(p).queryExecution.toRdd.count())
    t0 = System.nanoTime()
    (1 to 100).foreach(_ => spark.read.parquet(p).queryExecution.toRdd.count())
    println(f"[mb] parquet scan job: ${(System.nanoTime() - t0) / 1e6 / 100}%.1f ms")

    t0 = System.nanoTime()
    (1 to 50).foreach(i => spark.range(1).toDF("x").coalesce(1)
      .write.mode("overwrite").parquet(s"/tmp/mb_w$i"))
    println(f"[mb] parquet 1-row write job: ${(System.nanoTime() - t0) / 1e6 / 50}%.1f ms")

    // dissect the parquet-scan constant: reuse the resolved DataFrame
    val resolved = spark.read.parquet(p)
    (1 to 10).foreach(_ => resolved.queryExecution.toRdd.count())
    t0 = System.nanoTime()
    (1 to 100).foreach(_ => resolved.queryExecution.toRdd.count())
    println(f"[mb] parquet action on pre-resolved df: ${(System.nanoTime() - t0) / 1e6 / 100}%.1f ms")

    val sch = resolved.schema
    (1 to 10).foreach(_ => spark.read.schema(sch).parquet(p).queryExecution.toRdd.count())
    t0 = System.nanoTime()
    (1 to 100).foreach(_ => spark.read.schema(sch).parquet(p).queryExecution.toRdd.count())
    println(f"[mb] parquet scan with explicit schema: ${(System.nanoTime() - t0) / 1e6 / 100}%.1f ms")

    // resolve-only cost (no action)
    t0 = System.nanoTime()
    (1 to 100).foreach(_ => spark.read.parquet(p))
    println(f"[mb] spark.read.parquet resolve only: ${(System.nanoTime() - t0) / 1e6 / 100}%.1f ms")

    val conf = spark.sessionState.newHadoopConf()
    var n = 0; val it = conf.iterator(); while (it.hasNext) { it.next(); n += 1 }
    println(s"[mb] hadoopConf entries: $n")
    def serConf(): Int = {
      val b = new java.io.ByteArrayOutputStream()
      val o = new java.io.ObjectOutputStream(b)
      o.writeObject(new org.apache.spark.util.SerializableConfiguration(conf))
      o.close(); b.size
    }
    println(s"[mb] serialized conf bytes: ${serConf()}")
    t0 = System.nanoTime()
    (1 to 50).foreach(_ => serConf())
    println(f"[mb] conf java-serialize: ${(System.nanoTime() - t0) / 1e6 / 50}%.2f ms")
    spark.stop()
  }
}
