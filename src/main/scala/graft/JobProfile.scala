package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-JOB wall-time profile of one registry query — the local-mode
  * substitute for the Spark UI's job table (the sandbox runs with the UI
  * off). Registers a listener, runs `<query>` once with the noop sink
  * (the Bench timed action), and prints one line per Spark job: job id,
  * wall seconds, and the job group/description if the operator set one.
  * Diagnostic only — never part of the bench protocol.
  *
  * Usage: `runMain graft.JobProfile <sfDir> <querySubstring>`
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qSub = args(1)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val (name, fn) = SparkEntry.queries.toSeq.sortBy(_._1)
      .find(_._1.contains(qSub))
      .getOrElse(sys.error(s"no query matches '$qSub'"))
    // warm up like Bench so JIT noise does not drown the job profile
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/events.parquet").count()
    catch { case _: Throwable => () }
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          val s = (System.nanoTime() - t0) / 1e9
          lines.add(f"[job] ${je.jobId}%4d ${s}%8.3f s  $desc")
        }
      }
    })
    // two passes: pass 1 cold (codegen+JIT), pass 2 is the comparable one
    for (pass <- 1 to 2) {
      spark.catalog.clearCache()
      System.gc()
      lines.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val total = (System.nanoTime() - t0) / 1e9
      // listener events are async; drain after a short settle
      Thread.sleep(500)
      println(s"== $name pass $pass: total ${f"$total%.3f"} s, ${lines.size} jobs ==")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
