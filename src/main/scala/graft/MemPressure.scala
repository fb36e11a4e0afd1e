package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Memory-pressure probe: runs selected registry queries ONCE each while a
  * SparkListener accumulates task-level spill metrics, and prints one JSON
  * line per query — seconds, memory/disk bytes spilled, peak per-task
  * execution memory, and the failure (OOM) if any.
  *
  * Purpose: every scale claim in BASELINE.md is CPU-bound local[32] with an
  * 8 GiB heap that comfortably holds the working set; this main is how the
  * "what breaks first under memory pressure" question gets an empirical
  * answer instead of a scaladoc argument. Drive it with the heap as the
  * variable (`SPARK_DRIVER_MEM=2g`, build.sbt routes it to `-Xmx`) and the
  * 100× replica as the data:
  *
  * {{{
  * SPARK_DRIVER_MEM=2g SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 \
  *   SPARK_GRAFT_ONLY=q06,q12,q32,q48 sbt -batch "runMain graft.MemPressure"
  * }}}
  *
  * A query that spills and finishes is the GOOD outcome — Spark's
  * sort/aggregate/join operators degrade to disk by design, and nonzero
  * `spill_disk` with a finite time is the evidence. A query that dies
  * carries its error instead; with local[32] sharing one capped heap the
  * interesting boundary is which side each operator lands on. Metrics come
  * from `onTaskEnd` (the same numbers the UI's "Spill (Memory)/(Disk)"
  * columns show), so they cover whole-stage codegen and native expressions
  * alike. Single-iteration by design: under pressure the first run IS the
  * honest number (a warmed rerun would measure the page cache, not the
  * operator).
  */
object MemPressure {

  private final class SpillListener extends SparkListener {
    val memSpilled = new AtomicLong
    val diskSpilled = new AtomicLong
    val peakExec = new AtomicLong
    val failedTasks = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        memSpilled.addAndGet(m.memoryBytesSpilled)
        diskSpilled.addAndGet(m.diskBytesSpilled)
        peakExec.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
      }
      if (!t.taskInfo.successful) failedTasks.incrementAndGet()
    }
    def reset(): Unit = { memSpilled.set(0); diskSpilled.set(0); peakExec.set(0); failedTasks.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // the probe's mitigation lever: SPARK_GRAFT_CACHE_LEVEL=DISK_ONLY keeps
    // data-scale pipeline caches out of the contended unified region (see
    // EventsVerificationPipeline.dataCacheLevel for the measured failure)
    sys.env.get("SPARK_GRAFT_CACHE_LEVEL")
      .foreach(spark.conf.set("spark.graft.cache.level", _))
    // generic mitigation lever: SPARK_GRAFT_CONF="k=v;k=v" applies
    // runtime-settable SQL confs (e.g. spark.sql.shuffle.partitions —
    // the per-task-aggregate-state knob the q16g probe exercises). The
    // driver never sets it; probes record the value they used in the
    // header line below.
    val extraConf = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    extraConf.foreach { case (k, v) => spark.conf.set(k, v) }
    val listener = new SpillListener
    spark.sparkContext.addSparkListener(listener)

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      only.forall(_.exists(name.contains))
    }
    val heap = Runtime.getRuntime.maxMemory()
    // Bench.jstr escaping: a conf value containing a quote or backslash
    // must not break the diagnostic record's parseability (ADVICE r12)
    val confNote = if (extraConf.isEmpty) ""
      else extraConf.map { case (k, v) => s"${Bench.jstr(k)}:${Bench.jstr(v)}" }
        .mkString(""","conf":{""", ",", "}")
    println(s"""{"heap_bytes":$heap,"sf":${Bench.jstr(sfDir)},"queries":${selected.size}$confNote}""")
    selected.foreach { case (name, fn) =>
      spark.catalog.clearCache()
      System.gc()
      listener.reset()
      val t0 = System.nanoTime()
      // count() here is deliberate — the row count IS the recorded
      // evidence (the q89 rows:0 find). Caveat inherited from Bench's r18
      // noop-sink rationale: count() lets Catalyst prune value-only
      // computation, so a value-heavy/cardinality-light query (q90) is
      // under-stressed here; pressure-probe it via Bench instead.
      val outcome =
        try { val n = fn(spark, sfDir).count(); Right(n) }
        catch { case e: Throwable =>
          // getMessage leads with scheduler framing ("Job aborted due to
          // stage failure: Task ..."); 320 chars reaches the root-cause
          // class name that the first 160 cut off
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(320)) }
      val sec = (System.nanoTime() - t0) / 1e9
      // Let the async listener bus drain before reading the counters.
      // listenerBus.waitUntilEmpty is private[spark]; a FIXED sleep can
      // undercount when the bus is still backed up after a large job
      // (ADVICE r11), so poll until the counters are stable across two
      // consecutive reads, with a bounded total wait as the backstop.
      locally {
        def snap() = (listener.memSpilled.get, listener.diskSpilled.get,
          listener.peakExec.get, listener.failedTasks.get)
        var prev = snap()
        var stable = false
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (!stable && System.nanoTime() < deadline) {
          Thread.sleep(500)
          val cur = snap()
          stable = cur == prev
          prev = cur
        }
      }
      val base =
        f""""sec":${math.round(sec * 1000) / 1000.0},"spill_mem":${listener.memSpilled.get},"spill_disk":${listener.diskSpilled.get},"peak_exec_mem":${listener.peakExec.get},"failed_tasks":${listener.failedTasks.get}"""
      outcome match {
        case Right(n) => println(s"""{"query":"$name",$base,"rows":$n}""")
        case Left(err) =>
          val esc = err.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => " "; case c if c < ' ' => " "; case c => c.toString }
          println(s"""{"query":"$name",$base,"error":"$esc"}""")
      }
    }
    spark.stop()
  }
}
