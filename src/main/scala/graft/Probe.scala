package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Timing probe: run named queries N times against a sf dir and print
  * per-run seconds plus per-run job/stage/task counts and shuffle bytes
  * (dev tool; not part of the driver contract). Names prefix-match the
  * registry, so `q105` finds `q105_mad_outliers`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
                else Seq("q15_derived_features")
    val explain = args.contains("--explain")
    val nRuns = args.find(_.startsWith("--runs="))
      .map(_.stripPrefix("--runs=").toInt).getOrElse(3)
    val cpus = math.min(Runtime.getRuntime.availableProcessors, 32)
    val spark = GraftSession.withFunctions(
      GraftSession.builder(s"local[$cpus]", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    // per-run scheduling/shuffle counters: the fixed-overhead signal
    // (a query whose wall time is all job+stage count is floor-bound
    // by scheduling latency, not by data work)
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufRead = new AtomicLong; val shufWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    def resetCounters(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0)
      shufRead.set(0); shufWrite.set(0)
    }
    def drain(): Unit = {
      // the listener bus is async; give it a beat so per-run counters
      // attribute to the run that produced them (bus is private[spark]
      // → reflective access, same pattern Verify uses)
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethods.find(m =>
          m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
          .fold(Thread.sleep(300))(_.invoke(bus))
      } catch { case _: Throwable => Thread.sleep(300) }
    }

    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).limit(16).write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    val registry = SparkEntry.queries
    val resolved =
      if (names == Seq("ALL")) registry.keys.toSeq.sorted
      else names.flatMap { n =>
        if (registry.contains(n)) Some(n)
        else registry.keys.filter(_.startsWith(n)).toSeq.sorted.headOption
      }.distinct
    for (name <- resolved) {
      val fn = registry(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val runs = (1 to nRuns).map { _ =>
        drain(); resetCounters()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        drain()
        (sec, jobs.get, stages.get, tasks.get,
          shufRead.get + shufWrite.get)
      }
      val times = runs.map(_._1)
      val last = runs.last
      println(f"PROBE $name%-32s ${times.map(t => f"$t%6.2f").mkString(" ")}" +
        f"  jobs=${last._2}%3d stages=${last._3}%3d tasks=${last._4}%5d " +
        f"shufMB=${last._5 / 1e6}%8.2f")
    }
    spark.stop()
  }
}
