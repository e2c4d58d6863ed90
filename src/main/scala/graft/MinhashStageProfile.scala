package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Warm per-stage profile of one registered op at sf0.1 — the measurement
  * the r15 minhash-plateau work reads before touching the plan. After the
  * [[MinhashSwing]] warm-in (5 untimed passes put the JIT on its plateau),
  * each timed pass records every stage's wall (submission→completion),
  * task count, task-duration sum and max, plus the pass wall — so a
  * plateau-level 1.2 s wall decomposes into named stages instead of an
  * op-wide guess. The read: stage SUBMISSION GAPS (pass wall minus the
  * union of stage walls) price the driver/planning constant; many tiny
  * stages with single-digit-ms tasks price scheduling floor, not data.
  *
  * Usage: runMain graft.MinhashStageProfile [opKey[,opKey...]] [sfDir] [warm] [timed]
  * (r17: a comma list profiles several ops in one session — one JVM/Spark
  * startup instead of one per op when sweeping the headline set)
  */
object MinhashStageProfile {
  def main(args: Array[String]): Unit = {
    val opKeys = args.headOption.getOrElse("dedup_minhash_lsh")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val warm = args.lift(2).map(_.toInt).getOrElse(5)
    val timed = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(var name: String = "", var tasks: Int = 0, var sumMs: Long = 0,
      var maxMs: Long = 0, var wallMs: Long = 0, var job: Int = -1,
      var inMb: Double = 0, var shrMb: Double = 0, var shwMb: Double = 0,
      var outRows: Long = 0)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        js.stageIds.foreach(sid => stageJob.put(sid, js.jobId))
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val st = stages.computeIfAbsent(te.stageId, _ => St())
        val d = te.taskInfo.duration
        val m = te.taskMetrics
        st.synchronized {
          st.tasks += 1; st.sumMs += d; st.maxMs = math.max(st.maxMs, d)
          if (m != null) {
            st.inMb += m.inputMetrics.bytesRead / 1048576.0
            st.shrMb += m.shuffleReadMetrics.totalBytesRead / 1048576.0
            st.shwMb += m.shuffleWriteMetrics.bytesWritten / 1048576.0
            st.outRows += m.shuffleWriteMetrics.recordsWritten + m.outputMetrics.recordsWritten
          }
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val st = stages.computeIfAbsent(si.stageId, _ => St())
        val scopes = si.rddInfos.sortBy(_.id)
          .flatMap(_.scope.map(_.name)).filterNot(_.startsWith("withThreadLocal")).distinct
        st.name = (if (scopes.nonEmpty) scopes.mkString(">") else si.name.takeWhile(_ != '\n')).take(70)
        st.wallMs = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        st.job = Option(stageJob.get(si.stageId)).getOrElse(-1)
      }
    })
    def drained(): Unit = org.apache.spark.sql.graftshim.Shim
      .drainListenerBus(spark.sparkContext)
    opKeys.foreach { opKey =>
      def pass(): Unit =
        try SparkEntry.queries(opKey)(spark, sfDir).write.format("noop").mode("overwrite").save()
        finally CacheRegistry.drain()

      (1 to warm).foreach(_ => pass())
      (1 to timed).foreach { i =>
        drained(); stages.clear()
        val t0 = System.nanoTime()
        pass()
        val wall = (System.nanoTime() - t0) / 1e9
        drained()
        import scala.jdk.CollectionConverters._
        val rows = stages.asScala.toSeq.sortBy(_._1)
        println(f"[$opKey pass $i] wall ${wall}%.3f s, stages ${rows.size}, tasks ${rows.map(_._2.tasks).sum}, jobs ${rows.map(_._2.job).distinct.size}")
        rows.foreach { case (sid, st) =>
          println(f"  job ${st.job}%-3d stage $sid%-5d wall ${st.wallMs}%6d ms  tasks ${st.tasks}%4d  sum ${st.sumMs}%6d  max ${st.maxMs}%5d  in ${st.inMb}%7.1f MB shr ${st.shrMb}%6.2f shw ${st.shwMb}%6.2f rows ${st.outRows}%8d  ${st.name}")
        }
        val stageWallSum = rows.map(_._2.wallMs).filter(_ > 0).sum
        println(f"  stage-wall sum ${stageWallSum}%d ms vs pass ${math.round(wall * 1000)}%d ms (gap = driver/planning/overlap)")
      }
    }
    spark.stop()
  }
}
