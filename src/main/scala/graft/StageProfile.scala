package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Optimization-round instrument: per-query effective-parallelism
  * profile. For each named query (or the N slowest from a bench
  * artifact), runs the noop sink once and reports wall seconds, summed
  * task time, effective parallelism (taskTime/wall), the number of
  * single-task stages and their summed wall share — the signature of a
  * one-file/one-row-group scan stage hogging a multicore host.
  *
  * `runMain graft.StageProfile <query> [query ...]`
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32).
  */
object StageProfile {

  private class Collector extends SparkListener {
    val stageTasks = scala.collection.mutable.Map[Int, Int]()
    val stageTaskTimeMs = scala.collection.mutable.Map[Int, Long]()
    val stageMaxTaskMs = scala.collection.mutable.Map[Int, Long]()
    val stageWallMs = scala.collection.mutable.Map[Int, Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      val sid = t.stageId
      stageTasks(sid) = stageTasks.getOrElse(sid, 0) + 1
      val ms = Option(t.taskMetrics).map(_.executorRunTime).getOrElse(0L)
      stageTaskTimeMs(sid) = stageTaskTimeMs.getOrElse(sid, 0L) + ms
      stageMaxTaskMs(sid) = math.max(stageMaxTaskMs.getOrElse(sid, 0L), ms)
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
      val info = s.stageInfo
      val wall = (for {
        a <- info.completionTime; b <- info.submissionTime
      } yield a - b).getOrElse(0L)
      stageWallMs(info.stageId) = wall
    }
    def reset(): Unit = synchronized {
      stageTasks.clear(); stageTaskTimeMs.clear()
      stageMaxTaskMs.clear(); stageWallMs.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val coll = new Collector
    spark.sparkContext.addSparkListener(coll)

    val names = args.toSeq
    // one warm pass so codegen/JIT is not charged to the profile
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    println(f"${"query"}%-42s ${"wall_s"}%7s ${"task_s"}%7s ${"par"}%5s ${"1task_stages"}%12s ${"1task_task_s"}%12s ${"stages"}%6s")
    names.foreach { n =>
      coll.reset()
      val t0 = System.nanoTime()
      try {
        spark.sparkContext.setJobDescription(s"profile: $n")
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage.take(120)}") }
      val wall = (System.nanoTime() - t0) / 1e9
      // let the async listener bus drain before reading the counters
      Thread.sleep(400)
      val taskS = coll.stageTaskTimeMs.values.sum / 1e3
      val oneTask = coll.stageTasks.filter(_._2 == 1).keys.toSet
      val oneTaskS = oneTask.toSeq.map(coll.stageTaskTimeMs.getOrElse(_, 0L)).sum / 1e3
      val par = if (wall > 0) taskS / wall else 0.0
      println(f"$n%-42s $wall%7.2f $taskS%7.2f $par%5.1f ${oneTask.size}%12d $oneTaskS%12.2f ${coll.stageTasks.size}%6d")
    }
    spark.stop()
  }
}
