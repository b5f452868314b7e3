package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one registered query WARM and print per-job wall times +
  * per-stage task-time/shuffle metrics, so optimization targets the jobs
  * that actually cost (guide §1/§7 — measure, don't guess).
  *
  * Usage: runMain graft.JobProfile <name> <sfDir> */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    // warm-up run: JIT/codegen/paths paid outside the profiled run
    fn(spark, dir).count()
    spark.catalog.clearCache()

    case class Stage(id: Int, nameHead: String, tasks: Int, taskTimeMs: Long,
                     inputMB: Double, shufReadMB: Double, shufWriteMB: Double)
    val jobStart = scala.collection.mutable.Map.empty[Int, (Long, String)]
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
    val stages = scala.collection.mutable.ArrayBuffer.empty[Stage]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart.synchronized {
          jobStart(e.jobId) = (e.time, Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse(""))
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStart.synchronized {
          jobStart.get(e.jobId).foreach { case (t0, d) =>
            jobs += ((e.jobId, e.time - t0, d))
          }
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += Stage(si.stageId, si.name.take(60), si.numTasks,
            m.executorRunTime,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    // listener events are async — drain the bus before detaching or the
    // trailing onJobEnd/onStageCompleted events are dropped (ADVICE r19)
    org.apache.spark.sql.graftbridge.Bridge.waitListenerBusEmpty(spark.sparkContext)
    spark.sparkContext.removeSparkListener(listener)
    println(f"[jobprofile] $name warm wall=$wall%.3fs jobs=${jobs.length}")
    jobs.sortBy(-_._2).foreach { case (id, ms, d) =>
      println(f"  job $id%3d ${ms / 1000.0}%7.3fs  $d")
    }
    println("  stages by task time:")
    stages.sortBy(-_.taskTimeMs).take(20).foreach { s =>
      println(f"  stage ${s.id}%4d tasks=${s.tasks}%3d taskTime=${s.taskTimeMs / 1000.0}%8.3fs " +
        f"in=${s.inputMB}%7.1fMB sr=${s.shufReadMB}%7.1fMB sw=${s.shufWriteMB}%7.1fMB  ${s.nameHead}")
    }
    spark.stop()
  }
}
