package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-stage wall/task profile of one query — the "which stage is slow"
  * empirical loop of the optimization guide (§1.1) without the UI (the
  * bench runs with spark.ui.enabled=false). Prints, per stage: wall time,
  * summed task time, task count, shuffle read/write bytes, input bytes.
  *
  * Usage: runMain graft.tools.Profile <query> [sfDir] [reps]
  * Env: GRAFT_PROFILE_CPUS (default 32), GRAFT_EXTRA_CONF as in tools.One.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("GRAFT_PROFILE_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // mirror Bench's session so profiles see the benched plan shapes
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", graft.util.Scratch.warehouseDir)
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_EXTRA_CONF").foreach { kvs =>
      kvs.split(";").foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(var name: String = "", var submitted: Long = 0,
                  var completed: Long = 0, var taskMs: Long = 0,
                  var gcMs: Long = 0, var tasks: Int = 0,
                  var shufRead: Long = 0, var shufWrite: Long = 0,
                  var input: Long = 0, var jobId: Int = -1)
    val stages = mutable.LinkedHashMap[Int, St]()
    val stageToJob = mutable.HashMap[Int, Int]()
    val jobs = mutable.LinkedHashMap[Int, (Long, Long)]() // id -> (start, end)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs(e.jobId) = (e.time, 0L)
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(v => jobs(e.jobId) = (v._1, e.time))
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
        val s = stages.getOrElseUpdate(e.stageInfo.stageId, St())
        // the RDD scope chain names the physical operators in the stage —
        // far more attributable than the callsite-only stage name
        val ops = e.stageInfo.rddInfos.flatMap(_.scope)
          .map(_.name).distinct.mkString(">")
        s.name = "[" + ops + "] " + e.stageInfo.name.takeWhile(_ != '\n')
        s.submitted = System.currentTimeMillis()
        s.jobId = stageToJob.getOrElse(e.stageInfo.stageId, -1)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val s = stages.getOrElseUpdate(e.stageInfo.stageId, St())
        s.completed = System.currentTimeMillis()
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val s = stages.getOrElseUpdate(e.stageId, St())
        s.tasks += 1
        if (e.taskMetrics != null) {
          s.taskMs += e.taskMetrics.executorRunTime
          s.gcMs += e.taskMetrics.jvmGCTime
          s.shufRead += e.taskMetrics.shuffleReadMetrics.totalBytesRead
          s.shufWrite += e.taskMetrics.shuffleWriteMetrics.bytesWritten
          s.input += e.taskMetrics.inputMetrics.bytesRead
        }
      }
    })

    val fn = graft.SparkEntry.queries(name)
    for (r <- 1 to reps) {
      stages.clear(); jobs.clear(); stageToJob.clear()
      val t0 = System.nanoTime()
      val (rows, sum) = graft.Bench.materialize(fn(spark, dir))
      val sec = (System.nanoTime() - t0) / 1e9
      graft.util.Checkpoints.releaseAll(spark)
      // listener bus drains async; give it a beat before reading
      Thread.sleep(500)
      println(f"\n===== $name rep $r: $sec%.2f s rows=$rows sum=$sum =====")
      println(f"${"stage"}%7s ${"job"}%4s ${"wall_s"}%7s ${"task_s"}%7s ${"gc_s"}%5s ${"tasks"}%5s ${"shufR_MB"}%9s ${"shufW_MB"}%9s ${"in_MB"}%7s  name")
      stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
        val wall = math.max(0, s.completed - s.submitted) / 1000.0
        println(f"$id%7d ${s.jobId}%4d $wall%7.2f ${s.taskMs / 1000.0}%7.2f ${s.gcMs / 1000.0}%5.2f ${s.tasks}%5d ${s.shufRead / 1e6}%9.2f ${s.shufWrite / 1e6}%9.2f ${s.input / 1e6}%7.2f  ${s.name.take(300)}")
      }
      val jobWall = jobs.values.map(v => math.max(0, v._2 - v._1)).sum / 1000.0
      println(f"jobs=${jobs.size} total_job_wall=$jobWall%.2f s (gaps = driver/planning time: ${sec - jobWall}%.2f s)")
    }
    spark.stop()
  }
}
