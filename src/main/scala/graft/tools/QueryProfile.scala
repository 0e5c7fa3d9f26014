package graft.tools

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev instrumentation (optimization guide §1): run selected graded
  * queries under the EXACT Bench session configuration and report, per
  * query, the wall time plus the scheduler-level shape the Spark UI
  * would show — job/stage/task counts, total task time, the single
  * longest task, and shuffle read/write bytes. A stage whose task count
  * is 1 while its time dominates the query is the "heavy work on an
  * under-parallel scan" signature; large shuffle bytes flag an exchange
  * that should not exist. Usage:
  *   QueryProfile q_a q_b ...        (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench)
  */
object QueryProfile {

  final class Acc {
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0)
    val maxTaskMs = new AtomicLong(0)
    val shufReadB = new AtomicLong(0)
    val shufWriteB = new AtomicLong(0)
    // stageId -> (numTasks, stage task-time ms, max task ms)
    val stageTasks = new ConcurrentHashMap[Int, (Int, Long, Long)]()
    // stageId -> callsite (stage name is "op at File.scala:line")
    val stageNames = new ConcurrentHashMap[Int, String]()
  }

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q_knn_outliers")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var acc = new Acc
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        acc.jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        acc.stages.incrementAndGet()
        acc.stageNames.put(s.stageInfo.stageId, s.stageInfo.name)
        ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        acc.tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          val ms = m.executorRunTime
          acc.taskTimeMs.addAndGet(ms)
          acc.maxTaskMs.updateAndGet(x => math.max(x, ms))
          acc.shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          acc.shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          acc.stageTasks.merge(t.stageId, (1, ms, ms),
            (a, b) => (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3)))
        }
      }
    })

    // one warm pass (codegen/JIT) at the smallest SF, mirroring Bench
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").foreach(_ => ())
      catch { case _: Throwable => () }
    }

    names.foreach { n =>
      acc = new Acc
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).foreach(_ => ())
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat to drain
      Thread.sleep(300)
      val singles = {
        import scala.jdk.CollectionConverters._
        acc.stageTasks.asScala.toSeq.sortBy(-_._2._2).take(8)
          .map { case (sid, (nt, ms, mx)) =>
            val nm = acc.stageNames.getOrDefault(sid, "?")
            f"stage$sid:$nt%dt/${ms}ms(max ${mx}) [$nm]" }
          .mkString("\n      ")
      }
      println(f"$n%-28s wall ${wall}%7.2fs jobs ${acc.jobs.get}%3d stages ${acc.stages.get}%3d " +
        f"tasks ${acc.tasks.get}%5d taskTime ${acc.taskTimeMs.get}%7dms maxTask ${acc.maxTaskMs.get}%6dms " +
        f"shufR ${acc.shufReadB.get / 1024}%8dKB shufW ${acc.shufWriteB.get / 1024}%8dKB")
      println(s"    top stages by task-time: $singles")
    }
    spark.stop()
  }
}
