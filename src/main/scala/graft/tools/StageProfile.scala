package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Dev-only (round 17): run one query N times and print per-STAGE wall,
  * task-time, shuffle and spill totals from a SparkListener — the
  * local-mode stand-in for the Spark UI's stage table (the UI is off in
  * every harness run). Usage: StageProfile <name> [runs] [sfDir].
  * Stages from the warmup rep are dropped; the report aggregates the
  * LAST rep only, so one-time artifact builds never pollute the stage
  * list. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)

    final case class StageRow(id: Int, nm: String, wallMs: Long,
      taskMs: Long, tasks: Int, shufReadMb: Double, shufWriteMb: Double,
      spillMb: Double, inMb: Double, rows: Long)
    val rows = ArrayBuffer.empty[StageRow]
    var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = e.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s).getOrElse(-1L)
          val m = si.taskMetrics
          rows.synchronized {
            rows += StageRow(si.stageId, si.name.takeWhile(_ != '\n'),
              wall, m.executorRunTime, si.numTasks,
              m.shuffleReadMetrics.totalBytesRead / 1e6,
              m.shuffleWriteMetrics.bytesWritten / 1e6,
              m.diskBytesSpilled / 1e6,
              m.inputMetrics.bytesRead / 1e6,
              m.inputMetrics.recordsRead)
          }
        }
    })

    (1 to runs).foreach { i =>
      if (i == runs) { rows.clear(); record = true }
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name run $i: $dt%.2f s")
    }
    // listener bus is async (and private) — give it a beat to drain
    Thread.sleep(500)
    val sorted = rows.sortBy(-_.taskMs)
    println(f"%nstageId  wall_ms  task_ms tasks shufR_MB shufW_MB spill_MB input_MB  in_rows  name")
    sorted.foreach { r =>
      println(f"${r.id}%7d ${r.wallMs}%8d ${r.taskMs}%8d ${r.tasks}%5d " +
        f"${r.shufReadMb}%8.1f ${r.shufWriteMb}%8.1f ${r.spillMb}%8.1f " +
        f"${r.inMb}%8.1f ${r.rows}%8d  ${r.nm}")
    }
    println(f"%nstages=${rows.size} total_task_ms=${rows.map(_.taskMs).sum} " +
      f"total_wall_ms=${rows.map(_.wallMs).sum}")
    spark.stop()
  }
}
