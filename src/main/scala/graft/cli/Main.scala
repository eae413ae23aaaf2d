package graft.cli

import graft.api.HttpApiServer
import graft.core.EventLog
import graft.storage.{InMemoryBackend, ParquetLogBackend}
import org.apache.spark.sql.SparkSession

/** CLI ≙ reference cmd/eventlog (cli.go:23-129):
  *
  *   inmem   [--http-port P] [-m key:value ...]      serve a volatile log
  *   create  <dir> [-m key:value ...]                create a log directory
  *   run     <dir> [--http-port P]                   serve a persistent log
  *   check   <dir> [--quiet]                         integrity audit
  *   version <url|dir>                               print latest version
  */
object Main {
  private def spark(): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-eventlog")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def metaArgs(args: Seq[String]): Map[String, String] =
    args.sliding(2).collect {
      case Seq("-m", kv) if kv.contains(":") =>
        val Array(k, v) = kv.split(":", 2)
        k -> v
    }.toMap

  private def intFlag(args: Seq[String], name: String, default: Int): Int =
    args.sliding(2).collectFirst {
      case Seq(`name`, v) => v.toInt
    }.getOrElse(default)

  private def serve(log: EventLog, port: Int): Unit = {
    val server = new HttpApiServer(log, port)
    val actual = server.start()
    println(s"listening on :$actual")
    sys.addShutdownHook { server.stop(); log.close() }
    Thread.currentThread().join()
  }

  def main(args: Array[String]): Unit = args.toSeq match {
    case "inmem" +: rest =>
      serve(new EventLog(new InMemoryBackend(spark(), metaArgs(rest))),
        intFlag(rest, "--http-port", 8080))

    case "create" +: dir +: rest =>
      ParquetLogBackend.create(spark(), dir, metaArgs(rest)).close()
      println(s"created event log at $dir")

    case "run" +: dir +: rest =>
      serve(new EventLog(ParquetLogBackend.open(spark(), dir)),
        intFlag(rest, "--http-port", 8080))

    case "check" +: dir +: rest =>
      val log = new EventLog(ParquetLogBackend.open(spark(), dir))
      try {
        val issues = log.checkIntegrity().collect()
        if (issues.isEmpty) {
          if (!rest.contains("--quiet")) println("integrity check passed")
        } else {
          issues.foreach(r => println(
            s"version ${r.getLong(0)}: ${r.getSeq[String](1).mkString(", ")}"))
          sys.exit(1)
        }
      } finally log.close()

    case Seq("version", target) if target.startsWith("http") =>
      val body = new String(java.net.URI.create(s"$target/version").toURL
        .openStream().readAllBytes())
      println(body)

    case Seq("version", dir) =>
      val log = new EventLog(ParquetLogBackend.open(spark(), dir))
      try println(log.version) finally log.close()

    case _ =>
      System.err.println(
        "usage: inmem|create <dir>|run <dir>|check <dir> [--quiet]|version <url|dir>")
      sys.exit(2)
  }
}
