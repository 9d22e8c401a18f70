package graft

import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.SparkSession

import graft.engine.{MirrorConfig, MirrorOrchestrator}

/** CLI entry point — the Spark restatement of the reference's invocation
  * (README.md:12-14):
  *
  * {{{
  * runMain graft.Main -s <DeltaTableURL> -m <MirrorTableURL> -t <TableName>
  *                    -c <CheckpointFolderURL> [--continuous]
  *                    [--go-back d-m-y] [--creation-time <expr>]
  * }}}
  *
  * Arg validation mirrors Program.cs:146-180 (P11); `--go-back` accepts the
  * reference's `d-m-y` / `d/m/y` forms (P12, MainParameterization.cs:63-106);
  * `--creation-time` accepts Spark SQL or KQL spellings (§2.i).
  */
object Main {

  final case class Options(
      source: String = "",
      mirror: String = "",
      table: String = "mirror",
      checkpoint: String = "",
      continuous: Boolean = false,
      goBack: Option[Instant] = None,
      creationTime: Option[String] = None)

  /** P12: 3-segment day-month-year with `-` or `/` separators. */
  def parseGoBack(s: String): Instant = {
    val parts = s.split("[-/]")
    require(parts.length == 3, s"--go-back must be d-m-y or d/m/y, got '$s'")
    LocalDate.of(parts(2).toInt, parts(1).toInt, parts(0).toInt)
      .atStartOfDay(ZoneOffset.UTC).toInstant
  }

  def parseArgs(args: Seq[String]): Options = {
    def loop(rest: List[String], o: Options): Options = rest match {
      case Nil => o
      case ("-s" | "--source") :: v :: t        => loop(t, o.copy(source = v))
      case ("-m" | "--mirror") :: v :: t        => loop(t, o.copy(mirror = v))
      case ("-t" | "--table") :: v :: t         => loop(t, o.copy(table = v))
      case ("-c" | "--checkpoint") :: v :: t    => loop(t, o.copy(checkpoint = v))
      case "--continuous" :: t                  => loop(t, o.copy(continuous = true))
      case ("-g" | "--go-back") :: v :: t       => loop(t, o.copy(goBack = Some(parseGoBack(v))))
      case ("-k" | "--creation-time") :: v :: t => loop(t, o.copy(creationTime = Some(v)))
      case other :: _ =>
        throw new IllegalArgumentException(s"Unknown or incomplete argument: $other")
    }
    val o = loop(args.toList, Options())
    // P11: required-argument validation
    require(o.source.nonEmpty, "Missing required -s <DeltaTableURL>")
    require(o.mirror.nonEmpty, "Missing required -m <MirrorTableURL>")
    require(o.checkpoint.nonEmpty, "Missing required -c <CheckpointFolderURL>")
    o
  }

  def main(args: Array[String]): Unit = {
    val o = try parseArgs(args.toIndexedSeq) catch {
      case e: Exception =>
        System.err.println(s"error: ${e.getMessage}")
        System.err.println(
          "usage: graft.Main -s <DeltaTableURL> -m <MirrorTableURL> -c <CheckpointFolderURL> " +
            "[-t name] [--continuous] [--go-back d-m-y] [--creation-time <expr>]")
        sys.exit(2)
    }
    val spark = SparkSession.builder()
      .appName(s"graft-mirror-${o.table}")
      // spark-submit injects the real master; default for bare runMain
      .master(sys.props.getOrElse("spark.master", sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftSessionExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = MirrorConfig(
      deltaTableUrl = o.source,
      mirrorDir = o.mirror,
      mirrorTableName = o.table,
      checkpointDir = o.checkpoint,
      creationTimeExpr = o.creationTime,
      goBack = o.goBack,
      continuous = o.continuous)
    val orch = new MirrorOrchestrator(spark, cfg)
    orch.run()
    println(s"[graft] mirror '${o.table}' rows=${orch.table.snapshot().count()}")
    spark.stop()
  }
}
