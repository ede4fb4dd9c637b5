package graft.fa

/** CLI entry point mirroring the reference driver's surface
  * (fa-etl.py:600-612 / fa-etl.sh:1-15):
  *
  * {{{
  * sbt "runMain graft.fa.Main
  *   --input_dir /path/with/raw
  *   --log_file /path/deploy_etl.log
  *   --annual_file_string Prop
  *   --value_history_file_string ValHist"
  * }}}
  *
  * Same four required flags, same semantics: `input_dir` must contain a
  * `raw/` subdirectory of Deed/Prop/TaxHist/ValHist `.txt.zip` files; the
  * family substrings pick the annual and value-history vintage names.
  * Optional extras beyond the reference: `--fips_partition` hive-partitions
  * staging by FIPS, `--master` overrides the Spark master.
  */
object Main {

  private val required = Seq("input_dir", "log_file",
    "annual_file_string", "value_history_file_string")

  /** Flags that take no value (presence ⇒ "true"). Every other `--key`
    * REQUIRES a value — a missing one is an argparse-style startup error,
    * not a silent bind to "true" (e.g. a forgotten `--log_file` value
    * must not send telemetry to a file literally named `true`). */
  private val booleanFlags = Set("fips_partition")

  /** `--key value` pairs + bare `--flag` booleans, argparse-style errors. */
  private[fa] def parseArgs(args: Array[String]): Map[String, String] = {
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case Nil => acc
        case key :: tail if key.startsWith("--") =>
          val name = key.drop(2)
          tail match {
            case v :: more if !v.startsWith("--") => loop(more, acc + (name -> v))
            case more if booleanFlags(name) => loop(more, acc + (name -> "true"))
            case _ =>
              throw new IllegalArgumentException(
                s"argument --$name: expected one argument")
          }
        case other :: _ =>
          throw new IllegalArgumentException(s"unexpected argument: $other")
      }
    val opts = loop(args.toList, Map.empty)
    val missing = required.filterNot(opts.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"the following arguments are required: ${missing.map("--" + _).mkString(", ")}")
    opts
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    // getOrCreate may return a session someone else owns (tests, a REPL) —
    // only stop what this main actually created
    val preexisting = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
    val spark = graft.GraftSession(
      master = opts.getOrElse("master",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"),
      appName = "fa-etl")
    try {
      val pipeline = new Pipeline(spark, opts("input_dir"),
        names = Schemas.FamilyNames(
          annual = opts("annual_file_string"),
          valueHistory = opts("value_history_file_string")),
        partitionByFips = opts.get("fips_partition").contains("true"),
        logFile = Some(opts("log_file")))
      val merged = pipeline.run()
      println(s"UNIFIED_ROWS=${merged.count()}")
    } finally if (!preexisting.exists(_ eq spark)) spark.stop()
  }
}
