package graft

/** Targeted mimic of the driver's correctness gate for a subset of
  * queries: run the named SparkEntry queries, dump their parquet + the
  * full oracle_sql.json to OUTDIR, so `scripts/check_oracle.py OUTDIR
  * SFDIR` can adjudicate just those names without a full Verify sweep.
  * Run: Test/runMain graft.VerifyOne OUTDIR SFDIR name1 name2 ...
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val sfDir = args(1); val names = args.drop(2)
    val spark = Engine.session(8)
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      System.err.println(s"[verify-one] running $name")
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
      spark.catalog.clearCache()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val subset = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    val json = subset.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
