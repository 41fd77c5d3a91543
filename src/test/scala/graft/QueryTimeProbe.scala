package graft

/** Bench-methodology timing for a subset of queries: warm each at
  * sf0.001 first (codegen/JIT), then median-of-N + min at the target sf
  * with clearCache between samples (the Bench contract — query-scoped
  * caches end with the query). Measurement only.
  * Run: Test/runMain graft.QueryTimeProbe <sfDir> <cpus> <n> name1 name2 ...
  */
object QueryTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1).toInt
    val n = args(2).toInt
    val names = args.drop(3)
    val s = Engine.session(cpus)
    val qs = SparkEntry.queries
    names.foreach { name =>
      try qs(name)(s, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      s.catalog.clearCache()
    }
    names.foreach { name =>
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        qs(name)(s, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        s.catalog.clearCache()
        dt
      }
      println(f"[qtime] $name median=${ts.sorted.apply(ts.size / 2)}%.3f " +
        f"min=${ts.min}%.3f samples=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    s.stop()
  }
}
