package graft

import org.apache.spark.sql.functions._

/** Measures the sketch-vs-exact trade qt9 documents: corpus token
  * frequency via the full token groupBy (one vocabulary-sized shuffle)
  * vs ONE CMS partial aggregate (constant-size partials, no
  * vocabulary shuffle). Warm median-of-3 each.
  * Run: Test/runMain graft.SketchBench [sfDir]
  */
object SketchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Engine.session(8)
    graft.functions.Udafs.register(s)
    val toks = Engine.table(s, sfDir, "documents")
      .select(explode(expr("filter(split(text, ' '), x -> x <> '')"))
        .as("w"))
    def exact(): Unit =
      toks.groupBy(col("w")).count().agg(sum("count")).collect()
    def sketch(): Unit =
      toks.agg(expr("graft_cms_str(w)")).collect()
    def med3(f: () => Unit): Double = {
      f() // warm
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    }
    println(f"exact_groupby_sec=${med3(exact)}%.3f")
    println(f"cms_sketch_sec=${med3(sketch)}%.3f")
    // High-cardinality variant (the regime the sketch exists for): the
    // synthetic corpus has ~30 distinct words, so map-side combine
    // already collapses the exact path; derive ~500k-distinct tokens
    // from lineitem keys to show the vocabulary-sized shuffle the exact
    // path pays and the sketch does not.
    val hi = Engine.table(s, sfDir, "lineitem")
      .select(expr("concat('t', l_orderkey, '_', l_linenumber)").as("w"))
    def exactHi(): Unit =
      hi.groupBy(col("w")).count().agg(sum("count")).collect()
    def sketchHi(): Unit =
      hi.agg(expr("graft_cms_str(w)")).collect()
    println(f"exact_groupby_hicard_sec=${med3(exactHi)}%.3f")
    println(f"cms_sketch_hicard_sec=${med3(sketchHi)}%.3f")
    s.stop()
  }
}
